import glob, gzip, time, jax, jax.numpy as jnp
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.parallel import batch_state

W, N_SUB = 4096, 40
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8)
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
sW = batch_state(s1, W)

@jax.jit
def run(s):
    return jax.lax.scan(lambda ss, _: (jax.vmap(
        lambda x: solver.step(x, None, ctrl, pipe.collide(x), 1/240.))(ss),
        None), s, None, length=N_SUB)[0]

out = run(sW); jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/jxtrace")
out = run(sW); jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done", flush=True)

# parse xplane for top self-time ops
from tensorboard_plugin_profile.protobuf import xplane_pb2
files = glob.glob("/tmp/jxtrace/**/*.xplane.pb", recursive=True)
print(files)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(files[0], "rb").read())
from collections import defaultdict
tot = defaultdict(float)
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    ev_meta = {m_.id: m_.name for m_ in plane.event_metadata.values()}
    for line in plane.lines:
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps / 1e9  # ms
for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{ms/N_SUB:8.3f} ms/substep  {name[:110]}")
