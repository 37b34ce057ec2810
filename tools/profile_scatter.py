import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N = 13824 * 27
res3 = 64**3
idx_rand = jnp.asarray(np.random.randint(0, res3, size=(N,)))
idx_sorted = jnp.sort(idx_rand)
vals = jnp.ones((N, 3))

def timeit(name, f, *a):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20): out = g(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

timeit("scatter random", lambda v: jax.ops.segment_sum(v, idx_rand, res3), vals)
timeit("scatter sorted-hint", lambda v: jax.ops.segment_sum(
    v, idx_sorted, res3, indices_are_sorted=True), vals)
timeit("sort+scatter", lambda v: jax.ops.segment_sum(
    jnp.take(v, jnp.argsort(idx_rand), axis=0), jnp.sort(idx_rand), res3,
    indices_are_sorted=True), vals)
# one-hot matmul alternative for small tap count? too big. bincount-style:
timeit("scatter f32 1col", lambda v: jax.ops.segment_sum(v[:, 0], idx_rand, res3), vals)
