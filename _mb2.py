import time, jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices())

def timeit(name, f, *args, n=10):
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/n
    print(name, f"{dt*1000:.2f} ms")
    return dt

# calibration: matmul 4096^3 = 137 GFLOP
a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096))
dt = timeit("matmul 4096 (137 GFLOP)", jax.jit(lambda a: a @ a), a)
print(f"  -> {137e9/dt/1e12:.1f} TFLOP/s")

N = 135_000
key = jax.random.PRNGKey(0)
# reduce over [512, N] — pure bandwidth test
score = jax.random.randint(key, (512, N), 0, 2**30, dtype=jnp.int32)
dt = timeit("sum 512x135k", jax.jit(lambda s: jnp.sum(s, axis=1)), score)
print(f"  -> {512*N*4/dt/1e9:.0f} GB/s")

# top_k with result reduced to scalar (prevents any laziness)
f = jax.jit(lambda s: jnp.sum(jax.lax.top_k(-s, 256)[0]))
dt = timeit("topk 512x135k->256 (sum)", f, score)

# the actual chunk_fn shape from _select_per_tile
from d3ga_tpu.raster.tiles import _select_per_tile, BIG_RANK
xy = jax.random.uniform(key, (N,2), minval=0, maxval=600)
radius = jax.random.randint(key, (N,), 1, 30)
from d3ga_tpu.raster.project import tile_rect
rects = tile_rect(xy, radius, 16, 42, 64)
valid = jnp.ones(N, bool)
rank = jnp.arange(N, dtype=jnp.int32)
f2 = jax.jit(lambda r0,r1,r2,r3,v,rk: _select_per_tile((r0,r1,r2,r3), v, 42, 64, rk, 256)[0].sum())
dt = timeit("full select 2688 tiles", f2, *rects, valid, rank)
