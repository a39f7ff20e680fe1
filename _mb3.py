import time, jax, jax.numpy as jnp, numpy as np

def timeit(name, f, *args, n=10):
    float(np.asarray(f(*args)).ravel()[0])  # warmup + compile
    t0=time.perf_counter()
    for _ in range(n):
        s = float(np.asarray(f(*args)).ravel()[0])  # force full sync via host readback
    dt=(time.perf_counter()-t0)/n
    print(name, f"{dt*1000:.2f} ms")
    return dt

a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096))
dt = timeit("matmul 4096 (137 GFLOP)", jax.jit(lambda a: jnp.sum(a @ a)), a)
print(f"  -> {137e9/dt/1e12:.1f} TFLOP/s")

N = 135_000
key = jax.random.PRNGKey(0)
score = jax.random.randint(key, (512, N), 0, 2**30, dtype=jnp.int32)
dt = timeit("sum 512x135k", jax.jit(lambda s: jnp.sum(s)), score)
print(f"  -> {512*N*4/dt/1e9:.0f} GB/s")
dt = timeit("topk 512x135k->256", jax.jit(lambda s: jnp.sum(jax.lax.top_k(-s, 256)[0])), score)
dt = timeit("topk 2688x4096->256", jax.jit(lambda s: jnp.sum(jax.lax.top_k(-s, 256)[0])), jax.random.randint(key, (2688, 4096), 0, 2**30, dtype=jnp.int32))
dt = timeit("topk 48x135k->4096", jax.jit(lambda s: jnp.sum(jax.lax.top_k(-s, 4096)[0])), jax.random.randint(key, (48, N), 0, 2**30, dtype=jnp.int32))
keys32 = jax.random.randint(key, (N*16,), 0, 2**30, dtype=jnp.int32)
timeit("sort 2.16M i32", jax.jit(lambda k: jnp.sum(jnp.sort(k)[:8])), keys32)
vals = jnp.arange(N*16, dtype=jnp.int32)
timeit("sort_kv 2.16M", jax.jit(lambda k, v: jnp.sum(jax.lax.sort((k, v), num_keys=1)[1][:8])), keys32, vals)
idx = jax.random.randint(key, (N*16,), 0, 2688*256, dtype=jnp.int32)
def scat(idx, vals):
    out = jnp.full((2688*256,), 2**30, jnp.int32)
    return jnp.sum(out.at[idx].min(vals, mode='drop')[:8])
timeit("scatter-min 2.16M", jax.jit(scat), idx, vals)
