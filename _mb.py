import time, jax, jax.numpy as jnp, numpy as np

def timeit(name, f, *args, n=5):
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(name, f"{(time.perf_counter()-t0)/n*1000:.1f} ms")

N = 135_000
D = 16
key = jax.random.PRNGKey(0)

# 1. big sort of N*D int32 keys
keys32 = jax.random.randint(key, (N*D,), 0, 2**30, dtype=jnp.int32)
timeit("sort 2.16M i32", jax.jit(jnp.sort), keys32)

# sort with argsort (need values too)
timeit("argsort 2.16M i32", jax.jit(jnp.argsort), keys32)

# sort_key_val
vals = jnp.arange(N*D, dtype=jnp.int32)
f_skv = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
timeit("sort_kv 2.16M", f_skv, keys32, vals)

# 2. segment boundaries via searchsorted
sorted_keys = jnp.sort(keys32)
T = 2688
bounds = jnp.arange(T, dtype=jnp.int32) * (2**30 // T)
timeit("searchsorted T", jax.jit(lambda s, b: jnp.searchsorted(s, b)), sorted_keys, bounds)

# 3. scatter of 2.16M entries into T*K
K = 256
idx = jax.random.randint(key, (N*D,), 0, T*K, dtype=jnp.int32)
def scat(idx, vals):
    out = jnp.full((T*K,), 2**30, jnp.int32)
    return out.at[idx].min(vals, mode='drop')
timeit("scatter-min 2.16M", jax.jit(scat), idx, vals)

# 4. one chunk of current select: [512, N] ops + top_k
score = jax.random.randint(key, (512, N), 0, 2**30, dtype=jnp.int32)
timeit("topk 512x135k->256", jax.jit(lambda s: jax.lax.top_k(-s, 256)), score)

# 5. hierarchical: topk over 4096 for 2688 tiles
score2 = jax.random.randint(key, (2688, 4096), 0, 2**30, dtype=jnp.int32)
timeit("topk 2688x4096->256", jax.jit(lambda s: jax.lax.top_k(-s, 256)), score2)
score3 = jax.random.randint(key, (54, N), 0, 2**30, dtype=jnp.int32)
timeit("topk 54x135k->4096", jax.jit(lambda s: jax.lax.top_k(-s, 4096)), score3)
