import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp, numpy as np

rng = np.random.default_rng(0)
SRC = jnp.asarray(rng.normal(size=(135_000, 9)), jnp.float32)
IDX = [jnp.asarray(rng.integers(0, 135_000, size=172_032), jnp.int32) for _ in range(16)]
KEYS = [jnp.asarray(rng.integers(0, 2**30, size=540_000), jnp.int32) for _ in range(4)]

def timed(name, f, *a):
    jf = jax.jit(f)
    float(np.asarray(jf(*a)))
    t0 = time.perf_counter(); float(np.asarray(jf(*a))); dt1 = time.perf_counter()-t0
    t0 = time.perf_counter(); float(np.asarray(jf(*a))); dt2 = time.perf_counter()-t0
    print(f"{name:40s} {min(dt1,dt2)*1000:8.2f} ms", flush=True)

# N independent gathers (same total rows when summed? no: each 172k rows)
for n in (1, 4, 16):
    def f(src, n=n):
        acc = jnp.float32(0)
        for i in range(n):
            acc = acc + jnp.sum(src[IDX[i]]) * 1e-30
        return acc
    timed(f"{n} independent gathers 172k rows", f, SRC)

# one BIG gather with same rows as 16 small
bigidx = jnp.concatenate(IDX)
timed("1 gather 2.75M rows", lambda src: jnp.sum(src[bigidx]) * 1e-30, SRC)

# N independent sorts
for n in (1, 4):
    def f(k0, n=n):
        acc = jnp.float32(0)
        for i in range(n):
            acc = acc + jnp.float32(jnp.sort(KEYS[i] + (k0 > 1e30).astype(jnp.int32))[0]) * 1e-30
        return acc
    timed(f"{n} independent sorts 540k", f, jnp.float32(0))
