import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp, numpy as np

def probe(n_ops):
    a = jnp.eye(8, dtype=jnp.float32)
    @jax.jit
    def run(x):
        for _ in range(n_ops):
            x = jax.lax.dot(x, a) + 1e-30  # chained dots: not fused together
        return x[0, 0]
    x = jnp.ones((8, 8), jnp.float32)
    float(np.asarray(run(x)))
    t0 = time.perf_counter(); float(np.asarray(run(x))); dt1 = time.perf_counter()-t0
    t0 = time.perf_counter(); float(np.asarray(run(x))); dt2 = time.perf_counter()-t0
    print(f"ops={n_ops:5d}  wall={min(dt1,dt2)*1000:8.2f} ms", flush=True)

for n in (10, 50, 200, 800):
    probe(n)
