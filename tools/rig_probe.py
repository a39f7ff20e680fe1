"""Raw rig characterization: HBM bandwidth, MXU throughput, VPU
transcendental rate, gather rate — all chained-fori measured."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp, numpy as np

def chain(name, fn, *args, iters=10, work=None):
    @jax.jit
    def run(*a):
        def body(_, s):
            out = fn(*a, s)
            return jnp.sum(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    float(np.asarray(run(*args)))
    t0 = time.perf_counter(); float(np.asarray(run(*args)))
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {work/dt/1e9:8.1f} G/s" if work else ""
    print(f"{name:34s} {dt*1000:8.2f} ms{extra}", flush=True)

# E5 bandwidth: elementwise on 64MB
x = jnp.zeros((16 * 1024 * 1024,), jnp.float32)
chain("E5 eltwise 64MB (r+w 128MB)", lambda x, s: x * 1.0000001 + s, x, work=128e6)

# E6 matmul bf16 [4096x4096]^2
a = jnp.zeros((4096, 4096), jnp.bfloat16)
chain("E6 matmul bf16 4096^3 (137GF)", lambda a, s: jax.lax.dot(a + s.astype(jnp.bfloat16), a), a, work=137e9)

# E7 exp on 16M
chain("E7 exp 16M", lambda x, s: jnp.exp(x * 1e-30 + s), x, work=16e6)

# E8 random row gather: 688k rows of 9 f32 from [135k, 9]
src = jnp.zeros((135_000, 9), jnp.float32)
idx = jnp.asarray(np.random.default_rng(0).integers(0, 135_000, size=688_128), jnp.int32)
chain("E8 gather 688k x 9f32 (25MB)", lambda src, idx, s: src[idx + (s > 1e9).astype(jnp.int32)], src, idx, work=25e6)

# E9 argsort 135k
d = jnp.asarray(np.random.default_rng(1).uniform(size=135_000), jnp.float32)
chain("E9 argsort 135k", lambda d, s: jnp.argsort(d + s), d)

# E10 top_k [54, 135k] -> 4096 (isolated, no mask build)
sc = jnp.asarray(np.random.default_rng(2).integers(0, 2**30, size=(54, 135_000)), jnp.int32)
chain("E10 topk [54,135k]->4096", lambda sc, s: jax.lax.top_k(-(sc + (s > 1e9).astype(jnp.int32)[None]), 4096)[0], sc)

# E11 topk fine [2688, 4096] -> 256
sc2 = jnp.asarray(np.random.default_rng(3).integers(0, 4096, size=(2688, 4096)), jnp.int32)
chain("E11 topk [2688,4096]->256", lambda sc, s: jax.lax.top_k(-(sc + (s > 1e9).astype(jnp.int32)[None]), 256)[0], sc2)
