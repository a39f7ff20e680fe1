"""Micro-probe the ct blend kernel's tiles-per-program (G_CT): is the
custom call really per-PROGRAM-overhead-bound (fwd ~2.0 ms ~= 384
programs x ~5 us at G=8, tools/trace_lanes.py)? Times pallas fwd and
fwd+bwd ALONE (chained, data-dependent) at a given G — a 20x smaller
compile than bench.py's unrolled scan, so G values whose bench compile
blows the budget can still be measured.

Run: PYTHONPATH=/root/repo D3GA_G_CT=16 python tools/gct_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

ITERS = 20
T_Y, T_X, K, C = 64, 42, 256, 3
CR = 6 + C
T = T_Y * T_X


def chain(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            return fn(*a, carry), None

        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS, unroll=ITERS)[0]

    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    dt = time.perf_counter() - t0
    print(
        f"{name:40s} {dt / ITERS * 1000:8.2f} ms/iter  (compile {compile_s:.0f}s)",
        flush=True,
    )


def main():
    from d3ga_tpu.raster.pallas_blend_ct import G_CT, blend_image_ct

    rng = np.random.default_rng(0)
    rec = np.zeros((T, CR, K), np.float32)
    rec[:, 0] = rng.uniform(0, T_X * 16, size=(T, K))
    rec[:, 1] = rng.uniform(0, T_Y * 16, size=(T, K))
    rec[:, 2] = 0.05
    rec[:, 4] = 0.05
    rec[:, 5] = rng.uniform(0.2, 0.9, size=(T, K))
    rec[:, 6:] = rng.uniform(size=(T, C, K))
    rec = jnp.asarray(rec)
    counts = jnp.asarray(
        rng.integers(0, K + 1, size=T).astype(np.int32)
    )

    print(f"G_CT={G_CT}  grid programs={T_Y * ((T_X + (-T_X) % G_CT) // G_CT)}")

    def fwd(r, c):
        return jnp.sum(blend_image_ct(r + c, counts, T_X, T_Y, C, False))

    chain("ct blend fwd", fwd, rec)

    def fwdbwd(r, c):
        return jnp.sum(jax.grad(lambda x: fwd(x, c))(r))

    chain("ct blend fwd+bwd", fwdbwd, rec)


if __name__ == "__main__":
    main()
