"""Minimal compile + runtime probe for the fused select+blend kernel on
the real chip: small NB first (compile-time scaling check), then the
Goliath-scale kernel alone (no projection/sort), chained timing.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/fused_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from d3ga_tpu.raster.attic.pallas_fused import CHUNK, fused_select_blend
from d3ga_tpu.raster.attic.pallas_fused2 import fused_select_blend2

VARIANT = int(os.environ.get("FUSED_VARIANT", "1"))


def make_inputs(NB, NC, C, seed=0):
    rng = np.random.default_rng(seed)
    kb = NC * CHUNK
    # plausible records: block-local xy in [0, 128), conic ~ diag(0.05)
    x = rng.uniform(0, 128, size=(NB, kb)).astype(np.float32)
    y = rng.uniform(0, 128, size=(NB, kb)).astype(np.float32)
    A = rng.uniform(0.02, 0.3, size=(NB, kb)).astype(np.float32)
    B = rng.uniform(-0.01, 0.01, size=(NB, kb)).astype(np.float32)
    Cc = rng.uniform(0.02, 0.3, size=(NB, kb)).astype(np.float32)
    op = rng.uniform(0.3, 0.95, size=(NB, kb)).astype(np.float32)
    cols = rng.uniform(size=(NB, kb, C)).astype(np.float32)
    vals = np.concatenate(
        [np.stack([x, y, A, B, Cc, op], -1), cols,
         np.zeros((NB, kb, 16 - 6 - C), np.float32)], -1
    )
    # rects: ~2x2-tile footprints
    xm = (x // 16).astype(np.int32)
    ym = (y // 16).astype(np.int32)
    xM = np.minimum(xm + 2, 8)
    yM = np.minimum(ym + 2, 8)
    rects = xm | (xM << 8) | (ym << 16) | (yM << 24)
    if VARIANT == 2:
        return (
            jnp.asarray(vals.transpose(0, 2, 1).copy()),       # [NB, 16, kb]
            jnp.asarray(rects[:, None, :]),                     # [NB, 1, kb]
        )
    vals = vals.reshape(NB, NC, CHUNK, 16).transpose(0, 1, 3, 2).copy()
    return jnp.asarray(vals), jnp.asarray(rects.reshape(NB, NC, CHUNK))


def chain(name, fn, *args, iters=10):
    @jax.jit
    def run(*a):
        def body(_, s):
            out = fn(*a, s)
            return jnp.sum(out) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    r = run(*args)
    float(np.asarray(r))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} compile+1st {t_compile:7.1f}s   {dt:8.2f} ms/iter", flush=True)


SEL = fused_select_blend2 if VARIANT == 2 else fused_select_blend


def main():
    print(f"variant {VARIANT}")
    K = 256
    C = 3
    for NB, NC in ((2, 4), (8, 8)):
        vals, rects = make_inputs(NB, NC, C)
        chain(
            f"fwd NB={NB} NC={NC}",
            lambda v, r, s: SEL(v + s * 0, r, K, C, False)[0],
            vals, rects, iters=5,
        )

    # Goliath scale: NB=54, NC=32 (kb=4096)
    vals, rects = make_inputs(54, 32, C)
    chain(
        "fwd goliath NB=54 NC=32",
        lambda v, r, s: SEL(v + s * 0, r, K, C, False)[0],
        vals, rects,
    )

    def loss(v, r, s):
        out, _ = SEL(v + s * 0, r, K, C, False)
        return jnp.sum(out)

    chain(
        "fwd+bwd goliath",
        lambda v, r, s: jax.grad(loss)(v, r, s),
        vals, rects,
    )


if __name__ == "__main__":
    main()
