"""Compile-check + standalone A/B for pallas_extract on the REAL Mosaic
backend (interpret CI can't catch Mosaic verification errors). Goliath
extraction scale: m ~ 1.2M sorted stream, T = 2688 tiles, kk = 256.
Compares the Pallas kernel against the vmapped-dynamic_slice lowering
(the round-5 default's 2.15 ms while loop) with chained dispatch and
one final readback (CLAUDE.md timing rule).

Run: PYTHONPATH=/root/repo python tools/extract_compile_check.py
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

from d3ga_tpu.raster.pallas_extract import extract_slices

ITERS = 20


def chain(fn, stream, starts):
    """ITERS dependent extractions (stream perturbed by a scalar digest
    of the previous output so XLA cannot collapse the chain)."""

    def body(carry, _):
        s = stream + (carry % 2)  # i32 perturbation, dependency-carrying
        out = fn(s, starts)
        return out[0, 0], out

    carry, outs = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
    return carry, outs[-1]


def main():
    rng = np.random.default_rng(0)
    m, T, kk = 1_216_215, 2688, 256  # deliberately non-128-aligned m
    stream = jnp.asarray(rng.integers(0, 1 << 30, size=(m,), dtype=np.int32))
    starts = jnp.asarray(
        np.sort(rng.integers(0, m + 1, size=(T,), dtype=np.int32))
    )

    def pallas_fn(s, st):
        return extract_slices(s, st, kk)

    def slice_fn(s, st):
        pad = jnp.concatenate([s, jnp.zeros((kk,), s.dtype)])
        return jax.vmap(lambda x: jax.lax.dynamic_slice(pad, (x,), (kk,)))(st)

    # correctness (compiled, single shot)
    out = np.asarray(jax.jit(pallas_fn)(stream, starts))
    padnp = np.concatenate([np.asarray(stream), np.zeros((kk + 128,), np.int32)])
    ref = np.stack([padnp[s : s + kk] for s in np.asarray(starts)])
    ok = np.array_equal(out, ref)
    print(f"compiled parity vs numpy windows: {'EXACT' if ok else 'MISMATCH'}")
    assert ok

    for name, fn in (("pallas", pallas_fn), ("slice_vmap", slice_fn)):
        cf = jax.jit(lambda s, st, fn=fn: chain(fn, s, st))
        c, o = cf(stream, starts)  # warmup/compile
        float(np.asarray(c))
        t0 = time.perf_counter()
        c, o = cf(stream, starts)
        _ = float(np.asarray(c)) + float(np.asarray(o).ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:10s}: {dt * 1e3:7.3f} ms/iter (chained x{ITERS})")

    print("OK")


if __name__ == "__main__":
    main()
