"""Test the WIDE-ROW hypothesis: the axon runtime taxes data-moving ops
(gather/scatter/sort AND pallas operand I/O) per ROW, so bitcasting a
[T, K, 16] operand to [T, K/8, 128] (same bytes, 8x fewer rows) should
cut a Pallas call's wall cost ~8x while device time stays flat.

Measures, chained (20 iters in one jit, unroll=20, one readback):
  A  pallas passthrough  rec [T, K, 16]    in+out   (688k rows each way)
  B  pallas passthrough  rec [T, 32, 128]  in+out   (86k rows each way)
  C  pallas passthrough  img [H, W, 4]     out only (688k rows)
  D  pallas passthrough  img [H, W*4]      out only (1k rows)
  E  row gather 688k x [16]   (the rec gather)
  F  row gather 86k x [128]   (same bytes, wide rows; contiguous runs)
  G  searchsorted scan_unrolled (2689 queries in 2.16M)
  H  hand-rolled binary search  (same queries; 22 chained gathers)

Run (ONE TPU process at a time): python tools/widerow_probe.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 20
T, K, CR = 2688, 256, 16
H, W = 1024, 672
M = 4 * 4 * 135000


def chain(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            return fn(*a, carry), None

        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS, unroll=ITERS)[0]

    try:
        float(np.asarray(run(*args)))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(run(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {best / ITERS * 1000:8.2f} ms/iter", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


def _pass_body(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 1.000001


def passthrough(x, bs):
    grid = (x.shape[0] // bs,)
    spec = pl.BlockSpec((bs,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))
    return pl.pallas_call(
        _pass_body, grid=grid, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


key = jax.random.PRNGKey(0)
rec3 = jax.random.normal(key, (T, K, CR), jnp.float32)
recw = rec3.reshape(T, K * CR // 128, 128)
img3 = jax.random.normal(key, (H, W, 4), jnp.float32)
imgw = img3.reshape(H, W * 4)

chain("A pallas pass rec [T,K,16]", lambda x, c: jnp.sum(passthrough(x + c * 1e-30, 4)) * 1e-30, rec3)
chain("B pallas pass rec [T,32,128]", lambda x, c: jnp.sum(passthrough(x + c * 1e-30, 4)) * 1e-30, recw)
chain("C pallas pass img [H,W,4]", lambda x, c: jnp.sum(passthrough(x + c * 1e-30, 16)) * 1e-30, img3)
chain("D pallas pass img [H,W*4]", lambda x, c: jnp.sum(passthrough(x + c * 1e-30, 16)) * 1e-30, imgw)

N = 135001
records = jax.random.normal(key, (N, CR), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (T, K), 0, N)
chain("E gather 688k x [16] rows", lambda r, i, c: jnp.sum(r[i + (c * 1e-30).astype(jnp.int32)]) * 1e-30, records, idx)

rec_sorted = jax.random.normal(key, (M // 8 + 64, 128), jnp.float32)
idxw = jax.random.randint(jax.random.PRNGKey(2), (T, 1), 0, M // 8) + jnp.arange(
    K * CR // 128, dtype=jnp.int32
)[None, :]
chain("F gather 86k x [128] rows (strided runs)", lambda r, i, c: jnp.sum(r[i + (c * 1e-30).astype(jnp.int32)]) * 1e-30, rec_sorted, idxw)

keys_sorted = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (M,), 0, 2**30))
queries = (jnp.arange(T + 1, dtype=jnp.int32) * (2**30 // (T + 1))).astype(jnp.int32)


def f_ss(ks, q, c):
    s = jnp.searchsorted(ks, q + (c * 1e-30).astype(jnp.int32), method="scan_unrolled")
    return jnp.sum(s).astype(jnp.float32) * 1e-30


def f_bs(ks, q, c):
    q = q + (c * 1e-30).astype(jnp.int32)
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, ks.shape[0], jnp.int32)
    for _ in range(int(np.ceil(np.log2(ks.shape[0]))) + 1):
        mid = (lo + hi) // 2
        go = ks[jnp.minimum(mid, ks.shape[0] - 1)] < q
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return jnp.sum(lo).astype(jnp.float32) * 1e-30


chain("G searchsorted scan_unrolled 2689/2.16M", f_ss, keys_sorted, queries)
chain("H binary search 2689/2.16M", f_bs, keys_sorted, queries)
