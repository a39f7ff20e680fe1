"""Probe two device-dominant raster lines exposed by the per-lane trace
(tools/trace_lanes.py; wall == device on this rig — the round-3
"device-side 3x cheaper" was a trace-parse artifact):

  1. the selection SEGMENT GATHER seg = lo_s[idx2] — 688k scalar
     elements at ~7 ns/elt (4.91 ms) while ROW gathers run ~0.2 ns/elt.
     Candidate: gather 128-wide ROWS covering each tile's contiguous
     segment (3 rows/tile = 8k row reads), then realign in-row with a
     take_along_axis whose source rows are only 384 lanes.

  2. the backward SCATTER-ADD combine (9.13 ms fusion.23 + 0.75 ms
     index sort) — XLA lowers it as sort + segmented combine anyway.
     Candidate chain done explicitly with run-length <= dup^2 structure:
       a. sort (idx [688k], iota) by idx
       b. permutation ROW gather g[perm] [688k, 9]
       c. ceil(log2(9)) = 4 shifted-add passes -> run sums at run starts
       d. run-start lookup per Gaussian via merge-searchsorted
       e. [135k] sorted-position row extract
     Every step is dense / row-gather / sort — no elementwise scatter.

Run: PYTHONPATH=/root/repo python tools/seg_gather_probe.py
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
N = 135_000
T, K = 2688, 256
DUP2 = 9
M = DUP2 * N
CR = 9


def chain(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            return fn(*a, carry), None

        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS, unroll=ITERS)[0]

    try:
        float(np.asarray(run(*args)))
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        dt = time.perf_counter() - t0
        print(f"{name:58s} {dt / ITERS * 1000:8.2f} ms/iter", flush=True)
        return dt / ITERS * 1000
    except Exception as e:  # noqa: BLE001
        print(f"{name:58s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


rng = np.random.default_rng(0)
# realistic segment structure: T segments with mean M/T entries
starts_np = np.sort(rng.integers(0, M, size=T + 1)).astype(np.int32)
starts_np[0], starts_np[-1] = 0, M
lo_np = rng.integers(0, N, size=M).astype(np.int32)
starts = jnp.asarray(starts_np)
lo_s = jnp.asarray(lo_np)
idx2 = jnp.minimum(starts[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None], M - 1)

g688 = jnp.asarray(rng.normal(size=(T * K, CR)), jnp.float32)
idx_flat = jnp.asarray(rng.integers(0, N, size=T * K), jnp.int32)


def a_baseline(c):
    return (lo_s + c.astype(jnp.int32))[idx2].astype(jnp.float32)[0, 0]


def b_widerow(c):
    mpad = (M + 127) // 128 * 128
    lo2d = jnp.pad(lo_s + c.astype(jnp.int32), (0, mpad - M)).reshape(-1, 128)
    r0 = starts[:-1] // 128
    rows = lo2d[r0[:, None] + jnp.arange(3, dtype=jnp.int32)[None]]  # [T,3,128]
    wide = rows.reshape(T, 384)
    off = (starts[:-1] % 128)[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
    seg = jnp.take_along_axis(wide, off, axis=1)
    return seg.astype(jnp.float32)[0, 0]


def c_scatter(g, idx, c):
    out = jnp.zeros((N, CR), jnp.float32).at[idx].add(g + c)
    return out[0, 0]


def d_sorted_runs(g, idx, c):
    g = g + c
    m = idx.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    idx_s, perm = jax.lax.sort((idx, iota), num_keys=1)
    gp = g[perm]                                     # [688k, CR] row gather
    # segmented suffix-sum within runs (runs are <= DUP2 long):
    # after pass j, row p holds sum of rows p .. p+2^j-1 of its run
    acc = gp
    same = None
    for shift in (1, 2, 4, 8):
        nxt = jnp.concatenate(
            [acc[shift:], jnp.zeros((shift, CR), acc.dtype)], axis=0
        )
        ok = jnp.concatenate(
            [idx_s[shift:] == idx_s[:-shift], jnp.zeros((shift,), bool)]
        )
        acc = acc + jnp.where(ok[:, None], nxt, 0.0)
        if shift >= DUP2:
            break
    # run starts: position of first occurrence of each Gaussian id.
    # both idx_s and arange(N) are sorted -> merge-based searchsorted
    pos = jnp.searchsorted(idx_s, jnp.arange(N, dtype=jnp.int32), method="sort")
    pos_c = jnp.minimum(pos, m - 1)
    hit = idx_s[pos_c] == jnp.arange(N, dtype=jnp.int32)
    out = jnp.where(hit[:, None], acc[pos_c], 0.0)   # [N] sorted-pos rows
    return out[0, 0]


def d2_sorted_runs_scan(g, idx, c):
    """Like d but run starts via the scan_unrolled searchsorted."""
    g = g + c
    m = idx.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    idx_s, perm = jax.lax.sort((idx, iota), num_keys=1)
    gp = g[perm]
    acc = gp
    for shift in (1, 2, 4, 8):
        nxt = jnp.concatenate(
            [acc[shift:], jnp.zeros((shift, CR), acc.dtype)], axis=0
        )
        ok = jnp.concatenate(
            [idx_s[shift:] == idx_s[:-shift], jnp.zeros((shift,), bool)]
        )
        acc = acc + jnp.where(ok[:, None], nxt, 0.0)
        if shift >= DUP2:
            break
    pos = jnp.searchsorted(
        idx_s, jnp.arange(N, dtype=jnp.int32), method="scan_unrolled"
    )
    pos_c = jnp.minimum(pos, m - 1)
    hit = idx_s[pos_c] == jnp.arange(N, dtype=jnp.int32)
    out = jnp.where(hit[:, None], acc[pos_c], 0.0)
    return out[0, 0]


if __name__ == "__main__":
    chain("1a seg gather baseline lo_s[idx2] 688k elts", a_baseline)
    chain("1b seg gather wide-row + in-row realign", b_widerow)
    chain("2c scatter-add baseline [688k -> 135k, 9]", c_scatter, g688, idx_flat)
    chain("2d sorted-run reduce (merge searchsorted)", d_sorted_runs, g688, idx_flat)
    chain("2d2 sorted-run reduce (scan searchsorted)", d2_sorted_runs_scan, g688, idx_flat)
