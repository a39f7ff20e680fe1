"""Round-5 probe: can a Pallas segmented-sum backward-combine beat the
9.9 ms XLA scatter-add (sort.9 0.75 + fusion.23 9.13, tools/trace_lanes.py)?

The planned kernel consumes cotangent rows SORTED by Gaussian id and
does windowed one-hot-matmul segment sums (runs <= dup^2). Whether it
can win hinges on what producing the sorted input costs, measured here
at Goliath scale (m = T*K = 688,128 rows, CR = 12, N = 135,000):

  A. the XLA scatter-add itself (the 9.9 ms line to beat)
  B. key-only sort (idx, iota)            — the cheap part
  C. sort carrying all 12 f32 columns     — payload-carry variant
  D. sort carrying 6 bf16-packed columns  — half the payload operands
  E. row gather g[perm] [688k, 12]        — gather-after-argsort variant
  F. lane-padding theory: elementwise over [688k,12] vs [688k,128] vs
     [12,688k] vs [5376,1536] (same 8.25M elements, different last-dim
     packing) — TPU HBM tiles pad the minor dim to 128, so a [.,12] f32
     array may move 10.7x its logical bytes
  G. 4 shifted-add segmented passes over sorted [m,12] (the in-window
     reduction, XLA-level upper bound for the kernel's VPU work)
  H. swapaxes [T,CR,K] -> [m,CR] relayout (feeds the scatter today)
  I. windowed one-hot matmul segsum in PURE XLA (the kernel's algorithm
     without Pallas: 132 windows x [12, 9344] @ [9344, 1024]) given
     pre-sorted inputs

All chained x20 inside one jitted scan (unroll=20), carry-dependent so
nothing hoists (PERF_NOTES round-4 probe trap), one host readback.

Run: PYTHONPATH=/root/repo python tools/segsum_probe.py
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
CR = 12
DUP2 = 9
M = T * K


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
    except Exception as e:  # noqa: BLE001
        print(f"{name:58s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(M, CR)), jnp.float32)
# realistic idx: ~35% live rows pointing at N gaussians (<= dup^2 repeats
# by construction in the real pipeline; random here — sort cost is
# distribution-insensitive), the rest the N sentinel
live = rng.random(M) < 0.35
idx_real = np.where(live, rng.integers(0, N, size=M), N).astype(np.int32)
idx = jnp.asarray(idx_real)
perm = jnp.asarray(rng.permutation(M).astype(np.int32))
idx_sorted = jnp.asarray(np.sort(idx_real))
g_ct = jnp.asarray(rng.normal(size=(T, CR, K)), jnp.float32)


def a_scatter(g, idx, c):
    out = jnp.zeros((N + 1, CR), jnp.float32).at[idx].add(g + c, mode="drop")
    return out[0, 0]


def b_sort_key(idx, c):
    iota = jnp.arange(M, dtype=jnp.int32)
    k, p = jax.lax.sort((idx + c.astype(jnp.int32) * 0 + (c > 1e30).astype(jnp.int32), iota), num_keys=1)
    return p[0].astype(jnp.float32) + k[0].astype(jnp.float32)


def c_sort_12payload(idx, g, c):
    cols = tuple((g[:, i] + c) for i in range(CR))
    outs = jax.lax.sort((idx,) + cols, num_keys=1)
    return outs[1][0] + outs[-1][-1]


def d_sort_6packed(idx, g, c):
    gb = (g + c).astype(jnp.bfloat16).reshape(M, CR // 2, 2)
    packed = jax.lax.bitcast_convert_type(gb, jnp.int32).reshape(M, CR // 2)
    cols = tuple(packed[:, i] for i in range(CR // 2))
    outs = jax.lax.sort((idx,) + cols, num_keys=1)
    return outs[1][0].astype(jnp.float32)


def e_gather_perm(g, perm, c):
    rows = (g + c)[perm]
    return rows[0, 0] + rows[-1, -1]


def f_elem(x, c):
    y = x * 1.0001 + c
    return y[0, 0] + y[-1, -1]


def g_shiftadd(idx_s, g, c):
    acc = g + c
    shift = 1
    while shift < DUP2:
        nxt = jnp.concatenate([acc[shift:], jnp.zeros((shift, CR), acc.dtype)], 0)
        ok = jnp.concatenate([idx_s[shift:] == idx_s[:-shift], jnp.zeros((shift,), bool)])
        acc = acc + jnp.where(ok[:, None], nxt, 0.0)
        shift *= 2
    return acc[0, 0] + acc[-1, -1]


def h_relayout(g_ct, c):
    out = jnp.swapaxes(g_ct + c, 1, 2).reshape(M, CR)
    return out[0, 0] + out[-1, -1]


def i_window_matmul(idx_s, g, c):
    # pure-XLA rehearsal of the kernel: gaussian-blocks of 1024, window
    # 1024*dup2 + 128 sorted rows starting at a per-block offset
    B = 1024
    NB = (N + B - 1) // B  # 132
    W = B * DUP2 + 128
    starts = jnp.searchsorted(
        idx_s, jnp.arange(NB, dtype=jnp.int32) * B, method="scan_unrolled"
    ).astype(jnp.int32)
    starts = (starts // 128) * 128
    g_cm = (g + c).T  # [CR, M]
    g_pad = jnp.pad(g_cm, ((0, 0), (0, W)))
    idx_pad = jnp.pad(idx_s, (0, W), constant_values=N + 1)

    def one(start, base):
        win = jax.lax.dynamic_slice(g_pad, (0, start), (CR, W))  # [CR, W]
        iw = jax.lax.dynamic_slice(idx_pad, (start,), (W,))
        onehot = (iw[:, None] == (base + jnp.arange(B, dtype=jnp.int32))[None, :])
        hi = win.astype(jnp.bfloat16)
        lo = (win - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ob = onehot.astype(jnp.bfloat16)
        out = jax.lax.dot(hi, ob, preferred_element_type=jnp.float32) + jax.lax.dot(
            lo, ob, preferred_element_type=jnp.float32
        )
        return out  # [CR, B]

    outs = jax.vmap(one)(starts, jnp.arange(NB, dtype=jnp.int32) * B)  # [NB, CR, B]
    return outs[0, 0, 0] + outs[-1, -1, -1]


chain("A scatter-add [688k->135k,12] (the line to beat)", a_scatter, g, idx)
chain("B sort (idx, iota) 2-op", b_sort_key, idx)
chain("C sort (idx + 12 f32 payloads)", c_sort_12payload, idx, g)
chain("D sort (idx + 6 bf16-packed i32 payloads)", d_sort_6packed, idx, g)
chain("E row gather g[perm] [688k,12]", e_gather_perm, g, perm)
chain("F1 elementwise [688k, 12] f32", f_elem, g)
chain("F2 elementwise [688k, 128] f32", f_elem, jnp.asarray(rng.normal(size=(M, 128)), jnp.float32))
chain("F3 elementwise [12, 688k] f32", f_elem, jnp.asarray(rng.normal(size=(CR, M)), jnp.float32))
chain("F4 elementwise [5376, 1536] f32", f_elem, jnp.asarray(rng.normal(size=(5376, 1536)), jnp.float32))
chain("G 4 shifted-add passes over sorted [688k,12]", g_shiftadd, idx_sorted, g)
chain("H swapaxes [T,CR,K]->[m,CR] relayout", h_relayout, g_ct)
chain("I windowed one-hot matmul segsum (XLA rehearsal)", i_window_matmul, idx_sorted, g)
print("done", flush=True)
