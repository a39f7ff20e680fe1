"""Probe the slot-map backward's component costs at Goliath scale
(chained protocol, same as scatter_probe.py): the end-to-end bench
measured slotmap SLOWER than the scatter-add it replaces (19.0 vs 21.3
Mpix/s) — which added op eats the budget?

  A. baseline scatter-add [688k -> 135k, 12]  (what slotmap replaces)
  B. the inverse-permutation sort: lax.sort((perm [1.2M], payload))
  C. the cummax segment-start scan (associative_scan over 1.2M i32)
  D. the backward gather g_ext[slot_map] [135k, 9] -> [135k, 9, 12] + sum
  E. D with flat [1.2M] indices (reshape afterwards)
  F. 3-operand selection sort (hi, lo, flat) vs 2-operand (hi, lo)

Run: PYTHONPATH=/root/repo python tools/slotmap_probe.py
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
        print(f"{name:58s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


rng = np.random.default_rng(0)
g688 = jnp.asarray(rng.normal(size=(T * K, 12)), jnp.float32)
idx_r = jnp.asarray(rng.integers(0, N, size=T * K), jnp.int32)
perm = jnp.asarray(rng.permutation(M).astype(np.int32))
slot_vals = jnp.asarray(rng.integers(0, T * K + 1, size=M), jnp.int32)
slot_map = jnp.asarray(
    rng.integers(0, T * K + 1, size=(N, DUP2)), jnp.int32
)
hi = jnp.asarray(rng.integers(0, 2**30, size=M), jnp.int32)
lo = jnp.asarray(rng.integers(0, N, size=M), jnp.int32)
flat = jnp.asarray(rng.permutation(M).astype(np.int32))
hi_s = jnp.sort(hi)


def a_scatter(g, idx, c):
    out = jnp.zeros((N, 12), jnp.float32).at[idx].add(g + c)
    return out[0, 0]


def b_invsort(p, s, c):
    _, inv = jax.lax.sort((p, s + c.astype(jnp.int32)), num_keys=1)
    return inv[0].astype(jnp.float32)


def c_cummax(h, c):
    m = h.shape[0]
    pidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), h[1:] != h[:-1]])
    seg = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pidx + c.astype(jnp.int32), 0)
    )
    return seg[-1].astype(jnp.float32)


def d_gather2d(g, sm, c):
    g_ext = jnp.concatenate([g + c, jnp.zeros((1, 12), jnp.float32)], axis=0)
    return g_ext[sm].sum(axis=1)[0, 0]


def e_gatherflat(g, sm, c):
    g_ext = jnp.concatenate([g + c, jnp.zeros((1, 12), jnp.float32)], axis=0)
    out = g_ext[sm.reshape(-1)].reshape(N, DUP2, 12).sum(axis=1)
    return out[0, 0]


def f_sort2(h, l, c):
    a, b = jax.lax.sort((h + c.astype(jnp.int32), l), num_keys=2)
    return b[0].astype(jnp.float32)


def f_sort3(h, l, f, c):
    a, b, d = jax.lax.sort((h + c.astype(jnp.int32), l, f), num_keys=2)
    return d[0].astype(jnp.float32)


if __name__ == "__main__":
    chain("A scatter-add [688k -> 135k, 12]", a_scatter, g688, idx_r)
    chain("B inverse sort (perm [1.2M], payload)", b_invsort, perm, slot_vals)
    chain("C cummax assoc-scan 1.2M", c_cummax, hi_s)
    chain("D bwd gather g_ext[[135k, 9]] + sum", d_gather2d, g688, slot_map)
    chain("E bwd gather flat [1.2M] + reshape sum", e_gatherflat, g688,
          slot_map)
    chain("F sel sort 2-op (hi, lo)", f_sort2, hi, lo)
    chain("F sel sort 2-key + 1 payload (hi, lo, flat)", f_sort3, hi, lo,
          flat)
