"""Probe: can the backward scatter-add (10.8 ms at Goliath scale) be
beaten by restructuring?

Candidates measured (chained, same protocol as sort_probe.py):
  A. baseline scatter-ADD [688k rows -> 135k, 9]
  B. scatter-SET with UNIQUE indices into the duplicate-slot layout
     [16N, 9] (every (tile, slot) entry owns a distinct duplicate slot
     q = d*N + r; dead slots point out of bounds and are dropped), then
     a dense (16, N, 9) axis-0 sum — no combiner, no read-modify-write.
  C. same as B but scatter-ADD (separates uniqueness from layout).
  D. multi-operand reorder sort: lax.sort((depth, 11 payload cols))
     vs argsort + 11-col gather (the current depth reorder).

Run: PYTHONPATH=/root/repo python tools/scatter_probe.py
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
M = 16 * N


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
        print(f"{name:52s} {dt / ITERS * 1000:8.2f} ms/iter", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


rng = np.random.default_rng(0)
g688 = jnp.asarray(rng.normal(size=(T * K, 9)), jnp.float32)
idx_r = jnp.asarray(rng.integers(0, N, size=T * K), jnp.int32)
# unique duplicate-slot ids: sample without replacement from [0, 16N)
q_unique = jnp.asarray(
    rng.choice(M, size=T * K, replace=False).astype(np.int32)
)
# ~35% dead slots pointing out of bounds (dropped), like padded tiles
dead = rng.uniform(size=T * K) < 0.35
q_mixed = jnp.asarray(
    np.where(dead, M + 7, np.asarray(q_unique)).astype(np.int32)
)

chain(
    "A scatter-ADD [688k -> 135k, 9]",
    lambda g, i, s: jnp.sum(
        jnp.zeros((N + 1, 9)).at[i + (s > 1e30).astype(jnp.int32)].add(g)
    )
    * 1e-30,
    g688,
    idx_r,
)
chain(
    "B scatter-SET unique [688k -> 16N, 9] + sum16",
    lambda g, q, s: jnp.sum(
        jnp.zeros((M, 9))
        .at[q + (s > 1e30).astype(jnp.int32)]
        .set(g, unique_indices=True, mode="drop")
        .reshape(16, N, 9)
        .sum(0)
    )
    * 1e-30,
    g688,
    q_mixed,
)
chain(
    "B2 scatter-SET unique, no sum (isolate scatter)",
    lambda g, q, s: jnp.sum(
        jnp.zeros((M, 9))
        .at[q + (s > 1e30).astype(jnp.int32)]
        .set(g, unique_indices=True, mode="drop")[:9]
    )
    * 1e-30,
    g688,
    q_mixed,
)
chain(
    "C scatter-ADD [688k -> 16N, 9] + sum16",
    lambda g, q, s: jnp.sum(
        jnp.zeros((M, 9))
        .at[q + (s > 1e30).astype(jnp.int32)]
        .add(g, mode="drop")
        .reshape(16, N, 9)
        .sum(0)
    )
    * 1e-30,
    g688,
    q_mixed,
)
chain(
    "D0 dense sum16 alone [16, N, 9]",
    lambda g, s: jnp.sum((g + s * 1e-30).reshape(16, N, 9).sum(0)) * 1e-30,
    jnp.asarray(rng.normal(size=(M, 9)), jnp.float32),
)

# D. depth reorder: argsort+gather vs one multi-operand sort
d135 = jnp.asarray(rng.uniform(1, 10, size=N), jnp.float32)
rec = jnp.asarray(rng.normal(size=(N, 9)), jnp.float32)
rad = jnp.asarray(rng.normal(size=N), jnp.float32)
val = jnp.asarray(rng.integers(0, 2, size=N), jnp.int32)

chain(
    "D1 argsort 135k + reorder [135k, 11 cols]",
    lambda d, r, ra, v, s: (
        lambda o: jnp.sum(r[o]) + jnp.sum(ra[o]) + jnp.float32(v[o][0])
    )(jnp.argsort(d + s * 1e-30, stable=True))
    * 1e-30,
    d135,
    rec,
    rad,
    val,
)
chain(
    "D2 ONE multi-operand sort (depth + 11 payloads)",
    lambda d, r, ra, v, s: (
        lambda outs: sum(jnp.sum(o) for o in outs[1:11]) + outs[11][0]
    )(
        jax.lax.sort(
            (d + s * 1e-30,)
            + tuple(r[:, i] for i in range(9))
            + (ra, v.astype(jnp.float32)),
            num_keys=1,
            is_stable=True,
        )
    )
    * 1e-30,
    d135,
    rec,
    rad,
    val,
)
