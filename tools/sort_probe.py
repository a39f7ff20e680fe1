"""Chained timings for the sort/gather/scatter primitives the binning
pipeline is built from — picks the cheapest selection structure.

Run: PYTHONPATH=/root/repo python tools/sort_probe.py
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
        print(f"{name:44s} {dt / ITERS * 1000:8.2f} ms/iter", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:80]}", flush=True)


rng = np.random.default_rng(0)
k216 = jnp.asarray(rng.integers(0, 2**30, size=2_160_000), jnp.int32)
k54 = jnp.asarray(rng.integers(0, 2**30, size=540_000), jnp.int32)
v216 = jnp.asarray(rng.integers(0, 2**18, size=2_160_000), jnp.int32)
d135 = jnp.asarray(rng.uniform(1, 10, size=135_000), jnp.float32)
rec = jnp.asarray(rng.normal(size=(135_001, 9)), jnp.float32)
idx688 = jnp.asarray(rng.integers(0, 135_000, size=(2688, 256)), jnp.int32)
g688 = jnp.asarray(rng.normal(size=(2688, 256, 9)), jnp.float32)

chain("sort 2.16M i32 1-key", lambda k, s: jnp.float32(jnp.sort(k + (s > 1e30))[0]) * 1e-30, k216)
chain("sort 540k i32 1-key", lambda k, s: jnp.float32(jnp.sort(k + (s > 1e30))[0]) * 1e-30, k54)
chain(
    "sort 2.16M i32 2-key lex",
    lambda k, v, s: jnp.float32(
        jax.lax.sort((k + (s > 1e30), v), num_keys=2)[1][0]
    )
    * 1e-30,
    k216,
    v216,
)
chain(
    "sort 2.16M i32 key+payload (num_keys=1)",
    lambda k, v, s: jnp.float32(
        jax.lax.sort((k + (s > 1e30), v), num_keys=1)[1][0]
    )
    * 1e-30,
    k216,
    v216,
)
chain("argsort 135k f32", lambda d, s: jnp.float32(jnp.argsort(d + s * 1e-30)[0]) * 1e-30, d135)
chain(
    "inv-perm scatter 135k",
    lambda d, s: jnp.float32(
        jnp.zeros(135_000, jnp.int32)
        .at[jnp.argsort(d + s * 1e-30)]
        .set(jnp.arange(135_000, dtype=jnp.int32))[0]
    )
    * 1e-30,
    d135,
)
chain(
    "reorder records [135k,9]",
    lambda rec, d, s: jnp.sum(rec[jnp.argsort(d + s * 1e-30)]) * 1e-30,
    rec,
    d135,
)
chain(
    "gather rec [2688,256,9]",
    lambda rec, i, s: jnp.sum(rec[i + (s > 1e30).astype(jnp.int32)]) * 1e-30,
    rec,
    idx688,
)
chain(
    "scatter-add rec grads [688k->135k,9]",
    lambda g, i, s: jnp.sum(
        jnp.zeros((135_001, 9)).at[i + (s > 1e30).astype(jnp.int32)].add(g)
    )
    * 1e-30,
    g688,
    idx688,
)
idx_sorted = jnp.sort(idx688.reshape(-1)).reshape(2688, 256)
g_flat = g688.reshape(-1, 9)
chain(
    "scatter-add SORTED idx [688k->135k,9]",
    lambda g, i, s: jnp.sum(
        jnp.zeros((135_001, 9))
        .at[i.reshape(-1) + (s > 1e30).astype(jnp.int32)]
        .add(g.reshape(-1, 9), indices_are_sorted=True)
    )
    * 1e-30,
    g688,
    idx_sorted,
)
chain(
    "scatter-add bf16 [688k->135k,9]",
    lambda g, i, s: jnp.sum(
        jnp.zeros((135_001, 9), jnp.bfloat16)
        .at[i + (s > 1e30).astype(jnp.int32)]
        .add(g.astype(jnp.bfloat16))
    ).astype(jnp.float32)
    * 1e-30,
    g688,
    idx688,
)
chain(
    "gather-by-perm+segsum [688k,9]",
    lambda g, i, s: jnp.sum(
        jax.ops.segment_sum(
            g.reshape(-1, 9)[jnp.argsort(i.reshape(-1)) + (s > 1e30).astype(jnp.int32)],
            idx_sorted.reshape(-1),
            num_segments=135_001,
            indices_are_sorted=True,
        )
    )
    * 1e-30,
    g688,
    idx688,
)
chain(
    "searchsorted 2689 in 2.16M",
    lambda k, s: jnp.float32(
        jnp.searchsorted(k, jnp.arange(2689, dtype=jnp.int32) + (s > 1e30))[0]
    )
    * 1e-30,
    k216,
)
chain(
    "strided seg gather [2688,256] of 2.16M",
    lambda k, s: jnp.float32(
        jnp.sum(
            k[
                jnp.minimum(
                    jnp.arange(2688, dtype=jnp.int32)[:, None] * 800
                    + jnp.arange(256, dtype=jnp.int32)[None]
                    + (s > 1e30).astype(jnp.int32),
                    2_159_999,
                )
            ]
        )
    )
    * 1e-30,
    k216,
)
