"""Pallas front-K segment extraction for the dupsort selection.

After the (tile|depth|index) selection sort, each tile's front-K entries
are the kk-element window of the sorted stream starting at the tile's
segment offset (`starts[t]`, a searchsorted prefix). The round-5 default
extracts them as T vmapped `dynamic_slice`s, which XLA lowers to a
T-iteration while loop costing 2.15 ms at Goliath scale (T=2688,
tools/hlo_while_hunt.py) — ~0.8 us of loop overhead per tile for what
is ~12 us of actual HBM traffic. The `gslice` lax.gather lowering
measured a wash (PERF_NOTES round 5).

This kernel does the whole extraction in ONE Pallas program: the padded
stream (m ~ 1.2M i32 = ~5 MB) and the [T, kk] output both live in VMEM,
and a `fori_loop` over tiles does, per tile,

  - two dynamic SUBLANE loads of the [R, kk] stream view (row r holds
    lanes [kk*r, kk*r + kk) of the flat stream; the tile's window
    [s, s+kk) spans exactly rows s//kk and s//kk + 1);
  - two dynamic lane rotates (`pltpu.roll`, tpu.dynamic_rotate) by
    kk - s%kk, one lane-iota select between them, and one full-row
    [1, kk] store at lane 0 (the layouts Mosaic accepts: sublane-0
    operands, aligned stores).

No per-tile program overhead (the blend kernels measure 5-8 us/program
— a T-program grid would cost more than the while loop), no DMA issue
per tile, no XLA loop round-trips. The CUDA reference has no analog op:
its per-tile ranges index the duplicated key buffer directly
(`/root/reference/renderer.py:79-141` binning; SURVEY.md §3.5) — on TPU
the extraction exists so the blend reads a dense [T, K] layout.

Semantics match the `slice` path exactly: reads past m hit zero padding
(the caller masks dead lanes with `live` afterwards, so pad values
never escape).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _extract_body(T, kk, starts_ref, in_ref, out_ref):
    # stream viewed as [R, kk] rows (kk = 2^lb lanes): per tile, the
    # window spans exactly TWO rows — 2 dynamic sublane loads, 2
    # dynamic lane rotates, 1 select, 1 full-row store. Sublane-0
    # operands and lane-0 full-row stores throughout (Mosaic rejects
    # select/concatenate over sublane-offset layouts and dynamic
    # stores at a nonzero lane offset).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)

    def body(t, carry):
        s = starts_ref[t]
        sr = jax.lax.div(s, jnp.int32(kk))
        o = jax.lax.rem(s, jnp.int32(kk))
        shift = jax.lax.rem(jnp.int32(kk) - o, jnp.int32(kk))
        a = pltpu.roll(in_ref[pl.ds(sr, 1), :], shift, axis=1)
        b = pltpu.roll(in_ref[pl.ds(sr + 1, 1), :], shift, axis=1)
        out_ref[pl.ds(t, 1), :] = jnp.where(lane < (kk - o), a, b)
        return carry

    jax.lax.fori_loop(0, T, body, 0)


def extract_slices(stream, starts, kk, interpret=False):
    """out[t, j] = stream_padded[starts[t] + j] for j in [0, kk).

    stream: [m] (any 4-byte dtype); starts: [T] int32 with
    0 <= starts[t] <= m; kk must be a multiple of 128. Positions >= m
    read zeros (the caller's `live` mask covers them).
    """
    (m,) = stream.shape
    (T,) = starts.shape
    assert kk % CHUNK == 0, kk
    R = m // kk + 2
    pad = R * kk - m
    in2 = jnp.concatenate(
        [stream, jnp.zeros((pad,), stream.dtype)]
    ).reshape(R, kk)
    return pl.pallas_call(
        partial(_extract_body, T, kk),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, kk), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, kk), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, kk), stream.dtype),
        interpret=interpret,
    )(starts, in2)
