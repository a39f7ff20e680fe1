"""Pallas segmented-sum backward combine for the record gather.

The champion raster backward's largest line is the XLA scatter-add that
combines per-selection cotangent rows into per-Gaussian gradients
(11.2 ms standalone at Goliath scale; 9.9 ms in-step —
tools/trace_lanes.py, tools/segsum_probe.py). XLA lowers it as
sort-by-index + a slow elementwise combine. This kernel replaces the
combine: cotangent rows are sorted by Gaussian id with ONE multi-operand
`lax.sort` (key + all CR columns as payloads — measured 2.7 ms, NOT the
6-8 ms the round-4 "backward-combine floor" assumed), then summed per
Gaussian by a windowed one-hot MXU matmul:

  - out block p covers Gaussians [p*B, (p+1)*B). Because the dupsort
    selection emits at most dup^2 entries per Gaussian
    (`tiles._select_per_tile_depthkey`), the block's rows occupy at most
    B*dup^2 consecutive positions of the sorted stream; two W-lane
    window reads starting at `(searchsorted(ids, p*B) // W) * W` always
    cover them (W >= B*dup^2, coverage 2W - (W-1) > B*dup^2).
  - inside a window, each 128-lane chunk contributes
    out[:, :] += g_chunk [CR, 128] @ onehot [128, B], with
    onehot[l, j] = (id[l] == p*B + j): segment sums ARE the matmul —
    no carries, no run boundaries, rows outside the block or sentinel
    rows compare to nothing and vanish.
  - ids ride in a pre-transposed sublane-major [128, M/128] f32 operand
    (ids < 2^24 are f32-exact) so the kernel never relayouts lanes
    (Mosaic cannot transpose the lane dim in-kernel — see
    pallas_blend_ct.py header); per-chunk id min/max in SMEM skip
    chunks wholly outside the block (sorted ids make most window slack
    skippable).
  - gd rides bf16 hi/lo split (exact-0/1 one-hot operand makes the
    split recover f32 accuracy; same trick as the blend kernels).

The CUDA reference's equivalent is the atomic per-Gaussian accumulation
in its backward tile walk (`/root/reference/renderer.py:122-141`,
SURVEY.md §3.5); TPU has no atomics, so the combine is restructured as
sort + block-local MXU contraction instead.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
W = 16384  # window lanes per block read (= 128 chunks)

# rows_out channel-major blend-backward output (no [T, CR, K] strided
# relayout feeding the combine's sort operands); A/B gate for on-chip
# attribution. Requires the static-unroll kernel path (G_CT <= 8).
SEGSUM_ROWS = os.environ.get("D3GA_SEGSUM_ROWS", "1") == "1"


def _segsum_body(CR, B, n_chunks, blk0_ref, g0, g1, id0, id1, mn_ref, mx_ref, out_ref):
    p = pl.program_id(0)
    base = p * B
    base_f = base.astype(jnp.float32)
    # Mosaic's tpu.iota is integer-only — build the lane ramp as i32
    # and convert (an f32 broadcasted_iota fails Mosaic verification)
    lane_vals = base_f + jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(
        jnp.float32
    )
    out_ref[...] = jnp.zeros((CR, B), jnp.float32)
    blk0 = blk0_ref[p]

    def half(g_ref, id_ref, h):
        gc0 = (blk0 + h) * n_chunks
        for c in range(n_chunks):
            mn = mn_ref[gc0 + c]
            mx = mx_ref[gc0 + c]

            @pl.when((mx >= base) & (mn < base + B))
            def _(c=c):
                idsub = id_ref[:, c : c + 1]                 # [128, 1] f32
                onehot = (idsub == lane_vals).astype(jnp.bfloat16)
                gd = g_ref[:, c * CHUNK : (c + 1) * CHUNK]   # [CR, 128]
                hi = gd.astype(jnp.bfloat16)
                lo = (gd - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = jax.lax.dot_general(
                    hi, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    lo, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[...] += acc

    half(g0, id0, 0)
    half(g1, id1, 1)


def block_width(dup2: int) -> int:
    """Largest output block B (multiple of 128) with B*dup2 <= W."""
    b = (W // dup2) // CHUNK * CHUNK
    return max(b, 0)


def combine_sorted(ids_sorted, g_sorted, n, dup2, interpret=False):
    """Per-Gaussian sums of Gaussian-id-sorted cotangent rows.

    ids_sorted: [m] int32, ascending; entries >= n are sentinels.
    g_sorted:   [CR, m] f32, column j belongs to ids_sorted[j].
    Returns [n, CR] f32 with row i = sum of columns where id == i.
    Requires: each id occurs at most dup2 times (the dupsort selection
    invariant) and n < 2^24 (f32-exact id compares).
    """
    CR, m = g_sorted.shape
    assert n < (1 << 24), "ids must be f32-exact"
    B = block_width(dup2)
    assert B >= CHUNK, f"dup2={dup2} too large for W={W}"
    NP = -(-n // B)
    n_pad = NP * B
    n_chunks = W // CHUNK
    m_pad = (-(-m // W) + 2) * W
    mb = m_pad // CHUNK

    big = jnp.float32(float((1 << 24) - 1))
    ids_f = jnp.where(ids_sorted >= n, big, ids_sorted.astype(jnp.float32))
    ids_f = jnp.concatenate([ids_f, jnp.full((m_pad - m,), big, jnp.float32)])
    g_pad = jnp.pad(g_sorted, ((0, 0), (0, m_pad - m)))

    ids2 = ids_f.reshape(mb, CHUNK)
    ids_t = ids2.T  # [128, mb] — sublane-major ids, one column per chunk
    ids_i = jnp.where(
        ids_sorted >= n, jnp.int32((1 << 24) - 1), ids_sorted
    )
    ids_i = jnp.concatenate(
        [ids_i, jnp.full((m_pad - m,), jnp.int32((1 << 24) - 1))]
    ).reshape(mb, CHUNK)
    chunk_min = ids_i.min(axis=1)
    chunk_max = ids_i.max(axis=1)

    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(NP, dtype=jnp.int32) * B, method="scan_unrolled"
    ).astype(jnp.int32)
    blk0 = jnp.clip(starts // W, 0, m_pad // W - 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((CR, W), lambda p, b: (0, b[p])),
            pl.BlockSpec((CR, W), lambda p, b: (0, b[p] + 1)),
            pl.BlockSpec((CHUNK, n_chunks), lambda p, b: (0, b[p])),
            pl.BlockSpec((CHUNK, n_chunks), lambda p, b: (0, b[p] + 1)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((CR, B), lambda p, b: (0, p)),
    )
    out = pl.pallas_call(
        partial(_segsum_body, CR, B, n_chunks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CR, n_pad), jnp.float32),
        interpret=interpret,
    )(blk0, g_pad, g_pad, ids_t, ids_t, chunk_min, chunk_max)
    return out[:, :n].T


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def blend_gather_segsum_ct(
    records_ext, idx, counts, ntx, nty, C, dup2, interpret=False, frame_rows=0
):
    """Record gather + channels-transposed Pallas blend with a
    segmented-sum backward combine (instead of the XLA scatter-add the
    plain gather's AD transpose produces).

    The gather stays INSIDE this custom_vjp together with the blend so
    the primal keeps its fusion/memory-space placement — wrapping the
    gather alone cost the forward 1.2 -> 10.2 ms in round 4
    (PERF_NOTES.md "backward-combine floor", runsort row).

    records_ext: [N+1, CR] packed records with a zero sentinel row;
    idx: [T, K] Gaussian ids (N = sentinel); counts: [T] (clamped to K).
    Returns the planar image [(C+1), nty*16, ntx*16] like
    `pallas_blend_ct.blend_image_ct`.
    """
    from d3ga_tpu.raster.pallas_blend_ct import _run_forward_ct

    rec_ct = jnp.swapaxes(records_ext[idx], 1, 2)
    return _run_forward_ct(rec_ct, counts, ntx, nty, C, interpret, frame_rows)


def _bgs_fwd(records_ext, idx, counts, ntx, nty, C, dup2, interpret, frame_rows):
    from d3ga_tpu.raster.pallas_blend_ct import _run_forward_ct

    rec_ct = jnp.swapaxes(records_ext[idx], 1, 2)
    out = _run_forward_ct(rec_ct, counts, ntx, nty, C, interpret, frame_rows)
    return out, (rec_ct, idx, counts, records_ext.shape[0])


def _bgs_bwd(ntx, nty, C, dup2, interpret, frame_rows, res, g):
    from d3ga_tpu.raster.pallas_blend_ct import (
        G_CT,
        UNROLL_G,
        _run_backward_ct,
    )

    rec_ct, idx, counts, n_ext = res
    if G_CT <= UNROLL_G and SEGSUM_ROWS:
        # channel-major kernel output: the 12 per-channel sort operands
        # are contiguous planes (rows_out) — no [T, CR, K] relayout
        drec = _run_backward_ct(
            rec_ct, counts, g, ntx, nty, C, interpret, frame_rows,
            rows_out=True,
        )
        dre = combine_from_slots(
            drec, idx, n_ext - 1, dup2, interpret, layout="ct_rows"
        )
    else:
        drec_ct = _run_backward_ct(
            rec_ct, counts, g, ntx, nty, C, interpret, frame_rows
        )
        dre = combine_from_slots(drec_ct, idx, n_ext - 1, dup2, interpret)
    return (dre, None, None)


blend_gather_segsum_ct.defvjp(_bgs_fwd, _bgs_bwd)


def combine_from_slots(drec, idx, n, dup2, interpret=False, layout="ct"):
    """Per-selection cotangents + idx [T, K] Gaussian ids (n = sentinel)
    -> [n + 1, CR] per-Gaussian gradient rows (sentinel row zero). ONE
    multi-operand sort orders every column by Gaussian id (2.7 ms at
    Goliath scale, tools/segsum_probe.py line C), then `combine_sorted`
    does the segment sums on the MXU.

    layout="ct": drec [T, CR, K] (channels-transposed blend kernel);
    layout="ct_rows": drec [nty, CR, ntx*K] (the blend backward's
    rows_out channel-major layout — each per-channel sort operand is a
    contiguous plane, no strided relayout);
    layout="rec": drec [T, K, CR] (flat-tiles rec kernel, the sharded
    path)."""
    if layout == "ct":
        T, CR, K = drec.shape
        m = T * K
        cols = tuple(drec[:, c, :].reshape(m) for c in range(CR))
    elif layout == "ct_rows":
        nty, CR, nxk = drec.shape
        m = nty * nxk
        cols = tuple(drec[:, c, :].reshape(m) for c in range(CR))
    else:
        T, K, CR = drec.shape
        m = T * K
        cols = tuple(drec[:, :, c].reshape(m) for c in range(CR))
    outs = jax.lax.sort((idx.reshape(m),) + cols, num_keys=1)
    ids_sorted = outs[0]
    g_sorted = jnp.stack(outs[1:])
    dg = combine_sorted(ids_sorted, g_sorted, n, dup2, interpret)
    return jnp.concatenate([dg, jnp.zeros((1, CR), jnp.float32)], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_gather_segsum_rec(
    records_ext, idx, counts, tile_offset, ntx, C, dup2, interpret=False
):
    """Sharded-path analog of `blend_gather_segsum_ct`: record gather +
    flat-tiles rec blend (`pallas_blend_rec.blend_tiles_rec` contract)
    with the segmented-sum backward combine. Per-device occurrence
    bound: a Gaussian appears in at most dup^2 tiles GLOBALLY and each
    tile is owned by exactly one device, so each device's idx holds <= dup^2
    copies of any id — the `combine_sorted` window invariant."""
    from d3ga_tpu.raster.pallas_blend_rec import _run_forward

    rec_t = records_ext[idx]
    return _run_forward(rec_t, counts, tile_offset, ntx, C, interpret)


def _bgr_fwd(records_ext, idx, counts, tile_offset, ntx, C, dup2, interpret):
    from d3ga_tpu.raster.pallas_blend_rec import _run_forward

    rec_t = records_ext[idx]
    out = _run_forward(rec_t, counts, tile_offset, ntx, C, interpret)
    return out, (rec_t, idx, counts, tile_offset, records_ext.shape[0])


def _bgr_bwd(ntx, C, dup2, interpret, res, g):
    from d3ga_tpu.raster.pallas_blend_rec import _run_backward

    rec_t, idx, counts, tile_offset, n_ext = res
    drec = _run_backward(rec_t, counts, tile_offset, g, ntx, C, interpret)
    dre = combine_from_slots(drec, idx, n_ext - 1, dup2, interpret, layout="rec")
    return (dre, None, None, None)


blend_gather_segsum_rec.defvjp(_bgr_fwd, _bgr_bwd)
