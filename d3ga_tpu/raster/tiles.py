"""Tile-binned Gaussian-splat rasterizer — the TPU-native production path.

Design (vs the CUDA reference's global (tile|depth) radix sort + per-tile
sequential blend loops, SURVEY.md §3.5):

  1. project all N Gaussians densely (VPU),
  2. per-tile selection of the frontmost K overlapping Gaussians — a
     static-shape cap with overflow counters ("no silent caps") — via
     one of three interchangeable funnels:
       - "topk": global depth argsort + block-level masked top_k +
         optional sub-block refine + per-tile first-K positions,
       - "dupsort"/"dupsort_tile": duplicate-sort-segment — each
         Gaussian emits dup^2 (region|rank) int32 keys, ONE flat sort,
         segments by searchsorted (the CUDA radix-sort analog; the
         measured-fastest path, PERF_NOTES.md),
       - "dupsort_depth": lexicographic (tile|depth, index) two-key
         sort with no global argsort at all,
  3. blend each tile's 256 pixels against its K records by re-expressing
     front-to-back alpha compositing as an exclusive cumulative product
     over K followed by a [256, K] @ [K, C] matmul (MXU), exactly
     reproducing the CUDA alpha >= 1/255 skip and T < 1e-4 termination —
     in XLA (`_blend_tiles`) or in the record-direct Pallas kernel
     (`pallas_blend_rec.py`, use_pallas=True).

Everything is differentiable through jax.grad; no custom VJP is needed
for correctness (the Pallas kernels provide the same contract with
recompute backwards for speed).
"""

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.raster.project import project_gaussians, tile_rect

# Backward-scatter strategy for the record gather (measured via
# tools/scatter_probe.py; see PERF_NOTES.md):
#   "add"     — plain gather; AD transposes it to a scatter-ADD over
#               [T*K -> N, CR] rows (the XLA default).
#   "dupslot" — carry each selected entry's DUPLICATE-SLOT id q = d*N+r
#               through the dup-sort as a sort payload; the backward
#               becomes a collision-free scatter-SET into [dup^2*N, CR]
#               plus a dense (dup^2, N, CR) axis-0 sum. No combiner, no
#               read-modify-write. (dupsort_tile only; measured SLOWER —
#               the 16N-row scatter is catastrophic, PERF_NOTES.md.)
#   "slotmap" — (dupsort_depth only) invert the selection sort once
#               (one extra [m] sort + dense cummax) so every gradient
#               row's destination is construction-known; the backward is
#               a [N, dup^2, CR] GATHER + dense sum — no scatter at all.
#               Measured SLOWER end-to-end on the axon rig (19.0 vs 21.3
#               Mpix/s): the [dup^2*N]-row backward gather runs at
#               ~11.6 ns/row (random-locality bound, 3x the slope-probe
#               rate) and the inverse sort + cummax add ~7 ms fixed —
#               together more than the 11 ms scatter they replace
#               (tools/slotmap_probe.py; PERF_NOTES.md). Kept as the
#               structural alternative for real-HW re-evaluation.
#   "runsort" — (dupsort_depth only) explicit sort + fixed-depth
#               (run length <= dup^2) segmented reduction. Won its
#               isolated probe (6.4 vs 10.5 ms) but LOSES end-to-end
#               (18.5 vs 21.2 Mpix/s): the probe's index-side work was
#               loop-invariant and got hoisted, searchsorted(sort)
#               lowers to argsort+scatter (~6.7 ms), and the custom_vjp
#               boundary costs the FORWARD gather its fusion (1.2 ->
#               10.2 ms). See PERF_NOTES "backward-combine floor".
#   "segsum"  — (dupsort_depth + ct layout only) round 5: gather+blend
#               wrapped in ONE custom_vjp (forward keeps its fusion —
#               the runsort lesson); backward = ONE multi-operand sort
#               carrying all CR cotangent columns (2.7 ms measured,
#               tools/segsum_probe.py — the round-4 floor assumed this
#               was 6-8 ms) + a Pallas windowed one-hot-matmul
#               segmented sum (pallas_segsum.py) instead of the
#               11.2 ms XLA scatter-add. Measured on-chip: 21.5 ->
#               25.9 Mpix/s end-to-end (+21%, experiments/r5) with
#               parity certified (PALLAS_PARITY.json rec_grad=segsum)
#               — the round-5 DEFAULT (non-champion paths fall through
#               to the plain gather/scatter-add unchanged).
REC_GRAD = os.environ.get("D3GA_REC_GRAD", "segsum")
# Depth-reorder strategy: "argsort" (argsort + row gather) or
# "sortpayload" (ONE multi-operand lax.sort carrying all record
# columns as payloads).
REORDER = os.environ.get("D3GA_REORDER", "argsort")
# Pallas blend kernel layout: "ct" (channels-transposed wide-row
# operands, pallas_blend_ct.py — cheaper through the axon runtime's
# per-row operand tax) or "rec" ([T, K, CR] records,
# pallas_blend_rec.py).
BLEND_LAYOUT = os.environ.get("D3GA_BLEND_LAYOUT", "ct")
# Selection segment-extraction strategy (dupsort_depth): "pallas"
# (ONE single-program VMEM kernel, raster/pallas_extract.py — the
# DEFAULT; falls back to "slice" when kk isn't a 128-multiple),
# "slice" (one dynamic kk-slice per tile — XLA lowers it as a
# T-iteration while loop, 2.15 ms at Goliath scale), "gslice" (one
# lax.gather of T slices, measured a wash vs slice), or "gather" (T*K
# element gathers, ~3.6 ns/element). Round-5 on-chip A/Bs: gather
# 24.87 < slice 27.64 (session4) and slice 28.55 < pallas 30.46-30.85
# Mpix/s (session7, same session 2x2) — all bit-identical output
# (tests/test_segsum.py::TestSelextSlice/TestSelextPallas).
SELEXT = os.environ.get("D3GA_SELEXT", "pallas")

TILE = 16
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
# plain int (weak-typed) so importing this module does NOT initialize
# the XLA backend — multi-host processes must be able to import the
# package before jax.distributed.initialize (tools/multiproc_dist.py)
BIG_RANK = 2**30


class RasterAux(NamedTuple):
    overflow: jnp.ndarray      # [] int32: Gaussians dropped past the K cap
    max_per_tile: jnp.ndarray  # [] int32: max overlap count over tiles
    n_contrib: jnp.ndarray     # [] int32: total selected entries
    # drops that could have been SEEN: per-tile-cap drops only count
    # when the tile's final background transmittance is still above the
    # CUDA termination threshold (the dropped entries are the DEEPEST;
    # with T_bg <= 1e-4 the uncapped kernel would have terminated before
    # them too — provably benign). Span-clamp drops (dupsort dup window)
    # are depth-unaware and always counted. -1 = not computed (paths
    # that don't return per-tile transmittance).
    visible_overflow: jnp.ndarray = -1
    # dupsort_depth only: SELECTED adjacent same-tile pairs whose order
    # is unresolved at the quantized depth precision (same depth
    # quantum; broke by index instead of true depth). The CUDA
    # reference sorts the full f32 depth bit pattern (SURVEY.md §3.5),
    # so any nonzero count is a potential blend-order deviation;
    # depth_exact=True resolves all ties (counter pinned 0). -1 = not
    # computed (other selection paths, which are exact by construction).
    depth_ties: jnp.ndarray = -1
    # span-clamp drops alone (the dup-window part of `overflow`), so
    # the auto-widener can tell "widen dup" apart from "raise the
    # per-tile K budget". -1 = not computed.
    clamp_overflow: jnp.ndarray = -1
    # sharded selection with a front-F exchange (dist/raster_shard.py,
    # front_margin set): entries a shard MIGHT have contributed to a
    # tile's merged front-K beyond the F it shipped (conservative, at
    # the local sort's depth-quantum granularity). 0 = the truncated
    # exchange provably merged the same front-K as the full one;
    # callers widen the margin (or fall back to the full exchange) on
    # a nonzero count — the dup-widening counter pattern. -1 = full
    # exchange / not computed.
    merge_overflow: jnp.ndarray = -1


def visible_cap_drops(t_bg_max, counts, K):
    """Per-tile-cap drops that could have been SEEN. The dropped
    entries are the DEEPEST (ranks beyond K), so front-to-back
    compositing bounds their total contribution to any pixel by that
    pixel's remaining transmittance: |capped - uncapped| <= t_bg
    per channel. A tile whose max t_bg is below one 8-bit LSB (1/255)
    therefore renders identically to the uncapped reference kernel
    (`renderer.py:130-141`) up to quantization — provably benign.
    t_bg_max: [T] per-tile max over pixels of the final transmittance;
    counts: [T] true candidate counts."""
    dropped = jnp.maximum(counts - K, 0)
    return jnp.sum(jnp.where(t_bg_max > ALPHA_SKIP, dropped, 0))


def reorder_records(records, radius, valid, order, batched=False):
    """Depth-reorder records + radius + valid with ONE row gather
    (three separate gathers each pay a fixed per-row cost on TPU).
    Column contract: aug = [records | radius | valid]; radius is an int
    pixel count, exact in f32. Returns (records_s, radius_s, valid_s)."""
    nc = records.shape[-1]
    aug = jnp.concatenate(
        [
            records,
            radius.astype(records.dtype)[..., None],
            valid.astype(records.dtype)[..., None],
        ],
        axis=-1,
    )
    if batched:
        aug = jnp.take_along_axis(aug, order[..., None], axis=1)
    else:
        aug = aug[order]
    return aug[..., :nc], aug[..., nc], aug[..., nc + 1] > 0


def _refine_lists(parent_ranks, parent_packed, parent_of_child, cx0, cy0, csize, cap):
    """One funnel level: each child region selects the first-`cap`
    (rank-ascending) candidates overlapping it from its parent's list.

    parent_ranks/parent_packed: [P, kp] rank-ascending lists (BIG_RANK /
    0 padding) with the packed tile rect carried alongside so no random
    gathers over N are needed; parent_of_child: [C] parent row per
    child; cx0/cy0: [C] child origin in tile units; csize: child extent
    in tiles. Returns (child_ranks [C, cap], child_packed [C, cap],
    child_counts [C], overflow [])."""
    kp = parent_ranks.shape[1]
    cand = parent_ranks[parent_of_child]          # [C, kp] row gathers
    cpacked = parent_packed[parent_of_child]
    cval = cand < BIG_RANK
    cxmin = cpacked & 0xFF
    cxmax = (cpacked >> 8) & 0xFF
    cymin = (cpacked >> 16) & 0xFF
    cymax = (cpacked >> 24) & 0xFF
    ov = (
        cval
        & (cx0[:, None] < cxmax)
        & (cx0[:, None] + csize > cxmin)
        & (cy0[:, None] < cymax)
        & (cy0[:, None] + csize > cymin)
    )  # [C, kp]
    # First-cap-set-bits selection on POSITIONS (the list is already
    # rank-ascending) so rank and packed rect ride the same gather.
    j = jax.lax.broadcasted_iota(jnp.int32, ov.shape, 1)
    key = jnp.where(ov, j, kp)
    first = -jax.lax.top_k(-key, min(cap, kp))[0]   # ascending positions
    hit = first < kp
    safe = jnp.where(hit, first, 0)
    child_ranks = jnp.where(hit, jnp.take_along_axis(cand, safe, axis=1), BIG_RANK)
    child_packed = jnp.where(hit, jnp.take_along_axis(cpacked, safe, axis=1), 0)
    if cap > kp:
        child_ranks = jnp.pad(
            child_ranks, ((0, 0), (0, cap - kp)), constant_values=BIG_RANK
        )
        child_packed = jnp.pad(child_packed, ((0, 0), (0, cap - kp)))
    counts = jnp.sum(ov.astype(jnp.int32), axis=-1)
    overflow = jnp.sum(jnp.maximum(counts - cap, 0))
    return child_ranks, child_packed, counts, overflow


def _coarse_block_lists_dupsort(
    rects, valid_sorted, nbx, nby, block, kb, packed, dup=2,
):
    """Block candidate lists via DUPLICATE-SORT-SEGMENT — the TPU-native
    analog of the CUDA reference's (tile | depth) radix-sort binning
    (`/root/reference/renderer.py:130-141`, SURVEY.md §3.5), at block
    granularity with a STATIC duplication factor:

      1. each Gaussian emits dup x dup (block, rank) keys covering the
         blocks its rect touches (key = block_id << rank_bits | rank —
         the rank IS the payload, so the sort carries no values),
      2. ONE flat sort of the [dup*dup*N] int32 keys,
      3. per-block segments are contiguous: starts via searchsorted of
         the 48 block boundaries, lists via a [NB, kb] strided gather.

    Replaces the masked top_k over N (the dominant selection cost at
    Goliath scale) with a single cheap flat sort. Rects spanning more
    than `dup` blocks on a side are clamped and the dropped (block,
    Gaussian) pairs are counted in the returned overflow ("no silent
    caps"). Returns (block_ranks, block_packed, block_counts, overflow),
    identical contract to `_coarse_block_lists`."""
    xmin, xmax, ymin, ymax = rects
    n = xmin.shape[0]
    n_blocks = nbx * nby
    rank_bits = max(int(n - 1).bit_length(), 1)
    assert (n_blocks + 1) << rank_bits < 2**31, (
        "dup-sort key would overflow int32; use the top_k coarse path"
    )
    ranks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    bxmin = xmin // block
    bxmax = (xmax - 1) // block          # inclusive; xmax is exclusive
    bymin = ymin // block
    bymax = (ymax - 1) // block
    empty = ~valid_sorted | (xmax <= xmin) | (ymax <= ymin)
    # clamp spans past the duplication factor (counted below)
    bxc = jnp.minimum(bxmax, bxmin + (dup - 1))
    byc = jnp.minimum(bymax, bymin + (dup - 1))
    clamp_dropped = jnp.sum(
        jnp.where(
            empty,
            0,
            (bxmax - bxc) * (byc - bymin + 1)
            + (bymax - byc) * (bxmax - bxmin + 1),
        )
    )

    keys = []
    for dy in range(dup):
        for dx in range(dup):
            bx = bxmin + dx
            by = bymin + dy
            ok = (~empty) & (bx <= bxc) & (by <= byc) & (bx < nbx) & (by < nby)
            bid = by * nbx + bx
            keys.append(
                jnp.where(ok, (bid << rank_bits) | ranks, (n_blocks << rank_bits))
            )
    keys = jnp.sort(jnp.concatenate(keys))        # [dup*dup*N]
    m = keys.shape[0]

    starts = jnp.searchsorted(
        keys, jnp.arange(n_blocks + 1, dtype=jnp.int32) << rank_bits,
        method="scan_unrolled",
    ).astype(jnp.int32)                           # [NB+1]
    block_counts = starts[1:] - starts[:-1]
    idx = jnp.minimum(starts[:-1, None] + jnp.arange(kb, dtype=jnp.int32)[None], m - 1)
    seg = keys[idx]                               # [NB, kb] strided gather
    j = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, kb), 1)
    live = j < jnp.minimum(block_counts, kb)[:, None]
    block_ranks = jnp.where(
        live, seg & ((1 << rank_bits) - 1), BIG_RANK
    )
    block_packed = jnp.where(
        live, packed[jnp.where(live, block_ranks, 0)], 0
    )
    overflow = jnp.sum(jnp.maximum(block_counts - kb, 0)) + clamp_dropped
    return block_ranks, block_packed, block_counts, overflow


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_records_dupslot(records_ext, idx, q, dup2):
    """Per-tile record gather [T, K] rows of records_ext [N+1, CR] whose
    BACKWARD is a collision-free scatter-SET into the duplicate-slot
    layout [dup2*N, CR] followed by a dense (dup2, N, CR) axis-0 sum —
    replacing the XLA gather-transpose scatter-ADD (10.8 ms at Goliath
    scale on the axon rig, PERF_NOTES.md).

    idx: [T, K] gather rows (N = sentinel zero row for dead slots);
    q:   [T, K] duplicate-slot ids in [0, dup2*N), one per LIVE selected
         entry (collision-free by construction: q identifies the unique
         sorted key instance (tile, rank)); dead slots must carry
         q >= dup2*N (dropped by the scatter's OOB mode)."""
    return records_ext[idx]


def _gather_dupslot_fwd(records_ext, idx, q, dup2):
    return records_ext[idx], (idx, q, records_ext.shape[0])


def _gather_dupslot_bwd(dup2, res, g):
    idx, q, n_ext = res
    n = n_ext - 1
    cr = g.shape[-1]
    buf = (
        jnp.zeros((dup2 * n, cr), g.dtype)
        .at[q.reshape(-1)]
        .set(g.reshape(-1, cr), mode="drop", unique_indices=True)
    )
    drec = buf.reshape(dup2, n, cr).sum(0)
    dre = jnp.concatenate([drec, jnp.zeros((1, cr), g.dtype)], axis=0)
    return (dre, None, None)


gather_records_dupslot.defvjp(_gather_dupslot_fwd, _gather_dupslot_bwd)


@jax.custom_vjp
def gather_records_slotmap(records_ext, idx, slot_map):
    """Per-tile record gather [T, K] rows of records_ext [N+1, CR] whose
    BACKWARD is a construction-known-position GATHER instead of the XLA
    gather-transpose scatter-add (13.9 ms wall at Goliath scale,
    PERF_NOTES.md "Scatter facts"): slot_map [N, dup^2] holds, for each
    Gaussian and duplicate offset, the flat slot t*K + k its record
    landed in (sentinel T*K when unselected — reads a zero row), so

        d records[i] = sum_d g_ext[slot_map[i, d]]

    is a [N*dup^2]-row gather plus a dense axis-1 sum. slot_map comes
    from `_select_per_tile_depthkey(..., return_slotmap=True)`. The CUDA
    reference's backward instead re-walks tiles back-to-front and
    atomically accumulates per-Gaussian gradients
    (`/root/reference/renderer.py:122-141`, SURVEY.md §3.5)."""
    return records_ext[idx]


def _gather_slotmap_fwd(records_ext, idx, slot_map):
    return records_ext[idx], (idx.shape, slot_map, records_ext.shape[0])


def _gather_slotmap_bwd(res, g):
    (T, K), slot_map, n_ext = res
    cr = g.shape[-1]
    g_ext = jnp.concatenate(
        [g.reshape(T * K, cr), jnp.zeros((1, cr), g.dtype)], axis=0
    )
    drec = g_ext[slot_map].sum(axis=1)        # [N, dup2, CR] -> [N, CR]
    dre = jnp.concatenate([drec, jnp.zeros((1, cr), g.dtype)], axis=0)
    return (dre, None, None)


gather_records_slotmap.defvjp(_gather_slotmap_fwd, _gather_slotmap_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_records_runsort(records_ext, idx, max_run):
    """Per-tile record gather [T, K] rows of records_ext [N+1, CR] whose
    BACKWARD is an explicit sort + fixed-depth segmented reduction
    instead of the XLA scatter-add (which XLA lowers as sort + a slow
    elementwise combine — 9.9 ms device at Goliath scale,
    tools/trace_lanes.py; this chain measures 6.4 ms,
    tools/seg_gather_probe.py):

      1. sort (idx.flatten(), iota) by Gaussian id — runs are at most
         `max_run` = dup^2 long (a Gaussian lands in at most dup^2
         tiles, once per tile),
      2. permutation ROW gather of the cotangent rows,
      3. log2(max_run) shifted-add passes (dense) put each run's sum at
         its first row,
      4. run-start positions via a merge searchsorted (sorted-sorted),
      5. one [N]-row extract at sorted positions.

    Sentinel slots (idx == N) sort to the tail and are never extracted.
    The CUDA reference instead re-walks tiles back-to-front with atomic
    accumulation (`/root/reference/renderer.py:122-141`, SURVEY §3.5).
    """
    return records_ext[idx]


def _gather_runsort_fwd(records_ext, idx, max_run):
    return records_ext[idx], (idx, records_ext.shape[0])


def _gather_runsort_bwd(max_run, res, g):
    idx, n_ext = res
    n = n_ext - 1
    cr = g.shape[-1]
    m = idx.size
    g_flat = g.reshape(m, cr)
    idx_s, perm = jax.lax.sort(
        (idx.reshape(-1), jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    acc = g_flat[perm]
    shift = 1
    while shift < max_run:
        nxt = jnp.concatenate(
            [acc[shift:], jnp.zeros((shift, cr), acc.dtype)], axis=0
        )
        ok = jnp.concatenate(
            [idx_s[shift:] == idx_s[:-shift], jnp.zeros((shift,), bool)]
        )
        acc = acc + jnp.where(ok[:, None], nxt, 0.0)
        shift *= 2
    gid = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.searchsorted(idx_s, gid, method="sort")
    pos_c = jnp.minimum(pos, m - 1)
    hit = idx_s[pos_c] == gid
    drec = jnp.where(hit[:, None], acc[pos_c], 0.0)
    dre = jnp.concatenate([drec, jnp.zeros((1, cr), g.dtype)], axis=0)
    return (dre, None)


gather_records_runsort.defvjp(_gather_runsort_fwd, _gather_runsort_bwd)


def _select_per_tile_dupsort(
    rects, valid_sorted, n_tiles_x, n_tiles_y, K, dup=4, return_q=False
):
    """Per-TILE selection in ONE duplicate-sort-segment pass — no block
    funnel at all. Each Gaussian emits dup x dup (tile | rank) int32
    keys covering its tile rect; one flat sort; per-tile segments via
    searchsorted + strided gather. This is the closest TPU analog of the
    CUDA reference's (tile | depth) radix sort + per-tile ranges
    (`/root/reference/renderer.py:130-141`): total key count ~ the
    CUDA duplication count, but static (dup^2 per Gaussian, spans past
    `dup` tiles clamped and counted).

    Returns (ranks [T, K] BIG_RANK-padded, counts [T], overflow []) —
    same contract as `_select_per_tile`."""
    xmin, xmax, ymin, ymax = rects
    n = xmin.shape[0]
    T = n_tiles_x * n_tiles_y
    rank_bits = max(int(n - 1).bit_length(), 1)
    assert (T + 1) << rank_bits < 2**31, (
        "tile dup-sort key would overflow int32; use the funnel path"
    )
    ranks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    empty = ~valid_sorted | (xmax <= xmin) | (ymax <= ymin)
    xc = jnp.minimum(xmax - 1, xmin + (dup - 1))
    yc = jnp.minimum(ymax - 1, ymin + (dup - 1))
    clamp_dropped = jnp.sum(
        jnp.where(
            empty,
            0,
            (xmax - 1 - xc) * (yc - ymin + 1)
            + (ymax - 1 - yc) * (xmax - xmin),
        )
    )

    keys = []
    for dy in range(dup):
        for dx in range(dup):
            tx = xmin + dx
            ty = ymin + dy
            ok = (~empty) & (tx <= xc) & (ty <= yc)
            tid = ty * n_tiles_x + tx
            keys.append(
                jnp.where(ok, (tid << rank_bits) | ranks, (T << rank_bits))
            )
    m = dup * dup * n
    if return_q:
        # carry the duplicate-slot id q = d*N + rank through the sort as
        # a payload (feeds the dupslot backward; +~1.5 ms over the
        # payload-free sort on the axon rig, tools/scatter_probe.py)
        keys, q_s = jax.lax.sort(
            (jnp.concatenate(keys), jnp.arange(m, dtype=jnp.int32)),
            num_keys=1,
        )
    else:
        keys = jnp.sort(jnp.concatenate(keys))

    starts = jnp.searchsorted(
        keys, jnp.arange(T + 1, dtype=jnp.int32) << rank_bits,
        method="scan_unrolled",
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    kk = min(K, m)
    idx = jnp.minimum(starts[:-1, None] + jnp.arange(kk, dtype=jnp.int32)[None], m - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, kk), 1)
    live = j < jnp.minimum(counts, kk)[:, None]
    if return_q:
        seg_q = q_s[idx]
        out = jnp.where(live, seg_q % n, BIG_RANK)
        q = jnp.where(live, seg_q, m)
    else:
        seg = keys[idx]
        out = jnp.where(live, seg & ((1 << rank_bits) - 1), BIG_RANK)
    if K > kk:
        out = jnp.pad(out, ((0, 0), (0, K - kk)), constant_values=BIG_RANK)
        if return_q:
            q = jnp.pad(q, ((0, 0), (0, K - kk)), constant_values=m)
    if return_q:
        return out, counts, clamp_dropped, q
    return out, counts, clamp_dropped


def _select_per_tile_depthkey(
    rects, valid, depth, n_tiles_x, n_tiles_y, K, dup=4, return_depth=False,
    return_slotmap=False, depth_exact=False,
):
    """Per-tile selection via lexicographic (tile|depth, index) keys —
    the full CUDA pipeline analog (`/root/reference/renderer.py:130-141`:
    duplicated (tile|depth) radix-sort keys + per-tile ranges) with NO
    separate depth argsort and NO record reordering:

      hi = tile_id << depth_bits | depth_q        (int32)
      lo = gaussian index                          (int32 payload/tiebreak)

    depth_q is the top `depth_bits` of the f32 depth bit pattern
    (order-preserving for positive floats); one two-key `lax.sort`
    yields every tile's candidates front-to-back with the ORIGINAL
    Gaussian index alongside. Ties within a depth quantum break by
    index (deterministic; matches the stable sorted-rank pipeline
    whenever depths are distinct at depth_bits). Spans past `dup` tiles
    are clamped and counted.

    return_slotmap=True additionally returns slot_by_flat [N, dup*dup]
    int32: for Gaussian i and duplicate-offset d, the flat slot t*K + k
    its record landed in (sentinel T*K when unselected) — every selected
    entry's gradient row position is CONSTRUCTION-known, so the record
    gather's backward becomes a gather + dense sum instead of the XLA
    gather-transpose scatter-add (the 13.9 ms wall line, PERF_NOTES.md
    "Scatter facts"). To make the flat duplicate id ride the sort for
    free, the tie-break operand becomes flat = i*dup^2 + d, which orders
    identically to i (a Gaussian never emits two keys for one tile, so
    within equal hi all flats belong to distinct Gaussians and
    i1 < i2 <=> flat1 < flat2); i is recovered as flat // dup^2. The
    inverse permutation costs ONE extra [m] sort plus a dense cummax
    (segment starts) — no scatter anywhere.

    depth_exact=True carries the REMAINING low bits of the f32 depth
    bit pattern as a third sort key, so blend order is exactly
    f32-depth-resolved with index tie-breaks — the same order the CUDA
    reference's full-bit-pattern (tile|depth) radix keys produce
    (SURVEY.md §3.5) — at the price of one extra sort operand. With
    depth_exact=False, same-quantum pairs break by index; the returned
    `ties` counter reports live adjacent same-(tile, quantum) pairs (a
    conservative superset of selected order deviations; exact mode pins
    it 0) so callers can auto-widen, mirroring the overflow counters.

    Inputs are in ORIGINAL (unsorted) Gaussian order. Returns
    (idx [T, K] int32 original indices with -1 padding, counts [T],
    overflow [], ties [], *extras)."""
    xmin, xmax, ymin, ymax = rects
    n = xmin.shape[0]
    T = n_tiles_x * n_tiles_y
    depth_bits = min(22, 31 - int(T + 1).bit_length())
    assert depth_bits >= 8, "tile grid too large for int32 depth keys"

    empty = ~valid | (xmax <= xmin) | (ymax <= ymin)
    xc = jnp.minimum(xmax - 1, xmin + (dup - 1))
    yc = jnp.minimum(ymax - 1, ymin + (dup - 1))
    clamp_dropped = jnp.sum(
        jnp.where(
            empty,
            0,
            (xmax - 1 - xc) * (yc - ymin + 1)
            + (ymax - 1 - yc) * (xmax - xmin),
        )
    )

    # order-preserving depth quantization (depth > 0 after culling)
    d32 = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    dq = (d32 >> (31 - depth_bits)) & ((1 << depth_bits) - 1)
    # the low bits the quantization drops (always >= 0: bit 31 is the
    # sign, 0 for positive depths)
    dlo = d32 & ((1 << (31 - depth_bits)) - 1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    sentinel = jnp.int32(T << depth_bits)
    dup2 = dup * dup
    assert not (return_depth and return_slotmap)
    assert not return_slotmap or n * dup2 < 2**31, (
        "flat duplicate id would overflow int32"
    )
    # exact mode: when the dropped low depth bits AND the index both fit
    # one int31, PACK them into a single second operand
    # ((dlo << rank_bits) | idx orders by (depth-lo, idx) exactly like
    # the separate keys) — the 3-operand sort drops back to 2 operands
    # (~0.5-0.8 ms at 1.2M keys; falls back to 3 ops for huge scenes /
    # batched grids where rank_bits > depth_bits)
    rank_bits = max(int(n - 1).bit_length(), 1)
    pack_exact = (
        depth_exact and not return_slotmap
        and (31 - depth_bits) + rank_bits <= 31
    )

    his = []
    los = []
    d_off = 0
    for dy in range(dup):
        for dx in range(dup):
            tx = xmin + dx
            ty = ymin + dy
            ok = (~empty) & (tx <= xc) & (ty <= yc)
            tid = ty * n_tiles_x + tx
            his.append(jnp.where(ok, (tid << depth_bits) | dq, sentinel))
            if return_slotmap:
                los.append(gidx * dup2 + d_off)
            elif pack_exact:
                los.append((dlo << rank_bits) | gidx)
            else:
                los.append(gidx)
            d_off += 1
    ops = [jnp.concatenate(his)]
    num_keys = 1
    if depth_exact and not pack_exact:
        ops.append(jnp.tile(dlo, dup2))
        num_keys = 2
    ops.append(jnp.concatenate(los))
    num_keys += 1
    if return_depth:
        # carry the full f32 depth as a sort payload (feeds the sharded
        # all_to_all merge in dist/raster_shard.py — avoids a [T, K]
        # row gather of depths afterwards)
        ops.append(jnp.tile(jnp.where(valid, depth, jnp.inf), dup2))
        outs = jax.lax.sort(tuple(ops), num_keys=num_keys)
        hi_s, lo_s, dep_s = outs[0], outs[-2], outs[-1]
    else:
        outs = jax.lax.sort(tuple(ops), num_keys=num_keys)
        hi_s, lo_s = outs[0], outs[-1]
    m = hi_s.shape[0]
    # live adjacent same-(tile|quantum) pairs: order unresolved at the
    # quantized precision unless depth_exact carries the low bits
    if depth_exact:
        ties = jnp.int32(0)
    else:
        ties = jnp.sum(
            ((hi_s[1:] == hi_s[:-1]) & (hi_s[1:] < sentinel)).astype(jnp.int32)
        )

    starts = jnp.searchsorted(
        hi_s, jnp.arange(T + 1, dtype=jnp.int32) << depth_bits,
        method="scan_unrolled",
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    kk = min(K, m)
    if SELEXT == "pallas" and kk % 128 == 0:
        # ONE Pallas program extracts every tile's front-kk window from
        # VMEM (dynamic sublane slice + one dynamic lane rotate per
        # tile) — no T-iteration XLA while loop (2.15 ms at Goliath
        # scale) and no per-tile program/DMA overhead. Semantics match
        # the slice path bit-exactly (zero padding past m; dead lanes
        # masked by `live` below either way).
        from d3ga_tpu.raster.pallas_extract import extract_slices

        _interp = jax.default_backend() != "tpu"
        idx2 = None
        seg = extract_slices(lo_s, starts[:-1], kk, interpret=_interp)
        if return_slotmap:
            seg = seg // dup2
    elif SELEXT in ("slice", "gslice"):
        # extract each tile's front-kk as ONE dynamic K-slice per tile
        # instead of T*K element gathers — element gathers run at
        # ~3.6 ns/element on this rig (PERF_NOTES), slices are
        # row-rate-bound. kk sentinel padding keeps every slice
        # in-bounds (dynamic_slice would otherwise SHIFT the window at
        # the tail and misalign live entries). "slice" = vmapped
        # dynamic_slice (XLA lowers it as a T-iteration while loop,
        # 2.15 ms at Goliath scale — tools/hlo_while_hunt.py); "gslice"
        # = one explicit lax.gather of T sorted slices — measured a
        # WASH on-chip (28.62 vs 28.81 Mpix/s, experiments/r5/
        # session6.log); kept as the documented alternative lowering.
        idx2 = None
        lo_pad = jnp.concatenate([lo_s, jnp.zeros((kk,), lo_s.dtype)])
        if SELEXT == "gslice":
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,),
            )
            seg = jax.lax.gather(
                lo_pad, starts[:-1, None], dnums, slice_sizes=(kk,),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        else:
            seg = jax.vmap(
                lambda s: jax.lax.dynamic_slice(lo_pad, (s,), (kk,))
            )(starts[:-1])
        if return_slotmap:
            seg = seg // dup2
    else:
        idx2 = jnp.minimum(
            starts[:-1, None] + jnp.arange(kk, dtype=jnp.int32)[None], m - 1
        )
        seg = lo_s[idx2] // dup2 if return_slotmap else lo_s[idx2]
    if pack_exact:
        seg = seg & ((1 << rank_bits) - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, kk), 1)
    live = j < jnp.minimum(counts, kk)[:, None]
    out = jnp.where(live, seg, jnp.int32(-1))
    if K > kk:
        out = jnp.pad(out, ((0, 0), (0, K - kk)), constant_values=-1)
    if return_depth:
        if idx2 is None and SELEXT == "pallas" and kk % 128 == 0:
            from d3ga_tpu.raster.pallas_extract import extract_slices

            dsel_raw = extract_slices(
                dep_s, starts[:-1], kk,
                interpret=jax.default_backend() != "tpu",
            )
        elif idx2 is None:
            dep_pad = jnp.concatenate([dep_s, jnp.zeros((kk,), dep_s.dtype)])
            if SELEXT == "gslice":
                dsel_raw = jax.lax.gather(
                    dep_pad, starts[:-1, None],
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,),
                    ),
                    slice_sizes=(kk,), indices_are_sorted=True,
                    mode=jax.lax.GatherScatterMode.CLIP,
                )
            else:
                dsel_raw = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(dep_pad, (s,), (kk,))
                )(starts[:-1])
        else:
            dsel_raw = dep_s[idx2]
        dsel = jnp.where(live, dsel_raw, jnp.inf)
        if K > kk:
            dsel = jnp.pad(dsel, ((0, 0), (0, K - kk)), constant_values=jnp.inf)
        return out, counts, clamp_dropped, ties, dsel
    if return_slotmap:
        # Every sorted position p belongs to exactly one (tile, rank)
        # slot: t(p) from the key's high bits, k(p) = p - segment_start
        # via a dense cummax (no gathers). Inverting p(flat) is ONE
        # [m] sort — lax.sort of (flat_s, slot_p) — because flat_s is a
        # permutation of 0..m-1 (every (i, d) emits exactly one key,
        # dead ones with a sentinel tile).
        t_of_p = jax.lax.shift_right_logical(hi_s, depth_bits)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), t_of_p[1:] != t_of_p[:-1]]
        )
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pidx, 0)
        )
        k_of_p = pidx - seg_start
        slot_p = jnp.where(
            (t_of_p < T) & (k_of_p < kk), t_of_p * K + k_of_p, T * K
        )
        _, slot_by_flat = jax.lax.sort((lo_s, slot_p), num_keys=1)
        return out, counts, clamp_dropped, ties, slot_by_flat.reshape(n, dup2)
    return out, counts, clamp_dropped, ties


def _coarse_block_lists(
    rects, valid_sorted, ranks, nbx, nby, block, kb, super_factor=2,
    packed=None,
):
    """Rank-ascending candidate lists per `block`x`block`-tile block.

    Three-level funnel: the expensive masked top_k over all N runs at
    SUPERBLOCK granularity (super_factor x super_factor blocks — 4.5x
    fewer rows over N than the block-level top_k, which measured
    ~11.5 ms of the step at Goliath scale); blocks then select from
    their superblock's list (tiny second top_k). Semantics are
    identical as long as the superblock list cap is not exceeded —
    drops past either cap are reported in block_overflow.

    Returns (block_ranks [NB, kb] ascending with BIG_RANK pad,
    block_packed [NB, kb] the candidates' packed tile rects,
    block_counts [NB], block_overflow [])."""
    xmin, xmax, ymin, ymax = rects
    n = xmin.shape[0]
    n_blocks = nbx * nby
    bids = jnp.arange(n_blocks, dtype=jnp.int32)
    bx0 = (bids % nbx) * block
    by0 = (bids // nbx) * block
    if packed is None:
        packed = xmin | (xmax << 8) | (ymin << 16) | (ymax << 24)

    if super_factor <= 1:
        # two-level form: masked top_k over all N directly per block
        b_overlap = (
            valid_sorted[None, :]
            & (bx0[:, None] < xmax[None, :])
            & (bx0[:, None] + block > xmin[None, :])
            & (by0[:, None] < ymax[None, :])
            & (by0[:, None] + block > ymin[None, :])
        )  # [NB, N]
        b_score = jnp.where(b_overlap, ranks[None, :], BIG_RANK)
        block_ranks = -jax.lax.top_k(-b_score, kb)[0]
        bval = block_ranks < BIG_RANK
        block_packed = jnp.where(
            bval, packed[jnp.where(bval, block_ranks, 0)], 0
        )
        block_counts = jnp.sum(b_overlap.astype(jnp.int32), axis=-1)
        block_overflow = jnp.sum(jnp.maximum(block_counts - kb, 0))
        return block_ranks, block_packed, block_counts, block_overflow

    sb = block * super_factor
    nsx = -(-nbx // super_factor)
    nsy = -(-nby // super_factor)
    n_super = nsx * nsy
    ksb = min(kb * super_factor * super_factor, n)
    sids = jnp.arange(n_super, dtype=jnp.int32)
    sx0 = (sids % nsx) * sb
    sy0 = (sids // nsx) * sb
    s_overlap = (
        valid_sorted[None, :]
        & (sx0[:, None] < xmax[None, :])
        & (sx0[:, None] + sb > xmin[None, :])
        & (sy0[:, None] < ymax[None, :])
        & (sy0[:, None] + sb > ymin[None, :])
    )  # [NS, N]
    s_score = jnp.where(s_overlap, ranks[None, :], BIG_RANK)
    super_ranks = -jax.lax.top_k(-s_score, ksb)[0]  # [NS, ksb] ascending
    sval = super_ranks < BIG_RANK
    super_packed = jnp.where(sval, packed[jnp.where(sval, super_ranks, 0)], 0)
    super_counts = jnp.sum(s_overlap.astype(jnp.int32), axis=-1)
    super_overflow = jnp.sum(jnp.maximum(super_counts - ksb, 0))

    # blocks pick from their superblock's candidate list
    super_of_block = (by0 // sb) * nsx + (bx0 // sb)
    block_ranks, block_packed, block_counts, b_overflow = _refine_lists(
        super_ranks, super_packed, super_of_block, bx0, by0, block, kb
    )
    return (
        block_ranks,
        block_packed,
        block_counts,
        super_overflow + b_overflow,
    )


def _select_per_tile(
    rects_sorted, valid_sorted, n_tiles_x, n_tiles_y, K,
    tile_ids=None, block=8, block_cap=4096, sub_block=0, sub_cap=1024,
    super_factor=1, coarse="topk", dup=2, return_q=False,
):
    """Funnel tile binning (all inputs in depth-rank order).

    Per-tile top_k over all N Gaussians is prohibitively slow on TPU
    (sorting networks scale with N); instead every level uses
    first-K-set-bits selection on already-rank-ascending lists:

      1. coarse: superblock then `block` x `block`-tile candidate lists
         (see `_coarse_block_lists`),
      2. optional sub-block level (`sub_block` x `sub_block` tiles, cap
         `sub_cap`): shrinks the per-tile candidate lists so the fine
         top_k, its mask build and the record gathers all scale down by
         block_cap/sub_cap,
      3. fine: each tile tests only its (sub-)block's candidate list;
         the four tile-rect bounds are packed into ONE int32 carried
         down the funnel so no level randomly gathers over N.

    rects_sorted: (xmin, xmax, ymin, ymax) [N] in rank order;
    valid_sorted: [N] bool in rank order.
    Returns (ranks [T, K] int32 with BIG_RANK padding, counts [T] int32,
    block_overflow [] int32 — Gaussians dropped past any funnel cap).
    """
    xmin, xmax, ymin, ymax = rects_sorted
    n = xmin.shape[0]
    # The rect packing below stores each tile bound in one byte; tile
    # grids of >=256 per side (images >= 4096 px) would silently wrap.
    assert n_tiles_x < 256 and n_tiles_y < 256, (
        f"tile grid {n_tiles_x}x{n_tiles_y} exceeds the 255-per-side "
        "int32 rect packing limit (image >= 4096 px); raise TILE or "
        "widen the packing"
    )
    nbx = -(-n_tiles_x // block)
    nby = -(-n_tiles_y // block)
    kb = min(block_cap, n)

    if coarse == "dupsort_tile":
        if return_q:
            out, counts, overflow, q = _select_per_tile_dupsort(
                rects_sorted, valid_sorted, n_tiles_x, n_tiles_y, K,
                dup=dup, return_q=True,
            )
            if tile_ids is not None:
                out = out[tile_ids]
                counts = counts[tile_ids]
                q = q[tile_ids]
            return out, counts, overflow, q
        out, counts, overflow = _select_per_tile_dupsort(
            rects_sorted, valid_sorted, n_tiles_x, n_tiles_y, K, dup=dup
        )
        if tile_ids is not None:
            out = out[tile_ids]
            counts = counts[tile_ids]
        return out, counts, overflow
    assert not return_q, "return_q requires coarse='dupsort_tile'"

    ranks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # Pack the rect into one int32 (tile grids are < 256 on a side).
    packed = xmin | (xmax << 8) | (ymin << 16) | (ymax << 24)

    if coarse == "dupsort":
        parent_ranks, parent_packed, _, block_overflow = (
            _coarse_block_lists_dupsort(
                (xmin, xmax, ymin, ymax), valid_sorted,
                nbx, nby, block, kb, packed, dup=dup,
            )
        )
    else:
        parent_ranks, parent_packed, _, block_overflow = _coarse_block_lists(
            (xmin, xmax, ymin, ymax), valid_sorted, ranks,
            nbx, nby, block, kb, super_factor=super_factor, packed=packed,
        )
    pblock, npx = block, nbx

    if sub_block and sub_block < block and sub_cap < kb:
        nsbx = -(-n_tiles_x // sub_block)
        nsby = -(-n_tiles_y // sub_block)
        sbids = jnp.arange(nsbx * nsby, dtype=jnp.int32)
        sbx0 = (sbids % nsbx) * sub_block
        sby0 = (sbids // nsbx) * sub_block
        block_of_sub = (sby0 // block) * nbx + (sbx0 // block)
        parent_ranks, parent_packed, _, sub_overflow = _refine_lists(
            parent_ranks, parent_packed, block_of_sub, sbx0, sby0,
            sub_block, sub_cap,
        )
        block_overflow = block_overflow + sub_overflow
        pblock, npx = sub_block, nsbx

    # --- fine: per-tile first-K among (sub-)block candidates ---------------
    # Block-major layout: candidate rank + packed rect ride the funnel,
    # so the fine stage is row gathers + pure VPU compares.
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)
    T = tile_ids.shape[0]
    txs = tile_ids % n_tiles_x
    tys = tile_ids // n_tiles_x
    block_of_tile = (tys // pblock) * npx + (txs // pblock)
    kb = parent_ranks.shape[1]

    cand = parent_ranks[block_of_tile]           # [T, kb] row gathers
    cpacked = parent_packed[block_of_tile]       # [T, kb] row gathers
    cvalid = cand < BIG_RANK
    cxmin = cpacked & 0xFF
    cxmax = (cpacked >> 8) & 0xFF
    cymin = (cpacked >> 16) & 0xFF
    cymax = (cpacked >> 24) & 0xFF
    overlap = (
        cvalid
        & (txs[:, None] >= cxmin)
        & (txs[:, None] < cxmax)
        & (tys[:, None] >= cymin)
        & (tys[:, None] < cymax)
    )  # [T, kb]
    # Compaction via batched top_k over the candidate POSITION (the list
    # is rank-ascending, so the first K overlapping positions are the
    # frontmost K Gaussians) — avoids a slow 11M-element scatter.
    j = jax.lax.broadcasted_iota(jnp.int32, (T, kb), 1)
    key = jnp.where(overlap, j, kb)
    first_k = -jax.lax.top_k(-key, min(K, kb))[0]  # [T, K] ascending positions
    hit = first_k < kb
    out = jnp.where(
        hit,
        jnp.take_along_axis(cand, jnp.where(hit, first_k, 0), axis=1),
        BIG_RANK,
    )
    if K > kb:
        out = jnp.pad(out, ((0, 0), (0, K - kb)), constant_values=BIG_RANK)
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
    return out, counts, block_overflow


def rasterize_tiled_batch(
    means3d,
    cameras: Camera,
    bg_color,
    cov3d=None,
    scales=None,
    rotations=None,
    opacities=None,
    colors=None,
    max_per_tile: int = 256,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    coarse: str = "dupsort_depth",
    dup: int = 3,
    depth_exact: bool = True,
):
    """Batched-over-frames rasterization: means3d [B, N, 3], `cameras` a
    Camera whose array fields carry a leading B (same static W/H), bg
    [C] or [B, C]. Returns (images [B, C, H, W], RasterAux).

    Round 5: the batch is folded into the TILE GRID — frames stack
    vertically in tile space (frame f owns tile rows [f*nty, (f+1)*nty))
    and the whole batch runs through the SAME champion machinery as
    `rasterize_tiled`: one `_select_per_tile_depthkey` (tile|depth|index)
    sort over B*dup^2*N keys with clamp/tie/overflow accounting, one
    record gather, one ct blend over B*T tiles (records keep per-frame
    pixel coords; the kernel's pixel-y origin wraps every `frame_rows`
    tile rows, so per-frame outputs are BIT-IDENTICAL to single-frame
    calls whenever the depth-quantization width matches). This replaces
    the round-2 topk-funnel batch path, which had silently weaker
    overflow semantics (no depth ties, no clamp/visible split —
    VERDICT r4 #6). The TPU-native analog of the CUDA reference's
    one-frame-per-step loop (`/root/reference/train.py:150-258`).

    `coarse` accepts "dupsort_depth" only (the champion); kept as a
    parameter so callers fail loudly rather than silently changing
    semantics."""
    assert coarse == "dupsort_depth", (
        "rasterize_tiled_batch runs the champion dupsort_depth selection;"
        " other funnels are single-frame only"
    )
    B, N = means3d.shape[:2]
    H, W = cameras.height, cameras.width
    n_tiles_x = -(-W // TILE)
    n_tiles_y = -(-H // TILE)
    n_tiles = n_tiles_x * n_tiles_y
    nty_total = B * n_tiles_y

    def project_one(args):
        m, cam_wv, cam_fp, cam_cc, tfx, tfy, cv, op, co = args
        cam = Camera(
            world_view=cam_wv, full_proj=cam_fp, camera_center=cam_cc,
            tanfovx=tfx, tanfovy=tfy, width=W, height=H,
        )
        return project_gaussians(m, cam, cov3d=cv, opacities=op, colors=co)

    if cov3d is None:
        from d3ga_tpu.ops.covariance import (
            covariance_from_scaling_rotation,
            strip_symmetric,
        )

        cov3d = strip_symmetric(
            covariance_from_scaling_rotation(
                scales.reshape(B * N, 3), rotations.reshape(B * N, 4)
            )
        ).reshape(B, N, 6)

    proj = jax.vmap(project_one)(
        (
            means3d, cameras.world_view, cameras.full_proj,
            cameras.camera_center, cameras.tanfovx, cameras.tanfovy,
            cov3d, opacities, colors,
        )
    )
    valid = (proj.valid & (proj.radius > 0)).reshape(B * N)

    C = proj.color.shape[-1]
    records = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[..., None], proj.color], axis=-1
    ).reshape(B * N, -1)

    # per-frame tile rects, shifted into the stacked grid in INT tile
    # coords (exact — pixel coords stay per-frame) and clamped to the
    # frame's tile-row band
    rects = tile_rect(
        proj.xy.reshape(B * N, 2), proj.radius.reshape(B * N), TILE,
        n_tiles_x, n_tiles_y,
    )
    xmin, xmax, ymin, ymax = rects
    f_row = jnp.repeat(
        jnp.arange(B, dtype=jnp.int32) * n_tiles_y, N
    )
    ymin = ymin + f_row
    ymax = ymax + f_row
    rects = (xmin, xmax, ymin, ymax)

    ranks, counts, block_overflow, depth_ties = _select_per_tile_depthkey(
        rects, valid, proj.depth.reshape(B * N), n_tiles_x, nty_total,
        max_per_tile, dup=dup, depth_exact=depth_exact,
    )
    sel_valid = ranks >= 0

    K = max_per_tile
    records_ext = jnp.concatenate(
        [records, jnp.zeros((1, records.shape[1]), records.dtype)], axis=0
    )
    idx = jnp.where(sel_valid, ranks, jnp.int32(B * N))
    cnts = jnp.minimum(counts, K)

    if use_pallas:
        pallas_interpret = pallas_interpret or jax.default_backend() != "tpu"
        from d3ga_tpu.raster.pallas_segsum import block_width

        if REC_GRAD == "segsum" and block_width(dup * dup) >= 128:
            from d3ga_tpu.raster.pallas_segsum import blend_gather_segsum_ct

            out = blend_gather_segsum_ct(
                records_ext, idx, cnts, n_tiles_x, nty_total, C, dup * dup,
                pallas_interpret, n_tiles_y,
            )
        else:
            from d3ga_tpu.raster.pallas_blend_ct import blend_image_ct

            rec_t = records_ext[idx]  # [B*T, K, 6+C]
            out = blend_image_ct(
                jnp.swapaxes(rec_t, 1, 2), cnts, n_tiles_x, nty_total, C,
                pallas_interpret, n_tiles_y,
            )  # [(C+1), B*nty*16, ntx*16] planar, T_bg last plane
        out = out.reshape(C + 1, B, n_tiles_y * TILE, n_tiles_x * TILE)
        out = jnp.transpose(out, (1, 0, 2, 3))  # [B, C+1, Hp, Wp]
        bg = jnp.asarray(bg_color)
        if bg.ndim == 1:
            bg = jnp.broadcast_to(bg, (B, C))
        images = (
            out[:, :C] + out[:, C:] * bg[:, :, None, None]
        )[:, :, :H, :W]
        tbg_tiles = out[:, C].reshape(
            B, n_tiles_y, TILE, n_tiles_x, TILE
        ).max((2, 4)).reshape(-1)
    else:
        safe_ranks = jnp.where(sel_valid, ranks, 0)
        rec_t = records[safe_ranks]  # [B*T, K, 6+C]
        xy_t = rec_t[..., 0:2]
        conic_t = rec_t[..., 2:5]
        opac_t = rec_t[..., 5]
        color_t = rec_t[..., 6:]

        # LOCAL per-frame tile origins (records keep per-frame coords)
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
        tile_origin = jnp.stack(
            [(tids % n_tiles_x) * TILE, (tids // n_tiles_x) * TILE], -1
        )
        origin_f = jnp.tile(tile_origin, (B, 1))

        bg = jnp.asarray(bg_color)
        if bg.ndim == 1:
            bg_tiles = jnp.broadcast_to(bg, (B * n_tiles, C))
        else:
            bg_tiles = jnp.repeat(bg, n_tiles, axis=0)  # [B*T, C]
        tiles = _blend_tiles_bg(
            xy_t, conic_t, color_t, opac_t, sel_valid, bg_tiles, origin_f
        )

        img = tiles.reshape(B, n_tiles_y, n_tiles_x, TILE, TILE, C + 1)
        img = jnp.transpose(img, (0, 1, 3, 2, 4, 5)).reshape(
            B, n_tiles_y * TILE, n_tiles_x * TILE, C + 1
        )[:, :H, :W]
        images = jnp.transpose(img[..., :C], (0, 3, 1, 2))
        tbg_tiles = 1.0 - tiles[..., C].min(axis=1)

    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + block_overflow,
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
        visible_overflow=visible_cap_drops(tbg_tiles, counts, max_per_tile)
        + block_overflow,
        depth_ties=depth_ties,
        clamp_overflow=block_overflow,
    )
    return images, aux


def rasterize_tiled_fused(
    means3d,
    camera: Camera,
    bg_color,
    cov3d=None,
    scales=None,
    rotations=None,
    opacities=None,
    colors=None,
    shs=None,
    sh_degree: int = 0,
    max_per_tile: int = 256,
    block_cap: int = 4096,
    return_alpha: bool = False,
    interpret: bool = False,
    variant: int = 2,
):
    """Rasterize via the fused select+compact+blend Pallas kernel:
    XLA does projection, depth sort and the coarse 8x8-tile-block
    binning; ONE kernel performs per-tile selection, record compaction
    and alpha blending. Output matches `rasterize_tiled` semantics
    (per-tile K cap + overflow counters).

    variant=1: banded one-hot matmul compaction (pallas_fused.py);
    variant=2: butterfly lane-roll compaction (pallas_fused2.py)."""
    from d3ga_tpu.raster.attic.pallas_fused import BLOCK, fused_select_blend

    # Pallas TPU kernels only run compiled on TPU; fall back to the
    # interpreter elsewhere (CPU tests, virtual meshes, dryruns).
    interpret = interpret or jax.default_backend() != "tpu"

    H, W = camera.height, camera.width
    n_tiles_x = -(-W // TILE)
    n_tiles_y = -(-H // TILE)
    assert n_tiles_x < 256 and n_tiles_y < 256
    nbx = -(-n_tiles_x // BLOCK)
    nby = -(-n_tiles_y // BLOCK)
    n_blocks = nbx * nby

    proj = project_gaussians(
        means3d, camera, cov3d=cov3d, scales=scales, rotations=rotations,
        opacities=opacities, colors=colors, shs=shs, sh_degree=sh_degree,
    )
    valid = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)

    C = proj.color.shape[-1]
    records = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], proj.color], axis=-1
    )
    records, radius_s, valid_s = reorder_records(
        records, proj.radius, valid, order
    )
    xy_s = records[:, 0:2]
    n = xy_s.shape[0]
    kb = min(block_cap, n)

    xmin, xmax, ymin, ymax = tile_rect(xy_s, radius_s, TILE, n_tiles_x, n_tiles_y)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    bids = jnp.arange(n_blocks, dtype=jnp.int32)
    bx0 = (bids % nbx) * BLOCK
    by0 = (bids // nbx) * BLOCK
    block_ranks, _, block_counts, block_overflow = _coarse_block_lists(
        (xmin, xmax, ymin, ymax), valid_s, ranks, nbx, nby, BLOCK, kb
    )
    # the kernel consumes whole 128-lane chunks
    kb_pad = (-kb) % 128
    if kb_pad:
        block_ranks = jnp.pad(
            block_ranks, ((0, 0), (0, kb_pad)), constant_values=BIG_RANK
        )
        kb += kb_pad

    cand_ok = block_ranks < BIG_RANK
    safe = jnp.where(cand_ok, block_ranks, 0)

    # --- per-block candidate records -> channels-first vals ------------
    # layout: (x_blk, y_blk, conic A/B/C, opacity, colors..., pad to 16)
    rec_b = records[safe]                       # [NB, kb, 6+C]
    xy_b = rec_b[..., 0:2]
    conic_b = rec_b[..., 2:5]
    opac_b = jnp.where(cand_ok, rec_b[..., 5], 0.0)
    color_b = rec_b[..., 6:]
    block_px = jnp.stack([bx0 * TILE, by0 * TILE], axis=-1).astype(xy_b.dtype)
    xy_local = xy_b - block_px[:, None, :]
    pad = jnp.zeros(xy_b.shape[:2] + (16 - 6 - C,), xy_b.dtype)
    vals = jnp.concatenate(
        [xy_local, conic_b, opac_b[..., None], color_b, pad], axis=-1
    )  # [NB, kb, 16]

    # --- block-local clamped rects (invalid -> 0 = never overlaps) -----
    lxmin = jnp.clip(xmin[safe] - bx0[:, None], 0, BLOCK)
    lxmax = jnp.clip(xmax[safe] - bx0[:, None], 0, BLOCK)
    lymin = jnp.clip(ymin[safe] - by0[:, None], 0, BLOCK)
    lymax = jnp.clip(ymax[safe] - by0[:, None], 0, BLOCK)
    rects_l = jnp.where(
        cand_ok,
        lxmin | (lxmax << 8) | (lymin << 16) | (lymax << 24),
        0,
    )  # [NB, kb]

    if variant == 2:
        from d3ga_tpu.raster.attic.pallas_fused2 import fused_select_blend2

        tiles, counts = fused_select_blend2(
            jnp.transpose(vals, (0, 2, 1)),       # [NB, 16, kb]
            rects_l[:, None, :],                   # [NB, 1, kb]
            max_per_tile, C, interpret,
        )
    else:
        NC = kb // 128
        tiles, counts = fused_select_blend(
            jnp.transpose(
                vals.reshape(n_blocks, NC, 128, 16), (0, 1, 3, 2)
            ),                                     # [NB, NC, 16, 128]
            rects_l.reshape(n_blocks, NC, 128),
            max_per_tile, C, interpret,
        )
    # tiles [NB, 64, 256, C+1]; T_bg in the last channel

    # --- untile (padded block grid, then crop) -------------------------
    img = tiles.reshape(nby, nbx, BLOCK, BLOCK, TILE, TILE, C + 1)
    img = jnp.transpose(img, (0, 2, 4, 1, 3, 5, 6)).reshape(
        nby * BLOCK * TILE, nbx * BLOCK * TILE, C + 1
    )[:H, :W]
    t_bg = img[..., C]
    image = jnp.transpose(img[..., :C], (2, 0, 1)) + t_bg[None] * jnp.asarray(
        bg_color
    )[:, None, None]

    # counts: only tiles inside the image participate in the counters
    cnt = counts.reshape(nby, nbx, BLOCK, BLOCK)
    tile_in_x = jnp.arange(nbx * BLOCK) < n_tiles_x
    tile_in_y = jnp.arange(nby * BLOCK) < n_tiles_y
    inside = (
        tile_in_y.reshape(nby, 1, BLOCK, 1) & tile_in_x.reshape(1, nbx, 1, BLOCK)
    )
    cnt = jnp.where(inside, cnt, 0)
    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(cnt - max_per_tile, 0)) + block_overflow,
        max_per_tile=jnp.max(cnt),
        n_contrib=jnp.sum(jnp.minimum(cnt, max_per_tile)),
    )
    if return_alpha:
        return image, 1.0 - t_bg, aux
    return image, aux


def _blend_tiles_bg(xy_t, conic_t, color_t, opac_t, sel_valid, bg_tiles, tile_origin):
    """`_blend_tiles` with a PER-TILE background row [T, C] (the batched
    path gives each frame its own bg)."""
    out = _blend_tiles(
        xy_t, conic_t, color_t, opac_t, sel_valid, jnp.zeros(color_t.shape[-1]),
        tile_origin,
    )
    alpha = out[..., -1:]
    rgb = out[..., :-1] + (1.0 - alpha) * bg_tiles[:, None, :]
    return jnp.concatenate([rgb, alpha], axis=-1)


def _blend_tiles(xy_t, conic_t, color_t, opac_t, sel_valid, bg_color, tile_origin, blend_chunk=128):
    """Blend all tiles. Inputs are per-tile gathered records:
    xy_t [T,K,2], conic_t [T,K,3], color_t [T,K,C], opac_t [T,K],
    sel_valid [T,K] bool, tile_origin [T,2] (pixel x,y of tile corner).
    Returns tiles [T, TILE*TILE, C+1] (last channel = alpha = 1-T_bg).
    """
    T = xy_t.shape[0]
    C = color_t.shape[-1]
    dtype = xy_t.dtype

    dy, dx = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    local = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1).astype(dtype)  # [256,2]

    n_pad = -(-T // blend_chunk) * blend_chunk
    pad = n_pad - T

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    xy_t, conic_t, color_t, opac_t, tile_origin = map(
        pad0, (xy_t, conic_t, color_t, opac_t, tile_origin)
    )
    sel_valid = jnp.pad(sel_valid, [(0, pad), (0, 0)])

    K = xy_t.shape[1]
    # Upper-triangular ones: cumsum along K expressed as a single MXU
    # matmul (fp32-exact precision) instead of a log2(K)-pass
    # associative scan — the transmittance recurrence becomes
    #   log T_after = log1p(-alpha) @ U.
    U_incl = jnp.asarray(
        np.triu(np.ones((K, K), np.float32), k=0), dtype
    )

    # Quadratic pixel basis [256, 6]: (1, dx, dy, dx^2, dy^2, dx*dy) in
    # tile-LOCAL coordinates, so the Gaussian falloff power is one
    # [256, 6] x [6, K] MXU matmul per tile instead of materializing the
    # [256, K, 2] displacement tensor on the VPU.
    dxl = local[:, 0]
    dyl = local[:, 1]
    basis = jnp.stack(
        [jnp.ones_like(dxl), dxl, dyl, dxl * dxl, dyl * dyl, dxl * dyl], axis=-1
    )  # [256, 6]

    def chunk_fn(args):
        xy, conic, color, opac, sval, origin = args
        B = xy.shape[0]
        # Gaussian centers in tile-local coords [B, K, 2]
        d0 = xy - origin[:, None, :].astype(dtype)
        A = conic[..., 0]
        Bc = conic[..., 1]
        C2 = conic[..., 2]
        d0x = d0[..., 0]
        d0y = d0[..., 1]
        # power(dx,dy) = -(1/2)(A(dx-d0x)^2 + C(dy-d0y)^2) - B(dx-d0x)(dy-d0y)
        coeffs = jnp.stack(
            [
                -0.5 * (A * d0x * d0x + C2 * d0y * d0y) - Bc * d0x * d0y,
                A * d0x + Bc * d0y,
                C2 * d0y + Bc * d0x,
                -0.5 * A,
                -0.5 * C2,
                -Bc,
            ],
            axis=-1,
        )  # [B, K, 6]
        power = jnp.einsum(
            "pc,bkc->bpk", basis, coeffs, precision=jax.lax.Precision.HIGHEST
        )  # [B, 256, K]
        alpha = jnp.minimum(ALPHA_MAX, opac[:, None, :] * jnp.exp(power))
        use = sval[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_SKIP)
        alpha = jnp.where(use, alpha, 0.0)

        lg = jnp.log1p(-alpha)  # [B, 256, K], <= 0
        # HIGH (3-pass bf16) is ample: |cum| <= ~1200, rel err ~2^-21.
        cum_incl = jax.lax.dot_general(
            lg.reshape(B * lg.shape[1], K), U_incl,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        ).reshape(lg.shape)
        # one exp for both transmittances (t_after = t_before*(1-alpha),
        # exact to ~1 ulp; halves the big [B,256,K] transcendental cost)
        t_before = jnp.exp(cum_incl - lg)
        t_after = t_before * (1.0 - alpha)
        accept = t_after >= T_EPS
        w = jnp.where(accept, t_before * alpha, 0.0)
        t_bg = jnp.exp(jnp.sum(jnp.where(accept, lg, 0.0), axis=-1))
        rgb = jnp.einsum(
            "bpk,bkc->bpc", w, color, precision=jax.lax.Precision.HIGHEST
        )
        rgb = rgb + t_bg[..., None] * bg_color
        return jnp.concatenate([rgb, 1.0 - t_bg[..., None]], axis=-1)

    out = jax.lax.map(
        chunk_fn,
        (
            xy_t.reshape(-1, blend_chunk, *xy_t.shape[1:]),
            conic_t.reshape(-1, blend_chunk, *conic_t.shape[1:]),
            color_t.reshape(-1, blend_chunk, *color_t.shape[1:]),
            opac_t.reshape(-1, blend_chunk, *opac_t.shape[1:]),
            sel_valid.reshape(-1, blend_chunk, *sel_valid.shape[1:]),
            tile_origin.reshape(-1, blend_chunk, 2),
        ),
    )
    return out.reshape(n_pad, TILE * TILE, C + 1)[:T]


def rasterize_tiled(
    means3d,
    camera: Camera,
    bg_color,
    cov3d=None,
    scales=None,
    rotations=None,
    opacities=None,
    colors=None,
    shs=None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    max_per_tile: int = 256,
    block_cap: int = 4096,
    sub_block: int = 0,
    sub_cap: int = 1024,
    super_factor: int = 1,
    coarse: str = "topk",
    dup: int = 2,
    depth_exact: bool = True,
    return_alpha: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Render [C, H, W] (+ optional alpha [H, W]) with aux counters.

    depth_exact (dupsort_depth only; round-5 DEFAULT True, measured
    ~0.9% of throughput on-chip — VERDICT r4 #9): carry the full f32
    depth through the selection sort so blend order is exactly
    depth-resolved (the CUDA reference's full-bit-pattern keys,
    SURVEY.md §3.5); False quantizes to the key's depth bits, breaking
    same-quantum ties by index, counted in aux.depth_ties (train.py
    auto-escapes back to exact on a nonzero count)."""
    H, W = camera.height, camera.width
    n_tiles_x = -(-W // TILE)
    n_tiles_y = -(-H // TILE)
    n_tiles = n_tiles_x * n_tiles_y

    proj = project_gaussians(
        means3d,
        camera,
        cov3d=cov3d,
        scales=scales,
        rotations=rotations,
        opacities=opacities,
        colors=colors,
        shs=shs,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        antialiasing=antialiasing,
    )
    valid = proj.valid & (proj.radius > 0)

    # Records PACKED into one [N, 6+C] row array so the per-tile gather
    # (and its scatter-add transpose in the backward) is a single
    # contiguous row copy instead of 4 strided ones.
    C = proj.color.shape[-1]
    records = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], proj.color], axis=-1
    )

    slot_map = None
    depth_ties = jnp.int32(-1)
    if coarse == "dupsort_depth":
        # (tile | depth | index) key sort: no global depth argsort and
        # no record reordering at all — per-tile lists come out
        # front-to-back holding ORIGINAL Gaussian indices.
        rects = tile_rect(proj.xy, proj.radius, TILE, n_tiles_x, n_tiles_y)
        if use_pallas and REC_GRAD == "slotmap":
            ranks, counts, block_overflow, depth_ties, slot_map = (
                _select_per_tile_depthkey(
                    rects, valid, proj.depth, n_tiles_x, n_tiles_y,
                    max_per_tile, dup=dup, return_slotmap=True,
                    depth_exact=depth_exact,
                )
            )
        else:
            ranks, counts, block_overflow, depth_ties = (
                _select_per_tile_depthkey(
                    rects, valid, proj.depth, n_tiles_x, n_tiles_y,
                    max_per_tile, dup=dup, depth_exact=depth_exact,
                )
            )
        sel_valid = ranks >= 0
        dup_q = None
    else:
        sort_depth = jnp.where(valid, proj.depth, jnp.inf)
        if REORDER == "sortpayload":
            # ONE multi-operand sort carries every record column (plus
            # radius/valid) as payloads — replaces argsort + row gather.
            nc = records.shape[1]
            outs = jax.lax.sort(
                (sort_depth,)
                + tuple(records[:, i] for i in range(nc))
                + (proj.radius, valid.astype(jnp.int32)),
                num_keys=1,
                is_stable=True,
            )
            records = jnp.stack(outs[1 : 1 + nc], axis=1)
            radius_s = outs[1 + nc]
            valid_s = outs[2 + nc].astype(bool)
        else:
            order = jnp.argsort(sort_depth, stable=True)  # rank -> id
            records, radius_s, valid_s = reorder_records(
                records, proj.radius, valid, order
            )
        xy_s = records[:, 0:2]

        rects = tile_rect(xy_s, radius_s, TILE, n_tiles_x, n_tiles_y)
        want_q = (
            use_pallas and coarse == "dupsort_tile" and REC_GRAD == "dupslot"
        )
        if want_q:
            ranks, counts, block_overflow, dup_q = _select_per_tile(
                rects, valid_s, n_tiles_x, n_tiles_y, max_per_tile,
                block_cap=block_cap, sub_block=sub_block, sub_cap=sub_cap,
                super_factor=super_factor, coarse=coarse, dup=dup,
                return_q=True,
            )
        else:
            dup_q = None
            ranks, counts, block_overflow = _select_per_tile(
                rects, valid_s, n_tiles_x, n_tiles_y, max_per_tile,
                block_cap=block_cap, sub_block=sub_block, sub_cap=sub_cap,
                super_factor=super_factor, coarse=coarse, dup=dup,
            )
        sel_valid = ranks < BIG_RANK

    if use_pallas:
        # Record-direct fused blend: ONE gather feeds the kernel (raw
        # records, global xy); invalid entries gather a zero sentinel
        # row (opacity 0 -> inert), so no mask/coeff/slice buffers are
        # materialized; the kernel writes the assembled image directly
        # (no untile transpose chain).
        from d3ga_tpu.raster.pallas_blend_rec import blend_image_rec

        # Pallas TPU kernels only run compiled on TPU; interpret
        # elsewhere (CPU tests, virtual meshes, dryruns).
        pallas_interpret = pallas_interpret or jax.default_backend() != "tpu"

        records_ext = jnp.concatenate(
            [records, jnp.zeros((1, records.shape[1]), records.dtype)], axis=0
        )
        idx = jnp.where(sel_valid, ranks, jnp.int32(records.shape[0]))
        if dup_q is not None:
            rec_t = gather_records_dupslot(records_ext, idx, dup_q, dup * dup)
        elif slot_map is not None:
            rec_t = gather_records_slotmap(records_ext, idx, slot_map)
        elif coarse == "dupsort_depth" and REC_GRAD == "runsort":
            rec_t = gather_records_runsort(records_ext, idx, dup * dup)
        else:
            rec_t = records_ext[idx]  # [T, K, 6+C]
        if BLEND_LAYOUT == "ct":
            from d3ga_tpu.raster.pallas_blend_ct import blend_image_ct

            from d3ga_tpu.raster.pallas_segsum import block_width

            if (
                coarse == "dupsort_depth"
                and REC_GRAD == "segsum"
                and block_width(dup * dup) >= 128
            ):
                # gather + blend in ONE custom_vjp whose backward
                # replaces the XLA scatter-add with the sort +
                # Pallas segmented-sum combine (pallas_segsum.py).
                # dup > 11 (block_width < 128) falls through to the
                # scatter-add — the auto-widener never goes past 8.
                from d3ga_tpu.raster.pallas_segsum import (
                    blend_gather_segsum_ct,
                )

                out = blend_gather_segsum_ct(
                    records_ext, idx, jnp.minimum(counts, max_per_tile),
                    n_tiles_x, n_tiles_y, C, dup * dup, pallas_interpret,
                )
            else:
                out = blend_image_ct(
                    jnp.swapaxes(rec_t, 1, 2), jnp.minimum(counts, max_per_tile),
                    n_tiles_x, n_tiles_y, C, pallas_interpret,
                )  # [(C+1), nty*16, ntx*16] planar, T_bg last plane
            image = (
                out[:C] + out[C:] * jnp.asarray(bg_color)[:, None, None]
            )[:, :H, :W]
            alpha_img = 1.0 - out[C, :H, :W]
            tbg_tiles = out[C].reshape(n_tiles_y, TILE, n_tiles_x, TILE).max(
                (1, 3)
            ).reshape(-1)
        else:
            out = blend_image_rec(
                rec_t, jnp.minimum(counts, max_per_tile),
                n_tiles_x, n_tiles_y, C, pallas_interpret,
            )  # [nty*16, ntx*16, C+1] with T_bg last
            rgb = out[..., :C] + out[..., C:] * jnp.asarray(bg_color)
            img = jnp.concatenate([rgb, 1.0 - out[..., C:]], axis=-1)[:H, :W]
            image = jnp.transpose(img[..., :C], (2, 0, 1))
            alpha_img = img[..., C]
            tbg_tiles = out[..., C].reshape(
                n_tiles_y, TILE, n_tiles_x, TILE
            ).max((1, 3)).reshape(-1)

        aux = RasterAux(
            overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + block_overflow,
            max_per_tile=jnp.max(counts),
            n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
            visible_overflow=visible_cap_drops(tbg_tiles, counts, max_per_tile)
            + block_overflow,
            depth_ties=depth_ties,
            clamp_overflow=block_overflow,
        )
        if return_alpha:
            return image, alpha_img, aux
        return image, aux
    else:
        safe_ranks = jnp.where(sel_valid, ranks, 0)
        rec_t = records[safe_ranks]  # [T, K, 6+C]
        xy_t = rec_t[..., 0:2]
        conic_t = rec_t[..., 2:5]
        opac_t = rec_t[..., 5]
        color_t = rec_t[..., 6:]

        tids = jnp.arange(n_tiles, dtype=jnp.int32)
        tile_origin = jnp.stack(
            [(tids % n_tiles_x) * TILE, (tids // n_tiles_x) * TILE], -1
        )
        tiles = _blend_tiles(
            xy_t, conic_t, color_t, opac_t, sel_valid, bg_color, tile_origin
        )  # [T, 256, C+1]

    C = tiles.shape[-1] - 1
    img = tiles.reshape(n_tiles_y, n_tiles_x, TILE, TILE, C + 1)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
        n_tiles_y * TILE, n_tiles_x * TILE, C + 1
    )[:H, :W]
    image = jnp.transpose(img[..., :C], (2, 0, 1))

    # _blend_tiles' last channel is alpha = 1 - T_bg
    tbg_tiles = 1.0 - tiles[..., C].min(axis=1)
    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + block_overflow,
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
        visible_overflow=visible_cap_drops(tbg_tiles, counts, max_per_tile)
        + block_overflow,
        depth_ties=depth_ties,
        clamp_overflow=block_overflow,
    )
    if return_alpha:
        return image, img[..., C], aux
    return image, aux
