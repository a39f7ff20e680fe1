"""Tile-binned Gaussian-splat rasterizer — the TPU-native production path.

Design (vs the CUDA reference's global (tile|depth) radix sort + per-tile
sequential blend loops, SURVEY.md §3.5):

  1. project all N Gaussians densely (VPU),
  2. one global stable depth argsort,
  3. per 16x16 tile, select the frontmost K overlapping Gaussians by
     depth *rank* (a masked top-k — no dynamic shapes; K is a static cap
     with an overflow counter, "no silent caps"),
  4. blend each tile's 256 pixels against its K records by re-expressing
     front-to-back alpha compositing as an exclusive cumulative product
     over K followed by a [256, K] @ [K, C] matmul (MXU), exactly
     reproducing the CUDA alpha >= 1/255 skip and T < 1e-4 termination.

Everything is differentiable through jax.grad; no custom VJP is needed
for correctness (a fused Pallas kernel provides the same contract for
speed — see d3ga_tpu/raster/pallas_kernel.py).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.raster.oracle import blend_weights
from d3ga_tpu.raster.project import project_gaussians, tile_rect

TILE = 16
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
BIG_RANK = jnp.int32(2**30)


class RasterAux(NamedTuple):
    overflow: jnp.ndarray      # [] int32: Gaussians dropped past the K cap
    max_per_tile: jnp.ndarray  # [] int32: max overlap count over tiles
    n_contrib: jnp.ndarray     # [] int32: total selected entries


def _select_per_tile(
    rects_sorted, valid_sorted, n_tiles_x, n_tiles_y, K,
    tile_ids=None, block=8, block_cap=4096,
):
    """Two-level tile binning (all inputs in depth-rank order).

    Per-tile top_k over all N Gaussians is prohibitively slow on TPU
    (sorting networks scale with N); instead:

      1. coarse: for each block of `block` x `block` tiles, keep the
         frontmost `block_cap` overlapping Gaussians via one batched
         top_k over N (few dozen blocks — cheap),
      2. fine: each tile tests only its block's candidate list (already
         rank-ascending) and writes the first K hits via a
         cumsum-position scatter — no second top_k at all.

    rects_sorted: (xmin, xmax, ymin, ymax) [N] in rank order;
    valid_sorted: [N] bool in rank order.
    Returns (ranks [T, K] int32 with BIG_RANK padding, counts [T] int32,
    block_overflow [] int32 — Gaussians dropped past block_cap).
    """
    xmin, xmax, ymin, ymax = rects_sorted
    n = xmin.shape[0]
    nbx = -(-n_tiles_x // block)
    nby = -(-n_tiles_y // block)
    n_blocks = nbx * nby
    kb = min(block_cap, n)

    ranks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    score_src = jnp.where(valid_sorted, ranks, BIG_RANK)

    # --- coarse: block-level candidate lists -------------------------------
    bids = jnp.arange(n_blocks, dtype=jnp.int32)
    bx0 = (bids % nbx) * block
    by0 = (bids // nbx) * block
    b_overlap = (
        (bx0[:, None] < xmax[None, :])
        & (bx0[:, None] + block > xmin[None, :])
        & (by0[:, None] < ymax[None, :])
        & (by0[:, None] + block > ymin[None, :])
    )
    b_score = jnp.where(b_overlap, score_src[None, :], BIG_RANK)
    neg_top, _ = jax.lax.top_k(-b_score, kb)
    block_ranks = -neg_top  # [n_blocks, kb], ascending, BIG_RANK padded
    block_counts = jnp.sum(
        (b_overlap & valid_sorted[None, :]).astype(jnp.int32), axis=-1
    )
    block_overflow = jnp.sum(jnp.maximum(block_counts - kb, 0))

    # --- fine: per-tile first-K among block candidates ---------------------
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)
    T = tile_ids.shape[0]
    txs = tile_ids % n_tiles_x
    tys = tile_ids // n_tiles_x
    block_of_tile = (tys // block) * nbx + (txs // block)

    cand = block_ranks[block_of_tile]  # [T, kb] rank-ascending
    cvalid = cand < BIG_RANK
    safe = jnp.where(cvalid, cand, 0)
    overlap = (
        cvalid
        & (txs[:, None] >= xmin[safe])
        & (txs[:, None] < xmax[safe])
        & (tys[:, None] >= ymin[safe])
        & (tys[:, None] < ymax[safe])
    )  # [T, kb]
    pos = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
    keep = overlap & (pos < K)
    flat = jnp.where(
        keep,
        jax.lax.broadcasted_iota(jnp.int32, (T, kb), 0) * K + pos,
        T * K,
    )
    out = jnp.full((T * K,), BIG_RANK, jnp.int32)
    out = out.at[flat.reshape(-1)].set(cand.reshape(-1), mode="drop")
    counts = pos[:, -1] + 1
    return out.reshape(T, K), counts, block_overflow


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

    def chunk_fn(args):
        xy, conic, color, opac, sval, origin = args
        # pixel coords [B, 256, 2]
        pix = origin[:, None, :].astype(dtype) + local[None]
        d = xy[:, None, :, :] - pix[:, :, None, :]  # [B, 256, K, 2]
        power = (
            -0.5
            * (
                conic[:, None, :, 0] * d[..., 0] * d[..., 0]
                + conic[:, None, :, 2] * d[..., 1] * d[..., 1]
            )
            - conic[:, None, :, 1] * d[..., 0] * d[..., 1]
        )  # [B, 256, K]
        alpha = jnp.minimum(ALPHA_MAX, opac[:, None, :] * jnp.exp(power))
        use = sval[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_SKIP)
        alpha = jnp.where(use, alpha, 0.0)
        w, t_bg = blend_weights(alpha)  # [B, 256, K], [B, 256]
        rgb = jnp.einsum("bpk,bkc->bpc", w, color) + t_bg[..., None] * bg_color
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
    return_alpha: bool = False,
):
    """Render [C, H, W] (+ optional alpha [H, W]) with aux counters."""
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

    sort_depth = jnp.where(valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)  # rank -> gaussian id

    # Depth-sorted record arrays; selection operates in rank space.
    xy_s = proj.xy[order]
    conic_s = proj.conic[order]
    color_s = proj.color[order]
    opac_s = proj.opacity[order]
    radius_s = proj.radius[order]
    valid_s = valid[order]

    rects = tile_rect(xy_s, radius_s, TILE, n_tiles_x, n_tiles_y)
    ranks, counts, block_overflow = _select_per_tile(
        rects, valid_s, n_tiles_x, n_tiles_y, max_per_tile
    )
    sel_valid = ranks < BIG_RANK
    # Clamp padding ranks to 0 for safe gathers (masked out by sel_valid).
    safe_ranks = jnp.where(sel_valid, ranks, 0)

    xy_t = xy_s[safe_ranks]
    conic_t = conic_s[safe_ranks]
    color_t = color_s[safe_ranks]
    opac_t = opac_s[safe_ranks]

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_origin = jnp.stack([(tids % n_tiles_x) * TILE, (tids // n_tiles_x) * TILE], -1)

    tiles = _blend_tiles(
        xy_t, conic_t, color_t, opac_t, sel_valid, bg_color, tile_origin
    )  # [T, 256, C+1]

    C = tiles.shape[-1] - 1
    img = tiles.reshape(n_tiles_y, n_tiles_x, TILE, TILE, C + 1)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
        n_tiles_y * TILE, n_tiles_x * TILE, C + 1
    )[:H, :W]
    image = jnp.transpose(img[..., :C], (2, 0, 1))

    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + block_overflow,
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
    )
    if return_alpha:
        return image, img[..., C], aux
    return image, aux
