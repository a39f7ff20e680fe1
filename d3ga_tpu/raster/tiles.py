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
    rects, valid, n_tiles_x, n_tiles_y, rank_of_gaussian, K,
    tile_chunk=512, tile_ids=None,
):
    """For every tile (or the given tile_ids subset), ranks of the
    frontmost K overlapping Gaussians.

    Returns (ranks [T, K] int32 with BIG_RANK padding, counts [T] int32).
    """
    xmin, xmax, ymin, ymax = rects
    n_tiles = n_tiles_x * n_tiles_y if tile_ids is None else tile_ids.shape[0]
    tile_chunk = min(tile_chunk, max(1, n_tiles))
    n_pad = -(-n_tiles // tile_chunk) * tile_chunk

    if tile_ids is None:
        tids = jnp.arange(n_pad, dtype=jnp.int32)
    else:
        tids = jnp.pad(tile_ids.astype(jnp.int32), (0, n_pad - n_tiles))
    txs = tids % n_tiles_x
    tys = tids // n_tiles_x

    score_src = jnp.where(valid, rank_of_gaussian, BIG_RANK)

    def chunk_fn(args):
        tx, ty = args  # [tile_chunk]
        overlap = (
            (tx[:, None] >= xmin[None, :])
            & (tx[:, None] < xmax[None, :])
            & (ty[:, None] >= ymin[None, :])
            & (ty[:, None] < ymax[None, :])
        )
        score = jnp.where(overlap, score_src[None, :], BIG_RANK)
        k_eff = min(K, score.shape[-1])
        neg_top, _ = jax.lax.top_k(-score, k_eff)  # ascending rank order
        top = -neg_top
        if k_eff < K:
            top = jnp.pad(top, ((0, 0), (0, K - k_eff)), constant_values=BIG_RANK)
        counts = jnp.sum((overlap & valid[None, :]).astype(jnp.int32), axis=-1)
        return top, counts

    txs = txs.reshape(-1, tile_chunk)
    tys = tys.reshape(-1, tile_chunk)
    ranks, counts = jax.lax.map(chunk_fn, (txs, tys))
    return ranks.reshape(n_pad, K)[:n_tiles], counts.reshape(n_pad)[:n_tiles]


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
    rank_of = jnp.argsort(order, stable=True)     # gaussian id -> rank

    rects = tile_rect(proj.xy, proj.radius, TILE, n_tiles_x, n_tiles_y)
    ranks, counts = _select_per_tile(
        rects, valid, n_tiles_x, n_tiles_y, rank_of, max_per_tile
    )
    sel_valid = ranks < BIG_RANK
    # Clamp padding ranks to 0 for safe gathers (masked out by sel_valid).
    safe_ranks = jnp.where(sel_valid, ranks, 0)

    # Depth-sorted record arrays, then per-tile gathers.
    xy_s = proj.xy[order]
    conic_s = proj.conic[order]
    color_s = proj.color[order]
    opac_s = proj.opacity[order]

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
        overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)),
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
    )
    if return_alpha:
        return image, img[..., C], aux
    return image, aux
