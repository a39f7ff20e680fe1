"""Record-direct fused Pallas blend: ONE gathered record buffer in,
blended tiles out.

Why: on the axon rig wall-time tracks total materialized HBM bytes
(PERF_NOTES.md). The original pallas_blend consumed (coeffs, colors,
opac) prepared by XLA from the gathered records — materializing ~240 MB
per training step in coeff/slice/layout-copy buffers. This kernel takes
the raw per-tile record gather [T, K, CR] directly (CR = 6 + C rows:
x, y, conicA, conicB, conicC, opacity, colors...) and derives the
quadratic falloff coefficients, the opacity row and the colors
IN-KERNEL. Invalid (padded) entries are handled with a ZERO SENTINEL
record row appended by the caller — opacity 0 makes them inert, so no
validity mask is passed at all.

Math matches `tiles._blend_tiles` exactly (CUDA alpha >= 1/255 skip and
T < 1e-4 stop, `/root/reference/renderer.py:130-141`); matmuls use bf16
hi/lo split passes (see pallas_blend.py) since Mosaic DEFAULT is a
single bf16 pass.

Opacity never needs a [1, K] lane-major row: log(opacity) is folded
into the quadratic falloff's CONSTANT coefficient, so alpha =
exp(power + log(op)) comes out of a second basis matmul directly
(Mosaic lowers thin [K,1]x[K,K] transposes poorly).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3ga_tpu.raster.pallas_blend import (
    _dot_split_a,
    _dot_split_ab,
    _dot_split_b,
    _pixel_basis,
    _tri,
    _tri_dot_ll,
    _tri_dot_nk,
)

TILE = 16
P = TILE * TILE
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

# tiles per grid program: fewer programs amortize per-program pipeline
# overhead (~us each through the axon runtime); env-tunable for sweeps.
TILES_PER_BLOCK = int(os.environ.get("D3GA_TPB", "4"))

C_LL = (((1,), (1,)), ((), ()))   # contract last-last
C_NK = (((1,), (0,)), ((), ()))   # standard matmul
C_FF = (((0,), (0,)), ((), ()))   # contract first-first


def _tile_origin(off, i, b, ntx):
    t = off + i * TILES_PER_BLOCK + b
    tx = jax.lax.rem(t, ntx)
    ty = jax.lax.div(t, ntx)
    return (tx * TILE).astype(jnp.float32), (ty * TILE).astype(jnp.float32)


OP_EPS = 1e-12


def _coeffs_from_rec(rec, sx, sy):
    """rec [K, CR] -> (coeffs [K, 8], coeffs2 [K, 8]) in tile-local
    coords; coeffs2 additionally carries log(opacity) in the constant
    term, so basis @ coeffs2 = power + log(op) and exp of it is alpha
    pre-clamp. A zero sentinel record yields log(eps) -> alpha ~ 0."""
    x = rec[:, 0:1] - sx
    y = rec[:, 1:2] - sy
    A = rec[:, 2:3]
    B = rec[:, 3:4]
    Cc = rec[:, 4:5]
    logop = jnp.log(jnp.maximum(rec[:, 5:6], OP_EPS))
    z = jnp.zeros_like(x)
    c0 = -0.5 * (A * x * x + Cc * y * y) - B * x * y
    rest = [
        A * x + B * y,
        Cc * y + B * x,
        -0.5 * A,
        -0.5 * Cc,
        -B,
        z,
        z,
    ]
    coeffs = jnp.concatenate([c0] + rest, axis=1)
    coeffs2 = jnp.concatenate([c0 + logop] + rest, axis=1)
    return coeffs, coeffs2


def _coeffs_transpose(rec, dcoeffs, sx, sy):
    """Transpose of _coeffs_from_rec: dcoeffs [K, 8] -> d(x,y,A,B,C) [K, 5]."""
    x = rec[:, 0:1] - sx
    y = rec[:, 1:2] - sy
    A = rec[:, 2:3]
    B = rec[:, 3:4]
    Cc = rec[:, 4:5]
    d0, d1, d2 = dcoeffs[:, 0:1], dcoeffs[:, 1:2], dcoeffs[:, 2:3]
    d3, d4, d5 = dcoeffs[:, 3:4], dcoeffs[:, 4:5], dcoeffs[:, 5:6]
    dx = -d0 * (A * x + B * y) + d1 * A + d2 * B
    dy = -d0 * (Cc * y + B * x) + d1 * B + d2 * Cc
    dA = -0.5 * d0 * x * x + d1 * x - 0.5 * d3
    dB = -d0 * x * y + d1 * y + d2 * x - d5
    dCc = -0.5 * d0 * y * y + d2 * y - 0.5 * d4
    return jnp.concatenate([dx, dy, dA, dB, dCc], axis=1)


def _blend_fwd(rec, basis, tri, sx, sy, C):
    """Blend one tile's first-K' records (K' = rec rows) -> [P, C+1]."""
    coeffs, coeffs2 = _coeffs_from_rec(rec, sx, sy)
    power = _dot_split_b(basis, coeffs, C_LL)         # [P, K']
    alpha = jnp.minimum(ALPHA_MAX, jnp.exp(_dot_split_b(basis, coeffs2, C_LL)))
    use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(use, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    cum = _tri_dot_nk(lg, tri)                        # [P, K']
    # ONE exp for both transmittances: t_after = t_before * (1 - alpha)
    # (exact to ~1 ulp since lg = log1p(-alpha); saves 131k VPU
    # transcendentals per tile)
    t_before = jnp.exp(cum - lg)
    t_after = t_before * (1.0 - alpha)
    accept = t_after >= T_EPS
    w = jnp.where(accept, alpha * t_before, 0.0)
    t_bg = jnp.exp(
        jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True)
    )
    rgb = _dot_split_ab(w, rec[:, 6 : 6 + C], C_NK)   # [P, C]
    return jnp.concatenate([rgb, t_bg], axis=-1)


def _khalf(K):
    """Count-adaptive half width: multiple of 128 covering K//2."""
    kh = ((K // 2) + 127) // 128 * 128
    return kh if 0 < kh < K else None


def _forward_body(ntx, C, rec_ref, cnt_ref, off_ref, basis_ref, tri_ref, out_ref):
    basis = basis_ref[0]
    tri = tri_ref[...]
    off = off_ref[0, 0]
    i = pl.program_id(0)
    K = tri.shape[0]
    KH = _khalf(K)
    for b in range(TILES_PER_BLOCK):
        cnt = cnt_ref[i, b]
        sx, sy = _tile_origin(off, i, b, ntx)

        # Empty tiles (typically ~40% of a human capture frame) skip the
        # whole blend: background transmittance 1, colors 0.
        @pl.when(cnt == 0)
        def _():
            out_ref[b] = jnp.concatenate(
                [jnp.zeros((P, C), jnp.float32), jnp.ones((P, 1), jnp.float32)],
                axis=1,
            )

        if KH is not None:
            # Count-adaptive width: records past cnt are zero sentinels,
            # so blending only the first KH slots is EXACT when cnt<=KH.
            @pl.when((cnt > 0) & (cnt <= KH))
            def _():
                out_ref[b] = _blend_fwd(
                    rec_ref[b][:KH], basis, tri[:KH, :KH], sx, sy, C
                )

            @pl.when(cnt > KH)
            def _():
                out_ref[b] = _blend_fwd(rec_ref[b], basis, tri, sx, sy, C)
        else:
            @pl.when(cnt != 0)
            def _():
                out_ref[b] = _blend_fwd(rec_ref[b], basis, tri, sx, sy, C)


def _blend_bwd(rec, g, basis, tri, sx, sy, C):
    """Recompute-forward VJP for one tile's first-K' records -> drec [K', CR]."""
    colors = rec[:, 6 : 6 + C]
    # --- recompute forward ---
    coeffs, coeffs2 = _coeffs_from_rec(rec, sx, sy)
    power = _dot_split_b(basis, coeffs, C_LL)
    raw = jnp.exp(_dot_split_b(basis, coeffs2, C_LL))
    alpha = jnp.minimum(ALPHA_MAX, raw)
    use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(use, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    cum = _tri_dot_nk(lg, tri)
    t_before = jnp.exp(cum - lg)      # one exp (see _blend_fwd)
    t_after = t_before * (1.0 - alpha)
    accept = t_after >= T_EPS
    w = jnp.where(accept, alpha * t_before, 0.0)
    sum_lg = jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True)
    t_bg = jnp.exp(sum_lg)

    # --- cotangents ---
    g_rgb = g[:, :C]
    g_tbg = g[:, C : C + 1]
    dw = _dot_split_ab(g_rgb, colors, C_LL)       # [P, K']
    dcolors = _dot_split_ab(w, g_rgb, C_FF)       # [K', C]
    ds = dw * w
    dalpha = jnp.where(accept, dw * t_before, 0.0)
    dsum = g_tbg * t_bg
    dlg = _tri_dot_ll(ds, tri)                    # ds @ U^T
    dlg = dlg - ds + jnp.where(accept, dsum, 0.0)
    dalpha = dalpha + dlg * (-1.0 / (1.0 - alpha))
    live = use & (raw < ALPHA_MAX)
    dalpha = jnp.where(live, dalpha, 0.0)
    dpower2 = dalpha * raw                        # d/d(power+logop)
    dcoeffs2 = _dot_split_a(dpower2, basis, C_FF)  # [K', 8]
    dxyabc = _coeffs_transpose(rec, dcoeffs2, sx, sy)  # [K', 5]
    op = rec[:, 5:6]
    dopac = jnp.where(
        op > 0.0, dcoeffs2[:, 0:1] / jnp.maximum(op, OP_EPS), 0.0
    )
    pad = rec.shape[1] - 6 - C
    parts = [dxyabc, dopac, dcolors]
    if pad:
        parts.append(jnp.zeros((dcolors.shape[0], pad), jnp.float32))
    return jnp.concatenate(parts, axis=1)         # [K', CR]


def _backward_body(ntx, C, rec_ref, cnt_ref, off_ref, basis_ref, tri_ref, g_ref, drec_ref):
    basis = basis_ref[0]
    tri = tri_ref[...]
    off = off_ref[0, 0]
    i = pl.program_id(0)
    K = tri.shape[0]
    KH = _khalf(K)
    for b in range(TILES_PER_BLOCK):
        cnt = cnt_ref[i, b]
        sx, sy = _tile_origin(off, i, b, ntx)

        @pl.when(cnt == 0)
        def _():
            drec_ref[b] = jnp.zeros_like(drec_ref[b])

        if KH is not None:
            @pl.when((cnt > 0) & (cnt <= KH))
            def _():
                d = _blend_bwd(
                    rec_ref[b][:KH], g_ref[b], basis, tri[:KH, :KH], sx, sy, C
                )
                drec_ref[b] = jnp.concatenate(
                    [d, jnp.zeros((K - KH, d.shape[1]), jnp.float32)], axis=0
                )

            @pl.when(cnt > KH)
            def _():
                drec_ref[b] = _blend_bwd(
                    rec_ref[b], g_ref[b], basis, tri, sx, sy, C
                )
        else:
            @pl.when(cnt != 0)
            def _():
                drec_ref[b] = _blend_bwd(
                    rec_ref[b], g_ref[b], basis, tri, sx, sy, C
                )


def _tables(K):
    return (_pixel_basis()[None], _tri(K))


def _table_specs(K):
    return [
        pl.BlockSpec((1, P, 8), lambda i: (0, 0, 0)),
        pl.BlockSpec((K, K), lambda i: (0, 0)),
    ]


def _pad_tiles(x, tb):
    pad = (-x.shape[0]) % tb
    if pad == 0:
        return x, 0
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), pad


def _run_forward(rec, counts, offset, ntx, C, interpret=False):
    TB = TILES_PER_BLOCK
    rec, pad = _pad_tiles(rec, TB)
    counts, _ = _pad_tiles(counts, TB)   # padded tiles count 0 -> skipped
    T, K, CR = rec.shape
    counts2 = counts.reshape(T // TB, TB)
    off2 = jnp.asarray(offset, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        partial(_forward_body, ntx, C),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, CR), lambda i: (i, 0, 0)),
            pl.BlockSpec((T // TB, TB), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + _table_specs(K),
        out_specs=pl.BlockSpec((TB, P, C + 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, P, C + 1), jnp.float32),
        interpret=interpret,
    )(rec, counts2, off2, *_tables(K))
    return out[: T - pad] if pad else out


def _run_backward(rec, counts, offset, g, ntx, C, interpret=False):
    TB = TILES_PER_BLOCK
    T0 = rec.shape[0]
    rec, _ = _pad_tiles(rec, TB)
    counts, _ = _pad_tiles(counts, TB)
    g, _ = _pad_tiles(g, TB)
    T, K, CR = rec.shape
    counts2 = counts.reshape(T // TB, TB)
    off2 = jnp.asarray(offset, jnp.int32).reshape(1, 1)
    drec = pl.pallas_call(
        partial(_backward_body, ntx, C),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, CR), lambda i: (i, 0, 0)),
            pl.BlockSpec((T // TB, TB), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + _table_specs(K)
        + [pl.BlockSpec((TB, P, C + 1), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((TB, K, CR), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, K, CR), jnp.float32),
        interpret=interpret,
    )(rec, counts2, off2, *_tables(K), g)
    return drec[:T0]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_tiles_rec(rec, counts, tile_offset, ntx, C, interpret=False):
    """rec: [T, K, CR] per-tile gathered records in depth-rank order
    (CR = 6 + C: x, y, conicA, conicB, conicC, opacity, colors...; xy in
    GLOBAL pixel coords — tile origins are derived from the tile index
    t = row-major over an `ntx`-wide tile grid). Padded entries must be
    all-zero rows (gather a zero sentinel record). Returns [T, 256, C+1]
    tiles with T_bg in the last channel (caller composites bg)."""
    return _run_forward(rec, counts, tile_offset, ntx, C, interpret)


def _fwd(rec, counts, tile_offset, ntx, C, interpret):
    out = _run_forward(rec, counts, tile_offset, ntx, C, interpret)
    return out, (rec, counts, tile_offset)


def _bwd(ntx, C, interpret, res, g):
    rec, counts, tile_offset = res
    return (
        _run_backward(rec, counts, tile_offset, g, ntx, C, interpret),
        None,
        None,
    )


blend_tiles_rec.defvjp(_fwd, _bwd)


# --- image-layout variant ----------------------------------------------
# Writes tiles straight into a [nty*16, ntx*16, C+1] image buffer (2D
# grid over tile rows x G-tile groups), eliminating the XLA untile
# transpose chain (and its backward) entirely. Used by the full-grid
# single-device path; the sharded path keeps the flat-tiles variant.


IMG_G_CAP = int(os.environ.get("D3GA_IMG_G", "8"))


def _img_group(ntx):
    """Tiles per program along x: the largest divisor of ntx <= the cap
    (default 8; env D3GA_IMG_G sweeps it — larger groups mean fewer grid
    programs, amortizing the ~7-8.5 us per-program overhead)."""
    for g in range(min(IMG_G_CAP, ntx), 0, -1):
        if ntx % g == 0:
            return g
    return 1


def _forward_body_img(ntx, G, C, rec_ref, cnt_ref, basis_ref, tri_ref, out_ref):
    basis = basis_ref[0]
    tri = tri_ref[...]
    i = pl.program_id(0)
    j = pl.program_id(1)
    K = tri.shape[0]
    KH = _khalf(K)
    for b in range(G):
        cnt = cnt_ref[i, j * G + b]
        sx = ((j * G + b) * TILE).astype(jnp.float32)
        sy = (i * TILE).astype(jnp.float32)
        cols = slice(b * TILE, (b + 1) * TILE)

        @pl.when(cnt == 0)
        def _():
            out_ref[:, cols, :] = jnp.concatenate(
                [
                    jnp.zeros((TILE, TILE, C), jnp.float32),
                    jnp.ones((TILE, TILE, 1), jnp.float32),
                ],
                axis=2,
            )

        if KH is not None:
            @pl.when((cnt > 0) & (cnt <= KH))
            def _():
                o = _blend_fwd(rec_ref[0, b][:KH], basis, tri[:KH, :KH], sx, sy, C)
                out_ref[:, cols, :] = o.reshape(TILE, TILE, C + 1)

            @pl.when(cnt > KH)
            def _():
                o = _blend_fwd(rec_ref[0, b], basis, tri, sx, sy, C)
                out_ref[:, cols, :] = o.reshape(TILE, TILE, C + 1)
        else:
            @pl.when(cnt != 0)
            def _():
                o = _blend_fwd(rec_ref[0, b], basis, tri, sx, sy, C)
                out_ref[:, cols, :] = o.reshape(TILE, TILE, C + 1)


def _backward_body_img(ntx, G, C, rec_ref, cnt_ref, basis_ref, tri_ref, g_ref, drec_ref):
    basis = basis_ref[0]
    tri = tri_ref[...]
    i = pl.program_id(0)
    j = pl.program_id(1)
    K = tri.shape[0]
    KH = _khalf(K)
    for b in range(G):
        cnt = cnt_ref[i, j * G + b]
        sx = ((j * G + b) * TILE).astype(jnp.float32)
        sy = (i * TILE).astype(jnp.float32)
        cols = slice(b * TILE, (b + 1) * TILE)

        @pl.when(cnt == 0)
        def _():
            drec_ref[0, b] = jnp.zeros_like(drec_ref[0, b])

        if KH is not None:
            @pl.when((cnt > 0) & (cnt <= KH))
            def _():
                g = g_ref[:, cols, :].reshape(P, C + 1)
                d = _blend_bwd(rec_ref[0, b][:KH], g, basis, tri[:KH, :KH], sx, sy, C)
                drec_ref[0, b] = jnp.concatenate(
                    [d, jnp.zeros((K - KH, d.shape[1]), jnp.float32)], axis=0
                )

            @pl.when(cnt > KH)
            def _():
                g = g_ref[:, cols, :].reshape(P, C + 1)
                drec_ref[0, b] = _blend_bwd(rec_ref[0, b], g, basis, tri, sx, sy, C)
        else:
            @pl.when(cnt != 0)
            def _():
                g = g_ref[:, cols, :].reshape(P, C + 1)
                drec_ref[0, b] = _blend_bwd(rec_ref[0, b], g, basis, tri, sx, sy, C)


def _run_forward_img(rec, counts, ntx, nty, C, interpret=False):
    T, K, CR = rec.shape
    assert T == ntx * nty
    G = _img_group(ntx)
    rec4 = rec.reshape(nty, ntx, K, CR)
    cnt2 = counts.reshape(nty, ntx)
    img = pl.pallas_call(
        partial(_forward_body_img, ntx, G, C),
        grid=(nty, ntx // G),
        in_specs=[
            pl.BlockSpec((1, G, K, CR), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((nty, ntx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((1, P, 8), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, G * TILE, C + 1), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nty * TILE, ntx * TILE, C + 1), jnp.float32),
        interpret=interpret,
    )(rec4, cnt2, *_tables(K))
    return img


def _run_backward_img(rec, counts, g, ntx, nty, C, interpret=False):
    T, K, CR = rec.shape
    G = _img_group(ntx)
    rec4 = rec.reshape(nty, ntx, K, CR)
    cnt2 = counts.reshape(nty, ntx)
    drec = pl.pallas_call(
        partial(_backward_body_img, ntx, G, C),
        grid=(nty, ntx // G),
        in_specs=[
            pl.BlockSpec((1, G, K, CR), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((nty, ntx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((1, P, 8), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i, j: (0, 0)),
        ]
        + [pl.BlockSpec((TILE, G * TILE, C + 1), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, G, K, CR), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nty, ntx, K, CR), jnp.float32),
        interpret=interpret,
    )(rec4, cnt2, *_tables(K), g)
    return drec.reshape(T, K, CR)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def blend_image_rec(rec, counts, ntx, nty, C, interpret=False):
    """Image-layout record blend: same record contract as
    `blend_tiles_rec` over the FULL row-major tile grid, but the output
    is the assembled padded image [nty*16, ntx*16, C+1] (T_bg last) —
    no XLA untile transpose needed. Caller composites bg and crops."""
    return _run_forward_img(rec, counts, ntx, nty, C, interpret)


def _fwd_img(rec, counts, ntx, nty, C, interpret):
    out = _run_forward_img(rec, counts, ntx, nty, C, interpret)
    return out, (rec, counts)


def _bwd_img(ntx, nty, C, interpret, res, g):
    rec, counts = res
    return (_run_backward_img(rec, counts, g, ntx, nty, C, interpret), None)


blend_image_rec.defvjp(_fwd_img, _bwd_img)
