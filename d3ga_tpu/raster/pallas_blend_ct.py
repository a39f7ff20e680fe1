"""Channels-transposed record-direct Pallas blend.

Same contract as `pallas_blend_rec.blend_image_rec` but every operand is
laid out WIDE (long minor dimension) so the axon runtime's per-row tax
on Pallas operand I/O (tools/widerow_probe.py: a [T, K, 16] passthrough
costs 2.4x a [T, 32, 128] passthrough of the same bytes) nearly
vanishes:

  rec_ct : [T, CR, K]   records transposed — CR (=6+C) rows of K lanes
                        per tile (T*CR rows vs T*K for the [T, K, CR]
                        layout: 16x fewer at CR=16, K=256)
  out    : [(C+1), nty*16, ntx*16] planar image — (C+1)*H rows vs H*W
                        for the [H, W, C+1] layout

All kernel math runs natively in the transposed orientation (the MXU
contractions are just re-associated — no in-kernel transposes):

  coeffs  [8, K] built from rec rows;  power = basis @ coeffs
  rgb_cp  [C, P] = colors_ck . w      (contract over K)
  drec    [CR, K] assembled by row concatenation

Blend semantics are bit-identical to `pallas_blend_rec` (same split
matmuls, one-exp transmittance, CUDA alpha >= 1/255 skip and T < 1e-4
stop per `/root/reference/renderer.py:130-141`, zero-sentinel padding,
empty-tile skip, count-adaptive half width).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
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
from d3ga_tpu.raster.pallas_blend_rec import (
    ALPHA_MAX,
    ALPHA_SKIP,
    OP_EPS,
    P,
    T_EPS,
    TILE,
    _khalf,
)

C_LL = (((1,), (1,)), ((), ()))   # contract last-last
C_NK = (((1,), (0,)), ((), ()))   # standard matmul
C_FF = (((0,), (0,)), ((), ()))   # contract first-first

def _coeffs_ct(rec, sx, sy):
    """rec [CR, K] -> (coeffs [8, K], coeffs2 [8, K]); coeffs2 carries
    log(opacity) in the constant row (see pallas_blend_rec)."""
    x = rec[0:1] - sx
    y = rec[1:2] - sy
    A = rec[2:3]
    B = rec[3:4]
    Cc = rec[4:5]
    logop = jnp.log(jnp.maximum(rec[5:6], OP_EPS))
    z = jnp.zeros_like(x)
    c0 = -0.5 * (A * x * x + Cc * y * y) - B * x * y
    rest = [A * x + B * y, Cc * y + B * x, -0.5 * A, -0.5 * Cc, -B, z, z]
    coeffs = jnp.concatenate([c0] + rest, axis=0)
    coeffs2 = jnp.concatenate([c0 + logop] + rest, axis=0)
    return coeffs, coeffs2


def _coeffs_transpose_ct(rec, dcoeffs, sx, sy):
    """Transpose of _coeffs_ct: dcoeffs [8, K] -> d(x,y,A,B,C) [5, K]."""
    x = rec[0:1] - sx
    y = rec[1:2] - sy
    A = rec[2:3]
    B = rec[3:4]
    Cc = rec[4:5]
    d0, d1, d2 = dcoeffs[0:1], dcoeffs[1:2], dcoeffs[2:3]
    d3, d4, d5 = dcoeffs[3:4], dcoeffs[4:5], dcoeffs[5:6]
    dx = -d0 * (A * x + B * y) + d1 * A + d2 * B
    dy = -d0 * (Cc * y + B * x) + d1 * B + d2 * Cc
    dA = -0.5 * d0 * x * x + d1 * x - 0.5 * d3
    dB = -d0 * x * y + d1 * y + d2 * x - d5
    dCc = -0.5 * d0 * y * y + d2 * y - 0.5 * d4
    return jnp.concatenate([dx, dy, dA, dB, dCc], axis=0)


def _blend_fwd_ct(rec, basis, tri, sx, sy, C):
    """rec [CR, K'] -> [C+1, P] (T_bg in the last row).

    Everything that needs pixels-on-lanes comes out of an MXU
    contraction (never a reshape/transpose — Mosaic cannot relayout
    [P,1] -> [1,P] in-kernel): t_bg's K-sum is a matmul with a ones row.
    """
    coeffs, coeffs2 = _coeffs_ct(rec, sx, sy)
    power = _dot_split_b(basis, coeffs, C_NK)           # [P, K']
    alpha = jnp.minimum(ALPHA_MAX, jnp.exp(_dot_split_b(basis, coeffs2, C_NK)))
    use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(use, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    cum = _tri_dot_nk(lg, tri)                          # [P, K']
    t_before = jnp.exp(cum - lg)                        # one exp (see rec kernel)
    t_after = t_before * (1.0 - alpha)
    accept = t_after >= T_EPS
    w = jnp.where(accept, alpha * t_before, 0.0)
    lgm = jnp.where(accept, lg, 0.0)
    ones_k = jnp.ones((1, lgm.shape[1]), jnp.float32)   # bf16-exact
    t_bg = jnp.exp(_dot_split_b(ones_k, lgm, C_LL))     # [1, P]
    rgb = _dot_split_ab(rec[6 : 6 + C], w, C_LL)        # [C, P]
    return jnp.concatenate([rgb, t_bg], axis=0)


def _blend_bwd_ct(rec, g, basis, tri, sx, sy, C):
    """Recompute-forward VJP: rec [CR, K'], g [C+1, P] -> drec [CR, K']."""
    colors = rec[6 : 6 + C]                             # [C, K']
    coeffs, coeffs2 = _coeffs_ct(rec, sx, sy)
    power = _dot_split_b(basis, coeffs, C_NK)
    raw = jnp.exp(_dot_split_b(basis, coeffs2, C_NK))
    alpha = jnp.minimum(ALPHA_MAX, raw)
    use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(use, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    cum = _tri_dot_nk(lg, tri)
    t_before = jnp.exp(cum - lg)
    t_after = t_before * (1.0 - alpha)
    accept = t_after >= T_EPS
    w = jnp.where(accept, alpha * t_before, 0.0)
    lgm = jnp.where(accept, lg, 0.0)
    ones_k = jnp.ones((1, lgm.shape[1]), jnp.float32)
    t_bg = jnp.exp(_dot_split_b(ones_k, lgm, C_LL))     # [1, P]

    g_rgb = g[:C]                                       # [C, P]
    g_tbg = g[C : C + 1]                                # [1, P]
    dw = _dot_split_ab(g_rgb, colors, C_FF)             # [P, K']
    dcolors = _dot_split_ab(g_rgb, w, C_NK)             # [C, K']
    ds = dw * w
    dalpha = jnp.where(accept, dw * t_before, 0.0)
    # broadcast (g_tbg*t_bg)[p] over K via an MXU outer product with a
    # ones row (no [1,P] -> [P,1] relayout exists in-kernel)
    dsum = _dot_split_a(g_tbg * t_bg, ones_k, C_FF)     # [P, K']
    dlg = _tri_dot_ll(ds, tri)                          # ds @ U^T
    dlg = dlg - ds + jnp.where(accept, dsum, 0.0)
    dalpha = dalpha + dlg * (-1.0 / (1.0 - alpha))
    live = use & (raw < ALPHA_MAX)
    dalpha = jnp.where(live, dalpha, 0.0)
    dpower2 = dalpha * raw
    dcoeffs2 = _dot_split_b(basis, dpower2, C_FF)       # [8, K']
    dxyabc = _coeffs_transpose_ct(rec, dcoeffs2, sx, sy)  # [5, K']
    op = rec[5:6]
    dopac = jnp.where(op > 0.0, dcoeffs2[0:1] / jnp.maximum(op, OP_EPS), 0.0)
    pad = rec.shape[0] - 6 - C
    parts = [dxyabc, dopac, dcolors]
    if pad:
        parts.append(jnp.zeros((pad, dcolors.shape[1]), jnp.float32))
    return jnp.concatenate(parts, axis=0)               # [CR, K']


# tiles-per-program iteration: a static Python unroll compiles the
# whole per-tile body G times (fine at G=8; G=16 blew a 30-minute
# compile budget), so G > UNROLL_G iterates with an in-kernel
# fori_loop instead — dynamic indexing is on the G axis (second-major
# of the [1, G, CR, K] block), which Mosaic supports; compile time
# becomes constant in G.
UNROLL_G = 8


def _iter_tiles(G, one_tile):
    if G <= UNROLL_G:
        for b in range(G):
            one_tile(b)
    else:
        def body(b, carry):
            one_tile(b)
            return carry

        jax.lax.fori_loop(0, G, body, jnp.int32(0))


def _forward_body_ct(G, C, FR, rec_ref, cnt_ref, basis_ref, tri_ref, out_ref):
    # Per-tile output row [C+1, P] written like the rec blocks — no
    # in-kernel reshapes/transposes of the lane dim (Mosaic cannot
    # relayout them); XLA assembles the image (transposes are cheap on
    # this rig, rows are not — this layout is 19k output rows).
    # FR (frame rows): tile-row period after which pixel-y restarts —
    # the batched path stacks frames vertically in tile space
    # (`tiles.rasterize_tiled_batch`), so records keep PER-FRAME global
    # pixel coords and sy wraps every FR tile rows (exact int math; no
    # f32 offset rounding).
    basis = basis_ref[0]
    tri = tri_ref[...]
    i = pl.program_id(0)
    j = pl.program_id(1)
    K = tri.shape[0]
    KH = _khalf(K)

    def one_tile(b):
        cnt = cnt_ref[i, j * G + b]
        sx = ((j * G + b) * TILE).astype(jnp.float32)
        sy = ((i % FR) * TILE).astype(jnp.float32)

        @pl.when(cnt == 0)
        def _():
            out_ref[0, b] = jnp.concatenate(
                [jnp.zeros((C, P), jnp.float32), jnp.ones((1, P), jnp.float32)],
                axis=0,
            )

        def run(KK, b=b, sx=sx, sy=sy):
            out_ref[0, b] = _blend_fwd_ct(
                rec_ref[0, b][:, :KK], basis, tri[:KK, :KK], sx, sy, C
            )

        if KH is not None:
            @pl.when((cnt > 0) & (cnt <= KH))
            def _(run=run):
                run(KH)

            @pl.when(cnt > KH)
            def _(run=run):
                run(K)
        else:
            @pl.when(cnt != 0)
            def _(run=run):
                run(K)

    _iter_tiles(G, one_tile)


def _backward_body_ct(
    G, C, FR, rows_out, rec_ref, cnt_ref, basis_ref, tri_ref, g_ref, drec_ref
):
    basis = basis_ref[0]
    tri = tri_ref[...]
    i = pl.program_id(0)
    j = pl.program_id(1)
    K = tri.shape[0]
    KH = _khalf(K)
    CR = rec_ref.shape[2]

    def one_tile(b):
        cnt = cnt_ref[i, j * G + b]
        sx = ((j * G + b) * TILE).astype(jnp.float32)
        sy = ((i % FR) * TILE).astype(jnp.float32)

        def store(d, b=b):
            if rows_out:
                # channel-major [1, CR, G*K] block: tile b's [CR, K]
                # lands at STATIC lane offset b*K, so each channel row
                # of the whole output is one contiguous [nty, ntx*K]
                # plane — the segsum combine's 12 per-channel sort
                # operands become free reshapes instead of [T, CR, K]
                # strided slices (1 KB runs). Requires static b
                # (G <= UNROLL_G): Mosaic rejects dynamic lane-offset
                # stores.
                drec_ref[0, :, b * K : (b + 1) * K] = d
            else:
                drec_ref[0, b] = d

        @pl.when(cnt == 0)
        def _():
            store(jnp.zeros((CR, K), jnp.float32))

        def run(KK, b=b, sx=sx, sy=sy):
            d = _blend_bwd_ct(
                rec_ref[0, b][:, :KK], g_ref[0, b], basis, tri[:KK, :KK],
                sx, sy, C,
            )
            if KK < K:
                d = jnp.concatenate(
                    [d, jnp.zeros((d.shape[0], K - KK), jnp.float32)], axis=1
                )
            store(d)

        if KH is not None:
            @pl.when((cnt > 0) & (cnt <= KH))
            def _(run=run):
                run(KH)

            @pl.when(cnt > KH)
            def _(run=run):
                run(K)
        else:
            @pl.when(cnt != 0)
            def _(run=run):
                run(K)

    _iter_tiles(G, one_tile)


def _tables(K):
    return (_pixel_basis()[None], _tri(K))


# G*TILE is the out block's LANE dim and must be 128-divisible
# (Mosaic block rule) -> G in {8, 16, 24, ...} tiles per program, tile
# grid padded in x to a G multiple. The kernels are per-PROGRAM-
# overhead-bound on this rig (fwd 2.0 ms ~= 384 programs x ~5-8 us at
# G=8, tools/trace_lanes.py), so larger G amortizes it; VMEM per
# program is only ~(G/8) x 0.5 MB.
G_CT = int(os.environ.get("D3GA_G_CT", "8"))


def _pad_x(ntx):
    return (-ntx) % G_CT


def _run_forward_ct(rec, counts, ntx, nty, C, interpret=False, frame_rows=0):
    T, CR, K = rec.shape
    assert T == ntx * nty
    G = G_CT
    FR = frame_rows or nty
    px = _pad_x(ntx)
    rec4 = rec.reshape(nty, ntx, CR, K)
    cnt2 = counts.reshape(nty, ntx)
    if px:
        # padded tiles: count 0 -> empty-tile branch writes bg
        rec4 = jnp.pad(rec4, ((0, 0), (0, px), (0, 0), (0, 0)))
        cnt2 = jnp.pad(cnt2, ((0, 0), (0, px)))
    nxp = ntx + px
    out = pl.pallas_call(
        partial(_forward_body_ct, G, C, FR),
        grid=(nty, nxp // G),
        in_specs=[
            pl.BlockSpec((1, G, CR, K), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((nty, nxp), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, 8), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, G, C + 1, P), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nty, nxp, C + 1, P), jnp.float32),
        interpret=interpret,
    )(rec4, cnt2, *_tables(K))  # [nty, nxp, C+1, P]
    if px:
        out = out[:, :ntx]
    # XLA untile: [nty, ntx, C+1, 16, 16] -> [C+1, nty*16, ntx*16]
    return (
        out.reshape(nty, ntx, C + 1, TILE, TILE)
        .transpose(2, 0, 3, 1, 4)
        .reshape(C + 1, nty * TILE, ntx * TILE)
    )


def _g_to_tiles(g, ntx, nty, nxp, C):
    """Cotangent image [(C+1), nty*16, ntx*16] -> [nty, nxp, C+1, P]."""
    gg = g.reshape(C + 1, nty, TILE, ntx, TILE).transpose(1, 3, 0, 2, 4)
    gg = gg.reshape(nty, ntx, C + 1, P)
    if nxp > ntx:
        gg = jnp.pad(gg, ((0, 0), (0, nxp - ntx), (0, 0), (0, 0)))
    return gg


def _run_backward_ct(
    rec, counts, g, ntx, nty, C, interpret=False, frame_rows=0,
    rows_out=False,
):
    """rows_out=False: returns drec [T, CR, K] (tile-major). rows_out=
    True (requires G_CT <= UNROLL_G, static in-kernel tile offsets):
    returns channel-major [nty, CR, ntx*K], whose per-channel planes
    reshape to the flat [T*K] sort operands of the segsum combine with
    no strided relayout."""
    T, CR, K = rec.shape
    G = G_CT
    FR = frame_rows or nty
    px = _pad_x(ntx)
    rec4 = rec.reshape(nty, ntx, CR, K)
    cnt2 = counts.reshape(nty, ntx)
    if px:
        rec4 = jnp.pad(rec4, ((0, 0), (0, px), (0, 0), (0, 0)))
        cnt2 = jnp.pad(cnt2, ((0, 0), (0, px)))
    nxp = ntx + px
    gg = _g_to_tiles(g, ntx, nty, nxp, C)
    if rows_out:
        assert G <= UNROLL_G, "rows_out needs static tile lane offsets"
        out_specs = pl.BlockSpec((1, CR, G * K), lambda i, j: (i, 0, j))
        out_shape = jax.ShapeDtypeStruct((nty, CR, nxp * K), jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, G, CR, K), lambda i, j: (i, j, 0, 0))
        out_shape = jax.ShapeDtypeStruct((nty, nxp, CR, K), jnp.float32)
    drec = pl.pallas_call(
        partial(_backward_body_ct, G, C, FR, rows_out),
        grid=(nty, nxp // G),
        in_specs=[
            pl.BlockSpec((1, G, CR, K), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((nty, nxp), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, 8), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i, j: (0, 0)),
            pl.BlockSpec((1, G, C + 1, P), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rec4, cnt2, *_tables(K), gg)
    if rows_out:
        if px:
            drec = drec[:, :, : ntx * K]
        return drec
    if px:
        drec = drec[:, :ntx]
    return drec.reshape(T, CR, K)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def blend_image_ct(rec, counts, ntx, nty, C, interpret=False, frame_rows=0):
    """Transposed-record image blend: rec [T, CR, K] (CR = 6 + C rows:
    x, y, conicA, conicB, conicC, opacity, colors...; xy in GLOBAL pixel
    coords; depth-rank order along K; zero-sentinel columns for padding).
    Returns the assembled padded PLANAR image [(C+1), nty*16, ntx*16]
    with T_bg in the last plane; caller composites bg and crops.
    frame_rows (batched path): pixel-y coordinate period in tile rows —
    0 means nty (single frame)."""
    return _run_forward_ct(rec, counts, ntx, nty, C, interpret, frame_rows)


def _fwd_ct(rec, counts, ntx, nty, C, interpret, frame_rows):
    return (
        _run_forward_ct(rec, counts, ntx, nty, C, interpret, frame_rows),
        (rec, counts),
    )


def _bwd_ct(ntx, nty, C, interpret, frame_rows, res, g):
    rec, counts = res
    return (
        _run_backward_ct(rec, counts, g, ntx, nty, C, interpret, frame_rows),
        None,
    )


blend_image_ct.defvjp(_fwd_ct, _bwd_ct)
