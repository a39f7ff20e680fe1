"""Fused per-block select + compact + blend Pallas TPU kernel.

Replaces three stages of the XLA pipeline (fine per-tile top_k selection
~5 ms, [T, K, 9] record gathers ~4 ms, and the blend) with ONE kernel,
and eliminates their backward scatter-adds (the backward recomputes the
selection and emits per-block cotangents; XLA transposes only the
per-BLOCK gather, 3x fewer rows).

Pipeline position (see tiles.rasterize_tiled_fused):

  XLA:    project -> depth argsort -> coarse 8x8-tile-block top_k
          (block candidate lists, rank-ascending) -> gather per-block
          records -> block-local falloff coeffs
  Pallas: per block: for each of the 64 tiles
            1. rect-overlap mask over the kb candidates,
            2. first-K compaction WITHOUT sorting: hierarchical cumsum
               positions + per-chunk BANDED one-hot matmul. Positions
               are monotone, so chunk c's selected records land in the
               128-wide output window starting at the running cursor —
               the one-hot is [128, 128], not [kb, K] (32x fewer
               compares than a dense one-hot, and no sort at all),
            3. shift the compacted quadratic coeffs from block-local to
               tile-local coordinates (exact linear transform),
            4. alpha-blend exactly as pallas_blend (cumsum-as-matmul
               log-transmittance; CUDA alpha>=1/255 skip, T<1e-4 stop).

Semantics match `_select_per_tile` + `_blend_tiles`
(`/root/reference/renderer.py:130-141` tile pipeline): per-tile K cap
with overflow counters, front-to-back compositing in global depth-rank
order.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE  # 256 pixels per tile
BLOCK = 8        # tiles per block side
TB = BLOCK * BLOCK
CHUNK = 128
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

HIGHEST = jax.lax.Precision.HIGHEST


def _pixel_basis():
    dy, dx = np.meshgrid(np.arange(TILE), np.arange(TILE), indexing="ij")
    dx = dx.reshape(-1).astype(np.float32)
    dy = dy.reshape(-1).astype(np.float32)
    basis = np.stack(
        [np.ones_like(dx), dx, dy, dx * dx, dy * dy, dx * dy], axis=-1
    )
    return jnp.asarray(np.pad(basis, ((0, 0), (0, 2))))  # [256, 8]


def _tri_incl(k):
    return jnp.asarray(np.triu(np.ones((k, k), np.float32)))


def _tri_lower_incl(k):
    # lower-triangular inclusive: (mask @ L)[j] = sum_{i<=j} mask[i]
    return jnp.asarray(np.tril(np.ones((k, k), np.float32)).T)


def _coeffs_from_rec(rec, sx, sy):
    """Tile-local quadratic falloff coeffs from compacted records
    rec [K, >=5] = (x_blk, y_blk, A, B, Cc, ...); (sx, sy) is the tile
    origin within the block. Same math as pallas_blend.falloff_coeffs —
    computed per tile from raw xy/conic so there is no precision-losing
    polynomial re-centering."""
    x = rec[:, 0:1] - sx
    y = rec[:, 1:2] - sy
    A = rec[:, 2:3]
    B = rec[:, 3:4]
    Cc = rec[:, 4:5]
    z = jnp.zeros_like(x)
    return jnp.concatenate(
        [
            -0.5 * (A * x * x + Cc * y * y) - B * x * y,
            A * x + B * y,
            Cc * y + B * x,
            -0.5 * A,
            -0.5 * Cc,
            -B,
            z,
            z,
        ],
        axis=-1,
    )


def _coeffs_transpose(rec, dcoeffs, sx, sy):
    """Transpose of _coeffs_from_rec: route d(coeffs) [K, 8] back to
    d(x_blk, y_blk, A, B, Cc) [K, 5] (analytic VJP)."""
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
    return jnp.concatenate([dx, dy, dA, dB, dCc], axis=-1)


def _tile_mask_positions(rects, tx, ty, K, tri_c, tri_r):
    """rects [NC, CHUNK] int32 packed; (tx, ty) tile coords.
    Returns (sel [NC, CHUNK] f32, pos0 [NC, CHUNK] f32 exclusive
    positions, row_off [NC, 1] f32, counts f32 scalar)."""
    xmin = rects & 0xFF
    xmax = (rects >> 8) & 0xFF
    ymin = (rects >> 16) & 0xFF
    ymax = (rects >> 24) & 0xFF
    m = (
        (tx >= xmin) & (tx < xmax) & (ty >= ymin) & (ty < ymax)
    )
    mf = m.astype(jnp.float32)
    # within-row inclusive cumsum along lanes (matmul with lower tri)
    incl = jax.lax.dot_general(
        mf, tri_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NC, CHUNK]
    row_tot = incl[:, CHUNK - 1 :]  # [NC, 1]
    # exclusive row offsets over the NC rows (strictly-lower tri matmul)
    row_off = jax.lax.dot_general(
        tri_r, row_tot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NC, 1]
    pos_incl = incl + row_off           # inclusive global position
    pos0 = pos_incl - 1.0               # 0-based position
    sel = mf * (pos0 < K)
    counts = jnp.sum(mf)                # scalar via reduction (no indexing)
    return sel, pos0, mf, counts


def _compact(vals_s, rects, tx, ty, K, NC, tri_c, tri_r, iota_win,
             rec_ref, sel_s, pos_s, mask_s):
    """Compact the first K overlapping records of this tile into the
    VMEM scratch `rec_ref` [K + CHUNK, 16] (zeroed here).

    Every dynamic (chunk-cursor) access goes through a ref with the
    dynamic index on the LEADING dimension only — mixed static+dynamic
    ref indexing desugars to a value-level dynamic_slice that Mosaic
    does not lower.
    vals_s: [NC, 16, CHUNK] VMEM scratch (block records, chunked);
    sel_s / pos_s: [NC, CHUNK] VMEM scratch; off_ref: [NC] SMEM.
    Returns counts (f32 scalar)."""
    sel, pos0, mask_all, counts = _tile_mask_positions(rects, tx, ty, K, tri_c, tri_r)
    sel_s[...] = sel
    pos_s[...] = pos0
    mask_s[...] = mask_all
    rec_ref[...] = jnp.zeros((K + CHUNK, 16), jnp.float32)

    def body(c, cursor):
        # cursor = number of overlapping candidates in earlier chunks
        # (carried as an exact-integer f32 scalar — SMEM holds scalars
        # only and value int-indexing is not lowerable, so the carry IS
        # the storage)
        p_row = pos_s[pl.ds(c, 1), :]   # [1, CHUNK]
        s_row = sel_s[pl.ds(c, 1), :]
        m_row = mask_s[pl.ds(c, 1), :]
        # banded one-hot: output window rows [cursor, cursor + CHUNK)
        oh = (p_row - cursor == iota_win) * s_row  # [CHUNK, CHUNK]
        vals_c = vals_s[c]              # [16, CHUNK]
        add = jax.lax.dot_general(
            oh, vals_c, (((1,), (1,)), ((), ())),
            precision=HIGHEST, preferred_element_type=jnp.float32,
        )  # [CHUNK, 16]
        cur_i = jnp.minimum(cursor.astype(jnp.int32), K)
        rec_ref[pl.ds(cur_i, CHUNK), :] = rec_ref[pl.ds(cur_i, CHUNK), :] + add
        return cursor + jnp.sum(m_row)

    # static unroll: per-chunk work is tiny ([128,128] ops); a fori's
    # per-iteration sequencing dominates it, unrolling lets Mosaic
    # software-pipeline the chunk chain
    cursor = jnp.float32(0.0)
    for c in range(NC):
        cursor = body(c, cursor)
    return counts


def _blend_forward(coeffs_t, opac_t, color_t, basis, triK, C):
    """coeffs_t [K, 8] tile-local; opac_t [1, K]; color_t [K, C].
    Returns out [256, C+1] (last channel = T_bg)."""
    power = jax.lax.dot_general(
        basis, coeffs_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [256, K]
    alpha = jnp.minimum(ALPHA_MAX, opac_t * jnp.exp(power))
    use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(use, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    cum = jax.lax.dot_general(
        lg, triK, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    t_before = jnp.exp(cum - lg)  # one exp: t_after = t_before*(1-alpha)
    t_after = t_before * (1.0 - alpha)
    accept = t_after >= T_EPS
    w = jnp.where(accept, alpha * t_before, 0.0)
    t_bg = jnp.exp(jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True))
    rgb = jax.lax.dot_general(
        w, color_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.concatenate([rgb, t_bg], axis=-1)


def _forward_kernel(
    K, C, NC, vals_ref, rects_ref, basis_ref, triK_ref, tric_ref, trir_ref,
    out_ref, cnt_ref, rec_s, sel_s, pos_s, mask_s, cnt_sm, vals_s, out_s,
):
    basis = basis_ref[...]
    triK = triK_ref[...]
    tri_c = tric_ref[...]
    tri_r = trir_ref[...]
    iota_win = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, CHUNK), 0
    ).astype(jnp.float32)  # Mosaic: iota must be integer, cast after

    vals_s[...] = vals_ref[0]   # [NC, 16, CHUNK] into leading-dyn scratch
    rects = rects_ref[0]        # [NC, CHUNK]

    def tile_body(t, _):
        tx = t % BLOCK
        ty = t // BLOCK
        counts = _compact(
            vals_s, rects, tx, ty, K, NC, tri_c, tri_r, iota_win,
            rec_s, sel_s, pos_s, mask_s,
        )
        rec = rec_s[:K, :]
        sx = (tx * TILE).astype(jnp.float32)
        sy = (ty * TILE).astype(jnp.float32)
        coeffs_t = _coeffs_from_rec(rec, sx, sy)
        opac_t = jnp.transpose(rec[:, 5:6])  # [1, K]
        color_t = rec[:, 6 : 6 + C]
        out = _blend_forward(coeffs_t, opac_t, color_t, basis, triK, C)
        out_s[t] = out              # leading-dim dynamic store
        # scalar stores at a traced index only lower via SMEM; the
        # vector write below publishes all 64 counts at once
        cnt_sm[t] = counts.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)
    out_ref[0] = out_s[...]
    cnt_ref[0, 0] = jnp.stack([cnt_sm[i] for i in range(TB)])


def _backward_kernel(
    K, C, NC, vals_ref, rects_ref, g_ref, basis_ref, triK_ref, tric_ref,
    trir_ref, dvals_ref, rec_s, sel_s, pos_s, mask_s, vals_s, dacc_s, g_s,
):
    basis = basis_ref[...]
    triK = triK_ref[...]
    tri_c = tric_ref[...]
    tri_r = trir_ref[...]
    iota_win = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, CHUNK), 0
    ).astype(jnp.float32)  # Mosaic: iota must be integer, cast after

    vals_s[...] = vals_ref[0]   # [NC, 16, CHUNK]
    rects = rects_ref[0]        # [NC, CHUNK]
    g_s[...] = g_ref[0]         # [TB, P, C+1] leading-dyn scratch
    dacc_s[...] = jnp.zeros_like(dacc_s)

    def tile_body(t, _):
        tx = t % BLOCK
        ty = t // BLOCK
        _compact(
            vals_s, rects, tx, ty, K, NC, tri_c, tri_r, iota_win,
            rec_s, sel_s, pos_s, mask_s,
        )
        rec = rec_s[:K, :]
        sx = (tx * TILE).astype(jnp.float32)
        sy = (ty * TILE).astype(jnp.float32)
        coeffs_t = _coeffs_from_rec(rec, sx, sy)
        opac = jnp.transpose(rec[:, 5:6])  # [1, K]
        color = rec[:, 6 : 6 + C]

        # --- recompute blend fwd ---
        power = jax.lax.dot_general(
            basis, coeffs_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        raw = opac * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, raw)
        use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
        alpha = jnp.where(use, alpha, 0.0)
        lg = jnp.log1p(-alpha)
        cum = jax.lax.dot_general(
            lg, triK, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        t_before = jnp.exp(cum - lg)  # one exp (see forward)
        t_after = t_before * (1.0 - alpha)
        accept = t_after >= T_EPS
        w = jnp.where(accept, alpha * t_before, 0.0)
        sum_lg = jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True)
        t_bg = jnp.exp(sum_lg)

        # --- blend cotangents (mirrors pallas_blend._backward_body) ---
        g = g_s[t]                       # [256, C+1]
        g_rgb = g[:, :C]
        g_tbg = g[:, C : C + 1]
        dw = jax.lax.dot_general(
            g_rgb, color, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dcolor = jax.lax.dot_general(
            w, g_rgb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, C]
        ds = dw * w
        dalpha = jnp.where(accept, dw * t_before, 0.0)
        dsum = g_tbg * t_bg
        dlg = jax.lax.dot_general(
            ds, triK, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dlg = dlg - ds + jnp.where(accept, dsum, 0.0)
        dalpha = dalpha + dlg * (-1.0 / (1.0 - alpha))
        live = use & (raw < ALPHA_MAX)
        dalpha = jnp.where(live, dalpha, 0.0)
        dpower = dalpha * raw
        dopac = jnp.sum(
            jnp.where(live, dalpha, 0.0) * jnp.exp(power), axis=0, keepdims=True
        )  # [1, K]
        dcoeffs_t = jax.lax.dot_general(
            dpower, basis, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, 8]

        # analytic transpose of the coeff computation
        dxyabc = _coeffs_transpose(rec, dcoeffs_t, sx, sy)  # [K, 5]
        drec = jnp.concatenate(
            [
                dxyabc,
                jnp.transpose(dopac),
                dcolor,
                jnp.zeros((K, 16 - 6 - C), jnp.float32),
            ],
            axis=-1,
        )  # [K, 16]
        # stash in the windowed scratch so chunk reads can be dynamic
        rec_s[...] = jnp.zeros((K + CHUNK, 16), jnp.float32)
        rec_s[:K, :] = drec

        # --- transpose of compaction: route drec back to candidates ---
        # (sel/pos0/mask rows are still in the scratches from _compact)
        def chunk_body(c, cursor):
            p_row = pos_s[pl.ds(c, 1), :]
            s_row = sel_s[pl.ds(c, 1), :]
            m_row = mask_s[pl.ds(c, 1), :]
            oh = (p_row - cursor == iota_win) * s_row  # [CHUNK, CHUNK]
            cur_i = jnp.minimum(cursor.astype(jnp.int32), K)
            dwin = rec_s[pl.ds(cur_i, CHUNK), :]
            # d vals_c [16, CHUNK] = dwin^T @ oh  (transpose of oh @ vals^T)
            dvc = jax.lax.dot_general(
                dwin, oh, (((0,), (0,)), ((), ())),
                precision=HIGHEST, preferred_element_type=jnp.float32,
            )  # [16, CHUNK]
            dacc_s[c] = dacc_s[c] + dvc
            return cursor + jnp.sum(m_row)

        cursor = jnp.float32(0.0)
        for c in range(NC):  # static unroll (see _compact)
            cursor = chunk_body(c, cursor)
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)
    dvals_ref[0] = dacc_s[...]


def _tables(K, NC):
    return (
        _pixel_basis(),
        _tri_incl(K),
        _tri_lower_incl(CHUNK),
        jnp.asarray(np.tril(np.ones((NC, NC), np.float32), k=-1)),
    )


def _table_specs(K, NC):
    return [
        pl.BlockSpec((P, 8), lambda i: (0, 0)),
        pl.BlockSpec((K, K), lambda i: (0, 0)),
        pl.BlockSpec((CHUNK, CHUNK), lambda i: (0, 0)),
        pl.BlockSpec((NC, NC), lambda i: (0, 0)),
    ]


def _run_forward(vals, rects, K, C, interpret=False):
    NB, NC, _, _ = vals.shape
    out, cnt = pl.pallas_call(
        partial(_forward_kernel, K, C, NC),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NC, 16, CHUNK), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, NC, CHUNK), lambda i: (i, 0, 0)),
        ] + _table_specs(K, NC),
        out_specs=[
            pl.BlockSpec((1, TB, P, C + 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, TB, P, C + 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1, TB), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K + CHUNK, 16), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.SMEM((TB,), jnp.int32),
            pltpu.VMEM((NC, 16, CHUNK), jnp.float32),
            pltpu.VMEM((TB, P, C + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vals, rects, *_tables(K, NC))
    return out, cnt[:, 0, :]


def _run_backward(vals, rects, g, K, C, interpret=False):
    NB, NC, _, _ = vals.shape
    dvals = pl.pallas_call(
        partial(_backward_kernel, K, C, NC),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NC, 16, CHUNK), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, NC, CHUNK), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, TB, P, C + 1), lambda i: (i, 0, 0, 0)),
        ] + _table_specs(K, NC),
        out_specs=pl.BlockSpec((1, NC, 16, CHUNK), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, NC, 16, CHUNK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K + CHUNK, 16), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.VMEM((NC, CHUNK), jnp.float32),
            pltpu.VMEM((NC, 16, CHUNK), jnp.float32),
            pltpu.VMEM((NC, 16, CHUNK), jnp.float32),
            pltpu.VMEM((TB, P, C + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vals, rects, g, *_tables(K, NC))
    return dvals


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_select_blend(vals, rects, K, C, interpret=False):
    """vals [NB, NC, 16, CHUNK] f32 (kb = NC*CHUNK candidates):
    chunked channels-first per-block candidate records
    (x_blk, y_blk, conicA, conicB, conicC, opacity, C colors, pad to
    16); xy are in block-local pixels; invalid candidates MUST have
    rects == 0 and opacity 0.
    rects [NB, NC, CHUNK] int32 packed tile rects in BLOCK-LOCAL tile
    coords (0..BLOCK). Returns (tiles [NB, 64, 256, C+1] with T_bg in
    the last channel, counts [NB, 64] int32)."""
    return _run_forward(vals, rects, K, C, interpret)


def _fwd(vals, rects, K, C, interpret):
    out = _run_forward(vals, rects, K, C, interpret)
    return out, (vals, rects)


def _bwd(K, C, interpret, res, g):
    vals, rects = res
    dvals = _run_backward(vals, rects, g[0], K, C, interpret)
    return dvals, None


fused_select_blend.defvjp(_fwd, _bwd)
