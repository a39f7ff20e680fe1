"""Fused select+compact+blend Pallas TPU kernel, v2: butterfly
compaction (pure VPU lane rolls) instead of one-hot matmuls.

Same contract as pallas_fused.fused_select_blend (per 8x8-tile block:
per-tile first-K selection in depth-rank order, alpha blend with the
CUDA skip/termination rules, `/root/reference/renderer.py:130-141`)
but a different compaction algorithm:

  1. mask + positions for all 64 tiles of the block are built in 8
     sublane-groups (tile-x on sublanes) with a log-shift cumsum over
     lanes — no matmuls, no [T, kb] HBM materialization;
  2. per tile, the first-K overlapping candidates are compacted with a
     BUTTERFLY SHIFT NETWORK: each selected record must move left by
     s = lane - position; processing the bits of s LSB->MSB with masked
     `pltpu.roll`s routes every record to its compacted slot in
     log2(kb) stages. Shift distances are strictly monotone over
     selected lanes, which guarantees no two records ever collide at
     any stage (classic stream-compaction argument: for selected
     j < j', s' - s <= j' - j - 1, so partial target lanes stay
     strictly ordered).
     This replaces the v1 cursor-sequenced banded one-hot matmuls —
     compaction costs ~12 VPU roll stages instead of NC chained
     [128,128] HIGHEST-precision MXU matmuls;
  3. the blend runs in TRANSPOSED record layout ([channel, K] rows, so
     compaction output feeds it with no transposes anywhere).

The backward recomputes the forward compaction (adding an extra
"original shift" row), runs the blend VJP in transposed layout, then
routes record cotangents back to candidate lanes with the INVERSE
butterfly (right rolls, same no-collision argument mirrored).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE
BLOCK = 8
TB = BLOCK * BLOCK
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

HIGHEST = jax.lax.Precision.HIGHEST

# rows of the butterfly workspace: 16 record channels + bookkeeping
R_SREM = 16   # remaining shift distance (f32 exact integer)
R_SORG = 17   # original shift distance (backward only; fwd carries it too)
R_VAL = 18    # validity flag
ROWS = 19


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


def _bit(s, sh):
    """Bit `log2(sh)` of the exact-integer f32 array s, as f32 0/1."""
    d = jnp.floor(s * (1.0 / sh))
    return d - 2.0 * jnp.floor(d * 0.5)


def _butterfly_fwd(x, lanef, KB):
    """Route selected records (R_VAL row == 1) left by R_SREM lanes.
    x: [ROWS, KB]. Returns x with records at their compacted slots."""
    sh = 1
    while sh < KB:
        srem = x[R_SREM : R_SREM + 1]
        valid = x[R_VAL : R_VAL + 1]
        mv = _bit(srem, sh) * valid                     # moves this stage
        xl = pltpu.roll(x, KB - sh, 1)                  # lane l <- l + sh
        arrives = _bit(xl[R_SREM : R_SREM + 1], sh) * xl[R_VAL : R_VAL + 1]
        arrives = arrives * (lanef < KB - sh)           # kill wraparound
        post = jnp.where(arrives > 0.0, xl, x)
        s_new = post[R_SREM : R_SREM + 1] - sh * arrives
        v_new = jnp.where(arrives > 0.0, post[R_VAL : R_VAL + 1], valid * (1.0 - mv))
        x = jnp.concatenate([post[:R_SREM], s_new, post[R_SORG : R_SORG + 1], v_new], 0)
        sh *= 2
    return x


def _butterfly_inv(y, lanef, KB):
    """Inverse routing: move records right by R_SREM lanes (which must
    hold the ORIGINAL forward shift at the compacted slots).

    Bits are processed MSB->LSB: the inverse network is the forward
    network reversed in time, and time-reversal of a collision-free
    routing is collision-free. (LSB-first right rolls CAN collide:
    selected lanes {1,3} -> positions {0,1} would both occupy lane 1 at
    the first stage.)"""
    shifts = []
    sh = 1
    while sh < KB:
        shifts.append(sh)
        sh *= 2
    for sh in reversed(shifts):
        srem = y[R_SREM : R_SREM + 1]
        valid = y[R_VAL : R_VAL + 1]
        mv = _bit(srem, sh) * valid
        yr = pltpu.roll(y, sh, 1)                       # lane l <- l - sh
        arrives = _bit(yr[R_SREM : R_SREM + 1], sh) * yr[R_VAL : R_VAL + 1]
        arrives = arrives * (lanef >= sh)               # kill wraparound
        post = jnp.where(arrives > 0.0, yr, y)
        s_new = post[R_SREM : R_SREM + 1] - sh * arrives
        v_new = jnp.where(arrives > 0.0, post[R_VAL : R_VAL + 1], valid * (1.0 - mv))
        y = jnp.concatenate([post[:R_SREM], s_new, post[R_SORG : R_SORG + 1], v_new], 0)
    return y


def _group_masks(rects, KB, K, pos_s, mf_s, cnt_sm):
    """Masks + rank positions for all TB tiles, 8 tiles (one tile row)
    per pass with tile-x on sublanes. Fills pos_s/mf_s [TB, KB] and the
    per-tile SMEM counts."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, KB), 1)
    txs = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, KB), 0)
    xmin = rects & 0xFF
    xmax = (rects >> 8) & 0xFF
    ymin = (rects >> 16) & 0xFF
    ymax = (rects >> 24) & 0xFF
    for g in range(BLOCK):
        m = (
            (txs >= xmin) & (txs < xmax) & (g >= ymin) & (g < ymax)
        )
        mf = m.astype(jnp.float32)
        c = mf
        sh = 1
        while sh < KB:
            c = c + jnp.where(lane >= sh, pltpu.roll(c, sh, 1), 0.0)
            sh *= 2
        pos_s[g * BLOCK : (g + 1) * BLOCK] = c - 1.0
        mf_s[g * BLOCK : (g + 1) * BLOCK] = mf
        tot = jax.lax.slice(c, (0, KB - 1), (BLOCK, KB))  # [8, 1]
        for r in range(BLOCK):
            cnt_sm[g * BLOCK + r] = jnp.sum(
                jax.lax.slice(tot, (r, 0), (r + 1, 1))
            ).astype(jnp.int32)


def _compact_tile(t, valsT, pos_s, mf_s, lanef, K, KB):
    """Butterfly-compact tile t's first-K records into [ROWS, K]."""
    pos = pos_s[pl.ds(t, 1), :]                 # [1, KB]
    mf = mf_s[pl.ds(t, 1), :]
    keep = mf * (pos < K)
    s = (lanef - pos) * keep
    x = jnp.concatenate([valsT * keep, s, s, keep], axis=0)  # [ROWS, KB]
    x = _butterfly_fwd(x, lanef, KB)
    recK = jax.lax.slice(x, (0, 0), (ROWS, K))  # [ROWS, K]
    vmask = recK[R_VAL : R_VAL + 1]
    return recK, vmask


def _coeffsT_from_rec(recK, sx, sy):
    """Tile-local quadratic falloff coeff rows [8, K] from the
    transposed record block (rows: x_blk, y_blk, A, B, Cc, ...)."""
    x = recK[0:1] - sx
    y = recK[1:2] - sy
    A = recK[2:3]
    B = recK[3:4]
    Cc = recK[4:5]
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
        axis=0,
    )


def _coeffsT_transpose(recK, dcoeffsT, sx, sy):
    """Transpose of _coeffsT_from_rec: d(coeff rows) [8, K] back to
    d(x_blk, y_blk, A, B, Cc) rows [5, K]."""
    x = recK[0:1] - sx
    y = recK[1:2] - sy
    A = recK[2:3]
    B = recK[3:4]
    Cc = recK[4:5]
    d0, d1, d2 = dcoeffsT[0:1], dcoeffsT[1:2], dcoeffsT[2:3]
    d3, d4, d5 = dcoeffsT[3:4], dcoeffsT[4:5], dcoeffsT[5:6]
    dx = -d0 * (A * x + B * y) + d1 * A + d2 * B
    dy = -d0 * (Cc * y + B * x) + d1 * B + d2 * Cc
    dA = -0.5 * d0 * x * x + d1 * x - 0.5 * d3
    dB = -d0 * x * y + d1 * y + d2 * x - d5
    dCc = -0.5 * d0 * y * y + d2 * y - 0.5 * d4
    return jnp.concatenate([dx, dy, dA, dB, dCc], axis=0)


def _blend_fwd_T(recK, vmask, sx, sy, basis, triK, C):
    """Transposed-layout blend: recK [ROWS, K] -> out [256, C+1]."""
    coeffsT = _coeffsT_from_rec(recK, sx, sy)
    power = jax.lax.dot_general(
        basis, coeffsT, (((1,), (0,)), ((), ())),
        precision=HIGHEST, preferred_element_type=jnp.float32,
    )  # [256, K]
    opac = recK[5:6] * vmask
    alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
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
    colorT = recK[6 : 6 + C]
    rgb = jax.lax.dot_general(
        w, colorT, (((1,), (1,)), ((), ())),
        precision=HIGHEST, preferred_element_type=jnp.float32,
    )  # [256, C]
    return jnp.concatenate([rgb, t_bg], axis=-1)


def _forward_kernel(
    K, C, KB, vals_ref, rects_ref, basis_ref, triK_ref,
    out_ref, cnt_ref, pos_s, mf_s, cnt_sm, out_s,
):
    basis = basis_ref[...]
    triK = triK_ref[...]
    valsT = vals_ref[0]          # [16, KB]
    rects = rects_ref[0]         # [1, KB]
    lanef = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1).astype(jnp.float32)

    _group_masks(rects, KB, K, pos_s, mf_s, cnt_sm)

    def tile_body(t, _):
        tx = t % BLOCK
        ty = t // BLOCK
        recK, vmask = _compact_tile(t, valsT, pos_s, mf_s, lanef, K, KB)
        sx = (tx * TILE).astype(jnp.float32)
        sy = (ty * TILE).astype(jnp.float32)
        out_s[t] = _blend_fwd_T(recK, vmask, sx, sy, basis, triK, C)
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)
    out_ref[0] = out_s[...]
    cnt_ref[0, 0] = jnp.stack([cnt_sm[i] for i in range(TB)])


def _backward_kernel(
    K, C, KB, vals_ref, rects_ref, g_ref, basis_ref, triK_ref,
    dvals_ref, pos_s, mf_s, cnt_sm, dacc_s, g_s,
):
    basis = basis_ref[...]
    triK = triK_ref[...]
    valsT = vals_ref[0]
    rects = rects_ref[0]
    g_s[...] = g_ref[0]          # [TB, P, C+1]
    dacc_s[...] = jnp.zeros_like(dacc_s)
    lanef = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1).astype(jnp.float32)

    _group_masks(rects, KB, K, pos_s, mf_s, cnt_sm)

    def tile_body(t, _):
        tx = t % BLOCK
        ty = t // BLOCK
        recK, vmask = _compact_tile(t, valsT, pos_s, mf_s, lanef, K, KB)
        sx = (tx * TILE).astype(jnp.float32)
        sy = (ty * TILE).astype(jnp.float32)

        # --- recompute blend fwd (transposed layout) ---
        coeffsT = _coeffsT_from_rec(recK, sx, sy)
        power = jax.lax.dot_general(
            basis, coeffsT, (((1,), (0,)), ((), ())),
            precision=HIGHEST, preferred_element_type=jnp.float32,
        )
        opac = recK[5:6] * vmask
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
        colorT = recK[6 : 6 + C]

        # --- blend cotangents ---
        g = g_s[t]                               # [256, C+1]
        g_rgb = jax.lax.slice(g, (0, 0), (P, C))
        g_tbg = jax.lax.slice(g, (0, C), (P, C + 1))
        dw = jax.lax.dot_general(
            g_rgb, colorT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [256, K]
        dcolorT = jax.lax.dot_general(
            g_rgb, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, K]
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
        dcoeffsT = jax.lax.dot_general(
            basis, dpower, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, K]

        dxyabc = _coeffsT_transpose(recK, dcoeffsT, sx, sy)   # [5, K]
        drecT = jnp.concatenate(
            [dxyabc, dopac, dcolorT, jnp.zeros((16 - 6 - C, K), jnp.float32)],
            axis=0,
        ) * vmask                                              # [16, K]

        # --- inverse butterfly: cotangents back to candidate lanes ---
        pad = jnp.zeros((16, KB - K), jnp.float32)
        s_org = recK[R_SORG : R_SORG + 1]
        spad = jnp.zeros((1, KB - K), jnp.float32)
        y = jnp.concatenate(
            [
                jnp.concatenate([drecT, pad], axis=1),
                jnp.concatenate([s_org, spad], axis=1),       # s_rem := s_org
                jnp.concatenate([s_org, spad], axis=1),
                jnp.concatenate([vmask, spad], axis=1),
            ],
            axis=0,
        )
        y = _butterfly_inv(y, lanef, KB)
        dacc_s[...] = dacc_s[...] + jax.lax.slice(y, (0, 0), (16, KB)) * y[R_VAL : R_VAL + 1]
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)
    dvals_ref[0] = dacc_s[...]


def _tables(K):
    return _pixel_basis(), _tri_incl(K)


def _table_specs(K):
    return [
        pl.BlockSpec((P, 8), lambda i: (0, 0)),
        pl.BlockSpec((K, K), lambda i: (0, 0)),
    ]


def _run_forward(vals, rects, K, C, interpret=False):
    NB, _, KB = vals.shape
    out, cnt = pl.pallas_call(
        partial(_forward_kernel, K, C, KB),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 16, KB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, KB), lambda i: (i, 0, 0)),
        ] + _table_specs(K),
        out_specs=[
            pl.BlockSpec((1, TB, P, C + 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, TB, P, C + 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1, TB), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, KB), jnp.float32),
            pltpu.VMEM((TB, KB), jnp.float32),
            pltpu.SMEM((TB,), jnp.int32),
            pltpu.VMEM((TB, P, C + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vals, rects, *_tables(K))
    return out, cnt[:, 0, :]


def _run_backward(vals, rects, g, K, C, interpret=False):
    NB, _, KB = vals.shape
    dvals = pl.pallas_call(
        partial(_backward_kernel, K, C, KB),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 16, KB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, KB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, TB, P, C + 1), lambda i: (i, 0, 0, 0)),
        ] + _table_specs(K),
        out_specs=pl.BlockSpec((1, 16, KB), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, 16, KB), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, KB), jnp.float32),
            pltpu.VMEM((TB, KB), jnp.float32),
            pltpu.SMEM((TB,), jnp.int32),
            pltpu.VMEM((16, KB), jnp.float32),
            pltpu.VMEM((TB, P, C + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vals, rects, g, *_tables(K))
    return dvals


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_select_blend2(vals, rects, K, C, interpret=False):
    """vals [NB, 16, KB] f32: per-block candidate records in depth-rank
    order, CHANNELS-MAJOR rows (x_blk, y_blk, conicA, conicB, conicC,
    opacity, C colors, zero pad to 16); xy in block-local pixels.
    Invalid candidates MUST have rects == 0 and opacity 0.
    rects [NB, 1, KB] int32 packed tile rects in BLOCK-LOCAL tile
    coords. Returns (tiles [NB, 64, 256, C+1] with T_bg last, counts
    [NB, 64] int32)."""
    return _run_forward(vals, rects, K, C, interpret)


def _fwd(vals, rects, K, C, interpret):
    out = _run_forward(vals, rects, K, C, interpret)
    return out, (vals, rects)


def _bwd(K, C, interpret, res, g):
    vals, rects = res
    dvals = _run_backward(vals, rects, g[0], K, C, interpret)
    return dvals, None


fused_select_blend2.defvjp(_fwd, _bwd)
