"""Fused Pallas TPU kernel for the per-tile alpha-compositing blend.

The XLA path (`tiles._blend_tiles`) materializes several [T, 256, K]
intermediates in HBM; this kernel keeps the whole per-tile pipeline in
VMEM and writes only the [256, C+1] tile output:

  power  = basis[256,6] @ coeffs^T[6,K]          (MXU)
  alpha  = min(0.99, opac * exp(power)) masked    (VPU)
  logT   = log1p(-alpha) @ U[K,K]                 (MXU; cumsum-as-matmul)
  w      = alpha * T_before * [T_after >= 1e-4]   (VPU)
  rgb    = w @ color[K,C] + T_bg * bg             (MXU)

The backward recomputes the forward per tile (the CUDA rasterizer's
re-walk strategy, but as matmuls) and produces cotangents for coeffs,
colors and opacities — no [T, 256, K] residuals ever touch HBM.

Inputs are the per-tile gathered records produced by the shared binning
stage; `coeffs` are the quadratic-falloff coefficients in tile-local
pixel coordinates (see tiles._blend_tiles).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


# --- split-precision matmuls -------------------------------------------
# Mosaic lowers f32 dot_general at DEFAULT precision to ONE bf16 pass
# (tools/mxu_probe.py) — too coarse for the log-transmittance cumsum.
# HIGHEST costs 6 passes. Instead: split the inexact operand into bf16
# hi + residual lo; when the other operand is bf16-exact (0/1 tables,
# small-int pixel basis) two DEFAULT passes give ~2^-17 relative error,
# and a 3-pass double split covers the general case.


def _split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot_split_a(a, b, dims):
    """a split hi/lo (b must be bf16-exact)."""
    d = partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    hi, lo = _split(a)
    return d(hi, b) + d(lo, b)


def _dot_split_b(a, b, dims):
    """b split hi/lo (a must be bf16-exact)."""
    d = partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    hi, lo = _split(b)
    return d(a, hi) + d(a, lo)


def _dot_split_ab(a, b, dims):
    """both operands split (3 passes, rel err ~2^-17)."""
    d = partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


# Block-triangular split of the dominant [P, K] x [K, K] transmittance
# matmuls: U is upper-triangular, so the (B, A) block is structurally
# zero -- skipping it removes 25% of the MXU MACs on full-width tiles.
# Applied when the half-width is a 128-lane multiple (K = 256, 512).
TRI_SPLIT = os.environ.get("D3GA_TRI_SPLIT", "1") == "1"
_NK = (((1,), (0,)), ((), ()))
_LL = (((1,), (1,)), ((), ()))


def _tri_dot_nk(x, tri):
    """x [P, K] @ U [K, K] (upper-triangular), zero block skipped."""
    K = tri.shape[0]
    h = K // 2
    if not TRI_SPLIT or h % 128:
        return _dot_split_a(x, tri, _NK)
    xA, xB = x[:, :h], x[:, h:]
    outA = _dot_split_a(xA, tri[:h, :h], _NK)
    outB = _dot_split_a(xA, tri[:h, h:], _NK) + _dot_split_a(
        xB, tri[h:, h:], _NK
    )
    return jnp.concatenate([outA, outB], axis=1)


def _tri_dot_ll(x, tri):
    """x [P, K] @ U^T (lower-triangular), zero block skipped."""
    K = tri.shape[0]
    h = K // 2
    if not TRI_SPLIT or h % 128:
        return _dot_split_a(x, tri, _LL)
    xA, xB = x[:, :h], x[:, h:]
    outA = _dot_split_a(xA, tri[:h, :h], _LL) + _dot_split_a(
        xB, tri[:h, h:], _LL
    )
    outB = _dot_split_a(xB, tri[h:, h:], _LL)
    return jnp.concatenate([outA, outB], axis=1)


def _pixel_basis(dtype=jnp.float32):
    dy, dx = np.meshgrid(np.arange(TILE), np.arange(TILE), indexing="ij")
    dx = dx.reshape(-1).astype(np.float32)
    dy = dy.reshape(-1).astype(np.float32)
    basis = np.stack(
        [np.ones_like(dx), dx, dy, dx * dx, dy * dy, dx * dy], axis=-1
    )  # [256, 6]
    # pad the 6 coeff channels to a 128-lane friendly 8
    return jnp.asarray(np.pad(basis, ((0, 0), (0, 2))), dtype)


def _tri(K, dtype=jnp.float32):
    return jnp.asarray(np.triu(np.ones((K, K), np.float32)), dtype)


# tiles processed per grid program: amortizes per-program pipeline
# overhead; VMEM stays ~TB x 4 x [256, K] fp32 buffers.
TILES_PER_BLOCK = 4


def _forward_body(coeff_ref, color_ref, opac_ref, basis_ref, tri_ref, out_ref):
    basis = basis_ref[0]
    tri = tri_ref[...]
    for b in range(TILES_PER_BLOCK):  # static unroll
        # basis entries are integers <= 225 (bf16-exact): split coeffs
        power = _dot_split_b(
            basis, coeff_ref[b], (((1,), (1,)), ((), ()))
        )  # [256, K]
        opac = opac_ref[b]  # [1, K]
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
        use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
        alpha = jnp.where(use, alpha, 0.0)
        lg = jnp.log1p(-alpha)
        cum = _dot_split_a(
            lg, tri, (((1,), (0,)), ((), ()))
        )  # [256, K] inclusive log-transmittance (tri is 0/1-exact)
        t_before = jnp.exp(cum - lg)  # one exp: t_after = t_before*(1-alpha)
        t_after = t_before * (1.0 - alpha)
        accept = t_after >= T_EPS
        w = jnp.where(accept, alpha * t_before, 0.0)
        t_bg = jnp.exp(
            jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True)
        )
        rgb = _dot_split_ab(
            w, color_ref[b], (((1,), (0,)), ((), ()))
        )  # [256, C]
        out_ref[b] = jnp.concatenate([rgb, t_bg], axis=-1)


def _backward_body(
    coeff_ref, color_ref, opac_ref, basis_ref, tri_ref, g_ref,
    dcoeff_ref, dcolor_ref, dopac_ref,
):
    basis = basis_ref[0]
    tri = tri_ref[...]
    for b in range(TILES_PER_BLOCK):  # static unroll
        # --- recompute forward ---
        coeffs = coeff_ref[b]
        color = color_ref[b]
        opac = opac_ref[b]
        power = _dot_split_b(basis, coeffs, (((1,), (1,)), ((), ())))
        raw = opac * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, raw)
        use = (power <= 0.0) & (alpha >= ALPHA_SKIP)
        alpha = jnp.where(use, alpha, 0.0)
        lg = jnp.log1p(-alpha)
        cum = _dot_split_a(lg, tri, (((1,), (0,)), ((), ())))
        t_before = jnp.exp(cum - lg)  # one exp (see forward)
        t_after = t_before * (1.0 - alpha)
        accept = t_after >= T_EPS
        w = jnp.where(accept, alpha * t_before, 0.0)
        sum_lg = jnp.sum(jnp.where(accept, lg, 0.0), axis=-1, keepdims=True)
        t_bg = jnp.exp(sum_lg)

        # --- cotangents ---
        g = g_ref[b]                     # [256, C+1]
        g_rgb = g[:, :-1]                # [256, C]
        g_tbg = g[:, -1:]                # [256, 1]

        # rgb = w @ color
        dw = _dot_split_ab(
            g_rgb, color, (((1,), (1,)), ((), ()))
        )  # [256, K]
        dcolor_ref[b] = _dot_split_ab(
            w, g_rgb, (((0,), (0,)), ((), ()))
        )  # [K, C]

        # w = accept * alpha * exp(s), s = cum - lg
        ds = dw * w                         # dL/ds
        dalpha = jnp.where(accept, dw * t_before, 0.0)
        # t_bg = exp(sum_k accept*lg)
        dsum = g_tbg * t_bg                 # [256, 1]
        # dL/dcum = ds ; dL/dlg direct = -ds + accept*dsum
        dcum = ds
        dlg = _dot_split_a(
            dcum, tri, (((1,), (1,)), ((), ()))
        )  # dcum @ U^T (tri 0/1-exact)
        dlg = dlg - ds + jnp.where(accept, dsum, 0.0)
        dalpha = dalpha + dlg * (-1.0 / (1.0 - alpha))

        live = use & (raw < ALPHA_MAX)
        dalpha = jnp.where(live, dalpha, 0.0)
        dpower = dalpha * raw               # d/dpower of opac*exp(power)
        dopac_ref[b] = jnp.sum(
            jnp.where(live, dalpha, 0.0) * jnp.exp(power), axis=0, keepdims=True
        )
        dcoeff_ref[b] = _dot_split_a(
            dpower, basis, (((0,), (0,)), ((), ()))
        )  # [K, 8] (basis int-exact)


def _pad_tiles(x, tb):
    pad = (-x.shape[0]) % tb
    if pad == 0:
        return x, 0
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), pad


def _run_forward(coeffs, colors, opacs, interpret=False):
    TB = TILES_PER_BLOCK
    coeffs, pad = _pad_tiles(coeffs, TB)
    colors, _ = _pad_tiles(colors, TB)
    opacs, _ = _pad_tiles(opacs, TB)
    T, K, _ = coeffs.shape
    C = colors.shape[-1]
    basis = _pixel_basis()
    tri = _tri(K)
    out = pl.pallas_call(
        _forward_body,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, K, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, 1, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, P, 8), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, P, C + 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, P, C + 1), jnp.float32),
        interpret=interpret,
    )(coeffs, colors, opacs, basis[None], tri)
    return out[: T - pad] if pad else out


def _run_backward(coeffs, colors, opacs, g, interpret=False):
    TB = TILES_PER_BLOCK
    T0 = coeffs.shape[0]
    coeffs, pad = _pad_tiles(coeffs, TB)
    colors, _ = _pad_tiles(colors, TB)
    opacs, _ = _pad_tiles(opacs, TB)
    g, _ = _pad_tiles(g, TB)
    T, K, _ = coeffs.shape
    C = colors.shape[-1]
    basis = _pixel_basis()
    tri = _tri(K)
    outs = pl.pallas_call(
        _backward_body,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, K, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, 1, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, P, 8), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, K), lambda i: (0, 0)),
            pl.BlockSpec((TB, P, C + 1), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, K, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, K, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, 1, K), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, K, C), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, K), jnp.float32),
        ],
        interpret=interpret,
    )(coeffs, colors, opacs, basis[None], tri, g)
    return tuple(o[:T0] for o in outs)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def blend_tiles_pallas(coeffs, colors, opacs, interpret=False):
    """coeffs: [T, K, 8] quadratic falloff coeffs (6 used + 2 pad);
    colors: [T, K, C]; opacs: [T, 1, K].
    Returns [T, 256, C+1] (last channel = T_bg; caller composites bg)."""
    return _run_forward(coeffs, colors, opacs, interpret)


def _fwd(coeffs, colors, opacs, interpret):
    out = _run_forward(coeffs, colors, opacs, interpret)
    return out, (coeffs, colors, opacs)


def _bwd(interpret, res, g):
    coeffs, colors, opacs = res
    dcoeffs, dcolors, dopacs = _run_backward(coeffs, colors, opacs, g, interpret)
    return dcoeffs, dcolors, dopacs


blend_tiles_pallas.defvjp(_fwd, _bwd)


def falloff_coeffs(xy_local, conic):
    """Per-record quadratic coefficients in tile-local pixel coords.

    xy_local: [..., 2] Gaussian center minus tile origin; conic: [..., 3].
    Returns [..., 8] (6 coeffs + 2 zero pad)."""
    A = conic[..., 0]
    B = conic[..., 1]
    C = conic[..., 2]
    x = xy_local[..., 0]
    y = xy_local[..., 1]
    z = jnp.zeros_like(A)
    return jnp.stack(
        [
            -0.5 * (A * x * x + C * y * y) - B * x * y,
            A * x + B * y,
            C * y + B * x,
            -0.5 * A,
            -0.5 * C,
            -B,
            z,
            z,
        ],
        axis=-1,
    )
