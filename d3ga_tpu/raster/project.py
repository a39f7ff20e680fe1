"""Gaussian preprocessing: 3D -> screen-space projection (EWA splatting).

Dense, fully-vectorized over N Gaussians (VPU/MXU friendly). Semantics
replicate the 3DGS CUDA `preprocess` kernel that the reference drives via
`diff_gaussian_rasterization` (`/root/reference/renderer.py:79-141`,
behavior documented in SURVEY.md §3.5):

  * frustum cull at view z <= 0.2
  * clip-space projection with 1/(w + 1e-7)
  * EWA: cov2D = A Vrk A^T with A = J_proj @ R_w2v, fov-clamped
  * +0.3 screen-space dilation on the diagonal; with antialiasing=True
    the opacity is scaled by sqrt(det_orig/det_dilated) (dr_aa variant)
  * conic = inverse 2D covariance, radius = ceil(3 sqrt(lambda_max))
  * SH -> RGB with clamp-at-zero

All outputs are padded/masked, never dynamically shaped.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, unstrip_symmetric
from d3ga_tpu.ops.sh import eval_sh
from d3ga_tpu.raster.camera import Camera, ndc2pix

NEAR_CULL_Z = 0.2
DILATION = 0.3


class Projected(NamedTuple):
    """Per-Gaussian screen-space records; all [N, ...]."""

    xy: jnp.ndarray          # [N, 2] pixel-space center
    depth: jnp.ndarray       # [N] view-space z
    conic: jnp.ndarray       # [N, 3] inverse 2D covariance (a, b, c)
    color: jnp.ndarray       # [N, C] RGB (or arbitrary channels)
    opacity: jnp.ndarray     # [N] opacity after any AA rescale
    radius: jnp.ndarray      # [N] int32 pixel radius (0 = culled)
    valid: jnp.ndarray       # [N] bool


def project_gaussians(
    means3d: jnp.ndarray,
    camera: Camera,
    cov3d: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    opacities: jnp.ndarray = None,
    colors: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
) -> Projected:
    """means3d: [N,3]; cov3d: [N,6] packed or None (then scales [N,3] +
    rotations [N,4]); opacities: [N] or [N,1]; colors: [N,C] precomputed
    or shs: [N,K,3]."""
    n = means3d.shape[0]
    dtype = means3d.dtype

    p_hom = jnp.concatenate([means3d, jnp.ones((n, 1), dtype)], axis=-1)
    p_view = p_hom @ camera.world_view.T  # [N,4]
    p_clip = p_hom @ camera.full_proj.T   # [N,4]

    in_front = p_view[:, 2] > NEAR_CULL_Z
    # Culled Gaussians must not produce inf/NaN even in dead branches:
    # jnp.where passes NaN cotangents through the unselected side, so
    # every division below uses a safe substitute for culled entries.
    w_safe = jnp.where(in_front, p_clip[:, 3], 1.0)
    p_w = 1.0 / (w_safe + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]

    if cov3d is None:
        Vrk = covariance_from_scaling_rotation(scales * scale_modifier, rotations)
    else:
        Vrk = unstrip_symmetric(cov3d)

    # EWA Jacobian with fov clamping (exactly the CUDA computeCov2D).
    focal_x = camera.width / (2.0 * camera.tanfovx)
    focal_y = camera.height / (2.0 * camera.tanfovy)
    tz = jnp.where(in_front, p_view[:, 2], 1.0)
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # A = J(2x3) @ R_w2v; J rows: [fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]
    Rwv = camera.world_view[:3, :3]
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)
    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([j00, zero, j02], axis=-1),
            jnp.stack([zero, j11, j12], axis=-1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    A = J @ Rwv  # [N, 2, 3]
    cov2d = A @ Vrk @ jnp.swapaxes(A, -1, -2)  # [N, 2, 2]

    c00 = cov2d[:, 0, 0]
    c01 = cov2d[:, 0, 1]
    c11 = cov2d[:, 1, 1]
    det_orig = c00 * c11 - c01 * c01
    c00d = c00 + DILATION
    c11d = c11 + DILATION
    det = c00d * c11d - c01 * c01

    opac = opacities.reshape(n)
    if antialiasing:
        # dr_aa convolution scaling: energy-preserving opacity rescale.
        # The clamp constant is the CUDA kernel's 0.000025
        # (h_convolution_scaling in the dr_aa preprocess; audited in
        # docs/ORACLE_AUDIT.md).
        det_dil_safe = jnp.where(det > 0, det, 1.0)
        h_conv = jnp.sqrt(jnp.maximum(0.000025, det_orig / det_dil_safe))
        opac = opac * h_conv

    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = jnp.where(det_ok, 1.0 / det_safe, 0.0)
    conic = jnp.stack([c11d * inv_det, -c01 * inv_det, c00d * inv_det], axis=-1)

    mid = 0.5 * (c00d + c11d)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))

    xy = jnp.stack(
        [ndc2pix(p_proj[:, 0], camera.width), ndc2pix(p_proj[:, 1], camera.height)],
        axis=-1,
    )

    if colors is None:
        dirs = means3d - camera.camera_center[None]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        # shs: [N, K, 3]; eval + clamp at 0 (3DGS semantics).
        colors = jnp.maximum(eval_sh(shs, dirs, sh_degree), 0.0)

    valid = in_front & det_ok & (radius_f > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        xy=xy,
        depth=p_view[:, 2],
        conic=conic,
        color=colors,
        opacity=opac,
        radius=radius,
        valid=valid,
    )


def tile_rect(xy, radius, tile_size: int, n_tiles_x: int, n_tiles_y: int):
    """Per-Gaussian touched tile rectangle [xmin, xmax), [ymin, ymax)
    (CUDA getRect semantics: min/max over tile grid). xy: [N, 2],
    radius: [N] int."""
    r = radius.astype(xy.dtype)
    xmin = jnp.clip(((xy[:, 0] - r) / tile_size).astype(jnp.int32), 0, n_tiles_x)
    ymin = jnp.clip(((xy[:, 1] - r) / tile_size).astype(jnp.int32), 0, n_tiles_y)
    xmax = jnp.clip(
        ((xy[:, 0] + r + tile_size - 1) / tile_size).astype(jnp.int32),
        0,
        n_tiles_x,
    )
    ymax = jnp.clip(
        ((xy[:, 1] + r + tile_size - 1) / tile_size).astype(jnp.int32),
        0,
        n_tiles_y,
    )
    return xmin, xmax, ymin, ymax
