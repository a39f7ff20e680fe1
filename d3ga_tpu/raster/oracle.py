"""Reference ("oracle") Gaussian-splat rasterizer in pure jax.numpy.

Slow-but-exact ground truth for every kernel test: replicates the CUDA
`diff-gaussian-rasterization` forward semantics gaussian-for-gaussian
(per-pixel front-to-back alpha blending with the 1/255 alpha skip and
T < 1e-4 termination, including the per-tile rect gating that the
tile-binned CUDA renderer applies; SURVEY.md §3.5). Differentiable by
construction — the sequential blend loop is re-expressed as an exclusive
cumulative product over depth-sorted Gaussians, so jax.grad provides the
pixel->Gaussian backward without a custom VJP.
"""

import jax.numpy as jnp

from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.raster.project import Projected, project_gaussians, tile_rect

TILE = 16
ALPHA_SKIP = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


def blend_weights(alpha: jnp.ndarray):
    """alpha: [..., K] per-(pixel,gaussian) effective alphas in depth
    order -> (w [..., K], T_bg [...]) where w_k = T_before_k * alpha_k
    masked by the T >= 1e-4 termination rule and T_bg is the final
    transmittance hitting the background."""
    one_minus = 1.0 - alpha
    t_after = jnp.cumprod(one_minus, axis=-1)
    t_before = jnp.concatenate(
        [jnp.ones_like(t_after[..., :1]), t_after[..., :-1]], axis=-1
    )
    accept = t_after >= T_EPS
    w = t_before * alpha * accept
    t_bg = jnp.prod(1.0 - alpha * accept, axis=-1)
    return w, t_bg


def _pixel_alphas(proj: Projected, order, px, py, n_tiles_x, n_tiles_y):
    """Effective alpha of each depth-sorted Gaussian at pixels (px, py).

    px, py: [P] pixel coords. Returns [P, N] alphas (0 where skipped).
    """
    xy = proj.xy[order]
    conic = proj.conic[order]
    opac = proj.opacity[order]
    valid = proj.valid[order] & (proj.radius[order] > 0)
    xmin, xmax, ymin, ymax = tile_rect(proj.xy, proj.radius, TILE, n_tiles_x, n_tiles_y)
    xmin, xmax, ymin, ymax = xmin[order], xmax[order], ymin[order], ymax[order]

    tx = px // TILE
    ty = py // TILE
    in_rect = (
        (tx[:, None] >= xmin[None, :])
        & (tx[:, None] < xmax[None, :])
        & (ty[:, None] >= ymin[None, :])
        & (ty[:, None] < ymax[None, :])
    )

    dx = xy[None, :, 0] - px[:, None].astype(xy.dtype)
    dy = xy[None, :, 1] - py[:, None].astype(xy.dtype)
    power = (
        -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
        - conic[None, :, 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
    use = in_rect & valid[None, :] & (power <= 0.0) & (alpha >= ALPHA_SKIP)
    return jnp.where(use, alpha, 0.0)


def rasterize_oracle(
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
    row_chunk: int = 16,
):
    """Render [C, H, W] (channels-first like the reference's output).

    bg_color: [C]. Differentiable w.r.t. all Gaussian inputs.
    """
    H, W = camera.height, camera.width
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
    n_tiles_x = -(-W // TILE)
    n_tiles_y = -(-H // TILE)

    # Depth-ascending stable order; invalid Gaussians pushed to the back.
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)
    color_sorted = proj.color[order]  # [N, C]

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    chunks = []
    P = H * W
    step = max(1, row_chunk * W)
    for start in range(0, P, step):
        sl = slice(start, min(start + step, P))
        alpha = _pixel_alphas(proj, order, px[sl], py[sl], n_tiles_x, n_tiles_y)
        w, t_bg = blend_weights(alpha)
        out = w @ color_sorted + t_bg[:, None] * bg_color[None, :]
        chunks.append(out)
    img = jnp.concatenate(chunks, axis=0).reshape(H, W, -1)
    return jnp.transpose(img, (2, 0, 1))
