"""Public rasterizer API.

The TPU-native equivalent of the reference's
`GaussianRasterizationSettings`/`GaussianRasterizer` contract
(`/root/reference/renderer.py:79-141`): either packed 3D covariances
(cage path) or scales+quaternions (mesh path), either SH coefficients
or precomputed RGB, background color, and full differentiability from
pixels back to every Gaussian attribute.
"""

import dataclasses
from functools import partial
from typing import Optional

import jax.numpy as jnp

from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.raster.oracle import rasterize_oracle
from d3ga_tpu.raster.tiles import rasterize_tiled


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static rasterization knobs (hashable; safe as a jit static arg)."""

    sh_degree: int = 0
    scale_modifier: float = 1.0
    antialiasing: bool = False
    max_per_tile: int = 256
    backend: str = "tiled"  # "tiled" | "oracle" | "pallas" | "fused"
    # selection-funnel knobs (see tiles._select_per_tile)
    block_cap: int = 4096
    sub_block: int = 0
    sub_cap: int = 1024
    super_factor: int = 1
    coarse: str = "topk"  # "topk" | "dupsort"
    dup: int = 2
    # dupsort_depth only: exact f32 depth ordering (CUDA full-bit-
    # pattern keys) instead of quantized + index tie-break
    depth_exact: bool = True


def rasterize(
    camera: Camera,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    bg_color: jnp.ndarray,
    cov3d: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    colors: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    settings: RasterSettings = RasterSettings(),
):
    """Render [C, H, W] plus aux counters.

    Exactly one of (cov3d) or (scales, rotations) must be given, and one
    of (colors) or (shs) — same contract as the reference rasterizer.
    """
    if (cov3d is None) == (scales is None):
        raise ValueError("provide exactly one of cov3d or (scales, rotations)")
    if (colors is None) == (shs is None):
        raise ValueError("provide exactly one of colors or shs")

    kwargs = dict(
        cov3d=cov3d,
        scales=scales,
        rotations=rotations,
        opacities=opacities,
        colors=colors,
        shs=shs,
        sh_degree=settings.sh_degree,
        scale_modifier=settings.scale_modifier,
        antialiasing=settings.antialiasing,
    )
    if settings.backend == "oracle":
        img = rasterize_oracle(means3d, camera, bg_color, **kwargs)
        return img, None
    elif settings.backend in ("tiled", "pallas"):
        img, aux = rasterize_tiled(
            means3d,
            camera,
            bg_color,
            max_per_tile=settings.max_per_tile,
            use_pallas=settings.backend == "pallas",
            block_cap=settings.block_cap,
            sub_block=settings.sub_block,
            sub_cap=settings.sub_cap,
            super_factor=settings.super_factor,
            coarse=settings.coarse,
            dup=settings.dup,
            depth_exact=settings.depth_exact,
            **kwargs,
        )
        return img, aux
    elif settings.backend == "fused":
        from d3ga_tpu.raster.tiles import rasterize_tiled_fused

        kwargs.pop("scale_modifier")
        kwargs.pop("antialiasing")
        img, aux = rasterize_tiled_fused(
            means3d,
            camera,
            bg_color,
            max_per_tile=settings.max_per_tile,
            **kwargs,
        )
        return img, aux
    raise ValueError(f"unknown backend {settings.backend!r}")


def render(batch, pkg, bg_color, colors_precomp=None, detach=(), settings=None):
    """High-level render mirroring `/root/reference/renderer.py:69-145`.

    batch: dict with "camera" (Camera) and "crop" (or None);
    pkg: garment package with means3D / cov3D_precomp or scales+rotations /
    rgb or shs / opacities. Returns {"render": [C, H', W']} cropped via
    paste().
    """
    import jax

    camera: Camera = batch["camera"]
    settings = settings or RasterSettings(sh_degree=int(pkg.get("sh_degree", 0)))

    means3d = pkg["means3D"]
    cov3d = pkg.get("cov3D_precomp")
    scales = pkg.get("scales")
    rotations = pkg.get("rotations")
    opacities = pkg["opacities"]
    shs = pkg.get("shs")

    if "position" in detach:
        means3d = jax.lax.stop_gradient(means3d)
    if "covariance" in detach and cov3d is not None:
        cov3d = jax.lax.stop_gradient(cov3d)
    if "opacity" in detach:
        opacities = jax.lax.stop_gradient(opacities)

    if colors_precomp is None:
        colors_precomp = pkg.get("rgb")
        if shs is not None:
            colors_precomp = None
    else:
        shs = None

    img, aux = rasterize(
        camera,
        means3d,
        opacities,
        bg_color,
        cov3d=cov3d,
        scales=scales,
        rotations=rotations,
        colors=colors_precomp,
        shs=shs,
        settings=settings,
    )
    crop = batch.get("crop")
    if crop is not None:
        img = paste(img, crop)
    return {"render": img, "aux": aux}


def paste(img, crop):
    """Crop a principal-point-centered render back to the original image
    (`/root/reference/renderer.py:36-47`). crop = [left, right, top,
    bottom, W, H] (python ints / floats — static)."""
    left_w, right_w, top_h, bottom_h, W, H = crop
    W, H = int(W), int(H)
    if left_w > right_w:
        img = img[:, :, :W]
    else:
        img = img[:, :, -W:]
    if top_h > bottom_h:
        img = img[:, :H, :]
    else:
        img = img[:, -H:, :]
    return img


def paste_from_canvas(img, crop):
    """`paste` generalized to ANY principal-point-centered canvas (e.g.
    the capture-wide static canvas from `pad_frame_to`): the principal
    point sits at the canvas center, so the image occupies
    [center - left, center - left + W) x [center - top, ... + H).
    Equals `paste` when the canvas is the frame's own 2*max(l,r)."""
    left_w, right_w, top_h, bottom_h, W, H = [int(v) for v in crop]
    rh, rw = img.shape[-2:]
    x0 = rw // 2 - left_w
    y0 = rh // 2 - top_h
    return img[..., y0 : y0 + H, x0 : x0 + W]
