"""The jitted training step: forward, render (RGB + silhouette), loss
assembly, optimizer update.

Loss assembly replicates `/root/reference/train.py:190-258` +
`models/trainer.py:91-140`:

  color   = (1-lambda_dssim) L1 + lambda_dssim (1-SSIM)      * rgb_weight
  sil     = L1(pred_sil, colored gt sil)                      * sil_weight
  code    = mean(frame_enc^2)*1e-3 + mean(opt_poses^2)*7.5e-3
  scale   = scale_energy * 175
  fme     = (mean fem + 3.0) * fme_weight
  blur    = |blur_raw - 1|.mean() * blur_weight
  vgg     = VGG19 perceptual * vgg_weight        (after enable_vgg_from)

with a random background color per step and a second rasterization for
the silhouette (optionally with detached position/covariance/opacity).
"""

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from d3ga_tpu.fields import (
    apply_background,
    apply_learnable_blur,
    apply_pixel_bias,
    blur_reg,
    blurred_noise,
    composite_background,
)
from d3ga_tpu.model.avatar import AvatarModel, avatar_forward, resolve_camera
from d3ga_tpu.raster.tiles import rasterize_tiled
from d3ga_tpu.train.losses import (
    l1_loss,
    masked_psnr,
    masked_ssim,
    ssim,
    vgg_loss,
)


class LossWeights(NamedTuple):
    rgb_weight: float = 10.0
    sil_weight: float = 5.0
    fme_weight: float = 0.0025
    vgg_weight: float = 0.05
    blur_weight: float = 1e-5
    lambda_dssim: float = 0.2
    enable_vgg_from: int = 60_000


def render_frame(
    params,
    model: AvatarModel,
    batch,
    rng,
    training=True,
    max_per_tile=256,
    detach_silhouette=(),
    vgg_params=None,
    loss_weights: LossWeights = LossWeights(),
    iteration=0,
    sh_degree: int = 0,
    rasterize_fn=None,
    geom_override=None,
    band_ctx=None,
):
    """Forward + two rasterizations + per-frame loss terms.

    Returns (loss_terms dict, aux dict with images).

    `rasterize_fn(means, camera, bg, **kwargs) -> (image, RasterAux)`
    defaults to the single-device `rasterize_tiled`; the sharded step
    passes a `rasterize_collective` partial so BOTH steps share this one
    loss assembly (`/root/reference/train.py:190-258`,
    `models/trainer.py:91-140`).

    band_ctx=(axis, m): the rasterize_fn returns image-row BANDS (one
    per device in the `axis` mesh group, `rasterize_collective
    banded=True`) and every image-space loss runs band-locally with a
    halo exchange (`dist/banded.py`) — no image all-gather on the
    training path. Returned loss terms are the exact full-image values
    (replicated). Incompatible with learnable blur / pixel_cal / bg_net
    (full-image operators) — asserted below. The VGG term, when active,
    all-gathers the bands (window crops span bands).
    """
    cfg = model.config
    if rasterize_fn is None:
        backend = cfg.get("raster_backend", "xla")
        # selection-funnel knobs (coarse/dup/sub_block/... — see
        # tiles._select_per_tile); e.g. raster_opts: {coarse: dupsort_tile,
        # dup: 4} enables the fastest measured Goliath-scale config.
        opts = dict(cfg.get("raster_opts", {}))
        if backend == "fused":
            from d3ga_tpu.raster.tiles import rasterize_tiled_fused

            rasterize_fn = rasterize_tiled_fused
        elif backend == "pallas_blend":
            rasterize_fn = partial(rasterize_tiled, use_pallas=True, **opts)
        else:
            rasterize_fn = partial(rasterize_tiled, **opts) if opts else rasterize_tiled
    batch = dict(batch, iteration=iteration)
    # In-graph camera rebuild from optimizable per-frame Rh/Th (no-op
    # unless the params + batch["cam_rt"] are present).
    batch = resolve_camera(params, model, batch, training=training)
    camera = batch["camera"]
    pkg = avatar_forward(
        params, model, batch, training=training, geom_override=geom_override
    )

    if training:
        bg = jax.random.uniform(rng, (3,))
    else:
        bg = jnp.ones(3) if cfg.get("background", "white") == "white" else jnp.zeros(3)

    # Per-camera learnable background (`garment_net.py:196-199` — dead
    # code there; live here, see fields/background.py). Composited via
    # the rasterizer's background transmittance, so it needs the alpha
    # output (single-device raster paths only).
    bg_map = None
    if "bg_net" in params:
        bg_map = apply_background(
            params["bg_net"], batch["camera_idx"], camera.height, camera.width
        )

    raster_kwargs = dict(max_per_tile=max_per_tile)
    if bg_map is not None:
        raster_kwargs["return_alpha"] = True
    fuse = not detach_silhouette and pkg.get("rgb") is not None
    if fuse:
        # One fused rasterization with 6 color channels (RGB +
        # silhouette): projection/sort/binning/blend-weights are shared
        # — the reference launches the CUDA kernel twice per step
        # (`models/trainer.py:102-110`; fusion suggested in SURVEY.md
        # "Hard parts"). Only valid when the silhouette pass does not
        # detach anything.
        colors6 = jnp.concatenate([pkg["rgb"], pkg["silhouette_rgb"]], axis=-1)
        bg6 = jnp.concatenate([bg, jnp.zeros(3)])
        out = rasterize_fn(
            pkg["means3D"], camera, bg6,
            cov3d=pkg.get("cov3D_precomp"),
            scales=pkg.get("scales"),
            rotations=pkg.get("rotations"),
            opacities=pkg["opacities"],
            colors=colors6,
            **raster_kwargs,
        )
        if bg_map is not None:
            both, alpha_img, aux_rgb = out
        else:
            both, aux_rgb = out
        pred_image = both[:3]
        pred_sil = both[3:]
    else:
        out = rasterize_fn(
            pkg["means3D"], camera, bg,
            cov3d=pkg.get("cov3D_precomp"),
            scales=pkg.get("scales"),
            rotations=pkg.get("rotations"),
            opacities=pkg["opacities"],
            colors=pkg["rgb"],
            shs=pkg["shs"] if pkg.get("rgb") is None else None,
            sh_degree=sh_degree,
            **raster_kwargs,
        )
        if bg_map is not None:
            pred_image, alpha_img, aux_rgb = out
        else:
            pred_image, aux_rgb = out

        sil_means = pkg["means3D"]
        sil_cov = pkg.get("cov3D_precomp")
        sil_opac = pkg["opacities"]
        if "position" in detach_silhouette:
            sil_means = jax.lax.stop_gradient(sil_means)
        if "covariance" in detach_silhouette and sil_cov is not None:
            sil_cov = jax.lax.stop_gradient(sil_cov)
        if "opacity" in detach_silhouette:
            sil_opac = jax.lax.stop_gradient(sil_opac)
        pred_sil, _ = rasterize_fn(
            sil_means, camera, jnp.zeros(3),
            cov3d=sil_cov,
            scales=pkg.get("scales"),
            rotations=pkg.get("rotations"),
            opacities=sil_opac,
            colors=pkg["silhouette_rgb"],
            max_per_tile=max_per_tile,
        )

    if bg_map is not None:
        pred_image = composite_background(pred_image, 1.0 - alpha_img, bg_map, bg)

    blur_weights = None
    if "learnable_blur" in params:
        pred_image = apply_learnable_blur(
            params["learnable_blur"], pred_image, batch["camera_idx"]
        )
        blur_weights = blur_reg(params["learnable_blur"], batch["camera_idx"])
    if "pixel_cal" in params:
        H, W = pred_image.shape[1], pred_image.shape[2]
        pred_image = pred_image + apply_pixel_bias(
            params["pixel_cal"], batch["camera_idx"], H, W
        )

    if band_ctx is not None:
        assert bg_map is None and "learnable_blur" not in params and \
            "pixel_cal" not in params, (
                "banded losses are incompatible with full-image operators "
                "(blur/pixel_cal/bg_net) — use the gathered path"
            )
        terms, aux = _banded_losses(
            pred_image, pred_sil, batch, bg, loss_weights, vgg_params,
            iteration, camera, band_ctx, rng, cfg,
        )
        terms.update(_pkg_terms(pkg, loss_weights))
        aux["raster_overflow"] = aux_rgb.overflow
        aux["raster_visible_overflow"] = aux_rgb.visible_overflow
        aux["raster_depth_ties"] = aux_rgb.depth_ties
        aux["raster_clamp_overflow"] = aux_rgb.clamp_overflow
        return terms, aux

    # Ground-truth composition (`train.py:181-189`).
    gt_alpha = batch["alpha"]
    if gt_alpha.ndim == 2:
        gt_alpha = gt_alpha[None]
    gt_alpha = jnp.broadcast_to(gt_alpha, batch["image"].shape)
    if cfg.get("use_background", False) and "orig_image" in batch:
        # Full frame incl. the real background as the target
        # (`models/trainer.py:112`) — the bg net must explain it.
        gt_image = batch["orig_image"]
    else:
        gt_image = batch["image"] * gt_alpha + (1.0 - gt_alpha) * bg[:, None, None]
    gt_sil = batch["silhouette"] * gt_alpha
    if "boundary_fg" in batch:
        b = 1.0 - batch["boundary_fg"]
        gt_image = gt_image * b + (1.0 - b) * bg[:, None, None]
        gt_sil = gt_sil * b

    # Blurred-noise background target while the bg net warms up or under
    # use_random_bg (`garment_net.py:201-203`, `trainer.py:113-126`):
    # the gt background region becomes blurred noise (zero expected
    # gradient there), composited with the ORIGINAL image's foreground.
    use_random_bg = cfg.get("use_random_bg", False)
    enable_bg = int(cfg.get("enable_bg", 0))
    if (bg_map is not None and enable_bg > 0) or use_random_bg:
        noise = blurred_noise(jax.random.fold_in(rng, 2), gt_image.shape)
        if "learnable_blur" in params:
            noise = apply_learnable_blur(
                params["learnable_blur"], noise, batch["camera_idx"]
            )
        noise = jax.lax.stop_gradient(noise)
        orig = batch.get("orig_image", batch["image"])
        noisy_gt = (1.0 - gt_alpha) * noise + gt_alpha * orig
        active = jnp.logical_or(
            jnp.asarray(use_random_bg),
            jnp.asarray(iteration) < enable_bg if bg_map is not None else False,
        )
        gt_image = jnp.where(active, noisy_gt, gt_image)

    # Canvas padding (`pad_frame_to`): frames padded to the capture's
    # static render canvas carry a pixel_valid mask. Padded pixels are
    # zeroed on BOTH sides (the reference instead crops the render back
    # to the image — `renderer.py:36-47` paste — so they contribute no
    # loss there either) and every image mean (L1, SSIM, PSNR) averages
    # over the real-pixel count so loss magnitudes and the L1:DSSIM
    # balance match the unpadded/reference setup.
    pix_scale = 1.0
    valid_mask = batch.get("pixel_valid")
    if valid_mask is not None:
        m = valid_mask
        pred_image = pred_image * m
        gt_image = gt_image * m
        pred_sil = pred_sil * m
        gt_sil = gt_sil * m
        pix_scale = m.size / jnp.maximum(jnp.sum(m), 1.0)

    lw = loss_weights
    rgb_l1 = l1_loss(pred_image, gt_image) * pix_scale
    if valid_mask is not None:
        rgb_ssim = masked_ssim(pred_image, gt_image, valid_mask)
    else:
        rgb_ssim = ssim(pred_image, gt_image)
    color = (1.0 - lw.lambda_dssim) * rgb_l1 + lw.lambda_dssim * (1.0 - rgb_ssim)
    sil_l1 = l1_loss(pred_sil, gt_sil) * pix_scale

    terms = {
        "color_loss": color * lw.rgb_weight,
        "sil_loss": sil_l1 * lw.sil_weight,
    }
    terms.update(_pkg_terms(pkg, lw))
    if blur_weights is not None:
        terms["blur_loss"] = jnp.mean(jnp.abs(blur_weights - 1.0)) * lw.blur_weight
    if vgg_params is not None and lw.enable_vgg_from > 0:
        vgg = vgg_loss(vgg_params, pred_image, gt_image, crop_key=jax.random.fold_in(rng, 1))
        terms["vgg_loss"] = jnp.where(
            iteration > lw.enable_vgg_from, vgg * lw.vgg_weight, 0.0
        )

    aux = {
        "pred_image": pred_image,
        "gt_image": gt_image,
        "pred_silhouette": pred_sil,
        "gt_silhouette": gt_sil,
        "raster_overflow": aux_rgb.overflow,
        "raster_visible_overflow": aux_rgb.visible_overflow,
        "raster_depth_ties": aux_rgb.depth_ties,
        "raster_clamp_overflow": aux_rgb.clamp_overflow,
        "psnr": masked_psnr(pred_image, gt_image, valid_mask),
    }
    return terms, aux


def _pkg_terms(pkg, lw: LossWeights) -> Dict[str, jnp.ndarray]:
    """Loss terms derived from the garment package (shared between the
    gathered and banded assemblies): code regs (`train.py:205-212`),
    scale energy x175 (`train.py:219`), FEM+3.0 (`train.py:214-217`)."""
    code_reg = jnp.mean(pkg["frame_encoding"] ** 2) * 0.001
    if pkg.get("optimizable_poses") is not None:
        code_reg = code_reg + jnp.mean(pkg["optimizable_poses"] ** 2) * 0.0075
    return {
        "codes_reg": code_reg,
        "scale_loss": pkg["scale_energy"].mean() * 175.0,
        "fme_loss": (pkg["fm_energy"].mean() + 3.0) * lw.fme_weight,
    }


def _banded_losses(
    pred_band, sil_band, batch, bg, lw: LossWeights, vgg_params, iteration,
    camera, band_ctx, rng, cfg,
):
    """Image-space loss terms over row bands (see render_frame's
    band_ctx doc): gt is composed full (cheap dense elementwise on the
    replicated target), sliced to this device's band, and every mean /
    SSIM runs band-locally + psum (`dist/banded.py`). Values equal the
    gathered path's exactly (tests/test_dist.py banded parity)."""
    from d3ga_tpu.dist.banded import (
        band_rows,
        banded_mean,
        banded_psnr,
        banded_ssim,
    )

    axis, m = band_ctx
    H, W = camera.height, camera.width
    bh = pred_band.shape[1]
    my = jax.lax.axis_index(axis)
    rows_valid = (band_rows(H, bh, axis) < H).astype(pred_band.dtype)

    def band_slice(img):
        pad = m * bh - img.shape[-2]
        p = jnp.pad(img, ((0, 0), (0, pad), (0, 0)))
        return jax.lax.dynamic_slice_in_dim(p, my * bh, bh, axis=1)

    # --- gt composition, full then sliced (`train.py:181-189`) --------
    gt_alpha = batch["alpha"]
    if gt_alpha.ndim == 2:
        gt_alpha = gt_alpha[None]
    gt_alpha = jnp.broadcast_to(gt_alpha, batch["image"].shape)
    if cfg.get("use_background", False) and "orig_image" in batch:
        gt_image = batch["orig_image"]
    else:
        gt_image = batch["image"] * gt_alpha + (1.0 - gt_alpha) * bg[:, None, None]
    gt_sil = batch["silhouette"] * gt_alpha
    if "boundary_fg" in batch:
        b = 1.0 - batch["boundary_fg"]
        gt_image = gt_image * b + (1.0 - b) * bg[:, None, None]
        gt_sil = gt_sil * b
    use_random_bg = cfg.get("use_random_bg", False)
    if use_random_bg:
        noise = jax.lax.stop_gradient(
            blurred_noise(jax.random.fold_in(rng, 2), gt_image.shape)
        )
        orig = batch.get("orig_image", batch["image"])
        gt_image = (1.0 - gt_alpha) * noise + gt_alpha * orig

    gt_b = band_slice(gt_image)
    sil_gt_b = band_slice(gt_sil)

    valid_b = rows_valid[None, :, None]
    if batch.get("pixel_valid") is not None:
        valid_b = valid_b * band_slice(batch["pixel_valid"])
    pred_band = pred_band * valid_b
    gt_b = gt_b * valid_b
    sil_band = sil_band * valid_b
    sil_gt_b = sil_gt_b * valid_b

    rgb_l1 = banded_mean(jnp.abs(pred_band - gt_b), valid_b, axis)
    rgb_ssim = banded_ssim(pred_band, gt_b, valid_b, axis, m)
    color = (1.0 - lw.lambda_dssim) * rgb_l1 + lw.lambda_dssim * (1.0 - rgb_ssim)
    sil_l1 = banded_mean(jnp.abs(sil_band - sil_gt_b), valid_b, axis)

    terms = {
        "color_loss": color * lw.rgb_weight,
        "sil_loss": sil_l1 * lw.sil_weight,
    }
    if vgg_params is not None and lw.enable_vgg_from > 0:
        # 512-crop windows span bands: gather rows for this term only
        pred_full = jax.lax.all_gather(
            pred_band, axis, axis=1, tiled=True
        )[:, :H]
        gt_full = jax.lax.all_gather(gt_b, axis, axis=1, tiled=True)[:, :H]
        vgg = vgg_loss(vgg_params, pred_full, gt_full,
                       crop_key=jax.random.fold_in(rng, 1))
        terms["vgg_loss"] = jnp.where(
            iteration > lw.enable_vgg_from, vgg * lw.vgg_weight, 0.0
        )
    aux = {
        "pred_image": pred_band,
        "gt_image": gt_b,
        "pred_silhouette": sil_band,
        "gt_silhouette": sil_gt_b,
        "psnr": banded_psnr(pred_band, gt_b, valid_b, axis),
    }
    return terms, aux


def total_loss(terms: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return sum(terms.values())


def make_train_step(
    model: AvatarModel,
    tx: optax.GradientTransformation,
    max_per_tile: int = 256,
    detach_silhouette=(),
    vgg_params=None,
    loss_weights: LossWeights = LossWeights(),
    donate: bool = True,
    sh_degree: int = 0,
):
    """Build the jitted single-device training step.

    step(params, opt_state, batch, rng, iteration) ->
        (params, opt_state, metrics)

    sh_degree is static (the `oneupSHdegree` ramp rebuilds the step —
    at most max_sh_degree recompiles per run).
    """

    def loss_fn(params, batch, rng, iteration):
        terms, aux = render_frame(
            params, model, batch, rng,
            training=True,
            max_per_tile=max_per_tile,
            detach_silhouette=detach_silhouette,
            vgg_params=vgg_params,
            loss_weights=loss_weights,
            iteration=iteration,
            sh_degree=sh_degree,
        )
        return total_loss(terms), (terms, aux)

    def _step_body(params, opt_state, batch, rng, iteration):
        (loss, (terms, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, iteration
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(terms)
        metrics["total_loss"] = loss
        metrics["psnr"] = aux["psnr"]
        metrics["raster_overflow"] = aux["raster_overflow"]
        metrics["raster_visible_overflow"] = aux.get(
            "raster_visible_overflow", -1
        )
        metrics["raster_depth_ties"] = aux.get("raster_depth_ties", -1)
        metrics["raster_clamp_overflow"] = aux.get("raster_clamp_overflow", -1)
        return params, opt_state, metrics

    step = jax.jit(_step_body, donate_argnums=(0, 1) if donate else ())
    step.body = _step_body
    return step


def make_chained_step(step, chain: int, donate: bool = True):
    """Chain `chain` training steps into ONE jitted dispatch via a fully
    unrolled `lax.scan` — on dispatch-bound transports (the axon tunnel
    round-trips tens of ms per dispatch and ~3 ms per loop iteration)
    this amortizes the fixed cost over the chain, exactly like bench.py.

    `step` must come from `make_train_step` (its unjitted body is
    attached as `step.body`). Returns
        chained(params, opt_state, batches, rng, iterations)
            -> (params, opt_state, rng, metrics)
    with `batches`/`iterations` stacked on a leading `chain` axis and
    metrics returned stacked the same way. The per-step key is drawn by
    `rng, k = split(rng)` INSIDE the scan, so a chained run consumes the
    IDENTICAL rng stream as `chain` sequential `step` calls that split
    the same way; params match up to XLA fusion-order float rounding
    (~1e-7 relative, tests/test_chain.py)."""
    body = step.body

    def scan_fn(carry, xs):
        params, opt_state, rng = carry
        batch, iteration = xs
        rng, k = jax.random.split(rng)
        params, opt_state, metrics = body(params, opt_state, batch, k, iteration)
        return (params, opt_state, rng), metrics

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def chained(params, opt_state, batches, rng, iterations):
        (params, opt_state, rng), metrics = jax.lax.scan(
            scan_fn, (params, opt_state, rng), (batches, iterations),
            length=chain, unroll=chain,
        )
        return params, opt_state, rng, metrics

    return chained
