"""Training losses.

Replicates `/root/reference/utils/loss_utils.py`: L1, 11x11
gaussian-window SSIM (sigma 1.5, same-padding), BCE, PSNR
(`utils/image_utils.py:20`), and a VGG19 5-layer perceptual loss with
the 512-crop + x0.5-downsample protocol. Pretrained torchvision weights
load from a checkpoint when available; otherwise a seeded random VGG is
used (random deep features are a documented, serviceable perceptual
proxy when no pretrained weights can be shipped).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def bce_loss(pred, gt, eps=1e-7):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def masked_psnr(pred, gt, mask=None, eps=1e-12):
    """PSNR over the valid pixels only. Canvas-padded capture frames
    (`data/batcher.py::pad_frame_to`) zero the padded border on both
    sides; counting those exact-match pixels would inflate PSNR, so the
    MSE denominator is the valid-pixel count. mask broadcasts against
    pred (e.g. [1, H, W] vs [C, H, W]); mask=None reduces to plain PSNR."""
    if mask is None:
        mse = jnp.mean((pred - gt) ** 2) + eps
    else:
        m = jnp.broadcast_to(mask, pred.shape)
        mse = jnp.sum((pred - gt) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0) + eps
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv2d_same(img, kernel2d):
    """img: [C, H, W]; kernel2d: [k, k]. Zero same-padding, per-channel
    (matches torch F.conv2d(groups=C, padding=k//2)).

    HIGHEST precision is required: at TPU-default bf16 precision the
    SSIM variance terms conv(x^2) - mu^2 cancel catastrophically (error
    ~1e-2 >> C2 = 9e-4), producing negative variances and SSIM >> 1.
    """
    k = kernel2d.shape[0]
    x = img[None, :, :, :]  # [1, C, H, W]
    w = jnp.broadcast_to(kernel2d[None, None], (img.shape[0], 1, k, k))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=img.shape[0],
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def _gauss_blur_separable(img, g1):
    """img: [C, H, W]; g1: [k] 1-D Gaussian taps. Depthwise blur with the
    separable kernel outer(g1, g1) under zero same-padding — numerically
    the sequential-1D form of `_depthwise_conv2d_same(img, outer(g1,g1))`
    (zero padding commutes with separability exactly; only f32 rounding
    differs). Two k-tap passes cost 2k MACs/output vs k^2 for the full
    window — the SSIM forward is ~5.5x lighter at k=11, and all SSIM
    operand channels are stacked into ONE call by the caller so the
    depthwise conv runs wide. Same HIGHEST-precision requirement as
    above (variance cancellation)."""
    k = g1.shape[0]
    C = img.shape[0]
    x = img[None]
    for kern_shape, pad in (((k, 1), [(k // 2, k // 2), (0, 0)]),
                            ((1, k), [(0, 0), (k // 2, k // 2)])):
        w = jnp.broadcast_to(g1.reshape(kern_shape)[None, None], (C, 1) + kern_shape)
        x = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )
    return x[0]


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over [C, H, W] images in [0,1]
    (`utils/loss_utils.py:59-90`)."""
    return jnp.mean(ssim_map(img1, img2, window_size))


def masked_ssim(img1, img2, mask, window_size: int = 11):
    """Mean SSIM over the valid pixels only (canvas-padded frames):
    padded zeros match exactly on both sides, so unmasked SSIM windows
    there score ~1 and bias the mean toward 1 by the pad fraction.
    mask broadcasts against the images (e.g. [1, H, W])."""
    m = jnp.broadcast_to(mask, img1.shape)
    s = ssim_map(img1, img2, window_size)
    return jnp.sum(s * m) / jnp.maximum(jnp.sum(m), 1.0)


def ssim_map(img1, img2, window_size: int = 11):
    """Per-pixel SSIM map over [C, H, W] images in [0,1].

    The five window means (x, y, x^2, y^2, xy) are stacked into ONE
    separable depthwise blur (`_gauss_blur_separable`) — one wide conv
    pair instead of five 121-tap convs (the loss-forward hot line in
    tools/train_account.py)."""
    g1 = jnp.asarray(_gaussian_window(window_size, 1.5))
    C = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    blurred = _gauss_blur_separable(stacked, g1)
    mu1, mu2 = blurred[:C], blurred[C : 2 * C]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blurred[2 * C : 3 * C] - mu1_sq
    sigma2_sq = blurred[3 * C : 4 * C] - mu2_sq
    sigma12 = blurred[4 * C :] - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


# ----------------------------------------------------------------------------
# VGG19 perceptual loss


VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# torchvision feature indices (2, 7, 12, 21, 30) = outputs after relu1_2,
# relu2_2, relu3_2, relu4_2, relu5_2 (`utils/loss_utils.py:112`).
FEATURE_LAYERS = (2, 7, 12, 21, 30)


def init_vgg19_features(key=None, weights_path=None, allow_random=False):
    """Conv stack parameters up to torchvision features[30].

    weights_path: .npz with conv weights named w0, b0, w1, ... in
    torchvision order ([out, in, k, k]) — export with
    tools/export_vgg19.py. Without a weights file this returns None
    (the VGG term is DISABLED): the seeded-random fallback was
    validated in a converged regime and CUT — held-out PSNR delta
    +0.218 dB (below the pre-registered 0.25 dB keep rule) with a
    slightly NEGATIVE SSIM delta (tools/randvgg_validation.json,
    tools/validate_randvgg.py). allow_random=True keeps the random
    stack available for that experiment and architecture tests only.
    """
    convs = []
    in_ch = 3
    loaded = None
    if weights_path is not None:
        loaded = np.load(weights_path)
    elif not allow_random:
        return None
    idx = 0
    if key is None:
        key = jax.random.PRNGKey(1234)
    for v in VGG19_CFG:
        if v == "M":
            continue
        if loaded is not None:
            w = jnp.asarray(loaded[f"w{idx}"])
            b = jnp.asarray(loaded[f"b{idx}"])
        else:
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (v, in_ch, 3, 3)) * math.sqrt(
                2.0 / (in_ch * 9)
            )
            b = jnp.zeros(v)
        convs.append({"w": w, "b": b})
        in_ch = v
        idx += 1
    return {"convs": convs, "pretrained": loaded is not None}


def _vgg_forward_features(params, x):
    """x: [B, 3, H, W] -> feature maps tapped where the reference slices
    torchvision's flat features Sequential at (2, 7, 12, 21, 30) — i.e.
    the outputs after flat indices 1, 6, 11, 20, 29 (relu{1..5}_1)."""
    taps = {f - 1 for f in FEATURE_LAYERS}
    feats = []
    flat_idx = 0
    conv_idx = 0
    h = x
    for v in VGG19_CFG:
        if v == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
            if flat_idx in taps:
                feats.append(h)
            flat_idx += 1
        else:
            c = params["convs"][conv_idx]
            h = jax.lax.conv_general_dilated(
                h, c["w"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGH,
            ) + c["b"][None, :, None, None]
            conv_idx += 1
            flat_idx += 1  # conv
            h = jax.nn.relu(h)
            if flat_idx in taps:
                feats.append(h)
            flat_idx += 1  # relu
        if flat_idx > max(FEATURE_LAYERS):
            break
    return feats


def vgg_loss(params, pred, gt, crop_key=None, crop_size=512):
    """Perceptual L1 between VGG features of pred and gt ([C, H, W]).

    Follows `utils/loss_utils.py:127-160`: x0.5 bilinear downsample
    (unless already 512x512), random 512 crop (seeded via crop_key), L1
    per feature level, unit weights, no grad through the gt branch.
    """
    def downsize(img):
        c, h, w = img.shape
        if h == crop_size and w == crop_size:
            return img
        return jax.image.resize(img, (c, h // 2, w // 2), method="bilinear")

    p = downsize(pred)
    g = downsize(gt)
    c, h, w = p.shape
    if (h > crop_size or w > crop_size) and crop_key is not None:
        ky, kx = jax.random.split(crop_key)
        i = jax.random.randint(ky, (), 0, max(h - crop_size, 0) + 1)
        j = jax.random.randint(kx, (), 0, max(w - crop_size, 0) + 1)
        p = jax.lax.dynamic_slice(p, (0, i, j), (c, min(crop_size, h), min(crop_size, w)))
        g = jax.lax.dynamic_slice(g, (0, i, j), (c, min(crop_size, h), min(crop_size, w)))

    pf = _vgg_forward_features(params, p[None])
    gf = _vgg_forward_features(params, jax.lax.stop_gradient(g[None]))
    loss = 0.0
    for a, b in zip(pf, gf):
        loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
