"""True LPIPS-VGG head (`/root/reference/recorder/heatmap.py:13,37-49`).

`lpips.LPIPS(net="vgg")` is: a fixed scaling layer, torchvision VGG16
features tapped after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
per-pixel channel-unit-normalization, squared difference, a learned
1x1-conv ("lin") calibration per level, spatial mean, sum over levels.

The reference calls it WITHOUT `normalize=True` on [0,1] images — i.e.
the scaling layer receives [0,1] directly even though LPIPS was
calibrated for [-1,1]. That quirk is reproduced verbatim so numbers are
comparable to the reference's `errors_*.txt`.

Weights cannot be shipped (zero egress): export them once with
`tools/export_lpips.py` on any machine with torchvision+lpips, then
point `train.lpips_weights_path` at the .npz. Everything here is
weight-file-driven; there is NO random fallback (a random LPIPS would
be meaningless) — callers must skip when no weights exist.
"""

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 features config (conv channels; M = maxpool)
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# lpips vgg16 slice boundaries: features[:4], [4:9], [9:16], [16:23], [23:30]
# -> taps after flat indices 3, 8, 15, 22, 29 (relu1_2/2_2/3_3/4_3/5_3)
TAPS = (3, 8, 15, 22, 29)

# lpips.ScalingLayer constants (lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(weights_path):
    """Load an LPIPS-VGG .npz: conv weights `w0..w12`/`b0..b12`
    (torchvision VGG16 order, [out, in, k, k]) and `lin0..lin4`
    ([C] positive calibration weights per level)."""
    data = np.load(weights_path)
    convs = []
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            continue
        if idx > 12:
            break
        convs.append({
            "w": jnp.asarray(data[f"w{idx}"]),
            "b": jnp.asarray(data[f"b{idx}"]),
        })
        idx += 1
    lins = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
    return {"convs": convs, "lins": lins}


def _vgg16_features(params, x):
    feats = []
    h = x
    flat = 0
    ci = 0
    for v in VGG16_CFG:
        if v == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
            flat += 1
        else:
            c = params["convs"][ci]
            h = jax.lax.conv_general_dilated(
                h, c["w"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGH,
            ) + c["b"][None, :, None, None]
            ci += 1
            flat += 1  # conv
            h = jax.nn.relu(h)
            if flat in TAPS:
                feats.append(h)
            flat += 1  # relu
        if flat > max(TAPS):
            break
    return feats


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (n + eps)


def lpips_vgg(params, pred, gt):
    """LPIPS(net='vgg') distance between [C, H, W] images in [0, 1],
    fed WITHOUT [-1,1] normalization exactly like the reference
    (`recorder/heatmap.py:40`)."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(img):
        return (img[None] - shift) / scale

    f0 = _vgg16_features(params, prep(pred))
    f1 = _vgg16_features(params, prep(gt))
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        # NetLinLayer: 1x1 conv with non-negative weights, no bias
        val = jnp.sum(d * lin[None, :, None, None], axis=1, keepdims=True)
        total = total + jnp.mean(val)
    return total
