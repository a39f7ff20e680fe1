"""Host-side image preprocessing (numpy/cv2) for the data pipeline.

Ports of `/root/reference/utils/image_utils.py` (Mugsy gamma/color
curves, mask morphology) — these run in data-loader workers on the host,
never on TPU, so numpy + cv2 is the right tool.
"""

import cv2
import numpy as np


def linear2color_corr(img: np.ndarray, dim: int = 0) -> np.ndarray:
    """Mugsy 'color correction' of a linear RGB image (gamma 2, black
    level 3/255, per-channel scale [1.4, 1.1, 1.6] / 1.1)
    (`utils/image_utils.py:92-123`). img in [0,1]."""
    gamma = 2.0
    black = 3.0 / 255.0
    color_scale = np.array([1.4, 1.1, 1.6], dtype=img.dtype)
    shape = [3 if i == dim else 1 for i in range(img.ndim)]
    img = img * color_scale.reshape(shape) / 1.1
    return np.clip(
        ((1.0 / (1 - black)) * 0.95 * np.clip(img - black, 0, 2)) ** (1.0 / gamma)
        - 15.0 / 255.0,
        0,
        2,
    )


def linear2color_corr_inv(img: np.ndarray, dim: int = 0) -> np.ndarray:
    """Inverse of linear2color_corr (`utils/image_utils.py:85-90`)."""
    gamma = 2.0
    black = 3.0 / 255.0
    color_scale = np.array([1.4, 1.1, 1.6], dtype=img.dtype)
    shape = [3 if i == dim else 1 for i in range(img.ndim)]
    img = (img + 15.0 / 255.0) ** gamma / (0.95 / (1 - black)) + black
    return np.clip(img / (color_scale.reshape(shape) / 1.1), 0, 1)


def linear2srgb(img: np.ndarray, gamma: float = 2.4) -> np.ndarray:
    linear_part = img * 12.92
    exp_part = 1.055 * (np.maximum(img, 0.0031308) ** (1 / gamma)) - 0.055
    return np.where(img <= 0.0031308, linear_part, exp_part)


# CIE XYZ -> linear sRGB (the matrix kornia's xyz_to_rgb uses; inverse
# of the ITU-R BT.709 rgb->xyz primaries).
XYZ_TO_RGB = np.array(
    [
        [3.2404813432005266, -1.5371515162713185, -0.4985363261688878],
        [-0.9692549499965682, 1.8759900014898907, 0.0415559265582928],
        [0.0556466391351772, -0.2040413383665112, 1.0573110696453443],
    ],
    np.float32,
)


def apply_ccm(image_255: np.ndarray, ccm: np.ndarray) -> np.ndarray:
    """Per-camera color-correction-matrix calibration
    (`/root/reference/lib/batch.py:71-77` `process_color`):
    ((img - 2)/255) [C,H,W] -> HWC @ ccm (device XYZ) -> linear sRGB ->
    sRGB encode. Returns [C, H, W] in [0, 1]-ish (unclamped like the
    reference)."""
    im = (image_255.astype(np.float32) - 2.0) / 255.0
    im_xyz = np.einsum("chw,ck->khw", im, np.asarray(ccm, np.float32))
    im_rgb = np.einsum("rk,khw->rhw", XYZ_TO_RGB, im_xyz)
    return linear2srgb(im_rgb)


def median_blur(mask: np.ndarray, k: int = 7) -> np.ndarray:
    """Median filter of a [1, H, W] or [H, W] float mask in [0,1] (kornia
    median_blur equivalent in the Batcher alpha path, `lib/batch.py:157`).
    cv2 only supports k > 5 on uint8, so filter on a 0..255 image."""
    squeeze = mask.ndim == 3
    m = mask[0] if squeeze else mask
    u8 = np.clip(m * 255.0, 0, 255).astype(np.uint8)
    out = cv2.medianBlur(u8, k).astype(np.float32) / 255.0
    return out[None] if squeeze else out


def erode_mask(mask: np.ndarray, k: int = 5) -> np.ndarray:
    squeeze = mask.ndim == 3
    m = mask[0] if squeeze else mask
    kernel = np.ones((k, k), np.uint8)
    out = cv2.erode((m > 0.5).astype(np.uint8), kernel).astype(np.float32)
    return out[None] if squeeze else out


def close_holes(mask: np.ndarray, k: int = 11) -> np.ndarray:
    squeeze = mask.ndim == 3
    m = mask[0] if squeeze else mask
    kernel = np.ones((k, k), np.uint8)
    out = cv2.morphologyEx((m > 0.5).astype(np.uint8), cv2.MORPH_CLOSE, kernel)
    return out.astype(np.float32)[None] if squeeze else out.astype(np.float32)


def psnr_np(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 20.0 * np.log10(1.0 / np.sqrt(max(mse, 1e-12)))
