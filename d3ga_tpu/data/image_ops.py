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
