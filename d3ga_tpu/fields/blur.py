"""Per-camera learnable defocus blur.

`/root/reference/models/learnable_blur.py:15-44`: softmax over
{identity, 3x3 gaussian, 7x7 gaussian} of the *rendered* image, one
weight triple per camera; regularized toward the raw weights being 1
(`train.py:194`). Gaussian sigmas follow torchvision's kernel-size
default sigma = 0.3*((k-1)*0.5 - 1) + 0.8 with reflect padding.
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_learnable_blur(n_cameras: int):
    return {"weights_raw": jnp.ones((n_cameras, 3))}


def _gauss_kernel1d(k: int) -> np.ndarray:
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    x = np.arange(k) - (k - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _sep_blur(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable gaussian blur of [C, H, W] with reflect padding."""
    g = jnp.asarray(_gauss_kernel1d(k))
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    # Convolve along H: window-sum via stacked shifts (k is tiny: 3 or 7).
    x = sum(g[i] * x[:, i : i + img.shape[1], :] for i in range(k))
    y = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    y = sum(g[i] * y[:, :, i : i + img.shape[2]] for i in range(k))
    return y


def apply_learnable_blur(params, img, camera_idx):
    """img: [C, H, W]; camera_idx: int."""
    w = jax.nn.softmax(params["weights_raw"][camera_idx])
    return w[0] * img + w[1] * _sep_blur(img, 3) + w[2] * _sep_blur(img, 7)


def blur_reg(params, camera_idx):
    """Raw weights for the |w - 1| regularizer (`train.py:194`)."""
    return params["weights_raw"][camera_idx]
