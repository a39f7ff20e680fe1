"""Per-camera low-resolution learnable screen-space bias.

`/root/reference/models/color_calib.py:245-258` (`CameraPixelBias`):
a zeros-initialized [n_cameras, 1, H/ds, W/ds] map bilinearly upsampled
to full resolution and added to the predicted image.
"""

import jax
import jax.numpy as jnp


def init_pixel_bias(n_cameras: int, image_height: int, image_width: int, ds_rate: int = 8):
    return {
        "bias": jnp.zeros((n_cameras, 1, image_height // ds_rate, image_width // ds_rate))
    }


def apply_pixel_bias(params, camera_idx, image_height: int, image_width: int):
    """-> [1, H, W] bias for the given camera."""
    lowres = params["bias"][camera_idx]  # [1, h/ds, w/ds]
    return jax.image.resize(lowres, (1, image_height, image_width), method="bilinear")
