"""Per-camera affine color calibration.

`/root/reference/lib/calibration.py:20-54`: per-camera 3-channel affine
(w * rgb + b), identity for the held-out test camera, with gradients
scaled by 0.1 (the reference uses a backward hook; here the same effect
is obtained with the stop_gradient identity p*0.1 + sg(p)*0.9, which
leaves the forward value unchanged).
"""

import jax
import jax.numpy as jnp


def init_camera_calibration(n_cameras: int):
    return {
        "corrections": jnp.tile(
            jnp.array([[1.0, 1.0, 1.0, 0.0, 0.0, 0.0]]), (n_cameras, 1)
        )
    }


def apply_camera_calibration(
    params, rgb, camera_idx, identity_idx=0, grad_scale=0.1, training=True
):
    """rgb: [N, 3] (per-Gaussian colors, `models/garment_net.py:265-266`)
    or [3, H, W]; camera_idx: int index into the table."""
    p = params["corrections"][camera_idx]
    if training:
        p = p * grad_scale + jax.lax.stop_gradient(p) * (1.0 - grad_scale)
    w, b = p[:3], p[3:]
    is_identity = camera_idx == identity_idx
    if rgb.ndim == 3:  # [3, H, W]
        out = rgb * w[:, None, None] + b[:, None, None]
    else:
        out = rgb * w + b
    return jnp.where(is_identity, rgb, out)
