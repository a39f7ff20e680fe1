"""Per-camera learnable background + blurred-noise background target.

TPU-native port of the reference's background-network capability
surface (`/root/reference/models/garment_net.py:63,135-136,196-204`,
`models/trainer.py:113-126`):

- `bg_net`: a per-camera learnable background image. In the reference
  the construction is commented out (`garment_net.py:43`) and the
  produced `pkg["bg_map"]` is never composited (`renderer.py:105` is
  commented too) — the path is dead code that would crash if enabled.
  Here it is a working implementation with the evident intended
  semantics: a per-camera low-resolution map (same pattern as
  `CameraPixelBias`, `models/color_calib.py:245-258`), bilinearly
  upsampled and composited behind the splats using the rasterizer's
  background transmittance, trained at lr=0.01
  (`garment_net.py:136`).

- blurred-noise background target: while the bg net warms up
  (iteration < train.enable_bg) or when `use_random_bg` is set, the
  ground-truth background region is replaced with 7x7-blurred uniform
  noise so it contributes zero expected gradient
  (`garment_net.py:201-203`, `trainer.py:113-126`).
"""

import jax
import jax.numpy as jnp


def init_background_model(
    n_cameras: int, image_height: int, image_width: int, ds_rate: int = 8
):
    """Per-camera [3, H/ds, W/ds] learnable background map, mid-gray
    init (the reference's BGModel init is unrecoverable — it was never
    committed; zeros would bias early training toward black)."""
    return {
        "bg": jnp.full(
            (n_cameras, 3, image_height // ds_rate, image_width // ds_rate),
            0.5,
            jnp.float32,
        )
    }


def apply_background(params, camera_idx, image_height: int, image_width: int):
    """-> [3, H, W] background map for the given camera."""
    lowres = params["bg"][camera_idx]  # [3, h/ds, w/ds]
    return jax.image.resize(
        lowres, (3, image_height, image_width), method="bilinear"
    )


def composite_background(pred_image, t_bg, bg_map, bg_color):
    """Swap the rasterizer's solid background for `bg_map`.

    The rasterizer returns `raw + T_bg * bg_color`; re-expressing with
    the returned background transmittance gives
    `raw + T_bg * bg_map = pred + T_bg * (bg_map - bg_color)` without a
    second rasterization. t_bg: [H, W]; bg_map: [3, H, W]; bg_color [3].
    """
    return pred_image + t_bg[None] * (bg_map - bg_color[:, None, None])


def _gaussian_kernel1d(ksize: int, sigma: float):
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def blurred_noise(rng, shape, ksize: int = 7):
    """7x7 Gaussian-blurred uniform noise — `gaussian_blur(rand_like(x),
    [7,7])` (`garment_net.py:202`; torchvision's default sigma for
    ksize=7 is 0.3*((7-1)*0.5 - 1) + 0.8 = 1.4). shape: [C, H, W]."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    noise = jax.random.uniform(rng, shape)
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    # separable blur over H then W (reflect padding, torchvision's
    # GaussianBlur default); channels ride the conv batch dim
    x = jnp.pad(noise, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    x = x[:, None]  # [C, 1, H+2p, W+2p]
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, ksize, 1), (1, 1), "VALID"
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 1, ksize), (1, 1), "VALID"
    )
    return x[:, 0]
