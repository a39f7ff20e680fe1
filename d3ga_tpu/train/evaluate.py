"""Evaluation: render held-out frames, compute SSIM/PSNR/(V)LPIPS,
write error reports — the library core behind test.py.

Mirrors `/root/reference/test.py:59-343` + `recorder/heatmap.py:37-61`:
restore checkpoint, optionally project test poses through a PCA built
over the *optimized* training poses (sklearn, 30 components, clamped at
2 sigma), render each test frame with mean embeddings, accumulate
metrics, dump error text files and heatmaps.

LPIPS note: pretrained weights cannot be shipped (zero egress). Three
distinct perceptual metrics, named so they cannot be confused:
  - "lpips"        — the TRUE LPIPS-VGG head (`train/lpips.py`), only
                     when `train.lpips_weights_path` points at an npz
                     exported by tools/export_lpips.py. Comparable to
                     published numbers / the reference's errors_*.txt.
  - "vgg_dist"     — 5-layer VGG19 feature L1 with PRETRAINED weights
                     (train.vgg_weights_path). Not LPIPS, but a real
                     perceptual distance.
  - "randvgg_dist" — the same with the seeded RANDOM VGG fallback. A
                     consistent monotone proxy for this repo only; NOT
                     comparable to anything published.
"""

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.train.losses import psnr as psnr_fn
from d3ga_tpu.train.losses import ssim as ssim_fn
from d3ga_tpu.train.losses import _vgg_forward_features


def build_pose_pca(poses: np.ndarray, n_components: int = 30):
    """PCA over optimized pose vectors (`/root/reference/utils/pca_utils.py:14`)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=min(n_components, poses.shape[0], poses.shape[1]))
    pca.fit(poses)
    return pca


def project_pose_pca(pca, pose: np.ndarray, sigma_pca: float = 2.0) -> np.ndarray:
    """Clamp a test pose to the training pose manifold
    (`/root/reference/test.py:49-56`)."""
    low = pca.transform(pose.reshape(1, -1))
    std = np.sqrt(pca.explained_variance_)
    low = np.clip(low, -sigma_pca * std, sigma_pca * std)
    return pca.inverse_transform(low)[0]


def vgg_distance(vgg_params, pred, gt):
    pf = _vgg_forward_features(vgg_params, pred[None])
    gf = _vgg_forward_features(vgg_params, gt[None])
    d = 0.0
    for a, b in zip(pf, gf):
        d = d + float(jnp.mean(jnp.abs(a - b)))
    return d


def vgg_metric_name(vgg_params) -> str:
    """"vgg_dist" with pretrained weights; "randvgg_dist" with the
    random fallback (NOT comparable to LPIPS or any published number)."""
    return "vgg_dist" if vgg_params.get("pretrained") else "randvgg_dist"


def compute_errors(
    gt, pred, vgg_params=None, mask=None, lpips_params=None
) -> Dict[str, float]:
    """SSIM / PSNR (+ perceptual distances, see module docstring) for
    [3, H, W] images in [0, 1]
    (`/root/reference/recorder/heatmap.py:37-49`). With a pixel_valid
    mask (canvas-padded capture frames) SSIM/PSNR average over real
    pixels only."""
    if mask is not None:
        from d3ga_tpu.train.losses import masked_psnr, masked_ssim

        out = {
            "ssim": float(masked_ssim(pred, gt, mask)),
            "psnr": float(masked_psnr(pred, gt, mask)),
        }
    else:
        out = {
            "ssim": float(ssim_fn(pred, gt)),
            "psnr": float(psnr_fn(pred, gt)),
        }
    if vgg_params is not None:
        out[vgg_metric_name(vgg_params)] = vgg_distance(vgg_params, pred, gt)
    if lpips_params is not None:
        from d3ga_tpu.train.lpips import lpips_vgg

        out["lpips"] = float(lpips_vgg(lpips_params, pred, gt))
    return out


def compute_heatmap(gt, pred):
    """Jet-style L2-error heatmap [3, H, W]
    (`/root/reference/recorder/heatmap.py:52-61`)."""
    err = jnp.linalg.norm(gt - pred, axis=0)
    err = jnp.clip(err / jnp.maximum(jnp.percentile(err, 99), 1e-6), 0, 1)
    # simple jet colormap
    r = jnp.clip(1.5 - jnp.abs(4 * err - 3), 0, 1)
    g = jnp.clip(1.5 - jnp.abs(4 * err - 2), 0, 1)
    b = jnp.clip(1.5 - jnp.abs(4 * err - 1), 0, 1)
    return jnp.stack([r, g, b])


class MetricAccumulator:
    def __init__(self):
        self.rows: List[Dict[str, float]] = []

    def add(self, metrics: Dict[str, float]):
        self.rows.append(metrics)

    def mean(self) -> Dict[str, float]:
        if not self.rows:
            return {}
        keys = self.rows[0].keys()
        return {k: float(np.mean([r[k] for r in self.rows])) for k in keys}

    def write(self, path: str, trajectory: str = "test"):
        """errors_{trajectory}.txt in the reference's format
        (`/root/reference/test.py:200-206`)."""
        m = self.mean()
        with open(path, "w") as f:
            for k, v in m.items():
                f.write(f"{k}: {v:.6f}\n")
        return m


def save_image_png(path, img):
    """img: [3, H, W] float [0,1] -> png (PIL, host-side)."""
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)
