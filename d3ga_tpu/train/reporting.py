"""Training observability: scalar logs + progress image grids.

Counterpart of `/root/reference/train.py:285-382` (TensorBoard scalars
every log_n_steps, progress grids every log_progress_n_steps with
GT/prediction/heatmap/silhouettes/means3D/cage views, means3D PLY
dumps). Scalars go to run_dir/metrics.jsonl (TensorBoard-free); grids
and point clouds are written with PIL / the PLY writer.
"""

import json
import os
import time
from typing import Dict

import numpy as np

from d3ga_tpu.utils.log import logger


class MetricsLogger:
    """metrics.jsonl writer + optional TensorBoard mirror
    (`/root/reference/train.py:44,293-296` SummaryWriter)."""

    def __init__(self, run_dir: str, tb_dir: str = None):
        self.path = os.path.join(run_dir, "metrics.jsonl")
        os.makedirs(run_dir, exist_ok=True)
        self._fh = open(self.path, "a")
        self._tb = None
        if tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tb_dir)
            except Exception:
                pass  # tensorboard not installed; jsonl is authoritative

    def log(self, step: int, metrics: Dict[str, float]):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def _to_u8(img):
    """[3, H, W] float -> [H, W, 3] uint8."""
    arr = np.clip(np.asarray(img), 0, 1)
    return (arr.transpose(1, 2, 0) * 255).astype(np.uint8)


def _label(img_u8, text):
    try:
        import cv2

        out = np.ascontiguousarray(img_u8)
        cv2.putText(out, text, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 0, 0), 1, cv2.LINE_AA)
        return out
    except Exception:
        return img_u8


def write_progress_grid(
    run_dir: str,
    iteration: int,
    frame_id,
    camera_id,
    pred_image,
    gt_image,
    pred_sil=None,
    gt_sil=None,
    heatmap=None,
    extra=None,
):
    """Two-row comparison grid like `train.py:344-371`."""
    from PIL import Image

    top = [_label(_to_u8(gt_image), "Ground truth")]
    bottom = [_label(_to_u8(pred_image), "Prediction")]
    if heatmap is not None:
        top.append(_label(_to_u8(heatmap), "Heatmap"))
    if gt_sil is not None:
        top.append(_label(_to_u8(gt_sil), "GT sil"))
    if pred_sil is not None:
        bottom.append(_label(_to_u8(pred_sil), "Pred sil"))
    for name, img in (extra or {}).items():
        bottom.append(_label(_to_u8(img), name))

    width = max(len(top), len(bottom))
    h, w, _ = top[0].shape
    blank = np.full((h, w, 3), 255, np.uint8)
    top += [blank] * (width - len(top))
    bottom += [blank] * (width - len(bottom))
    grid = np.concatenate(
        [np.concatenate(top, axis=1), np.concatenate(bottom, axis=1)], axis=0
    )
    out_dir = os.path.join(run_dir, "progress")
    os.makedirs(out_dir, exist_ok=True)
    name = f"{iteration:06d}_{int(frame_id):06d}_{camera_id}.png"
    Image.fromarray(grid).save(os.path.join(out_dir, name))


def dump_means3d(run_dir: str, iteration: int, frame_id, means3d, rgb=None):
    """Colored point-cloud dump (`train.py:378-382`)."""
    from d3ga_tpu.utils.ply import save_ply

    out_dir = os.path.join(run_dir, "means3D")
    os.makedirs(out_dir, exist_ok=True)
    colors = None
    if rgb is not None:
        colors = np.clip(np.nan_to_num(np.asarray(rgb)) * 255, 0, 255)
    save_ply(
        os.path.join(out_dir, f"{iteration:06d}_{int(frame_id):06d}.ply"),
        np.asarray(means3d),
        colors=colors,
    )
