"""Evaluation CLI: python test.py <config.yml> [iteration]

TPU-native counterpart of `/root/reference/test.py`: restores the
latest (or requested) checkpoint, renders the held-out split with mean
embeddings, writes per-frame renders + error heatmaps and the
`errors_{trajectory}.txt` metric report.
"""

import os
import sys
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.utils.log import logger

from train import build_synthetic, load_config
from d3ga_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def evaluate(config, iteration=None):
    from d3ga_tpu.model.avatar import init_avatar
    from d3ga_tpu.train.checkpoint import restore_checkpoint
    from d3ga_tpu.train.evaluate import (
        MetricAccumulator,
        compute_errors,
        compute_heatmap,
        save_image_png,
    )
    from d3ga_tpu.train.losses import init_vgg19_features
    from d3ga_tpu.train.step import LossWeights, render_frame

    tcfg = config.get("train", {})
    run_dir = tcfg.get("run_dir", "experiments/run")
    out_dir = os.path.join(run_dir, "test")
    os.makedirs(out_dir, exist_ok=True)

    dataset_name = config.get("dataset_name", "synthetic")
    if dataset_name == "synthetic":
        model, frames = build_synthetic(config)
    else:
        from d3ga_tpu.data.capture_builder import build_capture_training

        model, frames = build_capture_training(config, eval=True)

    params = init_avatar(jax.random.PRNGKey(tcfg.get("seed", 17)), model)
    params, _, step_restored = restore_checkpoint(run_dir, params, None, step=iteration)
    logger.info(f"Restored checkpoint at step {step_restored}")

    # VGG distance only when pretrained weights exist (the random-init
    # fallback is a training-loss proxy, not a meaningful eval metric).
    vgg_params = None
    if tcfg.get("vgg_weights_path"):
        vgg_params = init_vgg19_features(weights_path=tcfg["vgg_weights_path"])

    acc = MetricAccumulator()
    pool = ThreadPoolExecutor(max_workers=8)
    n_eval = int(config.get("n_eval_frames", 8))

    import functools

    from d3ga_tpu.train.losses import psnr as psnr_fn
    from d3ga_tpu.train.losses import ssim as ssim_fn

    @jax.jit
    def eval_frame(params, batch, rng):
        terms, aux = render_frame(
            params, model, batch, rng, training=False,
            max_per_tile=tcfg.get("max_per_tile", 256),
        )
        pred = jnp.clip(aux["pred_image"], 0, 1)
        gt = jnp.clip(aux["gt_image"], 0, 1)
        metrics = {"ssim": ssim_fn(pred, gt), "psnr": psnr_fn(pred, gt)}
        return pred, gt, compute_heatmap(gt, pred), metrics

    for i in range(n_eval):
        batch = next(frames)
        pred, gt, heat, metrics = eval_frame(params, batch, jax.random.PRNGKey(i))
        metrics = {k: float(v) for k, v in metrics.items()}
        if vgg_params is not None:
            from d3ga_tpu.train.evaluate import vgg_distance

            metrics["vgg_dist"] = vgg_distance(vgg_params, pred, gt)
        acc.add(metrics)
        fid = int(batch.get("frame_idx", i))
        pool.submit(save_image_png, os.path.join(out_dir, f"{fid:06d}_pred.png"), np.asarray(pred))
        pool.submit(save_image_png, os.path.join(out_dir, f"{fid:06d}_gt.png"), np.asarray(gt))
        pool.submit(save_image_png, os.path.join(out_dir, f"{fid:06d}_heat.png"), np.asarray(heat))
        logger.info(f"frame {fid}: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    pool.shutdown(wait=True)
    mean = acc.write(os.path.join(run_dir, "errors_test.txt"))
    logger.info(f"mean: {mean}")
    write_video(out_dir, os.path.join(run_dir, "test.mp4"))
    return mean


def write_video(frame_dir, out_path, fps=30, pattern="*_pred.png"):
    """Assemble prediction frames into an mp4 (`test.py:208-217`);
    silently skipped when ffmpeg is unavailable in the image."""
    import glob
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        logger.warning("ffmpeg not available; skipping video export")
        return
    frames = sorted(glob.glob(os.path.join(frame_dir, pattern)))
    if not frames:
        return
    list_file = os.path.join(frame_dir, "frames.txt")
    with open(list_file, "w") as f:
        for fr in frames:
            f.write(f"file '{os.path.abspath(fr)}'\nduration {1.0/fps}\n")
    subprocess.run(
        ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", list_file,
         "-pix_fmt", "yuv420p", out_path],
        check=False, capture_output=True,
    )


if __name__ == "__main__":
    config = load_config(sys.argv[1])
    it = int(sys.argv[2]) if len(sys.argv) > 2 else None
    evaluate(config, it)
