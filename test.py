"""Evaluation CLI: python test.py <config.yml> [iteration]

TPU-native counterpart of `/root/reference/test.py`: restores the
latest (or requested) checkpoint, mines the optimized per-frame
SMPL-X elements from it (`test.py:277-297` save_optimized_elements),
builds a PCA over the optimized training poses and projects every test
pose onto it (30 comps, 2 sigma clamp, `test.py:49-56,88-92`), then
renders two trajectories (`test.py:300-343` + `globus.py`):

  cam_test — the held-out camera over test frames, with ground truth,
             per-frame grid/prediction/heatmap images and
             errors_cam_test.txt;
  cam_360  — a 360-degree orbit around the body at a fixed pose
             (no ground truth on captures; the synthetic task scores it
             against the teacher), errors_cam_360.txt.

Note on the PCA projection: the reference assigns the projected pose to
`frame["lbs"]`, which for SMPL-X captures is shadowed by
`batch["smplx"]` in both the geometry and conditioning paths
(`models/cage_net.py:173,192`) — i.e. the projection never takes
effect there. Here the projected pose replaces BOTH the conditioning
and the skinning pose, which is the evident intent.
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
from d3ga_tpu.globus import CAM_360, CAM_TEST

enable_compile_cache()


def save_optimized_elements(params, dst):
    """Mine the optimized per-frame elements from the restored params
    (`/root/reference/test.py:277-297`)."""
    out = {}
    for key, name in (
        ("optimizable_poses", "poses"),
        ("optimizable_rotations", "rotations"),
        ("optimizable_translations", "translations"),
    ):
        if key in params:
            out[name] = np.asarray(params[key])
    if out:
        np.savez(dst, **out)
        logger.info(f"Saved optimized elements ({list(out)}) to {dst}")
    return out


def build_pca_pillow(params, n_components=30):
    """PCA over the mined optimized poses (`test.py:264-274`)."""
    if "optimizable_poses" not in params:
        return None
    from d3ga_tpu.train.evaluate import build_pose_pca

    poses = np.asarray(params["optimizable_poses"])
    logger.info(f"Restored {len(poses)} refined poses for PCA building!")
    return build_pose_pca(poses, n_components=n_components)


def project_batch_pose(pca, batch):
    """Clamp the frame's pose to the optimized-pose manifold."""
    if pca is None:
        return batch
    from d3ga_tpu.train.evaluate import project_pose_pca

    key = "smplx_poses" if "smplx_poses" in batch else "lbs"
    proj = project_pose_pca(pca, np.asarray(batch[key]), sigma_pca=2.0)
    out = dict(batch)
    out[key] = jnp.asarray(proj, jnp.float32)
    if key == "smplx_poses":
        out["lbs"] = out["smplx_poses"]
    return out


def orbit_c2w(base_c2w, angle):
    """Rotate a camera-to-world pose about the body-frame y axis (the
    body sits at the origin of the body-centric frame, so this orbits
    the avatar — `globus.py` CAM_360)."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c], ], np.float64)
    M = np.eye(4)
    M[:3, :3] = R
    return M @ np.asarray(base_c2w, np.float64)


def make_output_dirs(render_path):
    for sub in ("grid", "ground_truth", "prediction", "heatmap"):
        os.makedirs(os.path.join(render_path, sub), exist_ok=True)


def evaluate(config, iteration=None):
    from d3ga_tpu.model.avatar import init_avatar
    from d3ga_tpu.raster.camera import Camera, camera_from_c2w
    from d3ga_tpu.train.checkpoint import restore_checkpoint
    from d3ga_tpu.train.evaluate import (
        MetricAccumulator,
        compute_heatmap,
        save_image_png,
    )
    from d3ga_tpu.train.losses import (
        init_vgg19_features,
        masked_psnr,
        masked_ssim,
    )
    from d3ga_tpu.train.losses import psnr as psnr_fn
    from d3ga_tpu.train.losses import ssim as ssim_fn
    from d3ga_tpu.train.step import render_frame

    tcfg = config.get("train", {})
    run_dir = tcfg.get("run_dir", "experiments/run")

    dataset_name = config.get("dataset_name", "synthetic")
    teacher_render = None
    if dataset_name == "synthetic":
        model, frames, teacher_render = build_synthetic(
            config, split="test", return_teacher=True
        )
    else:
        from d3ga_tpu.data.capture_builder import build_capture_training

        model, frames = build_capture_training(config, eval=True)

    params = init_avatar(jax.random.PRNGKey(tcfg.get("seed", 17)), model)
    params, _, step_restored = restore_checkpoint(run_dir, params, None, step=iteration)
    logger.info(f"Restored checkpoint at step {step_restored}")

    # optimized-element mining + pose PCA (`test.py:264-297`)
    save_optimized_elements(params, os.path.join(run_dir, "optimized_poses.npz"))
    pca = build_pca_pillow(params, n_components=30)

    vgg_params = None
    if tcfg.get("vgg_weights_path"):
        vgg_params = init_vgg19_features(weights_path=tcfg["vgg_weights_path"])
    lpips_params = None
    if tcfg.get("lpips_weights_path"):
        from d3ga_tpu.train.lpips import init_lpips

        lpips_params = init_lpips(tcfg["lpips_weights_path"])

    cinema = os.path.join(run_dir, f"cinema_{step_restored:06d}")
    max_per_tile = tcfg.get("max_per_tile", 256)

    @jax.jit
    def eval_frame(params, batch, rng):
        terms, aux = render_frame(
            params, model, batch, rng, training=False, max_per_tile=max_per_tile,
        )
        pred = jnp.clip(aux["pred_image"], 0, 1)
        gt = jnp.clip(aux["gt_image"], 0, 1)
        if "pixel_valid" in batch:
            # canvas-padded capture frames: average only over real
            # pixels — padded zeros match exactly on both sides and
            # would inflate PSNR (and bias SSIM toward 1)
            m = batch["pixel_valid"]
            metrics = {
                "ssim": masked_ssim(pred, gt, m),
                "psnr": masked_psnr(pred, gt, m),
            }
        else:
            metrics = {"ssim": ssim_fn(pred, gt), "psnr": psnr_fn(pred, gt)}
        return pred, gt, compute_heatmap(gt, pred), metrics

    pool = ThreadPoolExecutor(max_workers=8)

    def run_trajectory(traj, batches):
        render_path = os.path.join(cinema, traj)
        make_output_dirs(render_path)
        acc = MetricAccumulator()
        for i, batch in enumerate(batches):
            batch = project_batch_pose(pca, batch)
            has_gt = batch.get("image") is not None
            if not has_gt:  # orbit frames on captures have no GT
                batch = dict(
                    batch,
                    image=jnp.zeros(
                        (3, batch["camera"].height, batch["camera"].width),
                        jnp.float32,
                    ),
                )
            pred, gt, heat, metrics = eval_frame(
                params, batch, jax.random.PRNGKey(i)
            )
            if "crop" in batch:
                # canvas-padded capture frames: write image-size crops
                # like the reference's paste (`renderer.py:36-47`)
                from d3ga_tpu.raster.api import paste_from_canvas

                pred, gt, heat = (
                    paste_from_canvas(x, batch["crop"]) for x in (pred, gt, heat)
                )
            pool.submit(
                save_image_png,
                os.path.join(render_path, "prediction", f"{i:05d}.png"),
                np.asarray(pred),
            )
            if has_gt:
                metrics = {k: float(v) for k, v in metrics.items()}
                if vgg_params is not None:
                    from d3ga_tpu.train.evaluate import (
                        vgg_distance,
                        vgg_metric_name,
                    )

                    metrics[vgg_metric_name(vgg_params)] = vgg_distance(
                        vgg_params, pred, gt
                    )
                if lpips_params is not None:
                    from d3ga_tpu.train.lpips import lpips_vgg

                    metrics["lpips"] = float(lpips_vgg(lpips_params, pred, gt))
                acc.add(metrics)
                grid = jnp.concatenate([gt, pred, heat], axis=2)
                pool.submit(
                    save_image_png,
                    os.path.join(render_path, "grid", f"{i:05d}.png"),
                    np.asarray(grid),
                )
                if traj != CAM_360:
                    pool.submit(
                        save_image_png,
                        os.path.join(render_path, "ground_truth", f"{i:05d}.png"),
                        np.asarray(gt),
                    )
                pool.submit(
                    save_image_png,
                    os.path.join(render_path, "heatmap", f"{i:05d}.png"),
                    np.asarray(heat),
                )
                logger.info(
                    f"[{traj}] frame {i}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                )
        mean = acc.write(
            os.path.join(run_dir, f"errors_{traj}.txt"), trajectory=traj
        )
        logger.info(f"[{traj}] mean: {mean}")
        write_video(
            os.path.join(render_path, "prediction"),
            os.path.join(cinema, f"{traj}.mp4"),
        )
        return mean

    # --- cam_test: held-out camera with ground truth --------------------
    n_eval = int(config.get("n_eval_frames", 8))
    test_batches = (next(frames) for _ in range(n_eval))
    mean_test = run_trajectory(CAM_TEST, test_batches)

    # --- cam_360: orbit at a fixed pose ---------------------------------
    n_360 = int(config.get("n_360_frames", 24))
    base = next(frames) if dataset_name != "synthetic" else None

    def orbit_batches():
        if dataset_name == "synthetic":
            from d3ga_tpu.data.synthetic import orbit_camera

            h = config.get("image_height", 128)
            w = config.get("image_width", 128)
            pose = jax.random.normal(jax.random.PRNGKey(0), (model.cond_dim,)) * 0.1
            for i in range(n_360):
                cam = orbit_camera(2 * np.pi * i / n_360, w, h)
                img, alpha, sil = teacher_render(
                    pose, cam, jnp.int32(0), jnp.int32(0)
                )
                yield {
                    "camera": cam,
                    "lbs": pose,
                    "frame_idx": jnp.int32(0),
                    "camera_idx": jnp.int32(0),
                    "image": jnp.clip(img, 0, 1),
                    "alpha": jnp.clip(alpha, 0, 1)[None],
                    "silhouette": jnp.clip(sil, 0, 1),
                }
        else:
            cam0: Camera = base["camera"]
            base_c2w = np.linalg.inv(np.asarray(cam0.world_view, np.float64))
            zero = jnp.zeros_like(base["image"])
            for i in range(n_360):
                c2w = orbit_c2w(base_c2w, 2 * np.pi * i / n_360)
                cam = camera_from_c2w(
                    jnp.asarray(c2w, jnp.float32), cam0.tanfovx, cam0.tanfovy,
                    cam0.width, cam0.height,
                )
                out = dict(base, camera=cam)
                # no ground truth on an orbit — neutral targets keep the
                # jitted eval graph shape; metrics are skipped
                out["image"] = None
                out["alpha"] = jnp.ones_like(base["alpha"])
                out["silhouette"] = zero
                yield out

    mean_360 = run_trajectory(CAM_360, orbit_batches())

    pool.shutdown(wait=True)
    # legacy single-file report location
    if mean_test:
        with open(os.path.join(run_dir, "errors_test.txt"), "w") as f:
            for k, v in mean_test.items():
                f.write(f"{k}: {v:.6f}\n")
    return mean_test, mean_360


def write_video(frame_dir, out_path, fps=30, pattern="*.png"):
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
    # the reference disables these heads at eval (`test.py:330-335`)
    config.setdefault("train", {})
    config["train"]["use_blur"] = False
    config["train"]["use_pixel_cal"] = False
    it = int(sys.argv[2]) if len(sys.argv) > 2 else None
    evaluate(config, it)
