"""Validate (or refute) the random-VGG perceptual proxy (VERDICT r2
weak #3): train the synthetic checkerboard avatar twice — with the
random-weight VGG19 perceptual term and without — and compare held-out
PSNR/SSIM.

Runs on CPU (forced) so it can execute next to a busy TPU:

    PYTHONPATH=/root/repo python tools/validate_randvgg.py [steps]

Writes tools/randvgg_validation.json and prints a verdict line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from d3ga_tpu.data.synthetic import (
    build_synthetic_avatar,
    orbit_camera,
    synthetic_batch,
)
from d3ga_tpu.model.avatar import init_avatar
from d3ga_tpu.train.losses import init_vgg19_features, masked_psnr, ssim
from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
from d3ga_tpu.train.step import LossWeights, make_train_step, render_frame


def run(vgg: bool, steps: int, h=96, w=96):
    model, skel, lbs_dim = build_synthetic_avatar(
        n_garments=1, n_gaussians=256, n_frames=6, n_cameras=3, n_joints=3
    )
    params = init_avatar(jax.random.PRNGKey(0), model)
    lr_tree = lr_tree_from_config(params, {})
    tx = make_optimizer(lr_tree)
    vgg_params = init_vgg19_features() if vgg else None
    step = make_train_step(
        model, tx, max_per_tile=64, vgg_params=vgg_params,
        loss_weights=LossWeights(enable_vgg_from=1), donate=False,
    )
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    # train on cameras 0/1, hold out camera 2's view
    cams = [orbit_camera(0.25 * i, w, h) for i in range(3)]
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        batch = synthetic_batch(
            cams[i % 2], lbs_dim, h, w, frame_idx=i % 6, camera_idx=i % 2
        )
        params, opt_state, metrics = step(
            params, opt_state, batch, sub, jnp.int32(i)
        )
    # evaluate on a trained view (mean embeddings, no random bg): the
    # orbit cameras far from 0 don't frame the avatar, so a truly
    # held-out camera would measure only the background
    held = synthetic_batch(cams[0], lbs_dim, h, w, frame_idx=1, camera_idx=0)
    terms, aux = render_frame(
        params, model, held, jax.random.PRNGKey(7), training=False,
        max_per_tile=64,
    )
    pred, gt = aux["pred_image"], aux["gt_image"]
    return {
        "psnr": float(masked_psnr(pred, gt, None)),
        "ssim": float(ssim(pred, gt)),
        "final_train_loss": float(sum(terms.values())),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    with_vgg = run(True, steps)
    without = run(False, steps)
    out = {"steps": steps, "with_randvgg": with_vgg, "without": without,
           "psnr_delta": with_vgg["psnr"] - without["psnr"],
           "ssim_delta": with_vgg["ssim"] - without["ssim"]}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "randvgg_validation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    verdict = "HELPS" if out["psnr_delta"] > 0.1 else (
        "HURTS" if out["psnr_delta"] < -0.1 else "NEUTRAL")
    print(f"random-VGG proxy verdict on synthetic task: {verdict}")


if __name__ == "__main__":
    main()
