"""Validate (or refute) the random-VGG perceptual proxy in a CONVERGED
regime (VERDICT r3 weak #3 — the earlier 300-step checkerboard run sat
at noise-floor PSNR ~4.4 and decided nothing).

Protocol: the teacher-student synthetic task from train.py's
`build_synthetic` (a hidden teacher avatar renders the ground truth, so
the losses are actually minimizable — the smoke config reaches PSNR
high-20s within tens of steps), trained STEPS times with and without
the random-weight VGG19 term (same seeds, same batches), then evaluated
on the HELD-OUT last camera over all frames.

Runs on CPU (forced) so it can execute next to a busy TPU:

    PYTHONPATH=/root/repo python tools/validate_randvgg.py [steps]

Writes tools/randvgg_validation.json and prints a verdict line. The
decision rule (recorded in the json): keep the proxy only if held-out
PSNR improves by > 0.25 dB in the converged regime; otherwise cut it
and leave the weight-driven true-VGG/LPIPS path
(`tools/export_vgg19.py`, `train/lpips.py`) as the only perceptual
machinery.
"""

import json
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _config(h=64, w=64):
    return {
        "capture_id": "SYNTH_RANDVGG",
        "dataset_name": "synthetic",
        "image_height": h,
        "image_width": w,
        "n_garments": 2,
        "n_gaussians": 256,
        "n_frames": 8,
        "n_cameras": 4,          # 3 train + 1 held out
        "cage_res": 2,
        "train": {"max_per_tile": 64, "use_color_calib": True},
    }


def run(vgg: bool, steps: int):
    from d3ga_tpu.model.avatar import init_avatar
    from d3ga_tpu.train.losses import init_vgg19_features, masked_psnr, ssim
    from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
    from d3ga_tpu.train.step import LossWeights, make_train_step, render_frame

    train_mod = runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "train.py"),
        run_name="not_main",
    )
    cfg = _config()
    model, frames = train_mod["build_synthetic"](cfg)

    params = init_avatar(jax.random.PRNGKey(0), model)
    lr_tree = lr_tree_from_config(params, {})
    tx = make_optimizer(lr_tree)
    vgg_params = init_vgg19_features(allow_random=True) if vgg else None
    lw = LossWeights(enable_vgg_from=1)
    step = make_train_step(
        model, tx, max_per_tile=64, vgg_params=vgg_params,
        loss_weights=lw, donate=False,
    )
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    last = None
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        batch = next(frames)
        params, opt_state, metrics = step(
            params, opt_state, batch, sub, jnp.int32(i)
        )
        last = metrics
        if (i + 1) % 500 == 0:
            print(
                f"  [{'with' if vgg else 'without'}] step {i + 1}: "
                f"psnr={float(metrics['psnr']):.2f}",
                flush=True,
            )

    # held-out camera, all frames, deterministic eval (mean embeddings)
    _, test_frames = train_mod["build_synthetic"](cfg, split="test")
    psnrs, ssims = [], []
    for fi in range(model.n_frames):
        held = next(test_frames)
        terms, aux = render_frame(
            params, model, held, jax.random.PRNGKey(7), training=False,
            max_per_tile=64,
        )
        psnrs.append(float(masked_psnr(aux["pred_image"], aux["gt_image"], None)))
        ssims.append(float(ssim(aux["pred_image"], aux["gt_image"])))
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "train_psnr": float(last["psnr"]),
        "final_train_loss": float(last["total_loss"]),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    with_vgg = run(True, steps)
    without = run(False, steps)
    out = {
        "steps": steps,
        "task": "teacher-student synthetic (held-out camera eval)",
        "with_randvgg": with_vgg,
        "without": without,
        "psnr_delta": with_vgg["psnr"] - without["psnr"],
        "ssim_delta": with_vgg["ssim"] - without["ssim"],
        "decision_rule": "keep only if held-out psnr_delta > 0.25 dB",
    }
    verdict = "KEEP" if out["psnr_delta"] > 0.25 else "CUT"
    out["verdict"] = verdict
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "randvgg_validation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"random-VGG proxy verdict on the converged synthetic task: {verdict}")


if __name__ == "__main__":
    main()
