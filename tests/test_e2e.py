"""End-to-end smoke tests: synthetic training loop, checkpoint
round-trip, evaluation metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.data.synthetic import (
    build_synthetic_avatar,
    checkerboard,
    orbit_camera,
    synthetic_batch,
)
from d3ga_tpu.model.avatar import init_avatar
from d3ga_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
from d3ga_tpu.train.step import LossWeights, make_train_step


@pytest.fixture(scope="module")
def setup():
    h = w = 64
    model, skel, lbs_dim = build_synthetic_avatar(
        n_garments=1, n_gaussians=96, n_frames=4, n_cameras=2, n_joints=3
    )
    params = init_avatar(jax.random.PRNGKey(0), model)
    cam = orbit_camera(0.3, w, h)
    batch = synthetic_batch(cam, lbs_dim, h, w, frame_idx=1, camera_idx=0)
    return model, params, batch, (h, w)


class TestTrainLoop:
    def test_loss_decreases_on_checkerboard(self, setup):
        model, params, batch, _ = setup
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step = make_train_step(
            model, tx, max_per_tile=64,
            loss_weights=LossWeights(enable_vgg_from=0),
            donate=False,
        )
        opt_state = tx.init(params)
        p = params
        losses = []
        rng = jax.random.PRNGKey(1)
        for i in range(10):
            rng, sub = jax.random.split(rng)
            p, opt_state, metrics = step(p, opt_state, batch, sub, jnp.int32(i))
            losses.append(float(metrics["total_loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_metrics_structure(self, setup):
        model, params, batch, _ = setup
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step = make_train_step(model, tx, max_per_tile=64, donate=False)
        opt_state = tx.init(params)
        _, _, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(0), jnp.int32(0)
        )
        for key in ("color_loss", "sil_loss", "scale_loss", "fme_loss",
                    "total_loss", "psnr"):
            assert key in metrics


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        model, params, batch, _ = setup
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        opt_state = tx.init(params)
        run_dir = str(tmp_path)
        save_checkpoint(run_dir, 120, params, opt_state)
        p2, o2, step = restore_checkpoint(run_dir, params, opt_state)
        assert step == 120
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_restore_specific_step(self, setup, tmp_path):
        model, params, batch, _ = setup
        run_dir = str(tmp_path)
        save_checkpoint(run_dir, 10, params, None)
        bumped = jax.tree.map(lambda x: x + 1.0, params)
        save_checkpoint(run_dir, 20, bumped, None)
        p10, _, s10 = restore_checkpoint(run_dir, params, None, step=10)
        assert s10 == 10
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(p10)[0]),
            np.asarray(jax.tree.leaves(params)[0]),
        )
        p20, _, s20 = restore_checkpoint(run_dir, params, None)
        assert s20 == 20

    def test_params_only_restore_of_full_checkpoint(self, setup, tmp_path):
        # Eval restores with like_opt_state=None while the checkpoint
        # stores a full optimizer state: exercises the generic-restore
        # fallback (metadata-derived restore args; regression for the
        # orbax StepMetadata wrapper mismatch).
        model, params, batch, _ = setup
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        opt_state = tx.init(params)
        run_dir = str(tmp_path)
        save_checkpoint(run_dir, 7, params, opt_state)
        p2, o2, step = restore_checkpoint(run_dir, params, None)
        assert step == 7
        assert o2 is None
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


class TestEvaluate:
    def test_metrics_and_heatmap(self, setup):
        from d3ga_tpu.train.evaluate import (
            MetricAccumulator,
            build_pose_pca,
            compute_errors,
            compute_heatmap,
            project_pose_pca,
        )

        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
        noisy = jnp.clip(img + 0.05, 0, 1)
        m = compute_errors(img, noisy)
        assert 0 < m["ssim"] <= 1
        assert m["psnr"] > 20
        heat = compute_heatmap(img, noisy)
        assert heat.shape == (3, 32, 32)

        acc = MetricAccumulator()
        acc.add(m)
        acc.add(m)
        assert acc.mean()["psnr"] == pytest.approx(m["psnr"])

        poses = np.random.RandomState(0).randn(50, 87).astype(np.float32)
        pca = build_pose_pca(poses, 10)
        proj = project_pose_pca(pca, poses[0])
        assert proj.shape == (87,)

    def test_render_frame_eval_mode(self, setup):
        from d3ga_tpu.train.step import render_frame

        model, params, batch, (h, w) = setup
        terms, aux = render_frame(
            params, model, batch, jax.random.PRNGKey(0), training=False,
            max_per_tile=64,
        )
        assert aux["pred_image"].shape == (3, h, w)
        assert np.isfinite(float(sum(terms.values())))


class TestFusedSilhouette:
    def test_fused_matches_two_pass(self, setup):
        from d3ga_tpu.train.step import render_frame

        model, params, batch, _ = setup
        rng = jax.random.PRNGKey(4)
        # detach_silhouette=("none",) forces the two-pass path without
        # actually detaching anything -> must equal the fused pass.
        _, aux_fused = render_frame(
            params, model, batch, rng, training=True, max_per_tile=64,
        )
        _, aux_two = render_frame(
            params, model, batch, rng, training=True, max_per_tile=64,
            detach_silhouette=("none",),
        )
        np.testing.assert_allclose(
            np.asarray(aux_fused["pred_image"]),
            np.asarray(aux_two["pred_image"]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(aux_fused["pred_silhouette"]),
            np.asarray(aux_two["pred_silhouette"]), atol=1e-5,
        )


class TestBackgroundNetwork:
    def test_bg_net_trains_and_noise_gate(self):
        """`use_bg_network` wires a per-camera learnable background into
        the train step (`garment_net.py:196-204`, `trainer.py:113-126`):
        bg_net receives gradients, and before train.enable_bg the gt
        background region is blurred noise."""
        from d3ga_tpu.train.step import render_frame, total_loss

        h = w = 64
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=96, n_frames=4, n_cameras=2,
            n_joints=3,
            config_overrides={
                "use_bg_network": True,
                "use_background": True,
                "enable_bg": 5,
                "image_height": h,
                "image_width": w,
            },
        )
        params = init_avatar(jax.random.PRNGKey(0), model)
        assert "bg_net" in params
        cam = orbit_camera(0.3, w, h)
        batch = synthetic_batch(cam, lbs_dim, h, w, frame_idx=1, camera_idx=0)
        batch["orig_image"] = checkerboard(h, w) * 0.5 + 0.25
        # a real background region so the noise compositing is visible
        batch["alpha"] = batch["alpha"].at[:, :, : w // 2].set(0.0)

        def loss_fn(p, it):
            terms, aux = render_frame(
                p, model, batch, jax.random.PRNGKey(1), training=True,
                max_per_tile=64, iteration=jnp.int32(it),
            )
            return total_loss(terms), aux

        (l0, aux0), g = jax.value_and_grad(loss_fn, has_aux=True)(params, 0)
        assert np.isfinite(float(l0))
        # bg net sees gradient through the composited background
        assert float(jnp.abs(g["bg_net"]["bg"]).sum()) > 0
        # before enable_bg the gt is noise-composited; after it is orig
        _, aux_late = loss_fn(params, 10)
        gt_early = np.asarray(aux0["gt_image"])
        gt_late = np.asarray(aux_late["gt_image"])
        np.testing.assert_allclose(
            gt_late, np.asarray(batch["orig_image"]), atol=1e-6
        )
        assert np.abs(gt_early - gt_late).max() > 0.01

    def test_random_bg_gate(self):
        """`use_random_bg` composites blurred noise into the gt
        background at every iteration (`garment_net.py:201`)."""
        from d3ga_tpu.train.step import render_frame

        h = w = 64
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=96, n_frames=4, n_cameras=2,
            n_joints=3, config_overrides={"use_random_bg": True},
        )
        params = init_avatar(jax.random.PRNGKey(0), model)
        assert "bg_net" not in params
        cam = orbit_camera(0.3, w, h)
        batch = synthetic_batch(cam, lbs_dim, h, w, frame_idx=1, camera_idx=0)
        # alpha=1 everywhere -> noise must not change the gt; shrink it
        batch["alpha"] = batch["alpha"] * 0.0
        _, aux = render_frame(
            params, model, batch, jax.random.PRNGKey(1), training=True,
            max_per_tile=64, iteration=jnp.int32(100),
        )
        gt = np.asarray(aux["gt_image"])
        # gt is now pure blurred noise (alpha=0): smooth, in [0,1]
        assert gt.min() >= 0.0 and gt.max() <= 1.0
        assert 0.3 < gt.mean() < 0.7
