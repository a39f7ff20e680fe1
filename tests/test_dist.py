"""Distributed tests on the virtual 8-device CPU mesh: sharded raster
must match single-device bit-for-bit (same math, same order), and
gradients must flow through the collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_raster import random_scene, simple_camera

from d3ga_tpu.dist.mesh import make_mesh
from d3ga_tpu.dist.raster_shard import rasterize_sharded
from d3ga_tpu.raster.tiles import rasterize_tiled


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(data=1, model=4)


class TestShardedRaster:
    def test_matches_single_device(self, mesh4):
        cam = simple_camera(w=80, h=64)
        key = jax.random.PRNGKey(0)
        means, scales, rots, opac, colors = random_scene(key, n=203)  # not divisible by 4
        bg = jnp.array([0.3, 0.2, 0.1])
        ref, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=256,
        )
        img, overflow = rasterize_sharded(
            mesh4, means, cam, bg, scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=256,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)

    def test_dupsort_selection_matches_single_device(self, mesh4):
        # tile-level dup-sort selection inside shard_map must agree with
        # the single-device image (all-tile lists computed per shard,
        # tile_ids slicing).
        cam = simple_camera(w=80, h=64)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(5), n=150)
        bg = jnp.array([0.3, 0.2, 0.1])
        ref, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=256,
        )
        img, _ = rasterize_sharded(
            mesh4, means, cam, bg, scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=256,
            coarse="dupsort_tile", dup=8,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)

    def test_gradients_flow_through_collectives(self, mesh4):
        cam = simple_camera(w=48, h=32)
        key = jax.random.PRNGKey(1)
        means, scales, rots, opac, colors = random_scene(key, n=64)
        bg = jnp.zeros(3)

        def loss_sharded(m):
            img, _ = rasterize_sharded(
                mesh4, m, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=128,
            )
            return jnp.sum(img**2)

        def loss_single(m):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=128,
            )
            return jnp.sum(img**2)

        # NOTE: the sharded path must run under jit — eager shard_map
        # linearization trips an XLA sharding-override assertion in
        # jax 0.9 (jit is the production path regardless).
        # Tolerance: the cumsum matmul runs at HIGH precision (3-pass
        # bf16) and the sharded path groups tiles differently, so
        # accumulation order differs at the ~1e-3 relative level.
        g1 = jax.jit(jax.grad(loss_sharded))(means)
        g2 = jax.grad(loss_single)(means)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-3, atol=5e-4)

    def test_jit_compiles(self, mesh4):
        cam = simple_camera(w=32, h=32)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(2), n=40)

        @jax.jit
        def run(m):
            img, _ = rasterize_sharded(
                mesh4, m, cam, jnp.zeros(3), scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=64,
            )
            return img

        img = run(means)
        assert img.shape == (3, 32, 32)
        assert bool(jnp.all(jnp.isfinite(img)))


class TestShardedTrainStep:
    def test_one_step_runs_and_is_finite(self):
        import numpy as np

        from d3ga_tpu.data.synthetic import (
            build_synthetic_avatar,
            checkerboard,
            orbit_camera,
        )
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
        )
        from d3ga_tpu.model.avatar import init_avatar
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer

        mesh = make_mesh(data=2, model=4)
        h = w = 48
        batch_size = 2
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3
        )
        geoms = {g.name: g.geometry for g in model.garments}
        params = pad_params_for_shards(init_avatar(jax.random.PRNGKey(0), model), 4)
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step, shard_batch, shard_params = make_sharded_train_step(
            model, tx, mesh, geoms, (h, w), batch_size, max_per_tile=32
        )
        cams = [orbit_camera(0.3 * i, w, h) for i in range(batch_size)]
        board = checkerboard(h, w)
        batch = shard_batch({
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([c.tanfovx for c in cams]),
            "tanfovy": jnp.stack([c.tanfovy for c in cams]),
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (batch_size, lbs_dim)) * 0.1,
            "frame_idx": jnp.arange(batch_size, dtype=jnp.int32),
            "camera_idx": jnp.zeros(batch_size, jnp.int32),
            "image": jnp.stack([board] * batch_size),
            "alpha": jnp.ones((batch_size, 1, h, w)),
            "silhouette": jnp.full((batch_size, 3, h, w), 0.5),
        })
        params = shard_params(params)
        opt_state = tx.init(params)
        # copy a leaf before the step donates the param buffers (use a
        # garment leaf — camera 0 is the identity calib camera and gets
        # no calibration gradient by design)
        l0 = np.asarray(params["garments"]["body"]["colors_feat"]).copy()
        p2, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(2), jnp.int32(0)
        )
        assert np.isfinite(float(metrics["total_loss"]))
        # params actually changed
        l1 = np.asarray(p2["garments"]["body"]["colors_feat"])
        assert not np.allclose(l0, l1)


class TestShardedLossParity:
    def test_sharded_loss_matches_single_device(self):
        """The sharded step's psum'd loss must equal the same objective
        computed on one device (same frames, same per-frame rng)."""
        import numpy as np

        from d3ga_tpu.data.synthetic import (
            build_synthetic_avatar,
            checkerboard,
            orbit_camera,
        )
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.raster_shard import rasterize_collective  # noqa
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
        )
        from d3ga_tpu.model.avatar import avatar_forward, init_avatar
        from d3ga_tpu.raster.tiles import rasterize_tiled
        from d3ga_tpu.train.losses import l1_loss, ssim
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
        from d3ga_tpu.train.step import LossWeights

        mesh = make_mesh(data=2, model=4)
        h = w = 48
        B = 2
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3
        )
        geoms = {g.name: g.geometry for g in model.garments}
        params = pad_params_for_shards(init_avatar(jax.random.PRNGKey(0), model), 4)
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step, shard_batch, shard_params = make_sharded_train_step(
            model, tx, mesh, geoms, (h, w), B, max_per_tile=32
        )
        cams = [orbit_camera(0.3 * i, w, h) for i in range(B)]
        board = checkerboard(h, w)
        host_batch = {
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([c.tanfovx for c in cams]),
            "tanfovy": jnp.stack([c.tanfovy for c in cams]),
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (B, lbs_dim)) * 0.1,
            "frame_idx": jnp.arange(B, dtype=jnp.int32),
            "camera_idx": jnp.zeros(B, jnp.int32),
            "image": jnp.stack([board] * B),
            "alpha": jnp.ones((B, 1, h, w)),
            "silhouette": jnp.full((B, 3, h, w), 0.5),
        }
        rng = jax.random.PRNGKey(7)

        # single-device recomputation FIRST (the sharded step donates its
        # param buffers, which may alias the originals via device_put)
        # with the step_shard rng convention
        lw = LossWeights()
        total = 0.0
        for b in range(B):
            cam = cams[b]
            frame = {
                "camera": cam,
                "lbs": host_batch["lbs"][b],
                "frame_idx": host_batch["frame_idx"][b],
                "camera_idx": host_batch["camera_idx"][b],
            }
            pkg = avatar_forward(params, model, frame, training=True)
            # step_shard folds rng by global frame slot (data_idx * b_local + b)
            bg = jax.random.uniform(jax.random.fold_in(rng, b), (3,))
            pred, _ = rasterize_tiled(
                pkg["means3D"], cam, bg, cov3d=pkg["cov3D_precomp"],
                opacities=pkg["opacities"], colors=pkg["rgb"], max_per_tile=32,
            )
            sil, _ = rasterize_tiled(
                pkg["means3D"], cam, jnp.zeros(3), cov3d=pkg["cov3D_precomp"],
                opacities=pkg["opacities"], colors=pkg["silhouette_rgb"],
                max_per_tile=32,
            )
            alpha = jnp.broadcast_to(host_batch["alpha"][b], (3, h, w))
            gt = host_batch["image"][b] * alpha + (1 - alpha) * bg[:, None, None]
            gt_sil = host_batch["silhouette"][b] * alpha
            color = (1 - lw.lambda_dssim) * l1_loss(pred, gt) + lw.lambda_dssim * (
                1.0 - ssim(pred, gt)
            )
            total += float(
                color * lw.rgb_weight
                + l1_loss(sil, gt_sil) * lw.sil_weight
                + jnp.mean(pkg["frame_encoding"] ** 2) * 0.001
                + pkg["scale_energy"].mean() * 175.0
                + (pkg["fm_energy"].mean() + 3.0) * lw.fme_weight
            )
        single_loss = total / B

        sp = shard_params(params)
        opt_state = tx.init(sp)
        _, _, metrics = step(sp, opt_state, shard_batch(host_batch), rng, jnp.int32(0))
        sharded_loss = float(metrics["total_loss"])
        np.testing.assert_allclose(sharded_loss, single_loss, rtol=2e-4)

    def test_full_feature_parity(self):
        """Sharded step == single-device render_frame over the FULL loss
        surface: VGG, pixel_cal, learnable blur, optimizable-pose code
        reg, color calib, fused 6-channel RGB+silhouette raster."""
        import numpy as np

        from d3ga_tpu.data.synthetic import (
            build_synthetic_avatar,
            checkerboard,
            orbit_camera,
        )
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
        )
        from d3ga_tpu.model.avatar import init_avatar
        from d3ga_tpu.train.losses import init_vgg19_features
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
        from d3ga_tpu.train.step import LossWeights, render_frame, total_loss

        mesh = make_mesh(data=2, model=4)
        h = w = 48
        B = 2
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3,
            config_overrides={
                "use_blur": True,
                "use_pixel_cal": True,
                "image_height": h,
                "image_width": w,
                "use_opt_smplx": True,
            },
        )
        geoms = {g.name: g.geometry for g in model.garments}
        init_poses = (
            jax.random.normal(jax.random.PRNGKey(5), (4, lbs_dim)) * 0.1
        )
        params = pad_params_for_shards(
            init_avatar(jax.random.PRNGKey(0), model, init_smplx_poses=init_poses), 4
        )
        vgg_params = init_vgg19_features(jax.random.PRNGKey(11), allow_random=True)
        lw = LossWeights(enable_vgg_from=1)
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step, shard_batch, shard_params = make_sharded_train_step(
            model, tx, mesh, geoms, (h, w), B, max_per_tile=32,
            loss_weights=lw, vgg_params=vgg_params,
        )
        cams = [orbit_camera(0.3 * i, w, h) for i in range(B)]
        board = checkerboard(h, w)
        host_batch = {
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([c.tanfovx for c in cams]),
            "tanfovy": jnp.stack([c.tanfovy for c in cams]),
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (B, lbs_dim)) * 0.1,
            "frame_idx": jnp.arange(B, dtype=jnp.int32),
            "camera_idx": jnp.zeros(B, jnp.int32),
            "image": jnp.stack([board] * B),
            "alpha": jnp.ones((B, 1, h, w)),
            "silhouette": jnp.full((B, 3, h, w), 0.5),
        }
        rng = jax.random.PRNGKey(7)
        it = jnp.int32(2)  # > enable_vgg_from: VGG term is LIVE

        # single-device reference via the SHARED loss assembly
        total = 0.0
        for b in range(B):
            frame = {
                "camera": cams[b],
                "lbs": host_batch["lbs"][b],
                "frame_idx": host_batch["frame_idx"][b],
                "camera_idx": host_batch["camera_idx"][b],
                "image": host_batch["image"][b],
                "alpha": host_batch["alpha"][b],
                "silhouette": host_batch["silhouette"][b],
            }
            terms, _ = render_frame(
                params, model, frame, jax.random.fold_in(rng, b),
                training=True, max_per_tile=32, vgg_params=vgg_params,
                loss_weights=lw, iteration=it,
            )
            assert "vgg_loss" in terms and float(terms["vgg_loss"]) != 0.0
            assert "blur_loss" in terms
            assert float(terms["codes_reg"]) > 0.0
            total += float(total_loss(terms))
        single_loss = total / B

        sp = shard_params(params)
        opt_state = tx.init(sp)
        _, _, metrics = step(sp, opt_state, shard_batch(host_batch), rng, it)
        np.testing.assert_allclose(
            float(metrics["total_loss"]), single_loss, rtol=2e-4
        )

    def test_canvas_padded_parity(self):
        """Sharded step == single-device render_frame on a canvas-padded
        batch (pixel_valid mask -> masked L1/DSSIM/PSNR). Guards the
        capture path: padded border pixels must not dilute the loss in
        either step."""
        import numpy as np

        from d3ga_tpu.data.synthetic import (
            build_synthetic_avatar,
            checkerboard,
            orbit_camera,
        )
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
        )
        from d3ga_tpu.model.avatar import init_avatar
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
        from d3ga_tpu.train.step import render_frame, total_loss

        mesh = make_mesh(data=2, model=4)
        h = w = 48
        B = 2
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3
        )
        geoms = {g.name: g.geometry for g in model.garments}
        params = pad_params_for_shards(init_avatar(jax.random.PRNGKey(0), model), 4)
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step, shard_batch, shard_params = make_sharded_train_step(
            model, tx, mesh, geoms, (h, w), B, max_per_tile=32
        )
        cams = [orbit_camera(0.3 * i, w, h) for i in range(B)]
        # each frame valid only in a 40x36 corner of the 48x48 canvas,
        # like capture frames padded to the shared render canvas
        valid = jnp.zeros((B, 1, h, w)).at[:, :, :40, :36].set(1.0)
        board = checkerboard(h, w)
        host_batch = {
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([c.tanfovx for c in cams]),
            "tanfovy": jnp.stack([c.tanfovy for c in cams]),
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (B, lbs_dim)) * 0.1,
            "frame_idx": jnp.arange(B, dtype=jnp.int32),
            "camera_idx": jnp.zeros(B, jnp.int32),
            "image": jnp.stack([board] * B) * valid,
            "alpha": valid,
            "silhouette": jnp.full((B, 3, h, w), 0.5) * valid,
            "pixel_valid": valid,
        }
        rng = jax.random.PRNGKey(7)

        total = 0.0
        psnr_single = 0.0
        for b in range(B):
            frame = {
                "camera": cams[b],
                "lbs": host_batch["lbs"][b],
                "frame_idx": host_batch["frame_idx"][b],
                "camera_idx": host_batch["camera_idx"][b],
                "image": host_batch["image"][b],
                "alpha": host_batch["alpha"][b],
                "silhouette": host_batch["silhouette"][b],
                "pixel_valid": host_batch["pixel_valid"][b],
            }
            terms, aux = render_frame(
                params, model, frame, jax.random.fold_in(rng, b),
                training=True, max_per_tile=32,
            )
            total += float(total_loss(terms))
            psnr_single += float(aux["psnr"])

        sp = shard_params(params)
        opt_state = tx.init(sp)
        _, _, metrics = step(sp, opt_state, shard_batch(host_batch), rng, jnp.int32(0))
        np.testing.assert_allclose(
            float(metrics["total_loss"]), total / B, rtol=2e-4
        )
        np.testing.assert_allclose(
            float(metrics["psnr"]), psnr_single / B, rtol=2e-4
        )


class TestShardedPallasBlend:
    def test_record_kernel_matches_single_device(self, mesh4):
        # record-direct blend kernel inside shard_map (tile_offset per
        # shard) must reproduce the single-device pallas image.
        from test_raster import random_scene, simple_camera

        cam = simple_camera(w=80, h=64)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(9), n=120)
        bg = jnp.array([0.25, 0.5, 0.75])
        ref, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128, use_pallas=True,
            pallas_interpret=True,
        )
        img, _ = rasterize_sharded(
            mesh4, means, cam, bg, scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=128,
            use_pallas=True,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)

    def test_variant_backends_match_single_device(self, mesh4, monkeypatch):
        # dupslot record gradients + sort-payload reorder inside
        # shard_map: image AND means-gradient must match the default
        # single-device pipeline.
        import d3ga_tpu.raster.tiles as tiles
        from test_raster import random_scene, simple_camera

        cam = simple_camera(w=80, h=64)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(5), n=150)
        bg = jnp.zeros(3)

        def loss_single(m):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=128, coarse="dupsort_tile",
                use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img**2)

        ref_l, ref_g = jax.value_and_grad(loss_single)(means)

        monkeypatch.setattr(tiles, "REC_GRAD", "dupslot")
        monkeypatch.setattr(tiles, "REORDER", "sortpayload")

        def loss_shard(m):
            img, _ = rasterize_sharded(
                mesh4, m, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=128,
                coarse="dupsort_tile", use_pallas=True,
            )
            return jnp.sum(img**2)

        l2, g2 = jax.value_and_grad(loss_shard)(means)
        np.testing.assert_allclose(float(l2), float(ref_l), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(ref_g), rtol=1e-3, atol=1e-6
        )


class TestBandedLosses:
    """Banded (image-row-sharded) losses must equal the gathered path
    exactly (VERDICT r2 item 3: halo-SSIM == full-SSIM)."""

    def test_halo_ssim_equals_full_ssim(self, mesh4):
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from d3ga_tpu.dist.banded import banded_mean, banded_psnr, banded_ssim
        from d3ga_tpu.train.losses import masked_psnr, masked_ssim

        H, W = 61, 40  # H not divisible by the 4 bands: exercises padding
        m = 4
        bh = -(-H // m)
        key = jax.random.PRNGKey(0)
        pred = jax.random.uniform(key, (3, H, W))
        gt = jax.random.uniform(jax.random.fold_in(key, 1), (3, H, W))
        mask = (
            jax.random.uniform(jax.random.fold_in(key, 2), (1, H, W)) > 0.2
        ).astype(jnp.float32)

        padr = m * bh - H

        def to_bands(img):
            return jnp.pad(img, ((0, 0), (0, padr), (0, 0))).reshape(
                img.shape[0], m, bh, W
            ).transpose(1, 0, 2, 3).reshape(m * img.shape[0], bh, W)

        def fn(pb, gb, mb):
            # shard_map gives each device its [3, bh, W] band
            rows = jax.lax.axis_index("model") * bh + jnp.arange(bh)
            valid = mb * (rows < H).astype(jnp.float32)[None, :, None]
            pb = pb * valid
            gb = gb * valid
            s = banded_ssim(pb, gb, valid, "model", m)
            l1 = banded_mean(jnp.abs(pb - gb), valid, "model")
            p = banded_psnr(pb, gb, valid, "model")
            return s, l1, p

        s, l1, p = jax.shard_map(
            fn, mesh=mesh4,
            in_specs=(P("model"), P("model"), P("model")),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(to_bands(pred), to_bands(gt), to_bands(mask))

        mfull = jnp.broadcast_to(mask, pred.shape)
        np.testing.assert_allclose(
            float(s), float(masked_ssim(pred * mask, gt * mask, mask)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(l1),
            float(jnp.sum(jnp.abs(pred - gt) * mfull) / jnp.sum(mfull)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(p), float(masked_psnr(pred * mask, gt * mask, mask)),
            rtol=1e-5,
        )

    def test_banded_step_equals_gathered_step(self):
        """The banded sharded step's loss == the gathered sharded step's
        on the same batch/rng (full pipeline, canvas-padded frames)."""
        from d3ga_tpu.data.synthetic import (
            build_synthetic_avatar,
            checkerboard,
            orbit_camera,
        )
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
        )
        from d3ga_tpu.model.avatar import init_avatar
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer

        mesh = make_mesh(data=2, model=4)
        h, w = 61, 48  # h not band-divisible
        B = 2
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3
        )
        geoms = {g.name: g.geometry for g in model.garments}
        params = pad_params_for_shards(init_avatar(jax.random.PRNGKey(0), model), 4)
        lr_tree = lr_tree_from_config(params, {})
        cams = [orbit_camera(0.3 * i, w, h) for i in range(B)]
        board = checkerboard(h, w)
        pixel_valid = jnp.ones((B, 1, h, w)).at[:, :, -9:].set(0.0)
        host_batch = {
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([c.tanfovx for c in cams]),
            "tanfovy": jnp.stack([c.tanfovy for c in cams]),
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (B, lbs_dim)) * 0.1,
            "frame_idx": jnp.arange(B, dtype=jnp.int32),
            "camera_idx": jnp.zeros(B, jnp.int32),
            "image": jnp.stack([board] * B),
            "alpha": jnp.ones((B, 1, h, w)),
            "silhouette": jnp.full((B, 3, h, w), 0.5),
            "pixel_valid": pixel_valid,
        }
        rng = jax.random.PRNGKey(7)
        losses = {}
        for banded in (False, True):
            tx = make_optimizer(lr_tree)
            step, shard_batch, shard_params = make_sharded_train_step(
                model, tx, mesh, geoms, (h, w), B, max_per_tile=32,
                banded=banded,
            )
            # fresh copies: the step donates its buffers, and device_put
            # may alias replicated leaves with the host pytree
            sp = shard_params(jax.tree.map(jnp.array, params))
            opt_state = tx.init(sp)
            _, _, metrics = step(
                sp, opt_state, shard_batch(host_batch), rng, jnp.int32(0)
            )
            losses[banded] = {k: float(v) for k, v in metrics.items()}
        for k in losses[False]:
            np.testing.assert_allclose(
                losses[True][k], losses[False][k], rtol=2e-4, err_msg=k
            )


class TestShardSelect:
    """Sharded selection (local front-K + all_to_all + merge) must match
    the single-device rasterizer: the union of per-shard front-K
    contains the global front-K, and the merge orders by (depth, index)
    like the stable global sort."""

    def test_image_matches_single_device(self, mesh4):
        cam = simple_camera(w=80, h=64)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(3), n=203
        )
        bg = jnp.array([0.3, 0.2, 0.1])
        ref, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=256,
        )
        img, aux = rasterize_sharded(
            mesh4, means, cam, bg, scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=256,
            shard_select=True, dup=8,
        )
        assert int(aux.overflow) == 0
        # full-K exchange: the merge-overflow counter is not in play
        assert int(aux.merge_overflow) == -1
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("margin", [8, 64])
    def test_front_margin_matches_full_exchange(self, mesh4, margin):
        """The truncated front-F exchange (VERDICT r4 #6) must render
        the same image as the full-K exchange whenever merge_overflow
        reports 0, and the counter must be conservative (0 => identical
        output)."""
        cam = simple_camera(w=80, h=64)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(7), n=203
        )
        bg = jnp.array([0.1, 0.5, 0.9])
        kw = dict(
            scales=scales, rotations=rots, opacities=opac, colors=colors,
            max_per_tile=256, shard_select=True, dup=8,
        )
        ref, aux_full = rasterize_sharded(mesh4, means, cam, bg, **kw)
        img, aux = rasterize_sharded(
            mesh4, means, cam, bg, front_margin=margin, **kw
        )
        assert int(aux.merge_overflow) >= 0
        if int(aux.merge_overflow) == 0:
            np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
        # true-count-based counters are exchange-independent
        assert int(aux.overflow) == int(aux_full.overflow)
        assert int(aux.max_per_tile) == int(aux_full.max_per_tile)

    def test_front_margin_trips_on_skewed_shards(self, mesh4):
        """A scene whose Gaussians all land on ONE shard (so one shard
        must contribute the ENTIRE front-K of dense tiles) must trip the
        merge_overflow counter rather than silently dropping entries."""
        n = 64
        # all Gaussians near the image center, depth-ordered along the
        # shard axis; sharding puts the first n/4 on shard 0 etc., but
        # every tile's front-K draws from ALL shards here — build skew
        # by making shard 0's Gaussians strictly nearest
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        means = jnp.concatenate(
            [
                jax.random.uniform(ks[0], (n, 2), minval=-0.05, maxval=0.05),
                4.0 + jnp.arange(n, dtype=jnp.float32)[:, None] * 0.001,
            ],
            axis=-1,
        )
        scales = jnp.full((n, 3), 0.05)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n, 1), 0.02)  # translucent: deep lists stay live
        colors = jax.random.uniform(ks[1], (n, 3))
        cam = simple_camera(w=48, h=32)
        bg = jnp.zeros(3)
        # K=16, m=4 -> F = 4 + margin 0 = 4 shipped per shard, but the
        # front 16 of the central tiles are the 16 NEAREST Gaussians =
        # shard 0's entire 16-deep list
        img, aux = rasterize_sharded(
            mesh4, means, cam, bg, scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=16,
            shard_select=True, dup=8, front_margin=0,
        )
        assert int(aux.merge_overflow) > 0

    def test_gradients_match_single_device(self, mesh4):
        cam = simple_camera(w=48, h=32)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(4), n=96
        )
        bg = jnp.zeros(3)

        def loss_ref(m):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=128,
            )
            return jnp.sum(img ** 2)

        def loss_sh(m):
            img, _ = rasterize_sharded(
                mesh4, m, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=128,
                shard_select=True, dup=8,
            )
            return jnp.sum(img ** 2)

        g_ref = jax.grad(loss_ref)(means)
        g_sh = jax.grad(loss_sh)(means)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_ref), atol=2e-4,
            rtol=1e-3,
        )
