"""End-to-end model tests: cage forward -> rasterize -> loss -> grads."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import cube_cage, identity_pose_nodes, test_camera

from d3ga_tpu.model.avatar import AvatarModel, GarmentSpec, avatar_forward, init_avatar
from d3ga_tpu.model.cage_model import cage_forward, init_cage_params
from d3ga_tpu.raster.tiles import rasterize_tiled
from d3ga_tpu.train.losses import l1_loss, ssim
from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer

COND = 98


def make_model(n_gaussians=48):
    geom = cube_cage(n_gaussians=n_gaussians)
    spec = GarmentSpec(
        name="body",
        geometry=geom,
        pose_nodes=identity_pose_nodes(geom),
        silhouette_color=(0.0, 0.0, 1.0),
        node_scale=0.07,
    )
    model = AvatarModel(
        garments=(spec,),
        cond_dim=COND,
        n_frames=5,
        n_cameras=3,
        config={
            "frame_embed_dim": 32,
            "use_color_calib": True,
            "use_blur": False,
            "n_color_features": 64,
        },
    )
    return model


def make_batch(camera):
    return {
        "lbs": jnp.zeros(104),
        "camera": camera,
        "frame_idx": jnp.int32(1),
        "camera_idx": jnp.int32(2),
    }


class TestCageForward:
    def test_package_shapes(self):
        geom = cube_cage(n_gaussians=32)
        key = jax.random.PRNGKey(0)
        params = init_cage_params(key, geom, COND)
        cam = test_camera()
        pkg = cage_forward(
            params, geom, lambda d: identity_pose_nodes(geom)({}, d),
            cond_deform=jnp.zeros(COND), cond_canon=jnp.zeros(COND),
            cond_color=jnp.zeros(COND), camera_center=cam.camera_center,
        )
        n = 32
        assert pkg["means3D"].shape == (n, 3)
        assert pkg["cov3D_precomp"].shape == (n, 6)
        assert pkg["rgb"].shape == (n, 3)
        assert pkg["opacities"].shape == (n, 1)
        assert pkg["fm_energy"].shape == (1,)
        # Gaussians near the cube around z=5 (delta_bary can push a
        # Gaussian up to ~0.25 of a tet edge beyond the surface at init)
        assert jnp.all(jnp.abs(pkg["means3D"][:, 2] - 5.0) < 0.9)
        # Covariances must be symmetric positive semidefinite
        from d3ga_tpu.ops.covariance import unstrip_symmetric

        cov = unstrip_symmetric(pkg["cov3D_precomp"])
        ev = jnp.linalg.eigvalsh(cov)
        assert jnp.all(ev > -1e-7)

    def test_fem_energy_zero_at_rest(self):
        geom = cube_cage(n_gaussians=16)
        params = init_cage_params(jax.random.PRNGKey(1), geom, COND)
        cam = test_camera()
        # zero deformation field output: bypass by scaling node_scale to 0
        pkg = cage_forward(
            params, geom, lambda d: identity_pose_nodes(geom)({}, d),
            cond_deform=jnp.zeros(COND), cond_canon=jnp.zeros(COND),
            cond_color=jnp.zeros(COND), camera_center=cam.camera_center,
            node_scale=0.0,
        )
        np.testing.assert_allclose(pkg["fm_energy"], [0.0], atol=1e-4)


class TestAvatar:
    def test_forward_and_render(self):
        model = make_model()
        params = init_avatar(jax.random.PRNGKey(0), model)
        cam = test_camera()
        batch = make_batch(cam)
        pkg = avatar_forward(params, model, batch, training=True)
        img, aux = rasterize_tiled(
            pkg["means3D"], cam, jnp.ones(3), cov3d=pkg["cov3D_precomp"],
            opacities=pkg["opacities"], colors=pkg["rgb"], max_per_tile=64,
        )
        assert img.shape == (3, 48, 64)
        assert bool(jnp.all(jnp.isfinite(img)))

    def test_eval_uses_mean_embedding(self):
        model = make_model()
        params = init_avatar(jax.random.PRNGKey(0), model)
        batch = make_batch(test_camera())
        pkg_train = avatar_forward(params, model, batch, training=True)
        pkg_eval = avatar_forward(params, model, batch, training=False)
        # different conditioning => different colors (almost surely)
        assert not np.allclose(pkg_train["rgb"], pkg_eval["rgb"])

    def test_train_step_decreases_loss(self):
        model = make_model()
        params = init_avatar(jax.random.PRNGKey(0), model)
        cam = test_camera()
        batch = make_batch(cam)
        target = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(7), (3, 48, 64)), 0, 1
        )
        bg = jnp.zeros(3)

        def loss_fn(p):
            pkg = avatar_forward(p, model, batch, training=True)
            img, _ = rasterize_tiled(
                pkg["means3D"], cam, bg, cov3d=pkg["cov3D_precomp"],
                opacities=pkg["opacities"], colors=pkg["rgb"], max_per_tile=64,
            )
            l1 = l1_loss(img, target)
            d_ssim = 1.0 - ssim(img, target)
            return (0.8 * l1 + 0.2 * d_ssim) * 10.0 + 0.0025 * (
                pkg["fm_energy"].mean() + 3.0
            ) + 175.0 * pkg["scale_energy"].mean()

        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        state = tx.init(params)

        @jax.jit
        def step(p, s):
            val, g = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(g, s, p)
            import optax

            return optax.apply_updates(p, updates), s, val

        losses = []
        for _ in range(8):
            params, state, val = step(params, state)
            losses.append(float(val))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_grads_all_finite(self):
        model = make_model()
        params = init_avatar(jax.random.PRNGKey(3), model)
        cam = test_camera()
        batch = make_batch(cam)

        def loss_fn(p):
            pkg = avatar_forward(p, model, batch, training=True)
            img, _ = rasterize_tiled(
                pkg["means3D"], cam, jnp.zeros(3), cov3d=pkg["cov3D_precomp"],
                opacities=pkg["opacities"], colors=pkg["rgb"], max_per_tile=64,
            )
            return jnp.sum(img)

        g = jax.grad(loss_fn)(params)
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))


class TestMeshPrimitive:
    def test_mesh_avatar_forward_and_render(self):
        from d3ga_tpu.data.synthetic import mesh_garment_from_cube, toy_skeleton
        from d3ga_tpu.model.avatar import (
            AvatarModel,
            GarmentSpec,
            avatar_forward,
            init_avatar,
        )

        skel = toy_skeleton(3, 0)
        geom, pose_verts, _ = mesh_garment_from_cube(n_gaussians=48, skel=skel)
        model = AvatarModel(
            garments=(
                GarmentSpec(
                    name="body", geometry=geom, pose_nodes=pose_verts,
                    silhouette_color=(0.0, 0.0, 1.0), primitive="mesh",
                ),
            ),
            cond_dim=21,
            n_frames=4,
            n_cameras=2,
            config={"frame_embed_dim": 32, "use_color_calib": True},
        )
        params = init_avatar(jax.random.PRNGKey(0), model)
        cam = test_camera()
        batch = {
            "lbs": jnp.zeros(21),
            "camera": cam,
            "frame_idx": jnp.int32(0),
            "camera_idx": jnp.int32(0),
        }
        pkg = avatar_forward(params, model, batch)
        assert pkg["scales"].shape == (48, 3)
        assert pkg["rotations"].shape == (48, 4)
        assert pkg["cov3D_precomp"] is None
        np.testing.assert_allclose(pkg["fm_energy"], [0.0])

        def loss(p):
            out = avatar_forward(p, model, batch)
            img, _ = rasterize_tiled(
                out["means3D"], cam, jnp.zeros(3), scales=out["scales"],
                rotations=out["rotations"], opacities=out["opacities"],
                colors=out["rgb"], max_per_tile=64,
            )
            return jnp.sum(img)

        g = jax.grad(loss)(params)
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))


class TestOptionalPaths:
    def _base(self, cfg_extra, n=32):
        geom = cube_cage(n_gaussians=n)
        spec = GarmentSpec(
            name="body", geometry=geom, pose_nodes=identity_pose_nodes(geom),
            silhouette_color=(0.0, 0.0, 1.0),
        )
        cfg = {"frame_embed_dim": 32, "use_color_calib": True}
        cfg.update(cfg_extra)
        model = AvatarModel(
            garments=(spec,), cond_dim=COND, n_frames=4, n_cameras=2, config=cfg
        )
        params = init_avatar(jax.random.PRNGKey(0), model)
        return model, params, geom

    def test_shs_path(self):
        model, params, _ = self._base({"use_shs": True, "max_sh_degree": 2})
        cam = test_camera()
        batch = make_batch(cam)
        pkg = avatar_forward(params, model, batch)
        n = 32
        assert pkg["shs"].shape == (n, 9, 3)
        assert pkg["rgb"] is None
        img, _ = rasterize_tiled(
            pkg["means3D"], cam, jnp.zeros(3), cov3d=pkg["cov3D_precomp"],
            opacities=pkg["opacities"], shs=pkg["shs"], sh_degree=1,
            max_per_tile=64,
        )
        assert bool(jnp.all(jnp.isfinite(img)))
        # SH grads flow
        def loss(p):
            out = avatar_forward(p, model, batch)
            img, _ = rasterize_tiled(
                out["means3D"], cam, jnp.zeros(3), cov3d=out["cov3D_precomp"],
                opacities=out["opacities"], shs=out["shs"], sh_degree=1,
                max_per_tile=64,
            )
            return jnp.sum(img)
        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["garments"]["body"]["features_dc"]).sum()) > 0

    def test_ao_shadow_path(self):
        model, params, geom = self._base({"use_ao": True})
        # cage-to-body mapping: identity onto a fake body template
        n_body = geom.cage_points.shape[0]
        geom2 = geom._replace(
            cage_to_body_vertex=jnp.arange(n_body, dtype=jnp.int32)
        )
        model = model._replace(
            garments=(model.garments[0]._replace(geometry=geom2),)
        )
        from d3ga_tpu.ops.posenc import positional_encoding

        template = jax.random.normal(jax.random.PRNGKey(1), (n_body, 3))
        batch = make_batch(test_camera())
        batch["template_pe"] = positional_encoding(template, 7)
        pkg = avatar_forward(params, model, batch)
        assert "shadow_decoder" in params
        assert bool(jnp.all(jnp.isfinite(pkg["rgb"])))

    def test_face_embedding_path(self):
        model, params, _ = self._base(
            {"use_face_emb": True, "n_valid_kpts": 10, "face_embed_dim": COND}
        )
        batch = make_batch(test_camera())
        batch["face_kpt_canonical"] = jax.random.normal(
            jax.random.PRNGKey(2), (10, 3)
        )
        pkg = avatar_forward(params, model, batch)
        assert "face_decoder" in params
        assert bool(jnp.all(jnp.isfinite(pkg["rgb"])))
