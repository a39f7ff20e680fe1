"""Optimizable per-frame global pose (Rh/Th) through the in-graph
differentiable camera rebuild (`resolve_camera`).

The reference declares these parameters with LRs
(`/root/reference/models/garment_net.py:87-107`) but builds the camera
host-side detached (`lib/batch.py:165-201`), so they never train; here
dL/dRh and dL/dTh must be real and a perturbed global pose must be
recoverable by gradient descent."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from test_raster import random_scene, simple_camera

from d3ga_tpu.body.drivers import smplx_camera_to_world
from d3ga_tpu.raster.camera import camera_from_c2w
from d3ga_tpu.raster.tiles import rasterize_tiled


class TestResolveCameraGrads:
    def _setup(self):
        from d3ga_tpu.data.synthetic import build_synthetic_avatar, orbit_camera
        from d3ga_tpu.model.avatar import init_avatar

        h = w = 48
        model, skel, lbs_dim = build_synthetic_avatar(
            n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3,
            config_overrides={"use_opt_smplx": True},
        )
        key = jax.random.PRNGKey(0)
        init_poses = jax.random.normal(jax.random.PRNGKey(5), (4, lbs_dim)) * 0.1
        params = init_avatar(
            key, model,
            init_smplx_poses=init_poses,
            init_smplx_rh=jnp.zeros((4, 3)),
            init_smplx_th=jnp.zeros((4, 3)),
        )
        cam = orbit_camera(0.4, w, h)
        batch = {
            "camera": cam,
            "cam_rt": cam.world_view,  # capture w2c; Rh=Th=0 reproduces it
            "lbs": jax.random.normal(jax.random.PRNGKey(1), (lbs_dim,)) * 0.1,
            "frame_idx": jnp.int32(1),
            "camera_idx": jnp.int32(0),
            "image": jnp.full((3, h, w), 0.5),
            "alpha": jnp.ones((1, h, w)),
            "silhouette": jnp.full((3, h, w), 0.5),
        }
        return model, params, batch

    def test_identity_rh_th_reproduces_camera(self):
        """Rh=Th=0 must leave the camera numerically unchanged."""
        from d3ga_tpu.model.avatar import resolve_camera

        model, params, batch = self._setup()
        out = resolve_camera(params, model, batch, training=True)
        np.testing.assert_allclose(
            np.asarray(out["camera"].world_view),
            np.asarray(batch["camera"].world_view),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["camera"].full_proj),
            np.asarray(batch["camera"].full_proj),
            atol=1e-4,
        )

    def test_dl_drh_nonzero(self):
        from d3ga_tpu.train.step import render_frame, total_loss

        model, params, batch = self._setup()

        def loss(params):
            terms, _ = render_frame(
                params, model, batch, jax.random.PRNGKey(2),
                training=True, max_per_tile=32,
            )
            return total_loss(terms)

        g = jax.grad(loss)(params)
        g_rh = np.asarray(g["optimizable_rotations"])
        g_th = np.asarray(g["optimizable_translations"])
        # the referenced frame row gets gradient; others stay zero
        assert np.abs(g_rh[1]).max() > 0, "dL/dRh is zero — camera not in graph"
        assert np.abs(g_th[1]).max() > 0, "dL/dTh is zero — camera not in graph"
        assert np.abs(g_rh[0]).max() == 0 and np.abs(g_rh[2:]).max() == 0

    def test_frozen_after_400k(self):
        from d3ga_tpu.train.step import render_frame, total_loss

        model, params, batch = self._setup()

        def loss(params):
            terms, _ = render_frame(
                params, model, batch, jax.random.PRNGKey(2),
                training=True, max_per_tile=32, iteration=jnp.int32(400_001),
            )
            return total_loss(terms)

        g = jax.grad(loss)(params)
        assert np.abs(np.asarray(g["optimizable_rotations"])).max() == 0
        assert np.abs(np.asarray(g["optimizable_translations"])).max() == 0


class TestGlobalPoseConvergence:
    def test_recover_perturbed_rh_th(self):
        """Render a target with a ground-truth global pose, start from
        zero, and recover it by gradient descent on the photometric
        loss (pose-correction convergence)."""
        cam0 = simple_camera(w=48, h=48)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(3), n=200)
        bg = jnp.zeros(3)
        rt = cam0.world_view  # capture extrinsics

        def render(rh, th):
            c2w = smplx_camera_to_world(rh, th, rt)
            cam = camera_from_c2w(
                c2w, cam0.tanfovx, cam0.tanfovy, cam0.width, cam0.height
            )
            img, _ = rasterize_tiled(
                means, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=64,
            )
            return img

        rh_true = jnp.array([0.03, -0.05, 0.02])
        th_true = jnp.array([0.02, -0.01, 0.015])
        target = render(rh_true, th_true)

        def loss(p):
            return jnp.mean(jnp.abs(render(p["rh"], p["th"]) - target))

        p = {"rh": jnp.zeros(3), "th": jnp.zeros(3)}
        tx = optax.adam(1e-2)
        state = tx.init(p)
        grad_fn = jax.jit(jax.grad(loss))
        l0 = float(loss(p))
        for _ in range(120):
            upd, state = tx.update(grad_fn(p), state, p)
            p = optax.apply_updates(p, upd)
        l1 = float(loss(p))
        assert l1 < 0.5 * l0, (l0, l1)
        err0 = float(jnp.linalg.norm(rh_true) + jnp.linalg.norm(th_true))
        err1 = float(
            jnp.linalg.norm(p["rh"] - rh_true) + jnp.linalg.norm(p["th"] - th_true)
        )
        assert err1 < 0.5 * err0, (err0, err1)
