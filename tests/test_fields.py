import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.fields import (
    init_mlp,
    apply_mlp,
    init_deformation_field,
    deformation_field,
    init_canonical_field,
    canonical_field,
    init_color_field,
    color_field,
    init_embedding,
    embedding_lookup,
    embedding_average,
    init_camera_calibration,
    apply_camera_calibration,
    init_learnable_blur,
    apply_learnable_blur,
    blur_reg,
    init_pixel_bias,
    apply_pixel_bias,
)
from d3ga_tpu.fields.mlp import color_field_input_dim


class TestMLP:
    def test_shapes_and_out_scale(self):
        key = jax.random.PRNGKey(0)
        p = init_mlp(key, 10, 32, 2, 5)
        assert len(p["w"]) == 3  # first + n_layers hidden
        x = jnp.ones((7, 10))
        assert apply_mlp(p, x).shape == (7, 5)

    def test_deformation_field_bounded(self):
        key = jax.random.PRNGKey(1)
        p = init_deformation_field(key, cond_dim=98)
        nodes = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
        pose = jax.random.normal(jax.random.PRNGKey(3), (98,))
        out = deformation_field(p, nodes, pose, node_scale=0.07)
        assert out.shape == (50, 3)
        assert jnp.abs(out).max() <= 0.07 + 1e-6

    def test_canonical_field_shapes(self):
        key = jax.random.PRNGKey(4)
        p = init_canonical_field(key, cond_dim=87)
        n = 20
        rots = jax.random.normal(key, (n, 4))
        scales = jnp.exp(jax.random.normal(key, (n, 3)))
        barys = jax.random.uniform(key, (n, 4))
        pose = jnp.zeros(87)
        db, dr, ds = canonical_field(p, rots, scales, barys, pose, 0.25)
        assert db.shape == (n, 4) and dr.shape == (n, 4) and ds.shape == (n, 3)
        assert jnp.abs(db).max() <= 0.25 + 1e-6

    def test_color_field_ranges(self):
        key = jax.random.PRNGKey(5)
        n_in = color_field_input_dim(64, 98, frame_dim=32, camera_dim=0)
        p = init_color_field(key, n_in)
        n = 30
        feat = jax.random.uniform(key, (n, 64))
        dirs = jax.random.normal(key, (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb, opa = color_field(
            p, feat, pose=jnp.zeros(98), viewdirs=dirs,
            frame_encoding=jnp.zeros(32),
        )
        assert rgb.shape == (n, 3) and opa.shape == (n, 1)
        assert rgb.min() >= 0 and rgb.max() <= 1
        assert opa.min() >= 0 and opa.max() <= 1


class TestEmbedding:
    def test_lookup_and_average(self):
        p = init_embedding(jax.random.PRNGKey(0), 10, 8)
        e = embedding_lookup(p, jnp.int32(3))
        assert e.shape == (8,)
        np.testing.assert_allclose(e, p["table"][3], atol=1e-6)  # under max_norm
        # out of range clamps
        np.testing.assert_allclose(
            embedding_lookup(p, jnp.int32(99)), embedding_lookup(p, jnp.int32(9))
        )
        assert embedding_average(p).shape == (8,)

    def test_max_norm_renorm(self):
        p = {"table": jnp.ones((2, 4)) * 100.0}
        e = embedding_lookup(p, jnp.int32(0))
        np.testing.assert_allclose(jnp.linalg.norm(e), 4.0, rtol=1e-5)


class TestCalibration:
    def test_identity_at_init_and_identity_camera(self):
        p = init_camera_calibration(3)
        rgb = jax.random.uniform(jax.random.PRNGKey(0), (10, 3))
        out = apply_camera_calibration(p, rgb, 1, identity_idx=0, training=False)
        np.testing.assert_allclose(out, rgb, atol=1e-6)  # init = identity affine
        p2 = {"corrections": p["corrections"].at[0].set(jnp.array([2.0, 2, 2, 1, 1, 1]))}
        out_id = apply_camera_calibration(p2, rgb, 0, identity_idx=0, training=False)
        np.testing.assert_allclose(out_id, rgb, atol=1e-6)  # identity camera bypass

    def test_grad_scale(self):
        p = init_camera_calibration(2)
        rgb = jnp.ones((4, 3))

        def loss(p, training):
            return jnp.sum(
                apply_camera_calibration(p, rgb, 1, identity_idx=0, training=training)
            )

        g_train = jax.grad(loss)(p, True)["corrections"]
        g_eval = jax.grad(loss)(p, False)["corrections"]
        np.testing.assert_allclose(g_train, g_eval * 0.1, atol=1e-6)


class TestBlur:
    def test_identity_weights_roughly_average(self):
        p = init_learnable_blur(2)
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
        out = apply_learnable_blur(p, img, 0)
        assert out.shape == img.shape
        # equal softmax weights: output = mean of id + blur3 + blur7; mean preserved
        np.testing.assert_allclose(out.mean(), img.mean(), atol=1e-3)
        assert blur_reg(p, 1).shape == (3,)

    def test_pure_identity(self):
        p = {"weights_raw": jnp.array([[100.0, 0.0, 0.0]])}
        img = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16))
        np.testing.assert_allclose(apply_learnable_blur(p, img, 0), img, atol=1e-5)


class TestPixelBias:
    def test_zero_init_upsample(self):
        p = init_pixel_bias(2, 64, 48, ds_rate=8)
        out = apply_pixel_bias(p, 1, 64, 48)
        assert out.shape == (1, 64, 48)
        np.testing.assert_allclose(out, 0.0)


class TestBackground:
    def test_mid_gray_init_upsample(self):
        from d3ga_tpu.fields import apply_background, init_background_model

        p = init_background_model(2, 64, 48, ds_rate=8)
        out = apply_background(p, 1, 64, 48)
        assert out.shape == (3, 64, 48)
        np.testing.assert_allclose(out, 0.5)

    def test_composite_swaps_solid_bg_for_map(self):
        from d3ga_tpu.fields import composite_background

        k = jax.random.PRNGKey(0)
        raw = jax.random.uniform(k, (3, 16, 16))
        t_bg = jax.random.uniform(jax.random.fold_in(k, 1), (16, 16))
        bg = jnp.array([0.2, 0.7, 0.4])
        bg_map = jax.random.uniform(jax.random.fold_in(k, 2), (3, 16, 16))
        pred = raw + t_bg[None] * bg[:, None, None]
        out = composite_background(pred, t_bg, bg_map, bg)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(raw + t_bg[None] * bg_map), atol=1e-6
        )

    def test_blurred_noise_is_smooth_uniform(self):
        from d3ga_tpu.fields import blurred_noise

        x = blurred_noise(jax.random.PRNGKey(3), (3, 64, 64))
        assert x.shape == (3, 64, 64)
        # blur preserves the uniform mean but shrinks the variance
        assert abs(float(x.mean()) - 0.5) < 0.02
        assert float(x.var()) < 1.0 / 12.0 / 2.0
        assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
