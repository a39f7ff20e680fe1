"""Pallas blend kernel vs the XLA blend path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_raster import random_scene, simple_camera

from d3ga_tpu.raster.tiles import rasterize_tiled


class TestPallasBlend:
    def test_forward_matches_xla(self):
        cam = simple_camera(w=64, h=48)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(0), n=120)
        bg = jnp.array([0.2, 0.5, 0.8])
        ref, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128,
        )
        img, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128, use_pallas=True,
            pallas_interpret=True,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=5e-5)

    def test_backward_matches_xla(self):
        cam = simple_camera(w=48, h=32)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(1), n=60)
        bg = jnp.zeros(3)
        target = jax.random.uniform(jax.random.PRNGKey(2), (3, 32, 48))

        def loss(m, o, c, pallas):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=o,
                colors=c, max_per_tile=64, use_pallas=pallas,
                pallas_interpret=pallas,
            )
            return jnp.mean((img - target) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(means, opac, colors, False)
        g_pl = jax.grad(loss, argnums=(0, 1, 2))(means, opac, colors, True)
        for a, b, name in zip(g_ref, g_pl, ("means", "opac", "colors")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch: {name}",
            )

    def test_six_channel_fused_rgb_silhouette(self):
        # The training step fuses RGB + silhouette into one 6-channel
        # rasterization; the record kernel must match the XLA blend for
        # C=6 (CR=12) including gradients.
        cam = simple_camera(w=64, h=48)
        means, scales, rots, opac, colors3 = random_scene(jax.random.PRNGKey(3), n=80)
        sil = jax.random.uniform(jax.random.PRNGKey(4), colors3.shape)
        colors6 = jnp.concatenate([colors3, sil], axis=-1)
        bg = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.0])

        def render(c, pallas):
            img, _ = rasterize_tiled(
                means, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=c, max_per_tile=64, use_pallas=pallas,
                pallas_interpret=pallas,
            )
            return img

        ref = render(colors6, False)
        img = render(colors6, True)
        assert img.shape == (6, 48, 64)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=5e-5)

        g_ref = jax.grad(lambda c: jnp.sum(render(c, False) ** 2))(colors6)
        g_pl = jax.grad(lambda c: jnp.sum(render(c, True) ** 2))(colors6)
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_pl), rtol=1e-4, atol=1e-5
        )


class TestLargeTilesPerProgram:
    @pytest.mark.parametrize("g", [16, 24])
    def test_gct_loop_path_matches_xla(self, g, monkeypatch):
        # G_CT > 8 switches the kernel body from the static per-tile
        # unroll to the in-kernel fori_loop (dynamic G-axis indexing)
        # and widens the x-grid padding; image + grads must still match
        # the XLA blend. On-chip this path is the per-program-overhead
        # amortization lever (tools/gct_probe.py).
        from d3ga_tpu.raster import pallas_blend_ct

        monkeypatch.setattr(pallas_blend_ct, "G_CT", g)
        cam = simple_camera(w=64, h=48)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(5), n=100)
        bg = jnp.array([0.3, 0.1, 0.6])

        def loss(m, o, c, pallas):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=o,
                colors=c, max_per_tile=64, use_pallas=pallas,
                pallas_interpret=pallas,
            )
            return img, jnp.mean((img - 0.25) ** 2)

        ref_img, _ = loss(means, opac, colors, False)
        img, _ = loss(means, opac, colors, True)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), atol=5e-5)

        g_ref = jax.grad(lambda *a: loss(*a, False)[1], argnums=(0, 1, 2))(
            means, opac, colors)
        g_pl = jax.grad(lambda *a: loss(*a, True)[1], argnums=(0, 1, 2))(
            means, opac, colors)
        for a, b, name in zip(g_ref, g_pl, ("means", "opac", "colors")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch at G_CT={g}: {name}",
            )
