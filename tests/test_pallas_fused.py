"""Fused select+compact+blend kernel vs the reference XLA pipeline
(interpret mode on CPU; compiled-parity runs on-chip via
tools/pallas_parity.py).

The fused kernels are ATTIC variants (measured dead ends, see
d3ga_tpu/raster/attic/): these tests only run with D3GA_TEST_ATTIC=1
so default CI doesn't pay for them."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if os.environ.get("D3GA_TEST_ATTIC", "0") != "1":
    pytest.skip(
        "attic kernel variants (set D3GA_TEST_ATTIC=1 to test)",
        allow_module_level=True,
    )

from test_raster import random_scene, simple_camera

from d3ga_tpu.raster.tiles import rasterize_tiled, rasterize_tiled_fused


def _scene(n=400, w=144, h=128, seed=0):
    cam = simple_camera(w=w, h=h)
    means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(seed), n=n)
    return cam, means, scales, rots, opac, colors


class TestFusedForward:
    def test_matches_xla_pipeline(self):
        cam, means, scales, rots, opac, colors = _scene()
        bg = jnp.array([0.25, 0.5, 0.75])
        ref, aux_ref = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128,
        )
        img, aux = rasterize_tiled_fused(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)
        assert int(aux.max_per_tile) == int(aux_ref.max_per_tile)
        assert int(aux.n_contrib) == int(aux_ref.n_contrib)
        assert int(aux.overflow) == int(aux_ref.overflow)

    def test_k_cap_overflow_counted(self):
        cam, means, scales, rots, opac, colors = _scene(n=600, w=64, h=64, seed=3)
        bg = jnp.zeros(3)
        ref, aux_ref = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=32,
        )
        img, aux = rasterize_tiled_fused(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)
        assert int(aux.overflow) == int(aux_ref.overflow) and int(aux.overflow) > 0

    def test_six_channel_colors(self):
        """The fused RGB+silhouette 6-channel path."""
        cam, means, scales, rots, opac, colors = _scene(n=200, w=96, h=80, seed=5)
        colors6 = jnp.concatenate([colors, 1.0 - colors], axis=-1)
        bg6 = jnp.concatenate([jnp.full(3, 0.3), jnp.zeros(3)])
        ref, _ = rasterize_tiled(
            means, cam, bg6, scales=scales, rotations=rots, opacities=opac,
            colors=colors6, max_per_tile=64,
        )
        img, _ = rasterize_tiled_fused(
            means, cam, bg6, scales=scales, rotations=rots, opacities=opac,
            colors=colors6, max_per_tile=64, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


class TestFusedBackward:
    def test_grads_match_xla_pipeline(self):
        cam, means, scales, rots, opac, colors = _scene(n=250, w=96, h=80, seed=7)
        from d3ga_tpu.ops.covariance import (
            covariance_from_scaling_rotation,
            strip_symmetric,
        )

        cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
        bg = jnp.array([0.1, 0.2, 0.3])
        wgt = jax.random.uniform(jax.random.PRNGKey(9), (3, 80, 96))

        def loss(fn, m, c6, op, co, **kw):
            img, _ = fn(
                m, cam, bg, cov3d=c6, opacities=op, colors=co,
                max_per_tile=64, **kw,
            )
            return jnp.sum(img * wgt)

        g_ref = jax.grad(
            lambda *a: loss(rasterize_tiled, *a), argnums=(0, 1, 2, 3)
        )(means, cov6, opac, colors)
        g_fused = jax.grad(
            lambda *a: loss(rasterize_tiled_fused, *a, interpret=True),
            argnums=(0, 1, 2, 3),
        )(means, cov6, opac, colors)
        for a, b, name in zip(g_ref, g_fused, ("means", "cov6", "opac", "colors")):
            a = np.asarray(a)
            b = np.asarray(b)
            scale = max(np.abs(a).max(), 1e-12)
            # cov6 grads pass through the conic inverse; a handful of
            # elements differ at ~2e-4 relative from fp ordering alone
            np.testing.assert_allclose(
                b / scale, a / scale, atol=2e-4, err_msg=f"grad {name}"
            )
