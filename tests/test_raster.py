"""Rasterizer tests: oracle sanity, tiled == oracle, gradients vs finite
differences, edge cases (behind camera, tile borders, saturation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.ops.covariance import strip_symmetric, covariance_from_scaling_rotation
from d3ga_tpu.ops.quaternion import quat_normalize
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.oracle import rasterize_oracle
from d3ga_tpu.raster.tiles import rasterize_tiled
from d3ga_tpu.raster.api import rasterize, RasterSettings


def simple_camera(w=64, h=48):
    # Camera at origin looking down +z (identity R), gaussians at z>0.
    R = np.eye(3)
    T = np.zeros(3)
    fovx = focal2fov(60.0, w)
    fovy = focal2fov(60.0, h)
    return make_camera(R, T, fovx, fovy, w, h)


def random_scene(key, n=200, spread=0.8, z0=4.0, dz=2.0):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
            jax.random.uniform(ks[1], (n, 1), minval=z0, maxval=z0 + dz),
        ],
        axis=-1,
    )
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-3.5, maxval=-2.2))
    rots = quat_normalize(jax.random.normal(ks[3], (n, 4)))
    opac = jax.random.uniform(ks[4], (n, 1), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(ks[5], (n, 3))
    return means, scales, rots, opac, colors


class TestOracle:
    def test_empty_scene_is_background(self):
        cam = simple_camera()
        bg = jnp.array([0.2, 0.4, 0.6])
        means = jnp.zeros((4, 3)).at[:, 2].set(-5.0)  # all behind camera
        img = rasterize_oracle(
            means,
            cam,
            bg,
            scales=jnp.full((4, 3), 0.1),
            rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)),
            opacities=jnp.ones((4, 1)),
            colors=jnp.ones((4, 3)),
        )
        assert img.shape == (3, 48, 64)
        np.testing.assert_allclose(img, jnp.broadcast_to(bg[:, None, None], img.shape), atol=1e-6)

    def test_single_gaussian_center(self):
        cam = simple_camera()
        bg = jnp.zeros(3)
        means = jnp.array([[0.0, 0.0, 5.0]])
        img = rasterize_oracle(
            means,
            cam,
            bg,
            scales=jnp.full((1, 3), 0.3),
            rotations=jnp.array([[1.0, 0, 0, 0]]),
            opacities=jnp.array([[0.9]]),
            colors=jnp.array([[1.0, 0.5, 0.25]]),
        )
        # Center pixel (w/2-0.5 => pixels 31/32) should be strongly colored.
        assert img[0, 24, 32] > 0.5
        # Color ratio preserved
        np.testing.assert_allclose(img[1, 24, 32] / img[0, 24, 32], 0.5, atol=1e-4)
        # Corner is background
        np.testing.assert_allclose(img[:, 0, 0], 0.0, atol=1e-3)

    def test_depth_ordering(self):
        # Nearer opaque gaussian should dominate over farther one.
        cam = simple_camera()
        bg = jnp.zeros(3)
        means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]])
        img_near_red = rasterize_oracle(
            means,
            cam,
            bg,
            scales=jnp.full((2, 3), 0.4),
            rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
            opacities=jnp.array([[0.95], [0.95]]),
            colors=jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]]),
        )
        assert img_near_red[0, 24, 32] > img_near_red[1, 24, 32]

    def test_cov3d_equals_scales_rotations(self):
        cam = simple_camera()
        key = jax.random.PRNGKey(0)
        means, scales, rots, opac, colors = random_scene(key, n=50)
        bg = jnp.array([1.0, 1.0, 1.0])
        img_sr = rasterize_oracle(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac, colors=colors
        )
        cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
        img_cov = rasterize_oracle(
            means, cam, bg, cov3d=cov6, opacities=opac, colors=colors
        )
        np.testing.assert_allclose(img_sr, img_cov, atol=1e-5)

    def test_sh_degree0_matches_precomp(self):
        cam = simple_camera()
        key = jax.random.PRNGKey(1)
        means, scales, rots, opac, colors = random_scene(key, n=30)
        from d3ga_tpu.ops.sh import rgb_to_sh

        shs = jnp.zeros((30, 1, 3)).at[:, 0, :].set(rgb_to_sh(colors))
        bg = jnp.zeros(3)
        a = rasterize_oracle(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac, colors=colors
        )
        b = rasterize_oracle(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac, shs=shs,
            sh_degree=0,
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestTiledMatchesOracle:
    @pytest.mark.parametrize("n", [1, 400])
    def test_match(self, n):
        cam = simple_camera(w=80, h=56)  # non-multiple of 16 width/height
        key = jax.random.PRNGKey(n)
        means, scales, rots, opac, colors = random_scene(key, n=n)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = rasterize_oracle(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac, colors=colors
        )
        img, aux = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=512,
        )
        assert aux.overflow == 0
        np.testing.assert_allclose(img, ref, atol=2e-5)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(super_factor=1),
            dict(super_factor=1, sub_block=4, sub_cap=256),
            dict(super_factor=2, sub_block=4, sub_cap=256),
            dict(super_factor=2, sub_block=2, sub_cap=256),
            dict(block_cap=512, super_factor=2, sub_block=4, sub_cap=256),
            dict(coarse="dupsort"),
            dict(coarse="dupsort", dup=3),
            dict(coarse="dupsort", sub_block=4, sub_cap=256),
            dict(coarse="dupsort_tile"),
            dict(coarse="dupsort_tile", dup=2),
        ],
    )
    def test_funnel_variants_match(self, kw):
        # Every funnel configuration (levels, factors, caps) must select
        # the identical per-tile rank lists when no cap overflows.
        from d3ga_tpu.raster.tiles import _select_per_tile

        rng = np.random.default_rng(3)
        n, ntx, nty = 600, 16, 12
        x0 = rng.integers(0, ntx, size=n)
        y0 = rng.integers(0, nty, size=n)
        w = rng.integers(1, 3, size=n)
        h = rng.integers(1, 3, size=n)
        rects = (
            jnp.asarray(x0, jnp.int32),
            jnp.asarray(np.minimum(x0 + w, ntx), jnp.int32),
            jnp.asarray(y0, jnp.int32),
            jnp.asarray(np.minimum(y0 + h, nty), jnp.int32),
        )
        valid = jnp.asarray(rng.uniform(size=n) > 0.05)
        ref, ref_counts, ref_ov = _select_per_tile(
            rects, valid, ntx, nty, 64, super_factor=1
        )
        out, counts, ov = _select_per_tile(rects, valid, ntx, nty, 64, **kw)
        assert int(ref_ov) == 0 and int(ov) == 0
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_depthkey_matches_sorted_pipeline(self):
        # (tile|depth|index) key selection must reproduce the sorted-
        # rank pipeline exactly when depths are distinct at 22 bits.
        cam = simple_camera(w=160, h=112)
        key = jax.random.PRNGKey(11)
        means, scales, rots, opac, colors = random_scene(key, n=300)
        # moderate extents so dup=8 covers every rect span
        scales = jnp.exp(
            jax.random.uniform(jax.random.PRNGKey(12), (300, 3), minval=-4.6, maxval=-3.6)
        )
        means = means.at[:, 2].set(4.0 + jnp.arange(300) * 3e-3)
        bg = jnp.array([0.1, 0.2, 0.3])
        kw = dict(
            scales=scales, rotations=rots, opacities=opac, colors=colors,
            max_per_tile=256,
        )
        ref, raux = rasterize_tiled(means, cam, bg, **kw)
        assert int(raux.overflow) == 0
        # dup large enough for every rect span: exact match
        img, aux = rasterize_tiled(
            means, cam, bg, coarse="dupsort_depth", dup=8, **kw
        )
        assert int(aux.overflow) == 0
        np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
        # undersized dup must COUNT its clamp drops, never drop silently
        big = means.at[0].set(jnp.array([0.0, 0.0, 4.0]))
        bscales = scales.at[0].set(0.3)
        _, aux2 = rasterize_tiled(
            big, cam, bg, scales=bscales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=256, coarse="dupsort_depth", dup=2,
        )
        assert int(aux2.overflow) > 0
        # pallas record path agrees too
        img_p, _ = rasterize_tiled(
            means, cam, bg, coarse="dupsort_depth", dup=8,
            use_pallas=True, pallas_interpret=True, **kw
        )
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(ref), atol=2e-5)

    def test_depthkey_quantum_ties_adversarial(self):
        """Layered translucency at NEAR-EQUAL depths (all within one
        19-bit depth quantum): the quantized dupsort_depth default must
        (a) COUNT the unresolved ties in aux.depth_ties, and (b) its
        depth_exact escape must reproduce the full-precision
        dupsort_tile blend order bit-for-bit — the CUDA reference packs
        the full f32 depth bit pattern into its sort keys
        (`/root/reference/renderer.py:130-141`, docs/ORACLE_AUDIT.md
        row 18)."""
        cam = simple_camera(w=96, h=64)
        n = 64
        key = jax.random.PRNGKey(5)
        # a stack of big translucent Gaussians over the same pixels,
        # depths spread by ~1e-5 around 3.0 — far inside one quantum
        # (19-bit keys resolve ~3.0 * 2^-11 ~ 1.5e-3)
        means = jnp.concatenate(
            [
                jax.random.normal(key, (n, 2)) * 0.02,
                3.0 + jnp.arange(n, dtype=jnp.float32)[:, None] * 1e-5
                - 32e-5,
            ],
            axis=-1,
        )
        # shuffle depth order vs index order so index tie-breaks are WRONG
        means = means.at[:, 2].set(
            jax.random.permutation(jax.random.PRNGKey(6), means[:, 2])
        )
        cov = jnp.tile(jnp.array([[4e-3, 0.0, 0.0, 4e-3, 0.0, 1e-6]]), (n, 1))
        opac = jnp.full((n,), 0.35)
        colors = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))
        bg = jnp.array([0.3, 0.2, 0.1])
        kw = dict(cov3d=cov, opacities=opac, colors=colors, max_per_tile=128)

        ref, _ = rasterize_tiled(means, cam, bg, coarse="dupsort_tile",
                                 dup=8, **kw)
        img_q, aux_q = rasterize_tiled(means, cam, bg, coarse="dupsort_depth",
                                       dup=8, depth_exact=False, **kw)
        img_e, aux_e = rasterize_tiled(means, cam, bg, coarse="dupsort_depth",
                                       dup=8, depth_exact=True, **kw)
        # quantized mode: every adjacent pair shares the quantum
        assert int(aux_q.depth_ties) > 0
        # exact mode: ties resolved, counter pinned 0, image == the
        # full-precision stable-argsort pipeline
        assert int(aux_e.depth_ties) == 0
        np.testing.assert_array_equal(np.asarray(img_e), np.asarray(ref))
        # the quantized image deviates measurably here (wrong blend
        # order) — this is exactly what the tie counter + train.py
        # auto-escape exist for; bound the worst case so silent
        # catastrophic deviation still fails the suite
        dev = float(jnp.max(jnp.abs(img_q - ref)))
        assert dev < 0.15, dev

        # pallas + slotmap path honors depth_exact identically
        img_pe, aux_pe = rasterize_tiled(
            means, cam, bg, coarse="dupsort_depth", dup=8, depth_exact=True,
            use_pallas=True, pallas_interpret=True, **kw
        )
        assert int(aux_pe.depth_ties) == 0
        np.testing.assert_allclose(
            np.asarray(img_pe), np.asarray(ref), atol=2e-5
        )

        # a well-separated scene resolves at 19 bits: quantized == exact
        means2 = means.at[:, 2].set(3.0 + jnp.arange(n, dtype=jnp.float32) * 0.01)
        a, aux_a = rasterize_tiled(means2, cam, bg, coarse="dupsort_depth",
                                   dup=8, depth_exact=False, **kw)
        b, _ = rasterize_tiled(means2, cam, bg, coarse="dupsort_depth",
                               dup=8, depth_exact=True, **kw)
        assert int(aux_a.depth_ties) == 0
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("coarse", ["dupsort_tile", "dupsort_depth"])
    def test_dupsort_empty_scene(self, coarse):
        # All Gaussians behind the camera: dup-sort paths must produce
        # the pure background image without NaNs.
        cam = simple_camera(w=64, h=48)
        means = jnp.tile(jnp.array([[0.0, 0.0, -5.0]]), (20, 1))
        scales = jnp.full((20, 3), 0.05)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (20, 1))
        opac = jnp.full((20, 1), 0.5)
        colors = jnp.ones((20, 3))
        bg = jnp.array([0.3, 0.6, 0.9])
        for pallas in (False, True):
            img, aux = rasterize_tiled(
                means, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=32, coarse=coarse,
                use_pallas=pallas, pallas_interpret=pallas,
            )
            assert int(aux.n_contrib) == 0
            np.testing.assert_allclose(
                np.asarray(img),
                np.broadcast_to(np.asarray(bg)[:, None, None], (3, 48, 64)),
                atol=1e-6,
            )

    def test_dupsort_clamp_is_counted(self):
        # A rect spanning 3 blocks per side exceeds dup=2 coverage: the
        # dropped (block, gaussian) pairs must be counted, and dup=3
        # must recover the exact top_k result.
        from d3ga_tpu.raster.tiles import _select_per_tile

        ntx, nty = 24, 24  # 3x3 blocks of 8 tiles
        rects = (
            jnp.array([0, 2], jnp.int32),
            jnp.array([20, 4], jnp.int32),   # first rect spans 3 blocks in x
            jnp.array([0, 2], jnp.int32),
            jnp.array([20, 4], jnp.int32),
        )
        valid = jnp.array([True, True])
        ref, ref_counts, ref_ov = _select_per_tile(
            rects, valid, ntx, nty, 8, super_factor=1
        )
        assert int(ref_ov) == 0
        out2, _, ov2 = _select_per_tile(
            rects, valid, ntx, nty, 8, coarse="dupsort", dup=2
        )
        assert int(ov2) == 5  # 9 covered blocks, 4 emitted
        out3, counts3, ov3 = _select_per_tile(
            rects, valid, ntx, nty, 8, coarse="dupsort", dup=3
        )
        assert int(ov3) == 0
        np.testing.assert_array_equal(np.asarray(out3), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(counts3), np.asarray(ref_counts))

    def test_saturated_early_termination(self):
        # Stack many opaque gaussians: T < 1e-4 termination must match.
        cam = simple_camera()
        n = 64
        means = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1)).at[:, 2].set(
            3.0 + jnp.arange(n) * 0.01
        )
        scales = jnp.full((n, 3), 0.5)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n, 1), 0.99)
        colors = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
        bg = jnp.ones(3)
        ref = rasterize_oracle(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac, colors=colors
        )
        img, _ = rasterize_tiled(
            means, cam, bg, scales=scales, rotations=rots, opacities=opac,
            colors=colors, max_per_tile=128,
        )
        np.testing.assert_allclose(img, ref, atol=2e-5)

    def test_overflow_counter(self):
        cam = simple_camera()
        n = 32
        means = jnp.zeros((n, 3)).at[:, 2].set(5.0)
        img, aux = rasterize_tiled(
            means,
            cam,
            jnp.zeros(3),
            scales=jnp.full((n, 3), 0.01),
            rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            opacities=jnp.full((n, 1), 0.01),  # transparent: cap harmless
            colors=jnp.ones((n, 3)),
            max_per_tile=8,
        )
        assert aux.overflow > 0
        assert aux.max_per_tile == n


class TestGradients:
    def test_grad_matches_finite_difference(self):
        cam = simple_camera(w=32, h=32)
        key = jax.random.PRNGKey(5)
        means, scales, rots, opac, colors = random_scene(key, n=12, spread=0.4)
        bg = jnp.zeros(3)
        target = jax.random.uniform(jax.random.PRNGKey(6), (3, 32, 32))

        def loss(params):
            img, _ = rasterize_tiled(
                params["means"],
                cam,
                bg,
                scales=params["scales"],
                rotations=rots,
                opacities=params["opac"],
                colors=params["colors"],
                max_per_tile=64,
            )
            return jnp.mean((img - target) ** 2)

        params = {"means": means, "scales": scales, "opac": opac, "colors": colors}
        g = jax.grad(loss)(params)

        # Finite differences on a few coordinates of each leaf. The
        # rasterizer has genuine kinks (alpha >= 1/255 skip, T < 1e-4
        # cut, tile-membership changes); coordinates where FD at two
        # step sizes disagrees are nonsmooth and skipped.
        loss_j = jax.jit(loss)

        def fd(name, i, eps):
            def shift(s):
                p = dict(params)
                arr = np.asarray(params[name]).copy().ravel()
                arr[i] += s
                p[name] = jnp.asarray(arr.reshape(params[name].shape))
                return loss_j(p)

            return (shift(eps) - shift(-eps)) / (2 * eps)

        rng = np.random.RandomState(0)
        n_checked = 0
        for name in params:
            flat = np.asarray(params[name]).ravel()
            gflat = np.asarray(g[name]).ravel()
            idxs = rng.choice(flat.size, size=min(3, flat.size), replace=False)
            for i in idxs:
                eps = 1e-3 if name != "means" else 5e-4
                fd1 = fd(name, i, eps)
                fd2 = fd(name, i, eps / 2)
                if abs(fd1 - fd2) > 0.02 * abs(fd1) + 1e-5:
                    continue  # nonsmooth coordinate
                n_checked += 1
                np.testing.assert_allclose(
                    gflat[i], fd2, rtol=0.05, atol=1e-4,
                    err_msg=f"grad mismatch {name}[{i}]",
                )
        assert n_checked >= 6, "too few smooth coordinates checked"

    def test_oracle_and_tiled_grads_agree(self):
        cam = simple_camera(w=48, h=32)
        key = jax.random.PRNGKey(9)
        means, scales, rots, opac, colors = random_scene(key, n=40)
        bg = jnp.array([0.5, 0.5, 0.5])

        def loss_tiled(m):
            img, _ = rasterize_tiled(
                m, cam, bg, scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=128,
            )
            return jnp.sum(img**2)

        def loss_oracle(m):
            img = rasterize_oracle(
                m, cam, bg, scales=scales, rotations=rots, opacities=opac, colors=colors
            )
            return jnp.sum(img**2)

        g1 = jax.grad(loss_tiled)(means)
        g2 = jax.grad(loss_oracle)(means)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)


class TestAPI:
    def test_rasterize_validates(self):
        cam = simple_camera()
        with pytest.raises(ValueError):
            rasterize(cam, jnp.zeros((1, 3)), jnp.ones((1, 1)), jnp.zeros(3))

    def test_jit_and_settings(self):
        cam = simple_camera()
        key = jax.random.PRNGKey(2)
        means, scales, rots, opac, colors = random_scene(key, n=20)

        @jax.jit
        def run(m):
            img, _ = rasterize(
                cam, m, opac, jnp.zeros(3), scales=scales, rotations=rots,
                colors=colors, settings=RasterSettings(max_per_tile=64),
            )
            return img

        img = run(means)
        assert img.shape == (3, 48, 64)
        assert bool(jnp.all(jnp.isfinite(img)))


class TestReferenceAsset:
    def test_simplified_ply_renders(self):
        """BASELINE config #1 shape: the in-tree Goliath debug body as a
        static isotropic splat (CUDA reference unavailable in this
        environment; the oracle — verified against the tiled path — is
        the arbiter per SURVEY.md §4.3)."""
        from d3ga_tpu.utils.ply import load_ply
        from d3ga_tpu.ops.knn import knn_mean_sq_dist

        mesh = load_ply("/root/reference/assets/simplified.ply")
        v = jnp.asarray(mesh["vertices"], jnp.float32)
        # subsample for CPU test speed; center and push in front of camera
        v = v[::12]
        v = (v - v.mean(0)) / (jnp.abs(v - v.mean(0)).max() + 1e-6)
        means = v.at[:, 2].add(4.0)
        n = means.shape[0]
        scales = jnp.full((n, 3), 0.01)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n, 1), 0.8)
        colors = jnp.abs(v)
        cam = simple_camera(w=96, h=96)
        img, aux = rasterize_tiled(
            means, cam, jnp.ones(3), scales=scales, rotations=rots,
            opacities=opac, colors=colors, max_per_tile=256,
        )
        assert bool(jnp.all(jnp.isfinite(img)))
        # body silhouette covers part of the image; border stays white
        assert float(jnp.mean(jnp.abs(img - 1.0))) > 0.01
        np.testing.assert_allclose(img[:, 0, 0], 1.0, atol=1e-4)
        # gradcheck smoke: grads flow from pixels to positions
        g = jax.grad(
            lambda m: jnp.sum(
                rasterize_tiled(
                    m, cam, jnp.ones(3), scales=scales, rotations=rots,
                    opacities=opac, colors=colors, max_per_tile=256,
                )[0]
            )
        )(means)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0


class TestRenderAPI:
    def test_render_contract_and_paste(self):
        """High-level render() mirrors the reference renderer contract
        (`/root/reference/renderer.py:69-145`): pkg dict in, cropped
        {"render": [C,H',W']} out, detach list honored."""
        from d3ga_tpu.raster.api import RasterSettings, render

        cam = simple_camera(w=64, h=48)
        means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(0), n=30)
        cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
        pkg = {
            "means3D": means,
            "cov3D_precomp": cov6,
            "opacities": opac,
            "rgb": colors,
            "shs": None,
            "sh_degree": 0,
        }
        # crop [left,right,top,bottom,W,H]: render 64x48 -> keep 60x40
        batch = {"camera": cam, "crop": (30, 30, 20, 20, 60, 40)}
        out = render(batch, pkg, bg_color=jnp.ones(3),
                     settings=RasterSettings(max_per_tile=64))
        assert out["render"].shape == (3, 40, 60)

        # detach position: no gradient to means through the render
        def loss(m):
            p = dict(pkg, means3D=m)
            o = render({"camera": cam, "crop": None}, p, jnp.ones(3),
                       detach=("position",),
                       settings=RasterSettings(max_per_tile=64))
            return jnp.sum(o["render"])

        g = jax.grad(loss)(means)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def test_config_interpolation(self, tmp_path):
        from d3ga_tpu.utils.config import load_yaml_config

        p = tmp_path / "c.yml"
        p.write_text(
            "capture_id: AXE\n"
            "train:\n"
            "  tag: d3ga\n"
            "  run_dir: experiments/${.tag}/${capture_id}/\n"
            "  ckpt_dir: ${.run_dir}/checkpoints\n"
        )
        cfg = load_yaml_config(str(p))
        assert cfg["train"]["run_dir"] == "experiments/d3ga/AXE/"
        assert cfg["train"]["ckpt_dir"] == "experiments/d3ga/AXE//checkpoints"


class TestBatchedRaster:
    """rasterize_tiled_batch (round 5: frames stacked vertically in tile
    space through the champion dupsort_depth selection + ct blend) must
    match per-frame rasterize_tiled AT THE SAME selection semantics and
    emit the full RasterAux counter set (VERDICT r4 #6)."""

    def test_matches_single_frame(self):
        from d3ga_tpu.raster.camera import stack_cameras
        from d3ga_tpu.raster.tiles import rasterize_tiled, rasterize_tiled_batch

        B = 3
        cams = [simple_camera(w=64, h=48) for _ in range(B)]
        # distinct scenes per frame
        scenes = [random_scene(jax.random.PRNGKey(i), n=150) for i in range(B)]
        bgs = jnp.stack([jnp.full(3, 0.1 * i) for i in range(B)])

        refs = []
        for (means, scales, rots, opac, colors), cam, bg in zip(scenes, cams, bgs):
            img, _ = rasterize_tiled(
                means, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=64,
                coarse="dupsort_depth", dup=3,
            )
            refs.append(img)

        batch = {
            k: jnp.stack([s[i] for s in scenes])
            for i, k in enumerate(("means", "scales", "rots", "opac", "colors"))
        }
        imgs, aux = rasterize_tiled_batch(
            batch["means"], stack_cameras(cams), bgs,
            scales=batch["scales"], rotations=batch["rots"],
            opacities=batch["opac"], colors=batch["colors"], max_per_tile=64,
        )
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(imgs[i]), np.asarray(refs[i]), atol=1e-6
            )
        # the batched path reports the champion counter set (no silent
        # caps: ties/clamp/visible all computed, not -1)
        assert int(aux.depth_ties) >= 0
        assert int(aux.clamp_overflow) >= 0
        assert int(aux.visible_overflow) >= 0

    def test_pallas_matches_single_frame(self):
        """use_pallas=True batch path (ct kernel with frame_rows pixel-y
        wrap + one selection over the stacked grid) vs per-frame pallas
        renders — per-frame pixel coords make this near-bit-exact."""
        from d3ga_tpu.raster.camera import stack_cameras
        from d3ga_tpu.raster.tiles import rasterize_tiled, rasterize_tiled_batch

        B = 2
        cams = [simple_camera(w=64, h=48) for _ in range(B)]
        scenes = [random_scene(jax.random.PRNGKey(10 + i), n=200) for i in range(B)]
        bg = jnp.array([0.2, 0.4, 0.6])

        refs = []
        for (means, scales, rots, opac, colors), cam in zip(scenes, cams):
            img, _ = rasterize_tiled(
                means, cam, bg, scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=64,
                coarse="dupsort_depth", dup=3, use_pallas=True,
                pallas_interpret=True,
            )
            refs.append(img)

        batch = {
            k: jnp.stack([s[i] for s in scenes])
            for i, k in enumerate(("means", "scales", "rots", "opac", "colors"))
        }
        imgs, _ = rasterize_tiled_batch(
            batch["means"], stack_cameras(cams), bg,
            scales=batch["scales"], rotations=batch["rots"],
            opacities=batch["opac"], colors=batch["colors"], max_per_tile=64,
            use_pallas=True, pallas_interpret=True,
        )
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(imgs[i]), np.asarray(refs[i]), atol=1e-6
            )

    def test_batched_gradients_flow(self):
        from d3ga_tpu.raster.camera import stack_cameras
        from d3ga_tpu.raster.tiles import rasterize_tiled, rasterize_tiled_batch

        B = 2
        cams = [simple_camera(w=32, h=32) for _ in range(B)]
        scenes = [random_scene(jax.random.PRNGKey(i), n=60) for i in range(B)]
        means = jnp.stack([s[0] for s in scenes])
        scales = jnp.stack([s[1] for s in scenes])
        rots = jnp.stack([s[2] for s in scenes])
        opac = jnp.stack([s[3] for s in scenes])
        colors = jnp.stack([s[4] for s in scenes])
        sc = stack_cameras(cams)

        def loss_b(m):
            imgs, _ = rasterize_tiled_batch(
                m, sc, jnp.zeros(3), scales=scales, rotations=rots,
                opacities=opac, colors=colors, max_per_tile=32,
            )
            return jnp.sum(imgs**2)

        g = jax.grad(loss_b)(means)
        # per-frame gradients must match the single-frame rasterizer's
        for i in range(B):
            def loss_1(m, i=i):
                img, _ = rasterize_tiled(
                    m, cams[i], jnp.zeros(3), scales=scales[i], rotations=rots[i],
                    opacities=opac[i], colors=colors[i], max_per_tile=32,
                    coarse="dupsort_depth", dup=3,
                )
                return jnp.sum(img**2)

            gi = jax.grad(loss_1)(means[i])
            np.testing.assert_allclose(
                np.asarray(g[i]), np.asarray(gi), rtol=2e-3, atol=2e-4
            )


class TestBackwardVariants:
    """The env-gated perf variants (D3GA_REC_GRAD=dupslot,
    D3GA_REORDER=sortpayload) must produce identical images and
    gradients to the default pipeline."""

    def _loss_fn(self, variant_env):
        import d3ga_tpu.raster.tiles as tiles

        def loss(means, scales, rots, opac, colors, cam):
            img, _ = rasterize_tiled(
                means, cam, jnp.array([0.1, 0.2, 0.3]),
                scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=64, coarse="dupsort_tile",
                use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img**2), img

        return loss

    @pytest.mark.parametrize(
        "rec_grad,reorder",
        [("dupslot", "argsort"), ("add", "sortpayload"), ("dupslot", "sortpayload")],
    )
    def test_variants_match_default(self, monkeypatch, rec_grad, reorder):
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=80, h=56)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(7), n=300
        )
        loss = self._loss_fn(None)

        monkeypatch.setattr(tiles, "REC_GRAD", "add")
        monkeypatch.setattr(tiles, "REORDER", "argsort")
        (ref_l, ref_img), ref_g = jax.value_and_grad(loss, argnums=(0, 3), has_aux=True)(
            means, scales, rots, opac, colors, cam
        )

        monkeypatch.setattr(tiles, "REC_GRAD", rec_grad)
        monkeypatch.setattr(tiles, "REORDER", reorder)
        (l2, img2), g2 = jax.value_and_grad(loss, argnums=(0, 3), has_aux=True)(
            means, scales, rots, opac, colors, cam
        )

        np.testing.assert_allclose(np.asarray(img2), np.asarray(ref_img), atol=1e-6)
        for a, b in zip(ref_g, g2):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
            )

    def test_dupslot_grad_vs_finite_difference(self, monkeypatch):
        # the custom-VJP gather itself: numeric check on a tiny scene
        import d3ga_tpu.raster.tiles as tiles

        monkeypatch.setattr(tiles, "REC_GRAD", "dupslot")
        cam = simple_camera(w=48, h=32)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(3), n=24
        )

        def loss(op):
            img, _ = rasterize_tiled(
                means, cam, jnp.zeros(3), scales=scales, rotations=rots,
                opacities=op, colors=colors, max_per_tile=32,
                coarse="dupsort_tile", use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img * jnp.cos(img))

        g = jax.grad(loss)(opac)
        eps = 1e-3
        rng = np.random.default_rng(0)
        for _ in range(4):
            i = rng.integers(0, opac.shape[0])
            d = np.zeros(opac.shape, np.float32)
            d[i, 0] = eps
            f1 = float(loss(opac + d))
            f0 = float(loss(opac - d))
            fd = (f1 - f0) / (2 * eps)
            np.testing.assert_allclose(float(g[i, 0]), fd, rtol=5e-2, atol=5e-4)

    @pytest.mark.parametrize("k,n", [(32, 300), (16, 600)])
    def test_runsort_grads_match_scatter_add(self, monkeypatch, k, n):
        """The sorted-run-reduce backward (explicit sort + fixed-depth
        segmented sum; no scatter) must reproduce the XLA scatter-add
        gradients on the dupsort_depth champion path, including over-cap
        tiles (sentinel slots sort to the tail) and clamped spans."""
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=80, h=56)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(13), n=n
        )

        def loss(means, scales, rots, opac, colors):
            img, aux = rasterize_tiled(
                means, cam, jnp.array([0.1, 0.2, 0.3]),
                scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=k, coarse="dupsort_depth",
                dup=2, use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img**2), (img, aux)

        monkeypatch.setattr(tiles, "REC_GRAD", "add")
        (_, (ref_img, ref_aux)), ref_g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        monkeypatch.setattr(tiles, "REC_GRAD", "runsort")
        (_, (img2, _aux2)), g2 = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        if k == 16:
            assert int(ref_aux.overflow) > 0
        assert np.array_equal(np.asarray(img2), np.asarray(ref_img))
        for a, b in zip(ref_g, g2):
            # run sums accumulate in sorted-slot order; XLA's scatter
            # combine may associate differently — allow float32 ulp slop
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-6, atol=1e-7
            )

    @pytest.mark.parametrize("k,n", [(32, 300), (16, 600)])
    def test_slotmap_grads_bitmatch_scatter_add(self, monkeypatch, k, n):
        """The slot-map backward (construction-known gradient-row
        positions; no scatter) must be BIT-identical to the XLA
        scatter-add transpose on the dupsort_depth champion path —
        including tiles past the K cap (dead slots read the zero
        sentinel) and clamped dup spans."""
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=80, h=56)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(11), n=n
        )

        def loss(means, scales, rots, opac, colors):
            img, aux = rasterize_tiled(
                means, cam, jnp.array([0.1, 0.2, 0.3]),
                scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=k, coarse="dupsort_depth",
                dup=2, use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img**2), (img, aux)

        monkeypatch.setattr(tiles, "REC_GRAD", "add")
        (_, (ref_img, ref_aux)), ref_g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        monkeypatch.setattr(tiles, "REC_GRAD", "slotmap")
        (_, (img2, aux2)), g2 = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        # exercise the overflow/dead-slot machinery for real
        if k == 16:
            assert int(ref_aux.overflow) > 0
        assert np.array_equal(np.asarray(img2), np.asarray(ref_img))
        for a, b in zip(ref_g, g2):
            assert np.array_equal(np.asarray(a), np.asarray(b))


class TestBigGaussianOverflow:
    """The dupsort selection clamps tile spans at `dup` tiles and must
    COUNT every dropped (tile, Gaussian) pair (`tiles.py` clamp_dropped;
    the reference's CUDA rasterizer is uncapped, `renderer.py:130-141`),
    and train.py's automatic widening must converge to a config that
    drops nothing."""

    def _scene(self, w=128, h=96):
        from helpers import test_camera

        cam = test_camera(w=w, h=h, focal=80.0)
        # one huge Gaussian centered in view: screen radius >> 4 tiles
        means = jnp.array([[0.0, 0.0, 2.0]])
        cov = jnp.array([[0.5, 0.0, 0.0, 0.5, 0.0, 0.5]])  # big iso
        opac = jnp.array([0.9])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        return cam, means, cov, opac, colors

    def test_clamped_span_counts_drops(self):
        cam, means, cov, opac, colors = self._scene()
        img_d, aux_d = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=8, coarse="dupsort_tile", dup=4,
        )
        assert int(aux_d.overflow) > 0  # drops counted, never silent
        # the 4x4-tile window renders; tiles beyond it miss the Gaussian
        img_t, aux_t = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=8, coarse="topk",
        )
        assert int(aux_t.overflow) == 0
        assert float(jnp.abs(img_t - img_d).max()) > 0.1  # real drops
        # corner pixel is covered by topk but outside the dup window
        assert float(img_t[0, 0, 0]) > 0.01
        assert float(img_d[0, -1, -1]) < float(img_t[0, -1, -1]) + 1e-6

    def test_widen_raster_opts_sequence(self):
        import runpy
        import sys

        sys.path.insert(0, ".")
        train_mod = runpy.run_path("train.py", run_name="not_main")
        widen = train_mod["_widen_raster_opts"]
        cfg = {"raster_opts": {"coarse": "dupsort_tile", "dup": 4}}
        assert widen(cfg) and cfg["raster_opts"]["dup"] == 6
        assert widen(cfg) and cfg["raster_opts"]["dup"] == 8
        assert widen(cfg) and cfg["raster_opts"]["coarse"] == "topk"
        assert not widen(cfg)  # no train cfg: nothing left to widen

        # with the train config, the per-tile record budget escalates
        # after the funnel is span-uncapped (256 -> 384 -> 512), then
        # the config is terminal
        cfg = {"raster_opts": {"coarse": "dupsort_depth", "dup": 8}}
        tcfg = {"max_per_tile": 256}
        assert widen(cfg, tcfg) and cfg["raster_opts"]["coarse"] == "topk"
        assert widen(cfg, tcfg) and tcfg["max_per_tile"] == 384
        assert widen(cfg, tcfg) and tcfg["max_per_tile"] == 512
        assert not widen(cfg, tcfg)

        # clamp_overflow == 0 routes straight to the K budget (the dup
        # window drops nothing; dup recompiles would be useless)
        cfg = {"raster_opts": {"coarse": "dupsort_depth", "dup": 4}}
        tcfg = {"max_per_tile": 256}
        assert widen(cfg, tcfg, clamp_overflow=0)
        assert cfg["raster_opts"]["dup"] == 4  # untouched
        assert tcfg["max_per_tile"] == 384
        # unknown/positive clamp keeps the conservative dup-first order
        assert widen(cfg, tcfg, clamp_overflow=7)
        assert cfg["raster_opts"]["dup"] == 6

    def test_training_loop_escalates_max_per_tile(self, tmp_path):
        """FULLRES-style trigger: deep translucent tiles overflow a tiny
        per-tile budget with transmittance still live, and the training
        loop must raise max_per_tile automatically (recompile), mirroring
        the dup auto-widening — the reference rasterizer has no cap at
        all (`/root/reference/renderer.py:130-141`)."""
        import runpy
        import sys

        import yaml

        sys.path.insert(0, ".")
        cfg = yaml.safe_load(open("configs/synthetic_smoke.yml"))
        cfg["n_gaussians"] = 512
        cfg["image_height"] = cfg["image_width"] = 64
        cfg["train"].update(
            {
                "iterations": 2,
                "log_n_steps": 1,
                "checkpoint_n_steps": 100,
                "run_dir": str(tmp_path / "run"),
                "max_per_tile": 8,
                "raster_opts": {"coarse": "topk"},
            }
        )
        train_mod = runpy.run_path("train.py", run_name="not_main")
        train_mod["training"](cfg)
        # span-uncapped funnel + visible cap overflow -> K escalated
        assert cfg["train"]["max_per_tile"] > 8

    def test_widened_config_renders_big_gaussian(self):
        cam, means, cov, opac, colors = self._scene()
        img_t, _ = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=8, coarse="topk",
        )
        img_8, aux_8 = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=8, coarse="dupsort_tile", dup=8,
        )
        # 128x96 px = 8x6 tiles: dup=8 covers the full span -> identical
        np.testing.assert_allclose(
            np.asarray(img_8), np.asarray(img_t), atol=1e-6
        )
        assert int(aux_8.overflow) == 0


class TestVisibleOverflow:
    """`visible_cap_drops`: per-tile-cap drops are benign (not counted)
    when the tile's final transmittance is already exhausted — the
    uncapped CUDA kernel terminates at T < 1e-4 too
    (`renderer.py:130-141`)."""

    def _stack(self, n, opac_val, w=32, h=32):
        from helpers import test_camera

        cam = test_camera(w=w, h=h, focal=60.0)
        # n identical LARGE Gaussians (footprint covers every tile of
        # the image — the per-tile max-transmittance criterion is sound
        # but conservative, so the benign case needs full coverage)
        means = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
        means = means + jnp.linspace(0, 0.01, n)[:, None] * jnp.array([0, 0, 1.0])
        cov = jnp.tile(jnp.array([[4.0, 0, 0, 4.0, 0, 4.0]]), (n, 1))
        opac = jnp.full((n,), opac_val)
        colors = jnp.tile(jnp.array([[1.0, 0.5, 0.2]]), (n, 1))
        return cam, means, cov, opac, colors

    def test_opaque_overcap_is_benign(self):
        cam, means, cov, opac, colors = self._stack(48, 0.95)
        img, aux = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=16,
        )
        assert int(aux.overflow) > 0              # raw cap drops counted
        assert int(aux.visible_overflow) == 0     # ...but provably unseen
        # the capped image equals the uncapped one
        ref, _ = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=64,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)

    def test_translucent_overcap_is_visible(self):
        cam, means, cov, opac, colors = self._stack(48, 0.02)
        img, aux = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=16,
        )
        assert int(aux.overflow) > 0
        assert int(aux.visible_overflow) > 0      # drops actually show
        ref, _ = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=64,
        )
        assert float(jnp.abs(img - ref).max()) > 1e-3

    def test_pallas_path_matches_xla_counter(self):
        cam, means, cov, opac, colors = self._stack(48, 0.95)
        _, aux_x = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=16,
        )
        _, aux_p = rasterize_tiled(
            means, cam, jnp.zeros(3), cov3d=cov, opacities=opac,
            colors=colors, max_per_tile=16, use_pallas=True,
            coarse="dupsort_tile", dup=4,
        )
        assert int(aux_p.visible_overflow) == int(aux_x.visible_overflow)
