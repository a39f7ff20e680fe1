import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.train.losses import (
    l1_loss,
    l2_loss,
    bce_loss,
    masked_psnr,
    masked_ssim,
    psnr,
    ssim,
    init_vgg19_features,
    vgg_loss,
)
from d3ga_tpu.train.optim import (
    make_optimizer,
    multistep_schedule,
    lr_tree_from_config,
)


class TestBasicLosses:
    def test_l1_l2(self):
        a = jnp.array([1.0, 2.0])
        b = jnp.array([0.0, 0.0])
        np.testing.assert_allclose(l1_loss(a, b), 1.5)
        np.testing.assert_allclose(l2_loss(a, b), 2.5)

    def test_psnr(self):
        a = jnp.full((3, 4, 4), 0.5)
        b = jnp.full((3, 4, 4), 0.6)
        np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-4)

    def test_masked_metrics_ignore_padding(self):
        # A canvas-padded pair: identical zeros in the pad, real error
        # in the valid region. Masked metrics must equal the unmasked
        # metrics computed on the valid crop alone.
        rng = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(rng)
        a_core = jax.random.uniform(k1, (3, 16, 16))
        b_core = jax.random.uniform(k2, (3, 16, 16))
        a = jnp.zeros((3, 24, 24)).at[:, :16, :16].set(a_core)
        b = jnp.zeros((3, 24, 24)).at[:, :16, :16].set(b_core)
        mask = jnp.zeros((1, 24, 24)).at[:, :16, :16].set(1.0)
        np.testing.assert_allclose(
            masked_psnr(a, b, mask), psnr(a_core, b_core), atol=1e-4
        )
        # unmasked PSNR on the padded canvas is inflated
        assert float(psnr(a, b)) > float(masked_psnr(a, b, mask))
        # masked SSIM drops the perfect-match pad windows: it must be
        # well below the padded-canvas SSIM and close to the crop SSIM
        # (boundary windows straddle the pad, so not exact).
        s_masked = float(masked_ssim(a, b, mask))
        assert s_masked < float(ssim(a, b)) - 0.05
        assert abs(s_masked - float(ssim(a_core, b_core))) < 0.1
        # mask=None reduces to the plain metric
        np.testing.assert_allclose(masked_psnr(a, b, None), psnr(a, b), atol=1e-5)

    def test_bce_matches_formula(self):
        p = jnp.array([0.3, 0.8])
        g = jnp.array([0.0, 1.0])
        expected = -np.mean([np.log(0.7), np.log(0.8)])
        np.testing.assert_allclose(bce_loss(p, g), expected, rtol=1e-5)


class TestSSIM:
    def test_identical_images(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
        np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-5)

    def test_separable_blur_matches_full_window(self):
        # The SSIM hot path runs outer(g,g) as two 1-D passes
        # (`_gauss_blur_separable`); zero padding commutes with
        # separability exactly, so only f32 rounding may differ.
        from d3ga_tpu.train.losses import (
            _depthwise_conv2d_same,
            _gauss_blur_separable,
            _gaussian_window,
        )

        g = jnp.asarray(_gaussian_window(11, 1.5))
        img = jax.random.uniform(jax.random.PRNGKey(3), (5, 37, 53))
        full = _depthwise_conv2d_same(img, jnp.asarray(np.outer(g, g)))
        sep = _gauss_blur_separable(img, g)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(full), atol=2e-6)

    def test_matches_torch_reference(self):
        # Cross-check against the reference's torch implementation.
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF
        from math import exp

        def torch_ssim(img1, img2, window_size=11):
            def gaussian(ws, sigma):
                g = torch.Tensor(
                    [exp(-((x - ws // 2) ** 2) / float(2 * sigma**2)) for x in range(ws)]
                )
                return g / g.sum()

            channel = img1.size(-3)
            _1d = gaussian(window_size, 1.5).unsqueeze(1)
            _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
            window = _2d.expand(channel, 1, window_size, window_size).contiguous()
            mu1 = TF.conv2d(img1, window, padding=window_size // 2, groups=channel)
            mu2 = TF.conv2d(img2, window, padding=window_size // 2, groups=channel)
            mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
            s1 = TF.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
            s2 = TF.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
            s12 = TF.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
            C1, C2 = 0.01**2, 0.03**2
            m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
                (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
            )
            return m.mean().item()

        rng = np.random.RandomState(0)
        a = rng.rand(3, 40, 40).astype(np.float32)
        b = np.clip(a + rng.randn(3, 40, 40).astype(np.float32) * 0.1, 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestVGG:
    def test_zero_for_identical(self):
        p = init_vgg19_features(allow_random=True)
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 64, 64))
        out = vgg_loss(p, img, img)
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_positive_and_differentiable(self):
        p = init_vgg19_features(allow_random=True)
        a = jax.random.uniform(jax.random.PRNGKey(1), (3, 48, 48))
        b = jax.random.uniform(jax.random.PRNGKey(2), (3, 48, 48))
        val, g = jax.value_and_grad(lambda x: vgg_loss(p, x, b))(a)
        assert val > 0
        assert jnp.all(jnp.isfinite(g))


class TestOptim:
    def test_multistep_schedule(self):
        s = multistep_schedule(1.0, [10, 20], 0.5)
        assert s(0) == 1.0
        assert s(10) == 0.5
        assert s(25) == 0.25

    def test_optimizer_descends(self):
        params = {"garments": {"body": {"colors_feat": jnp.ones((4, 2))}},
                  "camera_calib": {"corrections": jnp.ones((2, 6))}}
        lr_tree = lr_tree_from_config(params, {"feature_lr": 0.1})
        tx = make_optimizer(lr_tree, milestones=[100], gamma=0.5)
        state = tx.init(params)

        def loss(p):
            return jnp.sum(p["garments"]["body"]["colors_feat"] ** 2)

        g = jax.grad(loss)(params)
        updates, state = tx.update(g, state, params)
        import optax

        new = optax.apply_updates(params, updates)
        assert loss(new) < loss(params)
        # camera_calib has its own lr group
        lt = lr_tree["camera_calib"]["corrections"]
        assert float(lt) == 1e-4

    def test_frozen_paths(self):
        params = {"garments": {"b": {"scaling": jnp.ones(3)}}}
        lr_tree = lr_tree_from_config(
            params, {}, zero_frozen=(("garments", "b", "scaling"),)
        )
        assert float(lr_tree["garments"]["b"]["scaling"]) == 0.0


class TestLpipsHead:
    """True LPIPS-VGG head (`recorder/heatmap.py:13,37-49`): loading +
    forward machinery, so real weights exported by tools/export_lpips.py
    drop in with zero code changes."""

    def _fake_npz(self, tmp_path):
        from d3ga_tpu.train.lpips import VGG16_CFG

        rng = np.random.default_rng(0)
        arrays = {}
        in_ch, idx = 3, 0
        for v in VGG16_CFG:
            if v == "M":
                continue
            if idx > 12:
                break
            arrays[f"w{idx}"] = rng.standard_normal((v, in_ch, 3, 3)).astype(
                np.float32
            ) * np.sqrt(2.0 / (in_ch * 9))
            arrays[f"b{idx}"] = np.zeros(v, np.float32)
            in_ch, idx = v, idx + 1
        chans = [64, 128, 256, 512, 512]
        for i, c in enumerate(chans):
            arrays[f"lin{i}"] = rng.uniform(0, 0.1, c).astype(np.float32)
        path = str(tmp_path / "lpips_vgg.npz")
        np.savez(path, **arrays)
        return path

    def test_load_and_forward(self, tmp_path):
        from d3ga_tpu.train.lpips import init_lpips, lpips_vgg

        params = init_lpips(self._fake_npz(tmp_path))
        assert len(params["convs"]) == 13 and len(params["lins"]) == 5
        k = jax.random.PRNGKey(0)
        a = jax.random.uniform(k, (3, 64, 64))
        b = jax.random.uniform(jax.random.fold_in(k, 1), (3, 64, 64))
        d_ab = float(lpips_vgg(params, a, b))
        d_aa = float(lpips_vgg(params, a, a))
        assert np.isfinite(d_ab) and d_ab > 0
        assert abs(d_aa) < 1e-6  # identical images -> zero distance
        # small perturbation < big perturbation (metric is monotone-ish)
        d_near = float(lpips_vgg(params, a, a + 0.01))
        assert d_near < d_ab

    def test_real_weights_if_present(self):
        import os

        import pytest

        path = os.environ.get("D3GA_LPIPS_WEIGHTS", "lpips_vgg.npz")
        if not os.path.exists(path):
            pytest.skip("no real LPIPS weights in this environment")
        from d3ga_tpu.train.lpips import init_lpips, lpips_vgg

        params = init_lpips(path)
        a = jnp.zeros((3, 64, 64))
        b = jnp.ones((3, 64, 64))
        assert float(lpips_vgg(params, a, b)) > 0.1


class TestPerceptualMetricNaming:
    def test_random_vgg_is_labeled(self):
        from d3ga_tpu.train.evaluate import compute_errors, vgg_metric_name
        from d3ga_tpu.train.losses import init_vgg19_features

        params = init_vgg19_features(allow_random=True)  # random stack, test-only
        assert vgg_metric_name(params) == "randvgg_dist"
        k = jax.random.PRNGKey(0)
        a = jax.random.uniform(k, (3, 32, 32))
        out = compute_errors(a, a * 0.9, vgg_params=params)
        assert "randvgg_dist" in out and "vgg_dist" not in out
