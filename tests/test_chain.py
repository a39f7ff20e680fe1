"""Chained train step (make_chained_step): N steps in one dispatch must
be bit-identical to N sequential steps consuming the same rng stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.data.synthetic import (
    build_synthetic_avatar,
    orbit_camera,
    synthetic_batch,
)
from d3ga_tpu.model.avatar import init_avatar
from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
from d3ga_tpu.train.step import LossWeights, make_chained_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    h = w = 48
    model, skel, lbs_dim = build_synthetic_avatar(
        n_garments=1, n_gaussians=64, n_frames=4, n_cameras=2, n_joints=3
    )
    params = init_avatar(jax.random.PRNGKey(0), model)
    cam = orbit_camera(0.3, w, h)
    batches = [
        synthetic_batch(cam, lbs_dim, h, w, frame_idx=i % 4, camera_idx=0)
        for i in range(3)
    ]
    return model, params, batches


class TestChainedStep:
    def test_chained_equals_sequential(self, setup):
        model, params, batches = setup
        lr_tree = lr_tree_from_config(params, {})
        tx = make_optimizer(lr_tree)
        step = make_train_step(
            model, tx, max_per_tile=64,
            loss_weights=LossWeights(enable_vgg_from=0), donate=False,
        )
        L = len(batches)

        # sequential reference, splitting the rng exactly like train.py
        rng = jax.random.PRNGKey(7)
        p_seq, o_seq = params, tx.init(params)
        seq_metrics = []
        for i, b in enumerate(batches):
            rng, k = jax.random.split(rng)
            p_seq, o_seq, m = step(p_seq, o_seq, b, k, jnp.int32(i + 1))
            seq_metrics.append(m)

        chained = make_chained_step(step, L, donate=False)
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches
        )
        iters = jnp.arange(1, L + 1, dtype=jnp.int32)
        p_ch, o_ch, rng_out, m_ch = chained(
            params, tx.init(params), stacked, jax.random.PRNGKey(7), iters
        )

        # same math, same rng stream; XLA fuses the scan body differently
        # from the standalone step, so float rounding differs at ~1e-7
        for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_ch)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
        for i, m in enumerate(seq_metrics):
            for k, v in m.items():
                np.testing.assert_allclose(
                    np.asarray(m_ch[k][i]), np.asarray(v), rtol=2e-4, atol=1e-5
                )


class TestChainedShardedStep:
    def test_chained_sharded_runs_and_matches(self):
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
        params0 = pad_params_for_shards(
            init_avatar(jax.random.PRNGKey(0), model), 4
        )
        lr_tree = lr_tree_from_config(params0, {})
        tx = make_optimizer(lr_tree)
        step, shard_batch, shard_params = make_sharded_train_step(
            model, tx, mesh, geoms, (h, w), batch_size, max_per_tile=32
        )
        cams = [orbit_camera(0.3 * i, w, h) for i in range(batch_size)]
        board = checkerboard(h, w)

        def mk_batch(i):
            return shard_batch({
                "world_view": jnp.stack([c.world_view for c in cams]),
                "full_proj": jnp.stack([c.full_proj for c in cams]),
                "camera_center": jnp.stack([c.camera_center for c in cams]),
                "tanfovx": jnp.stack([c.tanfovx for c in cams]),
                "tanfovy": jnp.stack([c.tanfovy for c in cams]),
                "lbs": jax.random.normal(
                    jax.random.PRNGKey(10 + i), (batch_size, lbs_dim)
                ) * 0.1,
                "frame_idx": jnp.arange(batch_size, dtype=jnp.int32),
                "camera_idx": jnp.zeros(batch_size, jnp.int32),
                "image": jnp.stack([board] * batch_size),
                "alpha": jnp.ones((batch_size, 1, h, w)),
                "silhouette": jnp.full((batch_size, 3, h, w), 0.5),
            })

        L = 2
        batches = [mk_batch(i) for i in range(L)]

        # sequential reference (train.py-style rng splitting)
        rng = jax.random.PRNGKey(9)
        p_seq = shard_params(params0)
        o_seq = tx.init(p_seq)
        for i, b in enumerate(batches):
            rng, k = jax.random.split(rng)
            p_seq, o_seq, m = step(p_seq, o_seq, b, k, jnp.int32(i))

        chained = make_chained_step(step, L, donate=False)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        # the donating sequential step deletes some params0 buffers
        # (shard_params' device_put can alias); rebuild deterministically
        params0 = pad_params_for_shards(
            init_avatar(jax.random.PRNGKey(0), model), 4
        )
        p0 = shard_params(params0)
        p_ch, o_ch, rng_out, m_ch = chained(
            p0, tx.init(p0), stacked, jax.random.PRNGKey(9),
            jnp.arange(L, dtype=jnp.int32),
        )
        assert np.all(np.isfinite(np.asarray(m_ch["total_loss"])))
        np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
        for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_ch)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-5)


class TestPrefetcher:
    def test_preserves_sequence(self):
        from d3ga_tpu.data.prefetch import Prefetcher

        src = [{"x": np.full((3,), i)} for i in range(20)]
        out = list(Prefetcher(iter(src), depth=3))
        assert len(out) == 20
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), src[i]["x"])

    def test_propagates_errors(self):
        from d3ga_tpu.data.prefetch import Prefetcher

        def gen():
            yield {"x": np.zeros(2)}
            raise RuntimeError("boom")

        it = Prefetcher(gen(), depth=2)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_close_stops_thread(self):
        import itertools

        from d3ga_tpu.data.prefetch import Prefetcher

        p = Prefetcher(itertools.count(), depth=2, to_device=False)
        next(p)
        p.close()
        p._thread.join(timeout=5)
        assert not p._thread.is_alive()


class TestGradAccum:
    def test_two_microsteps_equal_mean_grad_update(self):
        import optax

        from d3ga_tpu.train.optim import make_optimizer

        params = {"w": jnp.arange(4.0)}
        lr_tree = {"w": 0.1}
        g1 = {"w": jnp.array([1.0, -2.0, 0.5, 0.0])}
        g2 = {"w": jnp.array([3.0, 0.0, -0.5, 1.0])}
        gm = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

        # reference: one update with the mean gradient
        tx_ref = make_optimizer(lr_tree)
        s = tx_ref.init(params)
        up, _ = tx_ref.update(gm, s, params)
        p_ref = optax.apply_updates(params, up)

        # accumulating optimizer: two micro-steps, update fires on the 2nd
        tx = make_optimizer(lr_tree, grad_accum=2)
        s = tx.init(params)
        up1, s = tx.update(g1, s, params)
        p_mid = optax.apply_updates(params, up1)
        # first micro-step must be a no-op on params
        np.testing.assert_array_equal(
            np.asarray(p_mid["w"]), np.asarray(params["w"])
        )
        up2, s = tx.update(g2, s, p_mid)
        p_acc = optax.apply_updates(p_mid, up2)
        np.testing.assert_allclose(
            np.asarray(p_acc["w"]), np.asarray(p_ref["w"]), rtol=1e-6
        )

    def test_milestones_stay_in_iteration_units(self):
        import optax

        from d3ga_tpu.train.optim import make_optimizer

        params = {"w": jnp.zeros(2)}
        g = {"w": jnp.ones(2)}

        def fired_magnitudes(tx, n_micro):
            s = tx.init(params)
            mags = []
            for _ in range(n_micro):
                up, s = tx.update(g, s, params)
                m = float(jnp.abs(up["w"]).max())
                if m > 0:
                    mags.append(m)
            return mags

        # no accumulation: decay after iteration 4
        ref = fired_magnitudes(
            make_optimizer({"w": 1.0}, milestones=[4], gamma=0.5), 8
        )
        # accumulation 2: same decay point in ITERATION units (micro-steps)
        acc = fired_magnitudes(
            make_optimizer({"w": 1.0}, milestones=[4], gamma=0.5, grad_accum=2),
            8,
        )
        # ref updates fire every iteration: 8 updates, decay from the 5th;
        # acc fires every 2nd micro-step: 4 updates, decay from the 3rd
        assert ref[3] / ref[4] == pytest.approx(2.0, rel=1e-5)
        assert acc[1] / acc[2] == pytest.approx(2.0, rel=1e-5)
