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
