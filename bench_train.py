"""End-to-end TRAINING-STEP benchmark at Goliath scale: full avatar
forward (cage LBS + pose-conditioned MLP fields) -> fused 6-channel
RGB+silhouette rasterization -> loss assembly -> Adam update, chained
N steps per dispatch (`make_chained_step`) like a production loop.

Prints ONE JSON line {"metric": "train_step_throughput", ...} in
steps/s. Complements bench.py (raster-only fwd+bwd): this is the
number a user training an avatar actually experiences.

Env knobs: TRAINB_H/W (image), TRAINB_N (total Gaussians), TRAINB_K
(max per tile), TRAINB_CHAIN (steps per dispatch), TRAINB_ITERS.
"""

import json
import os
import time

from bench import _wait_for_tpu

if __name__ == "__main__":
    _wait_for_tpu()

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

H = int(os.environ.get("TRAINB_H", "1024"))
W = int(os.environ.get("TRAINB_W", "667"))
N_TOTAL = int(os.environ.get("TRAINB_N", "135000"))
K = int(os.environ.get("TRAINB_K", "256"))
CHAIN = int(os.environ.get("TRAINB_CHAIN", "10"))
ITERS = int(os.environ.get("TRAINB_ITERS", "20"))
# The reference publishes exactly one throughput-adjacent number: the
# training budget of 400k iterations in ~2 days on one modern CUDA GPU
# (README.md training section / configs/goliath_axe184.yml:42) ->
# 400_000 / (2 * 86_400 s) = 2.31 steps/s END-TO-END WALL, including
# the reference's host data pipeline (DataLoader workers, AVIF decode).
# This bench feeds synthetic device-resident data, so vs_baseline
# overstates a pure-compute comparison; the compute-only comparison is
# bench.py's raster Mpix/s line. Both are reported so neither number
# has to stretch past what it measures.
BASELINE_STEPS_S = 400_000 / (2 * 86_400)  # = 2.31 steps/s


def main():
    from d3ga_tpu.data.synthetic import build_synthetic_avatar, orbit_camera
    from d3ga_tpu.model.avatar import init_avatar
    from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
    from d3ga_tpu.train.step import (
        LossWeights,
        make_chained_step,
        make_train_step,
    )

    n_garments = 3
    model, skel, lbs_dim = build_synthetic_avatar(
        n_garments=n_garments,
        n_gaussians=N_TOTAL // n_garments,
        cage_res=3,
        config_overrides={
            "raster_backend": "pallas_blend",
            "raster_opts": {"coarse": "dupsort_depth", "dup": 3},
        },
    )
    params = init_avatar(jax.random.PRNGKey(0), model)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_gauss = sum(g.geometry.init_points.shape[0] for g in model.garments)

    lr_tree = lr_tree_from_config(params, {})
    tx = make_optimizer(lr_tree)
    opt_state = tx.init(params)

    camera = orbit_camera(0.3, W, H)
    key = jax.random.PRNGKey(1)
    batch = {
        "camera": camera,
        "lbs": jax.random.normal(key, (lbs_dim,)) * 0.1,
        "frame_idx": jnp.int32(0),
        "camera_idx": jnp.int32(0),
        "image": jax.random.uniform(jax.random.fold_in(key, 1), (3, H, W)),
        "alpha": jnp.ones((1, H, W)),
        "silhouette": jnp.full((3, H, W), 0.5),
    }

    step = make_train_step(
        model, tx, max_per_tile=K,
        loss_weights=LossWeights(enable_vgg_from=0),
    )
    chained = make_chained_step(step, CHAIN)
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (CHAIN,) + jnp.shape(x)) + 0
        if hasattr(x, "shape") else x,
        batch,
    )

    def run(params, opt_state, rng, base):
        iters = base + jnp.arange(CHAIN, dtype=jnp.int32)
        return chained(params, opt_state, batches, rng, iters)

    rng = jax.random.PRNGKey(2)
    # warmup/compile
    params, opt_state, rng, m = run(params, opt_state, rng, jnp.int32(0))
    float(np.asarray(m["total_loss"])[-1])

    t0 = time.perf_counter()
    done = 0
    for i in range(max(1, ITERS // CHAIN)):
        params, opt_state, rng, m = run(
            params, opt_state, rng, jnp.int32(CHAIN * (i + 1))
        )
        done += CHAIN
    float(np.asarray(m["total_loss"])[-1])  # host sync
    dt = (time.perf_counter() - t0) / done

    print(
        json.dumps(
            {
                "metric": "train_step_throughput",
                "value": round(1.0 / dt, 3),
                "unit": "steps/s",
                "vs_baseline": round(1.0 / dt / BASELINE_STEPS_S, 4),
                "image": f"{H}x{W}",
                "n_gaussians": int(n_gauss),
                "n_params": int(n_params),
                "chain": CHAIN,
                "baseline_steps_s": round(BASELINE_STEPS_S, 3),
                "baseline_provenance": (
                    "400k iterations / 2 days single-GPU training budget"
                    " (reference README + goliath_axe184.yml:42); includes"
                    " the reference's host data pipeline — this bench"
                    " feeds synthetic device-resident data"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
