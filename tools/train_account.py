"""Account the FULL end-to-end training step (VERDICT r3 item 8): where
do the non-raster milliseconds go at bench_train scale (135k Gaussians,
3 garments, 1024x667, chained dispatch)?

Stages timed with the chained fori_loop protocol (subtract ~3 ms/iter
loop tax when comparing to scan-unrolled bench numbers; ratios between
lines are what matters):

  A. avatar_forward only (LBS -> deformation/canonical/color MLPs over
     135k Gaussians -> covariance transport)
  B. A + fused 6-channel raster forward
  C. full loss forward (B + L1/SSIM/sil/FEM/scale assembly)
  D. value_and_grad of C (adds every backward)
  E. D + clip/Adam update (= the real step body)

Run: PYTHONPATH=/root/repo python tools/train_account.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
H = int(os.environ.get("TRAINB_H", "1024"))
W = int(os.environ.get("TRAINB_W", "667"))
N_TOTAL = int(os.environ.get("TRAINB_N", "135000"))
K = int(os.environ.get("TRAINB_K", "256"))


def chain_time(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(_, eps):
            out = fn(*a, eps)
            leaves = jax.tree.leaves(out)
            digest = sum(
                jnp.sum(x) * 0.0
                for x in leaves
                if jnp.issubdtype(x.dtype, jnp.inexact)
            )
            return digest * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    float(np.asarray(run(*args)))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS * 1000.0
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from d3ga_tpu.data.synthetic import build_synthetic_avatar, orbit_camera
    from d3ga_tpu.model.avatar import avatar_forward, init_avatar
    from d3ga_tpu.raster.tiles import rasterize_tiled
    from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
    from d3ga_tpu.train.step import LossWeights, make_train_step, render_frame

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
    camera = orbit_camera(0.3, W, H)
    params = init_avatar(jax.random.PRNGKey(0), model)
    lr_tree = lr_tree_from_config(params, {})
    tx = make_optimizer(lr_tree)
    opt_state = tx.init(params)
    lw = LossWeights()
    rng = jax.random.PRNGKey(1)

    batch = {
        "camera": camera,
        "lbs": jnp.zeros(lbs_dim),
        "frame_idx": jnp.int32(0),
        "camera_idx": jnp.int32(0),
        "image": jax.random.uniform(jax.random.PRNGKey(2), (3, H, W)),
        "alpha": jnp.ones((1, H, W)),
        "silhouette": jnp.full((3, H, W), 0.5),
    }
    results = {}

    def fwd_only(p, eps):
        b = dict(batch, lbs=batch["lbs"] + eps)
        pkg = avatar_forward(p, model, b, training=True)
        return pkg["means3D"]

    results["avatar_forward"] = chain_time("A avatar_forward (MLPs+LBS)", fwd_only, params)

    def fwd_raster(p, eps):
        b = dict(batch, lbs=batch["lbs"] + eps)
        pkg = avatar_forward(p, model, b, training=True)
        img, _ = rasterize_tiled(
            pkg["means3D"], camera, jnp.zeros(6),
            cov3d=pkg["cov3D_precomp"], opacities=pkg["opacities"],
            colors=jnp.concatenate([pkg["rgb"], pkg["silhouette_rgb"]], -1),
            max_per_tile=K, use_pallas=True, coarse="dupsort_depth", dup=3,
        )
        return img

    results["fwd_plus_raster"] = chain_time("B A + fused raster fwd", fwd_raster, params)

    def full_loss(p, eps):
        b = dict(batch, lbs=batch["lbs"] + eps)
        terms, aux = render_frame(
            p, model, b, rng, training=True, max_per_tile=K,
            loss_weights=lw,
        )
        return sum(jax.tree.leaves(terms))

    results["loss_forward"] = chain_time("C full loss forward", full_loss, params)

    def raster_grad(p, eps):
        # Backward through raster+avatar only (mean-image loss stub) —
        # D minus this is the loss-assembly backward (SSIM et al).
        return jax.value_and_grad(lambda q, e: jnp.mean(fwd_raster(q, e)))(p, eps)[1]

    results["raster_fwd_bwd"] = chain_time("D0 value_and_grad(B, mean stub)", raster_grad, params)

    def loss_grad(p, eps):
        return jax.value_and_grad(full_loss)(p, eps)[1]

    results["loss_fwd_bwd"] = chain_time("D value_and_grad(C)", loss_grad, params)

    import optax

    def full_step(p, o, eps):
        l, g = jax.value_and_grad(full_loss)(p, eps)
        updates, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, updates)

    results["full_step"] = chain_time("E D + clip/Adam update", full_step, params, opt_state)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
