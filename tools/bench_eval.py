"""Serving-path benchmark: eval-mode avatar forward + fused raster
FORWARD ONLY (no grads, no optimizer) at Goliath scale — the number an
interactive viewer or batch renderer experiences, complementing
bench.py (raster fwd+bwd) and bench_train.py (full train step).

Matches the reference's eval usage (`/root/reference/test.py` renders
frames through `renderer.py:79-141` forward-only). Eval-mode semantics:
embeddings at their mean, no random background, deterministic fields
(`model/avatar.py avatar_forward(training=False)`).

Prints ONE JSON line {"metric": "eval_render_fps", ...}.

Env knobs: EVALB_H/W, EVALB_N, EVALB_K, EVALB_CHAIN, EVALB_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _wait_for_tpu

if __name__ == "__main__":
    _wait_for_tpu()

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

H = int(os.environ.get("EVALB_H", "1024"))
W = int(os.environ.get("EVALB_W", "667"))
N_TOTAL = int(os.environ.get("EVALB_N", "135000"))
K = int(os.environ.get("EVALB_K", "256"))
CHAIN = int(os.environ.get("EVALB_CHAIN", "20"))
ITERS = int(os.environ.get("EVALB_ITERS", "40"))


def main():
    from d3ga_tpu.data.synthetic import build_synthetic_avatar, orbit_camera
    from d3ga_tpu.model.avatar import avatar_forward, init_avatar
    from d3ga_tpu.raster.tiles import rasterize_tiled

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
    n_gauss = sum(g.geometry.init_points.shape[0] for g in model.garments)
    camera = orbit_camera(0.3, W, H)
    bg = jnp.ones(3)

    @jax.jit
    def render_chain(params, lbs0):
        # CHAIN dependent frames per dispatch: each frame's lbs vector
        # is a genuinely different pose (varied by the scan index i, a
        # per-joint sinusoid) plus a digest of the previous frame so XLA
        # cannot collapse the chain; mirrors bench.py's scan-unroll
        # protocol while matching the reference test.py loop's
        # frame-to-frame pose variation (a fixed pose would measure a
        # best-case identical-scene rate).
        joint_phase = jnp.arange(lbs_dim) * 0.61
        def body(carry, i):
            lbs_i = lbs0 + 0.05 * jnp.sin(i.astype(jnp.float32) * 0.37 + joint_phase)
            pkg = avatar_forward(
                params, model,
                {"camera": camera, "lbs": lbs_i + carry,
                 "frame_idx": jnp.int32(0), "camera_idx": jnp.int32(0),
                 "iteration": jnp.int32(0)},
                training=False,
            )
            img, _ = rasterize_tiled(
                pkg["means3D"], camera, jnp.concatenate([bg, jnp.zeros(3)]),
                cov3d=pkg["cov3D_precomp"], opacities=pkg["opacities"],
                colors=jnp.concatenate([pkg["rgb"], pkg["silhouette_rgb"]], -1),
                max_per_tile=K, use_pallas=True, coarse="dupsort_depth", dup=3,
            )
            return img[0, 0, 0] * 1e-12, img[0, 0, 0]
        carry, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(CHAIN), unroll=CHAIN)
        return carry + outs[-1]

    lbs0 = jnp.zeros(lbs_dim)
    # warmup/compile
    float(np.asarray(render_chain(params, lbs0)))

    t0 = time.perf_counter()
    done = 0
    out = None
    for _ in range(max(1, ITERS // CHAIN)):
        out = render_chain(params, lbs0)
        done += CHAIN
    float(np.asarray(out))  # host sync through the tunnel
    dt = (time.perf_counter() - t0) / done

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "eval_render_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "mpix_s": round(fps * H * W / 1e6, 2),
                "image": f"{H}x{W}",
                "n_gaussians": int(n_gauss),
                "chain": CHAIN,
                "note": (
                    "eval-mode avatar forward + fused 6-ch raster forward,"
                    " no grads; per-frame pose varied by scan index;"
                    " reference protocol: test.py render loop"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
