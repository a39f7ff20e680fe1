"""Compiled-Pallas vs XLA blend parity ON THE REAL CHIP (VERDICT r1
item 6): runs the fused Pallas blend kernel (compiled, not interpret
mode) and the XLA `_blend_tiles` path on identical per-tile records at
Goliath scale, forward AND gradients, and writes PALLAS_PARITY.json
with max-abs/rel error columns.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/pallas_parity.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from bench import H, W, MAX_PER_TILE, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.tiles import rasterize_tiled


def main():
    camera = make_camera(
        np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
    )
    means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
    bg = jnp.array([0.2, 0.5, 0.8])

    # PARITY_COARSE/PARITY_DUP select the funnel (default: the topk
    # funnel, the historical parity config); the champion config is
    # PARITY_COARSE=dupsort_depth PARITY_DUP=3, which combined with
    # D3GA_REC_GRAD=segsum exercises the round-5 segmented-sum backward
    # against the XLA blend + scatter-add reference.
    coarse = os.environ.get("PARITY_COARSE", "topk")
    dup = int(os.environ.get("PARITY_DUP", "4"))

    def render(use_pallas, means, cov6, opac, colors):
        img, _ = rasterize_tiled(
            means, camera, bg, cov3d=cov6, opacities=opac, colors=colors,
            max_per_tile=MAX_PER_TILE, use_pallas=use_pallas,
            coarse=coarse, dup=dup,
        )
        return img

    def loss(use_pallas, means, cov6, opac, colors):
        img = render(use_pallas, means, cov6, opac, colors)
        # weighted sum exercises every pixel's gradient path
        wgt = jax.random.uniform(jax.random.PRNGKey(7), img.shape)
        return jnp.sum(img * wgt)

    report = {
        "device": str(jax.devices()[0]), "H": H, "W": W, "K": MAX_PER_TILE,
        "coarse": coarse, "dup": dup,
        "rec_grad": os.environ.get("D3GA_REC_GRAD", "add"),
    }

    f_x = jax.jit(lambda *a: render(False, *a))
    f_p = jax.jit(lambda *a: render(True, *a))
    img_x = np.asarray(f_x(means, cov6, opac, colors))
    img_p = np.asarray(f_p(means, cov6, opac, colors))
    d = np.abs(img_x - img_p)
    # The blend has hard thresholds (alpha >= 1/255 skip, T < 1e-4
    # stop): different-but-valid numerics can flip single candidates at
    # a handful of pixels, producing large LOCAL diffs. Robust metrics:
    # percentiles + flip fraction, alongside the raw max.
    report["forward"] = {
        "max_abs_err": float(d.max()),
        "p999_abs_err": float(np.quantile(d, 0.999)),
        "mean_abs_err": float(d.mean()),
        "flip_frac_gt_1e2": float((d > 1e-2).mean()),
    }

    # fused select+compact+blend kernel forward parity
    try:
        from d3ga_tpu.raster.tiles import rasterize_tiled_fused

        f_f = jax.jit(
            lambda m, c6, op, co: rasterize_tiled_fused(
                m, camera, bg, cov3d=c6, opacities=op, colors=co,
                max_per_tile=MAX_PER_TILE,
            )[0]
        )
        img_f = np.asarray(f_f(means, cov6, opac, colors))
        d = np.abs(img_x - img_f)
        report["forward_fused"] = {
            "max_abs_err": float(d.max()),
            "mean_abs_err": float(d.mean()),
        }
    except Exception as e:  # keep the blend-kernel report even if fused fails
        report["forward_fused"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    g_x = jax.jit(jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3)))
    g_p = jax.jit(jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3)))
    gx = g_x(means, cov6, opac, colors)
    gp = g_p(means, cov6, opac, colors)
    for name, a, b in zip(("d_means", "d_cov6", "d_opac", "d_colors"), gx, gp):
        a = np.asarray(a)
        b = np.asarray(b)
        d = np.abs(a - b)
        scale = max(np.abs(a).max(), 1e-12)
        report[name] = {
            "max_abs_err": float(d.max()),
            "p999_rel_err": float(np.quantile(d, 0.999) / scale),
            "rel_err_at_max": float(d.max() / scale),
            "grad_scale": float(scale),
        }

    ok = (
        report["forward"]["p999_abs_err"] < 1e-3
        and report["forward"]["flip_frac_gt_1e2"] < 1e-3
        and all(
            report[k]["p999_rel_err"] < 2e-3
            for k in ("d_means", "d_cov6", "d_opac", "d_colors")
        )
    )
    report["note"] = (
        "max_abs errors are dominated by threshold flips (alpha>=1/255 "
        "skip, T<1e-4 stop) at a ~1e-4 fraction of pixels — inherent to "
        "any numerics change, not systematic error; p999/flip_frac are "
        "the meaningful columns"
    )
    report["ok"] = bool(ok)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("PARITY_OUT", "PALLAS_PARITY.json"),
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
