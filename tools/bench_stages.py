"""Per-stage device-throughput breakdown of the tiled rasterizer at
Goliath scale, using the same chained-fori measurement as bench.py so
axon-tunnel dispatch RTT does not pollute per-stage numbers.

Each stage is timed as N chained iterations inside ONE jitted
lax.fori_loop with a data dependency between iterations (outputs are
folded back into a scalar perturbation of the inputs), one host
readback at the end.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_stages.py
"""

import json
import os
import sys
import time

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
from d3ga_tpu.raster.project import project_gaussians, tile_rect
from d3ga_tpu.raster.tiles import (
    BIG_RANK,
    TILE,
    _blend_tiles,
    _select_per_tile,
    rasterize_tiled,
)

ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def chain_time(name, fn, *args):
    """Time ITERS chained evaluations of fn inside one dispatch.

    fn(*args, eps scalar) -> array/pytree; a scalar digest of the output
    perturbs eps for the next iteration (true data dependency)."""

    @jax.jit
    def run(*a):
        def body(_, eps):
            out = fn(*a, eps)
            leaves = [x for x in jax.tree.leaves(out)]
            digest = sum(jnp.sum(x) * 0.0 for x in leaves if jnp.issubdtype(x.dtype, jnp.inexact))
            digest = digest + sum(
                jnp.sum(x).astype(jnp.float32) * 0.0
                for x in leaves
                if not jnp.issubdtype(x.dtype, jnp.inexact)
            )
            return digest * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    float(np.asarray(run(*args)))  # compile+warm
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    camera = make_camera(
        np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
    )
    means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
    ntx, nty = -(-W // TILE), -(-H // TILE)
    n_tiles = ntx * nty
    K = MAX_PER_TILE

    results = {}

    # --- stage inputs (computed once, eager) ---
    proj = jax.jit(
        lambda m: project_gaussians(m, camera, cov3d=cov6, opacities=opac, colors=colors)
    )(means)
    valid = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
    records = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], proj.color], axis=-1
    )[order]
    radius_s = proj.radius[order]
    valid_s = valid[order]
    rects = tile_rect(records[:, 0:2], radius_s, TILE, ntx, nty)
    ranks, counts, bov = _select_per_tile(rects, valid_s, ntx, nty, K)
    sel_valid = ranks < BIG_RANK
    safe = jnp.where(sel_valid, ranks, 0)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    origin = jnp.stack([(tids % ntx) * TILE, (tids // ntx) * TILE], -1)

    results["project"] = chain_time(
        "project",
        lambda m, eps: project_gaussians(
            m + eps, camera, cov3d=cov6, opacities=opac, colors=colors
        ).xy,
        means,
    )
    results["argsort"] = chain_time(
        "argsort(depth)",
        lambda d, eps: jnp.argsort(d + eps, stable=True),
        jnp.where(valid, proj.depth, jnp.inf),
    )
    results["record_pack_gather"] = chain_time(
        "record pack+sort-gather",
        lambda xy, eps: jnp.concatenate(
            [xy + eps, proj.conic, proj.opacity[:, None], proj.color], axis=-1
        )[order],
        proj.xy,
    )
    results["select"] = chain_time(
        "select 2-level (K=%d)" % K,
        lambda v, eps: _select_per_tile(rects, v, ntx, nty, K)[0],
        valid_s,
    )
    results["tile_gather"] = chain_time(
        "per-tile record gather [T,K,9]",
        lambda r, eps: (r + eps)[safe],
        records,
    )

    rec_t = records[safe]
    xy_t = rec_t[..., 0:2]
    conic_t = rec_t[..., 2:5]
    opac_t = rec_t[..., 5]
    color_t = rec_t[..., 6:]
    bg = jnp.zeros(3)

    results["blend_xla_fwd"] = chain_time(
        "blend XLA fwd",
        lambda c, eps: _blend_tiles(
            xy_t, conic_t, c + eps, opac_t, sel_valid, bg, origin
        ),
        color_t,
    )

    def blend_xla_loss(c, eps):
        out = _blend_tiles(xy_t + eps, conic_t, c, opac_t, sel_valid, bg, origin)
        return jnp.sum(out)

    results["blend_xla_fwdbwd"] = chain_time(
        "blend XLA fwd+bwd(xy,color)",
        lambda c, eps: jax.grad(blend_xla_loss)(c, eps),
        color_t,
    )

    from d3ga_tpu.raster.pallas_blend import blend_tiles_pallas, falloff_coeffs

    origin_f = origin.astype(jnp.float32)
    coeffs = falloff_coeffs(xy_t - origin_f[:, None, :], conic_t)
    opac_in = jnp.where(sel_valid, opac_t, 0.0)[:, None, :]

    results["blend_pallas_fwd"] = chain_time(
        "blend Pallas fwd",
        lambda c, eps: blend_tiles_pallas(coeffs, c + eps, opac_in, False),
        color_t,
    )

    def blend_pal_loss(c, eps):
        out = blend_tiles_pallas(coeffs + eps, c, opac_in, False)
        return jnp.sum(out)

    results["blend_pallas_fwdbwd"] = chain_time(
        "blend Pallas fwd+bwd",
        lambda c, eps: jax.grad(blend_pal_loss)(c, eps),
        color_t,
    )

    def full_fwd(m, eps):
        img, _ = rasterize_tiled(
            m + eps, camera, bg, cov3d=cov6, opacities=opac, colors=colors,
            max_per_tile=K,
        )
        return img

    results["full_fwd"] = chain_time("full fwd (XLA blend)", full_fwd, means)

    def full_loss(m, eps, use_pallas):
        img, _ = rasterize_tiled(
            m + eps, camera, bg, cov3d=cov6, opacities=opac, colors=colors,
            max_per_tile=K, use_pallas=use_pallas,
        )
        return jnp.mean(jnp.abs(img))

    results["full_fwdbwd_xla"] = chain_time(
        "full fwd+bwd (XLA blend)",
        lambda m, eps: jax.grad(full_loss)(m, eps, False),
        means,
    )
    results["full_fwdbwd_pallas"] = chain_time(
        "full fwd+bwd (Pallas blend)",
        lambda m, eps: jax.grad(full_loss)(m, eps, True),
        means,
    )

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
