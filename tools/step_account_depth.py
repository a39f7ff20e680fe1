"""Per-stage step account for the ROUND-4 champion raster config
(dupsort_depth, dup=3, Pallas ct blend, scatter-add backward) plus the
depth_exact and slotmap variants — chained protocol as step_account.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/step_account_depth.py
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

from bench import H, W, MAX_PER_TILE, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.project import project_gaussians, tile_rect
from d3ga_tpu.raster.tiles import (
    TILE,
    _select_per_tile_depthkey,
    rasterize_tiled,
)

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DUP = int(os.environ.get("BENCH_DUP", "3"))


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
            digest = digest + sum(
                jnp.sum(x).astype(jnp.float32) * 0.0
                for x in leaves
                if not jnp.issubdtype(x.dtype, jnp.inexact)
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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    camera = make_camera(
        np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
    )
    means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
    ntx, nty = -(-W // TILE), -(-H // TILE)
    K = MAX_PER_TILE
    results = {}

    proj = jax.jit(
        lambda m: project_gaussians(m, camera, cov3d=cov6, opacities=opac, colors=colors)
    )(means)
    valid = proj.valid & (proj.radius > 0)
    records = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], proj.color], axis=-1
    )
    rects = tile_rect(proj.xy, proj.radius, TILE, ntx, nty)

    results["project"] = chain_time(
        "project",
        lambda m, eps: project_gaussians(
            m + eps, camera, cov3d=cov6, opacities=opac, colors=colors
        ).xy,
        means,
    )

    for name, kw in [
        ("select_depthkey", {}),
        ("select_depthkey_exact", {"depth_exact": True}),
        ("select_depthkey_slotmap", {"return_slotmap": True}),
    ]:
        results[name] = chain_time(
            name,
            lambda v, eps, kw=kw: _select_per_tile_depthkey(
                rects, v, proj.depth + eps * 0, ntx, nty, K, dup=DUP, **kw
            )[:2],
            valid,
        )

    ranks, counts, _ov, _ties = _select_per_tile_depthkey(
        rects, valid, proj.depth, ntx, nty, K, dup=DUP
    )
    sel_valid = ranks >= 0
    records_ext = jnp.concatenate(
        [records, jnp.zeros((1, records.shape[1]), records.dtype)], axis=0
    )
    idx = jnp.where(sel_valid, ranks, jnp.int32(records.shape[0]))

    results["rec_gather"] = chain_time(
        "rec gather [T,K,CR]",
        lambda r, eps: (r + eps)[idx],
        records_ext,
    )

    rec_t = records_ext[idx]
    rec_ct = jnp.swapaxes(rec_t, 1, 2)
    cnt = jnp.minimum(counts, K)
    C = proj.color.shape[-1]

    from d3ga_tpu.raster.pallas_blend_ct import blend_image_ct

    results["blend_ct_fwd"] = chain_time(
        "blend ct fwd",
        lambda r, eps: blend_image_ct(r + eps, cnt, ntx, nty, C, False),
        rec_ct,
    )

    def ct_loss(r, eps):
        return jnp.sum(blend_image_ct(r + eps, cnt, ntx, nty, C, False))

    results["blend_ct_fwdbwd"] = chain_time(
        "blend ct fwd+bwd",
        lambda r, eps: jax.grad(ct_loss)(r, eps),
        rec_ct,
    )

    n_ext = records_ext.shape[0]
    results["scatter_add"] = chain_time(
        "backward scatter-add [T*K -> N,CR]",
        lambda d, eps: jnp.zeros((n_ext, d.shape[-1]), d.dtype).at[idx].add(d + eps),
        rec_t,
    )

    target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))

    def full_loss(m, eps, **kw):
        img, _ = rasterize_tiled(
            m + eps, camera, jnp.zeros(3), cov3d=cov6, opacities=opac,
            colors=colors, max_per_tile=K, use_pallas=True,
            coarse="dupsort_depth", dup=DUP, **kw,
        )
        return jnp.mean(jnp.abs(img - target))

    import d3ga_tpu.raster.tiles as tiles_mod

    for name, rg, kw in [
        ("full_add", "add", {}),
        ("full_add_exact", "add", {"depth_exact": True}),
        ("full_slotmap", "slotmap", {}),
    ]:
        tiles_mod.REC_GRAD = rg
        results[name] = chain_time(
            f"FULL fwd+bwd ({name})",
            lambda m, eps, kw=kw: jax.grad(full_loss)(m, eps, **kw),
            means,
        )
    tiles_mod.REC_GRAD = "add"

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
