"""Fresh per-stage step account for the CHAMPION raster config
(dupsort_tile, dup=4, Pallas ct blend) — round-3 cost model refresh.

Chained timing (ITERS in one jit, fori_loop with a data dependency, one
readback) — same protocol as bench.py / bench_stages.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/step_account.py
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
    BIG_RANK,
    TILE,
    _select_per_tile,
    rasterize_tiled,
    reorder_records,
)

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DUP = 4


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
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
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
    records0 = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], proj.color], axis=-1
    )
    sort_depth = jnp.where(valid, proj.depth, jnp.inf)

    results["project"] = chain_time(
        "project",
        lambda m, eps: project_gaussians(
            m + eps, camera, cov3d=cov6, opacities=opac, colors=colors
        ).xy,
        means,
    )

    def reorder_argsort(r, eps):
        order = jnp.argsort(sort_depth + eps * 0, stable=True)
        return reorder_records(r + eps, proj.radius, valid, order)[0]

    results["reorder_argsort"] = chain_time("reorder: argsort+rowgather", reorder_argsort, records0)

    def reorder_payload(r, eps):
        nc = r.shape[1]
        outs = jax.lax.sort(
            (sort_depth + eps * 0,)
            + tuple((r + eps)[:, i] for i in range(nc))
            + (proj.radius, valid.astype(jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        return jnp.stack(outs[1 : 1 + nc], axis=1)

    results["reorder_sortpayload"] = chain_time("reorder: ONE payload sort", reorder_payload, records0)

    order = jnp.argsort(sort_depth, stable=True)
    records, radius_s, valid_s = reorder_records(records0, proj.radius, valid, order)
    rects = tile_rect(records[:, 0:2], radius_s, TILE, ntx, nty)

    results["select_dupsort"] = chain_time(
        "select dupsort_tile dup=4",
        lambda v, eps: _select_per_tile(
            rects, v, ntx, nty, K, coarse="dupsort_tile", dup=DUP
        )[0],
        valid_s,
    )

    ranks, counts, bov = _select_per_tile(
        rects, valid_s, ntx, nty, K, coarse="dupsort_tile", dup=DUP
    )
    sel_valid = ranks < BIG_RANK
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

    drec_t = rec_t  # stand-in cotangent, same shape/layout
    n_ext = records_ext.shape[0]

    results["scatter_add"] = chain_time(
        "backward scatter-add [T*K -> N,CR]",
        lambda d, eps: jnp.zeros((n_ext, d.shape[-1]), d.dtype).at[idx].add(d + eps),
        drec_t,
    )

    def full_loss(m, eps):
        img, _ = rasterize_tiled(
            m + eps, camera, jnp.zeros(3), cov3d=cov6, opacities=opac,
            colors=colors, max_per_tile=K, use_pallas=True,
            coarse="dupsort_tile", dup=DUP,
        )
        return jnp.mean(jnp.abs(img))

    results["full_fwdbwd"] = chain_time(
        "FULL champion fwd+bwd",
        lambda m, eps: jax.grad(full_loss)(m, eps),
        means,
    )

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
