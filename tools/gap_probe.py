"""Attribute the wall-vs-device gap: time each raster pipeline segment
CHAINED (20 iters inside one jit, data-dependent, one readback) and
compare against the whole step. Where the sum of parts << whole, the
axon runtime is adding structural overhead (per-op class, not bytes).

Run: PYTHONPATH=/root/repo python tools/gap_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from bench import H, MAX_PER_TILE, W, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.project import project_gaussians, tile_rect
from d3ga_tpu.raster.tiles import (
    BIG_RANK,
    TILE,
    _select_per_tile,
    rasterize_tiled,
)

ITERS = 20
camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))
ntx, nty = -(-W // TILE), -(-H // TILE)

KW = dict(
    block_cap=4096, sub_block=4, sub_cap=1024, super_factor=1,
    coarse=os.environ.get("BENCH_COARSE", "dupsort_depth"),
    dup=int(os.environ.get("BENCH_DUP", "4")),
)


def chain(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return out, None
        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS, unroll=ITERS)[0]

    try:
        float(np.asarray(run(*args)))
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        dt2 = time.perf_counter() - t0
        print(f"{name:34s} {min(dt1, dt2) / ITERS * 1000:8.2f} ms/iter", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


# 1. projection only
def f_proj(means, s):
    p = project_gaussians(means + s * 1e-30, camera, cov3d=cov6, opacities=opac, colors=colors)
    return jnp.sum(p.xy) * 1e-30


chain("project", f_proj, means)

# 2. projection + sort + records
def f_sort(means, s):
    p = project_gaussians(means + s * 1e-30, camera, cov3d=cov6, opacities=opac, colors=colors)
    valid = p.valid & (p.radius > 0)
    order = jnp.argsort(jnp.where(valid, p.depth, jnp.inf), stable=True)
    records = jnp.concatenate([p.xy, p.conic, p.opacity[:, None], p.color], -1)[order]
    return jnp.sum(records) * 1e-30


chain("project+sort+records", f_sort, means)

# precompute sorted state for selection/blend stages
p = project_gaussians(means, camera, cov3d=cov6, opacities=opac, colors=colors)
valid = p.valid & (p.radius > 0)
order = jnp.argsort(jnp.where(valid, p.depth, jnp.inf), stable=True)
records = jnp.concatenate([p.xy, p.conic, p.opacity[:, None], p.color], -1)[order]
radius_s = p.radius[order]
valid_s = valid[order]
rects = tile_rect(records[:, 0:2], radius_s, TILE, ntx, nty)


# 3. selection only
from d3ga_tpu.raster.tiles import _select_per_tile_depthkey

if KW["coarse"] == "dupsort_depth":
    def sel(rects, valid_s):
        return _select_per_tile_depthkey(
            rects, valid_s, p.depth, ntx, nty, MAX_PER_TILE, dup=KW["dup"]
        )[:3]
    PAD = -1
else:
    def sel(rects, valid_s):
        return _select_per_tile(rects, valid_s, ntx, nty, MAX_PER_TILE, **KW)
    PAD = None


def f_sel(rects, valid_s, s):
    r = tuple(x + (s > 1e30).astype(x.dtype) for x in rects)
    ranks, counts, ov = sel(r, valid_s)
    return jnp.sum(counts).astype(jnp.float32) * 1e-30


chain("selection", f_sel, rects, valid_s)

ranks, counts, _ = sel(rects, valid_s)
sel_valid = (ranks >= 0) if PAD == -1 else (ranks < BIG_RANK)
records_ext = jnp.concatenate([records, jnp.zeros((1, records.shape[1]))], 0)
idx = jnp.where(sel_valid, ranks, jnp.int32(records.shape[0]))


# 4. gather only
def f_gather(records_ext, idx, s):
    rec_t = records_ext[idx + (s > 1e30).astype(jnp.int32)]
    return jnp.sum(rec_t) * 1e-30


chain("rec gather", f_gather, records_ext, idx)

rec_t = records_ext[idx]


# 5. blend kernel fwd only
def f_blend(rec_t, s):
    from d3ga_tpu.raster.pallas_blend_rec import blend_tiles_rec

    out = blend_tiles_rec(rec_t + s * 1e-30, ntx, 3, False)
    return jnp.sum(out) * 1e-30


chain("blend kernel fwd", f_blend, rec_t)


# 6. blend kernel fwd+bwd
def f_blend_grad(rec_t, s):
    from d3ga_tpu.raster.pallas_blend_rec import blend_tiles_rec

    def inner(r):
        return jnp.sum(blend_tiles_rec(r, ntx, 3, False))

    return jnp.sum(jax.grad(inner)(rec_t + s * 1e-30)) * 1e-30


chain("blend kernel fwd+bwd", f_blend_grad, rec_t)


# 7. full raster fwd only
def f_full(means, s):
    img, _ = rasterize_tiled(
        means + s * 1e-30, camera, jnp.zeros(3), cov3d=cov6, opacities=opac,
        colors=colors, max_per_tile=MAX_PER_TILE, use_pallas=True, **KW,
    )
    return jnp.sum(img) * 1e-30


chain("full raster fwd", f_full, means)


# 8. full step fwd+bwd (bench body)
def f_step(means, s):
    def loss(m):
        img, _ = rasterize_tiled(
            m, camera, jnp.zeros(3), cov3d=cov6, opacities=opac,
            colors=colors, max_per_tile=MAX_PER_TILE, use_pallas=True, **KW,
        )
        return jnp.mean(jnp.abs(img - target))

    return jax.grad(loss)(means + s * 1e-30)[0, 0] * 1e-30


chain("full step fwd+bwd(means)", f_step, means)
