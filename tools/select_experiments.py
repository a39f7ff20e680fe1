"""Selection-stage experiments on the real chip (perf campaign, round 2).

E1: coarse block binning — batched top_k (current) vs cumsum+searchsorted
E2: fine stage — 2-level (kb=4096) vs 3-level (mid 4x4 blocks, kb 1024)
E4: axon VM per-op replay overhead — chained trivial-op programs

Each variant is timed with ITERS chained iterations inside one jitted
fori_loop with REAL data dependencies (the output feeds the next
iteration's input perturbation through a non-foldable path).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/select_experiments.py
"""

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
from d3ga_tpu.raster.tiles import BIG_RANK, TILE, _select_per_tile

ITERS = 10


def chain_time(name, fn, x0):
    """fn(x_int32_vector) -> (out_pytree, feedback int32 scalar);
    feedback is folded back into x so iterations truly depend."""

    @jax.jit
    def run(x):
        def body(_, x):
            out, fb = fn(x)
            return x.at[0].set(x[0] ^ (fb & 1))

        return jax.lax.fori_loop(0, ITERS, body, x)

    r = run(x0)
    float(np.asarray(r[0]))
    t0 = time.perf_counter()
    r = run(x0)
    float(np.asarray(r[0]))
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
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

    proj = jax.jit(
        lambda m: project_gaussians(m, camera, cov3d=cov6, opacities=opac, colors=colors)
    )(means)
    valid = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
    xy_s = proj.xy[order]
    radius_s = proj.radius[order]
    valid_s = np.asarray(valid[order])
    rects = tile_rect(xy_s, radius_s, TILE, ntx, nty)
    rects = tuple(np.asarray(r) for r in rects)
    xmin, xmax, ymin, ymax = (jnp.asarray(r) for r in rects)
    n = int(xmin.shape[0])
    packed = xmin | (xmax << 8) | (ymin << 16) | (ymax << 24)
    valid_j = jnp.asarray(valid_s)

    block = 8
    nbx, nby = -(-ntx // block), -(-nty // block)
    n_blocks = nbx * nby
    kb = 4096
    bids = jnp.arange(n_blocks, dtype=jnp.int32)
    bx0 = (bids % nbx) * block
    by0 = (bids // nbx) * block
    ranks = jnp.arange(n, dtype=jnp.int32)

    def block_overlap(v):
        return (
            v[None, :]
            & (bx0[:, None] < xmax[None, :])
            & (bx0[:, None] + block > xmin[None, :])
            & (by0[:, None] < ymax[None, :])
            & (by0[:, None] + block > ymin[None, :])
        )

    x0 = jnp.zeros((8,), jnp.int32)

    # --- E1a: current coarse (batched top_k over [54, N]) ---------------
    def coarse_topk(x):
        v = valid_j & (ranks >= x[0])  # data dependency
        ov = block_overlap(v)
        score = jnp.where(ov, ranks[None, :], BIG_RANK)
        block_ranks = -jax.lax.top_k(-score, kb)[0]
        return block_ranks, jnp.sum(block_ranks)

    chain_time("E1a coarse top_k [54,135k]->4096", coarse_topk, x0)

    # --- E1b: cumsum + searchsorted gather ------------------------------
    def coarse_search(x):
        v = valid_j & (ranks >= x[0])
        ov = block_overlap(v)
        c = jnp.cumsum(ov.astype(jnp.int32), axis=1)  # [54, N] inclusive
        # slot k of block b holds the rank whose inclusive count == k+1
        tgt = jnp.arange(1, kb + 1, dtype=jnp.int32)

        def per_block(cb):
            return jnp.searchsorted(cb, tgt, side="left")

        src = jax.vmap(per_block)(c)  # [54, kb] first index with count k+1
        hit = src < n
        block_ranks = jnp.where(hit, src.astype(jnp.int32), BIG_RANK)
        return block_ranks, jnp.sum(block_ranks)

    chain_time("E1b coarse cumsum+searchsorted", coarse_search, x0)

    # --- E2: fine stage variants ---------------------------------------
    coarse_out = np.asarray(coarse_topk(np.zeros(8, np.int32))[0])
    block_ranks_const = jnp.asarray(coarse_out)

    def fine_2level(x):
        out, counts, bov = _select_per_tile(
            (xmin, xmax, ymin, ymax), valid_j & (ranks >= x[0]), ntx, nty, K
        )
        return out, jnp.sum(out)

    chain_time("E2a full 2-level select (today)", fine_2level, x0)

    # 3-level: mid 4x4-tile blocks pick 1024 from parent 4096, then tiles
    def fine_3level(x):
        v = valid_j & (ranks >= x[0])
        ov = block_overlap(v)
        score = jnp.where(ov, ranks[None, :], BIG_RANK)
        block_ranks = -jax.lax.top_k(-score, kb)[0]  # [54, 4096]

        cvalid_b = block_ranks < BIG_RANK
        safe_b = jnp.where(cvalid_b, block_ranks, 0)
        packed_b = jnp.where(cvalid_b, packed[safe_b], 0)

        mid = 4
        nmx, nmy = -(-ntx // mid), -(-nty // mid)
        mids = jnp.arange(nmx * nmy, dtype=jnp.int32)
        mx0 = (mids % nmx) * mid
        my0 = (mids // nmx) * mid
        parent = (my0 // block) * nbx + (mx0 // block)
        cand_m = block_ranks[parent]      # [NM, 4096]
        pack_m = packed_b[parent]
        pxmin = pack_m & 0xFF
        pxmax = (pack_m >> 8) & 0xFF
        pymin = (pack_m >> 16) & 0xFF
        pymax = (pack_m >> 24) & 0xFF
        ovm = (
            (cand_m < BIG_RANK)
            & (mx0[:, None] < pxmax)
            & (mx0[:, None] + mid > pxmin)
            & (my0[:, None] < pymax)
            & (my0[:, None] + mid > pymin)
        )
        km = 1024
        j = jax.lax.broadcasted_iota(jnp.int32, ovm.shape, 1)
        key = jnp.where(ovm, j, kb)
        first = -jax.lax.top_k(-key, km)[0]
        hit = first < kb
        cand_mid = jnp.where(
            hit, jnp.take_along_axis(cand_m, jnp.where(hit, first, 0), axis=1), BIG_RANK
        )
        pack_mid = jnp.where(
            hit, jnp.take_along_axis(pack_m, jnp.where(hit, first, 0), axis=1), 0
        )

        # per-tile from mid lists
        tids = jnp.arange(ntx * nty, dtype=jnp.int32)
        txs = tids % ntx
        tys = tids // ntx
        midof = (tys // mid) * nmx + (txs // mid)
        cand_t = cand_mid[midof]          # [T, 1024]
        pack_t = pack_mid[midof]
        txmin = pack_t & 0xFF
        txmax = (pack_t >> 8) & 0xFF
        tymin = (pack_t >> 16) & 0xFF
        tymax = (pack_t >> 24) & 0xFF
        ovt = (
            (cand_t < BIG_RANK)
            & (txs[:, None] >= txmin)
            & (txs[:, None] < txmax)
            & (tys[:, None] >= tymin)
            & (tys[:, None] < tymax)
        )
        j2 = jax.lax.broadcasted_iota(jnp.int32, ovt.shape, 1)
        key2 = jnp.where(ovt, j2, km)
        first2 = -jax.lax.top_k(-key2, K)[0]
        hit2 = first2 < km
        out = jnp.where(
            hit2,
            jnp.take_along_axis(cand_t, jnp.where(hit2, first2, 0), axis=1),
            BIG_RANK,
        )
        return out, jnp.sum(out)

    chain_time("E2b 3-level select (mid 4x4 @1024)", fine_3level, x0)

    # correctness: 3-level == 2-level on this scene
    a = np.asarray(fine_2level(np.zeros(8, np.int32))[0])
    b = np.asarray(fine_3level(np.zeros(8, np.int32))[0])
    print("E2 parity (3-level == 2-level):", bool((a == b).all()), flush=True)

    # --- E2c: fine stage via cumsum + searchsorted (no sort) ------------
    def fine_searchsorted(x):
        v = valid_j & (ranks >= x[0])
        ov = block_overlap(v)
        score = jnp.where(ov, ranks[None, :], BIG_RANK)
        block_ranks = -jax.lax.top_k(-score, kb)[0]  # coarse unchanged

        cvalid_b = block_ranks < BIG_RANK
        safe_b = jnp.where(cvalid_b, block_ranks, 0)
        packed_b = jnp.where(cvalid_b, packed[safe_b], 0)

        tids = jnp.arange(ntx * nty, dtype=jnp.int32)
        txs = tids % ntx
        tys = tids // ntx
        bof = (tys // block) * nbx + (txs // block)
        cand = block_ranks[bof]
        cpk = packed_b[bof]
        cxmin = cpk & 0xFF
        cxmax = (cpk >> 8) & 0xFF
        cymin = (cpk >> 16) & 0xFF
        cymax = (cpk >> 24) & 0xFF
        ov_t = (
            (cand < BIG_RANK)
            & (txs[:, None] >= cxmin)
            & (txs[:, None] < cxmax)
            & (tys[:, None] >= cymin)
            & (tys[:, None] < cymax)
        )  # [T, kb]
        c = jnp.cumsum(ov_t.astype(jnp.int32), axis=1)  # [T, kb]
        tgt = jnp.arange(1, K + 1, dtype=jnp.int32)
        src = jax.vmap(lambda cb: jnp.searchsorted(cb, tgt, side="left"))(c)
        hit = src < kb
        out = jnp.where(
            hit,
            jnp.take_along_axis(cand, jnp.where(hit, src, 0), axis=1),
            BIG_RANK,
        )
        return out, jnp.sum(out)

    chain_time("E2c fine cumsum+searchsorted", fine_searchsorted, x0)
    a = np.asarray(fine_2level(np.zeros(8, np.int32))[0])
    cc = np.asarray(fine_searchsorted(np.zeros(8, np.int32))[0])
    print("E2c parity (searchsorted == 2-level):", bool((a == cc).all()), flush=True)

    # --- E4: per-op replay overhead -------------------------------------
    for n_ops in (10, 100, 400):
        def many_ops(x, n_ops=n_ops):
            y = x.astype(jnp.float32)
            for i in range(n_ops):
                y = y * 1.0000001 + 0.0000001
            return y, jnp.sum(y).astype(jnp.int32)

        chain_time(f"E4 {n_ops} trivial chained ops", many_ops, x0)


if __name__ == "__main__":
    main()
