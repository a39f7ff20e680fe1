"""Collective rasterization: Gaussian-parallel geometry, tile-parallel
blend, connected by one all-gather of the projected records over ICI.

This is the multi-chip counterpart of the CUDA reference's single-GPU
tile binning (new design — the reference has no distributed layer,
SURVEY.md §2.2). Within a "model" mesh-axis group, at the production
defaults (`dist/step_shard.py`: banded=True, shard_select=True):

  1. each device projects its N/m Gaussian shard (EWA preprocess),
  2. the ~13-float records are all-gathered over the axis (~7 MB for
     135k Gaussians — cheap on ICI; the transpose of this gather is the
     psum-scatter that routes pixel gradients back to Gaussian shards),
  3. sharded selection (`_rasterize_shard_select`): each device builds
     per-tile front-K lists from its OWN N/m shard only, all_to_all
     routes each tile's m partial lists to the tile's owner, and a
     batched (depth, idx) merge produces the final front-K — no device
     ever sorts the full duplicated key set and nothing global is
     argsorted or reordered,
  4. each device blends only its T/m row-aligned tile slice and the
     image STAYS sharded: losses run banded with a halo exchange
     (`dist/banded.py`) — no image all-gather, no replicated SSIM.

Legacy modes kept for parity testing: shard_select=False makes every
device select from the full gathered record set (redundant O(m) work);
banded=False all-gathers the finished tile blocks into a replicated
image. Both are measured slower (SCALING_r03.json) and are not the
step_shard defaults.

All functions here are designed to run INSIDE shard_map.
"""

import jax
import jax.numpy as jnp

from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.raster.project import project_gaussians, tile_rect
import d3ga_tpu.raster.tiles as _tiles
from d3ga_tpu.raster.tiles import (
    BIG_RANK,
    TILE,
    RasterAux,
    _blend_tiles,
    _select_per_tile,
    gather_records_dupslot,
)


def rasterize_collective(
    local_means,
    camera: Camera,
    bg_color,
    axis: str,
    n_shards: int,
    cov3d=None,
    scales=None,
    rotations=None,
    opacities=None,
    colors=None,
    shs=None,
    sh_degree: int = 0,
    max_per_tile: int = 256,
    block_cap: int = 4096,
    sub_block: int = 0,
    sub_cap: int = 1024,
    super_factor: int = 1,
    coarse: str = "topk",
    dup: int = 2,
    use_pallas: bool = False,
    banded: bool = False,
    shard_select: bool = False,
    front_margin=None,
):
    """Rasterize from per-shard Gaussian arrays; returns (image, aux):
    the full [C, H, W] image (replicated within the axis group) and a
    RasterAux with tile-LOCAL counters (psum over `axis` for globals).

    Call inside shard_map with `axis` being the "model" mesh axis; all
    local_* arrays hold this device's N/m shard. Same keyword contract
    as `rasterize_tiled`, so `functools.partial(rasterize_collective,
    axis=..., n_shards=...)` drops into `render_frame(rasterize_fn=...)`.

    banded=True keeps the image SHARDED: tile slices are row-aligned
    (each device owns a horizontal band of ceil(nty/m) tile rows) and
    the final all-gather is skipped — the return is the LOCAL band
    [C, band_h, W] (rows beyond the image zeroed). Window losses then
    run with a halo exchange (`dist/banded.py`), removing the O(m)
    replicated loss work (VERDICT r2 weak #2).

    shard_select=True removes the other O(m) redundancy — the
    per-device FULL depth sort + duplicate-sort selection: each device
    selects per-tile front-K candidates from ITS N/m Gaussian shard
    only ((tile|depth)-key sort of dup^2*N/m keys, depth carried as a
    payload), the per-tile lists are exchanged with one all_to_all so
    every tile owner holds m front-K lists for its tiles, and the lists
    are merged with one batched (depth, index)-key sort. Exact: any of
    a tile's global front-K lives in its shard's front-K. Ordering ties
    break by global index like the single-device path (up to the
    22-bit depth quantization of the local key sort).
    """
    H, W = camera.height, camera.width
    n_tiles_x = -(-W // TILE)
    n_tiles_y = -(-H // TILE)
    n_tiles = n_tiles_x * n_tiles_y
    if banded:
        # row-aligned bands so each device's tiles form whole pixel rows
        rows_per_shard = -(-n_tiles_y // n_shards)
        tiles_per_shard = rows_per_shard * n_tiles_x
    else:
        tiles_per_shard = -(-n_tiles // n_shards)

    proj = project_gaussians(
        local_means,
        camera,
        cov3d=cov3d,
        scales=scales,
        rotations=rotations,
        opacities=opacities,
        colors=colors,
        shs=shs,
        sh_degree=sh_degree,
    )

    # Gather the compact screen-space records across the Gaussian shards.
    rec = (
        proj.xy,
        proj.depth,
        proj.conic,
        proj.color,
        proj.opacity,
        proj.radius,
        proj.valid,
    )
    xy, depth, conic, color, opac, radius, valid = (
        jax.lax.all_gather(r, axis, tiled=True) for r in rec
    )

    valid = valid & (radius > 0)
    my = jax.lax.axis_index(axis)

    if shard_select:
        return _rasterize_shard_select(
            proj, (xy, conic, opac, color), camera, bg_color, axis,
            n_shards, my, n_tiles_x, n_tiles_y, n_tiles, tiles_per_shard,
            max_per_tile, dup, banded, use_pallas, front_margin,
        )

    sort_depth = jnp.where(valid, depth, jnp.inf)
    # Records packed [N, 6+C] BEFORE the depth reorder, so the reorder
    # is ONE row gather (or one multi-payload sort) instead of six
    # per-array gathers — gather rows carry per-row costs on TPU.
    C0 = color.shape[-1]
    records0 = jnp.concatenate([xy, conic, opac[:, None], color], axis=-1)
    nc = records0.shape[-1]
    if _tiles.REORDER == "sortpayload":
        outs = jax.lax.sort(
            (sort_depth,)
            + tuple(records0[:, i] for i in range(nc))
            + (radius, valid.astype(jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        records = jnp.stack(outs[1 : 1 + nc], axis=1)
        radius_s = outs[1 + nc]
        valid_s = outs[2 + nc].astype(bool)
    else:
        order = jnp.argsort(sort_depth, stable=True)
        records, radius_s, valid_s = _tiles.reorder_records(
            records0, radius, valid, order
        )
    xy_s = records[:, 0:2]

    rects = tile_rect(xy_s, radius_s, TILE, n_tiles_x, n_tiles_y)

    my = jax.lax.axis_index(axis)
    tile_ids = my * tiles_per_shard + jnp.arange(tiles_per_shard, dtype=jnp.int32)
    tile_ids = jnp.minimum(tile_ids, n_tiles - 1)  # clamp padding tiles

    want_q = (
        use_pallas and coarse == "dupsort_tile" and _tiles.REC_GRAD == "dupslot"
    )
    if want_q:
        ranks, counts, block_overflow, dup_q = _select_per_tile(
            rects, valid_s, n_tiles_x, n_tiles_y, max_per_tile,
            tile_ids=tile_ids, block_cap=block_cap, sub_block=sub_block,
            sub_cap=sub_cap, super_factor=super_factor, coarse=coarse,
            dup=dup, return_q=True,
        )
    else:
        dup_q = None
        ranks, counts, block_overflow = _select_per_tile(
            rects, valid_s, n_tiles_x, n_tiles_y, max_per_tile,
            tile_ids=tile_ids, block_cap=block_cap, sub_block=sub_block,
            sub_cap=sub_cap, super_factor=super_factor, coarse=coarse,
            dup=dup,
        )
    sel_valid = ranks < BIG_RANK

    if use_pallas:
        # Record-direct fused blend (see tiles.rasterize_tiled): the
        # shard's contiguous tile slice rides the kernel's tile_offset
        # scalar; clamped padding tiles blend with a wrong origin but
        # are dropped at reassembly below.
        from d3ga_tpu.raster.pallas_blend_rec import blend_tiles_rec

        records_ext = jnp.concatenate(
            [records, jnp.zeros((1, records.shape[1]), records.dtype)], axis=0
        )
        idx = jnp.where(sel_valid, ranks, jnp.int32(records.shape[0]))
        if dup_q is not None:
            rec_t = gather_records_dupslot(records_ext, idx, dup_q, dup * dup)
        else:
            rec_t = records_ext[idx]
        C = C0
        interp = jax.default_backend() != "tpu"
        out = blend_tiles_rec(
            rec_t, jnp.minimum(counts, max_per_tile),
            my * tiles_per_shard, n_tiles_x, C, interp,
        )
        rgb = out[..., :-1] + out[..., -1:] * bg_color
        my_tiles = jnp.concatenate([rgb, 1.0 - out[..., -1:]], axis=-1)
    else:
        safe = jnp.where(sel_valid, ranks, 0)
        rec_t = records[safe]
        xy_t = rec_t[..., 0:2]
        conic_t = rec_t[..., 2:5]
        opac_t = rec_t[..., 5]
        color_t = rec_t[..., 6 : 6 + C0]

        origin = jnp.stack(
            [(tile_ids % n_tiles_x) * TILE, (tile_ids // n_tiles_x) * TILE], -1
        )
        my_tiles = _blend_tiles(
            xy_t, conic_t, color_t, opac_t, sel_valid, bg_color, origin
        )  # [tiles_per_shard, 256, C+1]

    from d3ga_tpu.raster.tiles import visible_cap_drops

    tbg_tiles = 1.0 - my_tiles[..., -1].min(axis=1)  # alpha last channel
    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + block_overflow,
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(jnp.minimum(counts, max_per_tile)),
        visible_overflow=visible_cap_drops(tbg_tiles, counts, max_per_tile)
        + block_overflow,
    )
    image = _assemble_image(
        my_tiles, my, axis, n_shards, tiles_per_shard,
        n_tiles_x, n_tiles_y, n_tiles, H, W, banded,
    )
    return image, aux


def _assemble_image(
    my_tiles, my, axis, n_shards, tiles_per_shard,
    n_tiles_x, n_tiles_y, n_tiles, H, W, banded,
):
    """Shard tile blocks [tps, 256, C+1] -> image: local band
    [C, bh, W] (banded) or the all-gathered full [C, H, W]."""
    if banded:
        # local band; rows outside the image zeroed (clamped padding
        # tiles blended garbage there)
        bh = tiles_per_shard // n_tiles_x * TILE
        band = my_tiles.reshape(
            tiles_per_shard // n_tiles_x, n_tiles_x, TILE, TILE, -1
        )
        band = jnp.transpose(band, (0, 2, 1, 3, 4)).reshape(
            bh, n_tiles_x * TILE, -1
        )[:, :W]
        rows = my * bh + jnp.arange(bh)
        band = jnp.where((rows < H)[:, None, None], band, 0.0)
        C = band.shape[-1] - 1
        return jnp.transpose(band[..., :C], (2, 0, 1))

    all_tiles = jax.lax.all_gather(my_tiles, axis, tiled=True)
    # Drop clamped padding duplicates: rebuild by unique tile id order.
    n_total = n_shards * tiles_per_shard
    if n_total > n_tiles:
        # padding tiles were clamped to (n_tiles-1); the true tile block
        # for (n_tiles-1) is the first occurrence. Slice per shard.
        keep = []
        for s in range(n_shards):
            lo = s * tiles_per_shard
            hi = min((s + 1) * tiles_per_shard, n_tiles) - s * tiles_per_shard
            if hi > 0:
                keep.append(all_tiles[lo : lo + hi])
        all_tiles = jnp.concatenate(keep, axis=0)

    C = all_tiles.shape[-1] - 1
    img = all_tiles.reshape(n_tiles_y, n_tiles_x, TILE, TILE, C + 1)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
        n_tiles_y * TILE, n_tiles_x * TILE, C + 1
    )[:H, :W]
    return jnp.transpose(img[..., :C], (2, 0, 1))


def _rasterize_shard_select(
    proj, gathered, camera, bg_color, axis, n_shards, my,
    n_tiles_x, n_tiles_y, n_tiles, tiles_per_shard,
    max_per_tile, dup, banded, use_pallas, front_margin=None,
):
    """Sharded-selection collective raster (see rasterize_collective's
    shard_select doc): local front-F per tile from the N/m shard, one
    all_to_all of the per-tile lists, one batched (depth, index) merge
    sort; records stay in ORIGINAL (unsorted) global order — the blend
    consumes depth-ordered indices directly, so there is no global
    argsort and no record reorder at all.

    front_margin=None ships full front-K lists (merge keys per device
    stay a FIXED m*K per tile — the term SCALING_r04.json names as the
    4-device efficiency cap). An int ships only the front
    F = ceil(K/m) + margin entries per shard per tile, so both the
    all_to_all volume and the merge keys scale ~1/m. Exact whenever no
    shard's truncated list could have reached the merged K-th entry;
    the conservative `merge_overflow` counter (compared at the local
    sort's depth-quantum granularity) reports potential misses so
    callers can widen the margin — the dup-widening pattern
    (VERDICT r4 #6)."""
    from d3ga_tpu.raster.tiles import _select_per_tile_depthkey

    H, W = camera.height, camera.width
    K = max_per_tile
    if front_margin is None:
        F = K
    else:
        F = min(K, -(-K // n_shards) + int(front_margin))
    xy_g, conic_g, opac_g, color_g = gathered
    C0 = color_g.shape[-1]
    records0 = jnp.concatenate(
        [xy_g, conic_g, opac_g[:, None], color_g], axis=-1
    )
    n_global = records0.shape[0]
    n_loc = proj.xy.shape[0]

    # --- local per-tile front-F over ALL tiles (keys: dup^2 * N/m) ----
    valid_l = proj.valid & (proj.radius > 0)
    rects_l = tile_rect(proj.xy, proj.radius, TILE, n_tiles_x, n_tiles_y)
    idx_l, counts_l, drop_l, _ties, dep_l = _select_per_tile_depthkey(
        rects_l, valid_l, proj.depth, n_tiles_x, n_tiles_y, F,
        dup=dup, return_depth=True,
    )  # [T, F] local indices (-1 pad), [T], [], [], [T, F] depths (inf pad)

    # --- exchange: every tile owner gets all shards' lists ------------
    t_pad = n_shards * tiles_per_shard - n_tiles
    if t_pad:
        idx_l = jnp.pad(idx_l, ((0, t_pad), (0, 0)), constant_values=-1)
        dep_l = jnp.pad(dep_l, ((0, t_pad), (0, 0)), constant_values=jnp.inf)
        counts_l = jnp.pad(counts_l, (0, t_pad))
    rows_l = jnp.where(idx_l >= 0, idx_l + my * n_loc, n_global)
    split = lambda x: x.reshape(n_shards, tiles_per_shard, F)  # noqa: E731
    rows_x = jax.lax.all_to_all(split(rows_l), axis, 0, 0)      # [m, tps, F]
    dep_x = jax.lax.all_to_all(split(dep_l), axis, 0, 0)
    cnt_x = jax.lax.all_to_all(
        counts_l.reshape(n_shards, tiles_per_shard, 1), axis, 0, 0
    )[..., 0]                                                    # [m, tps]

    # --- merge: one batched (depth, global index) sort ----------------
    mF = n_shards * F
    dep_m = jnp.transpose(dep_x, (1, 0, 2)).reshape(tiles_per_shard, mF)
    rows_m = jnp.transpose(rows_x, (1, 0, 2)).reshape(tiles_per_shard, mF)
    dep_s, rows_s = jax.lax.sort((dep_m, rows_m), num_keys=2, dimension=-1)
    kk = min(K, mF)
    rows_k = rows_s[:, :kk]
    if kk < K:
        rows_k = jnp.pad(rows_k, ((0, 0), (0, K - kk)), constant_values=n_global)
    counts = jnp.sum(cnt_x, axis=0)                              # [tps] true totals
    eff = jnp.minimum(counts, K)
    live = jax.lax.broadcasted_iota(jnp.int32, (tiles_per_shard, K), 1) < eff[:, None]
    idx = jnp.where(live, rows_k, n_global)

    merge_overflow = jnp.int32(-1)
    if F < K:
        # Could a shard's UNSENT (F+1)-th entry have made the merged
        # front-K? Conservative trip at the local key sort's
        # depth-quantum granularity: unsent entries are >= the last
        # shipped entry's QUANTIZED depth, so compare quanta.
        depth_bits = min(22, 31 - int(n_tiles + 1).bit_length())

        def dq(x):
            i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
            # inf stays maximal; depths are positive (bit 31 clear)
            return i >> (31 - depth_bits)

        kth_dep = dep_s[:, kk - 1]                                # [tps]
        # tiles with fewer than K live entries keep EVERY candidate ->
        # any unsent entry belongs in the image: kth quantum = +inf
        kth_q = jnp.where(counts > K, dq(kth_dep), jnp.int32(2**30))
        last_q = dq(dep_x[:, :, F - 1])                           # [m, tps]
        trip = (cnt_x > F) & (last_q <= kth_q[None, :])
        merge_overflow = jnp.sum(
            jnp.where(trip, cnt_x - F, 0)
        ).astype(jnp.int32)

    # --- blend (records in original order; K axis is depth-ordered) ---
    records_ext = jnp.concatenate(
        [records0, jnp.zeros((1, records0.shape[1]), records0.dtype)], axis=0
    )
    tile_ids = my * tiles_per_shard + jnp.arange(tiles_per_shard, dtype=jnp.int32)
    tile_ids = jnp.minimum(tile_ids, n_tiles - 1)
    if use_pallas:
        from d3ga_tpu.raster.pallas_segsum import block_width

        interp = jax.default_backend() != "tpu"
        if _tiles.REC_GRAD == "segsum" and block_width(dup * dup) >= 128:
            # round-5 segmented-sum backward combine, sharded flavor:
            # each device combines its own tiles' cotangents (a
            # Gaussian's <= dup^2 tiles split across owners, so the
            # per-device run bound holds); the psum-scatter transpose
            # of the record all_gather then routes the per-Gaussian
            # rows back to their shards as before
            from d3ga_tpu.raster.pallas_segsum import blend_gather_segsum_rec

            out = blend_gather_segsum_rec(
                records_ext, idx, eff, my * tiles_per_shard, n_tiles_x,
                C0, dup * dup, interp,
            )
        else:
            from d3ga_tpu.raster.pallas_blend_rec import blend_tiles_rec

            rec_t = records_ext[idx]
            out = blend_tiles_rec(
                rec_t, eff, my * tiles_per_shard, n_tiles_x, C0, interp,
            )
        rgb = out[..., :-1] + out[..., -1:] * bg_color
        my_tiles = jnp.concatenate([rgb, 1.0 - out[..., -1:]], axis=-1)
    else:
        rec_t = records_ext[idx]
        origin = jnp.stack(
            [(tile_ids % n_tiles_x) * TILE, (tile_ids // n_tiles_x) * TILE], -1
        )
        my_tiles = _blend_tiles(
            rec_t[..., 0:2], rec_t[..., 2:5], rec_t[..., 6 : 6 + C0],
            rec_t[..., 5], live, bg_color, origin,
        )

    from d3ga_tpu.raster.tiles import visible_cap_drops

    tbg_tiles = 1.0 - my_tiles[..., -1].min(axis=1)
    aux = RasterAux(
        overflow=jnp.sum(jnp.maximum(counts - K, 0)) + drop_l,
        max_per_tile=jnp.max(counts),
        n_contrib=jnp.sum(eff),
        visible_overflow=visible_cap_drops(tbg_tiles, counts, K) + drop_l,
        merge_overflow=merge_overflow,
    )
    image = _assemble_image(
        my_tiles, my, axis, n_shards, tiles_per_shard,
        n_tiles_x, n_tiles_y, n_tiles, H, W, banded,
    )
    return image, aux


def rasterize_sharded(
    mesh,
    means3d,
    camera: Camera,
    bg_color,
    cov3d=None,
    scales=None,
    rotations=None,
    opacities=None,
    colors=None,
    shs=None,
    sh_degree: int = 0,
    max_per_tile: int = 256,
    block_cap: int = 4096,
    sub_block: int = 0,
    sub_cap: int = 1024,
    super_factor: int = 1,
    coarse: str = "topk",
    dup: int = 2,
    use_pallas: bool = False,
    axis: str = "model",
    shard_select: bool = False,
    front_margin=None,
):
    """Top-level wrapper: shards full Gaussian arrays over `axis`, runs
    the collective rasterizer, returns the (replicated) image. Used for
    eval/bench and for testing sharded == single-device."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    m = mesh.shape[axis]
    n = means3d.shape[0]
    pad = (-n) % m

    def padg(x, fill=0.0):
        if x is None or pad == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)

    # Padding Gaussians sit behind the camera -> culled.
    means_p = means3d
    if pad:
        behind = jnp.broadcast_to(
            camera.camera_center[None]
            - 100.0 * camera.world_view[2, :3][None],
            (pad, 3),
        )
        means_p = jnp.concatenate([means3d, behind], axis=0)

    args = dict(
        cov3d=padg(cov3d),
        scales=padg(scales, 1e-6),
        rotations=padg(rotations, 1.0),
        opacities=padg(opacities),
        colors=padg(colors),
        shs=padg(shs),
    )
    present = {k: v for k, v in args.items() if v is not None}
    keys = tuple(sorted(present.keys()))
    W, H = camera.width, camera.height

    def fn(means_local, wv, fp, cc, tfx, tfy, bg, *vals):
        cam = Camera(
            world_view=wv, full_proj=fp, camera_center=cc,
            tanfovx=tfx, tanfovy=tfy, width=W, height=H,
        )
        local = dict(zip(keys, vals))
        img, aux = rasterize_collective(
            means_local,
            cam,
            bg,
            axis=axis,
            n_shards=m,
            sh_degree=sh_degree,
            max_per_tile=max_per_tile,
            block_cap=block_cap, sub_block=sub_block, sub_cap=sub_cap,
            super_factor=super_factor, coarse=coarse, dup=dup,
            use_pallas=use_pallas,
            shard_select=shard_select,
            front_margin=front_margin,
            **{k: local.get(k) for k in args},
        )

        def agg(x, reduce=jax.lax.psum):
            x = jnp.asarray(x)
            # -1 sentinel fields (not computed) stay -1; the sentinel
            # choice is uniform across shards so the where is too
            return jnp.where(x < 0, x, reduce(jnp.maximum(x, 0), axis))

        aux_g = RasterAux(
            overflow=agg(aux.overflow),
            max_per_tile=agg(aux.max_per_tile, jax.lax.pmax),
            n_contrib=agg(aux.n_contrib),
            visible_overflow=agg(aux.visible_overflow),
            depth_ties=agg(aux.depth_ties),
            clamp_overflow=agg(aux.clamp_overflow),
            merge_overflow=agg(aux.merge_overflow),
        )
        return img, aux_g

    shard = P(axis)
    rep = P()
    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(shard,) + (rep,) * 6 + tuple(shard for _ in keys),
        out_specs=(P(), P()),
        check_vma=False,
    )(
        means_p,
        camera.world_view,
        camera.full_proj,
        camera.camera_center,
        camera.tanfovx,
        camera.tanfovy,
        bg_color,
        *[present[k] for k in keys],
    )
    return out
