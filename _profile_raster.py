import time, jax, jax.numpy as jnp, numpy as np
from bench import build_scene, H, W, N_GAUSS, MAX_PER_TILE
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.project import project_gaussians, tile_rect
from d3ga_tpu.raster.tiles import _select_per_tile, _blend_tiles, rasterize_tiled, TILE
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))

ntx, nty = -(-W//TILE), -(-H//TILE)

@jax.jit
def stage_project(means, cov6, opac, colors):
    return project_gaussians(means, camera, cov3d=cov6, opacities=opac, colors=colors)

proj = stage_project(means, cov6, opac, colors); jax.block_until_ready(proj)

valid = proj.valid & (proj.radius > 0)
sort_depth = jnp.where(valid, proj.depth, jnp.inf)

@jax.jit
def stage_sort(proj, valid, sort_depth):
    order = jnp.argsort(sort_depth, stable=True)
    rank_of = jnp.argsort(order, stable=True)
    return order, rank_of

order, rank_of = stage_sort(proj, valid, sort_depth); jax.block_until_ready((order, rank_of))

rects = tile_rect(proj.xy, proj.radius, TILE, ntx, nty)

@jax.jit
def stage_select(rects, valid, rank_of):
    return _select_per_tile(rects, valid, ntx, nty, rank_of, MAX_PER_TILE)

ranks, counts = stage_select(rects, valid, rank_of); jax.block_until_ready(ranks)
print("max count", counts.max(), "mean", counts.mean())

def timeit(name, f, *args, n=5):
    f(*args) if True else None
    jax.block_until_ready(f(*args))
    t0=time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(name, f"{(time.perf_counter()-t0)/n*1000:.1f} ms")

timeit("project", stage_project, means, cov6, opac, colors)
timeit("sort", stage_sort, proj, valid, sort_depth)
timeit("select", stage_select, rects, valid, rank_of)

# blend
from d3ga_tpu.raster.tiles import BIG_RANK
sel_valid = ranks < BIG_RANK
safe = jnp.where(sel_valid, ranks, 0)
xy_s = proj.xy[order]; conic_s = proj.conic[order]; color_s = proj.color[order]; opac_s = proj.opacity[order]
tids = jnp.arange(ntx*nty, dtype=jnp.int32)
origin = jnp.stack([(tids % ntx)*TILE, (tids//ntx)*TILE], -1)

@jax.jit
def stage_gather_blend(xy_s, conic_s, color_s, opac_s, safe, sel_valid, origin):
    return _blend_tiles(xy_s[safe], conic_s[safe], color_s[safe], opac_s[safe], sel_valid, jnp.zeros(3), origin)

timeit("gather+blend", stage_gather_blend, xy_s, conic_s, color_s, opac_s, safe, sel_valid, origin)
