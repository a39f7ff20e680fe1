import time, jax, jax.numpy as jnp, numpy as np
from bench import build_scene, H, W, MAX_PER_TILE
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.project import project_gaussians, tile_rect
from d3ga_tpu.raster.tiles import _select_per_tile, _blend_tiles, TILE, BIG_RANK
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
ntx, nty = -(-W//TILE), -(-H//TILE)

def sync(x): return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])
def timeit(name, f, *args, n=5):
    r = f(*args); sync(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*args)
    sync(r)
    print(name, f"{(time.perf_counter()-t0)/n*1000:.1f} ms")

@jax.jit
def s1(means):
    p = project_gaussians(means, camera, cov3d=cov6, opacities=opac, colors=colors)
    return p
timeit("project", s1, means)
proj = s1(means)

@jax.jit
def s2(proj):
    valid = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
    return (proj.xy[order], proj.conic[order], proj.color[order], proj.opacity[order],
            proj.radius[order], valid[order])
timeit("sort+gather6", s2, proj)
xy_s, conic_s, color_s, opac_s, radius_s, valid_s = s2(proj)

@jax.jit
def s3(xy_s, radius_s, valid_s):
    rects = tile_rect(xy_s, radius_s, TILE, ntx, nty)
    return _select_per_tile(rects, valid_s, ntx, nty, MAX_PER_TILE)
timeit("select2level", s3, xy_s, radius_s, valid_s)
ranks, counts, bov = s3(xy_s, radius_s, valid_s)
print("  counts max", int(np.asarray(counts).max()), "block_ovf", int(np.asarray(bov)))

sel_valid = ranks < BIG_RANK
safe = jnp.where(sel_valid, ranks, 0)
tids = jnp.arange(ntx*nty, dtype=jnp.int32)
origin = jnp.stack([(tids % ntx)*TILE, (tids//ntx)*TILE], -1)

@jax.jit
def s4(xy_s, conic_s, color_s, opac_s, safe, sel_valid):
    return _blend_tiles(xy_s[safe], conic_s[safe], color_s[safe], opac_s[safe], sel_valid, jnp.zeros(3), origin)
timeit("gather+blend", s4, xy_s, conic_s, color_s, opac_s, safe, sel_valid)

# blend without lax.map chunking? time single big-chunk variant
@jax.jit
def s5(xy_s, conic_s, color_s, opac_s, safe, sel_valid):
    return _blend_tiles(xy_s[safe], conic_s[safe], color_s[safe], opac_s[safe], sel_valid, jnp.zeros(3), origin, blend_chunk=2688)
timeit("gather+blend 1chunk", s5, xy_s, conic_s, color_s, opac_s, safe, sel_valid)

# pallas blend path
from d3ga_tpu.raster.pallas_blend import blend_tiles_pallas, falloff_coeffs
origin_f = origin.astype(jnp.float32)

@jax.jit
def s6(xy_s, conic_s, color_s, opac_s, safe, sel_valid):
    xy_t = xy_s[safe]; conic_t = conic_s[safe]; color_t = color_s[safe]; opac_t = opac_s[safe]
    xy_local = xy_t - origin_f[:, None, :]
    coeffs = falloff_coeffs(xy_local, conic_t)
    opac_in = jnp.where(sel_valid, opac_t, 0.0)[:, None, :]
    return blend_tiles_pallas(coeffs, color_t, opac_in, False)
timeit("gather+blend pallas", s6, xy_s, conic_s, color_s, opac_s, safe, sel_valid)

@jax.jit
def s7(xy_s, conic_s, color_s, opac_s, safe, sel_valid):
    def inner(color_t):
        xy_t = xy_s[safe]; conic_t = conic_s[safe]; opac_t = opac_s[safe]
        xy_local = xy_t - origin_f[:, None, :]
        coeffs = falloff_coeffs(xy_local, conic_t)
        opac_in = jnp.where(sel_valid, opac_t, 0.0)[:, None, :]
        out = blend_tiles_pallas(coeffs, color_t, opac_in, False)
        return jnp.sum(out)
    return jax.grad(inner)(color_s[safe])
timeit("blend pallas fwd+bwd(color)", s7, xy_s, conic_s, color_s, opac_s, safe, sel_valid)
