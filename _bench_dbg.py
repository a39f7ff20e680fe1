import time, jax, jax.numpy as jnp, numpy as np
from bench import build_scene, H, W, MAX_PER_TILE
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.tiles import rasterize_tiled
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))

def sync(x): return float(np.asarray(x).ravel()[0])

@jax.jit
def fwd(means):
    img, aux = rasterize_tiled(means, camera, jnp.zeros(3), cov3d=cov6, opacities=opac, colors=colors, max_per_tile=MAX_PER_TILE)
    return jnp.mean(img), aux.overflow

t0=time.perf_counter(); s, ov = fwd(means); sync(s)
print(f"fwd compile+run {time.perf_counter()-t0:.1f}s overflow={int(np.asarray(ov))}")
t0=time.perf_counter()
for _ in range(5): s,ov = fwd(means)
sync(s); print(f"fwd {(time.perf_counter()-t0)/5*1000:.0f} ms")

@jax.jit
def fwdbwd(means):
    def loss(m):
        img, _ = rasterize_tiled(m, camera, jnp.zeros(3), cov3d=cov6, opacities=opac, colors=colors, max_per_tile=MAX_PER_TILE)
        return jnp.mean(jnp.abs(img - target))
    l, g = jax.value_and_grad(loss)(means)
    return l, g

t0=time.perf_counter(); l, g = fwdbwd(means); sync(l)
print(f"fwd+bwd compile+run {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
for _ in range(5): l, g = fwdbwd(means)
sync(l); print(f"fwd+bwd {(time.perf_counter()-t0)/5*1000:.0f} ms -> {H*W/((time.perf_counter()-t0)/5)/1e6:.1f} Mpix/s")
