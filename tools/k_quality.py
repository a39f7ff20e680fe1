import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp, numpy as np
import sys; sys.path.insert(0, "/root/repo")
from bench import build_scene, H, W
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.tiles import rasterize_tiled

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))

imgs = {}
for K in (512, 256, 192, 128):
    f = jax.jit(lambda m, K=K: rasterize_tiled(
        m, camera, jnp.zeros(3), cov3d=cov6, opacities=opac, colors=colors,
        max_per_tile=K, coarse="dupsort_tile", dup=4, use_pallas=True)[0])
    imgs[K] = np.asarray(f(means))
    print(f"K={K} done", flush=True)

ref = imgs[512]
for K in (256, 192, 128):
    d = imgs[K] - ref
    mse = float(np.mean(d * d))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"K={K} vs K=512: psnr={psnr:.1f} dB  max_abs={np.abs(d).max():.4f}  frac>1/255={float((np.abs(d)>1/255).mean()):.5f}", flush=True)
