"""Generate golden regression fixtures: oracle renders + input-grads on
fixed seeded scenes. Committed to tests/goldens/ — the tiled and pallas
paths must continue matching these across refactors."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_raster import random_scene, simple_camera
from d3ga_tpu.raster.oracle import rasterize_oracle

for name, n, seed in [("small", 24, 3), ("medium", 150, 7)]:
    cam = simple_camera(w=48, h=32)
    means, scales, rots, opac, colors = random_scene(jax.random.PRNGKey(seed), n=n)
    bg = jnp.array([0.25, 0.5, 0.75])

    def loss(m):
        img = rasterize_oracle(m, cam, bg, scales=scales, rotations=rots,
                               opacities=opac, colors=colors)
        return jnp.sum(img ** 2)

    img = rasterize_oracle(means, cam, bg, scales=scales, rotations=rots,
                           opacities=opac, colors=colors)
    g = jax.grad(loss)(means)
    np.savez_compressed(
        f"tests/goldens/oracle_{name}.npz",
        means=np.asarray(means), scales=np.asarray(scales),
        rots=np.asarray(rots), opac=np.asarray(opac),
        colors=np.asarray(colors), bg=np.asarray(bg),
        image=np.asarray(img), grad_means=np.asarray(g),
    )
    print(name, img.shape, float(jnp.abs(g).sum()))
