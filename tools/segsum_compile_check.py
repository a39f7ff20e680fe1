"""Compile-check the pallas_segsum kernel on the REAL Mosaic backend
(interpret-mode CI can't catch Mosaic verification errors — the f32
tpu.iota rejection proved it). Small shapes; compiles fwd + the full
champion-path grad, runs once, prints OK.

Run: PYTHONPATH=/root/repo python tools/segsum_compile_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    from d3ga_tpu.raster.pallas_segsum import combine_sorted

    rng = np.random.default_rng(0)
    n, dup2, m = 5000, 9, 40000
    counts = rng.integers(0, dup2 + 1, size=n)
    ids = np.repeat(np.arange(n), counts)[: m - 100]
    ids = np.sort(np.concatenate([ids, np.full(m - ids.size, n)])).astype(np.int32)
    g = rng.normal(size=(12, m)).astype(np.float32)

    out = jax.jit(lambda i, v: combine_sorted(i, v, n, dup2))(
        jnp.asarray(ids), jnp.asarray(g)
    )
    out_h = np.asarray(out)
    ref = np.asarray(
        jax.ops.segment_sum(jnp.asarray(g).T, jnp.asarray(ids), num_segments=n + 1)[:n]
    )
    err = np.abs(out_h - ref).max()
    print(f"combine_sorted compiled+ran: max abs err vs segment_sum = {err:.3e}")
    assert err < 1e-3, "COMPILED KERNEL MISMATCH"

    # champion-path grad at small scale (compiles blend + segsum VJP)
    import d3ga_tpu.raster.tiles as tiles
    from d3ga_tpu.raster.camera import focal2fov, make_camera
    from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
    from d3ga_tpu.ops.quaternion import quat_normalize

    tiles.REC_GRAD = "segsum"
    W, H = 128, 96
    cam = make_camera(np.eye(3), np.zeros(3), focal2fov(120.0, W), focal2fov(120.0, H), W, H)
    nN = 500
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    means = jnp.concatenate(
        [jax.random.normal(ks[0], (nN, 2)) * 0.3,
         3.0 + jax.random.normal(ks[1], (nN, 1)) * 0.1], -1
    )
    scales = jnp.exp(jax.random.uniform(ks[2], (nN, 3), minval=-5.0, maxval=-3.5))
    rots = quat_normalize(jax.random.normal(ks[3], (nN, 4)))
    opac = jax.random.uniform(ks[4], (nN, 1), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(jax.random.fold_in(ks[0], 1), (nN, 3))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))

    def loss(m_, c_, o_, col_):
        img, _ = tiles.rasterize_tiled(
            m_, cam, jnp.zeros(3), cov3d=c_, opacities=o_, colors=col_,
            max_per_tile=64, coarse="dupsort_depth", dup=3, use_pallas=True,
        )
        return jnp.sum(img**2)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(means, cov6, opac, colors)
    tiles.REC_GRAD = "add"
    g2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(means, cov6, opac, colors)
    for a, b, name in zip(g1, g2, ("means", "cov6", "opac", "colors")):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        s = max(np.abs(np.asarray(b)).max(), 1e-12)
        print(f"grad {name}: max abs diff {d:.3e} (rel {d / s:.3e})")
        assert d / s < 2e-3, f"COMPILED GRAD MISMATCH {name}"
    print("OK")


if __name__ == "__main__":
    main()
