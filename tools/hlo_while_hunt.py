"""Identify the 2.15 ms `while.1` op in the champion step's optimized
HLO (tools/trace_lanes.py round-5 account): AOT-compile the bench loss
grad on the TPU backend and print every while loop's body summary plus
the biggest fusions' root ops.

Run: PYTHONPATH=/root/repo python tools/hlo_while_hunt.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from bench import H, W, MAX_PER_TILE, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.tiles import rasterize_tiled


def main():
    camera = make_camera(
        np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
    )
    means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))

    def loss_fn(means, cov6, opac, colors):
        img, _ = rasterize_tiled(
            means, camera, jnp.zeros(3), cov3d=cov6, opacities=opac,
            colors=colors, max_per_tile=MAX_PER_TILE, use_pallas=True,
            coarse="dupsort_depth", dup=3,
        )
        return jnp.mean(jnp.abs(img - target))

    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
    txt = g.lower(means, cov6, opac, colors).compile().as_text()
    print(f"HLO text: {len(txt)} chars")

    # while loops: print their body computation names and a few ops
    for m in re.finditer(r"(\S+) = \S+ while\((.*?)\), condition=(\S+), body=(\S+)", txt):
        print("WHILE:", m.group(1), "body:", m.group(4))
    # fallback simpler pattern
    for line in txt.splitlines():
        if " while(" in line:
            print("WHILE-LINE:", line.strip()[:200])
    # body computations: find their op histograms
    bodies = set(re.findall(r"body=([%\w.\-]+)", txt))
    for b in bodies:
        bb = b.lstrip("%")
        mm = re.search(re.escape(bb) + r"[^{]*\{(.*?)\n\}", txt, re.S)
        if not mm:
            continue
        ops = re.findall(r"= \S+ ([a-z\-]+)\(", mm.group(1))
        import collections

        hist = collections.Counter(ops).most_common(8)
        print(f"BODY {bb}: {hist}")
    # name the big sorts for the record
    for line in txt.splitlines():
        if re.search(r"= [^ ]*sort\(", line) and "f32" in line:
            print("SORT:", line.strip()[:160])


if __name__ == "__main__":
    main()
