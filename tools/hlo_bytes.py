"""Dump the optimized HLO of the bench train step and rank instructions
by output-buffer bytes.

Motivation: on this rig wall-time tracks total materialized bytes, not
device-op time (PERF_NOTES.md); this tool attributes the bytes. Honors
the same BENCH_* env knobs as bench.py. Run: python tools/hlo_bytes.py
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from bench import H, MAX_PER_TILE, W, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.tiles import rasterize_tiled

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))

KW = dict(
    block_cap=int(os.environ.get("BENCH_KB", "4096")),
    sub_block=int(os.environ.get("BENCH_SUB_BLOCK", "4")),
    sub_cap=int(os.environ.get("BENCH_SUB_CAP", "1024")),
    super_factor=int(os.environ.get("BENCH_SF", "1")),
    coarse=os.environ.get("BENCH_COARSE", "dupsort"),
    dup=int(os.environ.get("BENCH_DUP", "2")),
    use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
)


def step(means, cov6, opac, colors):
    def loss(m, c6, op, co):
        img, _ = rasterize_tiled(
            m, camera, jnp.zeros(3), cov3d=c6, opacities=op, colors=co,
            max_per_tile=MAX_PER_TILE, **KW,
        )
        return jnp.mean(jnp.abs(img - target))

    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(means, cov6, opac, colors)
    return (
        means - 1e-9 * g[0], cov6 - 1e-9 * g[1], opac - 1e-9 * g[2],
        colors - 1e-9 * g[3], l,
    )


DT = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "pred": 1, "s8": 1,
      "u8": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8, "u64": 8}
SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|pred|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\]")
SKIP = ("parameter", "constant", "get-tuple-element", "bitcast", "tuple")


lowered = jax.jit(step).lower(means, cov6, opac, colors)
compiled = lowered.compile()
txt = compiled.as_text()
print(f"optimized HLO: {len(txt)} chars", flush=True)
with open("/tmp/bench_step_hlo.txt", "w") as f:
    f.write(txt)

# Only the ENTRY computation's instructions materialize HBM buffers;
# bodies of fusions stay in registers/VMEM.
entry = txt[txt.index("\nENTRY"):]
by_op = collections.Counter()
by_src = collections.Counter()
rows = []
total = 0
for line in entry.splitlines()[1:]:
    line = line.strip()
    if "= " not in line:
        continue
    lhs, rhs = line.split("= ", 1)
    head = rhs.split("(")[0]
    toks = head.split()
    if not toks:
        continue
    kind = toks[-1]
    if kind in SKIP:
        continue
    b = 0
    for m in SHAPE_RE.finditer(head):
        n = 1
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        b += n * DT[m.group(1)]
    if b <= 0:
        continue
    meta = re.search(r'op_name="([^"]+)"', line)
    src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
    op = meta.group(1)[:60] if meta else kind
    s = f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else kind
    total += b
    by_op[kind] += b
    by_src[s] += b
    rows.append((b, kind, op, s))

rows.sort(reverse=True)
print(f"TOTAL materialized bytes (entry computation): {total/1e6:.1f} MB")
print("-- top instructions --")
for b, kind, op, s in rows[:25]:
    print(f"{b/1e6:9.1f} MB  {kind:14s} {s:24s} {op}")
print("-- by op kind --")
for kind, b in by_op.most_common(15):
    print(f"{b/1e6:9.1f} MB  {kind}")
print("-- by source line --")
for s, b in by_src.most_common(15):
    print(f"{b/1e6:9.1f} MB  {s}")
