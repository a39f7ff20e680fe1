"""Per-lane device-trace breakdown of the champion raster step: groups
trace events by (pid, tid) lane, identifies the TensorCore lane(s), and
prints each lane's op timeline summed by op name — no cross-lane
double counting (the weakness of trace_step.py's flat sum).

Run: PYTHONPATH=/root/repo python tools/trace_lanes.py
Env: BENCH_COARSE/BENCH_DUP/... as trace_step.py.
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import H, W, MAX_PER_TILE, build_scene
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
from d3ga_tpu.raster.camera import focal2fov, make_camera
from d3ga_tpu.raster.tiles import rasterize_tiled

COARSE = os.environ.get("BENCH_COARSE", "dupsort_depth")
DUP = int(os.environ.get("BENCH_DUP", "3"))
STEPS = 3

camera = make_camera(
    np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))


@jax.jit
def step(means, cov6, opac, colors):
    def loss(m, c6, op, co):
        img, _ = rasterize_tiled(
            m, camera, jnp.zeros(3), cov3d=c6, opacities=op, colors=co,
            max_per_tile=MAX_PER_TILE, use_pallas=True,
            coarse=COARSE, dup=DUP,
        )
        return jnp.mean(jnp.abs(img - target))

    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(means, cov6, opac, colors)
    return (
        means - 1e-9 * g[0], cov6 - 1e-9 * g[1],
        opac - 1e-9 * g[2], colors - 1e-9 * g[3], l,
    )


m, c6, op, co, l = step(means, cov6, opac, colors)
float(np.asarray(l))
shutil.rmtree("/tmp/jaxtrace2", ignore_errors=True)
jax.profiler.start_trace("/tmp/jaxtrace2")
for _ in range(STEPS):
    m, c6, op, co, l = step(m, c6, op, co)
float(np.asarray(l))
jax.profiler.stop_trace()

files = sorted(glob.glob("/tmp/jaxtrace2/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)

# name the process/thread lanes
pid_names = {}
tid_names = {}
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "M":
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "?")
        if ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "?")

lanes = collections.defaultdict(lambda: collections.Counter())
lane_total = collections.Counter()
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        key = (ev.get("pid", 0), ev.get("tid", 0))
        lanes[key][ev.get("name", "?")] += ev["dur"]
        lane_total[key] += ev["dur"]

for key, total in lane_total.most_common():
    pname = pid_names.get(key[0], "?")
    tname = tid_names.get(key, "?")
    if "python" in pname.lower() or "python" in str(tname).lower():
        continue
    print(f"\n=== lane pid={key[0]} ({pname}) tid={key[1]} ({tname}): "
          f"{total / 1000 / STEPS:.2f} ms/step ===")
    for name, d in lanes[key].most_common(18):
        print(f"  {d / 1000 / STEPS:8.3f} ms  {name[:100]}")
