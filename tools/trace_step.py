import os
import jax, jax.numpy as jnp, numpy as np, glob, gzip, json, collections
from bench import build_scene, H, W, MAX_PER_TILE

KB = int(os.environ.get("BENCH_KB", "4096"))
SUB_BLOCK = int(os.environ.get("BENCH_SUB_BLOCK", "0"))
SUB_CAP = int(os.environ.get("BENCH_SUB_CAP", "1024"))
SF = int(os.environ.get("BENCH_SF", "2"))
COARSE = os.environ.get("BENCH_COARSE", "topk")
DUP = int(os.environ.get("BENCH_DUP", "2"))
from d3ga_tpu.raster.camera import make_camera, focal2fov
from d3ga_tpu.raster.tiles import rasterize_tiled
from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric

camera = make_camera(np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H)
means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))

@jax.jit
def step(means, cov6, opac, colors):
    def loss(m, c6, op, co):
        img, _ = rasterize_tiled(
            m, camera, jnp.zeros(3), cov3d=c6, opacities=op, colors=co,
            max_per_tile=MAX_PER_TILE, use_pallas=True, block_cap=KB,
            sub_block=SUB_BLOCK, sub_cap=SUB_CAP, super_factor=SF,
            coarse=COARSE, dup=DUP,
        )
        return jnp.mean(jnp.abs(img - target))
    l, g = jax.value_and_grad(loss, argnums=(0,1,2,3))(means, cov6, opac, colors)
    return (means - 1e-9*g[0], cov6 - 1e-9*g[1], opac - 1e-9*g[2], colors - 1e-9*g[3], l)

m, c6, op, co, l = step(means, cov6, opac, colors)
float(np.asarray(l))
import shutil
shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(3):
    m, c6, op, co, l = step(m, c6, op, co)
float(np.asarray(l))
jax.profiler.stop_trace()

# parse the trace
files = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
print("trace files:", files)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    durs = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid = ev.get("pid", 0)
            durs[name] += ev["dur"]
    for name, d in durs.most_common(25):
        print(f"{d/1000/3:9.2f} ms  {name[:110]}")
