"""Smoke tests for the observability layer (reference recorder/ +
utils/timers parity): metrics jsonl, progress grids, debug renders,
timers — these run inside the training loop, so they must never throw.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from test_raster import simple_camera


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        from d3ga_tpu.train.reporting import MetricsLogger

        ml = MetricsLogger(str(tmp_path))
        ml.log(10, {"loss": 1.5, "psnr": jnp.float32(21.0)})
        ml.log(20, {"loss": 0.7})
        ml.close()
        path = os.path.join(str(tmp_path), "metrics.jsonl")
        rows = [json.loads(x) for x in open(path)]
        assert rows[0]["step"] == 10 and abs(rows[0]["psnr"] - 21.0) < 1e-6
        assert rows[1]["loss"] == 0.7

    def test_progress_grid_and_means_dump(self, tmp_path):
        from d3ga_tpu.train.reporting import dump_means3d, write_progress_grid

        pred = np.random.default_rng(0).uniform(size=(3, 32, 32))
        gt = np.zeros((3, 32, 32))
        write_progress_grid(
            str(tmp_path), 100, 0, "cam0", pred, gt,
            pred_sil=pred, gt_sil=gt, extra={"ao": gt},
        )
        prog = os.listdir(os.path.join(str(tmp_path), "progress"))
        assert any(f.endswith(".png") for f in prog)
        dump_means3d(str(tmp_path), 100, 0, np.zeros((10, 3)), rgb=np.ones((10, 3)))
        dumped = os.listdir(os.path.join(str(tmp_path), "means3D"))
        assert any(f.endswith(".ply") for f in dumped)


class TestDebugRender:
    def test_render_points_and_mesh(self):
        from d3ga_tpu.utils.debug_render import geometry_maps, render_mesh, render_points

        cam = simple_camera(w=48, h=32)
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(-0.3, 0.3, size=(50, 3))
        ).at[:, 2].add(4.0)
        img = render_points(pts, cam)
        assert img.shape[-2:] == (32, 48) and bool(jnp.all(jnp.isfinite(img)))

        verts = jnp.array(
            [[-0.2, -0.2, 4.0], [0.2, -0.2, 4.0], [0.0, 0.3, 4.2], [0.0, -0.4, 4.4]]
        )
        faces = jnp.array([[0, 1, 2], [1, 3, 2]])
        img2 = render_mesh(verts, faces, cam)
        assert img2.shape[-2:] == (32, 48) and bool(jnp.all(jnp.isfinite(img2)))
        maps = geometry_maps(verts, faces, cam)
        assert all(bool(jnp.all(jnp.isfinite(m))) for m in jax.tree.leaves(maps))


class TestTimers:
    def test_timers_and_throughput(self, capsys):
        from d3ga_tpu.utils.timers import ThroughputMeter, cpu_timer, device_timer

        with cpu_timer("unit"):
            pass
        ref = {}
        with device_timer("unit", result_ref=ref):
            jnp.ones(8).sum()
        meter = ThroughputMeter(pixels_per_step=100)
        meter.tick()
        meter.tick()
        rep = meter.report()
        assert meter.steps == 2 and rep["steps_per_s"] > 0
        meter.reset()
        assert meter.steps == 0
