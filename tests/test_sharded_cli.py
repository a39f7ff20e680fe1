"""train.sharded CLI mode: fully-sharded training (shard_map step over a
("data","model") mesh) reachable from train.py, checkpoints saved with
UNPADDED per-Gaussian leaves so single-device eval restores them."""

import runpy
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _run_cli(script, cfg_path):
    argv = sys.argv
    try:
        sys.argv = [script, str(cfg_path)]
        runpy.run_path(str(REPO / script), run_name="__main__")
    finally:
        sys.argv = argv


@pytest.fixture(scope="module")
def sharded_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded_cli")
    cfg = yaml.safe_load((REPO / "configs" / "synthetic_smoke.yml").read_text())
    cfg["n_gaussians"] = 96
    cfg["train"].update(
        {
            "iterations": 4,
            "log_n_steps": 2,
            "checkpoint_n_steps": 4,
            "run_dir": str(root / "run"),
            "batch_size": 2,
            "sharded": {"data": 2, "model": 4},
            "chain_steps": 2,
        }
    )
    p = root / "cfg.yml"
    p.write_text(yaml.dump(cfg))
    return root, p


class TestShardedCli:
    def test_train_and_eval(self, sharded_cfg):
        root, cfg_path = sharded_cfg
        _run_cli("train.py", cfg_path)
        assert list((root / "run" / "checkpoints").glob("chkpnt*"))
        assert "total_loss" in (root / "run" / "metrics.jsonl").read_text()
        # the unpadded checkpoint must restore in single-device eval
        _run_cli("test.py", cfg_path)
        assert (root / "run" / "errors_cam_test.txt").exists()


class TestShardedCaptureCli:
    def test_actorshq_sharded_train(self, tmp_path):
        # exercises the smplx_poses passthrough + capture batcher through
        # the shard_map step
        sys.path.insert(0, str(Path(__file__).parent))
        from fixtures_capture import actorshq_config, make_actorshq_capture

        data_cfg = make_actorshq_capture(tmp_path / "capture")
        assets = tmp_path / "assets"
        assets.mkdir(parents=True, exist_ok=True)
        cfg = actorshq_config(tmp_path / "capture", assets, data_cfg)
        cfg["train"].update(
            {
                "run_dir": str(tmp_path / "run"),
                "iterations": 2,
                "log_n_steps": 2,
                "checkpoint_n_steps": 2,
                "batch_size": 2,
                "sharded": {"data": 2, "model": 4},
            }
        )
        p = tmp_path / "cfg.yml"
        p.write_text(yaml.dump(cfg))
        _run_cli("train.py", p)
        assert list((tmp_path / "run" / "checkpoints").glob("chkpnt*"))
