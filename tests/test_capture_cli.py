"""CLI-level capture smoke: train.py + test.py end-to-end on the tiny
on-disk fake Goliath capture (no real data). Complements
tests/test_capture.py (which drives the builders/readers directly) by
exercising the actual entry points: config load -> reader -> batcher ->
cage build -> train loop -> checkpoint -> eval restore -> cam_test +
cam_360 cinema tree (`/root/reference/train.py`, `test.py:300-343`)."""

import runpy
import sys
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from fixtures_capture import (
    actorshq_config,
    goliath_config,
    make_actorshq_capture,
    make_goliath_capture,
)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def capture_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("goliath_cli")
    cap_root, shared = make_goliath_capture(root / "capture")
    assets = root / "assets"
    assets.mkdir(parents=True, exist_ok=True)
    cfg = goliath_config(cap_root, shared, assets)
    cfg["train"].update(
        {
            "run_dir": str(root / "run"),
            "iterations": 4,
            "log_n_steps": 2,
            "checkpoint_n_steps": 4,
            "batch_size": 1,
        }
    )
    cfg_path = root / "cfg.yml"
    cfg_path.write_text(yaml.dump(cfg))
    return root, cfg_path


def _run_cli(script, cfg_path):
    argv = sys.argv
    try:
        sys.argv = [script, str(cfg_path)]
        runpy.run_path(str(REPO / script), run_name="__main__")
    finally:
        sys.argv = argv


class TestCaptureCli:
    def test_train_cli(self, capture_run):
        root, cfg_path = capture_run
        _run_cli("train.py", cfg_path)
        ckpts = list((root / "run" / "checkpoints").glob("chkpnt*"))
        assert ckpts, "train.py produced no checkpoint"
        metrics = (root / "run" / "metrics.jsonl").read_text().strip()
        assert "total_loss" in metrics

    def test_eval_cli(self, capture_run):
        root, cfg_path = capture_run
        if not list((root / "run" / "checkpoints").glob("chkpnt*")):
            _run_cli("train.py", cfg_path)
        _run_cli("test.py", cfg_path)
        assert (root / "run" / "errors_cam_test.txt").exists()
        orbit = list((root / "run").glob("cinema_*/cam_360/prediction/*.png"))
        assert orbit, "cam_360 produced no renders"


class TestActorsHQCli:
    def test_train_cli(self, tmp_path):
        root = tmp_path
        data_cfg = make_actorshq_capture(root / "capture")
        assets = root / "assets"
        assets.mkdir(parents=True, exist_ok=True)
        cfg = actorshq_config(root / "capture", assets, data_cfg)
        cfg["train"].update(
            {
                "run_dir": str(root / "run"),
                "iterations": 3,
                "log_n_steps": 3,
                "checkpoint_n_steps": 3,
                "batch_size": 1,
                "chain_steps": 2,  # exercise chaining through the CLI too
            }
        )
        cfg_path = root / "cfg.yml"
        cfg_path.write_text(yaml.dump(cfg))
        _run_cli("train.py", cfg_path)
        assert list((root / "run" / "checkpoints").glob("chkpnt*"))
        assert "total_loss" in (root / "run" / "metrics.jsonl").read_text()
