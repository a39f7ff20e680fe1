"""Capture-pipeline tests against tiny on-disk fake captures (no real
data needed): reader -> batcher -> cage build -> one train step, for
both Goliath and ActorsHQ (VERDICT r1 item 4).

Layouts under test match `/root/reference/datasets/goliath_dataset.py`
and `actorshq_dataset.py`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures_capture import (
    AHQ_CAMERAS,
    GOLIATH_CAMERAS,
    GOLIATH_FRAMES_TRAIN,
    N_KPT,
    N_POSE,
    actorshq_config,
    goliath_config,
    make_actorshq_capture,
    make_goliath_capture,
)


@pytest.fixture(scope="module")
def goliath_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("goliath")
    return make_goliath_capture(root / "capture"), root


@pytest.fixture(scope="module")
def ahq_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ahq")
    data_cfg = make_actorshq_capture(root / "capture")
    return data_cfg, root


class TestGoliathReader:
    def test_get_sample(self, goliath_tree):
        from d3ga_tpu.data.goliath import GoliathDataset

        (root, shared), _ = goliath_tree
        ds = GoliathDataset(root, shared, split="train", regex="402")
        assert sorted(ds.cameras) == GOLIATH_CAMERAS
        assert ds.get_frame_list() == GOLIATH_FRAMES_TRAIN
        s = ds.get(1, "402001")
        assert s is not None
        assert s["image"].shape == (3, 24, 32)
        assert s["seg_part"].shape == (1, 24, 32)
        assert s["lbs_motion"].shape == (N_POSE,)
        assert s["K"][0, 0] == pytest.approx(40.0)  # ds=4 intrinsics
        assert s["Rt"].shape == (3, 4)
        assert s["face_kpt"].shape == (N_KPT, 4)
        # test split sees the held-out frame only
        ds_test = GoliathDataset(root, shared, split="test", regex="402")
        assert ds_test.get_frame_list() == [3]

    def test_aux_asset_loaders(self, goliath_tree):
        """The full loader family (`goliath_dataset.py:259-413`)."""
        from d3ga_tpu.data.goliath import GoliathDataset

        (root, shared), _ = goliath_tree
        ds = GoliathDataset(root, shared, split="train", regex="402")
        reg = ds.load_registration_vertices(1)
        assert reg is not None and reg.shape[1] == 3
        assert ds.load_registration_vertices_mean().shape == (3,)
        assert ds.load_registration_vertices_variance() == 123.5
        ft = ds.load_floor_transforms()
        np.testing.assert_allclose(
            ft["floor_Rt"] @ ft["floor_Rt_inv"], np.eye(4), atol=1e-9
        )
        assert ds.load_ambient_occlusion(1).shape == (1, 16, 16)
        assert ds.load_ambient_occlusion_mean().shape == (1, 16, 16)
        assert ds.load_color_mean().shape == (3, 16, 16)
        assert ds.load_color_variance() == 7.25
        assert ds.load_color(2).shape == (3, 16, 16)
        sv, sf = ds.load_scan_mesh(1)
        assert sv.shape[1] == 3 and sf.shape[1] == 3
        np.testing.assert_allclose(ds.load_head_pose(1), np.eye(4)[:3])
        assert ds.load_background("402001").shape[0] == 3
        uv, uf = ds.load_template_mesh_unscaled()
        assert uv.shape[1] == 3
        # fully-lit gating: frame 3 is partially lit -> per-frame assets None
        assert not ds.asset_exists(3)
        assert ds.load_registration_vertices(3) is None
        assert ds.load_ambient_occlusion(3) is None
        assert ds.load_color(3) is None
        assert ds.load_scan_mesh(3) is None
        assert ds.asset_exists(1)

    def test_missing_asset_returns_none(self, goliath_tree):
        from d3ga_tpu.data.goliath import GoliathDataset

        (root, shared), _ = goliath_tree
        ds = GoliathDataset(root, shared, split="train", regex="402")
        assert ds.get(999, "402001") is None

    def test_batcher_processes_sample(self, goliath_tree):
        from d3ga_tpu.data.batcher import Batcher

        (root, shared), _ = goliath_tree
        from d3ga_tpu.data.goliath import GoliathDataset

        ds = GoliathDataset(root, shared, split="train", regex="402")
        s = ds.get(1, "402001")
        b = Batcher({"cages": {"body": {"label_id": [-1]}},
                     "train": {"background": "black"}})
        frame = b.process_frame(
            s["image"] * 255.0, s["K"], s["Rt"], s["seg_part"][0].astype(np.int32),
            s["lbs_motion"], seg_fg=s["seg_fg"][0],
        )
        cam = b.make_camera(frame)
        assert frame["image"].shape[0] == 3
        assert frame["alpha"].min() >= 0 and frame["alpha"].max() <= 1
        assert cam.width == frame["width"] and cam.height == frame["height"]


class TestGoliathEndToEnd:
    def test_build_and_train_step(self, goliath_tree):
        from d3ga_tpu.data.capture_builder import build_capture_training
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
        from d3ga_tpu.train.step import make_train_step
        from d3ga_tpu.model.avatar import init_avatar

        (root, shared), tmp = goliath_tree
        config = goliath_config(root, shared, tmp / "assets")
        config["train"]["use_face_emb"] = True
        config["data"]["use_geometry"] = True
        model, frames = build_capture_training(config)
        assert model.config["use_face_emb"] and model.config["n_valid_kpts"] == N_KPT
        frame = next(frames)
        assert frame["image"].shape[0] == 3
        assert "face_kpt_canonical" in frame
        assert frame["face_kpt_canonical"].shape == (N_KPT, 3)
        # registration geometry-map path (`lib/batch.py:246-260`)
        h, w = frame["image"].shape[1:]
        assert frame["position_map"].shape == (3, h, w)
        assert frame["normal_map"].shape == (3, h, w)
        assert frame["depth_map"].shape == (1, h, w)
        assert frame["mask_map"].shape == (1, h, w)
        mask = np.asarray(frame["mask_map"])
        assert 0 < mask.sum() < mask.size  # mesh covers some pixels
        nrm = np.asarray(frame["normal_map"]).reshape(3, -1)[:, mask.ravel() > 0]
        np.testing.assert_allclose(
            np.linalg.norm(nrm, axis=0), 1.0, atol=1e-4
        )

        params = init_avatar(jax.random.PRNGKey(0), model)
        assert "face_decoder" in params
        tx = make_optimizer(lr_tree_from_config(params, config["train"]))
        step = make_train_step(model, tx, max_per_tile=32, donate=False)
        opt_state = tx.init(params)
        p2, opt_state, metrics = step(
            params, opt_state, frame, jax.random.PRNGKey(1), jnp.int32(0)
        )
        assert np.isfinite(float(metrics["total_loss"]))


class TestActorsHQReader:
    def test_getitem(self, ahq_tree):
        from d3ga_tpu.data.actorshq import ActorsHQDataset

        data_cfg, _ = ahq_tree
        ds = ActorsHQDataset(
            smplx_poses=data_cfg["smplx_poses"],
            image=data_cfg["image"],
            image_alpha=data_cfg["image_alpha"],
            image_part_mask=data_cfg["image_part_mask"],
            extrinsics=data_cfg["extrinsics"],
            intrinsics=data_cfg["intrinsics"],
            test_camera=["Cam02"],
            n_testing_frames=1,
        )
        assert len(ds) == 3  # 4 frames - 1 test
        assert ds.n_cameras() == len(AHQ_CAMERAS)
        s = ds[0]
        assert s is not None
        assert s["image"].shape == (3, 24, 32)
        assert s["seg_part"].shape == (1, 24, 32)
        assert set(np.unique(s["seg_part"])) <= {0, 2, 3}
        assert s["lbs_motion"].shape == (87,)
        assert s["smplx"]["Rh"].shape == (3,)
        assert s["boundary_fg"].shape == (1, 24, 32)
        assert s["Rt"].shape == (3, 4)
        # eval split draws the held-out camera
        ds_eval = ActorsHQDataset(
            smplx_poses=data_cfg["smplx_poses"],
            image=data_cfg["image"],
            image_alpha=data_cfg["image_alpha"],
            image_part_mask=data_cfg["image_part_mask"],
            extrinsics=data_cfg["extrinsics"],
            intrinsics=data_cfg["intrinsics"],
            test_camera=["Cam02"],
            eval=True,
            n_testing_frames=1,
        )
        assert len(ds_eval) == 1
        assert ds_eval[0]["camera_id"] == "Cam02"


class TestActorsHQEndToEnd:
    def test_build_and_train_step(self, ahq_tree):
        from d3ga_tpu.data.capture_builder import build_capture_training
        from d3ga_tpu.model.avatar import init_avatar
        from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
        from d3ga_tpu.train.step import make_train_step

        data_cfg, tmp = ahq_tree
        config = actorshq_config(None, tmp / "assets", data_cfg)
        model, gens = build_capture_training(config)
        assert isinstance(gens, dict) and "train" in gens and "warmup" in gens
        si = gens["smplx_init"]
        assert si["poses"].shape == (3, 87)
        assert si["rh"].shape == (3, 3) and si["th"].shape == (3, 3)

        frame = next(gens["train"])
        assert frame["image"].shape[0] == 3
        assert frame["cam_rt"].shape == (4, 4)
        assert frame["smplx_poses"].shape == (87,)

        params = init_avatar(
            jax.random.PRNGKey(0), model,
            init_smplx_poses=si["poses"], init_smplx_rh=si["rh"],
            init_smplx_th=si["th"],
        )
        assert "optimizable_rotations" in params
        tx = make_optimizer(lr_tree_from_config(params, config["train"]))
        step = make_train_step(model, tx, max_per_tile=32, donate=False)
        opt_state = tx.init(params)
        p2, opt_state, metrics = step(
            params, opt_state, frame, jax.random.PRNGKey(1), jnp.int32(0)
        )
        assert np.isfinite(float(metrics["total_loss"]))
        # Rh for the sampled frame moved (in-graph camera gradient)
        fi = int(frame["frame_idx"])
        moved = np.abs(
            np.asarray(p2["optimizable_rotations"][fi])
            - np.asarray(params["optimizable_rotations"][fi])
        ).max()
        assert moved > 0
