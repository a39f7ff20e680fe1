import numpy as np
import pytest

from d3ga_tpu.data.batcher import Batcher, crop_params_from_intrinsics, pad_frame_to
from d3ga_tpu.data.image_ops import (
    close_holes,
    erode_mask,
    linear2color_corr,
    linear2color_corr_inv,
    median_blur,
)
from d3ga_tpu.raster.api import paste
from d3ga_tpu.utils.ply import load_ply, save_ply


class TestImageOps:
    def test_color_corr_roundtrip(self):
        img = np.random.RandomState(0).rand(3, 8, 8).astype(np.float32) * 0.8 + 0.1
        corr = linear2color_corr(img, dim=0)
        back = linear2color_corr_inv(corr, dim=0)
        np.testing.assert_allclose(back, img, atol=2e-2)

    def test_median_blur_removes_salt(self):
        m = np.zeros((32, 32), np.float32)
        m[10:20, 10:20] = 1.0
        m[5, 5] = 1.0  # salt speck
        out = median_blur(m, 7)
        assert out[5, 5] == 0.0
        assert out[15, 15] == 1.0

    def test_morphology(self):
        m = np.zeros((32, 32), np.float32)
        m[8:24, 8:24] = 1.0
        assert erode_mask(m).sum() < m.sum()
        holey = m.copy()
        holey[15:17, 15:17] = 0.0
        assert close_holes(holey)[15, 15] == 1.0


class TestBatcher:
    def _config(self):
        return {
            "train": {"use_gamma_space": False, "background": "white"},
            "cages": {
                "body": {"label_id": [-1]},
                "upper": {"label_id": [2]},
                "lower": {"label_id": [3]},
            },
        }

    def test_crop_math(self):
        K = np.array([[500.0, 0, 200], [0, 500, 300], [0, 0, 1]])
        crop, w, h = crop_params_from_intrinsics(K, 640, 480)
        # cx=200 -> left=200, right=440 -> w = 880; cy=300 -> top=300,
        # bottom=180 -> h = 600
        assert (w, h) == (880, 600)
        np.testing.assert_array_equal(crop, [200, 440, 300, 180, 640, 480])

    def test_process_frame_and_silhouette(self):
        cfg = self._config()
        b = Batcher(cfg)
        H, W = 64, 48
        img = np.random.RandomState(0).randint(0, 255, (3, H, W)).astype(np.float32)
        seg = np.zeros((H, W), np.int32)
        seg[10:30, 10:30] = 2   # upper -> red
        seg[35:50, 10:30] = 3   # lower -> green
        seg[30:35, 10:30] = 9   # other -> body/blue
        K = np.array([[100.0, 0, W / 2], [0, 100, H / 2], [0, 0, 1]])
        Rt = np.eye(4)[:3]
        frame = b.process_frame(img, K, Rt, seg, np.zeros(104), camera_id="c0")
        sil = frame["silhouette"]
        np.testing.assert_allclose(sil[:, 15, 15], [1, 0, 0], atol=1e-6)  # red
        np.testing.assert_allclose(sil[:, 40, 15], [0, 1, 0], atol=1e-6)  # green
        np.testing.assert_allclose(sil[:, 32, 15], [0, 0, 1], atol=1e-6)  # blue
        np.testing.assert_allclose(sil[:, 5, 5], [1, 1, 1], atol=1e-6)    # bg white
        assert frame["alpha"].shape == (1, H, W)
        assert frame["width"] % 2 == 0

    def test_pad_frame_then_paste_roundtrip(self):
        cfg = self._config()
        b = Batcher(cfg)
        H, W = 40, 32
        img = np.random.RandomState(1).rand(3, H, W).astype(np.float32) * 255
        seg = np.ones((H, W), np.int32)
        K = np.array([[50.0, 0, 10], [0, 50, 25], [0, 0, 1]])  # off-center pp
        frame = b.process_frame(img, K, np.eye(4)[:3], seg, np.zeros(104))
        padded = pad_frame_to(frame, frame["width"], frame["height"])
        # paste must crop the padded canvas back to the original image
        rec = paste(padded["image"], frame["crop"])
        np.testing.assert_allclose(np.asarray(rec), frame["image"], atol=1e-6)

    def test_pad_beyond_canvas_keeps_principal_point_centered(self):
        from d3ga_tpu.data.batcher import place_on_canvas

        H, W = 40, 32
        cx, cy = 10, 25
        crop = np.array([cx, W - cx, cy, H - cy, W, H])
        # delta at the principal point must land at the canvas center
        img = np.zeros((1, H, W), np.float32)
        img[0, cy, cx] = 1.0
        for rw, rh in [(2 * max(cx, W - cx), 2 * max(cy, H - cy)), (60, 64)]:
            out = place_on_canvas(img, crop, rw, rh)
            yx = np.unravel_index(np.argmax(out[0]), out[0].shape)
            assert yx == (rh // 2, rw // 2), (rw, rh, yx)


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        v = rng.randn(20, 3).astype(np.float32)
        f = rng.randint(0, 20, (12, 3)).astype(np.int32)
        c = rng.randint(0, 255, (20, 3)).astype(np.uint8)
        p = str(tmp_path / "test.ply")
        save_ply(p, v, faces=f, colors=c)
        mesh = load_ply(p)
        np.testing.assert_allclose(mesh["vertices"], v, atol=1e-6)
        np.testing.assert_array_equal(mesh["faces"], f)
        np.testing.assert_array_equal(mesh["colors"], c)

    def test_reads_reference_asset(self):
        mesh = load_ply("/root/reference/assets/simplified.ply")
        assert mesh["vertices"].shape[1] == 3
        assert mesh["vertices"].shape[0] > 1000
        assert "faces" in mesh


class TestSegmentation:
    def test_face_id_raster_and_vote(self):
        from d3ga_tpu.data.segmentation import Segmenter
        from d3ga_tpu.raster.camera import make_camera, focal2fov

        # two quads at different depths, left half labeled 1, right 2
        verts = np.array(
            [
                [-1, -1, 4], [0, -1, 4], [0, 1, 4], [-1, 1, 4],  # left
                [0, -1, 4], [1, -1, 4], [1, 1, 4], [0, 1, 4],    # right
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
        cam = make_camera(
            np.eye(3), np.zeros(3), focal2fov(32.0, 64), focal2fov(32.0, 64), 64, 64
        )
        seg_part = np.zeros((64, 64), np.int32)
        seg_part[:, :32] = 1
        seg_part[:, 32:] = 2
        s = Segmenter(len(faces))
        s.add_frame(verts, faces, cam, seg_part)
        labels = s.run(faces)
        assert labels[0] == 1 and labels[1] == 1
        assert labels[2] == 2 and labels[3] == 2


class TestCCMColorCalibration:
    """Per-camera CCM path (`/root/reference/lib/batch.py:63-92`)."""

    def _ccm_json(self, tmp_path):
        import json

        ccm = np.array([[0.9, 0.05, 0.0], [0.1, 1.1, 0.0], [0.0, 0.0, 1.2]])
        path = tmp_path / "ccm.json"
        with open(path, "w") as f:
            json.dump({"camera400123": {"ccm": ccm.tolist()}}, f)
        return str(path), ccm

    def test_apply_ccm_matches_hand_computation(self):
        from d3ga_tpu.data.image_ops import XYZ_TO_RGB, apply_ccm, linear2srgb

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(3, 4, 5)).astype(np.float32)
        ccm = np.array([[1.1, 0.0, 0.1], [0.0, 0.9, 0.0], [0.05, 0.0, 1.0]], np.float32)
        out = apply_ccm(img, ccm)
        # hand-compute one pixel: ((v-2)/255) (as a row vector) @ ccm,
        # then XYZ->linear RGB, then sRGB encode
        v = (img[:, 2, 3] - 2.0) / 255.0
        xyz = v @ ccm
        rgb = XYZ_TO_RGB @ xyz
        np.testing.assert_allclose(out[:, 2, 3], linear2srgb(rgb), rtol=1e-5)

    def test_batcher_uses_ccm_and_skips_unknown_camera(self, tmp_path):
        from d3ga_tpu.data.batcher import Batcher
        from d3ga_tpu.data.image_ops import apply_ccm

        path, ccm = self._ccm_json(tmp_path)
        b = Batcher({"train": {"color_calibration": path, "background": "black"},
                     "cages": {"body": {"label_id": [-1]}}})
        img = np.full((3, 6, 8), 128.0, np.float32)
        out = b.calibrate_color(img, camera_id="400123")
        np.testing.assert_allclose(out, apply_ccm(img, ccm), rtol=1e-6)
        # unknown camera -> None (reference skips the frame)
        assert b.calibrate_color(img, camera_id="999999") is None
        K = np.array([[40.0, 0, 16.4], [0, 40.0, 12.6], [0, 0, 1]])
        Rt = np.concatenate([np.eye(3), [[0], [0], [3.0]]], axis=1)
        frame = b.process_frame(
            img, K, Rt, np.ones((6, 8), np.int32), np.zeros(9, np.float32),
            camera_id="999999",
        )
        assert frame is None
        # no calibration file -> plain /255
        b2 = Batcher({"train": {"background": "black"}, "cages": {}})
        np.testing.assert_allclose(
            b2.calibrate_color(img, camera_id="400123"), img / 255.0
        )
