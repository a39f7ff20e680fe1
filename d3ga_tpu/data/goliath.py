"""Goliath capture reader (host-side).

Port of `/root/reference/datasets/goliath_dataset.py:66-535` without the
torch DataLoader machinery: zip-backed per-frame/per-camera asset loads
(AVIF images, part/fgbg segmentation PNGs, 104-dof kinematic pose.txt,
template mesh, skeleton scales, KRT json), frame split CSV, downsample
ds=4 then x0.5. Emits numpy dicts for the Batcher.
"""

import json
import os
import zipfile
from functools import lru_cache
from io import BytesIO
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

CACHE_LENGTH = 160

try:
    import pillow_avif  # noqa: F401  (registers the AVIF PIL plugin)
except ImportError:
    pass


def _imread(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(BytesIO(data))
    arr = np.asarray(img)
    if arr.ndim == 2:
        return arr[None]
    return arr.transpose(2, 0, 1)  # [C, H, W]


def load_ply_vertices(data: bytes):
    """Minimal binary/ascii PLY reader for vertices (+faces if present)."""
    from d3ga_tpu.utils.ply import load_ply

    mesh = load_ply(data)
    return mesh["vertices"], mesh.get("faces")


class GoliathDataset:
    """split: 'train' | 'test'; iterate (frame, camera) pairs."""

    def __init__(
        self,
        root_path,
        shared_assets_path=None,
        split="train",
        cameras_subset=None,
        frames_subset=None,
        regex=None,
        ds=4,
        use_geometry=False,
    ):
        self.use_geometry = use_geometry
        self.root_path = Path(root_path)
        self.shared_assets_path = shared_assets_path
        self.split = split
        self.ds = ds
        self.cameras_subset = set(cameras_subset or {})
        self.frames_subset = set(map(int, frames_subset or {}))
        self.cameras = list(self.get_camera_calibration().keys())
        if regex is not None and not cameras_subset:
            self.cameras = [c for c in self.cameras if regex in c]

    # -- calibration ---------------------------------------------------------

    @lru_cache(maxsize=1)
    def get_camera_calibration(self) -> Dict[str, Any]:
        with open(self.root_path / "camera_calibration.json", "r") as f:
            krt = json.load(f)["KRT"]
        params = {str(c["cameraId"]): c for c in krt}
        image_dir = self.root_path / "image"
        if image_dir.exists():
            zips = {p.name.split(".")[0][3:] for p in image_dir.iterdir() if p.is_file()}
            params = {cid: c for cid, c in params.items() if cid in zips}
        if self.cameras_subset:
            params = {cid: c for cid, c in params.items() if cid in self.cameras_subset}
        return params

    def get_camera_parameters(self, camera: str, ds: Optional[int] = None):
        """KRT with the reference's downsample-aware intrinsics
        (`goliath_dataset.py:150-169`)."""
        ds = ds if ds is not None else self.ds
        krt = self.get_camera_calibration()[camera]
        K = np.array(krt["K"], dtype=np.float32).T
        K[:2, :2] /= ds
        K[:2, 2] = (K[:2, 2] + 0.5) / ds - 0.5
        Rt = np.array(krt["T"], dtype=np.float32).T[:3, :4]
        return {"Rt": Rt, "K": K}

    # -- frame lists ---------------------------------------------------------

    @lru_cache(maxsize=2)
    def get_frame_list(self) -> List[int]:
        import csv

        frames = []
        with open(self.root_path / "frame_splits_list.csv") as f:
            for row in csv.DictReader(f):
                if row["split"] == self.split:
                    frames.append(int(row["frame"]))
        if self.frames_subset:
            frames = [f for f in frames if f in self.frames_subset]
        return frames

    # -- zip-backed assets ---------------------------------------------------

    def _zip_read(self, zip_rel: str, member: str) -> bytes:
        with zipfile.ZipFile(self.root_path / zip_rel, "r") as zf:
            with zf.open(member, "r") as fh:
                return fh.read()

    def load_image(self, frame: int, camera: str) -> np.ndarray:
        return _imread(
            self._zip_read(f"image/cam{camera}.zip", f"cam{camera}/{frame:06d}.avif")
        )

    def load_segmentation_parts(self, frame: int, camera: str) -> np.ndarray:
        return _imread(
            self._zip_read(
                f"segmentation_parts/cam{camera}.zip", f"cam{camera}/{frame:06d}.png"
            )
        )

    def load_segmentation_fgbg(self, frame: int, camera: str) -> np.ndarray:
        return _imread(
            self._zip_read(
                f"segmentation_fgbg/cam{camera}.zip", f"cam{camera}/{frame:06d}.png"
            )
        )

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_pose(self, frame: int) -> np.ndarray:
        data = self._zip_read("kinematic_tracking/pose.zip", f"pose/{frame:06d}.txt")
        return np.array([float(i) for i in data.decode().splitlines()], np.float32)

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_3d_keypoints(self, frame: int):
        data = self._zip_read("keypoints_3d/keypoints_3d.zip", f"{frame:06d}.json")
        return json.loads(data)

    def load_face_kpt(self, frame: int) -> Optional[np.ndarray]:
        """[Nk, 4] (x, y, z, confidence) face keypoints from the
        keypoints_3d zip (`goliath_dataset.py:219-227`; consumed as
        `batch["face_kpt"][:, 0:3]` + conf/100 in
        `models/garment_net.py:180-194`). Accepts either a flat list of
        4-vectors or a dict with a "keypoints_3d" key."""
        try:
            kp = self.load_3d_keypoints(frame)
        except (KeyError, FileNotFoundError, zipfile.BadZipFile):
            return None
        if isinstance(kp, dict):
            kp = kp.get("keypoints_3d", kp.get("keypoints"))
        if kp is None:
            return None
        arr = np.asarray(kp, np.float32)
        if arr.ndim != 2:
            return None
        if arr.shape[1] == 3:
            arr = np.concatenate([arr, np.full((len(arr), 1), 100.0, np.float32)], 1)
        return arr[:, :4]

    @lru_cache(maxsize=1)
    def load_template_mesh(self):
        with open(self.root_path / "kinematic_tracking" / "template_mesh.ply", "rb") as f:
            v, _ = load_ply_vertices(f.read())
        return v

    @lru_cache(maxsize=1)
    def load_template_mesh_unscaled(self):
        """(`goliath_dataset.py:320-325`)"""
        path = self.root_path / "kinematic_tracking" / "template_mesh_unscaled.ply"
        with open(path, "rb") as f:
            return load_ply_vertices(f.read())

    @lru_cache(maxsize=1)
    def load_skeleton_scales(self) -> np.ndarray:
        with open(self.root_path / "kinematic_tracking" / "skeleton_scales.txt") as f:
            return np.array([float(i) for i in f.read().splitlines()], np.float32)

    # -- fully-lit frame gating (`goliath_dataset.py:182-227`) ---------------

    @lru_cache(maxsize=1)
    def load_light_pattern(self):
        with open(self.root_path / "lights" / "light_pattern_per_frame.json") as f:
            return json.load(f)

    @lru_cache(maxsize=1)
    def load_light_pattern_meta(self):
        with open(self.root_path / "lights" / "light_pattern_metadata.json") as f:
            return json.load(f)

    @lru_cache(maxsize=1)
    def _fully_lit_frames(self):
        """Frames with light-pattern index 0 (= fully lit,
        `goliath_dataset.py:201-205`); None when the capture has no
        lights metadata (Body captures are all fully lit)."""
        path = self.root_path / "lights" / "light_pattern_per_frame.json"
        if not path.exists():
            return None
        return {
            int(frame) for frame, index in self.load_light_pattern() if index == 0
        }

    def asset_exists(self, frame: int) -> bool:
        """Per-frame assets (pose, keypoints, registration, uv images)
        only exist for fully lit frames (`goliath_dataset.py:219-222`)."""
        lit = self._fully_lit_frames()
        return lit is None or int(frame) in lit

    # -- registration / uv / scan / head-pose / background assets -----------

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_registration_vertices(self, frame: int):
        """(`goliath_dataset.py:259-271`)"""
        if not self.asset_exists(frame):
            return None
        data = self._zip_read(
            "kinematic_tracking/registration_vertices.zip",
            f"registration_vertices/{frame:06d}.ply",
        )
        return load_ply_vertices(data)[0]

    @lru_cache(maxsize=1)
    def load_registration_vertices_mean(self) -> np.ndarray:
        return np.load(
            self.root_path / "kinematic_tracking" / "registration_vertices_mean.npy"
        )

    @lru_cache(maxsize=1)
    def load_registration_vertices_variance(self) -> float:
        path = self.root_path / "kinematic_tracking" / "registration_vertices_variance.txt"
        with open(path) as f:
            return float(f.read())

    @lru_cache(maxsize=1)
    def load_floor_transforms(self):
        """camera->groundplane transform pair (`goliath_dataset.py:308-318`)."""
        cam2gp = np.loadtxt(self.root_path / "floor_transformation.txt", dtype=np.float64)
        assert cam2gp.shape == (3, 4)
        cam2gp = np.vstack([cam2gp, np.array([0, 0, 0, 1])])
        return {"floor_Rt": np.linalg.inv(cam2gp), "floor_Rt_inv": cam2gp}

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_ambient_occlusion(self, frame: int):
        if not self.asset_exists(frame):
            return None
        return _imread(
            self._zip_read(
                "uv_image/ambient_occlusion.zip", f"ambient_occlusion/{frame:06d}.png"
            )
        )

    @lru_cache(maxsize=1)
    def load_ambient_occlusion_mean(self):
        return _imread(
            (self.root_path / "uv_image" / "ambient_occlusion_mean.png").read_bytes()
        )

    @lru_cache(maxsize=1)
    def load_color_mean(self):
        try:
            return _imread((self.root_path / "uv_image" / "color_mean.png").read_bytes())
        except Exception:
            return None

    @lru_cache(maxsize=1)
    def load_color_variance(self) -> float:
        with open(self.root_path / "uv_image" / "color_variance.txt") as f:
            return float(f.read())

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_color(self, frame: int):
        if not self.asset_exists(frame):
            return None
        return _imread(self._zip_read("uv_image/color.zip", f"color/{frame:06d}.png"))

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_scan_mesh(self, frame: int):
        """(vertices, faces) of the per-frame scan (`goliath_dataset.py:377-387`)."""
        if not self.asset_exists(frame):
            return None
        return load_ply_vertices(
            self._zip_read("scan_mesh/scan_mesh.zip", f"{frame:06d}.ply")
        )

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_head_pose(self, frame: int) -> np.ndarray:
        data = self._zip_read("head_pose/head_pose.zip", f"{frame:06d}.txt")
        rows = [line.split(" ") for line in data.decode("utf-8").splitlines()]
        return np.array([[float(i) for i in r] for r in rows], np.float32)

    @lru_cache(maxsize=CACHE_LENGTH)
    def load_background(self, camera: str):
        """Per-camera clean plate (`goliath_dataset.py:400-405`)."""
        return _imread(
            self._zip_read("per_view_background/per_view_background.zip", f"{camera}.png")
        )

    @lru_cache(maxsize=1)
    def load_shared_assets(self) -> Dict[str, Any]:
        import torch

        return torch.load(
            self.shared_assets_path, map_location="cpu", weights_only=False
        )

    # -- sample assembly -----------------------------------------------------

    @staticmethod
    def _downsample_half(x: np.ndarray) -> np.ndarray:
        """x0.5 bilinear (`goliath_dataset.py:463-464`) via cv2."""
        import cv2

        c, h, w = x.shape
        out = cv2.resize(
            x.transpose(1, 2, 0).astype(np.float32),
            (w // 2, h // 2),
            interpolation=cv2.INTER_LINEAR,
        )
        if out.ndim == 2:
            out = out[..., None]
        return out.transpose(2, 0, 1)

    def get(self, frame: int, camera: str) -> Optional[Dict[str, Any]]:
        try:
            image = self.load_image(frame, camera)
            seg_part = self.load_segmentation_parts(frame, camera)
            pose = self.load_pose(frame)
        except (KeyError, FileNotFoundError, zipfile.BadZipFile):
            return None
        seg_fg = (seg_part != 0).astype(np.float32)
        cam = self.get_camera_parameters(camera)
        sample = {
            "camera_id": camera,
            "frame_id": frame,
            "image": self._downsample_half(image.astype(np.float32)),
            "seg_part": self._downsample_half(seg_part.astype(np.float32)),
            "seg_fg": self._downsample_half(seg_fg),
            "boundary_fg": 1.0 - self._downsample_half(seg_fg),
            "lbs_motion": pose,
            **cam,
        }
        face_kpt = self.load_face_kpt(frame)
        if face_kpt is not None:
            sample["face_kpt"] = face_kpt
        if self.use_geometry:
            # registration (tracked) vertices enable the Batcher's
            # geometry-map path (`lib/batch.py:146,246-260`)
            geom = self.load_registration_vertices(frame)
            if geom is not None:
                sample["geom"] = geom
        return sample

    def __len__(self):
        return len(self.get_frame_list()) * len(self.cameras)

    def __getitem__(self, idx):
        frames = self.get_frame_list()
        frame = frames[idx // len(self.cameras)]
        camera = self.cameras[idx % len(self.cameras)]
        return self.get(frame, camera)
