"""ActorsHQ capture reader (host-side).

Port of `/root/reference/datasets/actorshq_dataset.py:86-283`: per-frame
SMPL-X json (poses[:87] as conditioning), random camera per item,
RGB-coded cloth segmentation -> label ids 1-4, eroded/dilated boundary
mask, warmup dataset that re-uses one frame for 100 steps, train/test
split = all-but-last / last n_testing_frames.
"""

import json
import os
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

SEQUENCES = ["Sequence1"]


def load_smplx_params(src: str, frames) -> Dict[int, Dict[str, np.ndarray]]:
    """Per-frame SMPL-X json dicts (`actorshq_dataset.py:26-36`)."""
    params = {}
    frames = set(frames)
    for i, file in enumerate(sorted(glob(f"{src}/*.json"))):
        frame_id = int(Path(file).stem)
        if frame_id in frames:
            with open(file) as f:
                data = json.load(f)
            params[frame_id] = {
                k: np.array(v[0], dtype=np.float32)
                for k, v in data.items()
                if k != "id"
            }
    return params


def load_opencv_calib(extrinsics_path: str, intrinsics_path: str):
    """OpenCV FileStorage intri/extri parsing
    (`/root/reference/datasets/__init__.py:92-119`)."""
    extri = cv2.FileStorage(extrinsics_path, cv2.FILE_STORAGE_READ)
    intri = cv2.FileStorage(intrinsics_path, cv2.FILE_STORAGE_READ)
    names = [
        extri.getNode("names").at(i).string()
        for i in range(extri.getNode("names").size())
    ]
    cameras = {}
    for cam in names:
        R = extri.getNode(f"Rot_{cam}").mat()
        T = extri.getNode(f"T_{cam}").mat()
        K = intri.getNode(f"K_{cam}").mat()
        Rt = np.concatenate([R, T.reshape(3, 1)], axis=1).astype(np.float32)
        cameras[cam] = {"K": K.astype(np.float32), "Rt": Rt}
    return cameras


def get_boundary_mask(mask: np.ndarray, kernel_size: int = 3):
    """(`actorshq_dataset.py:201-217`)"""
    mask_bk = mask.copy()
    thres = 128
    mask = mask.copy()
    mask[mask < thres] = 0
    mask[mask > thres] = 1
    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    mask_erode = cv2.erode(mask.copy(), kernel)
    mask_dilate = cv2.dilate(mask.copy(), kernel)
    boundary = (mask_dilate - mask_erode) == 1
    boundary = np.logical_or(boundary, np.logical_and(mask_bk > 5, mask_bk < 250))
    return boundary, mask == 1


def rgb_coded_parts(seg_rgb: np.ndarray, seg_fg: np.ndarray):
    """RGB-coded cloth segmentation -> integer labels 1-4
    (red=1 upper, green=2 lower, blue=3 body, gray=4 face;
    `actorshq_dataset.py:260-276`)."""
    H, W = seg_rgb.shape[1:]
    mask = seg_fg > 0
    parts = seg_rgb * mask
    parts_mask = (parts.sum(axis=0) > 0)[None]
    parts = parts + (mask * 127) * (1 - parts_mask) * mask
    out = np.zeros((1, H, W), np.int32)
    out[(parts[0] == 255)[None]] = 1
    out[(parts[1] == 255)[None]] = 2
    out[(parts[2] == 255)[None]] = 3
    out[(parts[0] == 127)[None]] = 4
    return out


class ActorsHQDataset:
    def __init__(
        self,
        smplx_poses: str,
        image: str,
        image_alpha: str,
        image_part_mask: str,
        extrinsics: str,
        intrinsics: str,
        test_camera,
        use_all_frames=False,
        eval=False,
        warmup=False,
        n_testing_frames=300,
        seed=0,
        **kwargs,
    ):
        self.image_path = image
        self.image_alpha = image_alpha
        self.image_part_mask_path = image_part_mask
        self.smplx_poses_path = smplx_poses
        self.test_camera = test_camera
        self.eval = eval
        self.warmup = warmup
        self.use_all_frames = use_all_frames
        self.n_testing_frames = n_testing_frames
        self.rng = np.random.default_rng(seed)
        self.internal_counter = 0
        self.warmup_idx = 0
        self.smplx: Dict[str, Dict[int, Dict]] = {}
        self.cameras = {}
        self.cam2idx = {}

        for seq in SEQUENCES:
            fmts = dict(sequence=seq)
            src = self.smplx_poses_path.format(**fmts)
            files = sorted(glob(f"{src}/*.json"))
            fs = [[seq, str(int(Path(f).stem)).zfill(6)] for f in files]
            n_test = 1 if use_all_frames else n_testing_frames
            if eval:
                self.frame_list = fs[-n_test:]
                fr = list(range(len(fs)))[-n_test:]
            else:
                self.frame_list = fs[:-n_test]
                fr = list(range(len(fs)))[:-n_test]
            self.smplx[seq] = load_smplx_params(src, fr)
            self.cameras = load_opencv_calib(
                extrinsics.format(**fmts), intrinsics.format(**fmts)
            )
            for i, cam in enumerate(self.cameras.keys()):
                self.cam2idx[cam] = i

    def n_cameras(self):
        return len(self.cameras)

    def __len__(self):
        return len(self.frame_list)

    def __getitem__(self, idx) -> Optional[Dict]:
        if self.warmup and not self.eval:
            if (self.internal_counter + 1) % 100 == 0:
                self.warmup_idx = int(self.rng.integers(0, len(self)))
            idx = self.warmup_idx
        self.internal_counter += 1

        seq, frame = self.frame_list[idx]
        camera_id = (
            str(self.rng.choice(list(self.cameras.keys())))
            if not self.eval
            else self.test_camera[0]
        )
        fmts = dict(frame=int(frame), sequence=seq, camera=camera_id)

        smplx = self.smplx[seq][int(frame)]
        image = cv2.imread(self.image_path.format(**fmts))
        if image is None:
            return None
        image = np.transpose(image[..., ::-1].astype(np.float32), (2, 0, 1))
        C, H, W = image.shape

        seg_path = self.image_part_mask_path.format(**fmts)
        if not os.path.exists(seg_path):
            alt = self.image_part_mask_path.replace(
                "{frame:06d}.png", "{camera}_rgb{frame:06d}.png"
            )
            seg_path = alt.format(**fmts)
        seg_rgb = np.transpose(
            cv2.imread(seg_path)[..., ::-1].astype(np.float32), (2, 0, 1)
        )[:, :H, :W]

        mask = cv2.imread(self.image_alpha.format(**fmts))[:, :, 0]
        boundary_fg, fg = get_boundary_mask(mask)

        return {
            "camera_id": camera_id,
            "frame_id": idx,
            "order_frame_idx": int(frame),
            "order_cam_idx": self.cam2idx[camera_id],
            "seq_id": seq,
            "image": image,
            "seg_part": rgb_coded_parts(seg_rgb, fg[None].astype(np.float32)),
            "seg_fg": fg[None].astype(np.float32),
            "boundary_fg": boundary_fg[None].astype(np.float32),
            "smplx": smplx,
            "lbs_motion": smplx["poses"][:87],
            **self.cameras[camera_id],
        }
