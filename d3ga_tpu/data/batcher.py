"""Frame batcher: raw dataset samples -> render-ready frame dicts.

Host-side port of `/root/reference/lib/batch.py:49-271`, redesigned for
TPU consumption: all per-frame preprocessing (color calibration, alpha
filtering, color-coded silhouette targets, camera-into-body-frame
transform, principal-point-centered crop math) happens in numpy inside
data workers, and `stack_frames` pads every frame to one static render
size so the jitted train step sees uniform shapes (XLA requires static
shapes; the reference re-renders at a per-frame size instead).
"""

import math
import os
from typing import Dict, List, Optional

import numpy as np

from d3ga_tpu.data.image_ops import (
    apply_ccm,
    close_holes,
    erode_mask,
    linear2color_corr,
    median_blur,
)
from d3ga_tpu.raster.camera import make_camera

RED = np.array([1.0, 0.0, 0.0], np.float32)
GREEN = np.array([0.0, 1.0, 0.0], np.float32)
BLUE = np.array([0.0, 0.0, 1.0], np.float32)
GRAY = np.array([0.5, 0.5, 0.5], np.float32)


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def crop_params_from_intrinsics(K, W, H):
    """Principal-point-centered crop/pad geometry
    (`lib/batch.py:186-198`): the render canvas is the smallest
    symmetric-about-(cx,cy) rectangle covering the image."""
    cx = int(math.floor(K[0, 2]))
    cy = int(math.floor(K[1, 2]))
    left_w, right_w = cx, W - cx
    top_h, bottom_h = cy, H - cy
    w = int(2 * max(left_w, right_w))
    h = int(2 * max(top_h, bottom_h))
    crop = np.array([left_w, right_w, top_h, bottom_h, W, H])
    return crop, w, h


class Batcher:
    """config: dict with keys cages (dict of {label_id}), plus train
    flags use_gamma_space / erode_mask / close_holes / background."""

    def __init__(self, config: Dict, body_model=None):
        self.config = config
        self.body_model = body_model
        train = config.get("train", {})
        self.use_gamma_space = train.get("use_gamma_space", False)
        self.use_erode_mask = train.get("erode_mask", False)
        self.use_close_holes = train.get("close_holes", False)
        self.bg_color = str(train.get("background", "white")).lower()
        # Per-camera CCM color calibration (`lib/batch.py:63-92`): json
        # {"camera<ID>": {"ccm": 3x3}, ...}.
        self.col_calib = None
        calib_path = train.get("color_calibration")
        if calib_path and os.path.exists(calib_path):
            self.col_calib = self.load_calibration_params(calib_path)

    @staticmethod
    def load_calibration_params(params_json: str) -> Dict[str, np.ndarray]:
        import json

        with open(params_json, "r") as f:
            data = json.load(f)
        return {k: np.asarray(v["ccm"], np.float32) for k, v in data.items()}

    def calibrate_color(self, image_u8: np.ndarray, camera_id=None):
        """image_u8: [3, H, W] in [0, 255] -> [0,1] calibrated; per-camera
        CCM when a calibration file is loaded (`lib/batch.py:78-92`).
        Returns None if calibration exists but lacks this camera (the
        reference skips such frames)."""
        if self.col_calib is not None and camera_id is not None:
            key = f"camera{camera_id}"
            if key not in self.col_calib:
                return None
            return apply_ccm(image_u8, self.col_calib[key])
        img = image_u8.astype(np.float32) / 255.0
        if self.use_gamma_space:
            return linear2color_corr(img, dim=0)
        return img

    def get_silhouette(self, seg_part: np.ndarray) -> np.ndarray:
        """Color-coded per-garment silhouette target
        (`lib/batch.py:106-135`). seg_part: [H, W] int labels."""
        H, W = seg_part.shape
        sil = np.full((H, W, 3), float(self.bg_color == "white"), np.float32)
        cages = self.config.get("cages", {})

        def get_mask(labels):
            mask = np.zeros((H, W), bool)
            for label in labels:
                if label != -1:
                    mask |= seg_part == label
            return mask

        keys = set(cages.keys())
        face = get_mask(cages.get("face", {}).get("label_id", [-1]))
        if keys <= {"body", "face"}:
            body = (seg_part != 0) & ~face
        else:
            upper = get_mask(cages.get("upper", {}).get("label_id", [-1]))
            lower = get_mask(cages.get("lower", {}).get("label_id", [-1]))
            body = (seg_part != 0) & ~upper & ~lower & ~face
            sil[upper] = RED
            sil[lower] = GREEN
            sil[face] = GRAY
        sil[body] = BLUE
        return sil.transpose(2, 0, 1)

    def process_frame(
        self,
        image_u8: np.ndarray,       # [3, H, W] uint8/float 0..255
        K: np.ndarray,              # [3, 3]
        Rt: np.ndarray,             # [3or4, 4] world->camera (capture frame)
        seg_part: np.ndarray,       # [H, W] int part labels
        lbs: np.ndarray,            # pose params
        frame_id=0,
        camera_id="0",
        order_cam_idx=0,
        order_frame_idx=0,
        seg_fg: Optional[np.ndarray] = None,
        boundary_fg: Optional[np.ndarray] = None,
        smplx: Optional[Dict] = None,
        face_kpt: Optional[np.ndarray] = None,
        geom: Optional[np.ndarray] = None,        # [V, 3] registration verts (capture mm)
        geom_faces: Optional[np.ndarray] = None,  # [F, 3]
    ) -> Dict:
        C, H, W = image_u8.shape
        fg = (seg_part > 0)
        if seg_fg is not None:
            fg = fg | (seg_fg > 0)
        alpha = median_blur(fg.astype(np.float32), 7)
        if self.use_erode_mask:
            alpha = erode_mask(alpha)
        if self.use_close_holes:
            alpha = close_holes(alpha)
        if alpha.ndim == 2:
            alpha = alpha[None]

        calib = self.calibrate_color(image_u8, camera_id=camera_id)
        if calib is None:
            return None  # calibration exists but lacks this camera
        if self.bg_color == "white":
            bg_img = calib * fg + (1.0 - fg)
        else:
            bg_img = calib * fg

        crop, w, h = crop_params_from_intrinsics(K, W, H)
        fx, fy = float(K[0, 0]), float(K[1, 1])

        # Camera into body-centric frame (`lib/batch.py:166,200-203`).
        if self.body_model is not None:
            pose_in = smplx if smplx is not None else lbs
            c2w = np.asarray(
                self.body_model.transform_cameras(pose_in[None], Rt[None])
            )[0]
        else:
            c2w = np.linalg.inv(_to44(Rt))
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]

        frame = {
            "frame_id": int(frame_id),
            "camera_id": camera_id,
            "order_cam_idx": int(order_cam_idx),
            "order_frame_idx": int(order_frame_idx),
            "lbs": np.asarray(lbs, np.float32),
            "R": R,
            "T": T,
            "K": np.asarray(K, np.float32),
            "c2w": c2w,
            "FoVx": focal2fov(fx, w),
            "FoVy": focal2fov(fy, h),
            "width": w,
            "height": h,
            "crop": crop,
            "image": bg_img.astype(np.float32),
            "orig_image": calib.astype(np.float32),
            "alpha": alpha.astype(np.float32),
            "silhouette": self.get_silhouette(seg_part),
        }
        if boundary_fg is not None:
            frame["boundary_fg"] = boundary_fg.astype(np.float32)
        if smplx is not None:
            frame["smplx"] = smplx
            # Raw capture extrinsics for the in-graph differentiable
            # camera rebuild from optimizable Rh/Th (resolve_camera).
            frame["cam_rt"] = _to44(Rt).astype(np.float32)
        if face_kpt is not None:
            frame["face_kpt"] = face_kpt.astype(np.float32)
        if geom is not None and geom_faces is not None and self.body_model is not None:
            self._attach_geometry_maps(frame, geom, geom_faces)
        return frame

    def _attach_geometry_maps(self, frame, geom, geom_faces):
        """Registration-geometry position/normal/depth/mask maps
        (`/root/reference/lib/batch.py:246-260` via
        `recorder/mesh_renderer.py:69-100`): pose the tracked vertices
        with the body model's root transform, z-buffer rasterize on the
        frame's render canvas, crop back to the image like the renders
        (`paste`, bg black)."""
        import jax.numpy as jnp

        from d3ga_tpu.raster.api import paste
        from d3ga_tpu.utils.debug_render import geometry_maps

        motion = jnp.asarray(frame["lbs"], jnp.float32)[None]
        posed = self.body_model.get_registration(
            motion, jnp.asarray(geom, jnp.float32)[None]
        )
        camera = self.make_camera(frame)
        pos, nrm, depth, mask = geometry_maps(
            posed[0], jnp.asarray(geom_faces, jnp.int32), camera
        )
        frame["position_map"] = np.asarray(paste(pos, frame["crop"]), np.float32)
        frame["normal_map"] = np.asarray(paste(nrm, frame["crop"]), np.float32)
        frame["depth_map"] = np.asarray(paste(depth, frame["crop"]), np.float32)
        frame["mask_map"] = np.asarray(paste(mask, frame["crop"]), np.float32)
        frame["pose_vertices"] = np.asarray(posed[0], np.float32)
        unposed = self.body_model.to_body_model_space(motion, posed)
        frame["unpose_vertices"] = np.asarray(
            self.body_model.from_body_model_to_canonical(unposed)[0], np.float32
        )

    def make_camera(self, frame):
        return make_camera(
            frame["R"], frame["T"], frame["FoVx"], frame["FoVy"],
            frame["width"], frame["height"],
        )


def _to44(Rt):
    if Rt.shape[0] == 4:
        return np.asarray(Rt, np.float64)
    M = np.eye(4)
    M[:3] = Rt
    return M


def static_canvas(Ks, W: int, H: int):
    """ONE static render canvas for a whole capture: the max
    principal-point-centered canvas over the cameras' intrinsics at
    image size (W, H). Every frame pads to this via `pad_frame_to`, so
    TPU training sees a single static shape (one compile) instead of a
    per-camera canvas zoo."""
    rw = rh = 0
    for K in Ks:
        _, w, h = crop_params_from_intrinsics(np.asarray(K), W, H)
        rw, rh = max(rw, w), max(rh, h)
    return rw, rh


def place_on_canvas(img, crop, render_w: int, render_h: int, fill=0.0):
    """Place a [C, H, W] image-space array onto the (render_w, render_h)
    canvas so the PRINCIPAL POINT lands at the canvas center — the
    camera axis pierces the center, and `pad_frame_to` widens the FoV
    symmetrically about it. x0 = render_w//2 - left_w reduces to the
    reference's paste inversion (`/root/reference/renderer.py:36-47`:
    keep [:W] when left>right else [-W:]) when render == the frame's own
    2*max(left,right) canvas, and stays centered when padding further to
    a capture-wide static canvas."""
    left_w, right_w, top_h, bottom_h, W, H = [int(v) for v in crop]
    C = img.shape[0]
    out = np.full((C, render_h, render_w), fill, img.dtype)
    x0 = render_w // 2 - left_w
    y0 = render_h // 2 - top_h
    assert 0 <= x0 and x0 + W <= render_w and 0 <= y0 and y0 + H <= render_h
    out[:, y0 : y0 + H, x0 : x0 + W] = img
    return out


def pad_frame_to(frame: Dict, render_w: int, render_h: int) -> Dict:
    """Pad a frame's image-space targets so the *render* canvas has the
    uniform static size (render_w, render_h). The render is produced on
    the padded canvas and `paste`d (cropped) back; for batched TPU
    training we instead pad the GT onto the same canvas."""
    crop = frame["crop"]
    left_w, right_w, top_h, bottom_h, W, H = [int(v) for v in crop]
    w, h = frame["width"], frame["height"]
    assert render_w >= w and render_h >= h

    def place(img, fill=0.0):
        return place_on_canvas(img, crop, render_w, render_h, fill)

    out = dict(frame)
    for key in ("image", "orig_image", "alpha", "silhouette", "boundary_fg",
                "position_map", "normal_map", "depth_map", "mask_map"):
        if key in frame:
            out[key] = place(frame[key])
    # mask of real (non-padded) pixels for loss weighting
    mask = place(np.ones((1, H, W), np.float32))
    out["pixel_valid"] = mask
    out["width"], out["height"] = render_w, render_h
    out["FoVx"] = 2 * math.atan(
        render_w / (2 * (frame["width"] / (2 * math.tan(frame["FoVx"] / 2))))
    )
    out["FoVy"] = 2 * math.atan(
        render_h / (2 * (frame["height"] / (2 * math.tan(frame["FoVy"] / 2))))
    )
    return out
