"""Tiny on-disk fake captures for exercising the Goliath / ActorsHQ
readers and the full capture->cage->train-step pipeline without real
data (layouts match `/root/reference/datasets/goliath_dataset.py` and
`actorshq_dataset.py`).

Everything is deliberately miniature: 2 cameras x 2-4 frames, ~60-vertex
convex-hull body, 32x24 final render size.
"""

import json
import os
import zipfile
from io import BytesIO
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# shared geometry helpers


def blob_mesh(n=60, radius=200.0, seed=0, center=(0.0, 0.0, 0.0)):
    """Watertight convex blob: points on a sphere + convex hull."""
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    p *= radius * (1.0 + 0.15 * rng.normal(size=(n, 1)))
    p = p * np.array([0.6, 1.0, 0.5]) + np.asarray(center)
    hull = ConvexHull(p)
    return p.astype(np.float32), hull.simplices.astype(np.int64)


def _png_bytes(arr_hwc_u8):
    from PIL import Image

    buf = BytesIO()
    Image.fromarray(arr_hwc_u8).save(buf, format="PNG")
    return buf.getvalue()


def _ply_bytes(verts, faces):
    import tempfile

    from d3ga_tpu.utils.ply import save_ply

    with tempfile.NamedTemporaryFile(suffix=".ply") as f:
        save_ply(f.name, verts, faces)
        f.seek(0)
        return f.read()


def _write_zip(path, members):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)


# ---------------------------------------------------------------------------
# Goliath fixture

GOLIATH_CAMERAS = ["402001", "402002"]
GOLIATH_FRAMES_TRAIN = [1, 2]
GOLIATH_FRAMES_TEST = [3]
STORED_W, STORED_H = 64, 48  # final render canvas = 32 x 24 (x0.5)
N_POSE = 104
N_SCALES = 2
N_KPT = 8


def goliath_skeleton_assets(verts):
    """Momentum-format lbs_model_json + lbs_config_dict for a 2-joint
    skeleton (root + child): params 0-5 drive root t/r, 7-12 child t/r,
    104-105 the two scale channels."""
    J = 2
    P = N_POSE + N_SCALES
    transform = np.zeros((7 * J, P), np.float32)
    for j in range(J):
        transform[7 * j : 7 * j + 6, 7 * j : 7 * j + 6] = np.eye(6)
        transform[7 * j + 6, N_POSE + j] = 1.0  # scale channel
    bones = [
        {"Parent": J + 1, "PreRotation": [0.0, 0, 0, 1.0],
         "TranslationOffset": [0.0, 0, 0]},
        {"Parent": 0, "PreRotation": [0.0, 0, 0, 1.0],
         "TranslationOffset": [0.0, 100.0, 0]},
    ]
    V = len(verts)
    # all vertices skinned to the root
    skinning_weights = [(0, 1.0) for _ in range(V)]
    offsets = list(range(V + 1))
    return {
        "lbs_model_json": {
            "Skeleton": {"Bones": bones},
            "SkinnedModel": {
                "SkinningWeights": skinning_weights,
                "SkinningOffsets": offsets,
            },
        },
        "lbs_config_dict": {
            "transform": transform,
            "transform_offsets": np.zeros(7 * J, np.float32),
        },
    }


def make_goliath_capture(root: Path, with_keypoints=True):
    """Write a complete miniature Goliath capture tree + shared assets.
    Returns (root_path, shared_assets_path)."""
    import torch

    from d3ga_tpu.utils.ply import save_ply

    root = Path(root)
    verts, faces = blob_mesh(center=(0.0, 0.0, 0.0))  # mm scale

    # --- calibration (stored K is for the ds=1 resolution = 4x stored) ---
    krt = []
    for i, cam in enumerate(GOLIATH_CAMERAS):
        # final (ds=4) intrinsics; camera 1 gets an OFF-CENTER principal
        # point so its render canvas (36x24) exceeds the image (32x24) —
        # stresses the pad_frame_to / pixel_valid path end-to-end
        K4 = np.array([[40.0, 0, 16.6 + 1.7 * i], [0, 40.0, 12.4], [0, 0, 1]])
        K = K4.copy()
        K[:2, :2] *= 4
        K[:2, 2] = (K4[:2, 2] + 0.5) * 4 - 0.5
        ang = 0.5 * i
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        t = np.array([0.0, 0.0, 3000.0])  # mm
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        krt.append({"cameraId": cam, "K": K.T.tolist(), "T": T.T.tolist()})
    root.mkdir(parents=True, exist_ok=True)
    with open(root / "camera_calibration.json", "w") as f:
        json.dump({"KRT": krt}, f)

    with open(root / "frame_splits_list.csv", "w") as f:
        f.write("frame,split\n")
        for fr in GOLIATH_FRAMES_TRAIN:
            f.write(f"{fr},train\n")
        for fr in GOLIATH_FRAMES_TEST:
            f.write(f"{fr},test\n")

    # --- per-camera image + segmentation zips (PNG bytes; PIL sniffs
    # content so the .avif member name is fine) ---
    rng = np.random.default_rng(3)
    frames = GOLIATH_FRAMES_TRAIN + GOLIATH_FRAMES_TEST
    for cam in GOLIATH_CAMERAS:
        imgs, parts, fgbg = {}, {}, {}
        for fr in frames:
            img = rng.integers(0, 255, size=(STORED_H, STORED_W, 3), dtype=np.uint8)
            seg = np.zeros((STORED_H, STORED_W), np.uint8)
            seg[10:38, 16:48] = 1  # "body" blob
            imgs[f"cam{cam}/{fr:06d}.avif"] = _png_bytes(img)
            parts[f"cam{cam}/{fr:06d}.png"] = _png_bytes(seg)
            fgbg[f"cam{cam}/{fr:06d}.png"] = _png_bytes((seg > 0).astype(np.uint8) * 255)
        _write_zip(str(root / "image" / f"cam{cam}.zip"), imgs)
        _write_zip(str(root / "segmentation_parts" / f"cam{cam}.zip"), parts)
        _write_zip(str(root / "segmentation_fgbg" / f"cam{cam}.zip"), fgbg)

    poses = {
        f"pose/{fr:06d}.txt": "\n".join(
            str(0.01 * np.sin(0.1 * fr + i)) for i in range(N_POSE)
        )
        for fr in frames
    }
    _write_zip(str(root / "kinematic_tracking" / "pose.zip"), poses)

    os.makedirs(root / "kinematic_tracking", exist_ok=True)
    save_ply(str(root / "kinematic_tracking" / "template_mesh.ply"), verts, faces)
    with open(root / "kinematic_tracking" / "skeleton_scales.txt", "w") as f:
        f.write("\n".join(["0.0"] * N_SCALES))

    if with_keypoints:
        kps = {}
        for fr in frames:
            pts = (verts[:N_KPT] * 0.9).tolist()
            kps[f"{fr:06d}.json"] = json.dumps(
                {"keypoints_3d": [p + [90.0] for p in pts]}
            )
        _write_zip(str(root / "keypoints_3d" / "keypoints_3d.zip"), kps)

    # --- auxiliary asset families (registration / uv / scan / lights /
    # head pose / per-view background / floor) ---
    _write_zip(
        str(root / "kinematic_tracking" / "registration_vertices.zip"),
        {
            f"registration_vertices/{fr:06d}.ply": _ply_bytes(verts * 1.01, faces)
            for fr in frames
        },
    )
    np.save(root / "kinematic_tracking" / "registration_vertices_mean.npy",
            verts.mean(0))
    with open(root / "kinematic_tracking" / "registration_vertices_variance.txt", "w") as f:
        f.write("123.5")
    save_ply(str(root / "kinematic_tracking" / "template_mesh_unscaled.ply"),
             verts * 0.001, faces)
    np.savetxt(root / "floor_transformation.txt",
               np.hstack([np.eye(3), [[0], [0], [-900.0]]]))
    uv = root / "uv_image"
    uv.mkdir(exist_ok=True)
    uv_img = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    _write_zip(str(uv / "ambient_occlusion.zip"),
               {f"ambient_occlusion/{fr:06d}.png": _png_bytes(uv_img) for fr in frames})
    with open(uv / "ambient_occlusion_mean.png", "wb") as f:
        f.write(_png_bytes(uv_img))
    with open(uv / "color_mean.png", "wb") as f:
        f.write(_png_bytes(np.stack([uv_img] * 3, -1)))
    with open(uv / "color_variance.txt", "w") as f:
        f.write("7.25")
    _write_zip(str(uv / "color.zip"),
               {f"color/{fr:06d}.png": _png_bytes(np.stack([uv_img] * 3, -1))
                for fr in frames})
    _write_zip(str(root / "scan_mesh" / "scan_mesh.zip"),
               {f"{fr:06d}.ply": _ply_bytes(verts, faces) for fr in frames})
    _write_zip(
        str(root / "head_pose" / "head_pose.zip"),
        {f"{fr:06d}.txt": "\n".join(" ".join(str(float(v)) for v in row)
                                    for row in np.eye(4)[:3])
         for fr in frames},
    )
    _write_zip(
        str(root / "per_view_background" / "per_view_background.zip"),
        {f"{cam}.png": _png_bytes(
            rng.integers(0, 255, size=(STORED_H, STORED_W, 3), dtype=np.uint8))
         for cam in GOLIATH_CAMERAS},
    )
    lights = root / "lights"
    lights.mkdir(exist_ok=True)
    # frame 3 partially lit (pattern index 2) -> per-frame assets absent
    with open(lights / "light_pattern_per_frame.json", "w") as f:
        json.dump([[fr, 0 if fr != 3 else 2] for fr in frames], f)
    with open(lights / "light_pattern_metadata.json", "w") as f:
        json.dump({"light_patterns": [{"light_index_durations": []},
                                      {"light_index_durations": [1] * 5},
                                      {"light_index_durations": [1] * 3}]}, f)

    assets = dict(
        goliath_skeleton_assets(verts),
        topology={"vi": faces.reshape(-1)},
        lbs_template_verts=verts,
        global_scaling=1.0,
        face_kpt_mask=np.ones(N_KPT, bool),
        face_kpt_mean=np.zeros((N_KPT, 3), np.float32),
        face_kpt_std=np.ones((N_KPT, 3), np.float32),
    )
    shared = root / "shared_assets.pt"
    torch.save(assets, shared)
    return str(root), str(shared)


def goliath_config(root, shared, assets_dir):
    return {
        "dataset_name": "goliath",
        "capture_id": "fake01",
        "assets": str(assets_dir),
        "camera_regex": "402",
        "data": {
            "root_path": str(root),
            "shared_assets_path": str(shared),
            "nose_vertex": 5,
        },
        "cages": {
            "body": {"label_id": [-1], "n_gaussians": 96, "n_target_tris": 150,
                     "color": "blue", "node_scale": 0.2},
        },
        "train": {
            "seed": 3,
            "use_color_calib": True,
            "background": "black",
        },
        "frame_embedder": {"n_dims": 8},
        "color_mlp": {"n_features": 16, "n_nodes": 32, "n_layers": 2},
        "deform_mlp": {"n_nodes": 32, "n_layers": 2},
        "canon_mlp": {"n_nodes": 32, "n_layers": 2},
    }


# ---------------------------------------------------------------------------
# ActorsHQ fixture

AHQ_CAMERAS = ["Cam01", "Cam02"]
AHQ_W, AHQ_H = 32, 24
AHQ_FRAMES = [0, 1, 2, 3]


def _opencv_matrix_yaml(name, mat):
    mat = np.asarray(mat, np.float64)
    data = ", ".join(f"{v:.10g}" for v in mat.reshape(-1))
    return (
        f"{name}: !!opencv-matrix\n"
        f"   rows: {mat.shape[0]}\n   cols: {mat.shape[1]}\n"
        f"   dt: d\n   data: [ {data} ]\n"
    )


def make_actorshq_capture(root: Path):
    """Miniature ActorsHQ tree. Returns a data-config dict fragment."""
    import cv2

    root = Path(root)
    seq = "Sequence1"
    smplx_dir = root / "smplx" / seq
    smplx_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    for fr in AHQ_FRAMES:
        poses = (0.05 * rng.normal(size=87)).tolist()
        data = {
            "id": fr,
            "poses": [poses],
            "Rh": [(0.05 * rng.normal(size=3)).tolist()],
            "Th": [(0.05 * rng.normal(size=3)).tolist()],
            "shapes": [np.zeros(10).tolist()],
            "expression": [np.zeros(10).tolist()],
        }
        with open(smplx_dir / f"{fr:06d}.json", "w") as f:
            json.dump(data, f)

    for cam in AHQ_CAMERAS:
        for kind in ("rgbs", "masks", "seg"):
            (root / kind / seq / cam).mkdir(parents=True, exist_ok=True)
        for fr in AHQ_FRAMES:
            img = rng.integers(0, 255, size=(AHQ_H, AHQ_W, 3), dtype=np.uint8)
            cv2.imwrite(str(root / "rgbs" / seq / cam / f"{fr:06d}.png"), img)
            mask = np.zeros((AHQ_H, AHQ_W, 3), np.uint8)
            mask[6:20, 8:26] = 255
            cv2.imwrite(str(root / "masks" / seq / cam / f"{fr:06d}.png"), mask)
            segrgb = np.zeros((AHQ_H, AHQ_W, 3), np.uint8)
            segrgb[6:12, 8:26, 0] = 255   # BGR channel 0 -> RGB blue = body(3)
            segrgb[12:20, 8:26, 1] = 255  # green -> lower(2)
            cv2.imwrite(str(root / "seg" / seq / cam / f"{fr:06d}.png"), segrgb)

    # OpenCV FileStorage YAML calib
    names = "".join(f'   - "{c}"\n' for c in AHQ_CAMERAS)
    extri = "%YAML:1.0\n---\nnames:\n" + names
    intri = "%YAML:1.0\n---\nnames:\n" + names
    for i, cam in enumerate(AHQ_CAMERAS):
        ang = 0.4 * i
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        T = np.array([[0.0], [0.0], [2.5]])
        # Cam02 off-center: canvas 36x24 > image 32x24 (pad path)
        K = np.array([[35.0, 0, 16.4 + 1.8 * i], [0, 35.0, 12.6], [0, 0, 1.0]])
        extri += _opencv_matrix_yaml(f"Rot_{cam}", R)
        extri += _opencv_matrix_yaml(f"T_{cam}", T)
        intri += _opencv_matrix_yaml(f"K_{cam}", K)
    (root / "calib").mkdir(exist_ok=True)
    with open(root / "calib" / "extri.yml", "w") as f:
        f.write(extri)
    with open(root / "calib" / "intri.yml", "w") as f:
        f.write(intri)

    # fake SMPL-X model npz (meters scale)
    verts, faces = blob_mesh(radius=0.4, seed=7)
    V = len(verts)
    J = 6
    jreg = np.zeros((J, V), np.float32)
    for j in range(J):
        jreg[j, j * 3 : j * 3 + 3] = 1.0 / 3.0
    weights = np.abs(rng.normal(size=(V, J)).astype(np.float32))
    weights /= weights.sum(1, keepdims=True)
    kintree = np.stack([np.array([2**32 - 1, 0, 1, 2, 3, 4]), np.arange(J)])
    np.savez(
        root / "smplx_model.npz",
        v_template=verts,
        shapedirs=rng.normal(size=(V, 3, 20)).astype(np.float32) * 0.01,
        posedirs=np.zeros((V * 3, 9 * (J - 1)), np.float32),
        J_regressor=jreg,
        kintree_table=kintree,
        weights=weights,
        f=faces,
    )

    return {
        "smplx_poses": str(root / "smplx" / "{sequence}"),
        "image": str(root / "rgbs" / "{sequence}" / "{camera}" / "{frame:06d}.png"),
        "image_alpha": str(root / "masks" / "{sequence}" / "{camera}" / "{frame:06d}.png"),
        "image_part_mask": str(root / "seg" / "{sequence}" / "{camera}" / "{frame:06d}.png"),
        "extrinsics": str(root / "calib" / "extri.yml"),
        "intrinsics": str(root / "calib" / "intri.yml"),
        "smplx_model": str(root / "smplx_model.npz"),
        "n_testing_frames": 1,
    }


def actorshq_config(root, assets_dir, data_cfg):
    return {
        "dataset_name": "actorshq",
        "capture_id": "actorfake",
        "assets": str(assets_dir),
        "data": data_cfg,
        "cages": {
            "body": {"label_id": [-1], "n_gaussians": 96, "n_target_tris": 150,
                     "color": "blue", "node_scale": 0.2},
        },
        "train": {
            "seed": 3,
            "test_camera": "Cam02",
            "use_color_calib": True,
            "use_opt_smplx": True,
            "background": "black",
        },
        "frame_embedder": {"n_dims": 8},
        "color_mlp": {"n_features": 16, "n_nodes": 32, "n_layers": 2},
        "deform_mlp": {"n_nodes": 32, "n_layers": 2},
        "canon_mlp": {"n_nodes": 32, "n_layers": 2},
    }
