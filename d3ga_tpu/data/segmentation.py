"""Segmentation transfer: 2D part masks -> per-face labels on the body
mesh (one-time preprocessing).

Port of `/root/reference/lib/segmentation.py:79-201` without pytorch3d:
for <=512 random frames, rasterize the posed body mesh with face ids
into the camera (z-buffer scatter), read the 2D part label under each
covered pixel, majority-vote a label per face, then median-filter labels
over the face adjacency. Produces `face_to_label.npy`.
"""

from collections import defaultdict
from typing import Callable, Dict, List

import numpy as np

from d3ga_tpu.raster.camera import Camera


def rasterize_face_ids(verts: np.ndarray, faces: np.ndarray, camera: Camera, samples_per_face: int = 6):
    """Returns [H, W] int32 face id per pixel (-1 = background) via
    z-buffered sampling of face surface points."""
    H, W = camera.height, camera.width
    f = faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    rng = np.random.default_rng(0)
    w = rng.dirichlet(np.ones(3), samples_per_face).astype(np.float32)
    pts = (
        w[None, :, 0, None] * v0[:, None]
        + w[None, :, 1, None] * v1[:, None]
        + w[None, :, 2, None] * v2[:, None]
    ).reshape(-1, 3)
    fids = np.repeat(np.arange(len(f)), samples_per_face)

    hom = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], -1)
    clip = hom @ np.asarray(camera.full_proj).T
    zw = 1.0 / (clip[:, 3] + 1e-7)
    ndc = clip[:, :3] * zw[:, None]
    px = ((ndc[:, 0] + 1) * W - 1) * 0.5
    py = ((ndc[:, 1] + 1) * H - 1) * 0.5
    view = hom @ np.asarray(camera.world_view).T
    z = view[:, 2]

    valid = (z > 0.01) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    xi = np.clip(px.astype(np.int64), 0, W - 1)
    yi = np.clip(py.astype(np.int64), 0, H - 1)
    flat = yi * W + xi

    zbuf = np.full(H * W, np.inf, np.float32)
    np.minimum.at(zbuf, flat[valid], z[valid])
    win = valid & (z <= zbuf[flat] + 1e-6)
    out = np.full(H * W, -1, np.int32)
    out[flat[win]] = fids[win]
    return out.reshape(H, W)


def majority_vote(votes: Dict[int, List[int]], n_faces: int) -> np.ndarray:
    """Per-face argmax label (`lib/segmentation.py:112-146`)."""
    labels = np.zeros(n_faces, np.int32)
    for face, vals in votes.items():
        if vals:
            counts = np.bincount(np.asarray(vals))
            labels[face] = int(np.argmax(counts))
    return labels


def median_filter_labels(labels: np.ndarray, faces: np.ndarray, iterations: int = 2):
    """Mode filter over face adjacency (shared-edge neighbors), the
    reference's `median_filter_mesh` cleanup."""
    edge_map = defaultdict(list)
    for i, tri in enumerate(faces):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = (min(tri[a], tri[b]), max(tri[a], tri[b]))
            edge_map[key].append(i)
    neigh = defaultdict(list)
    for fs in edge_map.values():
        for i in fs:
            for j in fs:
                if i != j:
                    neigh[i].append(j)
    out = labels.copy()
    for _ in range(iterations):
        nxt = out.copy()
        for i in range(len(labels)):
            vals = [out[i]] + [out[j] for j in neigh[i]]
            counts = np.bincount(np.asarray(vals))
            nxt[i] = int(np.argmax(counts))
        out = nxt
    return out


class Segmenter:
    """One-time driver (`lib/segmentation.py:79-201`): accumulates label
    votes over frames and writes face_to_label.npy."""

    def __init__(self, n_faces: int):
        self.n_faces = n_faces
        self.votes: Dict[int, List[int]] = defaultdict(list)

    def add_frame(self, verts, faces, camera: Camera, seg_part: np.ndarray):
        """seg_part: [H, W] int labels for this camera's image."""
        fid_map = rasterize_face_ids(verts, faces, camera)
        covered = fid_map >= 0
        fids = fid_map[covered]
        labels = seg_part[covered]
        for f, l in zip(fids.tolist(), labels.tolist()):
            if l > 0:
                self.votes[f].append(int(l))

    def run(self, faces) -> np.ndarray:
        labels = majority_vote(self.votes, self.n_faces)
        return median_filter_labels(labels, np.asarray(faces))
