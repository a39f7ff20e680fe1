"""Shared synthetic fixtures: a tetrahedralized cube cage with embedded
Gaussians and a simple camera — the miniature end-to-end scene."""

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.geometry.sampling import sample_initial_gaussians
from d3ga_tpu.model.cage_model import CageGeometry, build_cage_geometry
from d3ga_tpu.raster.camera import focal2fov, make_camera


def cube_cage(n_gaussians=64, seed=0, center=(0.0, 0.0, 5.0), size=1.0):
    """Unit cube split into 5 tets, Gaussians sampled on its surface."""
    c = np.asarray(center, np.float64)
    verts = np.array(
        [[(i & 1), (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.float64
    )
    verts = (verts - 0.5) * size + c
    tets = np.array(
        [(1, 0, 3, 5), (2, 0, 3, 6), (4, 0, 5, 6), (7, 3, 5, 6), (0, 3, 5, 6)],
        dtype=np.int32,
    )
    faces = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # z- face
            [4, 6, 5], [5, 6, 7],  # z+
            [0, 4, 1], [1, 4, 5],  # y-
            [2, 3, 6], [3, 7, 6],  # y+
            [0, 2, 4], [2, 6, 4],  # x-
            [1, 5, 3], [3, 5, 7],  # x+
        ],
        dtype=np.int32,
    )
    # Sample slightly inside so every Gaussian is strictly in a tet.
    inner = (verts - c) * 0.92 + c
    samples = sample_initial_gaussians(inner, faces, n_gaussians, seed=seed)
    geom = build_cage_geometry(
        cage_points=verts.astype(np.float32),
        tetras=tets,
        triangles=faces,
        sample_points=samples["points"],
        sample_rotations=samples["rotations"],
    )
    return geom


def test_camera(w=64, h=48, focal=60.0):
    return make_camera(
        np.eye(3), np.zeros(3), focal2fov(focal, w), focal2fov(focal, h), w, h
    )


def identity_pose_nodes(geom: CageGeometry):
    """pose_nodes closure: optional delta then a no-op 'LBS'."""

    def fn(batch, delta=None):
        nodes = geom.cage_points
        if delta is not None:
            nodes = nodes + delta
        return nodes

    return fn
