"""Loop subdivision with per-vertex attribute interpolation.

Array-based reimplementation of the reference's trimesh-backed
`subdivide_loop` (`/root/reference/utils/mesh_utils.py:105-325`,
used by `lib/smplman.py:50,88-95` to densify the SMPL-X template before
Gaussian sampling/skinning) in pure numpy — trimesh is not available in
this image. Rules (matching the reference exactly):

  odd (edge) vertices:
    interior: 3/8 (v0 + v1) + 1/8 (v2 + v3)   (v2/v3 = opposite verts)
    boundary: 1/2 (v0 + v1)
  even (original) vertices:
    interior: (1 - k beta) v + beta * sum(neighbors),
              beta = (40 - (2 cos(2 pi / k) + 3)^2) / (64 k)
    boundary: 3/4 v + 1/8 (b0 + b1)            (boundary neighbors)

Attributes (skin weights etc.) are interpolated with the same affine
combinations, so rows that sum to 1 keep summing to 1.

New faces are emitted as 4 consecutive children per input face
([v0,e0,e2], [e0,v1,e1], [e2,e1,v2], [e0,e1,e2]), so per-face labels
lift with `np.repeat(labels, 4)`.
"""

from typing import Optional, Tuple

import numpy as np


def loop_subdivide(
    vertices: np.ndarray,
    faces: np.ndarray,
    attrs: Optional[np.ndarray] = None,
    iterations: int = 1,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """vertices [V, 3] float, faces [F, 3] int, attrs [V, A] optional.
    Returns (vertices', faces', attrs') after `iterations` rounds."""
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    attrs = None if attrs is None else np.asarray(attrs, np.float64)
    for _ in range(iterations):
        vertices, faces, attrs = _subdivide_once(vertices, faces, attrs)
    return (
        vertices.astype(np.float32),
        faces,
        None if attrs is None else attrs.astype(np.float32),
    )


def _subdivide_once(vertices, faces, attrs):
    V = len(vertices)
    F = len(faces)
    # per-face edges in trimesh's faces_to_edges order:
    # (v0,v1), (v1,v2), (v2,v0); the opposite vertex of edge k is
    # faces[:, (k+2) % 3]
    edges = np.stack(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=1
    ).reshape(-1, 2)
    opp = faces[:, [2, 0, 1]].reshape(-1)
    edges_sorted = np.sort(edges, axis=1)

    uniq, inverse, counts = np.unique(
        edges_sorted, axis=0, return_inverse=True, return_counts=True
    )
    if counts.max() > 2:
        raise ValueError("some edges are shared by more than 2 faces")
    E = len(uniq)
    interior = counts == 2

    # sum of opposite vertices per unique edge (v2 + v3 for interior)
    opp_sum = np.zeros((E, 3))
    np.add.at(opp_sum, inverse, vertices[opp])

    v0 = vertices[uniq[:, 0]]
    v1 = vertices[uniq[:, 1]]
    odd = 0.5 * (v0 + v1)
    odd[interior] = (
        0.375 * (v0[interior] + v1[interior]) + 0.125 * opp_sum[interior]
    )

    # vertex neighbor sums / degrees over unique edges
    nbr_sum = np.zeros((V, 3))
    np.add.at(nbr_sum, uniq[:, 0], vertices[uniq[:, 1]])
    np.add.at(nbr_sum, uniq[:, 1], vertices[uniq[:, 0]])
    k = np.bincount(uniq.reshape(-1), minlength=V).astype(np.float64)
    k_safe = np.maximum(k, 3.0)
    beta = (40.0 - (2.0 * np.cos(2.0 * np.pi / k_safe) + 3.0) ** 2) / (
        64.0 * k_safe
    )
    even = beta[:, None] * nbr_sum + (1.0 - k * beta)[:, None] * vertices

    # boundary evens: 3/4 v + 1/8 (two boundary neighbors)
    bound_edges = uniq[~interior]
    if len(bound_edges):
        vb = np.zeros(V, bool)
        vb[bound_edges.reshape(-1)] = True
        bsum = np.zeros((V, 3))
        np.add.at(bsum, bound_edges[:, 0], vertices[bound_edges[:, 1]])
        np.add.at(bsum, bound_edges[:, 1], vertices[bound_edges[:, 0]])
        even[vb] = 0.75 * vertices[vb] + 0.125 * bsum[vb]

    new_vertices = np.vstack([even, odd])

    odd_idx = inverse.reshape(F, 3) + V  # per-face edge-vertex ids
    new_faces = np.column_stack(
        [
            faces[:, 0], odd_idx[:, 0], odd_idx[:, 2],
            odd_idx[:, 0], faces[:, 1], odd_idx[:, 1],
            odd_idx[:, 2], odd_idx[:, 1], faces[:, 2],
            odd_idx[:, 0], odd_idx[:, 1], odd_idx[:, 2],
        ]
    ).reshape(-1, 3)

    new_attrs = None
    if attrs is not None:
        A = attrs.shape[1]
        aopp_sum = np.zeros((E, A))
        np.add.at(aopp_sum, inverse, attrs[opp])
        a0 = attrs[uniq[:, 0]]
        a1 = attrs[uniq[:, 1]]
        aodd = 0.5 * (a0 + a1)
        aodd[interior] = (
            0.375 * (a0[interior] + a1[interior]) + 0.125 * aopp_sum[interior]
        )
        anbr = np.zeros((V, A))
        np.add.at(anbr, uniq[:, 0], attrs[uniq[:, 1]])
        np.add.at(anbr, uniq[:, 1], attrs[uniq[:, 0]])
        aeven = beta[:, None] * anbr + (1.0 - k * beta)[:, None] * attrs
        if len(bound_edges):
            absum = np.zeros((V, A))
            np.add.at(absum, bound_edges[:, 0], attrs[bound_edges[:, 1]])
            np.add.at(absum, bound_edges[:, 1], attrs[bound_edges[:, 0]])
            aeven[vb] = 0.75 * attrs[vb] + 0.125 * absum[vb]
        new_attrs = np.vstack([aeven, aodd])

    return new_vertices, new_faces, new_attrs
