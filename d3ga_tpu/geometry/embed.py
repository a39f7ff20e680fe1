"""Point-in-tet barycentric embedding (one-time host preprocessing).

TPU-native replacement for the CUDA tetra-sampler's `compute_bary`
(`/root/reference/lib/cage.py:325-327`) and its BVH dependency: each
sample point is assigned to the tetrahedron that contains it (or whose
barycentric coordinates are least violated), with a cKDTree over tet
centroids pruning the candidate set — runs once per cage on the host,
so plain numpy/scipy is the right tool (no GPU/TPU needed).

If the native C++ extension (d3ga_tpu.native) is built, its
BVH-accelerated implementation is used instead.
"""

import numpy as np


def point_tet_barycentric(points: np.ndarray, tet_verts: np.ndarray) -> np.ndarray:
    """Barycentric coordinates of each point w.r.t. its own tet.

    points: [N, 3]; tet_verts: [N, 4, 3] -> [N, 4] with ordering matching
    the tet vertex order (weights sum to 1; all >= 0 iff inside).
    Solves M beta = p - v0 with M columns (v1-v0, v2-v0, v3-v0).
    """
    v0 = tet_verts[:, 0]
    M = np.stack(
        [tet_verts[:, 1] - v0, tet_verts[:, 2] - v0, tet_verts[:, 3] - v0], axis=-1
    )  # [N, 3, 3] columns
    rhs = (points - v0)[..., None]
    # Solve batched; singular tets get pseudo-solutions via lstsq fallback.
    det = np.linalg.det(M)
    ok = np.abs(det) > 1e-12
    beta = np.zeros((points.shape[0], 3), dtype=points.dtype)
    if ok.any():
        beta[ok] = np.linalg.solve(M[ok], rhs[ok])[..., 0]
    if (~ok).any():
        beta[~ok] = np.linalg.lstsq(M[~ok], rhs[~ok], rcond=None)[0][..., 0]
    b0 = 1.0 - beta.sum(-1, keepdims=True)
    return np.concatenate([b0, beta], axis=-1)


def embed_points_in_tets(
    points: np.ndarray,
    tet_points: np.ndarray,
    tetras: np.ndarray,
    n_candidates: int = 48,
    eps: float = 1e-6,
):
    """Assign each point to a containing (or best) tetrahedron.

    points: [N, 3] sample points; tet_points: [V, 3] cage nodes;
    tetras: [T, 4] int. Returns (barys [N, 4], tetra_id [N], active [N]).

    `active` is True where the point is inside (min bary >= -eps) — the
    contract of the reference `compute_bary`.
    """
    try:
        from d3ga_tpu.native import embed_points_in_tets_native

        return embed_points_in_tets_native(points, tet_points, tetras, eps)
    except Exception:
        pass

    from scipy.spatial import cKDTree

    points = np.asarray(points, dtype=np.float64)
    tet_points = np.asarray(tet_points, dtype=np.float64)
    tetras = np.asarray(tetras, dtype=np.int64)

    corners = tet_points[tetras]  # [T, 4, 3]
    centroids = corners.mean(axis=1)
    k = min(n_candidates, tetras.shape[0])
    tree = cKDTree(centroids)
    _, cand = tree.query(points, k=k)  # [N, k]
    if k == 1:
        cand = cand[:, None]

    n = points.shape[0]
    best_tet = np.zeros(n, dtype=np.int64)
    best_bary = np.zeros((n, 4), dtype=np.float64)
    best_score = np.full(n, -np.inf)

    chunk = 65536 // max(1, k)
    for start in range(0, n, max(1, chunk)):
        sl = slice(start, min(start + max(1, chunk), n))
        p = points[sl]  # [m, 3]
        c = cand[sl]  # [m, k]
        m = p.shape[0]
        tv = corners[c.reshape(-1)]  # [m*k, 4, 3]
        pp = np.repeat(p, k, axis=0)
        bary = point_tet_barycentric(pp, tv).reshape(m, k, 4)
        score = bary.min(axis=-1)  # most-inside tet wins
        j = np.argmax(score, axis=-1)
        rows = np.arange(m)
        best_score[sl] = score[rows, j]
        best_tet[sl] = c[rows, j]
        best_bary[sl] = bary[rows, j]

    active = best_score >= -eps
    return (
        best_bary.astype(np.float32),
        best_tet.astype(np.int32),
        active,
    )
