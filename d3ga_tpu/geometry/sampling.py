"""Seeded host-side surface sampling for Gaussian initialization.

Replaces trimesh.sample.sample_surface + the TBN-frame init-rotation
construction of `/root/reference/lib/cage.py:262-296`. Pure numpy with an
explicit np.random.Generator so initialization is reproducible across
backends (SURVEY.md "host preprocessing parity").
"""

import numpy as np


def sample_surface(vertices: np.ndarray, faces: np.ndarray, n: int, rng: np.random.Generator):
    """Area-weighted uniform surface sampling.

    Returns (samples [n, 3], face_ids [n])."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    prob = area / max(area.sum(), 1e-12)
    face_ids = rng.choice(len(faces), size=n, p=prob)
    # uniform barycentric via sqrt trick
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a = 1.0 - r1
    b = r1 * (1.0 - r2)
    c = r1 * r2
    pts = (
        a[:, None] * v0[face_ids]
        + b[:, None] * v1[face_ids]
        + c[:, None] * v2[face_ids]
    )
    return pts, face_ids


def triangle_barycentric(p: np.ndarray, a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Barycentric coords of points p in triangles (a, b, c); all [N, 3].
    Matches `/root/reference/lib/cage.py:241-260`."""
    v0 = b - a
    v1 = c - a
    v2 = p - a
    d00 = np.einsum("ni,ni->n", v0, v0)
    d01 = np.einsum("ni,ni->n", v0, v1)
    d11 = np.einsum("ni,ni->n", v1, v1)
    d20 = np.einsum("ni,ni->n", v2, v0)
    d21 = np.einsum("ni,ni->n", v2, v1)
    denom = d00 * d11 - d01 * d01 + 1e-10
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return np.stack([u, v, w], axis=-1)


def _normalize(x, eps=1e-12):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)


def tbn_frames(vertices: np.ndarray, faces: np.ndarray, face_ids: np.ndarray):
    """Per-sample tangent-bitangent-normal rotation matrices [n, 3, 3]
    with columns (T, B, N) — the initial Gaussian orientations.

    Note: the reference's construction (`/root/reference/lib/cage.py:281-288`,
    B = e0 x T with T = e0 x N) yields B parallel to N — a degenerate
    frame whose quaternion conversion is arbitrary. Since these only seed
    a *learned* rotation parameter, this build uses the proper
    orthonormal right-handed frame (T = e0_hat, B = N x T) instead.
    """
    tri = faces[face_ids]
    v0 = vertices[tri[:, 0]]
    v1 = vertices[tri[:, 1]]
    v2 = vertices[tri[:, 2]]
    e0 = v1 - v0
    n = _normalize(np.cross(e0, v2 - v0))
    t = _normalize(e0)
    b = np.cross(n, t)
    return np.stack([t, b, n], axis=2)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (for cage inflation offsets,
    `/root/reference/lib/cage.py:271-272`)."""
    fn = np.cross(
        vertices[faces[:, 1]] - vertices[faces[:, 0]],
        vertices[faces[:, 2]] - vertices[faces[:, 0]],
    )
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    return _normalize(vn)


def sample_initial_gaussians(
    vertices: np.ndarray,
    faces: np.ndarray,
    n: int,
    seed: int = 0,
    inflate: float = 0.0,
):
    """Full init-sampling bundle for a cage/garment.

    Returns dict with points [n,3], rot matrices [n,3,3], face_ids [n],
    tri_barys [n,3]."""
    rng = np.random.default_rng(seed)
    verts = vertices
    if inflate != 0.0:
        verts = vertices + vertex_normals(vertices, faces) * inflate
    pts, face_ids = sample_surface(verts, faces, n, rng)
    rots = tbn_frames(verts, faces, face_ids)
    tri = faces[face_ids]
    barys = triangle_barycentric(pts, verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]])
    return {
        "points": pts.astype(np.float32),
        "rotations": rots.astype(np.float32),
        "face_ids": face_ids.astype(np.int32),
        "tri_barys": barys.astype(np.float32),
    }
