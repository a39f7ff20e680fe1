"""Automated cage generation: garment surface mesh -> tetrahedral cage.

Replaces the reference's semi-manual pipeline (voxelize -> marching
cubes -> MeshLab cleanup -> Taubin smooth -> decimate -> MeshLab smooth
-> TetGen; `/root/reference/cager/ops.py:63-148`, `lib/cage.py:85-129`,
`lib/tetgen.py`) with a fully-automatic lattice approach:

  1. voxelize the (inflated) garment surface into a solid occupancy grid
     (native C++: conservative stamp + outside flood fill),
  2. morphological closing + optional dilation = the cage volume,
  3. split every occupied cell into 5 tetrahedra on the body-centered
     lattice (alternating parity so faces conform),
  4. Taubin-smooth the boundary nodes toward the original surface.

Quality guarantee by construction: lattice tets are never inverted or
self-intersecting (TetGen's failure mode that forced the reference's
manual MeshLab steps), and tet count is controlled directly by `pitch`
instead of a decimation target.
"""

from typing import Optional

import numpy as np

CUBE_TETS_EVEN = np.array(
    [(1, 0, 3, 5), (2, 0, 3, 6), (4, 0, 5, 6), (7, 3, 5, 6), (0, 3, 5, 6)],
    dtype=np.int64,
)
# Odd-parity cells use the x-mirrored split (corner index XOR 1, one
# vertex transposition to restore orientation) so the two-triangle
# diagonals on shared cube faces line up between neighboring cells.
CUBE_TETS_ODD = (CUBE_TETS_EVEN ^ 1)[:, [0, 1, 3, 2]]


def _cell_corners(res_shape):
    """vertex index helper for an (nx, ny, nz) cell grid with
    (nx+1)(ny+1)(nz+1) lattice vertices."""
    nx, ny, nz = res_shape

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    return vid


def occupancy_from_mesh(verts, faces, pitch, pad=2, close_iters=1, dilate=0):
    """Solid voxel occupancy of a surface mesh (native voxelizer)."""
    from d3ga_tpu.native import voxelize_mesh_native

    lo = verts.min(0) - pad * pitch
    hi = verts.max(0) + pad * pitch
    shape = np.maximum(np.ceil((hi - lo) / pitch).astype(int) + 1, 2)
    occ = voxelize_mesh_native(verts, faces, lo.astype(np.float32), pitch, shape)
    occ = occ.astype(bool)
    for _ in range(close_iters):
        occ = _binary_dilate(occ)
    for _ in range(close_iters):
        occ = _binary_erode(occ)
    for _ in range(dilate):
        occ = _binary_dilate(occ)
    return occ, lo


def _binary_dilate(occ):
    out = occ.copy()
    out[1:] |= occ[:-1]
    out[:-1] |= occ[1:]
    out[:, 1:] |= occ[:, :-1]
    out[:, :-1] |= occ[:, 1:]
    out[:, :, 1:] |= occ[:, :, :-1]
    out[:, :, :-1] |= occ[:, :, 1:]
    return out


def _binary_erode(occ):
    return ~_binary_dilate(~occ)


def lattice_tetrahedralize(occupancy: np.ndarray, origin, pitch: float):
    """Occupied cells -> conforming tet mesh.

    Returns (verts [V,3] f32, tets [T,4] i32, surface_faces [F,3] i32).
    """
    occ = np.asarray(occupancy, bool)
    nx, ny, nz = occ.shape
    cells = np.argwhere(occ)  # [C, 3]
    if len(cells) == 0:
        raise ValueError("empty occupancy grid")
    vid = _cell_corners((nx, ny, nz))

    # corner offsets in the cube-vertex numbering used by CUBE_TETS
    # (index bit 0 -> +x, bit 1 -> +y, bit 2 -> +z)
    corner_off = np.array(
        [[(i & 1), (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int64
    )
    ci, cj, ck = cells[:, 0], cells[:, 1], cells[:, 2]
    corners = (
        ((ci[:, None] + corner_off[None, :, 0]) * (ny + 1)
         + (cj[:, None] + corner_off[None, :, 1])) * (nz + 1)
        + (ck[:, None] + corner_off[None, :, 2])
    )  # [C, 8] global lattice vertex ids

    parity = (ci + cj + ck) % 2
    tets_even = corners[:, CUBE_TETS_EVEN]             # [C, 5, 4]
    tets_odd = corners[:, CUBE_TETS_ODD]
    tets = np.where(parity[:, None, None] == 0, tets_even, tets_odd).reshape(-1, 4)

    # compact vertex ids
    used, inv = np.unique(tets.reshape(-1), return_inverse=True)
    tets = inv.reshape(-1, 4).astype(np.int32)
    ui = used // ((ny + 1) * (nz + 1))
    uj = (used // (nz + 1)) % (ny + 1)
    uk = used % (nz + 1)
    verts = np.stack([ui, uj, uk], -1).astype(np.float32) * pitch + np.asarray(
        origin, np.float32
    )

    # canonicalize orientation: positive signed volume for every tet
    a, b, c, d = (verts[tets[:, k]] for k in range(4))
    signed = np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))
    flip = signed < 0
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]

    faces = surface_faces_of_tets(tets)
    return verts, tets, faces


def surface_faces_of_tets(tets: np.ndarray) -> np.ndarray:
    """Boundary triangles = faces referenced by exactly one tet."""
    f = np.concatenate(
        [
            tets[:, [0, 1, 2]],
            tets[:, [0, 1, 3]],
            tets[:, [0, 2, 3]],
            tets[:, [1, 2, 3]],
        ],
        axis=0,
    )
    key = np.sort(f, axis=1)
    _, idx, counts = np.unique(key, axis=0, return_index=True, return_counts=True)
    return f[idx[counts == 1]].astype(np.int32)


def taubin_smooth(verts, faces, iterations=10, lam=0.5, mu=-0.53, vertex_mask=None):
    """Taubin smoothing (the MeshLab step at `lib/cage.py:123-127`,
    automated). Only vertices in vertex_mask move (default: all)."""
    verts = verts.astype(np.float64).copy()
    n = len(verts)
    # adjacency (uniform weights)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    if vertex_mask is None:
        vertex_mask = np.ones(n, bool)

    deg = np.zeros(n)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    deg = np.maximum(deg, 1)[:, None]

    def lap(v):
        acc = np.zeros_like(v)
        np.add.at(acc, edges[:, 0], v[edges[:, 1]])
        np.add.at(acc, edges[:, 1], v[edges[:, 0]])
        return acc / deg - v

    for _ in range(iterations):
        verts[vertex_mask] += lam * lap(verts)[vertex_mask]
        verts[vertex_mask] += mu * lap(verts)[vertex_mask]
    return verts.astype(np.float32)


def generate_cage(
    surface_verts: np.ndarray,
    surface_faces: np.ndarray,
    pitch: Optional[float] = None,
    n_target_tets: Optional[int] = None,
    inflate: float = 0.0,
    smooth_iterations: int = 8,
):
    """Full pipeline: garment surface -> (cage_verts, tets, cage_faces).

    pitch: lattice cell size (meters); alternatively pass n_target_tets
    and the pitch is solved from the mesh volume estimate (5 tets/cell).
    """
    from d3ga_tpu.geometry.sampling import vertex_normals

    v = np.asarray(surface_verts, np.float32)
    f = np.asarray(surface_faces, np.int32)
    if inflate != 0.0:
        v = v + vertex_normals(v.astype(np.float64), f).astype(np.float32) * inflate

    if pitch is None:
        assert n_target_tets is not None
        # rough volume via divergence theorem
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        vol = abs(float(np.sum(np.einsum("ij,ij->i", a, np.cross(b, c)))) / 6.0)
        vol = max(vol, 1e-9)
        pitch = (5.0 * vol / n_target_tets) ** (1.0 / 3.0)

    occ, origin = occupancy_from_mesh(v, f, pitch, close_iters=1, dilate=1)
    cage_v, tets, cage_f = lattice_tetrahedralize(occ, origin, pitch)

    # smooth only boundary nodes (interior lattice stays regular)
    boundary = np.zeros(len(cage_v), bool)
    boundary[np.unique(cage_f)] = True
    cage_v = taubin_smooth(
        cage_v, cage_f, iterations=smooth_iterations, vertex_mask=boundary
    )
    return cage_v, tets, cage_f
