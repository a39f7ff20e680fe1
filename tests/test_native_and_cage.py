import numpy as np
import pytest

from d3ga_tpu.data.synthetic import subdivided_cube

native = pytest.importorskip("d3ga_tpu.native")
if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


class TestNative:
    def test_knn_matches_bruteforce(self):
        pts = np.random.RandomState(0).randn(400, 3).astype(np.float32)
        d = native.knn_mean_sq_dist_native(pts, 3)
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, -1)[:, :3].mean(-1)
        np.testing.assert_allclose(d, ref, rtol=1e-4)

    def test_embed_roundtrip(self):
        tp = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1.0]], np.float32
        )
        tt = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int32)
        w = np.random.RandomState(1).dirichlet(np.ones(4), 200).astype(np.float32)
        p = (w @ tp[tt[0]]).astype(np.float32)
        bary, tid, act = native.embed_points_in_tets_native(p, tp, tt)
        assert act.all()
        recon = np.einsum("nk,nkj->nj", bary, tp[tt[tid]])
        np.testing.assert_allclose(recon, p, atol=1e-5)

    def test_embed_matches_numpy_fallback(self):
        from d3ga_tpu.geometry import embed as embed_mod

        tp = np.random.RandomState(2).rand(30, 3)
        from d3ga_tpu.geometry.cage_gen import lattice_tetrahedralize

        occ = np.ones((3, 3, 3), bool)
        verts, tets, _ = lattice_tetrahedralize(occ, np.zeros(3), 0.33)
        pts = np.random.RandomState(3).rand(100, 3) * 0.9 + 0.02
        b1, t1, a1 = native.embed_points_in_tets_native(pts, verts, tets)
        # numpy path (bypass the native shortcut)
        import unittest.mock as mock

        with mock.patch.object(
            embed_mod, "embed_points_in_tets", wraps=embed_mod.embed_points_in_tets
        ):
            # call the scipy implementation directly by raising in native
            b2, t2, a2 = _numpy_embed(pts, verts, tets)
        r1 = np.einsum("nk,nkj->nj", b1, verts[tets[t1]])
        r2 = np.einsum("nk,nkj->nj", b2, verts[tets[t2]])
        np.testing.assert_allclose(r1, pts, atol=1e-4)
        np.testing.assert_allclose(r2, pts, atol=1e-4)
        assert a1.all() and a2.all()

    def test_voxelize_sphere_volume(self):
        # icosphere-ish: use subdivided cube scaled to a unit box
        v, t, f = subdivided_cube((0.5, 0.5, 0.5), 1.0, res=1)
        occ = native.voxelize_mesh_native(
            v.astype(np.float32), f, np.array([-0.2, -0.2, -0.2], np.float32),
            0.05, (29, 29, 29),
        )
        vol = occ.sum() * 0.05**3
        assert 0.8 < vol < 1.35  # ~unit cube + surface shell

    def test_marching_tets_sphere(self):
        n = 24
        lin = np.linspace(-1, 1, n).astype(np.float32)
        X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
        sdf = (np.sqrt(X**2 + Y**2 + Z**2) - 0.6).astype(np.float32)
        v, f = native.marching_tetrahedra_native(
            sdf, np.array([-1, -1, -1.0]), 2 / (n - 1), iso=0.0
        )
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 0.6) < 0.02
        assert len(f) > 100


def _numpy_embed(pts, verts, tets):
    """scipy/numpy embedding without the native shortcut."""
    from scipy.spatial import cKDTree

    from d3ga_tpu.geometry.embed import point_tet_barycentric

    corners = verts[tets]
    tree = cKDTree(corners.mean(1))
    k = min(32, len(tets))
    _, cand = tree.query(pts, k=k)
    n = len(pts)
    best = np.full(n, -np.inf)
    bt = np.zeros(n, np.int64)
    bb = np.zeros((n, 4))
    for j in range(k):
        tv = corners[cand[:, j]]
        bary = point_tet_barycentric(pts, tv)
        score = bary.min(-1)
        upd = score > best
        best[upd] = score[upd]
        bt[upd] = cand[upd, j]
        bb[upd] = bary[upd]
    return bb.astype(np.float32), bt.astype(np.int32), best >= -1e-6


class TestCageGen:
    def test_cube_cage_valid(self):
        from d3ga_tpu.geometry.cage_gen import generate_cage

        v, t, f = subdivided_cube((0, 0, 0), 1.0, res=1)
        cage_v, tets, cage_f = generate_cage(v.astype(np.float32), f, pitch=0.13)
        assert len(tets) > 100
        # all positive volumes after canonicalization
        a, b, c, d = (cage_v[tets[:, k]] for k in range(4))
        signed = np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))
        assert (signed > 0).all()
        # total volume close to the dilated cube
        vol = signed.sum() / 6.0
        assert 0.9 < vol < 2.5
        # boundary faces form a closed surface: each boundary edge shared
        # by exactly two boundary faces
        edges = np.concatenate(
            [cage_f[:, [0, 1]], cage_f[:, [1, 2]], cage_f[:, [2, 0]]]
        )
        key = np.sort(edges, axis=1)
        _, counts = np.unique(key, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_conforming_lattice(self):
        from d3ga_tpu.geometry.cage_gen import lattice_tetrahedralize, surface_faces_of_tets

        occ = np.ones((3, 3, 3), bool)
        verts, tets, faces = lattice_tetrahedralize(occ, np.zeros(3), 1.0)
        assert tets.shape[0] == 27 * 5
        # 3x3 grid of cells: outer surface = 6 sides x 9 cells x 2 tris
        assert faces.shape[0] == 108
