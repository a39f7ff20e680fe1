import jax.numpy as jnp
import numpy as np

from d3ga_tpu.geometry import (
    tet_gradient,
    tet_volume,
    fem_energy,
    deformation_gradient,
    barycentric_blend,
    tet_faces,
    embed_points_in_tets,
    point_tet_barycentric,
)

UNIT_TET = np.array(
    [[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
)


class TestTetOps:
    def test_unit_tet_volume(self):
        v = tet_volume(jnp.asarray(UNIT_TET)[None])
        np.testing.assert_allclose(v, [1.0 / 6.0], atol=1e-6)

    def test_gradient_columns_are_edges(self):
        g = tet_gradient(jnp.asarray(UNIT_TET)[None])[0]
        # columns: v3-v0, v2-v0, v1-v0
        np.testing.assert_allclose(g[:, 0], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(g[:, 1], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(g[:, 2], [1, 0, 0], atol=1e-6)

    def test_fem_energy_zero_at_rest(self):
        pts = jnp.asarray(UNIT_TET)
        tets = jnp.array([[0, 1, 2, 3]])
        dn_inv = jnp.linalg.inv(tet_gradient(pts[tets]))
        e = fem_energy(pts, tets, dn_inv)
        np.testing.assert_allclose(e, [0.0], atol=1e-5)

    def test_fem_energy_scaling(self):
        pts = jnp.asarray(UNIT_TET)
        tets = jnp.array([[0, 1, 2, 3]])
        dn_inv = jnp.linalg.inv(tet_gradient(pts[tets]))
        s = 2.0
        e = fem_energy(pts * s, tets, dn_inv)
        # det F = 8, tr F^T F = 3*4 => 0.5*49 + 0.5*9 = 29
        np.testing.assert_allclose(e, [29.0], atol=1e-4)

    def test_deformation_gradient_rigid(self):
        # A rigid rotation must give J = R.
        from d3ga_tpu.ops.quaternion import quat_to_matrix, quat_normalize

        R = quat_to_matrix(quat_normalize(jnp.array([[0.2, 0.5, -0.3, 0.8]])))[0]
        rest = jnp.asarray(UNIT_TET)[None]
        dn_inv = jnp.linalg.inv(tet_gradient(rest))
        deformed = rest @ R.T
        J = deformation_gradient(deformed, dn_inv)[0]
        np.testing.assert_allclose(J, R, atol=1e-5)

    def test_bary_blend(self):
        tv = jnp.asarray(UNIT_TET)[None]
        b = jnp.array([[0.25, 0.25, 0.25, 0.25]])
        np.testing.assert_allclose(
            barycentric_blend(tv, b)[0], UNIT_TET.mean(0), atol=1e-6
        )

    def test_tet_faces_layout(self):
        f = tet_faces(jnp.array([[0, 1, 2, 3]]))
        expected = [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]
        np.testing.assert_array_equal(np.asarray(f), expected)


class TestEmbedding:
    def _grid_tets(self):
        # Two tets sharing a face.
        pts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], dtype=np.float64
        )
        tets = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
        return pts, tets

    def test_barycentric_identity(self):
        pts, tets = self._grid_tets()
        # corner points have one-hot barys
        tv = pts[tets[0]][None].repeat(4, 0)
        bary = point_tet_barycentric(pts[tets[0]], tv)
        np.testing.assert_allclose(bary, np.eye(4), atol=1e-8)

    def test_embed_interior_points(self):
        pts, tets = self._grid_tets()
        rng = np.random.default_rng(0)
        # random interior points of tet 0 via random barys
        w = rng.dirichlet(np.ones(4), size=50)
        p = w @ pts[tets[0]]
        barys, tid, active = embed_points_in_tets(p, pts, tets)
        assert active.all()
        # round trip: blend back
        recon = np.einsum("nk,nkj->nj", barys, pts[tets[tid]])
        np.testing.assert_allclose(recon, p, atol=1e-5)

    def test_embed_outside_point(self):
        pts, tets = self._grid_tets()
        p = np.array([[5.0, 5.0, 5.0]])
        barys, tid, active = embed_points_in_tets(p, pts, tets)
        assert not active[0]
        # still produces the nearest/most-inside tet with affine barys
        np.testing.assert_allclose(barys.sum(-1), [1.0], atol=1e-5)


class TestSampling:
    def test_seeded_sampling_reproducible(self):
        from d3ga_tpu.geometry.sampling import sample_initial_gaussians

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64)
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        a = sample_initial_gaussians(verts, faces, 100, seed=7)
        b = sample_initial_gaussians(verts, faces, 100, seed=7)
        np.testing.assert_array_equal(a["points"], b["points"])
        # samples lie in z=0 plane within the unit square
        assert np.all(np.abs(a["points"][:, 2]) < 1e-6)
        assert a["points"].min() >= -1e-6 and a["points"].max() <= 1 + 1e-6

    def test_tbn_orthonormal(self):
        from d3ga_tpu.geometry.sampling import sample_initial_gaussians

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
        faces = np.array([[0, 1, 2]])
        out = sample_initial_gaussians(verts, faces, 10, seed=0)
        R = out["rotations"]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-5)

    def test_triangle_barycentric_roundtrip(self):
        from d3ga_tpu.geometry.sampling import triangle_barycentric

        rng = np.random.default_rng(1)
        a, b, c = rng.normal(size=(3, 20, 3))
        w = rng.dirichlet(np.ones(3), size=20)
        p = w[:, :1] * a + w[:, 1:2] * b + w[:, 2:3] * c
        bary = triangle_barycentric(p, a, b, c)
        np.testing.assert_allclose(bary, w, atol=1e-5)
