"""Loop subdivision with attribute interpolation
(`/root/reference/utils/mesh_utils.py:105-325` semantics)."""

import numpy as np

from d3ga_tpu.geometry.subdivide import loop_subdivide


def icosahedron():
    t = (1.0 + 5**0.5) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    return v, f


class TestLoopSubdivide:
    def test_counts_closed_mesh(self):
        v, f = icosahedron()
        w = np.eye(12)[:, :4].copy()
        w[:, 0] += 1 - w.sum(1)  # rows sum to 1
        nv, nf, nw = loop_subdivide(v, f, w)
        E = 30  # icosahedron edges
        assert len(nv) == len(v) + E  # V' = V + E
        assert len(nf) == 4 * len(f)
        assert nw.shape == (len(nv), 4)

    def test_weight_rows_keep_summing_to_one(self):
        v, f = icosahedron()
        rng = np.random.default_rng(0)
        w = rng.dirichlet(np.ones(6), size=len(v))
        nv, nf, nw = loop_subdivide(v, f, w, iterations=2)
        np.testing.assert_allclose(nw.sum(1), 1.0, atol=1e-6)
        assert nw.min() >= -1e-9

    def test_sphere_stays_spherical(self):
        v, f = icosahedron()
        nv, nf, _ = loop_subdivide(v, f, None, iterations=2)
        r = np.linalg.norm(nv, axis=1)
        # loop subdivision of a sphere shrinks a little but stays round
        assert r.std() / r.mean() < 0.02
        # a coarse icosahedron shrinks noticeably under 2 rounds of loop
        assert 0.6 < r.mean() < 1.0

    def test_valid_watertight_topology(self):
        v, f = icosahedron()
        nv, nf, _ = loop_subdivide(v, f, None)
        # every edge of the subdivided closed mesh is shared by 2 faces
        e = np.sort(
            np.concatenate([nf[:, [0, 1]], nf[:, [1, 2]], nf[:, [2, 0]]]), axis=1
        )
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_boundary_rules_two_triangle_square(self):
        # square [0,1]^2 split along the diagonal; all edges except the
        # diagonal are boundary
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        nv, nf, _ = loop_subdivide(v, f, None)
        assert len(nv) == 4 + 5
        # boundary odd vertices = edge midpoints
        mids = {(0.5, 0.0), (1.0, 0.5), (0.5, 1.0), (0.0, 0.5)}
        got = {tuple(np.round(p[:2], 6)) for p in nv[4:]}
        assert mids <= got
        # interior (diagonal) odd vertex: 3/8(v0+v2) + 1/8(v1+v3)
        diag = 0.375 * (v[0] + v[2]) + 0.125 * (v[1] + v[3])
        assert any(np.allclose(p, diag) for p in nv[4:])
        # boundary even rule: 3/4 v + 1/8 (two boundary neighbors)
        expected0 = 0.75 * v[0] + 0.125 * (v[1] + v[3])
        np.testing.assert_allclose(nv[0], expected0, atol=1e-6)

    def test_face_labels_lift_by_repeat(self):
        v, f = icosahedron()
        nv, nf, _ = loop_subdivide(v, f, None)
        labels = np.arange(len(f))
        lifted = np.repeat(labels, 4)
        # each child triangle's vertices derive from its parent's corner
        # vertices and edge midpoints: children 4i..4i+3 come from face i
        for i in (0, 7, 19):
            child = nf[4 * i]
            assert child[0] == f[i][0]  # corner child keeps parent corner
            assert lifted[4 * i] == i


class TestSmplxAvatarSubdivided:
    def test_build_uses_densified_template(self, tmp_path):
        from fixtures_capture import actorshq_config, make_actorshq_capture
        from d3ga_tpu.data.capture_builder import build_smplx_avatar

        data_cfg = make_actorshq_capture(tmp_path / "capture")
        config = actorshq_config(None, tmp_path / "assets", data_cfg)
        m_dense, ds, body = build_smplx_avatar(config)
        config2 = actorshq_config(None, tmp_path / "assets2", data_cfg)
        config2["data"] = dict(data_cfg, densify_template=False)
        m_raw, _, _ = build_smplx_avatar(config2)
        # subdivided source mesh -> more cage nodes for the same config
        n_dense = m_dense.garments[0].geometry.cage_points.shape[0]
        n_raw = m_raw.garments[0].geometry.cage_points.shape[0]
        assert n_dense >= n_raw
        # and the posed cage is still finite/valid through pose_nodes
        import jax.numpy as jnp

        batch = {"lbs": jnp.zeros(87)}
        posed = m_dense.garments[0].pose_nodes(batch, None)
        assert bool(jnp.all(jnp.isfinite(posed)))
