import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.body.lbs import (
    MomentumSkeleton,
    euler_xyz_to_quat,
    solve_skeleton_states,
    skin_points,
    unskin_points,
    root_transform,
)
from d3ga_tpu.body.smplx import SmplxModel, smplx_lbs, smplx_unpose
from d3ga_tpu.ops.quaternion import quat_to_matrix


def two_joint_skeleton():
    """Root at origin, child offset +x by 1; one vertex skinned to each."""
    J = 2
    P = 7 * J  # raw params map 1:1 to channels
    transform = np.eye(7 * J, dtype=np.float32)
    skel = MomentumSkeleton(
        joint_parents=jnp.array([-1, 0], jnp.int32),
        joint_offset=jnp.array([[0.0, 0, 0], [1.0, 0, 0]]),
        joint_rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (J, 1)),
        transform=jnp.asarray(transform),
        transform_offsets=jnp.zeros(7 * J),
        skin_weights=jnp.array([[1.0] + [0.0] * 7, [1.0] + [0.0] * 7]),
        skin_indices=jnp.zeros((2, 8), jnp.int32).at[1, 0].set(1),
        bind_state=None,
        template_verts=jnp.array([[0.0, 0.5, 0.0], [1.5, 0.0, 0.0]]),
    )
    zero = jnp.zeros((1, P))
    bind = solve_skeleton_states(skel._replace(bind_state=jnp.zeros((J, 8))), zero)[0]
    return skel._replace(bind_state=bind), P


class TestMomentumLBS:
    def test_zero_pose_is_identity(self):
        skel, P = two_joint_skeleton()
        out = skin_points(skel, jnp.zeros((1, P)))
        np.testing.assert_allclose(out[0], skel.template_verts, atol=1e-6)

    def test_root_translation(self):
        skel, P = two_joint_skeleton()
        params = jnp.zeros((1, P)).at[0, 0].set(2.0)  # root tx
        out = skin_points(skel, params)
        np.testing.assert_allclose(
            out[0], skel.template_verts + jnp.array([2.0, 0, 0]), atol=1e-6
        )

    def test_child_rotation_pivots_about_joint(self):
        skel, P = two_joint_skeleton()
        # rotate child joint around z by 90deg: its vertex at (1.5,0,0)
        # (0.5 from the joint at (1,0,0)) goes to (1, 0.5, 0)... up to the
        # euler convention's sign. Check radius invariance + root vert fixed.
        params = jnp.zeros((1, P)).at[0, 7 + 5].set(jnp.pi / 2)  # child rz
        out = skin_points(skel, params)
        np.testing.assert_allclose(out[0, 0], skel.template_verts[0], atol=1e-6)
        r = jnp.linalg.norm(out[0, 1] - jnp.array([1.0, 0, 0]))
        np.testing.assert_allclose(r, 0.5, atol=1e-6)
        assert abs(float(out[0, 1, 1])) > 0.49  # moved into y

    def test_scale_channel_is_exp2(self):
        skel, P = two_joint_skeleton()
        params = jnp.zeros((1, P)).at[0, 6].set(1.0)  # root scale 2^1
        out = skin_points(skel, params)
        # both vertices scale x2 about the root (bind state had scale 1)
        np.testing.assert_allclose(out[0], skel.template_verts * 2.0, atol=1e-5)

    def test_unskin_inverts_skin(self):
        skel, P = two_joint_skeleton()
        key = jax.random.PRNGKey(0)
        params = jax.random.normal(key, (1, P)) * 0.3
        posed = skin_points(skel, params)
        unposed = unskin_points(skel, params, posed)
        np.testing.assert_allclose(unposed[0], skel.template_verts, atol=1e-5)

    def test_root_transform_orthonormal(self):
        skel, P = two_joint_skeleton()
        params = jax.random.normal(jax.random.PRNGKey(1), (1, P)) * 0.2
        R, t = root_transform(skel, params, root_joint=1)
        s = jnp.linalg.det(R[0]) ** (1 / 3)
        Rn = R[0] / s
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-4)

    def test_euler_quat_unit(self):
        r = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
        q = euler_xyz_to_quat(r)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), jnp.ones(10), atol=1e-5)
        # single-axis y rotation must rotate about y by that angle (sign-definite |trace|)
        qy = euler_xyz_to_quat(jnp.array([[0.0, 0.7, 0.0]]))
        R = quat_to_matrix(qy)[0]
        np.testing.assert_allclose(R[1, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(jnp.abs(R[0, 0]), jnp.cos(0.7), atol=1e-5)


def toy_smplx():
    V, J, S = 6, 3, 2
    rng = np.random.default_rng(0)
    v_template = rng.normal(size=(V, 3)).astype(np.float32)
    jr = np.zeros((J, V), np.float32)
    jr[0, 0] = 1.0
    jr[1, 1] = 1.0
    jr[2, 2] = 1.0
    w = rng.dirichlet(np.ones(J), size=V).astype(np.float32)
    return SmplxModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(rng.normal(size=(V, 3, S)).astype(np.float32) * 0.1),
        posedirs=jnp.zeros((V, 3, 9 * (J - 1))),
        j_regressor=jnp.asarray(jr),
        parents=jnp.array([-1, 0, 1], jnp.int32),
        weights=jnp.asarray(w),
    )


class TestSmplx:
    def test_zero_pose_zero_shape_is_template(self):
        m = toy_smplx()
        out = smplx_lbs(m, jnp.zeros((1, 9)), jnp.zeros((1, 2)))
        np.testing.assert_allclose(out[0], m.v_template, atol=1e-5)

    def test_shape_blend(self):
        m = toy_smplx()
        betas = jnp.array([[0.5, -0.3]])
        out = smplx_lbs(m, jnp.zeros((1, 9)), betas)
        expected = m.v_template + jnp.einsum("s,vcs->vc", betas[0], m.shapedirs)
        np.testing.assert_allclose(out[0], expected, atol=1e-5)

    def test_global_rotation_is_rigid(self):
        m = toy_smplx()
        aa = jnp.zeros((1, 9)).at[0, :3].set(jnp.array([0.3, -0.2, 0.5]))
        out = smplx_lbs(m, aa, jnp.zeros((1, 2)))
        # root rotation (all joints chained under root): rigid about root joint
        from d3ga_tpu.ops.quaternion import axis_angle_to_matrix

        R = axis_angle_to_matrix(aa[:, :3])[0]
        j0 = m.v_template[0]  # joint 0 at vertex 0 by the regressor
        expected = (m.v_template - j0) @ R.T + j0
        np.testing.assert_allclose(out[0], expected, atol=1e-4)

    def test_unpose_roundtrip(self):
        m = toy_smplx()
        poses = jax.random.normal(jax.random.PRNGKey(3), (1, 9)) * 0.4
        shapes = jnp.array([[0.2, 0.1]])
        posed = smplx_lbs(m, poses, shapes)
        unposed = smplx_unpose(m, poses, shapes, posed)
        v_shaped = m.v_template + jnp.einsum("s,vcs->vc", shapes[0], m.shapedirs)
        np.testing.assert_allclose(unposed[0], v_shaped, atol=1e-4)


class TestSmplxLoader:
    def test_load_from_synthetic_npz(self, tmp_path):
        from d3ga_tpu.data.capture_builder import load_smplx_model

        V, J = 12, 5
        rng = np.random.default_rng(0)
        kintree = np.zeros((2, J), np.int64)
        kintree[0] = [2**32 - 1 if hasattr(np, "x") else 0, 0, 1, 2, 3]
        kintree[0, 0] = 4294967295  # root marker as in real smplx npz
        path = tmp_path / "smplx.npz"
        np.savez(
            path,
            v_template=rng.normal(size=(V, 3)).astype(np.float32),
            shapedirs=rng.normal(size=(V, 3, 20)).astype(np.float32),
            posedirs=rng.normal(size=(V * 3, 9 * (J - 1))).astype(np.float32),
            J_regressor=rng.dirichlet(np.ones(V), J).astype(np.float32),
            kintree_table=kintree,
            weights=rng.dirichlet(np.ones(J), V).astype(np.float32),
            f=rng.integers(0, V, (10, 3)).astype(np.int32),
            hands_componentsl=rng.normal(size=(45, 45)).astype(np.float32),
            hands_componentsr=rng.normal(size=(45, 45)).astype(np.float32),
            hands_meanl=np.zeros(45, np.float32),
            hands_meanr=np.zeros(45, np.float32),
        )
        m = load_smplx_model(str(path))
        assert m.num_joints == J and m.num_verts == V
        assert int(m.parents[0]) == -1 or int(m.parents[0]) > J  # root handled
        out = smplx_lbs(m, jnp.zeros((1, J * 3)), jnp.zeros((1, 10)))
        np.testing.assert_allclose(out[0], m.v_template, atol=1e-4)


class TestRegistrationGeometry:
    """`blueman.py:90-99,141-160` geometry= path + unpose round trip."""

    def _body(self):
        from d3ga_tpu.body.drivers import GoliathBody

        skel, P = two_joint_skeleton()

        class TinyBody(GoliathBody):
            STAR_POSE_IDX = {8: 0.1}

        body = TinyBody(
            skel, scales=jnp.zeros(0), global_scaling=1.0,
            n_pose_params=P, root_joint=0,
        )
        return body, P

    def test_get_registration_matches_get_on_posed_template(self):
        body, P = self._body()
        motion = jnp.zeros((1, P)).at[0, 8].set(0.3)  # child rx
        # skinning() output in capture mm == what get() re-centers
        geom_mm, _, _ = body.skinning(motion)
        via_reg = body.get_registration(motion, geom_mm)
        via_get = body.get(motion)
        np.testing.assert_allclose(
            np.asarray(via_reg), np.asarray(via_get), atol=1e-5
        )

    def test_to_body_model_space_round_trip(self):
        body, P = self._body()
        motion = jnp.zeros((1, P)).at[0, 8].set(0.4).at[0, 1].set(0.2)
        posed = body.get(motion)
        unposed_mm = body.to_body_model_space(motion, posed)
        np.testing.assert_allclose(
            np.asarray(unposed_mm)[0],
            np.asarray(body.skeleton.template_verts),
            atol=1e-4,
        )
