import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.ops import (
    quat_normalize,
    quat_to_matrix,
    matrix_to_quat,
    axis_angle_to_matrix,
    covariance_from_scaling_rotation,
    strip_symmetric,
    unstrip_symmetric,
    inverse_sigmoid,
    eval_sh,
    sh_basis,
    rotate_sh,
    positional_encoding,
    posenc_dim,
    knn_mean_sq_dist,
)
from d3ga_tpu.ops.quaternion import quat_multiply, quat_rotate


def rand(key, *shape):
    return jax.random.normal(key, shape)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(quat_to_matrix(q)[0], jnp.eye(3), atol=1e-6)

    def test_round_trip(self):
        key = jax.random.PRNGKey(0)
        q = quat_normalize(rand(key, 64, 4))
        R = quat_to_matrix(q)
        q2 = matrix_to_quat(R)
        R2 = quat_to_matrix(q2)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_orthonormal(self):
        key = jax.random.PRNGKey(1)
        R = quat_to_matrix(rand(key, 32, 4))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        key = jax.random.PRNGKey(2)
        a = quat_normalize(rand(key, 8, 4))
        b = quat_normalize(rand(jax.random.PRNGKey(3), 8, 4))
        np.testing.assert_allclose(
            quat_to_matrix(quat_multiply(a, b)),
            quat_to_matrix(a) @ quat_to_matrix(b),
            atol=1e-5,
        )

    def test_quat_rotate(self):
        key = jax.random.PRNGKey(4)
        q = quat_normalize(rand(key, 8, 4))
        v = rand(jax.random.PRNGKey(5), 8, 3)
        np.testing.assert_allclose(
            quat_rotate(q, v), jnp.einsum("nij,nj->ni", quat_to_matrix(q), v), atol=1e-5
        )

    def test_rodrigues(self):
        # 90 degrees around z
        aa = jnp.array([[0.0, 0.0, np.pi / 2]])
        R = axis_angle_to_matrix(aa)[0]
        expected = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, expected, atol=1e-6)
        # zero rotation stable
        R0 = axis_angle_to_matrix(jnp.zeros((1, 3)))[0]
        np.testing.assert_allclose(R0, jnp.eye(3), atol=1e-6)


class TestCovariance:
    def test_strip_round_trip(self):
        key = jax.random.PRNGKey(0)
        s = jnp.exp(rand(key, 16, 3) * 0.3)
        q = rand(jax.random.PRNGKey(1), 16, 4)
        cov = covariance_from_scaling_rotation(s, q)
        np.testing.assert_allclose(unstrip_symmetric(strip_symmetric(cov)), cov, atol=1e-6)

    def test_eigenvalues_are_squared_scales(self):
        s = jnp.array([[0.5, 1.0, 2.0]])
        q = quat_normalize(jnp.array([[0.3, 0.5, -0.7, 0.2]]))
        cov = covariance_from_scaling_rotation(s, q)[0]
        ev = jnp.sort(jnp.linalg.eigvalsh(cov))
        np.testing.assert_allclose(ev, jnp.array([0.25, 1.0, 4.0]), atol=1e-5)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.2, 0.5, 0.9])
        np.testing.assert_allclose(jax.nn.sigmoid(inverse_sigmoid(x)), x, atol=1e-6)


class TestSH:
    def test_degree0_constant(self):
        shs = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
        dirs = quat_normalize(rand(jax.random.PRNGKey(0), 4, 4))[:, 1:]
        out = eval_sh(shs, dirs, 0)
        np.testing.assert_allclose(out, jnp.full((4, 3), 0.28209479 + 0.5), atol=1e-5)

    def test_orthonormality(self):
        # Monte-Carlo integral of b_i b_j over the sphere ~ delta_ij
        key = jax.random.PRNGKey(7)
        v = jax.random.normal(key, (200000, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        B = sh_basis(v, 3)  # [M, 16]
        gram = (B.T @ B) * (4 * np.pi / v.shape[0])
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_rotation_invariance_of_eval(self):
        # Rotating both coeffs and dirs leaves the value unchanged.
        key = jax.random.PRNGKey(3)
        sh = jax.random.normal(key, (16, 9, 3)) * 0.3
        q = quat_normalize(jax.random.normal(jax.random.PRNGKey(8), (4,)))
        from d3ga_tpu.ops.quaternion import quat_to_matrix as q2m

        R = q2m(q[None])[0]
        dirs = jax.random.normal(jax.random.PRNGKey(9), (16, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        val = eval_sh(sh, dirs, 2)
        sh_rot = rotate_sh(sh, R)
        val_rot = eval_sh(sh_rot, dirs @ R.T, 2)
        np.testing.assert_allclose(val, val_rot, atol=1e-4)


class TestPosenc:
    def test_shape_and_dim(self):
        x = jnp.ones((5, 3))
        out = positional_encoding(x, 7)
        assert out.shape == (5, posenc_dim(3, 7))
        assert out.shape[-1] == 45

    def test_matches_reference_layout(self):
        # identity first, then per-freq [sin, cos]
        x = jnp.array([[0.5, -0.25, 1.0]])
        out = positional_encoding(x, 2)
        np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], jnp.sin(x[0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], jnp.cos(x[0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], jnp.sin(2 * x[0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 12:15], jnp.cos(2 * x[0]), atol=1e-6)


class TestKNN:
    def test_against_bruteforce(self):
        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (500, 3))
        d = knn_mean_sq_dist(pts, k=3, chunk=128)
        # brute force
        d2 = np.sum((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=-1)[:, :3].mean(-1)
        np.testing.assert_allclose(d, expected, rtol=1e-4)
