"""3D covariance construction and symmetric-matrix packing.

Reference semantics: `/root/reference/utils/general_utils.py:24-90`
(strip_lowerdiag, build_rotation, build_scaling_rotation) and
`/root/reference/models/cage_net.py:161-164` (cov = L L^T).
Packing order of the 6 unique elements: (xx, xy, xz, yy, yz, zz).
"""

import jax.numpy as jnp

from d3ga_tpu.ops.quaternion import quat_to_matrix


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s). s: [..., 3], q: [..., 4] -> [..., 3, 3]."""
    return quat_to_matrix(q) * s[..., None, :]


def covariance_from_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Sigma = L L^T = R diag(s^2) R^T. -> [..., 3, 3] full symmetric."""
    L = build_scaling_rotation(s, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper triangle (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (xx,xy,xz,yy,yz,zz) -> [..., 3, 3] full symmetric."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
