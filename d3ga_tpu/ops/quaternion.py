"""Quaternion algebra in JAX.

Convention: scalar-first (w, x, y, z), matching the reference
(`/root/reference/utils/general_utils.py:58-79` and pytorch3d).
All functions are batched over leading axes and jit/vmap-safe.
"""

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions to unit length. q: [..., 4]."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternion(s) -> rotation matrix [..., 3, 3].

    Normalizes internally, matching the reference `build_rotation`
    (`utils/general_utils.py:58-79`).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Branch-free variant of the Shepperd method: computes all four
    candidate quaternions and selects the numerically best with where()
    (no data-dependent control flow; vmap/jit-safe). Replaces
    pytorch3d.transforms.matrix_to_quaternion used at
    `/root/reference/lib/cage.py:290` and `models/garment_net.py:187`.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of the 4 candidates (x4).
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    eps = 1e-12
    # Candidate quaternions, each scaled by its own dominant component.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * jnp.sqrt(qw2 + eps)[..., None]
    )
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * jnp.sqrt(qx2 + eps)[..., None]
    )
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1) / (
        2.0 * jnp.sqrt(qy2 + eps)[..., None]
    )
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1) / (
        2.0 * jnp.sqrt(qz2 + eps)[..., None]
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    # Canonicalize sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both [..., 4] (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def axis_angle_to_quat(aa: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternion [..., 4] (w, x, y, z).

    Gradient-safe at aa = 0: the norm is computed through a clamped
    square (d sqrt(max(sq, eps^2))/d aa -> 0 instead of NaN) and the
    small-angle sinc branch depends on aa only through sq, so
    d(aa*sinc)/d(aa) -> 0.5 — the correct Rodrigues limit. This matters
    for optimizable global rotations initialized at exactly zero."""
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, eps * eps))
    half = 0.5 * angle
    # sin(x/2)/x, stable + grad-safe near zero (0.5 - x^2/48 + ...)
    sinc = jnp.where(angle < 1e-4, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    return jnp.concatenate([jnp.cos(half), aa * sinc], axis=-1)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Batched Rodrigues: axis-angle [..., 3] -> rotation [..., 3, 3].

    Replaces `tetra_sampler.lbs.batch_rodrigues`
    (`/root/reference/lib/smplman.py:16`).
    """
    return quat_to_matrix(axis_angle_to_quat(aa))
