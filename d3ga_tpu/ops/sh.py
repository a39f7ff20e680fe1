"""Real spherical harmonics: evaluation (deg <= 4) and rotation (bands <= 2).

Closed-form real SH basis in JAX; replaces both the CUDA rasterizer's
computeColorFromSH (sh degree 0-3, `/root/reference/renderer.py:88`) and
tiny-cuda-nn's SphericalHarmonics degree-4 view-direction encoding
(`/root/reference/models/mlp.py:166-179`). Band constants match
`/root/reference/utils/sh_utils.py`.
"""

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis values for unit directions.

    dirs: [..., 3] -> [..., (degree+1)**2]. Matches the 3DGS CUDA
    computeColorFromSH ordering for degrees 0..3.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, C0, dtype=dirs.dtype)]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            2.5033429417967046 * xy * (xx - yy),
            -1.7701307697799304 * yz * (3.0 * xx - yy),
            0.9461746957575601 * xy * (7.0 * zz - 1.0),
            -0.6690465435572892 * yz * (7.0 * zz - 3.0),
            0.10578554691520431 * (zz * (35.0 * zz - 30.0) + 3.0),
            -0.6690465435572892 * xz * (7.0 * zz - 3.0),
            0.47308734787878004 * (xx - yy) * (7.0 * zz - 1.0),
            -1.7701307697799304 * xz * (xx - 3.0 * yy),
            0.6258357354491761 * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(sh_coeffs: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH color. sh_coeffs: [..., K, C], dirs: [..., 3] -> [..., C].

    Only the first (degree+1)**2 coefficients contribute (active-degree
    semantics of `oneupSHdegree`, `/root/reference/models/trainer.py:180`).
    Adds the 3DGS +0.5 offset; clamping to >= 0 is left to the caller so
    gradients can respect the clamp mask.
    """
    n_active = (degree + 1) ** 2
    basis = sh_basis(dirs, degree)  # [..., n_active]
    return jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :n_active, :]) + 0.5


def sh_encoding(dirs: jnp.ndarray) -> jnp.ndarray:
    """tcnn-style view-direction encoding: SH degree-4 basis of the
    direction plus the raw direction (Composite[SH(4), Identity] ->
    16 + 3 dims; `/root/reference/models/mlp.py:166-179`).

    tcnn maps inputs from [0,1]^3 to [-1,1]^3 internally; callers pass
    raw unit directions here and we mirror tcnn's evaluation on
    (dir+1)/2 * 2 - 1 = dir, i.e. identity for unit dirs.
    """
    return jnp.concatenate([sh_basis(dirs, 3), dirs], axis=-1)


def _rot_band1(R: jnp.ndarray) -> jnp.ndarray:
    """SH band-1 rotation matrix from a 3x3 rotation.

    Band-1 basis b1(d) = C1 * M d with the signed permutation
    M: (x,y,z) -> (-y, z, -x), so b1(R d) = (M R M^{-1}) b1(d) and
    D1 = M R M^T (M orthogonal). With M = S P (S = diag(-1,1,-1),
    P the plain permutation), D1 = S (P R P^T) S.
    """
    P = jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], R.dtype)
    s = jnp.array([-1.0, 1.0, -1.0], R.dtype)
    return (P @ R @ P.T) * (s[:, None] * s[None, :])


def rotate_sh(sh_coeffs: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH coefficients (bands 0-2) by rotation matrix R.

    sh_coeffs: [N, K, C] with K >= 1; R: [3, 3] (or [N, 3, 3]).
    Band 0 is invariant; band 1 rotates with D1; band 2 with D2 built
    from D1 via the standard quadratic-form construction. Bands >= 3 are
    passed through unchanged (the reference's `utils/sh_rotate.py`
    likewise only handles bands 0-2).
    """
    K = sh_coeffs.shape[-2]
    if R.ndim == 2:
        R = R[None]
    out = [sh_coeffs[..., :1, :]]
    if K > 1:
        D1 = _rot_band1(R)  # [N,3,3]
        out.append(jnp.einsum("nij,njc->nic", D1, sh_coeffs[..., 1:4, :]))
    if K > 4:
        # Build D2 from how the 5 band-2 basis polynomials transform:
        # b2(R d) = D2 b2(d). Evaluate both sides on 5 generic sample
        # directions (chosen so the basis matrix B is well-conditioned)
        # and solve: D2 = RB^T B^{-T}. Exact — band-2 is 5-dimensional.
        dirs = jnp.array(
            [
                [1.0, 2.0, 3.0],
                [3.0, 1.0, 2.0],
                [2.0, 3.0, 1.0],
                [1.0, -1.0, 2.0],
                [2.0, 1.0, -1.0],
            ],
            sh_coeffs.dtype,
        )
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        B = _band2_basis(dirs)  # [5,5], rows = b2(d_i)
        Binv = jnp.linalg.inv(B)
        rdirs = jnp.einsum("nij,dj->ndi", R, dirs)  # [N,5,3]
        RB = _band2_basis(rdirs)  # [N,5,5]
        D2 = jnp.einsum("ndk,sd->nks", RB, Binv)  # RB^T @ B^{-T}
        out.append(jnp.einsum("nij,njc->nic", D2, sh_coeffs[..., 4:9, :]))
    if K > 9:
        out.append(sh_coeffs[..., 9:, :])
    return jnp.concatenate(out, axis=-2)


def _band2_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [
            C2[0] * x * y,
            C2[1] * y * z,
            C2[2] * (2.0 * z * z - x * x - y * y),
            C2[3] * x * z,
            C2[4] * (x * x - y * y),
        ],
        axis=-1,
    )
