"""Tetrahedral-mesh differential geometry (pure JAX, runtime hot path).

Semantics match `/root/reference/lib/tet_mesh.py:80-111` and
`/root/reference/lib/cage.py:339-361`:

  * `tet_gradient` builds the 3x3 edge matrix with edges as COLUMNS
    (v3-v0, v2-v0, v1-v0), so F = Ds @ Dn^{-1} is the true deformation
    gradient and covariances transport as J Sigma J^T.
  * `fem_energy` is the stable Neo-Hookean energy of Macklin et al.
    with lambda = mu = 0.5: 0.5 (det F - 1)^2 + 0.5 (tr F^T F - 3).

All functions are batched over the leading tet axis and differentiable.
"""

import jax.numpy as jnp


def tet_gradient(tet_verts: jnp.ndarray) -> jnp.ndarray:
    """tet_verts: [..., 4, 3] -> [..., 3, 3] edge matrix, columns are
    (v3-v0, v2-v0, v1-v0)."""
    v0 = tet_verts[..., 0, :]
    e = jnp.stack(
        [
            tet_verts[..., 3, :] - v0,
            tet_verts[..., 2, :] - v0,
            tet_verts[..., 1, :] - v0,
        ],
        axis=-1,  # columns
    )
    return e


def tet_volume(tet_verts: jnp.ndarray) -> jnp.ndarray:
    """Unsigned tet volume |det|/6; tet_verts: [..., 4, 3] -> [...]."""
    a = tet_verts[..., 0, :]
    b = tet_verts[..., 1, :]
    c = tet_verts[..., 2, :]
    d = tet_verts[..., 3, :]
    cross = jnp.cross(b - d, c - d)
    return jnp.abs(jnp.einsum("...i,...i->...", a - d, cross)) / 6.0


def deformation_gradient(deformed_tets: jnp.ndarray, canonical_grad_inv: jnp.ndarray) -> jnp.ndarray:
    """J = grad(deformed) @ inv(grad(canonical)); both [..., 3, 3]."""
    return tet_gradient(deformed_tets) @ canonical_grad_inv


def fem_energy(
    points: jnp.ndarray,
    tetras: jnp.ndarray,
    dn_inv: jnp.ndarray,
    lam: float = 0.5,
    mu: float = 0.5,
) -> jnp.ndarray:
    """Stable Neo-Hookean energy per tet.

    points: [V, 3] current node positions; tetras: [T, 4] int; dn_inv:
    [T, 3, 3] inverse template edge matrix. Returns [T]. Range is
    ~[-3, 3] around rest (callers shift by +3.0 as in
    `/root/reference/train.py:207`).
    """
    Ds = tet_gradient(points[tetras])
    F = Ds @ dn_inv
    det = jnp.linalg.det(F)
    vol_loss = (det - 1.0) ** 2
    trace = jnp.einsum("...ij,...ij->...", F, F)
    return lam * vol_loss + mu * (trace - 3.0)


def barycentric_blend(tet_verts: jnp.ndarray, barys: jnp.ndarray) -> jnp.ndarray:
    """Blend tet corner positions with barycentric weights.

    tet_verts: [N, 4, 3], barys: [N, 4] -> [N, 3]
    (`/root/reference/models/cage_net.py:230`)."""
    return jnp.einsum("nkj,nk->nj", tet_verts, barys)


def tet_faces(tetras) -> jnp.ndarray:
    """[T, 4] tet indices -> [4T, 3] triangle faces, the (A,B,C),
    (A,B,D), (A,C,D), (B,C,D) layout of `/root/reference/lib/tet_mesh.py:36-42`."""
    A, B, C, D = tetras[:, 0], tetras[:, 1], tetras[:, 2], tetras[:, 3]
    f = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([A, B, D], -1),
            jnp.stack([A, C, D], -1),
            jnp.stack([B, C, D], -1),
        ],
        axis=1,
    )
    return f.reshape(-1, 3)
