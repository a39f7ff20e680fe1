"""Cage garment model: tet-cage-embedded Gaussians with MLP fields.

The TPU-native equivalent of `CageNet`
(`/root/reference/models/cage_net.py:33-284`) as a pure function over a
parameter pytree + static geometry buffers:

  pose the cage (LBS, via a caller-supplied pose function) ->
  DeformationField node offsets (pre- or post-LBS) ->
  CanonicalField corrections of (barys, quats, scales) ->
  deformation gradient J = grad(deformed) @ grad(canonical)^-1 ->
  cov3D = J (R S S^T R^T) J^T ->
  Gaussian positions = barycentric blend of deformed tet corners ->
  ColorField RGB/opacity (or SH) + Neo-Hookean/scale regularizers.

Everything is dense [N, ...] / [V, ...] — no per-Gaussian control flow.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.fields import mlp as F
from d3ga_tpu.geometry.tet import barycentric_blend, fem_energy, tet_gradient
from d3ga_tpu.ops.covariance import (
    covariance_from_scaling_rotation,
    inverse_sigmoid,
    strip_symmetric,
)
from d3ga_tpu.ops.knn import knn_mean_sq_dist
from d3ga_tpu.ops.quaternion import matrix_to_quat, quat_normalize

SILHOUETTE_COLORS = {
    "red": (1.0, 0.0, 0.0),
    "green": (0.0, 1.0, 0.0),
    "blue": (0.0, 0.0, 1.0),
    "gray": (0.5, 0.5, 0.5),
}


class CageGeometry(NamedTuple):
    """Static per-cage buffers (built once by the asset pipeline,
    `/root/reference/lib/cage.py:310-337` equivalents)."""

    cage_points: jnp.ndarray       # [V, 3] canonical tet nodes
    tetras: jnp.ndarray            # [T, 4] int32
    triangles: jnp.ndarray         # [F, 3] int32 surface triangles
    barys: jnp.ndarray             # [N, 4] Gaussian tet barycentrics
    tetra_id: jnp.ndarray          # [N] int32 containing tet per Gaussian
    canonical_grad_inv: jnp.ndarray  # [N, 3, 3] inv edge matrix at bind
    dn_inv: jnp.ndarray            # [T, 3, 3] inv template edge matrix (FEM)
    init_points: jnp.ndarray       # [N, 3] initial Gaussian positions
    init_rotations: jnp.ndarray    # [N, 4] TBN-frame init quats
    cage_to_body_vertex: Optional[jnp.ndarray] = None  # [V] int32 (AO path)
    gaussian_valid: Optional[jnp.ndarray] = None  # [N] 0/1 (padding mask)


def build_cage_geometry(
    cage_points, tetras, triangles, sample_points, sample_rotations,
    cage_to_body_vertex=None,
) -> CageGeometry:
    """Host-side assembly: embeds sampled Gaussians into tets and caches
    the inverse canonical gradients."""
    import numpy as np

    from d3ga_tpu.geometry.embed import embed_points_in_tets

    barys, tetra_id, _ = embed_points_in_tets(
        np.asarray(sample_points), np.asarray(cage_points), np.asarray(tetras)
    )
    corners = np.asarray(cage_points)[np.asarray(tetras)]  # [T, 4, 3]
    grads = np.asarray(tet_gradient(jnp.asarray(corners)))
    dn_inv = np.linalg.inv(grads)
    canonical_grad_inv = dn_inv[tetra_id]
    if sample_rotations.ndim == 3:
        sample_rotations = matrix_to_quat(jnp.asarray(sample_rotations))
    return CageGeometry(
        cage_points=jnp.asarray(cage_points, jnp.float32),
        tetras=jnp.asarray(tetras, jnp.int32),
        triangles=jnp.asarray(triangles, jnp.int32),
        barys=jnp.asarray(barys, jnp.float32),
        tetra_id=jnp.asarray(tetra_id, jnp.int32),
        canonical_grad_inv=jnp.asarray(canonical_grad_inv, jnp.float32),
        dn_inv=jnp.asarray(dn_inv, jnp.float32),
        init_points=jnp.asarray(sample_points, jnp.float32),
        init_rotations=jnp.asarray(sample_rotations, jnp.float32),
        cage_to_body_vertex=None
        if cage_to_body_vertex is None
        else jnp.asarray(cage_to_body_vertex, jnp.int32),
    )


def init_cage_params(
    key,
    geometry: CageGeometry,
    cond_dim: int,
    n_color_features: int = 64,
    use_shs: bool = False,
    max_sh_degree: int = 3,
    color_in_dim: Optional[int] = None,
    deform_cfg=None,
    canon_cfg=None,
    color_cfg=None,
):
    """Learned per-cage parameter pytree (`models/cage_net.py:57-83`)."""
    deform_cfg = deform_cfg or {}
    canon_cfg = canon_cfg or {}
    color_cfg = color_cfg or {}
    n = geometry.init_points.shape[0]
    ks = jax.random.split(key, 8)

    dist2 = knn_mean_sq_dist(geometry.init_points, k=3)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    params = {
        "colors_feat": jax.random.uniform(ks[0], (n, n_color_features)) * 0.33,
        "rotation": geometry.init_rotations,
        "scaling": scales,
        "deformation_field": F.init_deformation_field(
            ks[1], cond_dim,
            n_hidden=deform_cfg.get("n_nodes", 128),
            n_layers=deform_cfg.get("n_layers", 3),
        ),
        "canonical_field": F.init_canonical_field(
            ks[2], cond_dim,
            n_hidden=canon_cfg.get("n_nodes", 128),
            n_layers=canon_cfg.get("n_layers", 3),
        ),
        "color_field": F.init_color_field(
            ks[3],
            color_in_dim
            if color_in_dim is not None
            else F.color_field_input_dim(n_color_features, cond_dim),
            n_hidden=color_cfg.get("n_nodes", 128),
            n_layers=color_cfg.get("n_layers", 4),
        ),
    }
    if use_shs:
        shs0 = jax.random.uniform(ks[4], (n, 3)) / 255.0
        k_sh = (max_sh_degree + 1) ** 2
        params["opacities"] = inverse_sigmoid(0.2 * jnp.ones((n, 1)))
        params["features_dc"] = shs0[:, None, :]  # [N, 1, 3]
        params["features_rest"] = jnp.zeros((n, k_sh - 1, 3))
    return params


def cage_forward(
    params,
    geometry: CageGeometry,
    pose_nodes: Callable[[Optional[jnp.ndarray]], jnp.ndarray],
    cond_deform: jnp.ndarray,
    cond_canon: jnp.ndarray,
    cond_color: jnp.ndarray,
    camera_center: jnp.ndarray,
    frame_encoding=None,
    camera_encoding=None,
    pred_ao=None,
    silhouette_color=(0.5, 0.5, 0.5),
    node_scale: float = 0.2,
    scale_bary: float = 0.25,
    tet_offset_pre_lbs: bool = True,
    use_shs: bool = False,
    use_pose: bool = True,
    use_view_enc: bool = True,
):
    """One garment forward (`models/cage_net.py:187-284`).

    pose_nodes(delta) -> [V, 3] posed cage nodes (LBS, delta applied
    pre-LBS when the caller implements it; passing None poses the raw
    template). Returns the garment package dict.
    """
    input_nodes = pose_nodes(None)

    delta_node = F.deformation_field(
        params["deformation_field"], geometry.cage_points, cond_deform, node_scale
    )

    rot_act = quat_normalize(params["rotation"])
    scales_act = jnp.exp(params["scaling"])
    d_bary, d_rot, d_scale = F.canonical_field(
        params["canonical_field"], rot_act, scales_act, geometry.barys,
        cond_canon, scale_bary,
    )

    if tet_offset_pre_lbs:
        nodes = pose_nodes(delta_node)
    else:
        nodes = input_nodes + delta_node

    canon_barys = geometry.barys + d_bary
    scales = jnp.exp(params["scaling"] + d_scale)
    rotation = quat_normalize(params["rotation"] + d_rot)

    deformed_tetras = nodes[geometry.tetras]  # [T, 4, 3]
    per_g = deformed_tetras[geometry.tetra_id]  # [N, 4, 3]

    J = tet_gradient(per_g) @ geometry.canonical_grad_inv
    sigma = covariance_from_scaling_rotation(scales, rotation)
    cov3d = J @ sigma @ jnp.swapaxes(J, -1, -2)
    cov3d_packed = strip_symmetric(cov3d)

    fm = fem_energy(nodes, geometry.tetras, geometry.dn_inv)
    scale_energy = jnp.mean(jnp.mean(scales**2, axis=1))[None]

    means3d = barycentric_blend(per_g, canon_barys)

    dirs = means3d - jax.lax.stop_gradient(camera_center)[None]
    viewdirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)

    shadow = None
    if pred_ao is not None and geometry.cage_to_body_vertex is not None:
        ao_nodes = pred_ao[geometry.cage_to_body_vertex][:, None]  # [V, 1]
        ao_per_g = ao_nodes[geometry.tetras][geometry.tetra_id]  # [N, 4, 1]
        shadow = jnp.einsum("nkj,nk->nj", ao_per_g, canon_barys)

    n = means3d.shape[0]
    sil = jnp.broadcast_to(jnp.asarray(silhouette_color, means3d.dtype), (n, 3))

    shs, rgb, opacities = None, None, None
    if use_shs:
        shs = jnp.concatenate([params["features_dc"], params["features_rest"]], axis=1)
        opacities = jax.nn.sigmoid(params["opacities"])
    else:
        rgb, opacities = F.color_field(
            params["color_field"],
            params["colors_feat"],
            pose=cond_color,
            viewdirs=viewdirs,
            frame_encoding=frame_encoding,
            camera_encoding=camera_encoding,
            shadow=shadow,
            use_pose=use_pose,
            use_view_enc=use_view_enc,
        )

    if geometry.gaussian_valid is not None:
        # Shard-padding Gaussians are masked out exactly (alpha = 0).
        opacities = opacities * geometry.gaussian_valid[:, None]

    canon_per_g = geometry.cage_points[geometry.tetras][geometry.tetra_id]

    return {
        "shs": shs,
        "rgb": rgb,
        "opacities": opacities,
        "cov3D_precomp": cov3d_packed,
        "silhouette_rgb": sil,
        "means3D": means3d,
        "canonical_means3D": barycentric_blend(canon_per_g, geometry.barys),
        "color_feat": params["colors_feat"],
        "fm_energy": jnp.mean(fm)[None],
        "scale_energy": scale_energy,
        "geometry": {
            "input_tetpoints": input_nodes,
            "canon_tetpoints": geometry.cage_points,
            "delta_node": jax.lax.stop_gradient(delta_node),
            "deformed_tetpoints": nodes,
            "faces": geometry.triangles,
        },
    }
