"""Mesh-primitive garment model (`primitive_type: mesh`).

TPU-native equivalent of `MeshNet`
(`/root/reference/models/mesh_net.py:35-240`): Gaussians ride on the
triangles of a (subdivided) body mesh via 3-vertex barycentrics; the
rasterizer receives scales + quaternions directly instead of a
transported covariance; no FEM energy (fm_energy = 0).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.fields import mlp as F
from d3ga_tpu.ops.quaternion import quat_normalize


class MeshGeometry(NamedTuple):
    template_verts: jnp.ndarray   # [V, 3] canonical (subdivided) mesh
    faces: jnp.ndarray            # [F, 3] int32
    init_face_ids: jnp.ndarray    # [N] int32 face per Gaussian
    init_barys: jnp.ndarray       # [N, 3] triangle barycentrics
    init_points: jnp.ndarray      # [N, 3]
    init_rotations: jnp.ndarray   # [N, 4]
    gaussian_valid: Optional[jnp.ndarray] = None


def init_mesh_params(
    key, geometry: MeshGeometry, cond_dim: int, n_color_features: int = 64,
    color_in_dim=None, deform_cfg=None, canon_cfg=None, color_cfg=None,
):
    from d3ga_tpu.ops.knn import knn_mean_sq_dist

    deform_cfg = deform_cfg or {}
    canon_cfg = canon_cfg or {}
    color_cfg = color_cfg or {}
    n = geometry.init_points.shape[0]
    ks = jax.random.split(key, 4)
    dist2 = knn_mean_sq_dist(geometry.init_points, k=3)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    return {
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
            bary_size=3,
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


def mesh_forward(
    params,
    geometry: MeshGeometry,
    pose_verts: Callable[[Optional[jnp.ndarray]], jnp.ndarray],
    cond_deform,
    cond_canon,
    cond_color,
    camera_center,
    frame_encoding=None,
    camera_encoding=None,
    silhouette_color=(0.5, 0.5, 0.5),
    node_scale: float = 0.2,
    scale_bary: float = 0.25,
    use_pose: bool = True,
    use_view_enc: bool = True,
):
    """One mesh garment forward (`models/mesh_net.py:166-240`).
    pose_verts(delta) -> [V, 3] posed mesh vertices (delta pre-LBS)."""
    input_points = pose_verts(None)

    delta_node = F.deformation_field(
        params["deformation_field"], geometry.template_verts, cond_deform, node_scale
    )
    rot_act = quat_normalize(params["rotation"])
    scales_act = jnp.exp(params["scaling"])
    d_bary, d_rot, d_scale = F.canonical_field(
        params["canonical_field"], rot_act, scales_act, geometry.init_barys,
        cond_canon, scale_bary, bary_size=3,
    )

    points = pose_verts(delta_node)
    canon_barys = geometry.init_barys + d_bary
    scales = jnp.exp(params["scaling"] + d_scale)
    rotations = quat_normalize(params["rotation"] + d_rot)

    tri = points[geometry.faces[geometry.init_face_ids]]  # [N, 3, 3]
    means3d = jnp.einsum("nkj,nk->nj", tri, canon_barys)

    dirs = means3d - jax.lax.stop_gradient(camera_center)[None]
    viewdirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)

    rgb, opacities = F.color_field(
        params["color_field"],
        params["colors_feat"],
        pose=cond_color,
        viewdirs=viewdirs,
        frame_encoding=frame_encoding,
        camera_encoding=camera_encoding,
        use_pose=use_pose,
        use_view_enc=use_view_enc,
    )
    if geometry.gaussian_valid is not None:
        opacities = opacities * geometry.gaussian_valid[:, None]

    n = means3d.shape[0]
    return {
        "shs": None,
        "rgb": rgb,
        "scales": scales,
        "rotations": rotations,
        "opacities": opacities,
        "cov3D_precomp": None,
        "silhouette_rgb": jnp.broadcast_to(
            jnp.asarray(silhouette_color, means3d.dtype), (n, 3)
        ),
        "means3D": means3d,
        "canonical_means3D": jnp.einsum(
            "nkj,nk->nj", tri, geometry.init_barys
        ),
        "color_feat": params["colors_feat"],
        "fm_energy": jnp.zeros((1,)),
        "scale_energy": jnp.mean(jnp.mean(scales**2, axis=1))[None],
        "geometry": {
            "input_tetpoints": input_points,
            "canon_tetpoints": geometry.template_verts,
            "delta_node": jax.lax.stop_gradient(delta_node),
            "deformed_tetpoints": points,
            "faces": geometry.faces,
        },
    }
