"""Composite avatar model: multiple cage garments + shared conditioners.

TPU-native equivalent of `GarmentNet`
(`/root/reference/models/garment_net.py:29-268`): one cage (or mesh)
garment model per configured cage, per-frame/per-camera learned
embeddings (mean at eval), optional AO shadow decoder, face-keypoint
embedding path, per-camera affine color calibration applied to the
merged per-Gaussian colors, optional optimizable per-frame SMPL-X pose
corrections.

The model is split into a static description (AvatarModel: geometries,
pose closures, config) and a parameter pytree (init_avatar), with
avatar_forward a pure function of both — jit/pjit/grad compose directly.
"""

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.fields import (
    apply_camera_calibration,
    embedding_average,
    embedding_lookup,
    init_camera_calibration,
    init_embedding,
    init_learnable_blur,
    init_pixel_bias,
)
from d3ga_tpu.fields import mlp as F
from d3ga_tpu.model.cage_model import (
    SILHOUETTE_COLORS,
    CageGeometry,
    cage_forward,
    init_cage_params,
)

MERGE_KEYS = (
    "shs", "rgb", "opacities", "cov3D_precomp", "scales", "rotations",
    "silhouette_rgb", "means3D", "canonical_means3D", "color_feat",
    "fm_energy", "scale_energy",
)


class GarmentSpec(NamedTuple):
    name: str
    geometry: Any  # CageGeometry or MeshGeometry
    # pose_nodes(batch, delta) -> [V, 3] posed cage nodes / mesh verts
    pose_nodes: Callable[[Dict[str, Any], Optional[jnp.ndarray]], jnp.ndarray]
    silhouette_color: tuple
    node_scale: float = 0.2
    primitive: str = "cage"  # "cage" | "mesh" (`garment_net.py:53-56`)


class AvatarModel(NamedTuple):
    garments: tuple  # tuple[GarmentSpec]
    cond_dim: int
    n_frames: int
    n_cameras: int
    config: Dict[str, Any]  # static hyperparameters


def _cfg(config, key, default):
    return config.get(key, default)


def init_avatar(
    key, model: AvatarModel, init_smplx_poses=None, init_smplx_rh=None,
    init_smplx_th=None,
):
    """init_smplx_poses: optional [n_frames, 87] dataset poses enabling
    the optimizable per-frame SMPL-X corrections
    (`garment_net.py:87-107`, `use_opt_smplx`). init_smplx_rh/th:
    optional [n_frames, 3] global rotation (axis-angle) / translation;
    when given (with use_opt_smplx) they become per-frame learnable and
    the render camera is rebuilt in-graph (`prepare_opt_tensors`,
    `garment_net.py:87-107` — but differentiable here, see
    `resolve_camera`)."""
    cfg = model.config
    ks = jax.random.split(key, len(model.garments) + 6)
    params: Dict[str, Any] = {"garments": {}}
    if _cfg(cfg, "use_opt_smplx", False) and init_smplx_poses is not None:
        params["optimizable_poses"] = jnp.asarray(init_smplx_poses, jnp.float32)
        if init_smplx_rh is not None:
            params["optimizable_rotations"] = jnp.asarray(init_smplx_rh, jnp.float32)
        if init_smplx_th is not None:
            params["optimizable_translations"] = jnp.asarray(init_smplx_th, jnp.float32)
    for i, g in enumerate(model.garments):
        if g.primitive == "mesh":
            from d3ga_tpu.model.mesh_model import init_mesh_params

            params["garments"][g.name] = init_mesh_params(
                ks[i],
                g.geometry,
                model.cond_dim,
                n_color_features=_cfg(cfg, "n_color_features", 64),
                color_in_dim=F.color_field_input_dim(
                    _cfg(cfg, "n_color_features", 64),
                    model.cond_dim,
                    use_pose=_cfg(cfg, "use_pose", True),
                    use_view_enc=_cfg(cfg, "use_view_enc", True),
                    frame_dim=_cfg(cfg, "frame_embed_dim", 0),
                    camera_dim=_cfg(cfg, "camera_embed_dim", 0),
                ),
                deform_cfg=_cfg(cfg, "deform_mlp", None),
                canon_cfg=_cfg(cfg, "canon_mlp", None),
                color_cfg=_cfg(cfg, "color_mlp", None),
            )
            continue
        params["garments"][g.name] = init_cage_params(
            ks[i],
            g.geometry,
            model.cond_dim,
            n_color_features=_cfg(cfg, "n_color_features", 64),
            use_shs=_cfg(cfg, "use_shs", False),
            max_sh_degree=_cfg(cfg, "max_sh_degree", 3),
            color_in_dim=F.color_field_input_dim(
                _cfg(cfg, "n_color_features", 64),
                model.cond_dim,
                use_pose=_cfg(cfg, "use_pose", True),
                use_view_enc=_cfg(cfg, "use_view_enc", True),
                frame_dim=_cfg(cfg, "frame_embed_dim", 0),
                camera_dim=_cfg(cfg, "camera_embed_dim", 0),
                shadow=_cfg(cfg, "use_ao", False),
            ),
            deform_cfg=_cfg(cfg, "deform_mlp", None),
            canon_cfg=_cfg(cfg, "canon_mlp", None),
            color_cfg=_cfg(cfg, "color_mlp", None),
        )

    k = len(model.garments)
    if _cfg(cfg, "frame_embed_dim", 0) > 0:
        params["frame_embeddings"] = init_embedding(
            ks[k], model.n_frames, cfg["frame_embed_dim"]
        )
    if _cfg(cfg, "camera_embed_dim", 0) > 0:
        params["camera_embeddings"] = init_embedding(
            ks[k + 1], model.n_cameras, cfg["camera_embed_dim"]
        )
    if _cfg(cfg, "use_color_calib", True):
        params["camera_calib"] = init_camera_calibration(model.n_cameras)
    if _cfg(cfg, "use_blur", False):
        params["learnable_blur"] = init_learnable_blur(model.n_cameras)
    if _cfg(cfg, "use_pixel_cal", False):
        params["pixel_cal"] = init_pixel_bias(
            model.n_cameras,
            _cfg(cfg, "image_height", 1024),
            _cfg(cfg, "image_width", 667),
        )
    if _cfg(cfg, "use_bg_network", False):
        from d3ga_tpu.fields import init_background_model

        params["bg_net"] = init_background_model(
            model.n_cameras,
            _cfg(cfg, "image_height", 1024),
            _cfg(cfg, "image_width", 667),
        )
    if _cfg(cfg, "use_ao", False):
        params["shadow_decoder"] = F.init_shadow_decoder(ks[k + 2])
    if _cfg(cfg, "use_face_emb", False):
        params["face_decoder"] = F.init_face_decoder(
            ks[k + 3], cfg["n_valid_kpts"],
            n_output=_cfg(cfg, "face_embed_dim", 128),
        )
    return params


def _merge(pkgs):
    """Concatenate per-garment packages (`garment_net.py:149-161`)."""
    out = {}
    for key in MERGE_KEYS:
        vals = [p[key] for p in pkgs if p.get(key) is not None]
        if vals:
            out[key] = jnp.concatenate(vals, axis=0)
        else:
            out[key] = None
    out["geometry"] = [
        dict(p["geometry"], name=name) for (name, p) in pkgs_named(pkgs)
    ]
    return out


def pkgs_named(pkgs):
    return [(p["__name__"], p) for p in pkgs]


def eval_layer(params, model: AvatarModel, batch, names, training=False):
    """Render only the named garment layers (`garment_net.py:237-248`)."""
    sub = model._replace(
        garments=tuple(g for g in model.garments if g.name in names)
    )
    return avatar_forward(params, sub, batch, training=training)


def _freeze_after(p, iteration, limit=400_000):
    """Stop-gradient once iteration > limit (`garment_net.py:224-227`)."""
    frozen = jnp.asarray(iteration > limit, p.dtype)
    return frozen * jax.lax.stop_gradient(p) + (1.0 - frozen) * p


def resolve_camera(params, model: AvatarModel, batch, training: bool = True):
    """Rebuild the render camera INSIDE the jitted graph from the
    per-frame optimizable global rotation/translation.

    The reference declares optimizable Rh/Th with LRs
    (`garment_net.py:87-107`, `trainer.py` param groups) but builds the
    camera host-side from the DATASET Rh/Th (`lib/batch.py:165-201`,
    `.cpu().numpy()`), so those parameters never receive gradients.
    Here the capture extrinsics ride in the batch (`cam_rt`) and the
    body-frame camera is recomputed differentiably, making dL/dRh and
    dL/dTh real. Returns the (possibly updated) batch."""
    if (
        not training
        or "optimizable_rotations" not in params
        or "cam_rt" not in batch
    ):
        return batch
    from d3ga_tpu.body.drivers import smplx_camera_to_world
    from d3ga_tpu.raster.camera import camera_from_c2w

    fi = batch["frame_idx"]
    it = batch.get("iteration", jnp.int32(0))
    rh = _freeze_after(params["optimizable_rotations"][fi], it)
    th = _freeze_after(params["optimizable_translations"][fi], it)
    c2w = smplx_camera_to_world(
        rh, th, batch["cam_rt"], mocap=_cfg(model.config, "mocap", True)
    )
    cam0 = batch["camera"]
    cam = camera_from_c2w(
        c2w, cam0.tanfovx, cam0.tanfovy, cam0.width, cam0.height
    )
    return dict(batch, camera=cam)


def avatar_forward(
    params, model: AvatarModel, batch, training: bool = True, geom_override=None
):
    """batch: dict with
      - "lbs": [P] momentum pose params or "smplx_poses": [87]
      - "camera": Camera
      - "frame_idx" / "camera_idx": int32 scalars
      - optional "face_kpt", "template_pe" (for AO)
    Returns the merged garment package (`garment_net.py:250-268`).
    """
    cfg = model.config
    camera = batch["camera"]
    # Mixed primitives can't be concatenated into one rasterizer call
    # (cov3D vs scales+rotations) — same constraint as the reference's
    # global `primitive_type`.
    prims = {g.primitive for g in model.garments}
    assert len(prims) == 1, f"all garments must share a primitive, got {prims}"

    # Optimizable per-frame SMPL-X pose corrections replace the dataset
    # poses during training and are frozen (stop-gradient) after 400k
    # iterations (`garment_net.py:211-235`).
    opt_poses = None
    if "optimizable_poses" in params and training:
        opt_poses = _freeze_after(
            params["optimizable_poses"][batch["frame_idx"]],
            batch.get("iteration", jnp.int32(0)),
        )
        batch = dict(batch, smplx_poses=opt_poses)

    # Conditioning pose vector (`models/cage_net.py:166-185`): momentum
    # drops the 6 root dims; SMPL-X uses poses[:87].
    if "smplx_poses" in batch:
        cond = batch["smplx_poses"][:87]
    else:
        cond = batch["lbs"][6:] if batch["lbs"].shape[-1] == 104 else batch["lbs"]

    frame_enc = camera_enc = None
    if "frame_embeddings" in params:
        frame_enc = (
            embedding_lookup(params["frame_embeddings"], batch["frame_idx"])
            if training
            else embedding_average(params["frame_embeddings"])
        )
    if "camera_embeddings" in params:
        camera_enc = (
            embedding_lookup(params["camera_embeddings"], batch["camera_idx"])
            if training
            else embedding_average(params["camera_embeddings"])
        )

    pred_ao = None
    if "shadow_decoder" in params and "template_pe" in batch:
        pred_ao = F.shadow_decoder(
            params["shadow_decoder"], batch["lbs"], batch["template_pe"]
        )[:, 0]

    face_embs = None
    if "face_decoder" in params and "face_kpt_canonical" in batch:
        face_embs = F.face_decoder(params["face_decoder"], batch["face_kpt_canonical"])

    pkgs = []
    for g in model.garments:
        gcond = cond
        if g.name == "face" and face_embs is not None:
            gcond = face_embs
        geometry = g.geometry if geom_override is None else geom_override[g.name]
        if g.primitive == "mesh":
            from d3ga_tpu.model.mesh_model import mesh_forward

            pkg = mesh_forward(
                params["garments"][g.name],
                geometry,
                lambda delta, g=g: g.pose_nodes(batch, delta),
                cond_deform=gcond,
                cond_canon=gcond,
                cond_color=gcond,
                camera_center=camera.camera_center,
                frame_encoding=frame_enc,
                camera_encoding=camera_enc,
                silhouette_color=g.silhouette_color,
                node_scale=g.node_scale,
                scale_bary=_cfg(cfg, "scale_bary", 0.25),
                use_pose=_cfg(cfg, "use_pose", True),
                use_view_enc=_cfg(cfg, "use_view_enc", True),
            )
            pkg["__name__"] = g.name
            pkgs.append(pkg)
            continue
        pkg = cage_forward(
            params["garments"][g.name],
            geometry,
            lambda delta, g=g: g.pose_nodes(batch, delta),
            cond_deform=gcond,
            cond_canon=gcond,
            cond_color=gcond,
            camera_center=camera.camera_center,
            frame_encoding=frame_enc,
            camera_encoding=camera_enc,
            pred_ao=pred_ao,
            silhouette_color=g.silhouette_color,
            node_scale=g.node_scale,
            scale_bary=_cfg(cfg, "scale_bary", 0.25),
            tet_offset_pre_lbs=_cfg(cfg, "tet_offset_pre_lbs", True),
            use_shs=_cfg(cfg, "use_shs", False),
            use_pose=_cfg(cfg, "use_pose", True),
            use_view_enc=_cfg(cfg, "use_view_enc", True),
        )
        pkg["__name__"] = g.name
        pkgs.append(pkg)

    merged = _merge(pkgs)
    merged["frame_encoding"] = (
        frame_enc if frame_enc is not None else jnp.zeros((1,))
    )
    merged["optimizable_poses"] = opt_poses

    if "camera_calib" in params and merged["rgb"] is not None:
        merged["rgb"] = apply_camera_calibration(
            params["camera_calib"], merged["rgb"], batch["camera_idx"],
            identity_idx=_cfg(cfg, "identity_camera_idx", 0),
            training=training,
        )
    return merged
