"""Capture-data training assembly: dataset -> cages -> avatar -> frames.

The glue the reference spreads across `train.py:392-440` (loaders),
`lib/cage_blueman.py` / `lib/cage_smplman.py` (cage construction +
re-targeted LBS) and `lib/cage.py:85-129` (cage generation): given a
config pointing at a Goliath or ActorsHQ capture, build

  1. the body driver (GoliathBody momentum skeleton / SmplxBody),
  2. per-garment tet cages from the star-posed, label-filtered body
     surface (fully automatic lattice pipeline, cage_gen.generate_cage),
  3. cage LBS weights copied from the nearest body template vertex
     (`lib/cage_blueman.py:102-107`) with cage nodes unposed to the
     template space,
  4. CageGeometry buffers (surface-sampled Gaussians embedded in tets),
  5. the AvatarModel + a host-side frame iterator through the Batcher.

Artifacts (cage meshes, face_to_label, sampled init) are cached under
`config.assets/<capture_id>/` like the reference's `self.src` layout.
"""

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from d3ga_tpu.utils.log import logger


class _StrikeCounter:
    """Reference's empty-batch strike limit
    (`/root/reference/train.py:145-150`): 20 consecutive unloadable/
    empty samples means the data path is wrong, not unlucky."""

    def __init__(self, limit: int = 20):
        self.n = 0
        self.limit = limit

    def bad(self):
        self.n += 1
        if self.n > self.limit:
            raise RuntimeError(
                f"over {self.limit} consecutive unloadable/empty samples"
                " — check the capture paths in the config"
            )

    def good(self):
        self.n = 0


def _cache(path, builder):
    if os.path.exists(path):
        with np.load(path, allow_pickle=False) as z:
            return dict(z)
    out = builder()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    return out


def build_cage_for_garment(
    name,
    cage_cfg: Dict,
    star_verts: np.ndarray,
    body_faces: np.ndarray,
    face_to_label: np.ndarray,
    cache_dir: str,
    config: Dict,
):
    """Label-filter the star-posed surface, run the lattice cage
    pipeline, sample Gaussians, embed them (`lib/cage.py:85-129,
    262-337` equivalents)."""
    from d3ga_tpu.geometry.cage_gen import generate_cage
    from d3ga_tpu.geometry.sampling import sample_initial_gaussians
    from d3ga_tpu.model.cage_model import build_cage_geometry

    def build():
        label_id = cage_cfg.get("label_id", [-1])
        if label_id and label_id[0] != -1:
            mask = np.zeros(len(body_faces), bool)
            for lid in label_id:
                mask |= face_to_label == lid
            faces = body_faces[mask]
        else:
            faces = body_faces
        used = np.unique(faces)
        remap = np.zeros(star_verts.shape[0], np.int64)
        remap[used] = np.arange(len(used))
        sub_verts = star_verts[used]
        sub_faces = remap[faces]

        inflate = float(cage_cfg.get("inflate", 0.0))
        n_tets = int(cage_cfg.get("n_target_tris", 10_000))  # tets ~ tris budget
        cage_v, tets, cage_f = generate_cage(
            sub_verts, sub_faces, n_target_tets=n_tets, inflate=inflate
        )
        samples = sample_initial_gaussians(
            sub_verts.astype(np.float64),
            sub_faces,
            int(cage_cfg.get("n_gaussians", 10_000)),
            seed=int(config.get("train", {}).get("seed", 17)),
            inflate=inflate,
        )
        return {
            "cage_v": cage_v,
            "tets": tets,
            "cage_f": cage_f,
            "sample_points": samples["points"],
            "sample_rotations": samples["rotations"],
        }

    data = _cache(os.path.join(cache_dir, f"cage_{name}.npz"), build)
    geom = build_cage_geometry(
        cage_points=data["cage_v"],
        tetras=data["tets"],
        triangles=data["cage_f"],
        sample_points=data["sample_points"],
        sample_rotations=data["sample_rotations"],
    )
    return geom


def cage_skin_weights_from_body(
    cage_points: np.ndarray,
    body_star_verts: np.ndarray,
    skin_weights: np.ndarray,
    skin_indices: np.ndarray,
):
    """Nearest-body-vertex skin-weight transfer
    (`lib/cage_blueman.py:102-107`). Returns (weights, indices, nn_ids)."""
    try:
        from d3ga_tpu.native import knn_query_native

        nn = knn_query_native(body_star_verts, cage_points, 1)[:, 0]
    except Exception:
        from scipy.spatial import cKDTree

        nn = cKDTree(body_star_verts).query(cage_points)[1]
    return skin_weights[nn], skin_indices[nn], nn


def build_goliath_avatar(config: Dict):
    """Full Goliath assembly. Requires the capture + shared assets on
    disk (`config.data.root_path`, `config.data.shared_assets_path`)."""
    from d3ga_tpu.body.drivers import GoliathBody
    from d3ga_tpu.body.lbs import MomentumSkeleton, solve_skeleton_states
    from d3ga_tpu.data.goliath import GoliathDataset
    from d3ga_tpu.model.avatar import AvatarModel, GarmentSpec
    from d3ga_tpu.model.cage_model import SILHOUETTE_COLORS

    data_cfg = config["data"]
    ds = GoliathDataset(
        root_path=data_cfg["root_path"],
        shared_assets_path=data_cfg["shared_assets_path"],
        split="train",
        regex=config.get("camera_regex", "402"),
        use_geometry=data_cfg.get("use_geometry", False),
    )
    assets = ds.load_shared_assets()
    skeleton = momentum_skeleton_from_assets(assets, ds)
    body = GoliathBody(
        skeleton,
        scales=jnp.asarray(ds.load_skeleton_scales()),
        global_scaling=float(assets.get("global_scaling", 1.0)),
    )

    cache_dir = os.path.join(config.get("assets", "assets_cache"), config["capture_id"])
    star = np.asarray(body.get(body.star_pose()[None]))[0]
    body_faces = np.asarray(assets["topology"]["vi"]).reshape(-1, 3)

    face_to_label = load_or_build_face_labels(config, ds, body, body_faces, cache_dir)

    garments = []
    for name, cage_cfg in config.get("cages", {}).items():
        geom = build_cage_for_garment(
            name, cage_cfg, star, body_faces, face_to_label, cache_dir, config
        )
        w, idx, _ = cage_skin_weights_from_body(
            np.asarray(geom.cage_points), star,
            np.asarray(skeleton.skin_weights), np.asarray(skeleton.skin_indices),
        )
        cage_skel = skeleton._replace(
            skin_weights=jnp.asarray(w),
            skin_indices=jnp.asarray(idx),
            template_verts=geom.cage_points,
        )

        cage_body = body.with_skeleton(cage_skel)

        def pose_nodes(batch, delta=None, _body=cage_body):
            verts = _body.skeleton.template_verts
            if delta is not None:
                verts = verts + delta
            # unpose->pose composite handled by driver units
            return _body.get(
                batch["lbs"][None], template=verts * 1000.0
            )[0]

        garments.append(
            GarmentSpec(
                name=name,
                geometry=geom,
                pose_nodes=pose_nodes,
                silhouette_color=SILHOUETTE_COLORS.get(
                    cage_cfg.get("color", "gray"), (0.5, 0.5, 0.5)
                ),
                node_scale=float(cage_cfg.get("node_scale", 0.2)),
            )
        )

    avatar_cfg = avatar_config_from(config)
    if avatar_cfg.get("use_face_emb"):
        # n_valid_kpts sizes the face decoder input
        # (`garment_net.py:83-85`); the keypoint mask/mean/std live in
        # the shared assets.
        mask = np.asarray(
            assets.get("face_kpt_mask", np.ones(137, bool))
        ).astype(bool)
        avatar_cfg["n_valid_kpts"] = int(mask.sum())
    model = AvatarModel(
        garments=tuple(garments),
        cond_dim=98,
        n_frames=len(ds.get_frame_list()),
        n_cameras=len(ds.cameras),
        config=avatar_cfg,
    )
    return model, ds, body


def momentum_skeleton_from_assets(assets, ds) -> "MomentumSkeleton":
    """Assemble the MomentumSkeleton pytree from the shared-assets bundle
    (lbs_model_json + lbs_config_dict, `lbsmodel/body_model.py:49-131`)."""
    from d3ga_tpu.body.lbs import MomentumSkeleton, solve_skeleton_states

    model = assets["lbs_model_json"]
    cfg = assets["lbs_config_dict"]

    bones = model["Skeleton"]["Bones"]
    J = len(bones)
    parents = np.array(
        [b["Parent"] if b["Parent"] <= J else -1 for b in bones], np.int32
    )
    # momentum stores pre-rotations xyzw; convert to wxyz
    pre = np.array([b["PreRotation"] for b in bones], np.float32)
    pre_wxyz = pre[:, [3, 0, 1, 2]]
    offsets = np.array([b["TranslationOffset"] for b in bones], np.float32)

    skin = model["SkinnedModel"]
    weights_flat = np.array([e[1] for e in skin["SkinningWeights"]], np.float32)
    indices_flat = np.array([e[0] for e in skin["SkinningWeights"]], np.int64)
    off = np.array(skin["SkinningOffsets"], np.int64)
    V = len(off) - 1
    sw = np.zeros((V, 8), np.float32)
    si = np.zeros((V, 8), np.int32)
    for k in range(8):
        left = off[:-1] + k
        ok = left < off[1:]
        sw[ok, k] = weights_flat[left[ok]]
        si[ok, k] = indices_flat[left[ok]]

    skel = MomentumSkeleton(
        joint_parents=jnp.asarray(parents),
        joint_offset=jnp.asarray(offsets),
        joint_rotation=jnp.asarray(pre_wxyz),
        transform=jnp.asarray(np.asarray(cfg["transform"], np.float32)),
        transform_offsets=jnp.asarray(
            np.asarray(cfg["transform_offsets"], np.float32).reshape(-1)
        ),
        skin_weights=jnp.asarray(sw),
        skin_indices=jnp.asarray(si),
        bind_state=jnp.zeros((J, 8)),
        template_verts=jnp.asarray(
            np.asarray(assets.get("lbs_template_verts"), np.float32)
        ),
    )
    n_params = skel.transform.shape[1]
    bind = solve_skeleton_states(skel, jnp.zeros((1, n_params)))[0]
    return skel._replace(bind_state=bind)


def load_or_build_face_labels(config, ds, body, body_faces, cache_dir):
    path = os.path.join(cache_dir, "face_to_label.npy")
    if os.path.exists(path):
        return np.load(path)
    from d3ga_tpu.data.batcher import Batcher
    from d3ga_tpu.data.segmentation import Segmenter

    seg = Segmenter(len(body_faces))
    batcher = Batcher(config, body_model=body)
    frames = ds.get_frame_list()
    rng = np.random.default_rng(0)
    picks = rng.choice(len(frames), size=min(64, len(frames)), replace=False)
    for i in picks:
        sample = ds.get(frames[i], ds.cameras[int(rng.integers(len(ds.cameras)))])
        if sample is None:
            continue
        frame = batcher.process_frame(
            sample["image"], sample["K"], sample["Rt"], sample["seg_part"][0],
            sample["lbs_motion"],
        )
        if frame is None:
            continue
        camera = batcher.make_camera(frame)
        verts = np.asarray(body.get(jnp.asarray(sample["lbs_motion"])[None]))[0]
        # the camera's canvas can exceed the image (off-center principal
        # point): place the label map on the canvas the render uses
        from d3ga_tpu.data.batcher import place_on_canvas

        seg_canvas = place_on_canvas(
            np.asarray(sample["seg_part"][0], np.float32)[None],
            frame["crop"], frame["width"], frame["height"],
        )[0].astype(np.int32)
        seg.add_frame(verts, body_faces, camera, seg_canvas)
    labels = seg.run(body_faces)
    os.makedirs(cache_dir, exist_ok=True)
    np.save(path, labels)
    return labels


def avatar_config_from(config: Dict) -> Dict:
    tcfg = config.get("train", {})
    return {
        "frame_embed_dim": config.get("frame_embedder", {}).get("n_dims", 32),
        "camera_embed_dim": config.get("camera_embedder", {}).get("n_dims", 0),
        "n_color_features": config.get("color_mlp", {}).get("n_features", 64),
        "use_color_calib": tcfg.get("use_color_calib", True),
        "use_blur": tcfg.get("use_blur", False),
        "use_pixel_cal": tcfg.get("use_pixel_cal", False),
        "use_shs": tcfg.get("use_shs", False),
        "use_ao": tcfg.get("use_ao", False),
        "max_sh_degree": tcfg.get("max_sh_degree", 3),
        "tet_offset_pre_lbs": tcfg.get("tet_offset_pre_lbs", True),
        "use_pose": config.get("color_mlp", {}).get("use_pose", True),
        "use_view_enc": config.get("color_mlp", {}).get("use_view_enc", True),
        "deform_mlp": config.get("deform_mlp"),
        "canon_mlp": config.get("canon_mlp"),
        "color_mlp": config.get("color_mlp"),
        "scale_bary": config.get("canon_mlp", {}).get("scale_bary", 0.25),
        "background": tcfg.get("background", "white"),
        "use_face_emb": tcfg.get("use_face_emb", False),
        "raster_backend": tcfg.get("raster_backend", "xla"),
        "raster_opts": tcfg.get("raster_opts", {}),
        "face_embed_dim": tcfg.get("face_embed_dim", 128),
        "use_opt_smplx": tcfg.get("use_opt_smplx", False),
        "mocap": config.get("dataset_name") != "thuman4",
    }


def load_smplx_model(npz_path: str):
    """Standard SMPL-X npz -> SmplxModel pytree (replaces
    tetra_sampler.body_model.SMPLlayer asset loading,
    `/root/reference/lib/smplman.py:67-74`)."""
    from d3ga_tpu.body.smplx import SmplxModel

    data = np.load(npz_path, allow_pickle=True)

    def get(k, default=None):
        return np.asarray(data[k]) if k in data else default

    parents = get("kintree_table")
    if parents is not None:
        parents = parents[0].astype(np.int64)
        parents[0] = -1
    weights = get("weights").astype(np.float32)
    posedirs = get("posedirs")
    if posedirs is not None and posedirs.ndim == 2:  # [V*3, P] variant
        posedirs = posedirs.T.reshape(-1, weights.shape[0], 3).transpose(1, 2, 0)
    jreg = get("J_regressor").astype(np.float32)
    hc_l = get("hands_componentsl")
    hc_r = get("hands_componentsr")
    return SmplxModel(
        v_template=jnp.asarray(get("v_template"), jnp.float32),
        shapedirs=jnp.asarray(get("shapedirs"), jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32)
        if posedirs is not None
        else jnp.zeros((weights.shape[0], 3, 0)),
        j_regressor=jnp.asarray(jreg),
        parents=jnp.asarray(parents, jnp.int32),
        weights=jnp.asarray(weights),
        hand_components_l=None if hc_l is None else jnp.asarray(hc_l[:6], jnp.float32),
        hand_components_r=None if hc_r is None else jnp.asarray(hc_r[:6], jnp.float32),
        hand_mean_l=None if "hands_meanl" not in data else jnp.asarray(data["hands_meanl"], jnp.float32),
        hand_mean_r=None if "hands_meanr" not in data else jnp.asarray(data["hands_meanr"], jnp.float32),
        faces=jnp.asarray(get("f"), jnp.int32) if "f" in data else None,
    )


def build_smplx_avatar(config: Dict, eval: bool = False):
    """ActorsHQ/SMPL-X assembly (`lib/smplman.py` + `lib/cage_smplman.py`
    equivalents): subdivided star-posed template -> label-filtered cages
    -> skin-weight transfer -> CageGeometry + pose closures."""
    from d3ga_tpu.body.drivers import SmplxBody
    from d3ga_tpu.body.smplx import smplx_lbs, smplx_unpose
    from d3ga_tpu.data.actorshq import ActorsHQDataset
    from d3ga_tpu.model.avatar import AvatarModel, GarmentSpec
    from d3ga_tpu.model.cage_model import SILHOUETTE_COLORS

    data_cfg = config["data"]
    ds = ActorsHQDataset(
        smplx_poses=data_cfg["smplx_poses"],
        image=data_cfg["image"],
        image_alpha=data_cfg["image_alpha"],
        image_part_mask=data_cfg["image_part_mask"],
        extrinsics=data_cfg["extrinsics"],
        intrinsics=data_cfg["intrinsics"],
        test_camera=[config["train"]["test_camera"]],
        eval=eval,
        n_testing_frames=data_cfg.get("n_testing_frames", 300),
    )
    smodel = load_smplx_model(data_cfg["smplx_model"])
    body = SmplxBody(smodel)

    star_pose = body.star_pose()
    star = np.asarray(
        smplx_lbs(smodel, star_pose, jnp.zeros((1, 10)))
    )[0]
    body_faces = np.asarray(smodel.faces)
    w_table = np.asarray(smodel.weights)

    cache_dir = os.path.join(config.get("assets", "assets_cache"), config["capture_id"])
    # ActorsHQ part labels are per-pixel (1..4); build per-face labels by
    # segmentation transfer over sampled frames (on the ORIGINAL mesh —
    # per-frame posed verts come from the unsubdivided template).
    face_to_label = build_face_labels_smplx(ds, body, star, body_faces, cache_dir)

    if data_cfg.get("densify_template", True):
        # 1x loop subdivision of the star-posed template with
        # skin-weight interpolation (`lib/smplman.py:50,88-95` +
        # `utils/mesh_utils.py:105-325`): doubles surface-sampling
        # density for Gaussian placement and smooths the cage source.
        from d3ga_tpu.geometry.subdivide import loop_subdivide

        star, body_faces, w_table = loop_subdivide(star, body_faces, w_table)
        face_to_label = np.repeat(face_to_label, 4)

    garments = []
    for name, cage_cfg in config.get("cages", {}).items():
        geom = build_cage_for_garment(
            name, cage_cfg, star, body_faces, face_to_label, cache_dir, config
        )
        try:
            from d3ga_tpu.native import knn_query_native

            nn = knn_query_native(star, np.asarray(geom.cage_points), 1)[:, 0]
        except Exception:
            from scipy.spatial import cKDTree

            nn = cKDTree(star).query(np.asarray(geom.cage_points))[1]
        cage_weights = w_table[nn]
        # Unpose cage nodes from star pose to template space
        # (`lib/cage_smplman.py:57-76`): invert the star-pose blended
        # transforms at the nearest (possibly subdivided) template
        # vertices — blend the joint transforms with the transferred
        # weights (equals per-vertex T on the original template).
        _, A, _ = smplx_lbs(
            smodel, star_pose, jnp.zeros((1, 10)), return_transforms=True
        )
        Tn = jnp.einsum(
            "vj,jkl->vkl", jnp.asarray(cage_weights, jnp.float32), A[0]
        )  # [Vc, 4, 4]
        hom = jnp.concatenate(
            [geom.cage_points, jnp.ones_like(geom.cage_points[:, :1])], -1
        )
        cage_canonical = jnp.einsum(
            "vkl,vl->vk", jnp.linalg.inv(Tn), hom
        )[:, :3]

        def pose_nodes(batch, delta=None, _w=jnp.asarray(cage_weights),
                       _canon=cage_canonical, _m=smodel):
            verts = _canon
            if delta is not None:
                verts = verts + delta
            poses = batch.get("smplx_poses", batch.get("lbs"))[None]
            _, A, _ = smplx_lbs(
                _m, poses, jnp.zeros((1, 10)), return_transforms=True
            )
            Tv = jnp.einsum("vj,bjkl->bvkl", _w, A)[0]
            hom = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
            return jnp.einsum("vkl,vl->vk", Tv, hom)[:, :3]

        garments.append(
            GarmentSpec(
                name=name,
                geometry=geom,
                pose_nodes=pose_nodes,
                silhouette_color=SILHOUETTE_COLORS.get(
                    cage_cfg.get("color", "gray"), (0.5, 0.5, 0.5)
                ),
                node_scale=float(cage_cfg.get("node_scale", 0.2)),
            )
        )

    model = AvatarModel(
        garments=tuple(garments),
        cond_dim=87,
        n_frames=len(ds),
        n_cameras=ds.n_cameras(),
        config=dict(avatar_config_from(config), is_smpl_body=True),
    )
    return model, ds, body


def build_face_labels_smplx(ds, body, star_verts, body_faces, cache_dir):
    path = os.path.join(cache_dir, "face_to_label.npy")
    if os.path.exists(path):
        return np.load(path)
    from d3ga_tpu.body.smplx import smplx_lbs
    from d3ga_tpu.data.segmentation import Segmenter
    from d3ga_tpu.raster.camera import make_camera
    from d3ga_tpu.data.batcher import crop_params_from_intrinsics, focal2fov

    seg = Segmenter(len(body_faces))
    rng = np.random.default_rng(0)
    picks = rng.choice(len(ds), size=min(48, len(ds)), replace=False)
    for i in picks:
        sample = ds[int(i)]
        if sample is None:
            continue
        poses = jnp.asarray(sample["lbs_motion"])[None]
        verts = np.asarray(smplx_lbs(body.model, poses, jnp.zeros((1, 10))))[0]
        c2w = np.asarray(
            body.transform_cameras(
                {k: sample["smplx"][k][None] for k in ("Rh", "Th")},
                _to44(sample["Rt"])[None],
            )
        )[0]
        w2c = np.linalg.inv(c2w)
        K = sample["K"]
        Hh, Ww = sample["image"].shape[1:]
        crop, w, h = crop_params_from_intrinsics(K, Ww, Hh)
        cam = make_camera(
            w2c[:3, :3].T, w2c[:3, 3],
            focal2fov(K[0, 0], w), focal2fov(K[1, 1], h), w, h,
        )
        from d3ga_tpu.data.batcher import place_on_canvas

        seg_canvas = place_on_canvas(
            np.asarray(sample["seg_part"][0], np.float32)[None], crop, w, h
        )[0].astype(np.int32)
        seg.add_frame(verts, body_faces, cam, seg_canvas)
    labels = seg.run(body_faces)
    os.makedirs(cache_dir, exist_ok=True)
    np.save(path, labels)
    return labels


def build_capture_training(config: Dict, eval: bool = False):
    """Returns (model, frame_iterator) for the train/test CLIs."""
    from d3ga_tpu.data.batcher import Batcher

    name = config["dataset_name"]
    if name == "goliath":
        model, ds, body = build_goliath_avatar(config)
    elif name == "actorshq":
        model, ds, body = build_smplx_avatar(config, eval=eval)
        if not eval:
            extras = {}
            if config.get("train", {}).get("use_opt_smplx", False) or \
                    model.config.get("use_opt_smplx", False):
                extras["smplx_init"] = smplx_init_tables(ds)
            # warmup split re-uses single frames for 100 steps during the
            # first 200k iterations (`train.py:118-133`,
            # `actorshq_dataset.py:219-226`); train.py alternates on the
            # returned (train, warmup, boundary) triple.
            ds.warmup = True
            warmup_gen = _actorshq_frame_iter(config, ds, body, model)
            import copy as _copy

            ds2 = _copy.copy(ds)
            ds2.warmup = False
            train_gen = _actorshq_frame_iter(config, ds2, body, model)
            return model, {"train": train_gen, "warmup": warmup_gen,
                           "warmup_steps": 200_000, **extras}
        return model, _actorshq_frame_iter(config, ds, body, model)
    else:
        raise ValueError(f"unknown dataset {name!r}")

    batcher = Batcher(config, body_model=body)

    # registration-geometry map path (`lib/batch.py:146,246-260`)
    geom_faces = None
    if getattr(ds, "use_geometry", False):
        geom_faces = np.asarray(
            ds.load_shared_assets()["topology"]["vi"]
        ).reshape(-1, 3)

    use_face = model.config.get("use_face_emb", False)
    if use_face:
        assets = ds.load_shared_assets()
        kpt_mask = np.asarray(
            assets.get("face_kpt_mask", np.ones(137, bool))
        ).astype(bool)
        kpt_mean = np.asarray(
            assets.get("face_kpt_mean", np.zeros((int(kpt_mask.sum()), 3))),
            np.float32,
        )
        kpt_std = np.asarray(
            assets.get("face_kpt_std", np.ones((int(kpt_mask.sum()), 3))),
            np.float32,
        )
        nose_vertex = int(config.get("data", {}).get("nose_vertex", 81545))

    def canonical_face_kpt(lbs, face_kpt):
        """face_kpt [Nk, 4] -> normalized canonical keypoints for the
        face decoder (`garment_net.py:180-194` + `blueman.py:123-139`)."""
        kpt = jnp.asarray(face_kpt[:, :3], jnp.float32)
        canon, _, _ = body.canonical_kpt(
            jnp.asarray(lbs)[None], kpt[None], nose_vertex=nose_vertex
        )
        k = np.asarray(canon)[0][kpt_mask[: len(face_kpt)]]
        return jnp.asarray((k - kpt_mean[: len(k)]) / kpt_std[: len(k)])

    def frame_iter():
        import jax

        from d3ga_tpu.data.batcher import pad_frame_to, static_canvas

        frames = ds.get_frame_list()
        rng = np.random.default_rng(42)
        strikes = _StrikeCounter()
        canvas = None  # (rw, rh): computed from the first good image
        while True:
            fi = int(rng.integers(len(frames)))
            ci = int(rng.integers(len(ds.cameras)))
            sample = ds.get(frames[fi], ds.cameras[ci])
            if sample is None:
                strikes.bad()
                continue
            frame = batcher.process_frame(
                sample["image"], sample["K"], sample["Rt"],
                sample["seg_part"][0].astype(np.int32),
                sample["lbs_motion"],
                frame_id=fi,
                camera_id=sample["camera_id"],
                order_cam_idx=ci,
                seg_fg=sample.get("seg_fg", [None])[0],
                boundary_fg=sample.get("boundary_fg"),
                face_kpt=sample.get("face_kpt"),
                geom=sample.get("geom"),
                geom_faces=geom_faces,
            )
            if frame is None:
                strikes.bad()
                continue
            strikes.good()
            if canvas is None:
                # ONE static canvas for the capture (all images share a
                # resolution; per-camera principal points vary): max
                # over every camera's crop geometry
                H_img, W_img = sample["image"].shape[-2:]
                canvas = static_canvas(
                    (ds.get_camera_parameters(c)["K"] for c in ds.cameras),
                    W_img, H_img,
                )
            frame = pad_frame_to(frame, *canvas)
            camera = batcher.make_camera(frame)
            out = {
                "camera": camera,
                "lbs": jnp.asarray(frame["lbs"]),
                "frame_idx": jnp.int32(fi),
                "camera_idx": jnp.int32(ci),
                "image": jnp.asarray(frame["image"]),
                "alpha": jnp.asarray(frame["alpha"]),
                "silhouette": jnp.asarray(frame["silhouette"]),
                "pixel_valid": jnp.asarray(frame["pixel_valid"]),
                "crop": frame["crop"],
            }
            if use_face and "face_kpt" in frame:
                out["face_kpt_canonical"] = canonical_face_kpt(
                    frame["lbs"], frame["face_kpt"]
                )
            for k in ("position_map", "normal_map", "depth_map", "mask_map"):
                if k in frame:
                    out[k] = jnp.asarray(frame[k])
            yield out

    return model, frame_iter()


def smplx_init_tables(ds):
    """Per-frame dataset SMPL-X init values for the optimizable
    parameters (`/root/reference/models/garment_net.py:87-107`
    `prepare_opt_tensors`): poses [F, 87], rh [F, 3], th [F, 3] indexed
    by the dataset's frame_id (= position in frame_list)."""
    poses, rh, th = [], [], []
    for seq, frame in ds.frame_list:
        s = ds.smplx[seq][int(frame)]
        poses.append(np.asarray(s["poses"][:87], np.float32))
        rh.append(np.asarray(s["Rh"], np.float32).reshape(3))
        th.append(np.asarray(s["Th"], np.float32).reshape(3))
    return {
        "poses": np.stack(poses),
        "rh": np.stack(rh),
        "th": np.stack(th),
    }


def _actorshq_frame_iter(config, ds, body, model):
    """Host-side ActorsHQ frame iterator through the Batcher."""
    from d3ga_tpu.data.batcher import Batcher

    batcher = Batcher(config, body_model=None)

    def gen():
        import jax

        from d3ga_tpu.data.batcher import pad_frame_to, static_canvas

        rng = np.random.default_rng(42)
        strikes = _StrikeCounter()
        canvas = None
        while True:
            idx = int(rng.integers(len(ds)))
            sample = ds[idx]
            if sample is None:
                strikes.bad()
                continue
            # camera into body frame via Rh/Th (`smplman.py:201-217`)
            c2w = np.asarray(
                body.transform_cameras(
                    {k: sample["smplx"][k][None] for k in ("Rh", "Th")},
                    _to44(sample["Rt"])[None],
                )
            )[0]
            frame = batcher.process_frame(
                sample["image"], sample["K"], np.linalg.inv(c2w)[:3],
                sample["seg_part"][0].astype(np.int32),
                sample["lbs_motion"],
                frame_id=sample["frame_id"],
                camera_id=sample["camera_id"],
                order_cam_idx=sample["order_cam_idx"],
                seg_fg=sample["seg_fg"][0],
                boundary_fg=sample["boundary_fg"],
            )
            if frame is None:
                strikes.bad()
                continue
            strikes.good()
            if canvas is None:
                H_img, W_img = sample["image"].shape[-2:]
                canvas = static_canvas(
                    (c["K"] for c in ds.cameras.values()), W_img, H_img
                )
            frame = pad_frame_to(frame, *canvas)
            camera = batcher.make_camera(frame)
            yield {
                "camera": camera,
                "lbs": jnp.asarray(frame["lbs"]),
                "smplx_poses": jnp.asarray(sample["smplx"]["poses"][:87]),
                # raw capture extrinsics: lets resolve_camera rebuild the
                # camera in-graph from optimizable Rh/Th
                "cam_rt": jnp.asarray(_to44(sample["Rt"]), jnp.float32),
                "frame_idx": jnp.int32(sample["frame_id"]),
                "camera_idx": jnp.int32(sample["order_cam_idx"]),
                "image": jnp.asarray(frame["image"]),
                "alpha": jnp.asarray(frame["alpha"]),
                "silhouette": jnp.asarray(frame["silhouette"]),
                "boundary_fg": jnp.asarray(frame["boundary_fg"]),
                "pixel_valid": jnp.asarray(frame["pixel_valid"]),
                "crop": frame["crop"],
            }

    return gen()


def _to44(Rt):
    Rt = np.asarray(Rt, np.float64)
    if Rt.shape[-2] == 4:
        return Rt
    M = np.eye(4)
    M[:3] = Rt
    return M
