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

from d3ga_tpu.fields import apply_learnable_blur, blur_reg
from d3ga_tpu.dist.raster_shard import rasterize_collective
from d3ga_tpu.model.avatar import AvatarModel, avatar_forward
from d3ga_tpu.model.cage_model import CageGeometry
from d3ga_tpu.raster.camera import Camera
from d3ga_tpu.train.losses import l1_loss, ssim
from d3ga_tpu.train.step import LossWeights

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
):
    """Returns (step, shard_batch) where step(params, opt_state, batch,
    rng, iteration) runs one sharded forward/backward/update and
    shard_batch places a host batch onto the mesh.

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

    batch_spec = {
        "world_view": P("data"),
        "full_proj": P("data"),
        "camera_center": P("data"),
        "tanfovx": P("data"),
        "tanfovy": P("data"),
        "lbs": P("data"),
        "frame_idx": P("data"),
        "camera_idx": P("data"),
        "image": P("data"),
        "alpha": P("data"),
        "silhouette": P("data"),
        "boundary_fg": P("data"),  # optional; dropped if absent
    }

    def loss_fn(params, batch, rng, iteration):
        def sharded_loss(params, geoms_in, batch_l, rng_in):
            total = 0.0
            metrics = {}
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
                    "lbs": batch_l["lbs"][b],
                    "frame_idx": batch_l["frame_idx"][b],
                    "camera_idx": batch_l["camera_idx"][b],
                }
                pkg = avatar_forward(
                    params, model, frame, training=True, geom_override=geoms_in
                )
                frame_rng = jax.random.fold_in(rng_in, my_data * b_local + b)
                bg = jax.random.uniform(frame_rng, (3,))

                pred, overflow = rasterize_collective(
                    pkg["means3D"], cam, bg, axis="model", n_shards=m,
                    cov3d=pkg.get("cov3D_precomp"),
                    opacities=pkg["opacities"], colors=pkg["rgb"],
                    shs=pkg["shs"] if pkg.get("rgb") is None else None,
                    max_per_tile=max_per_tile,
                )
                sil_means = pkg["means3D"]
                sil_cov = pkg.get("cov3D_precomp")
                sil_opac = pkg["opacities"]
                if "position" in detach_silhouette:
                    sil_means = jax.lax.stop_gradient(sil_means)
                if "covariance" in detach_silhouette and sil_cov is not None:
                    sil_cov = jax.lax.stop_gradient(sil_cov)
                if "opacity" in detach_silhouette:
                    sil_opac = jax.lax.stop_gradient(sil_opac)
                pred_sil, _ = rasterize_collective(
                    sil_means, cam, jnp.zeros(3), axis="model", n_shards=m,
                    cov3d=sil_cov, opacities=sil_opac,
                    colors=pkg["silhouette_rgb"], max_per_tile=max_per_tile,
                )

                if "learnable_blur" in params:
                    pred = apply_learnable_blur(
                        params["learnable_blur"], pred, frame["camera_idx"]
                    )

                alpha = jnp.broadcast_to(batch_l["alpha"][b], batch_l["image"][b].shape)
                gt = batch_l["image"][b] * alpha + (1 - alpha) * bg[:, None, None]
                gt_sil = batch_l["silhouette"][b] * alpha
                if "boundary_fg" in batch_l:
                    bnd = 1.0 - batch_l["boundary_fg"][b]
                    gt = gt * bnd + (1.0 - bnd) * bg[:, None, None]
                    gt_sil = gt_sil * bnd

                color = (1 - lw.lambda_dssim) * l1_loss(pred, gt) + lw.lambda_dssim * (
                    1.0 - ssim(pred, gt)
                )
                frame_loss = (
                    color * lw.rgb_weight
                    + l1_loss(pred_sil, gt_sil) * lw.sil_weight
                    + jnp.mean(pkg["frame_encoding"] ** 2) * 0.001
                    + pkg["scale_energy"].mean() * 175.0
                    + (pkg["fm_energy"].mean() + 3.0) * lw.fme_weight
                )
                if "learnable_blur" in params:
                    frame_loss = frame_loss + jnp.mean(
                        jnp.abs(blur_reg(params["learnable_blur"], frame["camera_idx"]) - 1.0)
                    ) * lw.blur_weight
                total = total + frame_loss
            contrib = total / (batch_size * m)
            loss = jax.lax.psum(jax.lax.psum(contrib, "model"), "data")
            return loss

        return jax.shard_map(
            sharded_loss,
            mesh=mesh,
            in_specs=(
                param_specs(params),
                geometry_specs(geoms),
                {k: P("data") for k in batch},  # all batch leaves on "data"
                P(),
            ),
            out_specs=P(),
            check_vma=False,
        )(params, geoms, batch, rng)

    @partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, iteration):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng, iteration)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"total_loss": loss}

    def shard_batch(batch):
        return {
            k: jax.device_put(v, NamedSharding(mesh, batch_spec.get(k, P("data"))))
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
