"""Optimizer: Adam with per-parameter-group learning rates, global-norm
gradient clipping, and MultiStep LR decay.

Mirrors `/root/reference/models/trainer.py:60-65,186-192` +
`configs/goliath_axe184.yml:44-61`: clip_grad_norm(2.5) -> Adam with
per-group LRs -> MultiStepLR(milestones, gamma=0.33). Implemented as an
optax chain where the per-group LRs are a pytree of scalars matching the
parameter tree (built by `lr_tree_from_config`), so a single Adam state
serves every group.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def multistep_schedule(base: float, milestones: Sequence[int], gamma: float):
    """PyTorch MultiStepLR semantics: lr * gamma^(#milestones passed)."""
    ms = jnp.asarray(sorted(milestones))

    def sched(step):
        n = jnp.sum(step >= ms)
        return base * gamma**n

    return sched


def scale_by_lr_tree(lr_tree):
    """Multiply each update leaf by its group LR."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda g, lr: g * lr, updates, lr_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr_tree,
    milestones: Sequence[int] = (200_000, 350_000, 500_000),
    gamma: float = 0.33,
    clip_norm: float = 2.5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_accum: int = 1,
):
    """lr_tree: pytree of scalars congruent to the params tree.

    grad_accum > 1 averages gradients over k micro-steps before each
    optimizer update (optax.MultiSteps) — larger effective batches
    without the memory of rasterizing them together. Milestones are
    given in TRAINING-ITERATION units; MultiSteps advances the inner
    schedule once per k micro-steps, so they are rescaled here to keep
    the decay at the configured iteration."""
    if grad_accum > 1:
        milestones = [max(1, m // grad_accum) for m in milestones]
    sched = multistep_schedule(1.0, milestones, gamma)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        scale_by_lr_tree(lr_tree),
        optax.scale_by_schedule(lambda step: -sched(step)),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


DEFAULT_GARMENT_LRS = {
    # `models/cage_net.py:94-109` + config defaults
    "colors_feat": "feature_lr",
    "deformation_field": "deform_mlp_lr",
    "canonical_field": "canon_mlp_lr",
    "color_field": "color_mlp_lr",
    "opacities": "opacity_lr",
    "features_dc": "feature_lr",
    "features_rest": ("feature_lr", 1.0 / 20.0),
    "rotation": "rotation_lr",
    "scaling": "scaling_lr",
}

DEFAULT_TOP_LRS = {
    # `models/garment_net.py:113-144`
    "camera_calib": 1e-4,
    "learnable_blur": 1e-3,
    "pixel_cal": 5e-6,
    "bg_net": 0.01,  # `garment_net.py:136`
    "frame_embeddings": "lr",
    "camera_embeddings": "lr",
    "shadow_decoder": "lr",
    "face_decoder": "face_mlp_lr",
    "optimizable_rotations": 1e-3,
    "optimizable_translations": 1e-4,
    "optimizable_poses": 1e-3,
}

LR_DEFAULTS = {
    "lr": 1e-3,
    "deform_mlp_lr": 5e-4,
    "canon_mlp_lr": 5e-4,
    "color_mlp_lr": 5e-4,
    "face_mlp_lr": 5e-4,
    "feature_lr": 1e-3,
    "rotation_lr": 1e-3,
    "scaling_lr": 1e-3,
    "opacity_lr": 1e-3,
}


def _resolve(spec, config):
    if isinstance(spec, tuple):
        name, mult = spec
        return _resolve(name, config) * mult
    if isinstance(spec, str):
        return float(config.get(spec, LR_DEFAULTS.get(spec, 1e-3)))
    return float(spec)


def lr_tree_from_config(params, config=None, zero_frozen=()):
    """Build the per-leaf LR tree for an avatar parameter pytree.

    config: dict of lr overrides (e.g. the `train:` section). Per-cage
    overrides (`models/cage_net.py:88-92`) go in
    config["cages"][name][lr_key].
    """
    config = config or {}

    def garment_lr(cage_name, key):
        spec = DEFAULT_GARMENT_LRS.get(key, "lr")
        cage_cfg = config.get("cages", {}).get(cage_name, {})
        base = spec[0] if isinstance(spec, tuple) else spec
        if isinstance(base, str) and base in cage_cfg:
            v = float(cage_cfg[base])
            return v * (spec[1] if isinstance(spec, tuple) else 1.0)
        return _resolve(spec, config)

    tree = {}
    for top, sub in params.items():
        if top == "garments":
            tree[top] = {
                name: {
                    k: jax.tree.map(lambda _: garment_lr(name, k), v)
                    for k, v in g.items()
                }
                for name, g in sub.items()
            }
        else:
            lr = _resolve(DEFAULT_TOP_LRS.get(top, "lr"), config)
            tree[top] = jax.tree.map(lambda _: lr, sub)
    for path in zero_frozen:
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jax.tree.map(lambda _: 0.0, node[path[-1]])
    return tree
