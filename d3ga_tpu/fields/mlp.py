"""Pose-conditioned MLP field heads (pure-function pytrees).

Architecture and conditioning layouts replicate
`/root/reference/models/mlp.py`: LeakyReLU(0.1) MLPs, 128 wide, 3-4
hidden layers, kaiming fan-in init (a=0.1), output layer weights scaled
by 0.33 at init. Implemented as init/apply pairs over plain dicts so
optax/pjit treat them as ordinary pytrees; batched over Gaussians/nodes
with a single [P, D_in] x [D_in, W] matmul per layer (MXU).
"""

import math

import jax
import jax.numpy as jnp

from d3ga_tpu.ops.posenc import positional_encoding, posenc_dim
from d3ga_tpu.ops.sh import sh_encoding

LEAK = 0.1


def _kaiming(key, n_in, n_out, a=LEAK):
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(n_in)
    return jax.random.normal(key, (n_in, n_out)) * std


def init_mlp(key, n_in, n_hidden, n_layers, n_out, out_scale=0.33):
    """n_layers counts hidden->hidden layers, mirroring the reference
    (total hidden linear layers = n_layers + 1, then the output layer)."""
    keys = jax.random.split(key, n_layers + 2)
    ws = [_kaiming(keys[0], n_in, n_hidden)]
    bs = [jnp.zeros(n_hidden)]
    for i in range(n_layers):
        ws.append(_kaiming(keys[1 + i], n_hidden, n_hidden))
        bs.append(jnp.zeros(n_hidden))
    # Output layer: torch default init (uniform +-1/sqrt(fan_in)) * 0.33.
    bound = 1.0 / math.sqrt(n_hidden)
    w_out = (
        jax.random.uniform(keys[-1], (n_hidden, n_out), minval=-bound, maxval=bound)
        * out_scale
    )
    b_out = jax.random.uniform(
        jax.random.fold_in(keys[-1], 1), (n_out,), minval=-bound, maxval=bound
    )
    return {"w": ws, "b": bs, "w_out": w_out, "b_out": b_out}


def apply_mlp(params, x):
    h = x
    for w, b in zip(params["w"], params["b"]):
        h = jax.nn.leaky_relu(h @ w + b, LEAK)
    return h @ params["w_out"] + params["b_out"]


def _tile(cond, n):
    """Broadcast a [D] conditioning vector to [n, D]."""
    return jnp.broadcast_to(cond[None], (n, cond.shape[-1]))


# ----------------------------------------------------------------------------
# DeformationField: PE(canonical node) + pose -> tanh * node_scale offsets
# (`models/mlp.py:39-71`).


def init_deformation_field(key, cond_dim, n_hidden=128, n_layers=3):
    n_in = cond_dim + posenc_dim(3, 7)
    return init_mlp(key, n_in, n_hidden, n_layers, 3)


def deformation_field(params, canonical_nodes, pose, node_scale):
    P = canonical_nodes.shape[0]
    z = jnp.concatenate([_tile(pose, P), positional_encoding(canonical_nodes, 7)], -1)
    return jnp.tanh(apply_mlp(params, z)) * node_scale


# ----------------------------------------------------------------------------
# CanonicalField: pose + scales + barys + rots -> (d_bary, d_rot, d_scale)
# (`models/mlp.py:74-110`; the input concat order follows the reference
# call site `models/cage_net.py:199-204`, whose positional-argument swap
# makes the effective order [pose, scales(3), barys(4), rots(4)]).


def init_canonical_field(key, cond_dim, n_hidden=128, n_layers=3, bary_size=4):
    n_in = cond_dim + 4 + 3 + bary_size
    return init_mlp(key, n_in, n_hidden, n_layers, 4 + 3 + bary_size)


def canonical_field(params, rots, scales, barys, pose, scale_bary, bary_size=4):
    P = barys.shape[0]
    z = jnp.concatenate([_tile(pose, P), scales, barys, rots], -1)
    pred = apply_mlp(params, z)
    d_bary = jnp.tanh(pred[:, :bary_size]) * scale_bary
    d_rot = pred[:, bary_size : bary_size + 4]
    d_scale = pred[:, bary_size + 4 :]
    return d_bary, d_rot, d_scale


# ----------------------------------------------------------------------------
# ColorField: [viewdir SH-enc, pose, shadow, cam emb, frame emb, features]
# -> sigmoid RGB + sigmoid(0.1 + x) opacity (`models/mlp.py:152-232`).


def color_field_input_dim(
    n_features, cond_dim, use_pose=True, use_view_enc=True,
    frame_dim=0, camera_dim=0, shadow=False, use_only_rgb=False,
):
    if use_only_rgb:
        return n_features
    n = n_features + frame_dim + camera_dim + (1 if shadow else 0)
    if use_pose:
        n += cond_dim
    if use_view_enc:
        n += 19  # SH deg-4 basis (16) + identity (3), tcnn Composite
    return n


def init_color_field(key, n_in, n_hidden=128, n_layers=4):
    return init_mlp(key, n_in, n_hidden, n_layers, 4)


def color_field(
    params,
    features,
    pose=None,
    viewdirs=None,
    frame_encoding=None,
    camera_encoding=None,
    shadow=None,
    use_pose=True,
    use_view_enc=True,
    use_only_rgb=False,
):
    P = features.shape[0]
    z = features
    if not use_only_rgb:
        if frame_encoding is not None:
            z = jnp.concatenate([_tile(frame_encoding, P), z], -1)
        if camera_encoding is not None:
            z = jnp.concatenate([_tile(camera_encoding, P), z], -1)
        if shadow is not None:
            z = jnp.concatenate([shadow, z], -1)
        if use_pose:
            z = jnp.concatenate([_tile(pose, P), z], -1)
        if use_view_enc:
            z = jnp.concatenate([sh_encoding(viewdirs), z], -1)
    pred = apply_mlp(params, z)
    rgb = jax.nn.sigmoid(pred[:, 0:3])
    opacity = jax.nn.sigmoid(0.1 + pred[:, 3:4])
    return rgb, opacity


# ----------------------------------------------------------------------------
# FaceDecoder: flattened face keypoints -> face embedding
# (`models/mlp.py:235-261`).


def init_face_decoder(key, n_valid_kpts, n_hidden=128, n_layers=3, n_output=128):
    return init_mlp(key, n_valid_kpts * 3, n_hidden, n_layers, n_output)


def face_decoder(params, kpt):
    return apply_mlp(params, kpt.reshape(-1))


# ----------------------------------------------------------------------------
# ShadowDecoder: pose[6:] + PE(template verts) -> per-vertex AO in [0,1]
# (`models/mlp.py:264-297`).


def init_shadow_decoder(key, cond_dim=98, n_hidden=128, n_layers=3):
    return init_mlp(key, cond_dim + posenc_dim(3, 7), n_hidden, n_layers, 1)


def shadow_decoder(params, pose, embedded_template):
    P = embedded_template.shape[0]
    z = jnp.concatenate([_tile(pose[6:], P), embedded_template], -1)
    return jax.nn.sigmoid(apply_mlp(params, z))


def get_cond_size(config) -> int:
    """Pose-conditioning width (`models/mlp.py:23-36`): SMPL-X 87,
    SMPL 72, Goliath momentum 98 (104 pose dims minus 6 root)."""
    if config.get("is_smpl_body", False):
        return {"smplx": 66 + 12 + 9, "smpl": 72}[config.get("model_type", "smplx")]
    return 98
