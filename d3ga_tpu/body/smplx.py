"""SMPL-X-family LBS in JAX.

Replaces `tetra_sampler.body_model.SMPLlayer` (consumed at
`/root/reference/lib/smplman.py:68-74,181`): shape/expression blend
shapes, pose-dependent corrective blend shapes, FK over the kinematic
tree (lax.scan), and linear blend skinning. Global orientation/translation
(Rh/Th) are intentionally NOT applied to the body — the reference folds
them into the camera transform instead (`lib/smplman.py:177-179,201-217`)
and this framework keeps that design (the body stays canonical-centric,
cameras move).

Pose layout (ActorsHQ conditioning, `models/mlp.py:26`): poses[:66] are
root+21 body joints axis-angle, then 12 hand PCA coefficients (6 per
hand), then 9 jaw/leye/reye axis-angle = 87 dims.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.ops.quaternion import axis_angle_to_matrix


class SmplxModel(NamedTuple):
    v_template: jnp.ndarray     # [V, 3]
    shapedirs: jnp.ndarray      # [V, 3, S] shape (+expression) dirs
    posedirs: jnp.ndarray       # [V, 3, 9*(J-1)] pose blend dirs (or zeros)
    j_regressor: jnp.ndarray    # [J, V]
    parents: jnp.ndarray        # [J] int32, parents[0] == -1
    weights: jnp.ndarray        # [V, J] skinning weights
    hand_components_l: Optional[jnp.ndarray] = None  # [6, 45] PCA basis
    hand_components_r: Optional[jnp.ndarray] = None  # [6, 45]
    hand_mean_l: Optional[jnp.ndarray] = None        # [45]
    hand_mean_r: Optional[jnp.ndarray] = None        # [45]
    faces: Optional[jnp.ndarray] = None              # [F, 3] int32

    @property
    def num_joints(self):
        return self.j_regressor.shape[0]

    @property
    def num_verts(self):
        return self.v_template.shape[0]


def full_pose_from_params(model: SmplxModel, poses: jnp.ndarray) -> jnp.ndarray:
    """poses: [B, 87] (body 66 + hand-PCA 12 + face 9) -> [B, J*3]
    axis-angle for every joint. If the model has no hand PCA, hand dims
    are used as-is (truncated/padded to the joint count)."""
    B = poses.shape[0]
    J = model.num_joints
    body = poses[:, :66]
    if poses.shape[1] >= 87 and model.hand_components_l is not None:
        lh = poses[:, 66:72] @ model.hand_components_l + model.hand_mean_l
        rh = poses[:, 72:78] @ model.hand_components_r + model.hand_mean_r
        face = poses[:, 78:87]
        full = jnp.concatenate([body, face, lh, rh], axis=-1)
    else:
        full = poses
    need = J * 3
    if full.shape[1] < need:
        full = jnp.pad(full, ((0, 0), (0, need - full.shape[1])))
    return full[:, :need]


def smplx_lbs(
    model: SmplxModel,
    poses: jnp.ndarray,
    shapes: jnp.ndarray,
    expression: Optional[jnp.ndarray] = None,
    v_template: Optional[jnp.ndarray] = None,
    pose_blend: bool = True,
    return_transforms: bool = False,
):
    """poses: [B, 87 or J*3]; shapes: [B, S1]; returns verts [B, V, 3]
    (root-relative: no global Rh/Th — see module docstring).

    With return_transforms, also returns per-joint world transforms
    A [B, J, 4, 4] and per-vertex blended transforms T [B, V, 4, 4].
    """
    B = poses.shape[0]
    J = model.num_joints
    vt = model.v_template if v_template is None else v_template

    betas = shapes
    if expression is not None:
        betas = jnp.concatenate([shapes, expression], axis=-1)
    n_b = min(betas.shape[-1], model.shapedirs.shape[-1])
    v_shaped = vt[None] + jnp.einsum(
        "bs,vcs->bvc", betas[:, :n_b], model.shapedirs[..., :n_b]
    )

    joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)  # [B, J, 3]

    full = full_pose_from_params(model, poses).reshape(B, J, 3)
    rots = axis_angle_to_matrix(full)  # [B, J, 3, 3]

    if pose_blend and model.posedirs.shape[-1] > 0:
        eye = jnp.eye(3, dtype=rots.dtype)
        pose_feat = (rots[:, 1:] - eye).reshape(B, -1)  # [B, 9(J-1)]
        v_shaped = v_shaped + jnp.einsum("bp,vcp->bvc", pose_feat, model.posedirs)

    # FK over the kinematic tree with relative joint locations.
    rel_joints = joints.at[:, 1:].add(-joints[:, model.parents[1:]])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
        return jnp.concatenate([top, bot], axis=-2)

    local_tf = make_tf(rots, rel_joints)  # [B, J, 4, 4]

    parent_idx = jnp.where(model.parents < 0, J, model.parents)

    def step(world, inputs):
        j, pidx = inputs
        parent = world[:, pidx]  # [B, 4, 4]
        wj = parent @ local_tf[:, j]
        world = jax.lax.dynamic_update_slice(world, wj[:, None], (0, j, 0, 0))
        return world, None

    init = jnp.concatenate(
        [
            jnp.zeros((B, J, 4, 4), rots.dtype),
            jnp.broadcast_to(jnp.eye(4, dtype=rots.dtype), (B, 1, 4, 4)),
        ],
        axis=1,
    )
    world, _ = jax.lax.scan(step, init, (jnp.arange(J, dtype=jnp.int32), parent_idx))
    world = world[:, :J]  # [B, J, 4, 4]

    # Remove the rest-pose joint locations (relative transform A).
    jt = jnp.einsum("bjkl,bjl->bjk", world[..., :3, :3], joints)
    A = world.at[..., :3, 3].add(-jt)

    T = jnp.einsum("vj,bjkl->bvkl", model.weights, A)  # [B, V, 4, 4]
    vh = jnp.concatenate([v_shaped, jnp.ones_like(v_shaped[..., :1])], axis=-1)
    verts = jnp.einsum("bvkl,bvl->bvk", T, vh)[..., :3]

    if return_transforms:
        return verts, A, T
    return verts


def smplx_unpose(model, poses, shapes, verts_posed, expression=None):
    """Invert LBS: posed verts -> canonical (template-space) verts, used
    when unposing a cage built in a star pose
    (`/root/reference/lib/smplman.py:55-66`)."""
    _, _, T = smplx_lbs(
        model, poses, shapes, expression=expression, return_transforms=True
    )
    inv = jnp.linalg.inv(T)
    vh = jnp.concatenate([verts_posed, jnp.ones_like(verts_posed[..., :1])], axis=-1)
    return jnp.einsum("bvkl,bvl->bvk", inv, vh)[..., :3]
