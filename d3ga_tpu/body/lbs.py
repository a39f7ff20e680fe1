"""Momentum-style skeleton LBS in JAX (the Goliath "blueman" driver).

Re-designs `/root/reference/lbsmodel/body_model.py` TPU-first:

  * the sequential per-joint Python FK loop (`solve_skeleton_state`,
    body_model.py:311-347) becomes a `lax.scan` over the topologically-
    sorted joint chain, preserving the quaternion state semantics
    exactly (state = [t(3), q(4), s(1)], local scale 2^s, pre-rotation
    composed with XYZ-Euler rotation);
  * 8-wide skinning gathers + weighted blend are dense einsums;
  * quaternions are scalar-first internally (the reference is xyzw;
    formulas converted, not the storage).

The parameter transform (sparse [7J, P] matrix mapping pose params to
per-joint channels (tx,ty,tz,rx,ry,rz,sc)) is kept as a dense matmul —
it is tiny and MXU-friendly.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3ga_tpu.ops.quaternion import quat_multiply, quat_rotate


class MomentumSkeleton(NamedTuple):
    """Static skeleton description (host-built once, then device arrays)."""

    joint_parents: jnp.ndarray    # [J] int32, -1 for root; parents precede children
    joint_offset: jnp.ndarray     # [J, 3] translation offsets
    joint_rotation: jnp.ndarray   # [J, 4] pre-rotation quats (w,x,y,z)
    transform: jnp.ndarray        # [7J, P] param transform matrix
    transform_offsets: jnp.ndarray  # [7J]
    skin_weights: jnp.ndarray     # [V, 8]
    skin_indices: jnp.ndarray     # [V, 8] int32
    bind_state: jnp.ndarray       # [J, 8] solved at zero pose
    template_verts: jnp.ndarray   # [V, 3]


def euler_xyz_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Momentum's XYZ-Euler -> quaternion (w,x,y,z).

    Exact port of `Quaternion.batchFromXYZ`
    (`/root/reference/lbsmodel/quaternion.py:268-300`, xyzw there),
    including its negated-x half-angle convention.
    """
    half = 0.5 * r
    c1, c2, c3 = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    s1, s2, s3 = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            c1 * c2 * c3 + s1 * s2 * s3,
            s1 * c2 * c3 - c1 * s2 * s3,
            c1 * s2 * c3 + s1 * c2 * s3,
            c1 * c2 * s3 - s1 * s2 * c3,
        ],
        axis=-1,
    )


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse (conjugate / |q|^2), w-first."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
    return conj / jnp.sum(q * q, axis=-1, keepdims=True)


def param_to_joint_channels(skel: MomentumSkeleton, params: jnp.ndarray) -> jnp.ndarray:
    """params: [B, P] -> [B, J, 7] per-joint (tx,ty,tz,rx,ry,rz,sc)."""
    out = params @ skel.transform.T + skel.transform_offsets
    return out.reshape(params.shape[0], -1, 7)


def solve_skeleton_states(skel: MomentumSkeleton, params: jnp.ndarray) -> jnp.ndarray:
    """FK: [B, P] raw params -> [B, J, 8] global states [t, q(wxyz), s].

    lax.scan over the joint chain (parents are guaranteed to precede
    children in momentum skeletons). Root joints (parent == -1) take
    their local state directly — handled branch-free by scanning against
    a virtual identity parent.
    """
    jp = param_to_joint_channels(skel, params)  # [B, J, 7]
    B, J, _ = jp.shape
    lt = jp[..., 0:3] + skel.joint_offset[None]
    lr = quat_multiply(
        jnp.broadcast_to(skel.joint_rotation[None], (B, J, 4)),
        euler_xyz_to_quat(jp[..., 3:6]),
    )
    ls = jnp.exp2(jp[..., 6])

    # Scan in joint order; carry is the states array filled so far.
    # parent == -1 maps to a virtual identity entry at index J.
    parent_idx = jnp.where(skel.joint_parents < 0, J, skel.joint_parents)
    identity = jnp.concatenate(
        [
            jnp.zeros((B, 1, 3), jp.dtype),
            jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], jp.dtype), (B, 1, 4)),
            jnp.ones((B, 1, 1), jp.dtype),
        ],
        axis=-1,
    )

    def step(states, inputs):
        j, pidx = inputs
        parent = states[:, pidx]  # [B, 8]
        pq, pt, ps = parent[:, 3:7], parent[:, 0:3], parent[:, 7:8]
        gq = quat_multiply(pq, lr[:, j])
        gt = quat_rotate(pq, lt[:, j] * ps) + pt
        gs = ps * ls[:, j, None]
        state_j = jnp.concatenate([gt, gq, gs], axis=-1)
        states = jax.lax.dynamic_update_slice(states, state_j[:, None], (0, j, 0))
        return states, None

    init = jnp.concatenate([jnp.zeros((B, J, 8), jp.dtype), identity], axis=1)
    states, _ = jax.lax.scan(
        step, init, (jnp.arange(J, dtype=jnp.int32), parent_idx)
    )
    return states[:, :J]


def states_to_matrices(bind_state: jnp.ndarray, states: jnp.ndarray) -> jnp.ndarray:
    """Compose target states with the inverse bind state -> [B, J, 3, 4]
    matrices [R*s | t] (`/root/reference/lbsmodel/body_model.py:350-387`)."""
    bq = bind_state[..., 3:7]
    bt = bind_state[..., 0:3]
    bs = bind_state[..., 7:8]
    br = quat_inverse(bq)
    bsi = 1.0 / bs
    bti = quat_rotate(br, -bt) * bsi

    tq = states[..., 3:7]
    tt = states[..., 0:3]
    ts = states[..., 7:8]
    rq = quat_multiply(tq, jnp.broadcast_to(br, tq.shape))
    rs = ts * bsi
    rt = quat_rotate(tq, jnp.broadcast_to(bti, tt.shape) * ts) + tt

    from d3ga_tpu.ops.quaternion import quat_to_matrix

    R = quat_to_matrix(rq) * rs[..., None]
    return jnp.concatenate([R, rt[..., None]], axis=-1)  # [B, J, 3, 4]


def skin_points(
    skel: MomentumSkeleton,
    params: jnp.ndarray,
    verts: Optional[jnp.ndarray] = None,
    return_states: bool = False,
):
    """Pose vertices: [B, P] params (+ optional [B, V, 3] unposed verts)
    -> [B, V, 3] (`LinearBlendSkinning.forward`/`skinning`)."""
    states = solve_skeleton_states(skel, params)
    mats = states_to_matrices(skel.bind_state[None], states)  # [B, J, 3, 4]
    if verts is None:
        verts = jnp.broadcast_to(
            skel.template_verts[None], (params.shape[0],) + skel.template_verts.shape
        )
    vmats = mats[:, skel.skin_indices]  # [B, V, 8, 3, 4]
    vh = jnp.concatenate([verts, jnp.ones_like(verts[..., :1])], axis=-1)  # [B,V,4]
    per_joint = jnp.einsum("bvkij,bvj->bvki", vmats, vh)  # [B, V, 8, 3]
    out = jnp.einsum("bvki,vk->bvi", per_joint, skel.skin_weights)
    if return_states:
        return out, states, mats
    return out


def unskin_points(skel: MomentumSkeleton, params: jnp.ndarray, verts: jnp.ndarray):
    """Inverse skinning: posed [B, V, 3] -> unposed [B, V, 3]
    (`LinearBlendSkinning.unskinning`, body_model.py:253-284)."""
    states = solve_skeleton_states(skel, params)
    mats = states_to_matrices(skel.bind_state[None], states)
    vmats = mats[:, skel.skin_indices]  # [B, V, 8, 3, 4]
    blended = jnp.einsum("bvkij,vk->bvij", vmats, skel.skin_weights)  # [B,V,3,4]
    bottom = jnp.zeros_like(blended[:, :, :1, :]).at[..., 0, 3].set(1.0)
    m44 = jnp.concatenate([blended, bottom], axis=2)
    inv = jnp.linalg.inv(m44)
    vh = jnp.concatenate([verts, jnp.ones_like(verts[..., :1])], axis=-1)
    return jnp.einsum("bvij,bvj->bvi", inv, vh)[..., :3]


def root_transform(skel: MomentumSkeleton, params: jnp.ndarray, root_joint: int = 1):
    """Rigid transform of the (body) root joint: returns (R [B,3,3],
    t [B,3]) from the composed matrices
    (`LinearBlendSkinning.compute_root_rigid_transform`,
    body_model.py:176-191; joint index 1 is the body root)."""
    states = solve_skeleton_states(skel, params)
    mats = states_to_matrices(skel.bind_state[None], states)
    return mats[:, root_joint, :, :3], mats[:, root_joint, :, 3]


def per_vertex_transforms(skel: MomentumSkeleton, params: jnp.ndarray):
    """Blended per-vertex [R|t]: returns (R [B,V,3,3], t [B,V,3]) — used
    for the head-space canonicalization of face keypoints
    (`/root/reference/lib/blueman.py:123-139`)."""
    states = solve_skeleton_states(skel, params)
    mats = states_to_matrices(skel.bind_state[None], states)
    vmats = mats[:, skel.skin_indices]
    blended = jnp.einsum("bvkij,vk->bvij", vmats, skel.skin_weights)
    return blended[..., :3], blended[..., 3]
