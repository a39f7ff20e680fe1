"""Body drivers: pose the body/cage and move cameras into the
body-centric frame.

TPU-native equivalents of `Blueman` (`/root/reference/lib/blueman.py`)
and `Smplman` (`/root/reference/lib/smplman.py`). Both follow the
reference's central design decision: the body stays root-centered at the
origin (global rotation/translation are NOT applied to geometry);
instead the *cameras* are transformed into the body frame
(`blueman.py:170-190`, `smplman.py:201-217`).

Units (Goliath): the momentum skeleton works in mm; geometry is
converted to meters (/1000) and recentered by a center-of-mass shift
computed once at the star pose. rot180 = Rz(180) Ry(180) = diag(1,-1,-1).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from d3ga_tpu.body.lbs import (
    MomentumSkeleton,
    root_transform,
    skin_points,
    unskin_points,
)
from d3ga_tpu.body.smplx import SmplxModel, smplx_lbs
from d3ga_tpu.ops.quaternion import axis_angle_to_matrix

ROT180 = np.diag([1.0, -1.0, -1.0])


def _homog(R, t):
    B = R.shape[0]
    M = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), (B, 4, 4))
    M = M.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return M


class GoliathBody:
    """Momentum-skeleton body ("blueman"). Star pose: r/l_upleg_ry -0.5,
    r/l_arm_ry 1.0 at param indices (41, 50, 20, 32)
    (`blueman.py:64-71`)."""

    STAR_POSE_IDX = {41: -0.5, 50: -0.5, 20: 1.0, 32: 1.0}

    def __init__(
        self,
        skeleton: MomentumSkeleton,
        scales: jnp.ndarray,
        global_scaling: float = 1.0,
        n_pose_params: int = 104,
        root_joint: int = 1,
    ):
        self.skeleton = skeleton
        self.scales = jnp.asarray(scales)
        self.global_scaling = float(global_scaling)
        self.n_pose = n_pose_params
        self.root_joint = root_joint
        self.rot180 = jnp.asarray(ROT180, jnp.float32)
        self.center_mass: Optional[jnp.ndarray] = None
        # initialize the center-of-mass shift at the star pose
        self.center_mass = jnp.zeros((1, 1, 3))
        star = self.get(self.star_pose()[None])
        self.center_mass = -jnp.mean(star, axis=1, keepdims=True)

    def star_pose(self) -> jnp.ndarray:
        pose = np.zeros(self.n_pose, np.float32)
        for i, v in self.STAR_POSE_IDX.items():
            pose[i] = v
        return jnp.asarray(pose)

    def _params(self, motion):
        """[B, n_pose] motion + skeleton scales -> raw param vector."""
        B = motion.shape[0]
        return jnp.concatenate(
            [motion, jnp.broadcast_to(self.scales[None], (B, self.scales.shape[0]))],
            axis=-1,
        )

    def skinning(self, motion, delta=None, template=None):
        """Pose the template (mm) with optional pre-LBS delta (meters,
        `blueman.py:101-116`). Returns (geom_mm, R_root, t_root)."""
        params = self._params(motion)
        verts = self.skeleton.template_verts if template is None else template
        if delta is not None:
            verts = (verts / 100.0 + delta) * 100.0
        B = motion.shape[0]
        geom = skin_points(
            self.skeleton, params, jnp.broadcast_to(verts[None], (B,) + verts.shape)
        ) * self.global_scaling
        R_root, t_root = root_transform(
            self.skeleton,
            jnp.concatenate([motion, jnp.zeros_like(self.scales)[None].repeat(B, 0)], -1),
            self.root_joint,
        )
        return geom, R_root, t_root

    def _root_rt(self, motion):
        _, R_root, t_root = self.skinning(motion)
        RT = _homog(R_root, t_root / 1000.0)
        return jnp.linalg.inv(RT @ jnp.broadcast_to(
            jnp.eye(4).at[:3, :3].set(self.rot180), (RT.shape[0], 4, 4)
        ))

    def get(self, motion, delta=None, template=None):
        """Posed geometry in the body-centric meter frame
        (`blueman.py:141-168`). motion: [B, n_pose] -> [B, V, 3]."""
        geom, R_root, t_root = self.skinning(motion, delta, template)
        RT = _homog(R_root, t_root / 1000.0)
        rot4 = jnp.eye(4).at[:3, :3].set(self.rot180)
        RT = jnp.linalg.inv(RT @ rot4[None])
        geom = geom / 1000.0
        geom = jnp.einsum("bij,bvj->bvi", RT[:, :3, :3], geom) + RT[:, None, :3, 3]
        return geom + self.center_mass

    def get_registration(self, motion, geometry_mm):
        """Registration (tracked) geometry [B, V, 3] in capture mm ->
        the body-centric meter frame: the `geometry=` path of
        `blueman.py:141-160` (skips skinning, applies only the
        root-relative re-centering)."""
        RT = self._root_rt(motion)
        geom = geometry_mm / 1000.0
        geom = jnp.einsum("bij,bvj->bvi", RT[:, :3, :3], geom) + RT[:, None, :3, 3]
        return geom + self.center_mass

    def to_body_model_space(self, motion, geom):
        """Body-centric meters -> LBS-unposed capture mm
        (`blueman.py:90-99`): undo center-of-mass + root transform,
        back to mm, then inverse-skin."""
        from d3ga_tpu.body.lbs import unskin_points

        RT = self._root_rt(motion)
        RTi = jnp.linalg.inv(RT)
        v = geom - self.center_mass
        v = jnp.einsum("bij,bvj->bvi", RTi[:, :3, :3], v) + RTi[:, None, :3, 3]
        v = v * 1000.0 / self.global_scaling
        params = self._params(motion)
        return unskin_points(self.skeleton, params, v)

    def from_body_model_to_canonical(self, geom_mm):
        """`blueman.py:117-120` (note the reference's own dm/m unit mix
        — /100 not /1000 — kept for parity)."""
        return geom_mm / 100.0 + self.center_mass

    def with_skeleton(self, skeleton: MomentumSkeleton) -> "GoliathBody":
        """Shallow copy driving a different skinned template (e.g. cage
        nodes with transferred weights, `lib/cage_blueman.py:102-116`)
        while keeping THIS body's center-of-mass shift and scaling —
        the cage must land in the same body-centric frame."""
        out = GoliathBody.__new__(GoliathBody)
        out.skeleton = skeleton
        out.scales = self.scales
        out.global_scaling = self.global_scaling
        out.n_pose = self.n_pose
        out.root_joint = self.root_joint
        out.rot180 = self.rot180
        out.center_mass = self.center_mass
        return out

    def canonical_kpt(self, motion, kpt, nose_vertex: int = 81545):
        """Face keypoints -> canonical head space via the inverse of the
        nose vertex's blended skinning transform
        (`blueman.py:123-139`). motion: [B, P]; kpt: [B, Nk, 3] (mm).
        Returns (canon_kpt [B, Nk, 3], head_t [B, 3], head_R [B, 3, 3])."""
        from d3ga_tpu.body.lbs import per_vertex_transforms

        params = self._params(motion)
        R_all, t_all = per_vertex_transforms(self.skeleton, params)
        rot = R_all[:, nose_vertex]          # [B, 3, 3]
        ht = t_all[:, nose_vertex]           # [B, 3]
        hr = jnp.linalg.inv(rot)
        canon = jnp.einsum(
            "bxy,bvy->bvx", hr, kpt / self.global_scaling - ht[:, None]
        )
        return canon, ht, rot

    def transform_cameras(self, motion, Rt):
        """World->capture-camera [B, 3or4, 4] (mm translations) ->
        camera-to-world in the body frame (`blueman.py:170-190`)."""
        motion = jnp.asarray(motion, jnp.float32)
        Rt = jnp.asarray(Rt, jnp.float32)
        _, R_root, t_root = self.skinning(motion)
        B = motion.shape[0]
        shift = self.center_mass[0].repeat(B, 0) if self.center_mass is not None else 0.0

        A = _homog(Rt[:, :3, :3], Rt[:, :3, 3] * 0.001)
        Bm = _homog(R_root, t_root * 0.001)
        w2c = A @ Bm
        rot4 = jnp.eye(4).at[:3, :3].set(self.rot180)
        w2c = w2c @ rot4[None]
        c2w = jnp.linalg.inv(w2c)
        c2w = c2w.at[:, :3, 3].add(shift.reshape(B, 3))
        return c2w


def smplx_camera_to_world(Rh, Th, w2c, mocap: bool = True):
    """Single-frame, fully traced version of
    `SmplxBody.transform_cameras` (`/root/reference/lib/smplman.py:201-217`):
    Rh [3] axis-angle, Th [3], w2c [3or4, 4] world->capture-camera.
    Returns camera-to-world [4, 4] in the body frame. Differentiable in
    Rh/Th so per-frame global-pose corrections receive gradients through
    the rasterizer (the reference computes this host-side detached)."""
    R = axis_angle_to_matrix(Rh[None])[0]
    A = jnp.eye(4, dtype=jnp.float32).at[:3, :4].set(w2c[:3, :4])
    B = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(Th)
    full = A @ B if mocap else A
    return jnp.linalg.inv(full)


class SmplxBody:
    """SMPL-X body driver (ActorsHQ/THuman). Star pose: hip axis-angle
    +-pi/6 at pose dims 5, 8 (`smplman.py:122-129`)."""

    def __init__(self, model: SmplxModel, mocap: bool = True):
        self.model = model
        self.mocap = mocap

    def star_pose(self, n_pose=87):
        poses = np.zeros((1, n_pose), np.float32)
        poses[:, 5] = np.pi / 6
        poses[:, 8] = -np.pi / 6
        return jnp.asarray(poses)

    def get(self, batch, delta=None, v_template=None):
        """batch: dict with poses [B, 87], shapes, expression; Rh/Th are
        ignored for geometry (cameras move instead). -> [B, V, 3]."""
        poses = batch["poses"]
        shapes = batch.get("shapes", jnp.zeros((poses.shape[0], 10)))
        expression = batch.get("expression")
        vt = v_template
        if delta is not None:
            vt = (self.model.v_template if vt is None else vt) + delta
        return smplx_lbs(self.model, poses, shapes, expression=expression, v_template=vt)

    def transform_cameras(self, smplx, w2c):
        """smplx: dict with Rh [B,3] axis-angle, Th [B,3]; w2c: [B,3or4,4]
        (`smplman.py:201-217`)."""
        Rh = axis_angle_to_matrix(jnp.asarray(smplx["Rh"], jnp.float32))
        Th = jnp.asarray(smplx["Th"], jnp.float32)
        w2c = jnp.asarray(w2c, jnp.float32)
        A = _homog(w2c[:, :3, :3], w2c[:, :3, 3])
        Bm = _homog(Rh, Th)
        full = A @ Bm if self.mocap else A
        return jnp.linalg.inv(full)
