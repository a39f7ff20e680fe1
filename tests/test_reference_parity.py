"""Numerical parity against the reference's own torch implementation.

Imports `/root/reference/lbsmodel` (runtime comparison only — nothing is
copied) and checks that the JAX momentum-LBS reproduces the torch
skeleton math bit-for-bit within float tolerance: Euler->quat
convention, sequential FK over the joint chain, and the bind-relative
skinning matrices. This is the strongest guard that the TPU rewrite
preserved the reference's quaternion-state semantics
(SURVEY.md "Hard parts": momentum FK must match exactly).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference module imports loguru, which is not installed here
if "loguru" not in sys.modules:
    fake = types.ModuleType("loguru")

    class _L:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    fake.logger = _L()
    sys.modules["loguru"] = fake

# APPEND (not insert-front): the reference root contains train.py /
# test.py / globus.py which would otherwise shadow the repo's top-level
# modules for every test collected after this one.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

from lbsmodel.body_model import solve_skeleton_state, states_to_matrix  # noqa: E402
from lbsmodel.quaternion import Quaternion  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from d3ga_tpu.body.lbs import (  # noqa: E402
    MomentumSkeleton,
    euler_xyz_to_quat,
    solve_skeleton_states,
    states_to_matrices,
)


def wxyz_to_xyzw(q):
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


class TestQuaternionParity:
    def test_euler_xyz(self):
        rng = np.random.RandomState(0)
        r = rng.randn(4, 7, 3).astype(np.float32)
        theirs = Quaternion.batchFromXYZ(torch.from_numpy(r)).numpy()  # xyzw
        ours = np.asarray(euler_xyz_to_quat(jnp.asarray(r)))  # wxyz
        np.testing.assert_allclose(wxyz_to_xyzw(ours), theirs, atol=1e-6)


def random_chain(rng, J):
    parents = np.concatenate([[-1], np.arange(J - 1)]).astype(np.int64)
    offsets = rng.randn(J, 3).astype(np.float32)
    pre = rng.randn(J, 4).astype(np.float32)
    pre /= np.linalg.norm(pre, axis=-1, keepdims=True)  # unit, xyzw for torch
    return parents, offsets, pre


class TestFKParity:
    @pytest.mark.parametrize("J", [2, 5, 11])
    def test_solve_skeleton_state(self, J):
        rng = np.random.RandomState(J)
        parents, offsets, pre_xyzw = random_chain(rng, J)
        params = rng.randn(3, 7 * J).astype(np.float32) * 0.5

        theirs = solve_skeleton_state(
            torch.from_numpy(params),
            torch.from_numpy(offsets),
            torch.from_numpy(pre_xyzw),
            torch.from_numpy(parents[:, None]),
        ).numpy()  # [B, J, 8] with q as xyzw

        pre_wxyz = np.concatenate([pre_xyzw[:, 3:], pre_xyzw[:, :3]], axis=-1)
        skel = MomentumSkeleton(
            joint_parents=jnp.asarray(parents, jnp.int32),
            joint_offset=jnp.asarray(offsets),
            joint_rotation=jnp.asarray(pre_wxyz),
            transform=jnp.eye(7 * J),
            transform_offsets=jnp.zeros(7 * J),
            skin_weights=jnp.zeros((1, 8)),
            skin_indices=jnp.zeros((1, 8), jnp.int32),
            bind_state=jnp.zeros((J, 8)),
            template_verts=jnp.zeros((1, 3)),
        )
        ours = np.asarray(solve_skeleton_states(skel, jnp.asarray(params)))

        np.testing.assert_allclose(ours[..., 0:3], theirs[..., 0:3], atol=2e-5)
        # quaternions may differ by sign
        q_ours = wxyz_to_xyzw(ours[..., 3:7])
        q_theirs = theirs[..., 3:7]
        sign = np.sign(np.sum(q_ours * q_theirs, axis=-1, keepdims=True))
        np.testing.assert_allclose(q_ours * sign, q_theirs, atol=2e-5)
        np.testing.assert_allclose(ours[..., 7], theirs[..., 7], atol=2e-5)

    def test_states_to_matrix(self):
        rng = np.random.RandomState(3)
        J = 6
        parents, offsets, pre_xyzw = random_chain(rng, J)
        bind_params = np.zeros((1, 7 * J), np.float32)
        pose_params = rng.randn(2, 7 * J).astype(np.float32) * 0.4

        bind_t = solve_skeleton_state(
            torch.from_numpy(bind_params), torch.from_numpy(offsets),
            torch.from_numpy(pre_xyzw), torch.from_numpy(parents[:, None]),
        )
        states_t = solve_skeleton_state(
            torch.from_numpy(pose_params), torch.from_numpy(offsets),
            torch.from_numpy(pre_xyzw), torch.from_numpy(parents[:, None]),
        )
        theirs = states_to_matrix(bind_t, states_t).numpy()  # [B, J, 3, 4]

        pre_wxyz = np.concatenate([pre_xyzw[:, 3:], pre_xyzw[:, :3]], axis=-1)
        skel = MomentumSkeleton(
            joint_parents=jnp.asarray(parents, jnp.int32),
            joint_offset=jnp.asarray(offsets),
            joint_rotation=jnp.asarray(pre_wxyz),
            transform=jnp.eye(7 * J),
            transform_offsets=jnp.zeros(7 * J),
            skin_weights=jnp.zeros((1, 8)),
            skin_indices=jnp.zeros((1, 8), jnp.int32),
            bind_state=jnp.zeros((J, 8)),
            template_verts=jnp.zeros((1, 3)),
        )
        bind_j = solve_skeleton_states(skel, jnp.asarray(bind_params))[0]
        states_j = solve_skeleton_states(skel, jnp.asarray(pose_params))
        ours = np.asarray(states_to_matrices(bind_j[None], states_j))

        np.testing.assert_allclose(ours, theirs, atol=5e-5)


def synthetic_model_json(rng, J=4, V=12):
    """Minimal momentum model json accepted by the reference's
    LinearBlendSkinning constructor."""
    bones = []
    for j in range(J):
        pre = rng.randn(4).astype(np.float32)
        pre /= np.linalg.norm(pre)
        bones.append({
            "Name": f"j{j}",
            "Parent": j - 1 if j > 0 else 2 * J + 10,  # root marker > nr_joints
            "PreRotation": pre.tolist(),               # xyzw
            "TranslationOffset": rng.randn(3).astype(np.float32).tolist(),
        })
    # skinning: each vertex weighted to <= 3 joints (flattened CSR)
    weights, indices, offsets = [], [], [0]
    for v in range(V):
        k = rng.randint(1, 4)
        js = rng.choice(J, size=k, replace=False)
        ws = rng.rand(k).astype(np.float32)
        ws /= ws.sum()
        for j, w in zip(js, ws):
            indices.append(int(j))
            weights.append(float(w))
        offsets.append(len(weights))
    rest = rng.randn(V, 3).astype(np.float32)
    model = {
        "Skeleton": {"Bones": bones},
        "SkinnedModel": {
            "RestPositions": rest.tolist(),
            "RestVertexNormals": rest.tolist(),
            "SkinningWeights": list(zip(indices, weights)),
            "SkinningOffsets": offsets,
            "Faces": {"Indices": [0, 1, 2], "TextureIndices": [0, 1, 2]},
            "TextureCoordinates": [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        },
    }
    lbs_cfg = {
        "channel_names": ["tx", "ty", "tz", "rx", "ry", "rz", "sc"],
        "transform_offsets": np.zeros((1, 7 * J), np.float32),
        "transform": np.eye(7 * J, dtype=np.float32),
        "limits": [],
        "nr_scaling_params": 0,
        "nr_position_params": 7 * J,
    }
    return model, lbs_cfg, rest


class TestSkinningParity:
    def test_full_forward_and_unpose(self):
        from lbsmodel.body_model import LinearBlendSkinning

        rng = np.random.RandomState(11)
        model, lbs_cfg, rest = synthetic_model_json(rng)
        ref = LinearBlendSkinning(model, lbs_cfg)

        J = len(model["Skeleton"]["Bones"])
        params = (rng.randn(2, 7 * J) * 0.4).astype(np.float32)
        theirs = ref(
            torch.from_numpy(params[:, : 7 * J]),
            torch.zeros(2, 0),
        ).numpy()

        # Build the equivalent MomentumSkeleton.
        parents = np.array(
            [b["Parent"] if b["Parent"] <= J else -1 for b in model["Skeleton"]["Bones"]],
            np.int32,
        )
        pre = np.array([b["PreRotation"] for b in model["Skeleton"]["Bones"]], np.float32)
        pre_wxyz = pre[:, [3, 0, 1, 2]]
        offs = np.array(
            [b["TranslationOffset"] for b in model["Skeleton"]["Bones"]], np.float32
        )
        sw = ref.skin_weights.numpy()
        si = ref.skin_indices.numpy().astype(np.int32)
        skel = MomentumSkeleton(
            joint_parents=jnp.asarray(parents),
            joint_offset=jnp.asarray(offs),
            joint_rotation=jnp.asarray(pre_wxyz),
            transform=jnp.eye(7 * J),
            transform_offsets=jnp.zeros(7 * J),
            skin_weights=jnp.asarray(sw),
            skin_indices=jnp.asarray(si),
            bind_state=jnp.zeros((J, 8)),
            template_verts=jnp.asarray(rest),
        )
        bind = solve_skeleton_states(skel, jnp.zeros((1, 7 * J)))[0]
        skel = skel._replace(bind_state=bind)

        from d3ga_tpu.body.lbs import skin_points, unskin_points

        ours = np.asarray(skin_points(skel, jnp.asarray(params)))
        np.testing.assert_allclose(ours, theirs, atol=5e-5)

        # unskinning round-trip parity
        theirs_un = ref.unpose(
            torch.from_numpy(params), torch.zeros(2, 0),
            torch.from_numpy(theirs),
        ).numpy()
        ours_un = np.asarray(
            unskin_points(skel, jnp.asarray(params), jnp.asarray(ours))
        )
        np.testing.assert_allclose(ours_un, theirs_un, atol=5e-5)
