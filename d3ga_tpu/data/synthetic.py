"""Synthetic scenes: tetrahedralized-cube cages, toy skeletons, and
checkerboard targets — used by tests, the compile-check entry points,
and the benchmark harness (no capture data required).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.body.lbs import MomentumSkeleton, skin_points, solve_skeleton_states
from d3ga_tpu.geometry.sampling import sample_initial_gaussians
from d3ga_tpu.model.avatar import AvatarModel, GarmentSpec
from d3ga_tpu.model.cage_model import CageGeometry, build_cage_geometry
from d3ga_tpu.raster.camera import focal2fov, make_camera

CUBE_TETS = np.array(
    [(1, 0, 3, 5), (2, 0, 3, 6), (4, 0, 5, 6), (7, 3, 5, 6), (0, 3, 5, 6)],
    dtype=np.int32,
)
CUBE_FACES = np.array(
    [
        [0, 1, 3], [0, 3, 2], [4, 6, 5], [5, 6, 7],
        [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
        [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7],
    ],
    dtype=np.int32,
)


def subdivided_cube(center, size=1.0, res: int = 1):
    """A res^3 grid of cubes, each split into 5 tets -> (verts, tets,
    surface faces). res=1 gives the plain 8-vertex cube."""
    c = np.asarray(center, np.float64)
    if res == 1:
        verts = np.array(
            [[(i & 1), (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.float64
        )
        verts = (verts - 0.5) * size + c
        return verts, CUBE_TETS.copy(), CUBE_FACES.copy()

    # grid of (res+1)^3 vertices
    lin = np.linspace(-0.5, 0.5, res + 1)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3) * size + c
    vid = lambda i, j, k: (i * (res + 1) + j) * (res + 1) + k

    tets = []
    for i in range(res):
        for j in range(res):
            for k in range(res):
                corner = [
                    vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
                    vid(i + 1, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
                    vid(i, j + 1, k + 1), vid(i + 1, j + 1, k + 1),
                ]
                # alternate parity to keep faces conforming (x-mirrored
                # split on odd cells, same construction as cage_gen)
                odd = (CUBE_TETS ^ 1)[:, [0, 1, 3, 2]]
                base = CUBE_TETS if (i + j + k) % 2 == 0 else odd
                for t in base:
                    tets.append([corner[x] for x in t])
    tets = np.asarray(tets, np.int32)

    faces = []
    for i in range(res):
        for j in range(res):
            faces += [
                [vid(0, i, j), vid(0, i + 1, j), vid(0, i, j + 1)],
                [vid(0, i + 1, j), vid(0, i + 1, j + 1), vid(0, i, j + 1)],
                [vid(res, i, j), vid(res, i, j + 1), vid(res, i + 1, j)],
                [vid(res, i + 1, j), vid(res, i, j + 1), vid(res, i + 1, j + 1)],
                [vid(i, 0, j), vid(i, 0, j + 1), vid(i + 1, 0, j)],
                [vid(i + 1, 0, j), vid(i, 0, j + 1), vid(i + 1, 0, j + 1)],
                [vid(i, res, j), vid(i + 1, res, j), vid(i, res, j + 1)],
                [vid(i + 1, res, j), vid(i + 1, res, j + 1), vid(i, res, j + 1)],
                [vid(i, j, 0), vid(i + 1, j, 0), vid(i, j + 1, 0)],
                [vid(i + 1, j, 0), vid(i + 1, j + 1, 0), vid(i, j + 1, 0)],
                [vid(i, j, res), vid(i, j + 1, res), vid(i + 1, j, res)],
                [vid(i + 1, j, res), vid(i, j + 1, res), vid(i + 1, j + 1, res)],
            ]
    return verts, tets, np.asarray(faces, np.int32)


def cube_cage_geometry(
    n_gaussians=64, seed=0, center=(0.0, 0.0, 5.0), size=1.0, res: int = 1
) -> CageGeometry:
    verts, tets, faces = subdivided_cube(center, size, res)
    c = np.asarray(center, np.float64)
    inner = (verts - c) * 0.92 + c
    samples = sample_initial_gaussians(inner, faces, n_gaussians, seed=seed)
    return build_cage_geometry(
        cage_points=verts.astype(np.float32),
        tetras=tets,
        triangles=faces,
        sample_points=samples["points"],
        sample_rotations=samples["rotations"],
    )


def toy_skeleton(n_joints=4, seed=0) -> MomentumSkeleton:
    """A chain skeleton with identity param transform (7 raw params per
    joint), bind state solved at zero pose."""
    J = n_joints
    rng = np.random.default_rng(seed)
    skel = MomentumSkeleton(
        joint_parents=jnp.asarray(
            np.concatenate([[-1], np.arange(J - 1)]), jnp.int32
        ),
        joint_offset=jnp.asarray(
            np.concatenate([[[0, 0, 0]], rng.normal(0, 0.2, (J - 1, 3))]).astype(
                np.float32
            )
        ),
        joint_rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (J, 1)),
        transform=jnp.eye(7 * J),
        transform_offsets=jnp.zeros(7 * J),
        skin_weights=jnp.zeros((1, 8)),
        skin_indices=jnp.zeros((1, 8), jnp.int32),
        bind_state=jnp.zeros((J, 8)),
        template_verts=jnp.zeros((1, 3)),
    )
    bind = solve_skeleton_states(skel, jnp.zeros((1, 7 * J)))[0]
    return skel._replace(bind_state=bind)


def skinned_cage_pose_fn(geometry: CageGeometry, skel: MomentumSkeleton, n_weights=8):
    """Bind the cage nodes to the skeleton with distance-based weights
    and return a pose_nodes(batch, delta) closure — the synthetic
    analogue of CageBlue's re-targeted LBS
    (`/root/reference/lib/cage_blueman.py:69-107`)."""
    import numpy as np

    from d3ga_tpu.body.lbs import states_to_matrices

    nodes = np.asarray(geometry.cage_points)
    # joint positions at bind
    joints = np.asarray(skel.bind_state[:, 0:3])
    d = np.linalg.norm(nodes[:, None] - joints[None], axis=-1) + 1e-4
    k = min(n_weights, joints.shape[0])
    idx = np.argsort(d, axis=1)[:, :k]
    w = 1.0 / np.take_along_axis(d, idx, axis=1) ** 2
    w = w / w.sum(axis=1, keepdims=True)
    pad = n_weights - k
    skin_w = np.pad(w, ((0, 0), (0, pad))).astype(np.float32)
    skin_i = np.pad(idx, ((0, 0), (0, pad))).astype(np.int32)
    skel_cage = skel._replace(
        skin_weights=jnp.asarray(skin_w),
        skin_indices=jnp.asarray(skin_i),
        template_verts=geometry.cage_points,
    )

    def pose_nodes(batch, delta=None):
        verts = skel_cage.template_verts
        if delta is not None:
            verts = verts + delta  # pre-LBS offset (tet_offset_pre_lbs)
        return skin_points(skel_cage, batch["lbs"][None], verts[None])[0]

    return pose_nodes


def build_synthetic_avatar(
    n_garments=2,
    n_gaussians=256,
    n_frames=8,
    n_cameras=4,
    n_joints=4,
    cage_res=1,
    seed=0,
    config_overrides=None,
):
    """A drivable synthetic multi-garment avatar: cube cages skinned by a
    toy chain skeleton. Returns (model, skeleton, lbs_dim)."""
    skel = toy_skeleton(n_joints, seed)
    colors = [(0.0, 0.0, 1.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.5, 0.5, 0.5)]
    names = ["body", "upper", "lower", "extra"]
    garments = []
    for i in range(n_garments):
        geom = cube_cage_geometry(
            n_gaussians=n_gaussians,
            seed=seed + i,
            center=(0.15 * i, 0.1 * i, 5.0 + 0.3 * i),
            size=1.0 + 0.2 * i,
            res=cage_res,
        )
        garments.append(
            GarmentSpec(
                name=names[i],
                geometry=geom,
                pose_nodes=skinned_cage_pose_fn(geom, skel),
                silhouette_color=colors[i],
                node_scale=0.07 if i == 0 else 0.2,
            )
        )
    lbs_dim = 7 * n_joints
    config = {
        "frame_embed_dim": 32,
        "use_color_calib": True,
        "use_blur": False,
        "n_color_features": 64,
    }
    config.update(config_overrides or {})
    model = AvatarModel(
        garments=tuple(garments),
        cond_dim=lbs_dim,  # synthetic: full pose vector conditions the MLPs
        n_frames=n_frames,
        n_cameras=n_cameras,
        config=config,
    )
    return model, skel, lbs_dim


def orbit_camera(angle, w, h, radius=5.0, focal=None, center=(0.0, 0.0, 5.0)):
    """Camera orbiting the synthetic scene center."""
    focal = focal or max(w, h)
    c = np.asarray(center)
    eye = c + radius * np.array([np.sin(angle), 0.0, -np.cos(angle)])
    fwd = c - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=1)  # camera-to-world
    T = -R.T @ eye
    return make_camera(R, T, focal2fov(focal, w), focal2fov(focal, h), w, h)


def checkerboard(h, w, cells=8):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = ((ys // (h // cells) + xs // (w // cells)) % 2).astype(np.float32)
    img = np.stack([board, 1.0 - board, 0.5 * np.ones_like(board)], axis=0)
    return jnp.asarray(img)


def synthetic_batch(camera, lbs_dim, h, w, frame_idx=0, camera_idx=0, key=None):
    key = key if key is not None else jax.random.PRNGKey(frame_idx)
    pose = jax.random.normal(key, (lbs_dim,)) * 0.1
    return {
        "camera": camera,
        "lbs": pose,
        "frame_idx": jnp.int32(frame_idx),
        "camera_idx": jnp.int32(camera_idx),
        "image": checkerboard(h, w),
        "alpha": jnp.ones((1, h, w)),
        "silhouette": jnp.ones((3, h, w)) * 0.5,
    }


def mesh_garment_from_cube(
    n_gaussians=64, seed=0, center=(0.0, 0.0, 5.0), size=1.0, res=2,
    skel: Optional[MomentumSkeleton] = None,
):
    """Synthetic mesh-primitive garment (`primitive_type: mesh`):
    Gaussians ride on the cube surface triangles with 3-vertex
    barycentrics (`models/mesh_net.py` analogue)."""
    from d3ga_tpu.geometry.sampling import sample_initial_gaussians
    from d3ga_tpu.model.mesh_model import MeshGeometry
    from d3ga_tpu.ops.quaternion import matrix_to_quat

    verts, _, faces = subdivided_cube(center, size, res)
    samples = sample_initial_gaussians(verts, faces, n_gaussians, seed=seed)
    geom = MeshGeometry(
        template_verts=jnp.asarray(verts, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        init_face_ids=jnp.asarray(samples["face_ids"], jnp.int32),
        init_barys=jnp.asarray(samples["tri_barys"], jnp.float32),
        init_points=jnp.asarray(samples["points"], jnp.float32),
        init_rotations=matrix_to_quat(jnp.asarray(samples["rotations"])),
    )
    skel = skel if skel is not None else toy_skeleton(3, seed)
    nodes = np.asarray(geom.template_verts)
    joints = np.asarray(skel.bind_state[:, 0:3])
    d = np.linalg.norm(nodes[:, None] - joints[None], axis=-1) + 1e-4
    k = min(8, joints.shape[0])
    idx = np.argsort(d, axis=1)[:, :k]
    w = 1.0 / np.take_along_axis(d, idx, axis=1) ** 2
    w = w / w.sum(axis=1, keepdims=True)
    skel_mesh = skel._replace(
        skin_weights=jnp.asarray(np.pad(w, ((0, 0), (0, 8 - k))).astype(np.float32)),
        skin_indices=jnp.asarray(np.pad(idx, ((0, 0), (0, 8 - k))).astype(np.int32)),
        template_verts=geom.template_verts,
    )

    def pose_verts(batch, delta=None):
        verts = skel_mesh.template_verts
        if delta is not None:
            verts = verts + delta
        return skin_points(skel_mesh, batch["lbs"][None], verts[None])[0]

    return geom, pose_verts, skel
