"""Debug renderers: point-cloud and flat-shaded mesh views for progress
grids.

Replaces the pytorch3d-based side-car renderers
(`/root/reference/recorder/pc_renderer.py:22-67`,
`recorder/mesh_renderer.py:26-100`) with tiny pure-JAX z-buffer
rasterizers — good enough for the every-5k-iters progress images and the
Batcher's position/normal/depth/mask maps (`lib/batch.py:256`).
"""

import jax
import jax.numpy as jnp

from d3ga_tpu.raster.camera import Camera, ndc2pix


def _project(points, camera: Camera):
    n = points.shape[0]
    hom = jnp.concatenate([points, jnp.ones((n, 1), points.dtype)], -1)
    clip = hom @ camera.full_proj.T
    w = 1.0 / (clip[:, 3] + 1e-7)
    ndc = clip[:, :3] * w[:, None]
    px = ndc2pix(ndc[:, 0], camera.width)
    py = ndc2pix(ndc[:, 1], camera.height)
    view = hom @ camera.world_view.T
    return px, py, view[:, 2]


def render_points(
    points, camera: Camera, colors=None, point_size: int = 1, bg=1.0
):
    """Splat points with a z-buffer (scatter-min). -> [3, H, W]."""
    H, W = camera.height, camera.width
    px, py, z = _project(points, camera)
    valid = (z > 0.01) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    xi = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    flat = jnp.where(valid, yi * W + xi, H * W)

    zbuf = jnp.full((H * W + 1,), jnp.inf)
    zbuf = zbuf.at[flat].min(jnp.where(valid, z, jnp.inf))
    if colors is None:
        colors = jnp.full((points.shape[0], 3), 0.35)
    img = jnp.full((H * W + 1, 3), bg)
    # winner-takes-pixel: write where own z equals the buffer min
    win = valid & (z <= zbuf[flat] + 1e-9)
    img = img.at[jnp.where(win, flat, H * W)].set(colors)
    out = img[: H * W].reshape(H, W, 3)
    if point_size > 1:
        k = point_size
        out = -jax.lax.reduce_window(
            -out, -1e9, jax.lax.max, (k, k, 1), (1, 1, 1), "SAME"
        )
    return jnp.transpose(out, (2, 0, 1))


def render_mesh(
    verts, faces, camera: Camera, bg=1.0, light_dir=(0.2, 0.2, -1.0),
    samples_per_face: int = 8,
):
    """Flat-shaded mesh via per-face surface-point splatting with a
    z-buffer. Coarse but dependency-free; used only for debug grids."""
    f = faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    light = jnp.asarray(light_dir)
    light = light / jnp.linalg.norm(light)
    shade = jnp.clip(jnp.abs(n @ light), 0.15, 1.0)  # double-sided

    # deterministic barycentric samples per face
    import numpy as np

    rng = np.random.default_rng(0)
    w = rng.dirichlet(np.ones(3), samples_per_face).astype(np.float32)
    w = jnp.asarray(w)
    pts = (
        w[None, :, 0, None] * v0[:, None]
        + w[None, :, 1, None] * v1[:, None]
        + w[None, :, 2, None] * v2[:, None]
    ).reshape(-1, 3)
    cols = jnp.repeat(shade[:, None], samples_per_face, axis=0).reshape(-1, 1)
    cols = jnp.repeat(cols, 3, axis=-1)
    return render_points(pts, camera, colors=cols, point_size=2, bg=bg)


def vertex_normals(verts, faces):
    """Area-weighted vertex normals (pytorch3d `verts_normals_packed`
    semantics used by `recorder/mesh_renderer.py:74-76`)."""
    f = faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[f[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def geometry_maps(verts, faces, camera: Camera, samples_per_face: int = 8):
    """Position/normal/depth/mask maps of a posed mesh (Batcher geometry
    path, `/root/reference/recorder/mesh_renderer.py:69-100`): position
    is world-space, depth is view-space z, the normal is the face's
    summed vertex normals renormalized (the reference interpolates
    vertex normals with all-ones barycentrics), mask flags covered
    pixels. Returns ([3,H,W], [3,H,W], [1,H,W], [1,H,W])."""
    H, W = camera.height, camera.width
    f = faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    vn = vertex_normals(verts, faces)
    fnrm = vn[f[:, 0]] + vn[f[:, 1]] + vn[f[:, 2]]
    fnrm = fnrm / jnp.maximum(jnp.linalg.norm(fnrm, axis=-1, keepdims=True), 1e-12)
    import numpy as np

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.dirichlet(np.ones(3), samples_per_face).astype(np.float32))
    pts = (
        w[None, :, 0, None] * v0[:, None]
        + w[None, :, 1, None] * v1[:, None]
        + w[None, :, 2, None] * v2[:, None]
    ).reshape(-1, 3)
    nrm_s = jnp.repeat(fnrm[:, None], samples_per_face, axis=1).reshape(-1, 3)
    px, py, z = _project(pts, camera)
    valid = (z > 0.01) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    xi = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    flat = jnp.where(valid, yi * W + xi, H * W)
    zbuf = jnp.full((H * W + 1,), jnp.inf).at[flat].min(jnp.where(valid, z, jnp.inf))
    win = valid & (z <= zbuf[flat] + 1e-9)
    wflat = jnp.where(win, flat, H * W)
    pos = jnp.zeros((H * W + 1, 3)).at[wflat].set(pts)
    nrm = jnp.zeros((H * W + 1, 3)).at[wflat].set(nrm_s)
    depth = zbuf[: H * W].reshape(H, W)
    mask = jnp.isfinite(depth).astype(jnp.float32)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return (
        pos[: H * W].reshape(H, W, 3).transpose(2, 0, 1),
        nrm[: H * W].reshape(H, W, 3).transpose(2, 0, 1),
        depth[None],
        mask[None],
    )
