"""Camera model (3DGS conventions) as a JAX pytree.

Matrix semantics match `/root/reference/lib/cameras.py:29-99` and
`/root/reference/utils/graphics_utils.py:41-75`, expressed in standard
column-vector form (the reference stores row-major transposes for its
CUDA kernels; here `world_view @ [p,1]` maps world -> view directly).
znear=0.01, zfar=100 fixed as in the reference.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera pytree. width/height are STATIC aux data (they size the
    render grid), so a Camera can ride inside jitted batch pytrees
    without its image dimensions becoming tracers."""

    world_view: jnp.ndarray  # [4,4] world -> view (column-vector convention)
    full_proj: jnp.ndarray   # [4,4] world -> clip
    camera_center: jnp.ndarray  # [3]
    tanfovx: jnp.ndarray     # scalar
    tanfovy: jnp.ndarray     # scalar
    width: int               # static
    height: int              # static

    def tree_flatten(self):
        children = (
            self.world_view, self.full_proj, self.camera_center,
            self.tanfovx, self.tanfovy,
        )
        return children, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, width=aux[0], height=aux[1])


def projection_matrix(znear, zfar, fovx, fovy, dtype=jnp.float32):
    """Perspective projection, z in [znear, zfar] -> [0, 1]·w (3DGS form,
    `utils/graphics_utils.py:55-75`); symmetric frustum so the (0,2)/(1,2)
    entries vanish."""
    t_x = np.tan(0.5 * fovx)
    t_y = np.tan(0.5 * fovy)
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 1.0 / t_x
    P[1, 1] = 1.0 / t_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return jnp.asarray(P, dtype=dtype)


def world_to_view(R, T, dtype=jnp.float32):
    """R: [3,3] camera-to-world rotation, T: [3] world-to-view translation
    (COLMAP/3DGS convention, `utils/graphics_utils.py:41-52`)."""
    R = np.asarray(R, dtype=np.float64)
    T = np.asarray(T, dtype=np.float64)
    M = np.eye(4)
    M[:3, :3] = R.T
    M[:3, 3] = T
    return jnp.asarray(M, dtype=dtype)


def make_camera(R, T, fovx, fovy, width, height, znear=0.01, zfar=100.0) -> Camera:
    wv = world_to_view(R, T)
    proj = projection_matrix(znear, zfar, fovx, fovy)
    full = proj @ wv
    # camera center = inverse(world2view) translation
    wv_np = np.asarray(wv, dtype=np.float64)
    center = np.linalg.inv(wv_np)[:3, 3]
    return Camera(
        world_view=wv,
        full_proj=full,
        camera_center=jnp.asarray(center, dtype=jnp.float32),
        tanfovx=jnp.float32(np.tan(0.5 * float(fovx))),
        tanfovy=jnp.float32(np.tan(0.5 * float(fovy))),
        width=int(width),
        height=int(height),
    )


def camera_from_matrices(world_view, full_proj, tanfovx, tanfovy, width, height) -> Camera:
    """Build a Camera from traced matrices (differentiable path used when
    camera params come out of learned pose corrections)."""
    inv = jnp.linalg.inv(world_view)
    return Camera(
        world_view=world_view,
        full_proj=full_proj,
        camera_center=inv[:3, 3],
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        width=int(width),
        height=int(height),
    )


def projection_from_tan(tanfovx, tanfovy, znear=0.01, zfar=100.0, dtype=jnp.float32):
    """Traced-value counterpart of `projection_matrix` (same math,
    `utils/graphics_utils.py:55-75`) for cameras rebuilt inside the
    jitted graph from learned pose corrections."""
    z = jnp.zeros((), dtype)
    row0 = jnp.stack([1.0 / tanfovx, z, z, z])
    row1 = jnp.stack([z, 1.0 / tanfovy, z, z])
    row2 = jnp.stack(
        [z, z, jnp.full((), zfar / (zfar - znear), dtype),
         jnp.full((), -(zfar * znear) / (zfar - znear), dtype)]
    )
    row3 = jnp.stack([z, z, jnp.ones((), dtype), z])
    return jnp.stack([row0, row1, row2, row3])


def camera_from_c2w(c2w, tanfovx, tanfovy, width, height, znear=0.01, zfar=100.0) -> Camera:
    """Differentiable Camera from a traced camera-to-world [4,4]: the
    in-graph endpoint of the optimizable-Rh/Th path (the reference
    computes this transform host-side detached, `lib/batch.py:165-201`;
    here gradients flow from pixels back into the global pose)."""
    w2c = jnp.linalg.inv(c2w)
    proj = projection_from_tan(
        jnp.asarray(tanfovx, w2c.dtype), jnp.asarray(tanfovy, w2c.dtype), znear, zfar
    )
    return Camera(
        world_view=w2c,
        full_proj=proj @ w2c,
        camera_center=c2w[:3, 3],
        tanfovx=jnp.asarray(tanfovx, jnp.float32),
        tanfovy=jnp.asarray(tanfovy, jnp.float32),
        width=int(width),
        height=int(height),
    )


def stack_cameras(cams) -> Camera:
    """Stack same-size Cameras into one batched Camera (leading B on the
    array fields) for `rasterize_tiled_batch`."""
    assert len({(c.width, c.height) for c in cams}) == 1, "sizes must match"
    return Camera(
        world_view=jnp.stack([c.world_view for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        camera_center=jnp.stack([c.camera_center for c in cams]),
        tanfovx=jnp.stack([jnp.asarray(c.tanfovx) for c in cams]),
        tanfovy=jnp.stack([jnp.asarray(c.tanfovy) for c in cams]),
        width=cams[0].width,
        height=cams[0].height,
    )


def ndc2pix(v, size):
    """NDC [-1,1] -> pixel coordinate (`lib/cameras.py:77-78`)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def focal2fov(focal, pixels):
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def fov2focal(fov, pixels):
    return pixels / (2.0 * np.tan(0.5 * fov))
