"""K-nearest-neighbor distances for Gaussian scale initialization.

Replaces simple-knn's `distCUDA2` (`/root/reference/models/mesh_net.py:66`)
and pytorch3d `knn_points(K=4)` (`/root/reference/models/cage_net.py:66`):
mean squared distance to the 3 nearest neighbors of each point.
One-time init-path op; computed in chunks so N~100k fits in memory.
"""

import jax
import jax.numpy as jnp


def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 2048) -> jnp.ndarray:
    """points: [N, 3] -> [N] mean squared distance to the k nearest
    neighbors (excluding self). Clamped below at 1e-7 like the reference.
    """
    n = points.shape[0]
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    # Far-away padding so padded rows never become anyone's neighbor.
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=1e9)
    sq = jnp.sum(pts**2, axis=-1)  # [n_pad]

    def chunk_fn(start):
        p = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        psq = jax.lax.dynamic_slice(sq, (start,), (chunk,))
        d2 = psq[:, None] - 2.0 * p @ pts.T + sq[None, :]  # [chunk, n_pad]
        row = start + jnp.arange(chunk)
        self_mask = jnp.arange(n_pad)[None, :] == row[:, None]
        pad_mask = jnp.arange(n_pad)[None, :] >= n
        d2 = jnp.where(self_mask | pad_mask, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top, axis=-1)

    out = jax.lax.map(chunk_fn, jnp.arange(n_chunks) * chunk).reshape(-1)[:n]
    return jnp.maximum(out, 1e-7)
