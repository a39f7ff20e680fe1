"""Learned per-frame / per-camera embedding codes.

Replicates `/root/reference/models/embeddings.py:13-37`: an [N, D] table,
N(0, 0.1) init, renormalized at lookup to max_norm = n_dims (torch
nn.Embedding max_norm semantics, applied functionally instead of
in-place), with the mean code used at eval
(`models/garment_net.py:176-178`).
"""

import jax
import jax.numpy as jnp


def init_embedding(key, n_frames: int, n_dims: int, std: float = 0.1):
    return {"table": jax.random.normal(key, (n_frames, n_dims)) * std}


def _renorm(rows):
    # max_norm = n_dims, as in the reference's nn.Embedding(max_norm=n_dims)
    max_norm = float(rows.shape[-1])
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    scale = jnp.where(norm > max_norm, max_norm / jnp.maximum(norm, 1e-12), 1.0)
    return rows * scale


def embedding_lookup(params, idx):
    """idx: int scalar or [B] -> [D] or [B, D] (clamped like the
    reference's out-of-range guard)."""
    table = params["table"]
    idx = jnp.clip(idx, 0, table.shape[0] - 1)
    return _renorm(table[idx])


def embedding_average(params):
    """Mean code for eval-time conditioning."""
    return jnp.mean(_renorm(params["table"]), axis=0)
