"""NeRF-style sin/cos positional encoding.

Matches `/root/reference/utils/pos_encoder.py`: identity + sin/cos at
log-spaced frequencies 2^0..2^(F-1); ordering per frequency is
[sin(x*f), cos(x*f)] interleaved across frequencies; output dim for
3D input with 7 freqs = 3 + 3*2*7 = 45.
"""

import jax.numpy as jnp


def posenc_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return (input_dim if include_input else 0) + input_dim * 2 * num_freqs


def positional_encoding(
    x: jnp.ndarray, num_freqs: int = 7, include_input: bool = True
) -> jnp.ndarray:
    """x: [..., D] -> [..., D + 2*D*num_freqs]."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., F, 2D]
    # Reference ordering: for each freq f: sin(x f) then cos(x f),
    # concatenated over freqs.
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
