"""Fourier positional encoding.

Semantics match the reference encoder (reference: src/embeddings.py:6-36):
gamma(p) = (p, sin(2^0 * pi * p), cos(2^0 * pi * p), ..., sin(2^{L-1} * pi * p),
cos(2^{L-1} * pi * p)), so out_dim = D + 2*D*L. With L == 0 the input passes
through unchanged.

TPU notes: the encoding is a single fused elementwise expression; frequencies
are baked in as compile-time constants so XLA folds the scaling into the
sin/cos fusion. Computation is done in the input dtype (fp32 by default).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def fourier_out_dim(input_dim: int, L: int) -> int:
    """Output feature dimension of `fourier_encode`."""
    if L <= 0:
        return input_dim
    return input_dim + 2 * input_dim * L


def fourier_encode(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """Encode coordinates with L octaves of sin/cos features.

    Args:
      x: [..., D] coordinates.
      L: number of frequency octaves (static).

    Returns:
      [..., D + 2*D*L] features, ordered (x, sin f0 x, cos f0 x, sin f1 x, ...)
      to match the reference layer layout (reference: src/embeddings.py:27-32).
    """
    if L <= 0:
        return x
    # [L] frequencies 2^k * pi as static constants.
    freqs = np.pi * (2.0 ** np.arange(L, dtype=np.float32))
    # [..., 1, D] * [L, 1] -> [..., L, D]
    xb = x[..., None, :] * jnp.asarray(freqs, dtype=x.dtype)[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # Interleave per-octave (sin_k, cos_k) pairs: [..., L, 2, D] -> [..., 2*L*D]
    sc = jnp.stack([sin, cos], axis=-2)
    flat = sc.reshape(*x.shape[:-1], 2 * L * x.shape[-1])
    return jnp.concatenate([x, flat], axis=-1)
