"""Minimal functional linear/MLP building blocks.

Parameters are plain pytrees (dicts of jnp arrays); every apply function is
pure. Initialization follows the fan-in uniform scheme the reference's torch
Linear layers use (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias), because the convergence recipes in the reference are sensitive to init
scale (reference: src/decoders.py:185-187, 358-359).

TPU notes: weights are stored [in, out] so `x @ w` maps directly onto the MXU
with the batch dimension as rows. Compute dtype is chosen by the caller;
matmuls request fp32 accumulation via `preferred_element_type`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> dict:
    wk, bk = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    w = jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(bk, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    w = p["w"].astype(x.dtype)
    b = p["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b


def mlp_init(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> list:
    """Init a plain MLP: dims = [in, h1, ..., out]. Returns list of layers."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)]


def mlp_apply(layers: list, x: jnp.ndarray, *, final_activation=None,
              hidden_activation=jax.nn.relu) -> jnp.ndarray:
    """Apply an MLP with ReLU between layers and optional final activation."""
    h = x
    for i, p in enumerate(layers):
        h = linear_apply(p, h)
        if i < len(layers) - 1:
            h = hidden_activation(h)
        elif final_activation is not None:
            h = final_activation(h)
    return h
