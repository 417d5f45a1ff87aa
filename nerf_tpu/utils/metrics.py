"""Image-quality metrics (reference: src/utils.py:12-36)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_psnr(mse: float) -> float:
    """PSNR in dB for images normalized to [0, 1]: 10*log10(1/mse)."""
    return float(10.0 * np.log10(1.0 / mse))


def psnr(pred, target) -> float:
    """PSNR between two arrays (device or host)."""
    mse = float(jnp.mean((jnp.asarray(pred, jnp.float32)
                          - jnp.asarray(target, jnp.float32)) ** 2))
    return compute_psnr(mse)
