"""Packed brick-row occupancy lookup vs the direct voxel lookup."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.render.density_grid import DensityGridSpec, grid_active_mask


def _direct(binary, pts, spec):
    r = spec.resolution
    scale = r / (2.0 * spec.bound)
    idx = jnp.floor((pts + spec.bound) * scale).astype(jnp.int32)
    in_bounds = jnp.all((idx >= 0) & (idx < r), axis=-1)
    i = jnp.clip(idx, 0, r - 1)
    return binary[i[:, 0], i[:, 1], i[:, 2]] & in_bounds


def test_packed_equals_direct(rng_key):
    spec = DensityGridSpec(resolution=32, bound=1.3, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.35, (32, 32, 32))
    pts = jax.random.uniform(rng_key, (4096, 3), minval=-1.8, maxval=1.8)
    np.testing.assert_array_equal(
        np.asarray(grid_active_mask(binary, pts, spec)),
        np.asarray(_direct(binary, pts, spec)))


def test_non_multiple_of_8_falls_back(rng_key):
    spec = DensityGridSpec(resolution=12, bound=1.0, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.5, (12, 12, 12))
    pts = jax.random.uniform(rng_key, (512, 3), minval=-1.2, maxval=1.2)
    np.testing.assert_array_equal(
        np.asarray(grid_active_mask(binary, pts, spec)),
        np.asarray(_direct(binary, pts, spec)))
