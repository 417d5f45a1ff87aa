"""Multiresolution hash-grid encoding (Instant-NGP style), TPU-native.

This is the replacement for the reference's external tiny-cuda-nn
`tcnn.Encoding("HashGrid")` (reference: src/embeddings.py:39-93). It is a pure
function of a flat feature table so the reference's TV regularizers — which
read the raw flat parameter vector (reference: run.py:612-616, 1113-1120,
1842-1859) — and the part-4 init-noise perturbation
(reference: src/core.py:192-196) carry over directly.

Encoding semantics:
  * L levels; level l has vertex resolution `res_l = floor(base * scale^l)`.
  * Coarse levels whose full grid fits in the table are indexed densely
    (x + y*res + z*res^2); finer levels use the Instant-NGP spatial hash
    (XOR of per-axis large-prime multiplies, masked to the table size).
  * Per level, features are trilinearly interpolated from the 8 cell corners
    and the per-level results are concatenated: out_dim = L * F.
  * World coords in [-bound, bound] are mapped to [0, 1] and clamped, matching
    the reference wrapper (reference: src/embeddings.py:84-87).

TPU design notes:
  * The level loop is a static Python loop (16 iterations) so XLA sees a flat
    graph of gathers + FMAs it can pipeline; all shapes are static.
  * Gradients flow through `jnp.take` — XLA transposes the gather into a
    scatter-add into the table, which is the TPU-idiomatic equivalent of
    tcnn's atomic-add backward.
  * The table is kept fp32 (hash features are tiny; the gather traffic, not
    the math, dominates); callers cast the output to their compute dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (Mueller et al. 2022, arXiv:2201.05989).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multiresolution hash grid.

    Mirrors the reference's constructor surface
    (reference: src/embeddings.py:45-52).
    """
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.5
    bound: float = 1.0

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return tuple(
            int(np.floor(self.base_resolution * self.per_level_scale ** l))
            for l in range(self.n_levels)
        )

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        """Number of table entries per level (dense if the grid fits)."""
        sizes = []
        for res in self.resolutions:
            dense = res ** 3
            sizes.append(dense if dense <= self.hashmap_size
                         else self.hashmap_size)
        return tuple(sizes)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.level_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def n_entries(self) -> int:
        return self.level_offsets[-1]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level


def hash_grid_init(key: jax.Array, spec: HashGridSpec,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Init the flat feature table [n_entries, F] with U(-1e-4, 1e-4).

    (The same init scale tiny-cuda-nn uses for grid encodings.)
    """
    return jax.random.uniform(
        key, (spec.n_entries, spec.n_features_per_level), dtype, -1e-4, 1e-4)


# Precomputed corner offsets of a unit cell, shape [8, 3].
_CORNERS = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=np.int32)


def _level_indices(coords: jnp.ndarray, res: int, size: int) -> jnp.ndarray:
    """Map integer grid coords [..., 3] to table indices [...] for one level."""
    if res ** 3 <= size:
        # Dense indexing: the whole grid fits in the table.
        c = coords.astype(jnp.uint32)
        idx = c[..., 0] + c[..., 1] * np.uint32(res) \
            + c[..., 2] * np.uint32(res * res)
    else:
        c = coords.astype(jnp.uint32)
        idx = (c[..., 0] * np.uint32(_PRIMES[0])) \
            ^ (c[..., 1] * np.uint32(_PRIMES[1])) \
            ^ (c[..., 2] * np.uint32(_PRIMES[2]))
        idx = idx & np.uint32(size - 1)
    return idx.astype(jnp.int32)


def hash_encode(table: jnp.ndarray, x: jnp.ndarray,
                spec: HashGridSpec) -> jnp.ndarray:
    """Encode world-space points with the multiresolution hash grid.

    Args:
      table: [n_entries, F] flat feature table (from `hash_grid_init`).
      x: [N, 3] world coordinates in [-bound, bound] (clamped otherwise).
      spec: static grid configuration.

    Returns:
      [N, L*F] concatenated per-level features (level-major), fp32.
    """
    # [-bound, bound] -> [0, 1], clamp (reference: src/embeddings.py:84-87).
    x01 = (x.astype(jnp.float32) + spec.bound) / (2.0 * spec.bound)
    x01 = jnp.clip(x01, 0.0, 1.0)

    corners = jnp.asarray(_CORNERS)  # [8, 3]
    feats = []
    for lvl, res in enumerate(spec.resolutions):
        size = spec.level_sizes[lvl]
        offset = spec.level_offsets[lvl]
        pos = x01 * np.float32(res - 1)          # [N, 3]
        p0 = jnp.floor(pos)
        frac = pos - p0                          # [N, 3]
        p0 = p0.astype(jnp.int32)

        # [N, 8, 3] corner coords, clipped to the valid vertex range.
        cc = jnp.clip(p0[:, None, :] + corners[None, :, :], 0, res - 1)
        idx = _level_indices(cc, res, size) + offset       # [N, 8]

        # Trilinear weights: prod over dims of (frac if corner==1 else 1-frac).
        w = jnp.where(corners[None, :, :] == 1,
                      frac[:, None, :], 1.0 - frac[:, None, :])
        w = w[..., 0] * w[..., 1] * w[..., 2]              # [N, 8]

        vals = jnp.take(table, idx.reshape(-1), axis=0)    # [N*8, F]
        vals = vals.reshape(idx.shape + (table.shape[-1],))
        feats.append(jnp.sum(w[..., None] * vals, axis=1))  # [N, F]

    return jnp.concatenate(feats, axis=-1)
