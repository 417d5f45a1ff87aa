"""Occupancy / density grid for empty-space skipping, as functional state.

Re-design of the reference's `DensityGrid` nn.Module
(reference: src/renderer.py:5-183). The grid lives in the train-state pytree
as a dense fp32 density volume plus a boolean occupancy volume; updates are a
separate jitted function invoked from the host on the staged schedule
(reference: run.py:632-646, 1191-1220, 1963-1986).

TPU notes: instead of boolean compaction with dynamic shapes (a CUDA-ism,
reference: src/renderer.py:303-343), the renderer keeps static shapes and
masks sigma to zero at inactive points — mathematically identical through the
compositing integral. The grid update evaluates all grid centers with
`lax.map` over fixed-size chunks, which XLA pipelines as one program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DensityGridSpec:
    resolution: int = 128
    bound: float = 1.0
    threshold: float = 0.01


def density_grid_init(spec: DensityGridSpec) -> dict:
    """Fresh grid state: zero densities, all-active occupancy
    (reference: src/renderer.py:25-29)."""
    r = spec.resolution
    return {
        "grid": jnp.zeros((r, r, r), jnp.float32),
        "binary": jnp.ones((r, r, r), jnp.bool_),
    }


def grid_lookup(volume: jnp.ndarray, pts: jnp.ndarray,
                spec: DensityGridSpec) -> jnp.ndarray:
    """Nearest-voxel value per point [N] fp32; 0 outside the volume.

    TPU note: a direct voxel lookup is one arbitrary gather per point
    (~9 ns each, descriptor-rate-bound). Instead the volume is repacked
    into 4x4x8-cell brick rows (128 lanes) so the lookup is a row-gather
    (~4.4 ns) plus a one-hot lane select on the VPU — ~2x faster at render
    scale. The repack is a pure reshape/transpose XLA hoists out of the
    per-chunk loop."""
    r = spec.resolution
    scale = r / (2.0 * spec.bound)
    idx = jnp.floor((pts + spec.bound) * scale).astype(jnp.int32)
    in_bounds = jnp.all((idx >= 0) & (idx < r), axis=-1)
    i = jnp.clip(idx, 0, r - 1)

    if r % 8 != 0:
        vals = volume[i[:, 0], i[:, 1], i[:, 2]].astype(jnp.float32)
        return vals * in_bounds.astype(jnp.float32)

    # Pack cells (4, 4, 8) per row: row-major over brick coords, lane =
    # ((i&3)<<5) | ((j&3)<<3) | (k&7).
    packed = volume.astype(jnp.float32) \
        .reshape(r // 4, 4, r // 4, 4, r // 8, 8) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(-1, 128)
    row = ((i[:, 0] >> 2) * (r >> 2) + (i[:, 1] >> 2)) * (r >> 3) \
        + (i[:, 2] >> 3)
    lane_idx = ((i[:, 0] & 3) << 5) | ((i[:, 1] & 3) << 3) | (i[:, 2] & 7)

    rows = jnp.take(packed, row, axis=0, unique_indices=False, mode="clip")
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    val = jnp.sum(rows * (lane == lane_idx[:, None]), axis=1)
    return val * in_bounds.astype(jnp.float32)


def grid_active_mask(binary: jnp.ndarray, pts: jnp.ndarray,
                     spec: DensityGridSpec) -> jnp.ndarray:
    """Boolean activity per point [N]; out-of-bounds points are inactive
    (reference: src/renderer.py:134-166)."""
    return grid_lookup(binary, pts, spec) > 0.0


def _grid_centers(spec: DensityGridSpec) -> np.ndarray:
    r = spec.resolution
    lin = np.linspace(-spec.bound, spec.bound, r, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)


def _query_density(field_apply, params, pts, t_scalar, needs_time,
                   chunk: int):
    """sigma at `pts` (optionally at one time), chunked via lax.map."""
    n = pts.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

    def one_chunk(p):
        dirs = jnp.zeros_like(p)
        if needs_time:
            t = jnp.full((p.shape[0], 1), t_scalar, jnp.float32)
            _, sigma, _ = field_apply(params, p, dirs, t)
        else:
            _, sigma = field_apply(params, p, dirs)
        return sigma[:, 0]

    sig = jax.lax.map(one_chunk, pts_p).reshape(-1)
    return sig[:n]


def make_grid_updater(field_apply, spec: DensityGridSpec, needs_time: bool,
                      chunk: int = 2 ** 18) -> Callable:
    """Build a jitted grid-update fn.

    update(params, state, times, decay, prune=False)
        -> (new_state, active_ratio)

    * static models: times ignored, grid overwritten
      (reference: src/renderer.py:105-125).
    * dynamic models: density = max over the provided `times` array, then
      grid = max(grid * decay, current) — the time-union with optional decay
      (reference: src/renderer.py:65-123). Part 4's three-anchor sweep is the
      caller passing times=[0, 0.5, 1] (reference: src/renderer.py:66).
    * prune (traced bool): REBUILD the grid from the current union instead
      of max-ing with history. The reference's permanent-memory union
      (decay=1.0) means every cell the half-trained early field ever
      marked stays active forever; its part-4 loop therefore re-prunes
      every 500 steps ("avoid skip-rate collapse", reference:
      run.py:1979-1984 — the call crashes on kwargs DensityGrid.update
      lacks, but the intent is explicit). Measured here on the round-3
      part-4 checkpoint: the accumulated training grid is 99.0%% active
      while a fresh rebuild from the SAME weights is 16.3%% active — the
      permanent memory is almost entirely stale early-training noise,
      which both disables empty-space skipping and flattens the
      occupancy-CDF sample placement this framework (unlike the
      reference's pure masking) relies on.
    """
    centers = jnp.asarray(_grid_centers(spec))
    r = spec.resolution

    @partial(jax.jit, static_argnames=())
    def update(params, state, times, decay, prune=False):
        if needs_time:
            def at_time(t):
                return _query_density(field_apply, params, centers, t,
                                      True, chunk)
            sig = jax.lax.map(at_time, times)      # [K, R^3]
            current = jnp.max(sig, axis=0).reshape(r, r, r)
            grid = jnp.where(jnp.asarray(prune),
                             current,
                             jnp.maximum(state["grid"] * decay, current))
        else:
            current = _query_density(field_apply, params, centers, 0.0,
                                     False, chunk).reshape(r, r, r)
            grid = current
        binary = grid > spec.threshold
        # Safety guard (deviation from the reference, which can dead-lock):
        # if no cell clears the threshold — e.g. the field is still
        # undertrained at the first update — an all-empty grid would mask
        # every sample, kill all gradients, and the grid could never
        # repopulate. Keep the grid fully active instead.
        binary = jnp.where(jnp.any(binary), binary, jnp.ones_like(binary))
        active_ratio = jnp.mean(binary.astype(jnp.float32))
        return {"grid": grid, "binary": binary}, active_ratio

    return update


def should_update(step: int, update_interval: int = 16,
                  warmup_iters: int = 0) -> bool:
    """Host-side cadence check (reference: src/renderer.py:168-183).

    Note the warmup bound is exclusive: with warmup 256 / interval 128
    the first update fires at step 256 itself, so the trainers' budgeted
    step engages from step 257 with a fresh grid — there is no stale-
    dense window (which would cost ~4x per step here, unlike the
    reference where an all-active grid just means no skipping).
    """
    if step < warmup_iters:
        return False
    return step % update_interval == 0


def staged_interval(step: int, train_iters: int,
                    stages=(16, 64, 256)) -> int:
    """Staged update interval: densest early, sparse late
    (reference: run.py:1195-1200; part2_instant uses (32, 128, 512),
    reference: run.py:636-641)."""
    if step < train_iters * 0.1:
        return stages[0]
    if step < train_iters * 0.5:
        return stages[1]
    return stages[2]
