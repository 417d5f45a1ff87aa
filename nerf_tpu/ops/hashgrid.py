"""Multiresolution hash-grid encoding (Instant-NGP style), TPU-native.

This is the replacement for the reference's external tiny-cuda-nn
`tcnn.Encoding("HashGrid")` (reference: src/embeddings.py:39-93). It is a pure
function of a flat feature table so the reference's TV regularizers — which
read the raw flat parameter vector (reference: run.py:612-616, 1113-1120,
1842-1859) — and the part-4 init-noise perturbation
(reference: src/core.py:192-196) carry over directly.

Encoding semantics match Instant-NGP: L levels with vertex resolution
`res_l = floor(base * scale^l)`; per level the 8 cell corners are trilinearly
blended; per-level features concatenate to out_dim = L * F. World coords in
[-bound, bound] map to [0, 1] and clamp (reference: src/embeddings.py:84-87).

------------------------------------------------------------------------------
TPU-native storage: BRICK ROWS, not per-vertex entries.

Measured on a v5e chip, XLA's arbitrary gather runs at ~9 ns *per scalar*
(descriptor-rate-bound, independent of sortedness), so the GPU layout —
8 scalar vertex lookups x L levels per point — costs ~2.3 us/point and is
~1000x slower than the MXU. The same hardware row-gathers 512-byte rows at
~4.4 ns/row and row-scatter-adds at ~7.7 ns/row. The encoding is therefore
restructured around wide rows:

  * Each level is stored as overlapping BRICKS of 4x4x4 vertices with a
    stride of 3 cells: brick = 64 vertices x F=2 features = exactly one
    128-float row. Any cell's 8 corners live inside a single brick, so a
    point needs ONE row-gather per level (L rows/point instead of 8L scalar
    gathers).
  * Coarse levels store all bricks densely; fine levels spatially hash the
    brick coordinate (Instant-NGP primes) into a fixed brick budget of
    2^(log2_hashmap_size - 6) rows — 64 vertices/brick keeps the vertex
    capacity equal to the reference's 2^log2_hashmap_size table.
  * Corner extraction from the fetched row uses one-hot lane masks
    (iota == offset) accumulated over the 8 corners — pure VPU compare/FMA
    that XLA fuses into the gather consumer; `take_along_axis` here would
    fall back to scalar gathers.
  * The backward pass is ordinary XLA autodiff: the one-hot masks transpose
    to elementwise math and the row gather transposes to a row scatter-add —
    both on the fast path. No custom VJP needed.

Trade-off vs the reference layout: vertices on brick seams are stored twice
(overlap) and the two copies can drift, which is a C0 seam every 3 cells at
one level — but seams of different levels never align (resolutions are
geometric) and the decoder MLP smooths them, the same way it absorbs the hash
collisions Instant-NGP already tolerates. Bricks also collide as units in the
hashed levels; the budget keeps per-vertex capacity at parity.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (Mueller et al. 2022, arXiv:2201.05989),
# applied to brick coordinates.
_PRIMES = (1, 2654435761, 805459861)

# The package-default table layout (single source of truth: build_field's
# spec construction and the checkpoint layout stamp both read this).
# Round-5 chip A/B at full recipe scale (AB_RESULTS.md): tbrick 25.89 dB
# @ 11:20 vs brick 25.75 @ 9:35 vs exact ~16 steps/min (~8x tbrick's
# step time, never finished a 2k arm between tunnel flaps) — tbrick
# dominates brick on quality at near-equal speed and exact on speed.
DEFAULT_HASH_IMPL = "tbrick"

# Brick geometry: 4^3 vertices (one 128-lane row at F=2), 3^3 cells.
_BRICK_V = 4          # vertices per axis
_BRICK_C = 3          # cells per axis (stride)
_ROW_W = 128          # row width in table scalars


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multiresolution hash grid.

    Mirrors the reference's constructor surface
    (reference: src/embeddings.py:45-52). `log2_hashmap_size` is the
    per-level VERTEX capacity; the brick budget is derived from it.
    """
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.5
    bound: float = 1.0
    # "brick": TPU-native brick-row layout (fast path, F=2 only).
    # "exact": faithful Instant-NGP per-vertex layout (8 scalar-row gathers
    # per point-level; ~8x the gather descriptors) — the quality-reference
    # implementation used to A/B the brick layout's seam/collision
    # trade-offs, and the fallback for n_features_per_level != 2.
    # "mixed": brick rows for the dense coarse levels (no hashing there, so
    # no brick-granularity collisions — seams only, which the round-4 CPU
    # capacity A/B showed are not the defect) + exact per-vertex storage
    # for the levels the brick layout would hash (collisions at VERTEX
    # granularity, the granularity Instant-NGP's decoder is designed to
    # absorb). Splits the descriptor cost: 1 row-gather per coarse level,
    # 8 vertex gathers per fine level.
    # "cell": brick rows for the dense coarse levels + 16-lane CELL rows
    # (the 8 corners of one cell x F=2) for the hashed levels, hashed on
    # the CELL coordinate. Collision granularity drops from 64 vertices
    # (brick) to 8 (one cell) while keeping the brick impl's descriptor
    # cost: exactly ONE row-gather per point-level. The trade is vertex
    # duplication (each interior vertex lives in up to 8 cell rows whose
    # copies drift -> every hashed-level cell face is a potential C0
    # seam) and 8x storage per unique vertex; the brick@20 capacity A/B
    # showed capacity is not the quality limiter, so this spends bytes to
    # buy granularity at zero descriptor cost.
    # "vcell": per-vertex DENSE coarse prefix (seam-free, duplication-free
    # — the round-5 mixed arm showed the brick prefix's seams alone cost
    # ~2 dB) + the cell rows of "cell" for the hashed fine levels. The
    # descriptor budget at the reference config is ~44/point (4 dense
    # levels x 8 vertex gathers + 12 hashed levels x 1 row) vs brick 16 /
    # exact 128; the dense-level gathers hit small fast-zone tables.
    # "vbrick": per-vertex DENSE coarse prefix + the BRICK rows of "brick"
    # for the hashed fine levels. Same ~44-descriptor budget as vcell
    # (the hashed half is still one row-gather per level) but the hashed
    # collision unit stays 64 vertices — which the round-5 CPU ladder
    # measured as the BETTER half of the cell trade (cell 18.99 dB lost
    # 1.1 dB to brick 20.11 at fixed table bytes: 8x row duplication
    # costs more coverage than 8-vertex granularity buys). Predicted
    # ~22.2 dB by additivity (brick 20.11 + the 2.1 dB seam recovery
    # measured between mixed and exact); strictly dominates vcell if the
    # axes compose.
    # "tbrick" (TIED brick rows): dense levels store canonical PER-VERTEX
    # parameters (seam-free by construction) that are EXPANDED into brick
    # rows once per encode call — the expansion is 64 strided window
    # slices (extract-patches, stride 3), zero gather descriptors, O(table
    # bytes) DMA — and the per-point path then row-gathers the expanded
    # rows exactly like impl='brick'. vbrick's seam-free quality at
    # brick's 1-descriptor-per-point-level speed: the per-point cost of
    # the dense prefix drops from vbrick's 8 vertex gathers to ONE row
    # gather, paid for by an O(level-table) expansion whose cost is
    # independent of the point count (~1 ms/step at default caps).
    # `dense_max_entries` widens the dense prefix beyond the reference's
    # 2^log2_hashmap_size GPU-memory artifact: TPU HBM is the cheap
    # resource, gather descriptors the expensive one, so spending bytes
    # to push the first HASHED level from res 81 to res 200+ removes
    # collisions from the mid levels entirely at unchanged step time.
    # Hashed fine levels remain impl='brick' rows (one region per level).
    impl: str = "brick"
    # tbrick only: a level is stored dense-per-vertex while
    # res^3 <= dense_max_entries (None -> 2^log2_hashmap_size, the exact
    # impl's dense rule).
    dense_max_entries: int | None = None

    def __post_init__(self):
        if self.impl not in ("brick", "exact", "mixed", "cell", "vcell",
                             "vbrick", "tbrick"):
            raise ValueError(f"unknown hash impl: {self.impl}")
        if self.impl != "exact" and self.n_features_per_level != 2:
            raise NotImplementedError(
                "brick/cell rows are laid out for n_features_per_level=2; "
                "use impl='exact' (cfg key hash_impl: exact) for other "
                "feature widths")

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return tuple(
            max(2, int(np.floor(self.base_resolution
                                * self.per_level_scale ** l)))
            for l in range(self.n_levels)
        )

    @property
    def max_bricks(self) -> int:
        """Hashed-level brick budget: vertex capacity / 64."""
        return max(1 << (self.log2_hashmap_size - 6), 8)

    @property
    def bricks_per_axis(self) -> Tuple[int, ...]:
        return tuple(max(1, -(-(res - 1) // _BRICK_C))
                     for res in self.resolutions)

    @property
    def level_bricks(self) -> Tuple[int, ...]:
        """Number of brick rows per level (dense if the grid fits)."""
        out = []
        for nb in self.bricks_per_axis:
            dense = nb ** 3
            out.append(dense if dense <= self.max_bricks
                       else self.max_bricks)
        return tuple(out)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.level_bricks:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def n_bricks(self) -> int:
        return self.level_offsets[-1]

    @property
    def n_entries(self) -> int:
        """Total table scalars / F (kept for parity with the flat-table
        parameter-count surface)."""
        return self.n_bricks * (_ROW_W // self.n_features_per_level)

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    # ---- exact (per-vertex, Instant-NGP-faithful) layout -----------------
    @property
    def level_vertices(self) -> Tuple[int, ...]:
        """Exact-impl entries per level: dense res^3 if it fits the table,
        else the 2^log2_hashmap_size hash budget
        (reference: src/embeddings.py:45-52 / Mueller et al. sec. 3)."""
        cap = 1 << self.log2_hashmap_size
        return tuple(min(res ** 3, cap) for res in self.resolutions)

    @property
    def level_vertex_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.level_vertices:
            offs.append(offs[-1] + s)
        return tuple(offs)

    # ---- mixed (brick coarse prefix + per-vertex fine suffix) layout -----
    @property
    def mixed_split(self) -> int:
        """First level the brick layout would HASH. Mixed stores levels
        below this as dense brick rows (identical to impl='brick') and
        levels from here on per-vertex (identical math to impl='exact')."""
        for l, nb in enumerate(self.bricks_per_axis):
            if nb ** 3 > self.max_bricks:
                return l
        return self.n_levels

    @property
    def mixed_vertex_sizes(self) -> Tuple[int, ...]:
        """Per-vertex entries for levels >= mixed_split: dense res^3 when
        it fits the 2^log2_hashmap_size budget, else the hash budget —
        the same rule the exact layout applies to every level."""
        cap = 1 << self.log2_hashmap_size
        return tuple(min(self.resolutions[l] ** 3, cap)
                     for l in range(self.mixed_split, self.n_levels))

    @property
    def mixed_vertex_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.mixed_vertex_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def mixed_n_params(self) -> int:
        """Flat scalar count of the mixed table: dense brick rows first,
        then the per-vertex region."""
        return (self.level_offsets[self.mixed_split] * _ROW_W
                + self.mixed_vertex_offsets[-1] * self.n_features_per_level)

    # ---- cell (brick coarse prefix + 16-lane cell-row fine suffix) -------
    @property
    def cell_rows_per_level(self) -> int:
        """Hashed-level cell-row budget at byte parity with the other
        layouts: 2^log2_hashmap_size vertices x F scalars per level /
        (8 corners x F lanes per row) = 2^(log2_hashmap_size - 3) rows."""
        return max(1 << (self.log2_hashmap_size - 3), 8)

    @property
    def cell_row_w(self) -> int:
        return 8 * self.n_features_per_level

    @property
    def cell_n_params(self) -> int:
        """Flat scalar count of the cell table: dense brick rows first,
        then one hashed cell-row region per fine level."""
        n_hashed = self.n_levels - self.mixed_split
        return (self.level_offsets[self.mixed_split] * _ROW_W
                + n_hashed * self.cell_rows_per_level * self.cell_row_w)

    # ---- vcell (per-vertex dense prefix + cell-row fine suffix) ----------
    @property
    def vcell_dense_sizes(self) -> Tuple[int, ...]:
        """Per-vertex entries for the seam-free dense prefix. Every
        brick-dense level satisfies res^3 < 2^log2_hashmap_size (its
        brick grid fits 2^(log2-6) rows), so these always index direct."""
        return tuple(self.resolutions[l] ** 3
                     for l in range(self.mixed_split))

    @property
    def vcell_dense_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.vcell_dense_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def vcell_n_params(self) -> int:
        n_hashed = self.n_levels - self.mixed_split
        return (self.vcell_dense_offsets[-1] * self.n_features_per_level
                + n_hashed * self.cell_rows_per_level * self.cell_row_w)

    # ---- vbrick (per-vertex dense prefix + brick-row fine suffix) --------
    @property
    def vbrick_n_params(self) -> int:
        """Flat scalar count: the seam-free per-vertex dense region first,
        then one max_bricks x 128 brick-row region per hashed level (the
        same rows impl='brick' stores for those levels)."""
        n_hashed = self.n_levels - self.mixed_split
        return (self.vcell_dense_offsets[-1] * self.n_features_per_level
                + n_hashed * self.max_bricks * _ROW_W)

    # ---- tbrick (tied brick rows: vertex-canonical dense prefix) ---------
    @property
    def tbrick_dense_cap(self) -> int:
        return (self.dense_max_entries if self.dense_max_entries
                else 1 << self.log2_hashmap_size)

    @property
    def tbrick_split(self) -> int:
        """First hashed level: res^3 exceeds the dense-entry budget."""
        cap = self.tbrick_dense_cap
        for l, res in enumerate(self.resolutions):
            if res ** 3 > cap:
                return l
        return self.n_levels

    @property
    def tbrick_dense_sizes(self) -> Tuple[int, ...]:
        return tuple(self.resolutions[l] ** 3
                     for l in range(self.tbrick_split))

    @property
    def tbrick_dense_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.tbrick_dense_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def tbrick_n_params(self) -> int:
        n_hashed = self.n_levels - self.tbrick_split
        return (self.tbrick_dense_offsets[-1] * self.n_features_per_level
                + n_hashed * self.max_bricks * _ROW_W)


def hash_grid_init(key: jax.Array, spec: HashGridSpec,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Init the feature table with U(-1e-4, 1e-4) (the same init scale
    tiny-cuda-nn uses for grid encodings). Shape depends on the layout:
    brick -> [n_bricks, 128]; exact -> [n_vertices, F]; mixed -> flat
    [mixed_n_params] (brick rows first, then the per-vertex region — a
    1-D table so the flat-access surface: TV regularizers, part-4 init
    perturbation, stays trivially valid)."""
    if spec.impl == "exact":
        return jax.random.uniform(
            key, (spec.level_vertex_offsets[-1], spec.n_features_per_level),
            dtype, -1e-4, 1e-4)
    if spec.impl == "mixed":
        return jax.random.uniform(
            key, (spec.mixed_n_params,), dtype, -1e-4, 1e-4)
    if spec.impl == "cell":
        return jax.random.uniform(
            key, (spec.cell_n_params,), dtype, -1e-4, 1e-4)
    if spec.impl == "vcell":
        return jax.random.uniform(
            key, (spec.vcell_n_params,), dtype, -1e-4, 1e-4)
    if spec.impl == "vbrick":
        return jax.random.uniform(
            key, (spec.vbrick_n_params,), dtype, -1e-4, 1e-4)
    if spec.impl == "tbrick":
        return jax.random.uniform(
            key, (spec.tbrick_n_params,), dtype, -1e-4, 1e-4)
    return jax.random.uniform(
        key, (spec.n_bricks, _ROW_W), dtype, -1e-4, 1e-4)


def hash_encode(table: jnp.ndarray, x: jnp.ndarray,
                spec: HashGridSpec, max_level: int | None = None
                ) -> jnp.ndarray:
    if spec.impl == "exact":
        return hash_encode_exact(table, x, spec, max_level)
    if spec.impl == "mixed":
        return hash_encode_mixed(table, x, spec, max_level)
    if spec.impl == "cell":
        return hash_encode_cell(table, x, spec, max_level)
    if spec.impl == "vcell":
        return hash_encode_vcell(table, x, spec, max_level)
    if spec.impl == "vbrick":
        return hash_encode_vbrick(table, x, spec, max_level)
    if spec.impl == "tbrick":
        return hash_encode_tbrick(table, x, spec, max_level)
    return _hash_encode_brick(table, x, spec, max_level)


def _scan_levels(level_fn, xs, f: int, unroll: bool) -> jnp.ndarray:
    """Run a per-level scan emitting F separate [N] feature vectors and
    reassemble the level-major [N, K*F] output outside the scan.

    Both obvious emission shapes have a pathological TPU tiling: a
    [K, N, F] stack pads F=2 up to the 128-lane tile (64x memory), and a
    [K, F, N] stack is fine forward but its BACKWARD materializes one
    [F, N] cotangent slice per level laid out with F on the lane axis --
    512 MB each at N=1M points, ~20 live at once, which OOMed the
    part-3-instant train step on chip (queue_logs/p3i_at_scale.log,
    2026-08-19). Per-feature [N] vectors tile cleanly in both passes;
    the row permutation keeps the output column order identical to the
    old code (checkpoint-compatible).
    """
    def body(_, ro):
        t = level_fn(ro)                        # [N, F]
        return None, tuple(t[:, i] for i in range(f))

    _, ys = jax.lax.scan(body, None, xs, unroll=unroll)
    big = jnp.concatenate(ys, axis=0)           # [F*K, N], row f*K + k
    k = big.shape[0] // f
    r = jnp.arange(k * f)
    perm = (r % f) * k + r // f                 # row k*F+f <- row f*K+k
    return big[perm].T                          # [N, K*F], level-major


def _encode_vertex_levels(table: jnp.ndarray, x01: jnp.ndarray,
                          spec: HashGridSpec, levels, offsets
                          ) -> jnp.ndarray:
    """Per-vertex (Instant-NGP-faithful) features for a list of levels.

    8 vertex gathers + trilerp per level; dense levels (res^3 fits the
    2^log2_hashmap_size budget) index directly, the rest use the spatial
    hash on VERTEX coordinates (Mueller et al. 2022, eq. 4). `table` is
    the [n_vertices, F] region holding exactly `levels` at `offsets`
    (aligned with `levels`). Shared by the exact layout (all levels) and
    the mixed layout (the fine suffix). Returns [N, len(levels)*F],
    level-major.
    """
    n = x01.shape[0]
    f = spec.n_features_per_level
    cap = 1 << spec.log2_hashmap_size

    # the 8 cell-corner offsets
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32)                                          # [8, 3]

    def level_feats(res, offset, dense):
        resf = jnp.asarray(res, jnp.float32)
        pos = x01 * (resf - 1.0)
        p0 = jnp.clip(jnp.floor(pos), 0.0, resf - 2.0)
        frac = pos - p0
        p0 = p0.astype(jnp.int32)
        cv = p0[:, None, :] + corners[None, :, :]           # [N, 8, 3]
        cu = cv.astype(jnp.uint32)
        if dense:
            res_u = jnp.asarray(res, jnp.uint32)
            idx = cu[..., 0] + res_u * (cu[..., 1] + res_u * cu[..., 2])
        else:
            idx = ((cu[..., 0] * np.uint32(_PRIMES[0]))
                   ^ (cu[..., 1] * np.uint32(_PRIMES[1]))
                   ^ (cu[..., 2] * np.uint32(_PRIMES[2]))) \
                & np.uint32(cap - 1)
        idx = idx.astype(jnp.int32) + offset                # [N, 8]
        vals = jnp.take(table, idx.reshape(-1), axis=0, mode="clip") \
            .reshape(n, 8, f).astype(jnp.float32)
        # trilinear weights in corner order (i, j, k)
        w = jnp.ones((n, 8), jnp.float32)
        for a in range(3):
            fa = frac[:, a:a + 1]
            ca = corners[None, :, a].astype(jnp.float32)
            w = w * (ca * fa + (1.0 - ca) * (1.0 - fa))
        return jnp.sum(w[..., None] * vals, axis=1)         # [N, F]

    dense_i = [i for i, l in enumerate(levels)
               if spec.resolutions[l] ** 3 <= cap]
    hashed_i = [i for i in range(len(levels)) if i not in dense_i]

    feats = [level_feats(spec.resolutions[levels[i]], offsets[i], True)
             for i in dense_i]

    if hashed_i:
        res_arr = jnp.asarray(
            [spec.resolutions[levels[i]] for i in hashed_i], jnp.int32)
        off_arr = jnp.asarray([offsets[i] for i in hashed_i], jnp.int32)

        @jax.checkpoint
        def _one(ro):
            res, offset = ro
            return level_feats(res, offset, False)          # [N, F]

        # unroll=False: the per-vertex path is the quality-reference/A-B
        # path, not the hot path — its 8-gathers-per-level graph is ~8x
        # the brick impl's and unrolling it made remote TPU compiles
        # pathologically slow (>45 min at 16 levels).
        feats.append(_scan_levels(_one, (res_arr, off_arr), f,
                                  unroll=False))

    return jnp.concatenate(feats, axis=-1)


def hash_encode_exact(table: jnp.ndarray, x: jnp.ndarray,
                      spec: HashGridSpec, max_level: int | None = None
                      ) -> jnp.ndarray:
    """Faithful Instant-NGP encoding: 8 per-vertex gathers + trilerp per
    level, dense levels indexed directly, hashed levels via the spatial
    hash on VERTEX coordinates (Mueller et al. 2022, eq. 4).

    This is the quality-reference implementation for the brick-row layout
    (which hashes brick coordinates and duplicates seam vertices): same
    signature, same config surface, ~8x the gather descriptors.
    """
    n = x.shape[0]
    f = spec.n_features_per_level
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    cap = 1 << spec.log2_hashmap_size
    assert all(spec.level_vertices[l] == cap for l in range(spec.n_levels)
               if spec.resolutions[l] ** 3 > cap)

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = [_encode_vertex_levels(
        table, x01, spec, list(range(lmax)),
        spec.level_vertex_offsets[:lmax])] if lmax else []
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f), jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def hash_encode_mixed(table: jnp.ndarray, x: jnp.ndarray,
                      spec: HashGridSpec, max_level: int | None = None
                      ) -> jnp.ndarray:
    """Mixed layout: brick rows for the dense coarse prefix + per-vertex
    storage for the levels the brick layout would hash.

    Rationale (round-4 CPU A/B, output/ab_cpu/SUMMARY.md): at equal
    params the brick layout loses ~3.2 dB to the exact layout and
    doubling brick capacity does not close it — the defect is the
    COLLISION GRANULARITY of hashing whole 64-vertex bricks, not
    capacity and not the dense-level seams. Mixed therefore keeps the
    cheap path exactly where it is collision-free (dense levels: one
    128-lane row-gather each, ~62%% of the levels at the reference
    config) and pays the 8-gather exact cost only on the hashed fine
    levels, where collisions happen at vertex granularity — the
    granularity the Instant-NGP decoder is designed to absorb
    (reference: src/embeddings.py:39-93).

    `table` is flat 1-D (see hash_grid_init); the two regions are static
    slices, so XLA treats them as independent gather sources.
    """
    split = spec.mixed_split
    f = spec.n_features_per_level
    n = x.shape[0]
    n_brick_rows = spec.level_offsets[split]
    brick_tab = table[: n_brick_rows * _ROW_W].reshape(n_brick_rows, _ROW_W)

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = []
    n_brick_lvls = min(lmax, split)
    if n_brick_lvls:
        # Identical math and parameter layout to impl="brick" for these
        # levels; the brick encoder zero-fills past max_level, slice off.
        b = _hash_encode_brick(brick_tab, x, spec, max_level=n_brick_lvls)
        feats.append(b[:, : n_brick_lvls * f])
    if lmax > split:
        xf = x.astype(jnp.float32)
        x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
        vert_tab = table[n_brick_rows * _ROW_W:].reshape(-1, f)
        levels = list(range(split, lmax))
        feats.append(_encode_vertex_levels(
            vert_tab, x01, spec, levels,
            spec.mixed_vertex_offsets[:len(levels)]))
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f), jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def hash_encode_cell(table: jnp.ndarray, x: jnp.ndarray,
                     spec: HashGridSpec, max_level: int | None = None
                     ) -> jnp.ndarray:
    """Cell layout: brick rows for the dense coarse prefix + one 16-lane
    CELL row (8 corners x F=2) per hashed fine level, hashed on the cell
    coordinate (Instant-NGP primes).

    Brick-speed (ONE row-gather per point-level, same descriptor count as
    impl='brick') with the collision unit shrunk from 64 vertices to 8 —
    the middle rung of the granularity ladder brick(64) / cell(8) /
    exact(1) that the layout A/B measures. Lane order within a row is
    ((di*2 + dj)*2 + dk)*F + f, so the trilinear blend is three successive
    static half-row lerps (no gathers, no one-hot masks).
    """
    split = spec.mixed_split
    f = spec.n_features_per_level
    n = x.shape[0]
    n_brick_rows = spec.level_offsets[split]
    brick_tab = table[: n_brick_rows * _ROW_W].reshape(n_brick_rows, _ROW_W)

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = []
    n_brick_lvls = min(lmax, split)
    if n_brick_lvls:
        b = _hash_encode_brick(brick_tab, x, spec, max_level=n_brick_lvls)
        feats.append(b[:, : n_brick_lvls * f])
    if lmax > split:
        xf = x.astype(jnp.float32)
        x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
        cell_tab = table[n_brick_rows * _ROW_W:].reshape(-1, spec.cell_row_w)
        feats.append(_encode_cell_levels(cell_tab, x01, spec,
                                         list(range(split, lmax))))
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f), jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def _encode_cell_levels(cell_tab: jnp.ndarray, x01: jnp.ndarray,
                        spec: HashGridSpec, levels) -> jnp.ndarray:
    """Hashed 16-lane cell-row features for `levels` (all hashed on the
    CELL coordinate; every brick-hashed level has (res-1)^3 well above
    the row budget). `cell_tab` is [(len(levels)*rows), 8F], one region
    per level in `levels` order. Shared by the cell and vcell layouts.
    Returns [N, len(levels)*F], level-major."""
    n = x01.shape[0]
    f = spec.n_features_per_level
    n_rows = spec.cell_rows_per_level
    base = levels[0]
    res_arr = jnp.asarray([spec.resolutions[l] for l in levels],
                          jnp.float32)
    off_arr = jnp.asarray([(l - base) * n_rows for l in levels], jnp.int32)

    @jax.checkpoint
    def _level(ro):
        res, offset = ro
        pos = x01 * (res - 1.0)
        p0 = jnp.clip(jnp.floor(pos), 0.0, res - 2.0)
        frac = pos - p0
        c = p0.astype(jnp.uint32)                       # cell coord
        row = ((c[:, 0] * np.uint32(_PRIMES[0]))
               ^ (c[:, 1] * np.uint32(_PRIMES[1]))
               ^ (c[:, 2] * np.uint32(_PRIMES[2]))) \
            & np.uint32(n_rows - 1)
        idx = row.astype(jnp.int32) + offset
        rows = jnp.take(cell_tab, idx, axis=0, unique_indices=False,
                        mode="clip").astype(jnp.float32)  # [N, 8F]
        fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
        h = 4 * f
        v = rows[:, :h] * (1.0 - fx) + rows[:, h:] * fx   # [N, 4F]
        h = 2 * f
        v = v[:, :h] * (1.0 - fy) + v[:, h:] * fy         # [N, 2F]
        v = v[:, :f] * (1.0 - fz) + v[:, f:] * fz         # [N, F]
        return v

    # Remat + scan for the same reasons as the brick hashed levels:
    # one compiled copy of the gather+lerp graph, recompute rows in
    # the backward pass instead of saving [K, N, 16] residuals.
    return _scan_levels(_level, (res_arr, off_arr), f, unroll=True)


def hash_encode_vcell(table: jnp.ndarray, x: jnp.ndarray,
                      spec: HashGridSpec, max_level: int | None = None
                      ) -> jnp.ndarray:
    """vcell layout: per-vertex DENSE coarse prefix + hashed cell rows.

    The round-5 part2i A/B decomposed the brick layout's quality deficit:
    the mixed arm (brick dense prefix + exact hashed levels) recovered
    only ~1 dB of exact's +3.2 dB over brick — so ~2 dB is the dense
    prefix's SEAMS (duplicated brick-edge vertices drifting apart), not
    the hashed-level collisions. This layout removes the seams (dense
    levels store each vertex once, direct 8-gather trilerp — exactly the
    exact impl's dense path) and keeps the hashed levels on 16-lane cell
    rows (one descriptor per level, 8-vertex collision granularity).
    """
    split = spec.mixed_split
    f = spec.n_features_per_level
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    n_dense = spec.vcell_dense_offsets[-1]

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = []
    n_dense_lvls = min(lmax, split)
    if n_dense_lvls:
        vert_tab = table[: n_dense * f].reshape(n_dense, f)
        feats.append(_encode_vertex_levels(
            vert_tab, x01, spec, list(range(n_dense_lvls)),
            spec.vcell_dense_offsets[:n_dense_lvls]))
    if lmax > split:
        cell_tab = table[n_dense * f:].reshape(-1, spec.cell_row_w)
        feats.append(_encode_cell_levels(cell_tab, x01, spec,
                                         list(range(split, lmax))))
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f), jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def hash_encode_vbrick(table: jnp.ndarray, x: jnp.ndarray,
                       spec: HashGridSpec, max_level: int | None = None
                       ) -> jnp.ndarray:
    """vbrick layout: per-vertex DENSE coarse prefix + hashed brick rows.

    The fourth rung completing the 2x3 layout matrix ({brick|vertex}
    dense prefix x {brick|cell|exact} hashed levels): the seam-free
    per-vertex prefix of vcell/exact + the 128-lane brick rows of
    impl='brick' for the hashed levels (bit-identical math and rows to
    the brick impl there). Same descriptor budget as vcell (~44/point
    at the reference config) but the hashed collision unit stays 64
    vertices, which the round-5 CPU ladder measured as the better half
    of the cell trade (cell's 8x row duplication cost 1.1 dB of
    coverage). This is the speed-oriented quality candidate if the chip
    A/B vetoes exact's 128-descriptor step time.
    """
    split = spec.mixed_split
    f = spec.n_features_per_level
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    n_dense = spec.vcell_dense_offsets[-1]

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = []
    n_dense_lvls = min(lmax, split)
    if n_dense_lvls:
        vert_tab = table[: n_dense * f].reshape(n_dense, f)
        feats.append(_encode_vertex_levels(
            vert_tab, x01, spec, list(range(n_dense_lvls)),
            spec.vcell_dense_offsets[:n_dense_lvls]))
    if lmax > split:
        brick_tab = table[n_dense * f:].reshape(-1, _ROW_W)
        levels = list(range(split, lmax))
        offsets = [(l - split) * spec.max_bricks for l in levels]
        feats.append(_encode_brick_hashed_levels(
            brick_tab, x01, spec, levels, offsets, spec.max_bricks))
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f), jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def _expand_vertices_to_brick_rows(vflat: jnp.ndarray, res: int, nb: int,
                                   f: int) -> jnp.ndarray:
    """Differentiably expand a canonical per-vertex level table into the
    brick-row layout (_brick_row_trilerp's lane order).

    vflat is the level's [res^3 * f] region with vertex (x, y, z) at flat
    entry x + res*y + res^2*z (the exact impl's dense indexing). The
    expansion is 64 strided window slices — extract-patches with a 4^3
    window and stride 3 — so it costs ZERO gather descriptors and
    O(res^3) DMA; its autodiff transpose is the matching set of strided
    slice-adds (overlap-add), also gather-free. Returns [nb^3, 128] rows
    with row = bx + nb*by + nb^2*bz and lane = ((i*4 + j)*4 + k)*f + c
    for local vertex (i=x, j=y, k=z), matching _hash_encode_brick's
    dense-level addressing.
    """
    # flat x + res*y + res^2*z  <=>  C-order axes [z, y, x]
    V = vflat.reshape(res, res, res, f)                  # [z, y, x, f]
    need = 3 * nb + 1
    if need > res:
        pad = need - res
        V = jnp.pad(V, ((0, pad), (0, pad), (0, pad), (0, 0)), mode="edge")

    def expand_axis(a, axis):
        """[..., 3*nb+1, ...] -> [..., nb, 4, ...]: brick slot s of brick b
        is vertex 3b+s. Slots 0-2 are a pure [3*nb]->[nb,3] reshape of the
        unshifted array; slot 3 (= slot 0 of the next brick) is lane 2 of
        the same reshape of the 1-shifted array. Unit-stride slices and
        reshapes ONLY — stride-3 slicing on a minor axis breaks the TPU's
        lane vectorization and measured ~7x step time in the first
        formulation of this expansion."""
        n_full = 3 * nb
        lead = a.shape[:axis]
        trail = a.shape[axis + 1:]
        sl = lambda lo, hi: a[tuple([slice(None)] * axis + [slice(lo, hi)])]
        s012 = sl(0, n_full).reshape(*lead, nb, 3, *trail)
        s3 = sl(1, n_full + 1).reshape(*lead, nb, 3, *trail)
        idx3 = tuple([slice(None)] * (axis + 1) + [slice(2, 3)])
        return jnp.concatenate([s012, s3[idx3]], axis=axis + 1)

    # V [z, y, x, f] -> [bz, 4z, by, 4y, bx, 4x, f]
    W = expand_axis(V, 2)            # [z, y, bx, 4x, f]
    W = expand_axis(W, 1)            # [z, by, 4y, bx, 4x, f]
    W = expand_axis(W, 0)            # [bz, 4z, by, 4y, bx, 4x, f]
    # lane order is ((i_x*4 + j_y)*4 + k_z)*f + c (see _brick_row_trilerp)
    rows = W.transpose(0, 2, 4, 5, 3, 1, 6)   # [bz, by, bx, 4x, 4y, 4z, f]
    return rows.reshape(nb ** 3, 64 * f)


def hash_encode_tbrick(table: jnp.ndarray, x: jnp.ndarray,
                       spec: HashGridSpec, max_level: int | None = None
                       ) -> jnp.ndarray:
    """tbrick layout: vertex-canonical dense prefix expanded to brick rows
    once per call + hashed brick rows (see the spec docstring).

    Per-point descriptor cost is identical to impl='brick' (ONE row
    gather per point-level across ALL levels); the dense levels are
    seam-free because every duplicated row lane is tied to its single
    canonical vertex parameter through the expansion, whose transpose
    accumulates all copies' gradients back onto that vertex.
    """
    split = spec.tbrick_split
    f = spec.n_features_per_level
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    n_dense = spec.tbrick_dense_offsets[-1]

    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    feats = []
    for lvl in range(min(lmax, split)):
        res = spec.resolutions[lvl]
        nb = max(1, -(-(res - 1) // _BRICK_C))
        o = spec.tbrick_dense_offsets[lvl]

        # Remat each dense level: without it the [N, 128] row gather and
        # the trilerp temporaries of EVERY dense level stay live as
        # backward residuals at once — 512 MB x ~12 levels at 1M points,
        # which OOMed the part-3-instant train step on chip
        # (queue_logs/p3i_at_scale.log, 2nd OOM, 2026-08-19). Recomputing
        # the gather in the backward pass costs ~20% of the fwd+bwd time
        # (profile_train: encode fwd 19 ms vs fwd+bwd 115 ms at 0.5M).
        @jax.checkpoint
        def _dense_level(tab_slice, pts01, res=res, nb=nb):
            rows_tab = _expand_vertices_to_brick_rows(tab_slice, res, nb,
                                                      f)
            brick, q, frac = _brick_cell_coords(pts01, res)
            b = brick.astype(jnp.uint32)
            row = b[:, 0] + b[:, 1] * np.uint32(nb) \
                + b[:, 2] * np.uint32(nb * nb)
            rows = jnp.take(rows_tab, row.astype(jnp.int32), axis=0,
                            unique_indices=False, mode="clip") \
                .astype(jnp.float32)
            return _brick_row_trilerp(rows, q, frac)

        feats.append(_dense_level(table[o * f: (o + res ** 3) * f], x01))

    if lmax > split:
        brick_tab = table[n_dense * f:].reshape(-1, _ROW_W)
        levels = list(range(split, lmax))
        offsets = [(l - split) * spec.max_bricks for l in levels]
        feats.append(_encode_brick_hashed_levels(
            brick_tab, x01, spec, levels, offsets, spec.max_bricks))
    if lmax < spec.n_levels:
        feats.append(jnp.zeros((n, (spec.n_levels - lmax) * f),
                               jnp.float32))
    return jnp.concatenate(feats, axis=-1)


def _brick_row_trilerp(rows: jnp.ndarray, q: jnp.ndarray,
                       frac: jnp.ndarray) -> jnp.ndarray:
    """Factorized trilinear extraction in lane space. Row lane layout is
    ((i*4 + j)*4 + k)*2 + f, so lane>>5 = i, (lane>>3)&3 = j,
    (lane>>1)&3 = k. Each axis is contracted with a 2-tap mask
    ((plane == q)*(1-frac) + (plane == q+1)*frac) followed by a fold of
    the 4 strided segments -- all static lane slices, no gathers."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _ROW_W), 1)
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]

    plane_i = lane >> 5                                  # [1, 128]
    mx = ((plane_i == qx) * (1.0 - fx) + (plane_i == qx + 1) * fx)
    v = rows * mx                                        # [N, 128]
    y = v[:, 0:32] + v[:, 32:64] + v[:, 64:96] + v[:, 96:128]

    plane_j = lane[:, 0:32] >> 3
    my = ((plane_j == qy) * (1.0 - fy) + (plane_j == qy + 1) * fy)
    v = y * my
    y = v[:, 0:8] + v[:, 8:16] + v[:, 16:24] + v[:, 24:32]

    plane_k = lane[:, 0:8] >> 1
    mz = ((plane_k == qz) * (1.0 - fz) + (plane_k == qz + 1) * fz)
    v = y * mz
    return v[:, 0:2] + v[:, 2:4] + v[:, 4:6] + v[:, 6:8]  # [N, 2]


def _brick_cell_coords(x01: jnp.ndarray, res):
    """p0 (cell origin), brick coords, local q, frac -- res may be a
    traced scalar (the hashed-level scan) or a Python int."""
    resf = jnp.asarray(res, jnp.float32)
    pos = x01 * (resf - 1.0)
    p0 = jnp.clip(jnp.floor(pos), 0.0, resf - 2.0)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)
    brick = p0 // _BRICK_C
    q = p0 - brick * _BRICK_C
    return brick, q, frac


def _encode_brick_hashed_levels(table: jnp.ndarray, x01: jnp.ndarray,
                                spec: HashGridSpec, levels, offsets,
                                n_rows: int) -> jnp.ndarray:
    """Hashed 128-lane brick-row features for `levels` (brick-coordinate
    spatial hash, Instant-NGP primes). `table` is a [*, 128] row table
    holding one n_rows region per level at `offsets` (aligned with
    `levels`). Shared by the brick layout (hashed suffix of its single
    table) and the vbrick layout (hashed region of its flat table).
    Returns [N, len(levels)*F], level-major.
    """
    n = x01.shape[0]
    res_arr = jnp.asarray([spec.resolutions[l] for l in levels],
                          jnp.float32)
    off_arr = jnp.asarray(list(offsets), jnp.int32)

    @jax.checkpoint
    def _level(ro):
        res, offset = ro
        brick, q, frac = _brick_cell_coords(x01, res)
        b = brick.astype(jnp.uint32)
        row = ((b[:, 0] * np.uint32(_PRIMES[0]))
               ^ (b[:, 1] * np.uint32(_PRIMES[1]))
               ^ (b[:, 2] * np.uint32(_PRIMES[2]))) \
            & np.uint32(n_rows - 1)
        idx = row.astype(jnp.int32) + offset
        rows = jnp.take(table, idx, axis=0, unique_indices=False,
                        mode="clip").astype(jnp.float32)
        return _brick_row_trilerp(rows, q, frac)            # [N, F]

    # Remat (jax.checkpoint on _level): recomputing the row-gather in the
    # backward pass is far cheaper than saving [K, N, 128] row residuals
    # (5+ GB at 1M pts).
    return _scan_levels(_level, (res_arr, off_arr),
                        spec.n_features_per_level, unroll=True)


def _hash_encode_brick(table: jnp.ndarray, x: jnp.ndarray,
                       spec: HashGridSpec, max_level: int | None = None
                       ) -> jnp.ndarray:
    """Encode world-space points with the multiresolution hash grid.

    Args:
      table: [n_bricks, 128] brick table (from `hash_grid_init`).
      x: [N, 3] world coordinates in [-bound, bound] (clamped otherwise).
      spec: static grid configuration.
      max_level: if set, only the first `max_level` levels are computed and
        the remaining feature columns are zero — a render-time LOD knob
        (measured: dropping the 2 finest of 12 levels costs 0.00 dB on a
        trained scene while cutting row-gathers proportionally).

    Returns:
      [N, L*F] concatenated per-level features (level-major), fp32.
    """
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)

    # Levels whose full brick grid fits the budget are unrolled (their
    # shapes all differ); the hashed levels share one table shape and one
    # hash formula, so they run as a lax.scan over (res, offset) -- this
    # collapses the ~12 identical copies of the gather+extract graph into
    # one, cutting XLA compile time several-fold. Dense-ness is monotone in
    # level, so output ordering stays level-major.
    lmax = spec.n_levels if max_level is None else min(max_level,
                                                       spec.n_levels)
    dense_lvls = [l for l in range(lmax)
                  if spec.bricks_per_axis[l] ** 3 <= spec.level_bricks[l]]
    hashed_lvls = [l for l in range(lmax) if l not in dense_lvls]
    assert dense_lvls == list(range(len(dense_lvls))), \
        "dense levels must be a prefix"

    feats = []
    for lvl in dense_lvls:
        res = spec.resolutions[lvl]
        nb = spec.bricks_per_axis[lvl]

        # Remat per dense level — same reason as hash_encode_tbrick's
        # dense loop: keep only one level's [N, 128] row residuals live
        # in the backward instead of all of them.
        @jax.checkpoint
        def _dense_level(tab, pts01, res=res, nb=nb,
                         offset=spec.level_offsets[lvl]):
            brick, q, frac = _brick_cell_coords(pts01, res)
            b = brick.astype(jnp.uint32)
            row = b[:, 0] + b[:, 1] * np.uint32(nb) \
                + b[:, 2] * np.uint32(nb * nb)
            idx = row.astype(jnp.int32) + offset
            rows = jnp.take(tab, idx, axis=0, unique_indices=False,
                            mode="clip").astype(jnp.float32)
            return _brick_row_trilerp(rows, q, frac)

        feats.append(_dense_level(table, x01))

    if hashed_lvls:
        n_rows = spec.level_bricks[hashed_lvls[0]]
        assert all(spec.level_bricks[l] == n_rows for l in hashed_lvls)
        feats.append(_encode_brick_hashed_levels(
            table, x01, spec, hashed_lvls,
            [spec.level_offsets[l] for l in hashed_lvls], n_rows))

    if lmax < spec.n_levels:
        feats.append(jnp.zeros(
            (n, (spec.n_levels - lmax) * spec.n_features_per_level),
            jnp.float32))
    return jnp.concatenate(feats, axis=-1)                     # [N, L*F]
