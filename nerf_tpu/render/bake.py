"""Baked-field fast rendering (precompute-for-render, TPU-first).

Per-point cost of the exact Instant-NGP render path is dominated by one
row-gather per hash LEVEL (12-16 per point, each ~2-5 ns of descriptor-rate-
bound HBM access). The reference amortizes nothing — its CUDA kernels re-walk
the multiresolution tables for every sample of every frame
(reference: src/embeddings.py:75-89). On TPU the idiomatic trade is to spend
HBM capacity to kill gather count: bake the sigma-net output field once per
trained checkpoint into a dense voxel table, then render with ONE row-gather
per point, total.

What is baked: the 16 pre-activation outputs `h` of the instant decoder's
sigma net at every voxel vertex — exactly the tensor the renderer needs,
since sigma = softplus(h[0] - 5) and the color net consumes the full h
(reference: src/decoders.py:136-162). The view-dependent color MLP stays
live, so view effects are exact. Occupancy pruning can be folded into the
bake (masked vertices get h[0] = -20, i.e. sigma ~ 1e-11), which removes the
per-sample grid lookup from the render loop entirely.

Layout — measured, not guessed (profile 2026-08-17): one row per CELL,
holding the cell's 8 corner vertices x 16 channels = 128 int8 lanes. A
128-lane int8 row is one native-tile row slice, so the per-point access is
a single descriptor-rate gather (~2-4 ns); the trilinear interpolation is
one fused [N, 8, 16] multiply-reduce against separable corner weights. The
previous layout (4^3-vertex bricks, 2 x 512-lane rows) measured 15.6
ns/gather plus 320 ms/frame of layout copies + full-width fp32 converts —
the 512-lane int8 rows span four (32,128) tiles per access. The cell layout
stores every vertex 8x (one copy per adjacent cell), spending HBM capacity
for descriptor-rate access: resolution^3 x 128 B, e.g. 2.1 GB at 256^3,
7.2 GB at 384^3 (int8). bf16 doubles that; int8 measured 0.00 dB vs bf16.

Accuracy: rendering a baked field equals rendering the trilinear
interpolation of the exact field sampled at `resolution`^3 — the same class
of approximation the hash encoding itself makes, one octave below its finest
level. Measure the PSNR delta per scene with tools/quality_ab.py before
shipping a resolution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoders as D
from ..models.fields import Field
from ..ops.fourier import fourier_encode

_N_CH = 16        # sigma-net output width (reference: src/decoders.py:111)
_CORNERS = 8
_LANES = _CORNERS * _N_CH               # 128
_MASKED_H0 = -20.0   # softplus(-25) ~ 1.4e-11: pruned voxels render empty
_MAX_TABLE_BYTES = 11 << 30


@dataclasses.dataclass(frozen=True)
class BakedSpec:
    """Static geometry of a baked field."""
    resolution: int = 256
    bound: float = 1.5

    @property
    def cells_per_axis(self) -> int:
        return self.resolution - 1

    @property
    def n_cells(self) -> int:
        return self.cells_per_axis ** 3


def _vertex_positions(spec: BakedSpec) -> np.ndarray:
    return np.linspace(-spec.bound, spec.bound, spec.resolution,
                       dtype=np.float32)


def bake_instant_field(field, params, spec: BakedSpec, *,
                       grid_binary: Optional[jnp.ndarray] = None,
                       grid_spec=None,
                       chunk: int = 1 << 17,
                       dtype=jnp.int8,
                       sigma_res: int = 224) -> dict:
    """Evaluate the sigma net on every voxel vertex and pack cell rows.

    Returns baked params: {"cells": [n_cells, 128] (dtype), "qscale"/
    "qzero": [16] fp32 (int8 only), "color_net": ...} — consumable by
    `build_baked_field`.

    When `grid_binary` is given, vertices in pruned voxels bake
    h[0] = -20 so empty space renders empty without any per-sample grid
    lookup at render time.

    `dtype=jnp.int8` (default) stores per-channel affine-quantized rows
    ((max-min)/254 step over the baked volume); trilinear interpolation
    commutes with the affine map, so dequantization happens once after the
    corner reduction. Measured 0.00 dB vs bf16 on the Lego-proxy checkpoint.
    """
    r = spec.resolution
    nc = spec.cells_per_axis
    table_bytes = spec.n_cells * _LANES * jnp.dtype(dtype).itemsize
    if table_bytes > _MAX_TABLE_BYTES:
        hint = ("use a smaller resolution"
                if dtype == jnp.int8
                else "use a smaller resolution or dtype=jnp.int8")
        raise ValueError(
            f"baked table would be {table_bytes/2**30:.1f} GiB at "
            f"resolution {r} ({jnp.dtype(dtype).name}); it must fit HBM "
            f"next to the render working set — {hint}")
    dec = params["decoder"]

    lin = jnp.asarray(_vertex_positions(spec))
    from ..render.density_grid import grid_active_mask

    def h_at(pts):
        enc = field.encode_for_bake(params, pts)
        h = D.mlp_apply(dec["sigma_net"], enc).astype(jnp.float32)
        if grid_binary is not None:
            act = grid_active_mask(grid_binary, pts, grid_spec)
            h0 = jnp.where(act, h[:, 0], _MASKED_H0)
            h = jnp.concatenate([h0[:, None], h[:, 1:]], axis=1)
        return h

    quantize = dtype == jnp.int8
    store_dtype = jnp.bfloat16 if quantize else dtype

    # Small jitted programs dispatched from a Python loop with in-place
    # (donated) device accumulation. One giant lax.map over all planes
    # compiles pathologically slowly on the remote TPU compiler (tens of
    # minutes; observed tunnel breakage); per-plane dispatch costs only
    # ~30 ms x r of host round-trips.
    @jax.jit
    def plane(xv):
        yy, zz = jnp.meshgrid(lin, lin, indexing="ij")
        pts = jnp.stack([jnp.full_like(yy, xv), yy, zz], axis=-1) \
            .reshape(-1, 3)
        n = pts.shape[0]
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
        h = jax.lax.map(h_at, pts_p).reshape(-1, _N_CH)[:n]
        h = h.reshape(r, r, _N_CH)
        ext = jnp.stack([h.min(axis=(0, 1)), h.max(axis=(0, 1))])
        return h.astype(store_dtype), ext

    @partial(jax.jit, donate_argnums=(0,))
    def acc_plane(dense, i, h):
        return jax.lax.dynamic_update_slice(dense, h[None], (i, 0, 0, 0))

    dense = jnp.zeros((r, r, r, _N_CH), store_dtype)
    ext_list = []
    for i in range(r):
        h, ext = plane(lin[i])
        dense = acc_plane(dense, i, h)
        ext_list.append(ext)
    exts = jnp.stack(ext_list)

    qscale = qzero = None
    if quantize:
        lo = exts[:, 0].min(axis=0).astype(jnp.float32)    # [16]
        hi = exts[:, 1].max(axis=0).astype(jnp.float32)
        qzero = (hi + lo) / 2.0
        qscale = jnp.maximum((hi - lo) / 254.0, 1e-8)

        # Quantize the dense volume BEFORE packing (donating the bf16
        # buffer): the packed table is 8x the dense volume, so the peak
        # lives during packing and every saved byte counts.
        @partial(jax.jit, donate_argnums=(0,))
        def quant_dense(d):
            q = (d.astype(jnp.float32) - qzero) / qscale
            return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)

        dense = quant_dense(dense)
    out_dtype = jnp.int8 if quantize else dtype

    # Sigma-only volume: channel 0 of the dense bake, flat [r^3]. The
    # hierarchical coarse pass marches this at ONE nearest-vertex scalar
    # gather per point (~2 ns, descriptor-rate) instead of a 128-lane cell
    # row + trilerp + color MLP — surface localization needs only a sigma
    # ESTIMATE, so nearest-neighbor at the bake resolution suffices.
    sigma_vol = dense[..., 0].reshape(-1)

    # Pack cell rows: cell (i,j,k) row holds vertices (i+di, j+dj, k+dk),
    # lane = ((di*2+dj)*2+dk)*16 + channel. Built slab-by-slab along x.
    @jax.jit
    def pack_slab(dense, cx):
        s0 = jax.lax.dynamic_slice(
            dense, (cx, 0, 0, 0), (1, r, r, _N_CH))[0]     # [R, R, 16]
        s1 = jax.lax.dynamic_slice(
            dense, (cx + 1, 0, 0, 0), (1, r, r, _N_CH))[0]
        corners = []
        for s in (s0, s1):                                 # di = 0, 1
            for dj in (0, 1):                              # [nc, nc, 16]
                for dk in (0, 1):
                    corners.append(s[dj:dj + nc, dk:dk + nc])
        g = jnp.stack(corners, axis=2)                     # [nc, nc, 8, 16]
        return g.reshape(nc * nc, _LANES)

    @partial(jax.jit, donate_argnums=(0,))
    def acc_slab(cells, cx, rows):
        return jax.lax.dynamic_update_slice(cells, rows[None], (cx, 0, 0))

    cells = jnp.zeros((nc, nc * nc, _LANES), out_dtype)
    for cx in range(nc):
        cells = acc_slab(cells, cx, pack_slab(dense, cx))
    # Free the 16-channel dense volume BEFORE the sigma-table bake: the
    # packed table is 8x the dense volume and together with dense +
    # sigma-bake temporaries the peak exceeds the ~10 GiB the tunneled
    # chip will grant. The sigma bake only needs channel 0, which
    # sigma_vol already holds.
    del dense
    out = {"cells": cells.reshape(spec.n_cells, _LANES),
           "sigma_vol": sigma_vol,
           "qscale": qscale, "qzero": qzero,
           "color_net": dec["color_net"]}
    if sigma_res:
        out.update(bake_sigma_cells(sigma_vol.reshape(r, r, r), spec,
                                    sigma_res=sigma_res))
    return out


def bake_sigma_cells(dense_h0: jnp.ndarray, spec: BakedSpec,
                     sigma_res: int = 224) -> dict:
    """Pack a REDUCED-resolution trilerp-able sigma table into 8-lane
    cell rows sized for the chip's fast gather zone.

    Measured (memory: tpu-v5e-performance-model): row gathers from tables
    <= ~96 MB run at ~2.16 ns (even for 8-byte rows) vs ~10.8 ns above
    ~128 MB, and scalar gathers are ~8 ns everywhere — so the render
    path's cheap sigma estimate must be (a) row-shaped and (b) small.
    Layout: one row per CELL holding its 8 corner h0 values; cell
    (i,j,k) lives in row (i*nc + j)*nc + k. An earlier 128-lane layout
    (16 z-cells per row) needed a 16-way one-hot lane extract whose
    materialized [N,16,8] f32 intermediates made the coarse march
    traffic-bound (~6.4 ns/pt profiled, vs ~2.7 with direct 8-lane
    rows). At sigma_res=224 the table is ~89 MB — in the fast zone.

    `dense_h0` is channel 0 of the QUANTIZED dense bake [r, r, r] int8
    (or raw dtype); it is trilinearly resized to the sigma lattice in the
    quantized domain (the affine dequant map commutes with resize).
    """
    r_s = sigma_res
    nc = r_s - 1

    @jax.jit
    def build(vol):
        v = jax.image.resize(vol.astype(jnp.float32), (r_s, r_s, r_s),
                             method="linear")
        corners = []
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    corners.append(jax.lax.slice(
                        v, (di, dj, dk), (di + nc, dj + nc, dk + nc)))
        g = jnp.stack(corners, axis=-1)                  # [nc, nc, nc, 8]
        return jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8) \
            .reshape(nc * nc * nc, _CORNERS)

    return {"sigma_cells": build(dense_h0)}


def sigma_cells_res(baked: dict) -> int:
    """Recover the sigma-table lattice resolution from its row count."""
    n_rows = baked["sigma_cells"].shape[0]
    nc = round(n_rows ** (1.0 / 3.0))
    for c in (nc - 1, nc, nc + 1):
        if c > 0 and c * c * c == n_rows:
            return c + 1
    raise ValueError(f"sigma_cells row count {n_rows} matches no lattice")


def baked_sigma_tri(baked: dict, x: jnp.ndarray, spec: BakedSpec,
                    sigma_res: int) -> jnp.ndarray:
    """Trilinearly interpolated sigma at world points [N, 3] -> [N].

    One fast-zone 8-lane row gather per point, an 8-corner bf16 reduce,
    then the instant activation sigma = softplus(h0 - 5) (reference:
    src/decoders.py:136-162). Pruned voxels baked to h0 = -20 return
    ~1e-11.
    """
    r_s = sigma_res
    nc = r_s - 1
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    pos = x01 * (r_s - 1.0)
    p0 = jnp.clip(jnp.floor(pos), 0.0, r_s - 2.0)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)
    row = (p0[:, 0] * nc + p0[:, 1]) * nc + p0[:, 2]

    v = jnp.take(baked["sigma_cells"], row, axis=0, mode="clip") \
        .astype(jnp.float32)                               # [N, 8]
    w = _corner_weights(frac)
    h0 = jnp.sum(v * w, axis=1)
    if baked.get("qscale") is not None:
        h0 = h0 * baked["qscale"][0] + baked["qzero"][0]
    return jax.nn.softplus(h0 - 5.0)


def _corner_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Separable trilinear corner weights, corner order (di, dj, dk)
    lexicographic (matching pack_slab). frac [N, 3] -> [N, 8]."""
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    wx = jnp.concatenate([1.0 - fx, fx], axis=1)           # [N, 2]
    wy = jnp.concatenate([1.0 - fy, fy], axis=1)
    wz = jnp.concatenate([1.0 - fz, fz], axis=1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :])
    return w.reshape(-1, _CORNERS)


# Trilerp strategy for baked_h ("reduce" | "fold" | "foldf32"), read at
# trace time so bench/profile jobs can A/B it per process.
#   reduce:  [N, 8, 16] broadcast-multiply + corner-axis sum (the r3 path).
#   fold:    three successive lerps on STATIC lane slices of the gathered
#            [N, 128] row (128 -> 64 -> 32 -> 16). Same math (the trilinear
#            weights are separable; the fold is Horner's form of the
#            corner sum), but no reshape/broadcast — an elementwise chain
#            XLA can fuse straight into the gather consumer instead of
#            materializing the [N, 8, 16] intermediate, the same
#            traffic-not-gather cost the coarse sigma path eliminated with
#            8-lane rows (memory: tpu-v5e-performance-model). bf16 folds
#            for int8 tables (measured +0.06% mean interpolation noise vs
#            the range — below the int8 quantization floor).
#   foldf32: the fold chain in f32 — numerically exact trilinear interp.
#            If the chain fuses (nothing materializes), f32 VPU lerps cost
#            the same as bf16 and this dominates "fold"; if it spills, it
#            doubles the spilled traffic. The chip profile picks.
def _baked_trilerp_mode() -> str:
    import os
    return os.environ.get("BAKED_TRILERP", "reduce")


def baked_h(baked: dict, x: jnp.ndarray, spec: BakedSpec,
            mode: str | None = None) -> jnp.ndarray:
    """Trilinearly interpolated sigma-net outputs at world points [N,3].

    One 128-lane row gather per point + a fused corner interpolation;
    dequantization (int8 tables) happens after the interpolation — the
    corner weights sum to 1, so interp-then-dequant is exact.

    `mode` pins the trilerp strategy; None reads BAKED_TRILERP at trace
    time. Callers that embed this in persistently cached jitted programs
    (build_baked_field) capture the mode at construction so an env-var
    change cannot be silently ignored by a warm jit cache mid-process.
    """
    r = spec.resolution
    nc = spec.cells_per_axis
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    pos = x01 * (r - 1.0)
    p0 = jnp.clip(jnp.floor(pos), 0.0, r - 2.0)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)
    row = (p0[:, 0] * nc + p0[:, 1]) * nc + p0[:, 2]

    rows = jnp.take(baked["cells"], row, axis=0, mode="clip")
    # int8 rows interpolate in bf16 (every int8 value is exact in bf16;
    # profiled ~17 ms/3.9M pts cheaper than f32 at the [N, 8, 16] reduce).
    # f32/bf16 tables keep f32 — a bf16 cast would round them.
    red = jnp.bfloat16 if rows.dtype == jnp.int8 else jnp.float32
    if mode is None:
        mode = _baked_trilerp_mode()
    if mode.startswith("fold"):
        if mode == "foldf32":
            red = jnp.float32
        # Lane layout is ((di*2 + dj)*2 + dk)*16 + ch (pack_slab corner-
        # lexicographic), so each axis folds as one static half-row lerp.
        fx = frac[:, 0:1].astype(red)
        fy = frac[:, 1:2].astype(red)
        fz = frac[:, 2:3].astype(red)
        v = rows.astype(red)                               # [N, 128]
        v = v[:, 0:64] + (v[:, 64:128] - v[:, 0:64]) * fx  # [N, 64]
        v = v[:, 0:32] + (v[:, 32:64] - v[:, 0:32]) * fy   # [N, 32]
        v = v[:, 0:16] + (v[:, 16:32] - v[:, 0:16]) * fz   # [N, 16]
        h = v.astype(jnp.float32)
    else:
        v = rows.reshape(-1, _CORNERS, _N_CH).astype(red)
        w = _corner_weights(frac).astype(red)
        h = jnp.sum(v * w[:, :, None], axis=1,
                    dtype=jnp.float32)                     # [N, 16]
    if baked.get("qscale") is not None:
        h = h * baked["qscale"][None, :] + baked["qzero"][None, :]
    return h


def baked_sigma_nn(baked: dict, x: jnp.ndarray, spec: BakedSpec
                   ) -> jnp.ndarray:
    """Nearest-vertex sigma at world points [N, 3] -> [N].

    One scalar gather per point from the flat sigma volume; dequantizes
    channel 0 (int8 tables) and applies the instant decoder's activation
    sigma = softplus(h0 - 5) (reference: src/decoders.py:136-162). Pruned
    voxels baked to h0 = -20 return ~1e-11 — placement weight zero.
    """
    r = spec.resolution
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    p = jnp.round(x01 * (r - 1.0)).astype(jnp.int32)
    flat = (p[:, 0] * r + p[:, 1]) * r + p[:, 2]
    h0 = jnp.take(baked["sigma_vol"], flat, mode="clip") \
        .astype(jnp.float32)
    if baked.get("qscale") is not None:
        h0 = h0 * baked["qscale"][0] + baked["qzero"][0]
    return jax.nn.softplus(h0 - 5.0)


def build_baked_field(spec: BakedSpec, L_dir: int = 4,
                      compute_dtype=jnp.bfloat16) -> Field:
    """A Field whose params are baked tables + the live color net.

    Drop-in for the render paths (same apply protocol as part2_instant):
    sigma = softplus(h[0] - 5) from the baked interpolation, rgb from the
    live view-dependent color MLP. Pruning is already folded into the bake,
    so render WITHOUT grid_binary.
    """
    # Captured ONCE at construction: renderers cache jitted programs
    # keyed on the field closure, so reading the env var at trace time
    # would let a warm cache silently ignore a mid-process BAKED_TRILERP
    # change (an A/B in one process would report the wrong arm). A new
    # build_baked_field call picks up the new value with fresh caches.
    trilerp_mode = _baked_trilerp_mode()

    def init(key):
        raise NotImplementedError(
            "baked fields are built by bake_instant_field, not init()")

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        h = baked_h(params, x, spec, trilerp_mode)
        sigma = jax.nn.softplus(h[:, 0:1] - 5.0)
        de = fourier_encode(d, L_dir).astype(compute_dtype)
        color_in = jnp.concatenate([h.astype(compute_dtype), de], axis=-1)
        rgb = D.mlp_apply(params["color_net"], color_in,
                          final_activation=jax.nn.sigmoid)
        return rgb, sigma

    def apply_grouped(params, pts, dirs_ray, t=None, *, train=False,
                      rng=None, max_level=None):
        """Per-ray grouped evaluation (Field.apply_grouped protocol).

        The color net's input is concat(h, dir_enc); splitting its first
        layer W into [W_h; W_d] lets the direction half — the Fourier
        encode (k-fold transcendentals) and the [R, D] x [D, H] matmul —
        run once per RAY and broadcast over the k samples. Exact: the
        first layer is linear in its concatenated input.
        """
        r, k, _ = pts.shape
        h = baked_h(params, pts.reshape(-1, 3), spec,
                    trilerp_mode)                             # [R*k, 16]
        sigma = jax.nn.softplus(h[:, 0:1] - 5.0)

        layers = params["color_net"]
        w0 = layers[0]["w"].astype(compute_dtype)
        b0 = layers[0]["b"].astype(compute_dtype)
        de = fourier_encode(dirs_ray, L_dir).astype(compute_dtype)
        ray_part = jnp.dot(de, w0[_N_CH:],
                           preferred_element_type=jnp.float32) \
            .astype(compute_dtype)                            # [R, H]
        hc = h.astype(compute_dtype).reshape(r, k, _N_CH)
        x = jnp.dot(hc, w0[:_N_CH],
                    preferred_element_type=jnp.float32).astype(compute_dtype)
        x = jax.nn.relu(x + ray_part[:, None, :] + b0)
        rgb = D.mlp_apply(layers[1:], x.reshape(r * k, -1),
                          final_activation=jax.nn.sigmoid)
        return rgb, sigma

    def sigma_at(params, pts):
        return baked_sigma_nn(params, pts, spec)

    return Field(mode="baked_instant", init=init, apply=apply,
                 needs_dirs=True, needs_time=False,
                 apply_grouped=apply_grouped, sigma_at=sigma_at)
