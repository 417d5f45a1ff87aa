"""Baked-field fast rendering (precompute-for-render, TPU-first).

Per-point cost of the exact Instant-NGP render path is dominated by one
row-gather per hash LEVEL (12-16 per point, each ~2-5 ns of descriptor-rate-
bound HBM access). The reference amortizes nothing — its CUDA kernels re-walk
the multiresolution tables for every sample of every frame
(reference: src/embeddings.py:75-89). On TPU the idiomatic trade is to spend
HBM capacity to kill gather count: bake the sigma-net output field once per
trained checkpoint into a dense voxel grid of brick rows, then render with
TWO row-gathers per point, total.

What is baked: the 16 pre-activation outputs `h` of the instant decoder's
sigma net at every voxel vertex — exactly the tensor the renderer needs,
since sigma = softplus(h[0] - 5) and the color net consumes the full h
(reference: src/decoders.py:136-162). The view-dependent color MLP stays
live, so view effects are exact. Occupancy pruning can be folded into the
bake (masked vertices get h[0] = -20, i.e. sigma ~ 1e-11), which removes the
per-sample grid lookup from the render loop entirely.

Accuracy: rendering a baked field equals rendering the trilinear
interpolation of the exact field sampled at `resolution`^3 — the same class
of approximation the hash encoding itself makes, one octave below its finest
level. Measure the PSNR delta per scene with tools/quality_ab.py before
shipping a resolution.

Layout: overlapping 4^3-vertex bricks (stride 3 cells), 8 channels per
table x 2 tables -> 512-lane bf16 rows (1 KB: the measured sweet spot of the
v5e gather descriptor rate; 2 KB rows fall off a cliff).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoders as D
from ..models.fields import Field
from ..ops.fourier import fourier_encode

_BRICK_V = 4      # vertices per brick axis
_BRICK_C = 3      # cells per brick axis (stride)
_CH_PER_TABLE = 8
_N_CH = 16        # sigma-net output width (reference: src/decoders.py:111)
_LANES = _BRICK_V ** 3 * _CH_PER_TABLE   # 512
_MASKED_H0 = -20.0   # softplus(-25) ~ 1.4e-11: pruned voxels render empty


@dataclasses.dataclass(frozen=True)
class BakedSpec:
    """Static geometry of a baked field."""
    resolution: int = 256
    bound: float = 1.5

    @property
    def bricks_per_axis(self) -> int:
        return max(1, -(-(self.resolution - 1) // _BRICK_C))

    @property
    def n_bricks(self) -> int:
        return self.bricks_per_axis ** 3


def _vertex_positions(spec: BakedSpec) -> np.ndarray:
    lin = np.linspace(-spec.bound, spec.bound, spec.resolution,
                      dtype=np.float32)
    return lin


def bake_instant_field(field, params, spec: BakedSpec, *,
                       grid_binary: Optional[jnp.ndarray] = None,
                       grid_spec=None,
                       chunk: int = 1 << 17,
                       dtype=jnp.bfloat16) -> dict:
    """Evaluate the sigma net on every voxel vertex and pack brick rows.

    Returns baked params: {"t0": [nb,512], "t1": [nb,512] (dtype),
    "qscale"/"qzero": [16] fp32 (int8 only), "color_net": ...} —
    consumable by `build_baked_field`.

    When `grid_binary` is given, vertices in pruned voxels bake
    h[0] = -20 so empty space renders empty without any per-sample grid
    lookup at render time.

    `dtype=jnp.int8` stores per-channel affine-quantized rows: 512-lane
    int8 rows are 512 B — the measured v5e gather descriptor rate is ~2x
    the 1 KB bf16 rows', halving the dominant render cost. Quantization is
    per channel ((max-min)/254 step over the baked volume); trilinear
    interpolation commutes with the affine map, so dequantization happens
    once after extraction.
    """
    r = spec.resolution
    dec = params["decoder"]

    # sigma-net pre-activations on all vertices, chunked via lax.map
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

    # Evaluate per x-plane (r^2 points each) and keep the dense volume in
    # the table dtype: a 512^3 fp32 intermediate would be 8.6 GB; bf16
    # halves it and the packing below streams in brick slabs.
    quantize = dtype == jnp.int8
    store_dtype = jnp.bfloat16 if quantize else dtype

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

    dense, exts = jax.lax.map(plane, lin)                  # [R,R,R,16]

    qscale = qzero = None
    if quantize:
        lo = exts[:, 0].min(axis=0).astype(jnp.float32)    # [16]
        hi = exts[:, 1].max(axis=0).astype(jnp.float32)
        qzero = (hi + lo) / 2.0
        qscale = jnp.maximum((hi - lo) / 254.0, 1e-8)

    # Pack overlapping bricks: vertex v of brick b sits at 3b + v (clipped).
    # Streamed over the x brick axis to bound peak memory.
    nb = spec.bricks_per_axis
    vidx = jnp.minimum(
        _BRICK_C * jnp.arange(nb)[:, None] + jnp.arange(_BRICK_V)[None, :],
        r - 1)                                             # [nb, 4]

    @jax.jit
    def pack_slab(bx):
        xi = jnp.minimum(_BRICK_C * bx + jnp.arange(_BRICK_V), r - 1)
        slab = dense[xi]                                   # [4, R, R, 16]
        g = slab[:, vidx][:, :, :, vidx]                   # [4,nb,4,nb,4,16]
        g = g.transpose(1, 3, 0, 2, 4, 5)                  # [nb,nb,4,4,4,16]
        if quantize:
            q = (g.astype(jnp.float32) - qzero) / qscale
            g = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
        g = g.reshape(nb * nb, _BRICK_V ** 3, _N_CH)
        return (g[..., :_CH_PER_TABLE].reshape(nb * nb, _LANES),
                g[..., _CH_PER_TABLE:].reshape(nb * nb, _LANES))

    t0, t1 = jax.lax.map(pack_slab, jnp.arange(nb))
    return {"t0": t0.reshape(spec.n_bricks, _LANES),
            "t1": t1.reshape(spec.n_bricks, _LANES),
            "qscale": qscale, "qzero": qzero,
            "color_net": dec["color_net"]}


def _baked_extract(rows: jnp.ndarray, q: jnp.ndarray,
                   frac: jnp.ndarray) -> jnp.ndarray:
    """Factorized trilinear extraction of 8 channels from 512-lane brick
    rows (lane = ((i*4+j)*4+k)*8 + f). Static lane slices + two-tap masks,
    no gathers — the F=8 analog of the hash grid's level_feats."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]

    plane_i = lane >> 7
    mx = (plane_i == qx) * (1.0 - fx) + (plane_i == qx + 1) * fx
    v = rows * mx                                          # [N, 512]
    y = v[:, 0:128] + v[:, 128:256] + v[:, 256:384] + v[:, 384:512]

    plane_j = lane[:, 0:128] >> 5
    my = (plane_j == qy) * (1.0 - fy) + (plane_j == qy + 1) * fy
    v = y * my
    y = v[:, 0:32] + v[:, 32:64] + v[:, 64:96] + v[:, 96:128]

    plane_k = lane[:, 0:32] >> 3
    mz = (plane_k == qz) * (1.0 - fz) + (plane_k == qz + 1) * fz
    v = y * mz
    return v[:, 0:8] + v[:, 8:16] + v[:, 16:24] + v[:, 24:32]  # [N, 8]


def baked_h(baked: dict, x: jnp.ndarray, spec: BakedSpec) -> jnp.ndarray:
    """Trilinearly interpolated sigma-net outputs at world points [N,3]."""
    r = spec.resolution
    nb = spec.bricks_per_axis
    xf = x.astype(jnp.float32)
    x01 = jnp.clip((xf + spec.bound) / (2.0 * spec.bound), 0.0, 1.0)
    pos = x01 * (r - 1.0)
    p0 = jnp.clip(jnp.floor(pos), 0.0, r - 2.0)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)
    brick = p0 // _BRICK_C
    q = p0 - brick * _BRICK_C
    row = (brick[:, 0] * nb + brick[:, 1]) * nb + brick[:, 2]

    outs = []
    for key in ("t0", "t1"):
        rows = jnp.take(baked[key], row, axis=0, mode="clip") \
            .astype(jnp.float32)
        outs.append(_baked_extract(rows, q, frac))
    h = jnp.concatenate(outs, axis=-1)                     # [N, 16]
    if baked.get("qscale") is not None:
        # Per-channel affine dequantization (int8 tables); the trilinear
        # weights sum to 1, so interp-then-dequant is exact.
        h = h * baked["qscale"][None, :] + baked["qzero"][None, :]
    return h


def build_baked_field(spec: BakedSpec, L_dir: int = 4,
                      compute_dtype=jnp.bfloat16) -> Field:
    """A Field whose params are baked tables + the live color net.

    Drop-in for the render paths (same apply protocol as part2_instant):
    sigma = softplus(h[0] - 5) from the baked interpolation, rgb from the
    live view-dependent color MLP. Pruning is already folded into the bake,
    so render WITHOUT grid_binary.
    """

    def init(key):
        raise NotImplementedError(
            "baked fields are built by bake_instant_field, not init()")

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        h = baked_h(params, x, spec)
        sigma = jax.nn.softplus(h[:, 0:1] - 5.0)
        de = fourier_encode(d, L_dir).astype(compute_dtype)
        color_in = jnp.concatenate([h.astype(compute_dtype), de], axis=-1)
        rgb = D.mlp_apply(params["color_net"], color_in,
                          final_activation=jax.nn.sigmoid)
        return rgb, sigma

    return Field(mode="baked_instant", init=init, apply=apply,
                 needs_dirs=True, needs_time=False)
