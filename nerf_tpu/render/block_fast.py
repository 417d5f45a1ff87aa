"""Block-structured single-pass fast rendering: the production bench path.

The measured v5e cost model (memory: tpu-v5e-performance-model) is
descriptor-rate gathers: ~10.8 ns/row from the multi-GB baked color table,
~2.16 ns/row from tables under ~96 MB, scalars ~8 ns everywhere, scatters
like slow gathers. The round-2 fast path spent most of its frame on
gathers that were NOT field evaluations: per-pixel CDF materialization,
a 640k-ray compaction scatter plus five per-ray takes, and a per-pixel
"cheap" coarse march whose scalar gathers cost as much as full rows.

This renderer restructures the frame so the ONLY slow-zone gathers are
the k_fine color-row lookups that produce the image:

  * PROBE + PLACEMENT at 8x8-pixel block rate: one ray per block marches
    `n_probe` bins against the fast-zone sigma table (bake.baked_sigma_tri,
    ~2 ns/pt), the profile is 3x3-max-pooled for silhouette conservatism,
    and a TEMPERED transmittance-weighted CDF places k_fine continuous
    depths per block. Tempering (w^temper) plus a uniform floor over
    occupied bins are the fix for the round-2 "importance" negative result
    (over-sharp coarse profiles absorb the budget into one bin and then
    z-diff compositing distances underestimate opacity; AB_RESULTS.md).
  * COMPACTION at block rate: a 10k-element counting-sort scatter instead
    of 640k; per-pixel rays are reconstructed from block ids by iota
    arithmetic (zero gathers), and per-pixel depths broadcast from the
    block rows.
  * One FINE pass: k_fine baked-field evaluations per pixel (the only
    big-table gathers), grouped color MLP, z-diff compositing, and a
    block-granular scatter back onto a background-filled image.

Reference parity: this is the TPU realization of the reference's
density-grid empty-space skipping + render path (reference:
src/renderer.py:303-343, run.py:736-813) — same occupancy semantics
(pruning folded into the bake), same compositing math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bake import BakedSpec, baked_sigma_tri, sigma_cells_res
from .renderer import _compact_indices
from ..ops.volume import composite


def _block_center_dirs(H: int, W: int, focal: float, block: int
                       ) -> jnp.ndarray:
    """Camera-space dirs of each block's center pixel [HB*WB, 3]."""
    hb, wb = H // block, W // block
    off = block // 2
    j = (jnp.arange(hb, dtype=jnp.float32) * block + off)
    i = (jnp.arange(wb, dtype=jnp.float32) * block + off)
    jj, ii = jnp.meshgrid(j, i, indexing="ij")
    d = jnp.stack([(ii - W * 0.5) / focal,
                   -(jj - H * 0.5) / focal,
                   -jnp.ones_like(ii)], axis=-1)
    return d.reshape(-1, 3)


def _pixel_dirs_for_blocks(block_ids: jnp.ndarray, rot: jnp.ndarray,
                           H: int, W: int, focal: float, block: int
                           ) -> jnp.ndarray:
    """World-space normalized dirs for every pixel of the given blocks.

    Pure iota arithmetic + one [N, 3] x [3, 3] matmul — no gathers.
    Returns [C, block*block, 3].
    """
    wb = W // block
    bi = (block_ids // wb).astype(jnp.float32) * block     # row origin
    bj = (block_ids % wb).astype(jnp.float32) * block      # col origin
    u = jnp.arange(block, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, u, indexing="ij")             # in-block row/col
    py = bi[:, None, None] + uu[None]                      # [C, B, B]
    px = bj[:, None, None] + vv[None]
    d = jnp.stack([(px - W * 0.5) / focal,
                   -(py - H * 0.5) / focal,
                   -jnp.ones_like(px)], axis=-1)
    d = d.reshape(block_ids.shape[0], block * block, 3) @ rot.T
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


class BlockFrameRenderer:
    """Pose-in, image-out renderer over a baked instant field.

    Args:
      bfield: Field from bake.build_baked_field (apply_grouped required).
      spec: BakedSpec of the color table.
      H/W/focal: image geometry (H, W divisible by `block`).
      near/far: march range.
      k_fine: color samples per pixel (the slow-zone gather budget).
      n_probe: sigma-march bins per block ray.
      block: pixel tile edge (8 => one probe ray per 64 pixels).
      capacity_frac: fraction of blocks rendered (prefix after
        compaction); None disables block compaction.
      temper/w_floor: placement-CDF robustness knobs (see module doc).
      sigma_eps: occupancy threshold on marched sigma.
      chunk_blocks: fine-pass lax.map chunk (compile-size / HBM bound).
    """

    def __init__(self, bfield, spec: BakedSpec, *, H: int, W: int,
                 focal: float, near: float, far: float,
                 k_fine: int = 12, n_probe: int = 96, block: int = 8,
                 capacity_frac: Optional[float] = None,
                 temper: float = 0.7, w_floor: float = 0.15,
                 sigma_eps: float = 0.01,
                 bg_color=None, chunk_blocks: int = 1024):
        if H % block or W % block:
            raise ValueError(f"H={H}, W={W} must be divisible by "
                             f"block={block}")
        hb, wb = H // block, W // block
        nb = hb * wb
        bg = (jnp.ones((3,), jnp.float32) if bg_color is None
              else jnp.asarray(bg_color, jnp.float32))
        cdirs = _block_center_dirs(H, W, focal, block)
        # Round the block capacity UP to a chunk multiple; when that
        # exceeds the block count, the compaction prefix is padded with
        # the out-of-range id `nb`, whose scatter-back is dropped by
        # JAX's out-of-bounds-scatter semantics (and whose gathered
        # metadata clips to the last block, affecting nothing visible).
        chunk_blocks = min(chunk_blocks, nb)
        target = nb if capacity_frac is None \
            else max(1, min(nb, int(nb * capacity_frac)))
        n_chunks = -(-target // chunk_blocks)
        cap = n_chunks * chunk_blocks
        self.capacity = cap
        dbin = (far - near) / n_probe
        bsq = block * block

        def probe_and_place(baked, rot, cam, sres):
            """[NB] block rays -> (z [NB, k_fine], occ_far, valid)."""
            d = cdirs @ rot.T
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            zc = near + (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) \
                * dbin
            pts = cam[None, None, :] + d[:, None, :] * zc[None, :, None]
            sig = baked_sigma_tri(baked, pts.reshape(-1, 3), spec, sres) \
                .reshape(hb, wb, n_probe)
            # 3x3 block union: a surface any neighboring probe ray sees
            # stays reachable for every pixel of this block.
            sig = jax.lax.reduce_window(
                sig, -jnp.inf, jax.lax.max,
                window_dimensions=(3, 3, 1), window_strides=(1, 1, 1),
                padding="SAME").reshape(nb, n_probe)
            occ = sig > sigma_eps
            n_occ = jnp.sum(occ.astype(jnp.float32), axis=1)
            valid = n_occ > 0.0
            occ_far = occ[:, -1]

            alpha = 1.0 - jnp.exp(-sig * dbin)
            trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
            trans = jnp.concatenate(
                [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
            w = jnp.power(jnp.maximum(alpha * trans, 0.0), temper)
            w = w * occ.astype(jnp.float32)
            w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
            w = w + w_floor * occ.astype(jnp.float32) \
                / jnp.maximum(n_occ[:, None], 1.0)
            w = jnp.where(valid[:, None], w, 1.0 / n_probe)

            c = jnp.cumsum(w, axis=1)
            total = c[:, -1]
            iota = jnp.arange(n_probe, dtype=jnp.int32)
            cols = []
            wcols = []
            for j in range(k_fine):
                u = (j + 0.5) / k_fine * total
                b = jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1)
                b = jnp.minimum(b, n_probe - 1)
                onehot = (iota[None, :] == b[:, None])
                c_prev = jnp.sum(jnp.where(onehot, c - w, 0.0), axis=1)
                w_b = jnp.sum(jnp.where(onehot, w, 0.0), axis=1)
                frac = jnp.clip((u - c_prev)
                                / jnp.maximum(w_b, 1e-12), 0.0, 1.0)
                cols.append(near + (b.astype(jnp.float32) + frac) * dbin)
                wcols.append(w_b / jnp.maximum(total, 1e-12))
            z = jnp.stack(cols, axis=1)                    # [NB, k_fine]
            # Measure-consistent compositing distances: sample j carries
            # 1/k_fine of the placement-CDF mass, whose length along the
            # ray is dbin / (k_fine * pmf(slot_j)). z-difference distances
            # here would collapse alpha for clustered surface samples
            # (1 - exp(-sigma*dz) -> 0) — the exact failure the round-2
            # "importance" mode measured (AB_RESULTS.md negative result).
            w_s = jnp.stack(wcols, axis=1)                 # [NB, k_fine]
            dists = jnp.minimum(dbin / (k_fine *
                                        jnp.maximum(w_s, 1e-6)),
                                far - near)
            return z, dists, occ_far, valid

        def fine_chunk(baked, rot, cam, args):
            """One chunk of compacted blocks -> [cb, bsq, 3] rgb."""
            ids, z_b, dist_b, far_b, valid_b = args
            cb = chunk_blocks
            d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, block)
            z = jnp.broadcast_to(z_b[:, None, :], (cb, bsq, k_fine)) \
                .reshape(cb * bsq, k_fine)
            pts = cam[None, None, :] \
                + d_pix.reshape(-1, 3)[:, None, :] * z[..., None]
            rgb, sigma = bfield.apply_grouped(
                baked, pts.reshape(cb * bsq, k_fine, 3),
                d_pix.reshape(-1, 3))
            rgb = rgb.astype(jnp.float32).reshape(-1, k_fine, 3)
            sigma = sigma.astype(jnp.float32).reshape(-1, k_fine)
            vmask = jnp.broadcast_to(valid_b[:, None], (cb, bsq)) \
                .reshape(-1)
            sigma = sigma * vmask[:, None].astype(jnp.float32)

            dists = jnp.broadcast_to(dist_b[:, None, :],
                                     (cb, bsq, k_fine)) \
                .reshape(cb * bsq, k_fine)
            last = jnp.where(
                jnp.broadcast_to(far_b[:, None], (cb, bsq)).reshape(-1),
                1e10, dists[:, -1])
            dists = jnp.concatenate([dists[:, :-1], last[:, None]], axis=1)
            rgb_map, _, _, _ = composite(rgb, sigma, z,
                                         d_pix.reshape(-1, 3),
                                         bg_color=bg, dists=dists)
            return rgb_map.reshape(cb, bsq, 3)

        def one_frame(baked, pose, sres):
            rot = pose[:3, :3]
            cam = pose[:3, 3]
            z, dist_s, occ_far, valid = probe_and_place(baked, rot, cam,
                                                        sres)
            take, _ = _compact_indices(valid, min(cap, nb))
            if cap > nb:
                take = jnp.concatenate(
                    [take, jnp.full((cap - nb,), nb, jnp.int32)])
            z_c = jnp.take(z, take, axis=0, mode="clip")
            dist_c = jnp.take(dist_s, take, axis=0, mode="clip")
            far_c = jnp.take(occ_far, take, axis=0, mode="clip")
            val_c = jnp.take(valid, take, axis=0, mode="clip")

            def body(args):
                return fine_chunk(baked, rot, cam, args)

            rgb_c = jax.lax.map(body, (
                take.reshape(n_chunks, chunk_blocks),
                z_c.reshape(n_chunks, chunk_blocks, k_fine),
                dist_c.reshape(n_chunks, chunk_blocks, k_fine),
                far_c.reshape(n_chunks, chunk_blocks),
                val_c.reshape(n_chunks, chunk_blocks),
            )).reshape(cap, bsq, 3)

            img = jnp.broadcast_to(bg[None, None, :], (nb, bsq, 3))
            img = img.at[take].set(rgb_c)
            img = img.reshape(hb, wb, block, block, 3) \
                .transpose(0, 2, 1, 3, 4).reshape(H, W, 3)
            return img

        self._render_one = jax.jit(one_frame, static_argnames=("sres",))
        self._sres_cache = None

    def __call__(self, baked: dict, poses) -> jnp.ndarray:
        """Render poses [F, 4, 4] -> [F, H, W, 3]."""
        if self._sres_cache is None:
            self._sres_cache = sigma_cells_res(baked)
        poses = jnp.asarray(poses, jnp.float32)
        if poses.ndim == 2:
            poses = poses[None]
        return jnp.stack([
            self._render_one(baked, poses[i], self._sres_cache)
            for i in range(poses.shape[0])])

    def render_pose(self, baked: dict, pose) -> jnp.ndarray:
        """Render one pose -> [H, W, 3]."""
        return self(baked, jnp.asarray(pose)[None])[0]


def measure_occupied_block_fraction(bfield, baked, spec: BakedSpec, poses,
                                    *, H: int, W: int, focal: float,
                                    near: float, far: float,
                                    block: int = 8, n_probe: int = 96,
                                    sigma_eps: float = 0.01) -> float:
    """Max fraction of blocks whose probe sees sigma above threshold."""
    hb, wb = H // block, W // block
    cdirs = _block_center_dirs(H, W, focal, block)
    dbin = (far - near) / n_probe
    sres = sigma_cells_res(baked)

    @jax.jit
    def frac(pose):
        rot, cam = pose[:3, :3], pose[:3, 3]
        d = cdirs @ rot.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        zc = near + (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) * dbin
        pts = cam[None, None, :] + d[:, None, :] * zc[None, :, None]
        sig = baked_sigma_tri(baked, pts.reshape(-1, 3), spec, sres) \
            .reshape(hb, wb, n_probe)
        sig = jax.lax.reduce_window(
            sig, -jnp.inf, jax.lax.max, window_dimensions=(3, 3, 1),
            window_strides=(1, 1, 1), padding="SAME")
        return jnp.mean(jnp.any(sig > sigma_eps, axis=-1)
                        .astype(jnp.float32))

    return max(float(frac(jnp.asarray(p))) for p in poses)
