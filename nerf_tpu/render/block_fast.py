"""Block-structured hierarchical fast rendering: the production bench path.

The measured v5e cost model (memory: tpu-v5e-performance-model) is
descriptor-rate gathers: ~10.8 ns/row from the multi-GB baked color table,
~2.16 ns/row from tables under ~96 MB, scalars ~8 ns everywhere, scatters
like slow gathers. The round-2 fast path spent most of its frame on
gathers that were NOT field evaluations: per-pixel CDF materialization, a
640k-ray compaction (scatter + five per-ray takes, ~94 ms), and a coarse
march of per-point SCALAR gathers (~8 ns each, ~118 ms).

This renderer restructures the frame into three rates so that the only
slow-zone gathers are the k_fine color rows that produce the image, and
every other memory access is either block-rate or fast-zone:

  * PROBE at 8x8-pixel block rate: one ray per block marches `n_probe`
    bins against the fast-zone sigma table (bake.baked_sigma_tri, one
    ~2 ns 128-lane row per point), and the occupancy profile is
    3x3-max-pooled so a surface any neighboring block sees stays
    reachable for every pixel (silhouette conservatism).
  * COMPACTION at block rate: a ~10k-element counting-sort prefix instead
    of 640k rays; per-pixel rays are reconstructed from block ids by iota
    arithmetic (zero gathers).
  * COARSE pass per pixel: k_coarse depths shared per block at the
    quantiles of the block's occupied-bin CDF (never in inter-object
    gaps), but sigma evaluated PER PIXEL from the fast-zone table — the
    same two-pass scheme that measures 26.3 dB at k=32+12 through the
    per-ray hier path (AB_RESULTS.md hierS rows), here at ~2.16 ns/pt.
  * FINE pass per pixel: k_fine depths by inverse-CDF of the coarse
    transmittance weights (tempered + floored), evaluated on the baked
    color field (the only big-table gathers), composited with
    MEASURE-CONSISTENT distances — each sample carries 1/k_fine of the
    placement-CDF mass as ray length. z-difference distances here
    collapse alpha for clustered surface samples (the round-2
    "importance" negative result, AB_RESULTS.md).

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
from .renderer import _compact_indices, _resample_from_weights
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
      k_coarse: sigma-march samples per pixel (fast-zone row gathers).
      k_fine: color samples per pixel (the slow-zone gather budget).
      n_probe: block-probe march bins.
      block: pixel tile edge (8 => one probe ray per 64 pixels).
      capacity_frac: fraction of blocks rendered (prefix after
        compaction); None disables block compaction.
      temper/w_floor: placement-pdf robustness knobs — w^temper flattens
        an over-sharp coarse profile, the floor keeps every coarse sample
        reachable (AB_RESULTS.md hierS rows measured with 0.7 / 0.15).
      sigma_eps: occupancy threshold on probed sigma.
      chunk_blocks: fine-pass lax.map chunk (compile-size / HBM bound).
    """

    def __init__(self, bfield, spec: BakedSpec, *, H: int, W: int,
                 focal: float, near: float, far: float,
                 k_coarse: int = 32, k_fine: int = 12, n_probe: int = 96,
                 block: int = 8, capacity_frac: Optional[float] = None,
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
        k1, k2 = k_coarse, k_fine

        def probe(baked, rot, cam, sres):
            """Block-rate occupancy profile: occ [NB, P], occ_far, valid."""
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
            valid = jnp.any(occ, axis=1)
            return occ, occ[:, -1], valid

        def fine_chunk(baked, rot, cam, sres, args):
            """One chunk of compacted blocks -> [cb, bsq, 3] rgb."""
            ids, occ_b, far_b, valid_b = args
            cb = chunk_blocks
            d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, block)

            # Coarse depths per block: quantiles of the occupied-bin CDF
            # (never in gaps), shared by the block's pixels.
            occ_f = occ_b.astype(jnp.float32)
            n_occ = jnp.sum(occ_f, axis=1)                 # [cb]
            c = jnp.cumsum(occ_f, axis=1)
            iota = jnp.arange(n_probe, dtype=jnp.int32)
            cols = []
            for j in range(k1):
                u = (j + 0.5) / k1 * n_occ
                b = jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1)
                cols.append(jnp.minimum(b, n_probe - 1))
            idx_c = jnp.stack(cols, axis=1)                # [cb, k1]
            z_c = near + (idx_c.astype(jnp.float32) + 0.5) * dbin

            # Per-pixel sigma at the shared coarse depths (fast-zone rows).
            z_cp = jnp.broadcast_to(z_c[:, None, :], (cb, bsq, k1)) \
                .reshape(cb * bsq, k1)
            pts_c = cam[None, None, :] \
                + d_pix.reshape(-1, 3)[:, None, :] * z_cp[..., None]
            sig_c = baked_sigma_tri(baked, pts_c.reshape(-1, 3), spec,
                                    sres).reshape(cb * bsq, k1)
            vmask = jnp.broadcast_to(valid_b[:, None], (cb, bsq)) \
                .reshape(-1).astype(jnp.float32)
            sig_c = sig_c * vmask[:, None]

            # Transmittance weights over the coarse set with
            # measure-preserving coarse dists (n_occ*dbin/k1), tempered +
            # floored for robustness against the table's band limit.
            dist_c = jnp.broadcast_to(
                (n_occ * dbin / k1)[:, None, None], (cb, bsq, k1)) \
                .reshape(cb * bsq, k1)
            alpha_c = 1.0 - jnp.exp(-sig_c * dist_c)
            trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
            trans_c = jnp.concatenate(
                [jnp.ones_like(trans_c[:, :1]), trans_c[:, :-1]], axis=-1)
            w_c = jnp.power(jnp.maximum(alpha_c * trans_c, 0.0), temper)
            w_c = w_c / jnp.maximum(jnp.sum(w_c, axis=1, keepdims=True),
                                    1e-12)
            w_c = w_c + w_floor / k1

            # Fine depths per pixel by inverse-CDF, with the
            # measure-consistent compositing distances.
            z_f, dist_f = _resample_from_weights(z_cp, w_c, k2, floor=0.0,
                                                 return_dists=True)

            pts = cam[None, None, :] \
                + d_pix.reshape(-1, 3)[:, None, :] * z_f[..., None]
            rgb, sigma = bfield.apply_grouped(
                baked, pts.reshape(cb * bsq, k2, 3), d_pix.reshape(-1, 3))
            rgb = rgb.astype(jnp.float32).reshape(-1, k2, 3)
            sigma = sigma.astype(jnp.float32).reshape(-1, k2)
            sigma = sigma * vmask[:, None]

            last = jnp.where(
                jnp.broadcast_to(far_b[:, None], (cb, bsq)).reshape(-1),
                1e10, dist_f[:, -1])
            dists = jnp.concatenate([dist_f[:, :-1], last[:, None]],
                                    axis=1)
            rgb_map, _, _, _ = composite(rgb, sigma, z_f,
                                         d_pix.reshape(-1, 3),
                                         bg_color=bg, dists=dists)
            return rgb_map.reshape(cb, bsq, 3)

        def one_frame(baked, pose, sres):
            rot = pose[:3, :3]
            cam = pose[:3, 3]
            occ, occ_far, valid = probe(baked, rot, cam, sres)
            take, _ = _compact_indices(valid, min(cap, nb))
            if cap > nb:
                take = jnp.concatenate(
                    [take, jnp.full((cap - nb,), nb, jnp.int32)])
            occ_c = jnp.take(occ, take, axis=0, mode="clip")
            far_c = jnp.take(occ_far, take, axis=0, mode="clip")
            val_c = jnp.take(valid, take, axis=0, mode="clip")

            def body(args):
                return fine_chunk(baked, rot, cam, sres, args)

            rgb_c = jax.lax.map(body, (
                take.reshape(n_chunks, chunk_blocks),
                occ_c.reshape(n_chunks, chunk_blocks, n_probe),
                far_c.reshape(n_chunks, chunk_blocks),
                val_c.reshape(n_chunks, chunk_blocks),
            )).reshape(cap, bsq, 3)

            img = jnp.broadcast_to(bg[None, None, :], (nb, bsq, 3))
            img = img.at[take].set(rgb_c)
            img = img.reshape(hb, wb, block, block, 3) \
                .transpose(0, 2, 1, 3, 4).reshape(H, W, 3)
            return img

        self._render_one = jax.jit(one_frame, static_argnames=("sres",))

        def many_frames(baked, poses, sres):
            return jax.lax.map(lambda p: one_frame(baked, p, sres), poses)

        self._render_many = jax.jit(many_frames,
                                    static_argnames=("sres",))
        self._one_frame_fn = one_frame
        self._sharded_cache = {}
        self._sres_cache = None

    def __call__(self, baked: dict, poses,
                 single_dispatch: bool = False) -> jnp.ndarray:
        """Render poses [F, 4, 4] -> [F, H, W, 3].

        Per-frame dispatches pipeline on the device (only syncs
        serialize), so the python loop is the default. `single_dispatch`
        folds all frames into ONE program via lax.map — for links where
        per-dispatch host latency (~50-100 ms here) stops hiding behind
        the ~100 ms/frame device time.
        """
        if self._sres_cache is None:
            self._sres_cache = sigma_cells_res(baked)
        poses = jnp.asarray(poses, jnp.float32)
        if poses.ndim == 2:
            poses = poses[None]
        if single_dispatch:
            return self._render_many(baked, poses, self._sres_cache)
        return jnp.stack([
            self._render_one(baked, poses[i], self._sres_cache)
            for i in range(poses.shape[0])])

    def render_pose(self, baked: dict, pose) -> jnp.ndarray:
        """Render one pose -> [H, W, 3]."""
        return self(baked, jnp.asarray(pose)[None])[0]

    def render_sharded(self, baked: dict, poses, mesh,
                       axis: str = "data") -> jnp.ndarray:
        """Render poses [F, 4, 4] frame-parallel over a device mesh.

        Frames are embarrassingly parallel, so the scaling story is pure
        data parallelism over the pose axis: baked tables replicated,
        each device lax.map-renders its F/n_dev local frames, zero
        collectives (the reference renders video strictly serially on
        one GPU — run.py:736-813 / 2121-2160). F is padded to a multiple
        of the mesh size with the last pose and sliced back.
        """
        from jax.sharding import PartitionSpec as P

        if self._sres_cache is None:
            self._sres_cache = sigma_cells_res(baked)
        sres = self._sres_cache
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        # Stable mesh identity (device ids + axes), not id(mesh): a GC'd
        # Mesh's id can be reused by a new mesh with different devices,
        # which would silently replay a stale compiled program.
        mesh_key = (tuple(d.id for d in mesh.devices.flat),
                    tuple(mesh.axis_names),
                    tuple(mesh.devices.shape))
        key = (mesh_key, axis, sres)
        if key not in self._sharded_cache:
            one_frame = self._one_frame_fn

            def local_frames(baked, poses):          # [f_local, 4, 4]
                return jax.lax.map(
                    lambda p: one_frame(baked, p, sres), poses)

            fn = jax.shard_map(
                local_frames, mesh=mesh,
                in_specs=(P(), P(axis)), out_specs=P(axis))
            self._sharded_cache[key] = jax.jit(fn)

        poses = jnp.asarray(poses, jnp.float32)
        if poses.ndim == 2:
            poses = poses[None]
        f = poses.shape[0]
        pad = (-f) % n_dev
        if pad:
            poses = jnp.concatenate(
                [poses, jnp.broadcast_to(poses[-1:], (pad, 4, 4))])
        return self._sharded_cache[key](baked, poses)[:f]


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
