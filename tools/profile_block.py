"""Stage-level timing of the block-structured hierarchical render path.

Stages (mirroring render/block_fast.py): block probe (sigma march +
3x3 pool), coarse per-pixel sigma at CDF depths, fine-placement CDF
loop, fine pass (color rows + grouped MLP + composite), synthetic
gather floor, and the whole compiled frame.

Methodology (memory: tpu-v5e-performance-model): one jit per stage
with `baked` as an explicit argument (captured multi-GB constants get
embedded in the executable and have broken the remote-compile tunnel),
varied inputs every timed call (the tunnel memoizes), float() digest
sync, measured null-dispatch overhead subtracted.

Usage: python -u tools/profile_block.py [--k1 32] [--k2 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=32)
    ap.add_argument("--k2", type=int, default=12)
    ap.add_argument("--probes", type=int, default=96)
    ap.add_argument("--sigres", type=int, default=224)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ckpt",
                    default="output/part2_instant/lego_proxy/best_model.pth")
    args = ap.parse_args()

    from nerf_tpu import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.models import build_field
    from nerf_tpu.render.bake import (BakedSpec, bake_instant_field,
                                      build_baked_field, baked_sigma_tri,
                                      sigma_cells_res)
    from nerf_tpu.render.density_grid import DensityGridSpec
    from nerf_tpu.render.rays import orbit_poses
    from nerf_tpu.render.block_fast import (BlockFrameRenderer,
                                            measure_occupied_block_fraction,
                                            _block_center_dirs,
                                            _pixel_dirs_for_blocks)
    from nerf_tpu.render.renderer import _resample_from_weights
    from nerf_tpu.ops.volume import composite
    from nerf_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = ckpt["config"]
    field = build_field(cfg)
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
    grid_state = jax.tree.map(jnp.asarray, ckpt["density_grid"])
    binary = grid_state["binary"]
    bound = float(cfg.get("scene_bound", 1.5))
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128), bound,
                                cfg.get("grid_threshold", 0.01))
    bspec = BakedSpec(resolution=args.res, bound=bound)
    t0 = time.perf_counter()
    baked = bake_instant_field(field, params, bspec, dtype=jnp.int8,
                               grid_binary=binary, grid_spec=grid_spec,
                               sigma_res=args.sigres)
    jax.block_until_ready(baked["cells"])
    print(f"bake: {time.perf_counter()-t0:.1f} s", flush=True)
    bfield = build_baked_field(bspec, L_dir=cfg.get("L_embed_dir", 4))

    H = W = 800
    focal = 0.5 * W / np.tan(0.4)
    near, far = 2.0, 6.0
    poses = orbit_poses(8, radius=4.0, center=[0, 0, 0], height=1.0)
    sres = sigma_cells_res(baked)
    pose = jnp.asarray(poses[0], jnp.float32)
    k1, k2 = args.k1, args.k2
    n_probe = args.probes
    dbin = (far - near) / n_probe

    null = jax.jit(lambda p: jnp.sum(p))
    float(null(pose))
    t0 = time.perf_counter()
    for i in range(args.reps):
        float(null(pose + i * 1e-6))
    overhead = (time.perf_counter() - t0) / args.reps
    print(f"dispatch+sync overhead: {overhead*1e3:.1f} ms", flush=True)

    def timed(name, fn, reps=None):
        """Pipelined timing: all reps dispatch back-to-back (the bench's
        regime — dispatch latency overlaps device compute), ONE sync at
        the end; the single sync cost is subtracted."""
        reps = reps or args.reps
        f = jax.jit(fn)
        float(f(baked, pose, 99))  # compile + warm
        t0 = time.perf_counter()
        outs = [f(baked, pose, i) for i in range(reps)]
        float(jnp.stack(outs).sum())
        dt = ((time.perf_counter() - t0) - overhead) / reps
        print(f"{name:40s} {dt*1e3:8.1f} ms", flush=True)
        return dt

    frac = measure_occupied_block_fraction(
        bfield, baked, bspec, poses, H=H, W=W, focal=focal,
        near=near, far=far, block=args.block, n_probe=n_probe)
    print(f"occupied block fraction: {frac:.3f}", flush=True)
    r = BlockFrameRenderer(bfield, bspec, H=H, W=W, focal=focal,
                           near=near, far=far, k_coarse=k1, k_fine=k2,
                           n_probe=n_probe, block=args.block,
                           capacity_frac=min(1.0, frac + 0.05))
    hb, wb = H // args.block, W // args.block
    nb = hb * wb
    cap = r.capacity
    bsq = args.block * args.block
    print(f"capacity: {cap} blocks of {nb}", flush=True)

    # whole frame (the renderer's own jit), pipelined like the bench
    dig = jax.jit(lambda im: jnp.sum(im[::63, ::63]))
    float(dig(r._render_one(baked, pose, sres)))
    t0 = time.perf_counter()
    outs = [dig(r._render_one(baked, pose + i * 1e-6, sres))
            for i in range(args.reps)]
    float(jnp.stack(outs).sum())
    dt = ((time.perf_counter() - t0) - overhead) / args.reps
    print(f"{'whole frame':40s} {dt*1e3:8.1f} ms", flush=True)

    cdirs = _block_center_dirs(H, W, focal, args.block)

    def probe(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d = cdirs @ rot.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        zc = near + (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) * dbin
        pts = cam[None, None, :] + d[:, None, :] * zc[None, :, None] \
            + i * 1e-6
        sig = baked_sigma_tri(bk, pts.reshape(-1, 3), bspec, sres) \
            .reshape(hb, wb, n_probe)
        sig = jax.lax.reduce_window(
            sig, -jnp.inf, jax.lax.max, window_dimensions=(3, 3, 1),
            window_strides=(1, 1, 1), padding="SAME")
        return jnp.sum(sig[::7, ::7, ::13])
    timed("probe (block sigma march + pool)", probe)

    ids = jnp.arange(cap, dtype=jnp.int32) % nb
    occ_b = jnp.ones((cap, n_probe), bool)

    def coarse(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, args.block)
        occ_f = occ_b.astype(jnp.float32)
        n_occ = jnp.sum(occ_f, axis=1)
        c = jnp.cumsum(occ_f, axis=1)
        cols = []
        for j in range(k1):
            u = (j + 0.5) / k1 * n_occ
            b = jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1)
            cols.append(jnp.minimum(b, n_probe - 1))
        idx_c = jnp.stack(cols, axis=1)
        z_c = near + (idx_c.astype(jnp.float32) + 0.5) * dbin + i * 1e-6
        z_cp = jnp.broadcast_to(z_c[:, None, :], (cap, bsq, k1)) \
            .reshape(cap * bsq, k1)
        pts = cam[None, None, :] \
            + d_pix.reshape(-1, 3)[:, None, :] * z_cp[..., None]
        sig = baked_sigma_tri(bk, pts.reshape(-1, 3), bspec, sres)
        return jnp.sum(sig[::4097])
    timed(f"coarse sigma ({cap*bsq*k1/1e6:.0f}M pts)", coarse)

    w_fix = jnp.abs(jnp.sin(jnp.arange(cap * bsq * k1,
                                       dtype=jnp.float32))) \
        .reshape(cap * bsq, k1) + 1e-3
    z_fix = jnp.linspace(near, far, k1)[None, :].repeat(cap * bsq, 0)

    def place(bk, p, i):
        z_f, dist_f = _resample_from_weights(z_fix + i * 1e-6, w_fix, k2,
                                             floor=0.0, return_dists=True)
        return jnp.sum(z_f[::4097]) + jnp.sum(dist_f[::8191]) \
            + jnp.sum(p) + jnp.float32(bk["qscale"][0])
    timed(f"fine placement CDF ({k2} of {k1})", place)

    z_b = jnp.linspace(near, far, k2, dtype=jnp.float32)[None, :] \
        .repeat(cap, axis=0)

    def fine(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, args.block)
        z = jnp.broadcast_to(z_b[:, None, :], (cap, bsq, k2)) \
            .reshape(cap * bsq, k2) + i * 1e-6
        pts = cam[None, None, :] + d_pix.reshape(-1, 3)[:, None, :] \
            * z[..., None]
        rgb, sigma = bfield.apply_grouped(
            bk, pts.reshape(cap * bsq, k2, 3), d_pix.reshape(-1, 3))
        rgb = rgb.astype(jnp.float32).reshape(-1, k2, 3)
        sigma = sigma.astype(jnp.float32).reshape(-1, k2)
        diffs = z[:, 1:] - z[:, :-1]
        dists = jnp.concatenate([diffs, jnp.full_like(diffs[:, :1], dbin)],
                                axis=1)
        rgb_map, _, _, _ = composite(rgb, sigma, z, d_pix.reshape(-1, 3),
                                     bg_color=jnp.ones(3), dists=dists)
        return jnp.sum(rgb_map[::97])
    timed(f"fine pass ({cap*bsq*k2/1e6:.0f}M pts)", fine)

    # Trilerp strategy A/B (bake._baked_trilerp_mode reads the env at
    # trace time; `timed` re-jits per call, so this re-traces cleanly).
    for mode in ("fold", "foldf32"):
        os.environ["BAKED_TRILERP"] = mode
        timed(f"fine pass, trilerp={mode}", fine)
    os.environ.pop("BAKED_TRILERP", None)

    # --- decompositions ---
    from nerf_tpu.render.bake import bake_sigma_cells
    r_bake = bspec.resolution
    sig192 = bake_sigma_cells(
        baked["sigma_vol"].reshape(r_bake, r_bake, r_bake), bspec,
        sigma_res=192)
    baked192 = dict(baked, sigma_cells=sig192["sigma_cells"])

    def coarse192(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, args.block)
        z_c = jnp.linspace(near, far, k1)[None, :].repeat(cap, 0) + i * 1e-6
        z_cp = jnp.broadcast_to(z_c[:, None, :], (cap, bsq, k1)) \
            .reshape(cap * bsq, k1)
        pts = cam[None, None, :] \
            + d_pix.reshape(-1, 3)[:, None, :] * z_cp[..., None]
        sig = baked_sigma_tri(baked192, pts.reshape(-1, 3), bspec, 192)
        return jnp.sum(sig[::4097]) + jnp.float32(bk["qscale"][0])
    timed(f"coarse sigma at sigres=192 (56 MB)", coarse192)

    def fine_rows_only(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, args.block)
        z = jnp.broadcast_to(z_b[:, None, :], (cap, bsq, k2)) \
            .reshape(cap * bsq, k2) + i * 1e-6
        pts = cam[None, None, :] + d_pix.reshape(-1, 3)[:, None, :] \
            * z[..., None]
        from nerf_tpu.render.bake import baked_h
        h = baked_h(bk, pts.reshape(-1, 3), bspec)
        return jnp.sum(h[::4097])
    timed("fine rows+trilerp only (no MLP)", fine_rows_only)

    n_pts = cap * bsq * k2
    rows_idx = jnp.asarray(
        (np.arange(n_pts, dtype=np.uint64) * 2654435761)
        % baked["cells"].shape[0], jnp.int32)

    def gather_only(bk, p, i):
        idx = (rows_idx + i) % bk["cells"].shape[0]
        rows = jnp.take(bk["cells"], idx, axis=0)
        return jnp.sum(rows[::4097].astype(jnp.float32)) + jnp.sum(p)
    timed(f"gather floor ({n_pts/1e6:.1f}M rows)", gather_only)


if __name__ == "__main__":
    main()
