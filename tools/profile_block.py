"""Stage-level timing of the block-structured render path on the TPU.

Methodology (memory: tpu-v5e-performance-model): each stage is ONE jit
(no fori_loop chaining — giant chained graphs compile pathologically on
the remote compiler). Every timed call perturbs its input so the tunnel
cannot memoize, and ends in float() on a small digest. A null-jit call
measures the ~30 ms dispatch+sync overhead, which is subtracted.

Usage: python -u tools/profile_block.py [--k 16] [--probes 96]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--probes", type=int, default=96)
    ap.add_argument("--sigres", type=int, default=224)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--block", type=int, default=8)
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

    null = jax.jit(lambda p: jnp.sum(p))
    float(null(pose))
    t0 = time.perf_counter()
    for i in range(5):
        float(null(pose + i * 1e-6))
    overhead = (time.perf_counter() - t0) / 5
    print(f"dispatch+sync overhead: {overhead*1e3:.1f} ms", flush=True)

    def timed(name, fn, reps=5):
        # `baked` rides as an explicit jit argument: captured multi-GB
        # constants get embedded in the executable and shipped through the
        # remote-compile tunnel (which they have broken before).
        f = jax.jit(fn)
        float(f(baked, pose, 99))  # compile + warm
        t0 = time.perf_counter()
        for i in range(reps):
            float(f(baked, pose, i))
        dt = (time.perf_counter() - t0) / reps - overhead
        print(f"{name:36s} {dt*1e3:8.1f} ms", flush=True)
        return dt

    frac = measure_occupied_block_fraction(
        bfield, baked, bspec, poses, H=H, W=W, focal=focal,
        near=near, far=far, block=args.block, n_probe=args.probes)
    print(f"occupied block fraction: {frac:.3f}", flush=True)
    r = BlockFrameRenderer(bfield, bspec, H=H, W=W, focal=focal,
                           near=near, far=far, k_fine=args.k,
                           n_probe=args.probes, block=args.block,
                           capacity_frac=min(1.0, frac + 0.05))
    hb, wb = H // args.block, W // args.block
    nb = hb * wb
    cap = r.capacity
    print(f"capacity: {cap} blocks of {nb}", flush=True)

    # whole frame (the renderer's own jit)
    float(jnp.sum(r._render_one(baked, pose, sres)[::63, ::63]))
    t0 = time.perf_counter()
    for i in range(5):
        img = r._render_one(baked, pose + i * 1e-6, sres)
        float(jnp.sum(img[::63, ::63]))
    dt = (time.perf_counter() - t0) / 5 - overhead
    print(f"{'whole frame':36s} {dt*1e3:8.1f} ms", flush=True)

    cdirs = _block_center_dirs(H, W, focal, args.block)
    dbin = (far - near) / args.probes

    def probe_march(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d = cdirs @ rot.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        zc = near + (jnp.arange(args.probes, dtype=jnp.float32) + 0.5) * dbin
        pts = cam[None, None, :] + d[:, None, :] * zc[None, :, None] + i * 1e-6
        sig = baked_sigma_tri(bk, pts.reshape(-1, 3), bspec, sres) \
            .reshape(hb, wb, args.probes)
        sig = jax.lax.reduce_window(
            sig, -jnp.inf, jax.lax.max, window_dimensions=(3, 3, 1),
            window_strides=(1, 1, 1), padding="SAME")
        return jnp.sum(sig[::7, ::7, ::13])
    timed("probe march (sigma+pool)", probe_march)

    def probe_place(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d = cdirs @ rot.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        zc = near + (jnp.arange(args.probes, dtype=jnp.float32) + 0.5) * dbin
        pts = cam[None, None, :] + d[:, None, :] * zc[None, :, None] + i * 1e-6
        sig = baked_sigma_tri(bk, pts.reshape(-1, 3), bspec, sres) \
            .reshape(hb, wb, args.probes)
        sig = jax.lax.reduce_window(
            sig, -jnp.inf, jax.lax.max, window_dimensions=(3, 3, 1),
            window_strides=(1, 1, 1), padding="SAME").reshape(nb, args.probes)
        occ = sig > 0.01
        alpha = 1.0 - jnp.exp(-sig * dbin)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        w = jnp.power(jnp.maximum(alpha * trans, 0.0), 0.7)
        w = w * occ.astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        c = jnp.cumsum(w, axis=1)
        total = c[:, -1]
        acc = jnp.float32(0.0)
        for j in range(args.k):
            u = (j + 0.5) / args.k * total
            b = jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1)
            acc = acc + jnp.sum(b[::101].astype(jnp.float32))
        return acc
    timed("probe + full placement CDF", probe_place)

    bsq = args.block * args.block
    ids = jnp.arange(cap, dtype=jnp.int32) % nb
    z_b = jnp.linspace(near, far, args.k, dtype=jnp.float32)[None, :] \
        .repeat(cap, axis=0)

    def fine(bk, p, i):
        rot, cam = p[:3, :3], p[:3, 3]
        d_pix = _pixel_dirs_for_blocks(ids, rot, H, W, focal, args.block)
        z = jnp.broadcast_to(z_b[:, None, :], (cap, bsq, args.k)) \
            .reshape(cap * bsq, args.k) + i * 1e-6
        pts = cam[None, None, :] + d_pix.reshape(-1, 3)[:, None, :] \
            * z[..., None]
        rgb, sigma = bfield.apply_grouped(
            bk, pts.reshape(cap * bsq, args.k, 3), d_pix.reshape(-1, 3))
        rgb = rgb.astype(jnp.float32).reshape(-1, args.k, 3)
        sigma = sigma.astype(jnp.float32).reshape(-1, args.k)
        diffs = z[:, 1:] - z[:, :-1]
        dists = jnp.concatenate([diffs, jnp.full_like(diffs[:, :1], dbin)],
                                axis=1)
        rgb_map, _, _, _ = composite(rgb, sigma, z, d_pix.reshape(-1, 3),
                                     bg_color=jnp.ones(3), dists=dists)
        return jnp.sum(rgb_map[::97])
    timed("fine pass (rows+MLP+composite)", fine)

    n_pts = cap * bsq * args.k
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
