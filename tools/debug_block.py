"""Visual debug of the block renderer: dump block / cdf / target images
and error maps for one test pose, plus split-metric diagnostics
(occupied-block interior vs silhouette vs background error).

Usage: python -u tools/debug_block.py [--k 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--idx", type=int, default=0)
    ap.add_argument("--ckpt",
                    default="output/part2_instant/lego_proxy/best_model.pth")
    ap.add_argument("--data_dir", default="/tmp/lego_proxy")
    ap.add_argument("--out", default="/tmp/dbg_block")
    args = ap.parse_args()

    from nerf_tpu import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from nerf_tpu.data.blender import BlenderDataset
    from nerf_tpu.models import build_field
    from nerf_tpu.render.bake import (BakedSpec, bake_instant_field,
                                      build_baked_field)
    from nerf_tpu.render.block_fast import (BlockFrameRenderer,
                                            measure_occupied_block_fraction)
    from nerf_tpu.render.density_grid import DensityGridSpec
    from nerf_tpu.train.common import ImageRenderer
    from nerf_tpu.utils.checkpoint import load_checkpoint
    from nerf_tpu.utils.metrics import compute_psnr

    os.makedirs(args.out, exist_ok=True)
    ckpt = load_checkpoint(args.ckpt)
    cfg = ckpt["config"]
    field = build_field(cfg)
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
    grid_state = jax.tree.map(jnp.asarray, ckpt["density_grid"])
    binary = grid_state["binary"]
    bound = float(cfg.get("scene_bound", 1.5))
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128), bound,
                                cfg.get("grid_threshold", 0.01))
    near, far = float(cfg.get("near", 2.0)), float(cfg.get("far", 6.0))

    ds = BlenderDataset(args.data_dir, "test", cfg.get("downscale", 2),
                        cfg.get("white_bkgd", True),
                        cfg.get("scene_scale", 1.0))
    H = ds.H - ds.H % 8
    W = ds.W - ds.W % 8
    pose = np.asarray(ds.poses[args.idx])
    _, _, target = ds.get_image_rays(args.idx)
    tgt = np.asarray(target).reshape(ds.H, ds.W, 3)[:H, :W]

    bspec = BakedSpec(resolution=384, bound=bound)
    baked = bake_instant_field(field, params, bspec, dtype=jnp.int8,
                               grid_binary=binary, grid_spec=grid_spec)
    bfield = build_baked_field(bspec, L_dir=cfg.get("L_embed_dir", 4))

    frac = measure_occupied_block_fraction(
        bfield, baked, bspec, [pose], H=H, W=W, focal=float(ds.focal),
        near=near, far=far)
    print(f"occupied block fraction: {frac:.3f}", flush=True)

    br = BlockFrameRenderer(bfield, bspec, H=H, W=W, focal=float(ds.focal),
                            near=near, far=far, k_fine=args.k,
                            capacity_frac=min(1.0, frac + 0.05))
    img_b = np.clip(np.asarray(br.render_pose(baked, pose)), 0, 1)

    # Reference: baked field through the per-pixel occupancy-CDF renderer.
    from nerf_tpu.render.rays import camera_directions, rays_from_pose
    dirs = camera_directions(H, W, float(ds.focal))
    ro, rd = rays_from_pose(dirs, jnp.asarray(pose, jnp.float32))
    ir = ImageRenderer(bfield, near=near, far=far, n_samples=args.k,
                       chunk=65536, grid_spec=grid_spec, sampling="cdf")
    img_c = np.clip(np.asarray(
        ir(baked, ro, rd, grid_binary=binary, bg_color=jnp.ones(3))), 0, 1)

    for name, img in (("block", img_b), ("cdf", img_c), ("target", tgt)):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            f"{args.out}/{name}.png")
    for name, img in (("block", img_b), ("cdf", img_c)):
        err = np.abs(img - tgt).mean(-1)
        Image.fromarray(
            (np.clip(err * 4, 0, 1) * 255).astype(np.uint8)).save(
            f"{args.out}/err_{name}.png")
        mse = float(np.mean((img - tgt) ** 2))
        print(f"{name:6s} PSNR {compute_psnr(mse):6.2f} dB", flush=True)
        # error split: background (target white) vs object pixels
        is_bg = np.all(tgt > 0.999, axis=-1)
        for zone, m in (("bg", is_bg), ("obj", ~is_bg)):
            e = float(np.mean(((img - tgt) ** 2)[m]))
            print(f"   {zone}: mse {e:.5f} ({m.mean()*100:.0f}% px, "
                  f"{compute_psnr(e):5.2f} dB)", flush=True)


if __name__ == "__main__":
    main()
