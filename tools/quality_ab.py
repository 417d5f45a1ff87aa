"""Quality/speed A/B harness for the render paths on a TRAINED checkpoint.

Measures, on the same checkpoint (so speed and quality come from one
artifact):
  * test-set PSNR of: dense masked rendering (the semantics baseline),
    interval sampling at several per-ray budgets, render-time LOD levels,
    and the baked field at several resolutions;
  * 800x800 render FPS for each variant (orbit poses, tunnel-safe timing).

Usage:
  python tools/quality_ab.py --ckpt output/part2_instant/lego_proxy/best_model.pth \
      --data_dir /tmp/lego_proxy [--n_images 8] [--out AB_RESULTS.md]

Writes a markdown table and prints it.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def psnr_over_split(renderer, params, dataset, indices, binary,
                    density=None):
    from nerf_tpu.utils.metrics import compute_psnr
    ps = []
    for i in indices:
        rays_o, rays_d, target = dataset.get_image_rays(i)
        pred = renderer(params, rays_o, rays_d, grid_binary=binary,
                        grid_density=density)
        pred = jnp.clip(pred, 0.0, 1.0)
        mse = float(jnp.mean((pred - target) ** 2))
        ps.append(compute_psnr(mse))
    return float(np.mean(ps))


def fps_at_800(renderer, params, binary, density=None, n_frames=3):
    from nerf_tpu.render.rays import (camera_directions, orbit_poses,
                                      rays_from_pose)
    H = W = 800
    poses = orbit_poses(n_frames + 1, radius=4.0, center=[0, 0, 0],
                        height=1.0)
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.4))
    make_rays = jax.jit(lambda p: rays_from_pose(dirs, p))
    rays = [make_rays(jnp.asarray(p)) for p in poses]
    digest = jax.jit(lambda *im: sum(jnp.sum(i[::63, ::63]) for i in im))
    img = renderer(params, rays[0][0], rays[0][1], grid_binary=binary,
                   grid_density=density)
    float(digest(img))
    t0 = time.perf_counter()
    frames = [renderer(params, rays[i][0], rays[i][1], grid_binary=binary,
                       grid_density=density)
              for i in range(1, 1 + n_frames)]
    float(digest(*frames))
    return n_frames / (time.perf_counter() - t0)


def fps_fast(field, params, binary, grid_spec, *, k1, k2, near, far,
             block=8, n_probe=96, dilate=1, fine_mask=False,
             capacity=True, n_frames=6, chunk=65536,
             hier_coarse="auto"):
    """FPS of the production FrameRenderer path (frame-batched dispatch,
    in-graph rays, occupied-ray compaction, hierarchical sampling)."""
    from nerf_tpu.render.fast import FrameRenderer, \
        measure_occupied_fraction
    from nerf_tpu.render.rays import orbit_poses
    H = W = 800
    focal = 0.5 * W / np.tan(0.4)
    poses = orbit_poses(1 + n_frames, radius=4.0, center=[0, 0, 0],
                        height=1.0)
    cap = None
    if capacity:
        frac = measure_occupied_fraction(
            binary, grid_spec, poses, H=H, W=W, focal=focal, near=near,
            far=far, block=block, n_probe=n_probe, dilate=dilate)
        cap = min(1.0, frac + 0.05)
    fr = FrameRenderer(field, H=H, W=W, focal=focal, near=near, far=far,
                       k_coarse=k1, k_fine=k2, chunk=chunk,
                       grid_spec=grid_spec, probe_block=block,
                       n_probe=n_probe, dilate=dilate, capacity_frac=cap,
                       fine_mask=fine_mask, hier_coarse=hier_coarse)
    digest = jax.jit(lambda f: jnp.sum(f[:, ::63, ::63]))
    float(digest(fr(params, poses[:1], grid_binary=binary)))
    t0 = time.perf_counter()
    float(digest(fr(params, poses[1:], grid_binary=binary)))
    return n_frames / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--n_images", type=int, default=8)
    ap.add_argument("--out", default="AB_RESULTS.md")
    ap.add_argument("--fps", action="store_true",
                    help="also measure 800x800 FPS per variant")
    ap.add_argument("--only", default=None,
                    help="run only variants whose name contains this")
    args = ap.parse_args()

    from nerf_tpu.data.blender import BlenderDataset
    from nerf_tpu.models import build_field
    from nerf_tpu.render.bake import (BakedSpec, bake_instant_field,
                                      build_baked_field)
    from nerf_tpu.render.density_grid import DensityGridSpec
    from nerf_tpu.train.common import ImageRenderer
    from nerf_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = ckpt["config"]
    field = build_field(cfg)
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
    grid_state = jax.tree.map(jnp.asarray, ckpt["density_grid"]) \
        if "density_grid" in ckpt else None
    binary = grid_state["binary"] if grid_state else None
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128),
                                cfg.get("scene_bound", 1.5),
                                cfg.get("grid_threshold", 0.01))
    near, far = float(cfg.get("near", 2.0)), float(cfg.get("far", 6.0))
    n_samples = cfg.get("render_n_samples", cfg.get("n_samples", 128))
    L_dir = cfg.get("L_embed_dir", 4)

    test_set = BlenderDataset(args.data_dir, "test",
                              cfg.get("downscale", 1),
                              cfg.get("white_bkgd", True),
                              cfg.get("scene_scale", 1.0))
    idxs = list(range(min(args.n_images, len(test_set))))
    print(f">>> checkpoint step {ckpt.get('step')} | "
          f"active ratio {float(binary.mean()):.3f} | "
          f"{len(idxs)} test images at {test_set.W}x{test_set.H}")

    rows = []

    density = grid_state["grid"] if grid_state else None

    def add(name, renderer, p=params, dens=None, fast=None):
        """fast=(field, k1, k2, fine_mask, coarse): measure FPS through
        the production FrameRenderer instead of the per-image path."""
        if args.only and args.only not in name:
            return
        psnr = psnr_over_split(renderer, p, test_set, idxs, binary, dens)
        if args.fps and fast is not None:
            ffield, k1, k2, fmask, coarse = fast
            fps = fps_fast(ffield, p, binary, grid_spec, k1=k1, k2=k2,
                           near=near, far=far, fine_mask=fmask,
                           hier_coarse=coarse)
        elif args.fps:
            fps = fps_at_800(renderer, p, binary, dens)
        else:
            fps = float("nan")
        rows.append((name, psnr, fps))
        print(f"{name:44s}  PSNR {psnr:6.2f} dB   FPS {fps:6.2f}",
              flush=True)

    common = dict(near=near, far=far, chunk=65536, grid_spec=grid_spec)
    # The dense baseline evaluates chunk*S points per chunk; cap the product
    # near the interval paths' 65536*32 so neither OOMs HBM.
    dense = dict(common, chunk=16384)

    # 1. dense masked baseline (exact reference semantics)
    add("dense masked, S=128",
        ImageRenderer(field, n_samples=n_samples, **dense))

    # 2. occupancy-CDF sampling, budget sweep
    for k in (16, 24, 32, 48):
        add(f"cdf k={k}",
            ImageRenderer(field, n_samples=k, sampling="cdf", **common))

    # 2b. importance placement (density-weighted probes)
    for k in (12, 16, 24):
        add(f"importance k={k}",
            ImageRenderer(field, n_samples=k, sampling="importance", experimental=True,
                          **common), dens=density)

    # 3. LOD sweep at k=32
    n_levels = cfg.get("n_levels", 16)
    for ml in (n_levels - 6, n_levels - 4):
        add(f"cdf k=32, max_level={ml}",
            ImageRenderer(field, n_samples=32, sampling="cdf",
                          max_level=ml, **common))

    # 4. baked field sweep (cell-row layout; int8 measured 0.00 dB vs
    # bf16, and bf16 cell tables would double the 8x-redundant storage).
    # 512^3 int8 (17 GB) exceeds HBM in this layout; 384^3 measured equal
    # to 512^3 in the old layout.
    for res, qdtype, qname in ((256, jnp.int8, "int8"),
                               (384, jnp.int8, "int8")):
        names = [f"baked {res}^3 {qname}, cdf k={k}" for k in (24, 32)] \
            + [f"baked {res}^3 {qname}, imp k={k}" for k in (12, 16, 24)] \
            + [f"baked {res}^3 {qname}, hierF k=16+16",
               f"baked {res}^3 {qname}, hierS k=32+16"]
        if args.only and not any(args.only in n for n in names):
            continue
        bspec = BakedSpec(resolution=res, bound=cfg.get("scene_bound", 1.5))
        # Free the previous resolution's device tables before baking the
        # next (384^3 int8 is 7.2 GB; two bakes do not fit HBM together).
        baked = bfield = None
        import gc
        gc.collect()
        t0 = time.perf_counter()
        baked = bake_instant_field(field, params, bspec, dtype=qdtype,
                                   grid_binary=binary, grid_spec=grid_spec)
        jax.block_until_ready(baked["cells"])
        float(jnp.sum(baked["cells"][:1].astype(jnp.float32)))
        bake_s = time.perf_counter() - t0
        bfield = build_baked_field(bspec, L_dir=L_dir)
        print(f"    bake {res}^3 {qname}: {bake_s:.1f} s, "
              f"{baked['cells'].nbytes / 1e9:.2f} GB")
        for k in (24, 32):
            add(f"baked {res}^3 {qname}, cdf k={k}",
                ImageRenderer(bfield, n_samples=k, sampling="cdf",
                              fine_mask=False, **common), p=baked)
        for k in (12, 16, 24):
            add(f"baked {res}^3 {qname}, imp k={k}",
                ImageRenderer(bfield, n_samples=k, sampling="importance", experimental=True,
                              fine_mask=False, **common), p=baked,
                dens=density)
        # Two-pass hierarchical (production bench path): FPS measured
        # through the frame-batched FrameRenderer with ray compaction.
        # "sigma" coarse = cheap nearest-vertex sigma march for placement
        # (one scalar gather/pt), full rows only at the k2 fine samples.
        for k1, k2 in ((16, 16),):
            add(f"baked {res}^3 {qname}, hierF k={k1}+{k2}",
                ImageRenderer(bfield, n_samples=k1, fine_samples=k2,
                              sampling="cdf", fine_mask=False, **common),
                p=baked, fast=(bfield, k1, k2, False, "field"))
        for k1, k2 in ((32, 16), (32, 12), (24, 16), (48, 16)):
            add(f"baked {res}^3 {qname}, hierS k={k1}+{k2}",
                ImageRenderer(bfield, n_samples=k1, fine_samples=k2,
                              sampling="cdf", fine_mask=False,
                              hier_coarse="sigma", **common),
                p=baked, fast=(bfield, k1, k2, False, "sigma"))

    # 4b. block-structured single-pass renderer (render/block_fast.py):
    # probe+placement at 8x8-block rate against the fast-zone sigma
    # table, fine pass = the only big-table gathers. PSNR from test
    # poses at the dataset resolution; FPS at 800^2.
    if (not args.only) or "block" in args.only:
        from nerf_tpu.render.block_fast import (
            BlockFrameRenderer, measure_occupied_block_fraction)
        from nerf_tpu.render.rays import orbit_poses
        from nerf_tpu.utils.metrics import compute_psnr
        res = 256
        bspec = BakedSpec(resolution=res, bound=cfg.get("scene_bound", 1.5))
        baked = bake_instant_field(field, params, bspec, dtype=jnp.int8,
                                   grid_binary=binary, grid_spec=grid_spec)
        bfield = build_baked_field(bspec, L_dir=L_dir)
        Ht = test_set.H - test_set.H % 8
        Wt = test_set.W - test_set.W % 8
        test_poses = [np.asarray(test_set.poses[i]) for i in idxs]
        for k1, k2 in ((24, 8), (28, 8), (32, 8), (32, 12), (32, 16),
                       (24, 12)):
            name = f"block {res}^3, k={k1}+{k2}"
            if args.only and args.only not in name:
                continue
            frac = measure_occupied_block_fraction(
                bfield, baked, bspec, test_poses, H=Ht, W=Wt,
                focal=float(test_set.focal), near=near, far=far)
            br = BlockFrameRenderer(
                bfield, bspec, H=Ht, W=Wt, focal=float(test_set.focal),
                near=near, far=far, k_coarse=k1, k_fine=k2,
                capacity_frac=min(1.0, frac + 0.05))
            ps = []
            for i in idxs:
                img = np.clip(np.asarray(
                    br.render_pose(baked, test_poses[i])), 0.0, 1.0)
                _, _, target = test_set.get_image_rays(i)
                tgt = np.asarray(target).reshape(
                    test_set.H, test_set.W, 3)[:Ht, :Wt]
                ps.append(compute_psnr(float(np.mean((img - tgt) ** 2))))
            psnr = float(np.mean(ps))
            fps = float("nan")
            if args.fps:
                H8 = W8 = 800
                f8 = 0.5 * W8 / np.tan(0.4)
                oposes = orbit_poses(4, radius=4.0, center=[0, 0, 0],
                                     height=1.0)
                frac8 = measure_occupied_block_fraction(
                    bfield, baked, bspec, oposes, H=H8, W=W8, focal=f8,
                    near=near, far=far)
                br8 = BlockFrameRenderer(
                    bfield, bspec, H=H8, W=W8, focal=f8, near=near,
                    far=far, k_coarse=k1, k_fine=k2,
                    capacity_frac=min(1.0, frac8 + 0.05))
                digest = jax.jit(lambda f: jnp.sum(f[:, ::63, ::63]))
                float(digest(br8(baked, oposes[:1])))
                t0 = time.perf_counter()
                float(digest(br8(baked, oposes[1:])))
                fps = 3.0 / (time.perf_counter() - t0)
            rows.append((name, psnr, fps))
            print(f"{name:44s}  PSNR {psnr:6.2f} dB   FPS {fps:6.2f}",
                  flush=True)

    # 5. live-field hierarchical rows (no bake)
    for k1, k2 in ((16, 16),):
        add(f"hier k={k1}+{k2}",
            ImageRenderer(field, n_samples=k1, fine_samples=k2,
                          sampling="cdf", **common),
            fast=(field, k1, k2, True, "field"))

    lines = ["| render path | test PSNR (dB) | 800x800 FPS |",
             "|---|---|---|"]
    for name, psnr, fps in rows:
        fps_s = f"{fps:.2f}" if np.isfinite(fps) else "-"
        lines.append(f"| {name} | {psnr:.2f} | {fps_s} |")
    table = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(f"# Render-path quality/speed A/B\n\n"
                f"Checkpoint: `{args.ckpt}` (step {ckpt.get('step')}) on "
                f"`{args.data_dir}`, {len(idxs)} test images at "
                f"{test_set.W}x{test_set.H}.\n\n" + table + "\n")
    print(table)


if __name__ == "__main__":
    main()
