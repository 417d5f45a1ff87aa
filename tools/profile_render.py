"""Profile one baked-render frame on the TPU with jax.profiler.

Enables the persistent compilation cache (so reruns skip the remote
compile) and writes a trace to /tmp/nerf_trace for offline inspection.

Usage: python tools/profile_render.py [--k 24] [--res 384]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--ckpt",
                    default="output/part2_instant/lego_proxy/best_model.pth")
    args = ap.parse_args()

    from nerf_tpu.models import build_field
    from nerf_tpu.render.bake import (BakedSpec, bake_instant_field,
                                      build_baked_field)
    from nerf_tpu.render.density_grid import DensityGridSpec
    from nerf_tpu.render.rays import (camera_directions, orbit_poses,
                                      rays_from_pose)
    from nerf_tpu.train.common import ImageRenderer
    from nerf_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = ckpt["config"]
    field = build_field(cfg)
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
    grid_state = jax.tree.map(jnp.asarray, ckpt["density_grid"])
    binary = grid_state["binary"]
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128),
                                cfg.get("scene_bound", 1.5),
                                cfg.get("grid_threshold", 0.01))

    bspec = BakedSpec(resolution=args.res, bound=cfg.get("scene_bound", 1.5))
    t0 = time.perf_counter()
    baked = bake_instant_field(field, params, bspec, dtype=jnp.int8,
                               grid_binary=binary, grid_spec=grid_spec)
    jax.block_until_ready(baked["cells"])
    print(f"bake: {time.perf_counter()-t0:.1f} s")

    bfield = build_baked_field(bspec, L_dir=cfg.get("L_embed_dir", 4))
    renderer = ImageRenderer(bfield, near=2.0, far=6.0, n_samples=args.k,
                             chunk=args.chunk, grid_spec=grid_spec,
                             sampling="cdf", fine_mask=False)

    H = W = 800
    poses = orbit_poses(8, radius=4.0, center=[0, 0, 0], height=1.0)
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.4))
    make_rays = jax.jit(lambda p: rays_from_pose(dirs, p))
    rays = [make_rays(jnp.asarray(p)) for p in poses]
    digest = jax.jit(lambda *im: sum(jnp.sum(i[::63, ::63]) for i in im))

    t0 = time.perf_counter()
    img = renderer(baked, rays[0][0], rays[0][1], grid_binary=binary)
    float(digest(img))
    print(f"first frame (compile+run): {time.perf_counter()-t0:.1f} s")

    # timed, unprofiled
    t0 = time.perf_counter()
    frames = [renderer(baked, rays[i][0], rays[i][1], grid_binary=binary)
              for i in (1, 2, 3)]
    float(digest(*frames))
    dt = (time.perf_counter() - t0) / 3
    print(f"frame time: {dt*1e3:.0f} ms ({1/dt:.2f} FPS)")

    # profiled
    os.makedirs("/tmp/nerf_trace", exist_ok=True)
    with jax.profiler.trace("/tmp/nerf_trace"):
        f = renderer(baked, rays[4][0], rays[4][1], grid_binary=binary)
        float(digest(f))
    files = glob.glob("/tmp/nerf_trace/**/*", recursive=True)
    print(f"trace files: {len(files)}")
    for p in sorted(files)[-5:]:
        print("  ", p)


if __name__ == "__main__":
    main()
