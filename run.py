"""CLI entry point — preserves the reference command surface exactly
(reference: run.py:2334-2376):

    python run.py --config <yaml> [--image PATH | --data_dir DIR]
                  [--checkpoint CKPT] [--eval_only]
                  [--render_n N | -1] [--render_chunk N]

Dispatches on the YAML `mode` key: part1_fourier / part2_nerf /
part2_instant / part3 / part4. The reference's configs/part*.yaml files work
unmodified.
"""

import argparse
import os

import yaml

# Honor JAX_PLATFORMS from the environment. Some images pin the platform in
# sitecustomize during plugin registration, which silently overrides the
# user's `JAX_PLATFORMS=cpu python run.py ...`; re-asserting via the config
# API (before any backend touch) restores the standard JAX contract.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    from nerf_tpu import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--image", type=str,
                        help="input image path (Part 1)")
    parser.add_argument("--data_dir", type=str,
                        help="NeRF dataset root (Parts 2-4)")
    parser.add_argument("--config", type=str, required=True,
                        help="YAML config path")
    parser.add_argument("--checkpoint", type=str,
                        help="load a trained checkpoint")
    parser.add_argument("--eval_only", action="store_true",
                        help="evaluate/render only (requires --checkpoint)")
    parser.add_argument("--render_n", type=int, default=-1,
                        help="number of test images to render at eval; "
                             "-1 renders an interpolated orbit video")
    parser.add_argument("--render_chunk", type=int,
                        help="override the render chunk size")
    parser.add_argument("--resume", action="store_true",
                        help="continue a killed training run from the "
                             "resume.pth train state in the run's output "
                             "dir (full state: optimizer, step, grid, "
                             "rng); no-op if the file is absent")
    args = parser.parse_args()

    with open(args.config, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    mode = cfg.get("mode")
    if mode == "part1_fourier":
        if not args.image:
            raise ValueError("Part 1 requires --image.")
        if args.eval_only and not args.checkpoint:
            raise ValueError("Part 1 eval_only requires --checkpoint.")
        from nerf_tpu.train.part1 import run_part1
        run_part1(cfg, args)
    elif mode == "part2_nerf":
        if args.eval_only and not args.checkpoint:
            raise ValueError("eval_only requires --checkpoint.")
        from nerf_tpu.train.part2 import run_part2
        run_part2(cfg, args)
    elif mode == "part2_instant":
        if args.eval_only and not args.checkpoint:
            raise ValueError("eval_only requires --checkpoint.")
        from nerf_tpu.train.part2_instant import run_part2_instant
        run_part2_instant(cfg, args)
    elif mode == "part3":
        if args.eval_only and not args.checkpoint:
            raise ValueError("eval_only requires --checkpoint.")
        from nerf_tpu.train.part3 import run_part3
        run_part3(cfg, args)
    elif mode == "part4":
        if args.eval_only and not args.checkpoint:
            raise ValueError("eval_only requires --checkpoint.")
        from nerf_tpu.train.part4 import run_part4
        run_part4(cfg, args)
    else:
        raise ValueError(f"Unsupported mode: {mode}")


if __name__ == "__main__":
    main()
