"""Smoke-validate the at-scale round configs on CPU at tiny scale.

The chip queue (tools/chip_queue.sh) burns real TPU time on every config
under configs/r4/; a key typo or recipe crash there wastes an outage-
recovery slot. This shrinks each config's expensive knobs (steps, batch,
samples, grid, net width) while keeping its semantic switches (mode,
loss terms, budget/compaction, canonical_type, exact-hash impl) and runs
the result end-to-end through the real run.py CLI on the tiny synthetic
scenes. A config passes if the subprocess exits 0.

Usage: JAX_PLATFORMS=cpu python tools/smoke_r4_configs.py [name ...]
"""

import glob
import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/smoke_r4"

SHRINK = {
    "train_iters": 100,
    "epochs": 200,
    "batch_size": 512,
    "image_size": 48,
    "hidden_dim": 32,
    "num_layers": 3,
    "n_levels": 8,
    "log2_hashmap_size": 12,
    "deform_n_levels": 6,
    "deform_log2_hashmap_size": 11,
    "deform_hidden_dim": 32,
    "deform_num_layers": 2,
    "n_samples": 24,
    "render_n_samples": 24,
    "warmup_n_samples": 16,
    "temporal_n_samples": 32,
    "static_anchor_n_samples": 32,
    "unsup_n_samples": 32,
    "grid_resolution": 16,
    "grid_warmup_iters": 24,
    "grid_update_interval": 8,
    "chunk": 1024,
    "val_every": 50,
    "save_every": 50,
    "log_every": 25,
    "downscale": 1,
    "video_frames": 2,
    "train_ray_budget": 16,
    "render_ray_budget": 16,
    "random_bg_start": 30,
}


def ensure_scenes():
    sys.path.insert(0, REPO)
    from nerf_tpu.data.synthetic import (make_gradient_image,
                                         make_synthetic_blender_scene)
    import numpy as np
    from PIL import Image
    if not os.path.exists("/tmp/smoke_scene_static/transforms_train.json"):
        make_synthetic_blender_scene("/tmp/smoke_scene_static", n_train=6,
                                     n_val=3, n_test=3, image_size=32)
    if not os.path.exists("/tmp/smoke_scene_dyn/transforms_train.json"):
        make_synthetic_blender_scene("/tmp/smoke_scene_dyn", n_train=8,
                                     n_val=3, n_test=3, image_size=32,
                                     dynamic=True)
    if not os.path.exists("/tmp/smoke_img.png"):
        img = np.asarray(make_gradient_image(48, 48))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype("uint8")).save(
            "/tmp/smoke_img.png")


def main():
    only = set(sys.argv[1:])
    ensure_scenes()
    os.makedirs(OUT, exist_ok=True)
    failures = []
    for path in sorted(glob.glob(os.path.join(REPO, "configs/r4/*.yaml"))):
        name = os.path.splitext(os.path.basename(path))[0]
        if only and name not in only:
            continue
        with open(path, encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        for k, v in SHRINK.items():
            if k in cfg and cfg[k] is not None:
                cfg[k] = v
        # val_every defaults to 500 in the recipes — larger than the
        # shrunk train_iters, which would leave the val/best-ckpt path
        # untested. Inject it for every 3D mode.
        if cfg["mode"] != "part1_fourier":
            cfg["val_every"] = SHRINK["val_every"]
        cfg["log_dir"] = os.path.join(OUT, name)
        tiny = os.path.join(OUT, name + ".yaml")
        with open(tiny, "w", encoding="utf-8") as f:
            yaml.safe_dump(cfg, f)

        cmd = [sys.executable, "run.py", "--config", tiny]
        if cfg["mode"] == "part1_fourier":
            cmd += ["--image", "/tmp/smoke_img.png"]
        elif cfg["mode"] in ("part3", "part4"):
            cmd += ["--data_dir", "/tmp/smoke_scene_dyn", "--render_n", "0"]
        else:
            cmd += ["--data_dir", "/tmp/smoke_scene_static"]
        print(f"[smoke] {name}: {' '.join(cmd[1:])}", flush=True)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(cmd, cwd=REPO, env=env, timeout=900,
                              capture_output=True, text=True)
        log = os.path.join(OUT, name + ".log")
        with open(log, "w", encoding="utf-8") as f:
            f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
        if proc.returncode != 0:
            failures.append(name)
            print(f"[smoke] {name}: FAIL rc={proc.returncode} (see {log})")
            print("\n".join(proc.stderr.splitlines()[-8:]))
        else:
            tail = [l for l in proc.stdout.splitlines() if "PSNR" in l]
            print(f"[smoke] {name}: OK   {tail[-1] if tail else ''}")
    if failures:
        print(f"[smoke] FAILURES: {failures}")
        sys.exit(1)
    print("[smoke] all configs pass")


if __name__ == "__main__":
    main()
