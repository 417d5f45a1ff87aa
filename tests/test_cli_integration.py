"""End-to-end CLI integration: every pipeline driven through `run.py`'s
real argparse/YAML surface (reference: run.py:2334-2376) in a subprocess —
train a few steps, checkpoint, reload with --eval_only, exercise the
--render_n branches. The shipped configs/part*.yaml files are loaded and
shrunk, so the production config surface stays covered.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "n_levels": 6, "log2_hashmap_size": 11, "hidden_dim": 32,
    "batch_size": 256, "n_samples": 16, "render_n_samples": 16,
    "train_iters": 30, "log_every": 10, "val_every": 20, "save_every": 20,
    "chunk": 1024, "grid_resolution": 16, "grid_warmup_iters": 5,
    "video_frames": 2, "downscale": 1,
    "deform_n_levels": 4, "deform_log2_hashmap_size": 10,
    "deform_hidden_dim": 16, "deform_num_layers": 2, "num_layers": 2,
    "view_dim": 16, "time_modulation_dim": 16,
}


def _run_cli(argv, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "run.py"] + argv, cwd=REPO, env=env,
        text=True, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=timeout)
    assert proc.returncode == 0, f"CLI failed:\n{proc.stdout[-3000:]}"
    return proc.stdout


def _write_cfg(tmp_path, base_name, overrides):
    with open(os.path.join(REPO, "configs", base_name)) as f:
        cfg = yaml.safe_load(f)
    cfg.update(TINY)
    cfg.update(overrides)
    path = tmp_path / base_name
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path), cfg


@pytest.fixture(scope="module")
def scenes(tmp_path_factory):
    from nerf_tpu.data.synthetic import (make_gradient_image,
                                         make_synthetic_blender_scene)
    root = tmp_path_factory.mktemp("scenes")
    static = make_synthetic_blender_scene(
        str(root / "static"), n_train=4, n_val=2, n_test=4, image_size=24)
    dyn = make_synthetic_blender_scene(
        str(root / "dyn"), n_train=6, n_val=2, n_test=2, image_size=24,
        dynamic=True)
    img = make_gradient_image(24, 32)
    img_path = str(root / "grad.png")
    from PIL import Image
    Image.fromarray((img * 255).astype(np.uint8)).save(img_path)
    return {"static": static, "dyn": dyn, "image": img_path}


def test_cli_part1_train_and_eval(tmp_path, scenes):
    cfg_path, cfg = _write_cfg(tmp_path, "part1.yaml", {
        "log_dir": str(tmp_path / "out"),
        "train_iters": 40, "hidden_dim": 32, "num_layers": 2,
        "L_embed": [4], "snapshot_every": 20,
    })
    out = _run_cli(["--config", cfg_path, "--image", scenes["image"]])
    assert "PSNR" in out
    # sweep CSV written
    csvs = [f for root, _, fs in os.walk(tmp_path / "out")
            for f in fs if f.endswith(".csv")]
    assert csvs, "part1 sweep CSV missing"
    ckpts = [os.path.join(root, f)
             for root, _, fs in os.walk(tmp_path / "out")
             for f in fs if f.endswith(".pth")]
    assert ckpts, "part1 checkpoint missing"
    out2 = _run_cli(["--config", cfg_path, "--image", scenes["image"],
                     "--eval_only", "--checkpoint", ckpts[0]])
    assert "PSNR" in out2


def test_cli_part2_train_then_eval(tmp_path, scenes):
    cfg_path, _ = _write_cfg(tmp_path, "part2.yaml", {
        "log_dir": str(tmp_path / "out2"),
        "L_embed": 4, "L_embed_dir": 2, "hidden_dim": 32,
    })
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["static"]])
    assert "PSNR" in out
    ckpts = [os.path.join(root, f)
             for root, _, fs in os.walk(tmp_path / "out2")
             for f in fs if f.endswith(".pth")]
    assert ckpts, "part2 checkpoint missing"
    out2 = _run_cli(["--config", cfg_path, "--data_dir", scenes["static"],
                     "--eval_only", "--checkpoint", ckpts[-1],
                     "--render_chunk", "512"])
    assert "PSNR" in out2


def test_cli_part2_instant_roundtrip_and_video_path(tmp_path, scenes):
    cfg_path, _ = _write_cfg(tmp_path, "part2_instant.yaml", {
        "log_dir": str(tmp_path / "out2i"),
        "scene_bound": 1.5, "train_iters": 40,
        # engage the budget + compaction regime (the production sparse
        # path) instead of spending all 40 steps in grid warmup
        "grid_warmup_iters": 8, "capacity_switch_ratio": 1.5,
        "batch_size": 512, "n_samples": 32, "train_ray_budget": 8,
    })
    _run_cli(["--config", cfg_path, "--data_dir", scenes["static"]])
    ckpt = None
    for root, _, fs in os.walk(tmp_path / "out2i"):
        for f in fs:
            if f.endswith(".pth"):
                ckpt = os.path.join(root, f)
    assert ckpt, "instant checkpoint missing"
    # eval: fixed number of test renders
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["static"],
                    "--eval_only", "--checkpoint", ckpt, "--render_n", "1"])
    assert "PSNR" in out
    # eval: video branch (-1) — frames written, ffmpeg absence tolerated
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["static"],
                    "--eval_only", "--checkpoint", ckpt, "--render_n", "-1"])
    assert "PSNR" in out


def test_cli_part2_instant_steps_per_dispatch_equivalence(tmp_path,
                                                          scenes):
    """steps_per_dispatch>1 (lax.scan step batching) must reproduce the
    single-step loop: same rng split order, chunks fenced at host events
    (log/val/grid-update/warmup edge). Trains the same tiny recipe both
    ways and compares every logged loss and the final test PSNR."""
    import re

    outs = {}
    for spd in (1, 4):
        cfg_path, _ = _write_cfg(tmp_path, "part2_instant.yaml", {
            "log_dir": str(tmp_path / f"out_spd{spd}"),
            "scene_bound": 1.5, "train_iters": 40, "seed": 3,
            "grid_warmup_iters": 8, "capacity_switch_ratio": 1.5,
            "batch_size": 512, "n_samples": 32, "train_ray_budget": 8,
            "steps_per_dispatch": spd,
        })
        outs[spd] = _run_cli(["--config", cfg_path,
                              "--data_dir", scenes["static"]])

    def losses(txt):
        return [float(m) for m in re.findall(r"Loss ([0-9.]+)", txt)]

    def test_psnr(txt):
        return float(re.findall(r"test PSNR: ([0-9.]+)", txt)[-1])

    l1, l4 = losses(outs[1]), losses(outs[4])
    assert len(l1) == len(l4) and len(l1) >= 4
    np.testing.assert_allclose(l1, l4, rtol=2e-3, atol=1e-5)
    assert abs(test_psnr(outs[1]) - test_psnr(outs[4])) < 0.05


def test_cli_part3_instant_train_eval(tmp_path, scenes):
    cfg_path, _ = _write_cfg(tmp_path, "part3_instant.yaml", {
        "log_dir": str(tmp_path / "out3"),
    })
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["dyn"]])
    assert "PSNR" in out
    ckpts = [os.path.join(root, f)
             for root, _, fs in os.walk(tmp_path / "out3")
             for f in fs if f.endswith(".pth")]
    assert ckpts
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["dyn"],
                    "--eval_only", "--checkpoint", ckpts[-1],
                    "--render_n", "2"])
    assert "PSNR" in out


def test_cli_part4_train_and_orbit_frames(tmp_path, scenes):
    cfg_path, _ = _write_cfg(tmp_path, "part4.yaml", {
        "log_dir": str(tmp_path / "out4"),
    })
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["dyn"]])
    assert "PSNR" in out
    ckpts = [os.path.join(root, f)
             for root, _, fs in os.walk(tmp_path / "out4")
             for f in fs if f.endswith(".pth")]
    assert ckpts
    # orbit-video branch: a video must be produced (the built-in MJPEG
    # muxer runs when ffmpeg is absent and cleans the frame dir up) — or,
    # if muxing failed, the frames must remain on disk.
    out = _run_cli(["--config", cfg_path, "--data_dir", scenes["dyn"],
                    "--eval_only", "--checkpoint", ckpts[-1],
                    "--render_n", "-1"])
    outputs = [f for root, _, fs in os.walk(tmp_path / "out4")
               for f in fs
               if f.endswith((".mp4", ".avi"))
               or (f.startswith("frame_") and f.endswith(".png"))]
    assert outputs, "orbit video (or frames) missing"


def test_cli_rejects_bad_mode(tmp_path):
    path = tmp_path / "bad.yaml"
    with open(path, "w") as f:
        yaml.safe_dump({"mode": "nonsense"}, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "run.py", "--config", str(path)], cwd=REPO,
        env=env, text=True, capture_output=True, timeout=120)
    assert proc.returncode != 0
