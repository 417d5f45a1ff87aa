"""Procedural synthetic scenes for tests and benchmarks.

The environment ships no NeRF-Synthetic data, so integration tests and quality
benchmarks generate tiny Blender-format scenes on the fly: an analytically
ray-traced sphere (optionally moving over time for the dynamic pipelines),
written out as RGBA PNGs + transforms_{split}.json in the exact layout the
reference datasets use (reference: src/dataset.py:30-66). This realizes the
test strategy SURVEY.md section 4 prescribes.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..render.rays import orbit_poses


def make_gradient_image(h: int = 64, w: int = 64) -> np.ndarray:
    """Smooth RGB test image in [0,1] for the Part-1 fitting pipeline."""
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                       indexing="ij")
    r = 0.5 + 0.5 * np.sin(2 * np.pi * x)
    g = y
    b = 0.5 + 0.5 * np.cos(2 * np.pi * (x + y))
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def _trace_sphere(pose: np.ndarray, H: int, W: int, focal: float,
                  center: np.ndarray, radius: float) -> np.ndarray:
    """Analytic RGBA render of a shaded sphere from one camera pose."""
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - W * 0.5) / focal,
                     -(j - H * 0.5) / focal,
                     -np.ones_like(i)], axis=-1)
    rd = dirs @ pose[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = pose[:3, 3]

    oc = ro - center
    b = np.sum(rd * oc, axis=-1)
    c = np.sum(oc * oc) - radius * radius
    disc = b * b - c
    hit = disc > 0
    t_hit = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = hit & (t_hit > 0)

    p = ro + rd * t_hit[..., None]
    n = (p - center) / radius
    light = np.array([0.6, 0.6, 0.5])
    light = light / np.linalg.norm(light)
    lam = np.clip(np.sum(n * light, axis=-1), 0.0, 1.0)
    base = 0.5 + 0.5 * n  # color by normal: view-consistent, smooth
    rgb = base * (0.3 + 0.7 * lam[..., None])

    img = np.zeros((H, W, 4), np.float32)
    img[..., :3] = np.where(hit[..., None], rgb, 0.0)
    img[..., 3] = hit.astype(np.float32)
    return img


def make_synthetic_blender_scene(
    root: str,
    n_train: int = 8,
    n_val: int = 4,
    n_test: int = 4,
    image_size: int = 40,
    dynamic: bool = False,
    radius: float = 0.5,
    cam_radius: float = 3.2,
    seed: int = 0,
) -> str:
    """Write a tiny Blender-format scene under `root`; returns `root`.

    When `dynamic`, the sphere center oscillates along x with time in [0,1],
    giving the deformation pipelines a learnable motion.
    """
    rng = np.random.default_rng(seed)
    H = W = image_size
    camera_angle_x = 0.8
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    os.makedirs(root, exist_ok=True)

    from PIL import Image

    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        split_dir = os.path.join(root, split)
        os.makedirs(split_dir, exist_ok=True)
        poses = orbit_poses(n, radius=cam_radius, center=[0, 0, 0],
                            height=1.2 + 0.3 * rng.standard_normal(),
                            n_rotations=1.0)
        frames = []
        for k in range(n):
            t = k / max(n - 1, 1)
            center = np.array([0.35 * np.sin(2 * np.pi * t) if dynamic
                               else 0.0, 0.0, 0.0])
            img = _trace_sphere(poses[k], H, W, focal, center, radius)
            img_u8 = (img * 255).astype(np.uint8)
            fname = f"r_{k}.png"
            Image.fromarray(img_u8, "RGBA").save(
                os.path.join(split_dir, fname))
            frame = {
                "file_path": f"./{split}/r_{k}",
                "transform_matrix": poses[k].tolist(),
            }
            if dynamic:
                frame["time"] = t
            frames.append(frame)
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return root
