"""Blender / NeRF-Synthetic dataset loading and on-device ray sampling.

Loading matches the reference (reference: src/dataset.py:9-293): RGBA PNGs +
`transforms_{split}.json`, LANCZOS downscale, focal from `camera_angle_x`,
OpenGL-style camera (x right, y up, -z forward), per-frame `time` for the
dynamic variant (index/(N-1) fallback).

TPU re-design: images/poses/times are pushed to the device once at startup and
per-step ray sampling (`sample_random_rays`) is a pure jitted function of a
PRNG key — this removes the reference's per-step host->device copy, its only
cross-boundary transfer in the hot loop (SURVEY.md section 3.1).
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..render.rays import camera_directions, rays_from_pose


class RayData(NamedTuple):
    """Device-resident arrays consumed by `sample_random_rays`.

    Images may be uint8 (0-255) or fp32 (0-1): the dataset stores uint8 —
    lossless vs the 8-bit PNG sources (the reference also quantizes to
    uint8 post-downscale, src/dataset.py:56-60) and 4x cheaper to upload
    through the host->device tunnel, whose measured bandwidth (~0.7 MB/s)
    made the fp32 stack a ~6-minute startup stall at reference scale.
    Samplers convert gathered batches to fp32 on device.
    """
    images: jnp.ndarray          # [N, H, W, 4] uint8 (0-255) or fp32 (0-1)
    poses: jnp.ndarray           # [N, 4, 4]
    times: Optional[jnp.ndarray]  # [N] or None


def _to_float_rgba(img: jnp.ndarray) -> jnp.ndarray:
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    return img.astype(jnp.float32)


def _load_frames(root_dir: str, split: str, downscale: int):
    # Image decode path: the native C++ loader (PNG + Lanczos-3, see
    # native/loader.cpp) unless disabled; PIL handles everything else.
    use_native = os.environ.get("NERF_TPU_NATIVE_LOADER", "1") != "0"
    from .native_loader import load_image_rgba

    def _load(path):
        if use_native:
            return load_image_rgba(path, downscale)
        from PIL import Image
        img = Image.open(path).convert("RGBA")
        if downscale > 1:
            img = img.resize((img.width // downscale,
                              img.height // downscale), Image.LANCZOS)
        return np.asarray(img, np.float32) / 255.0

    meta_path = os.path.join(root_dir, f"transforms_{split}.json")
    with open(meta_path, "r", encoding="utf-8") as f:
        meta = json.load(f)

    camera_angle_x = float(meta["camera_angle_x"])
    frames = meta["frames"]

    images, poses, times = [], [], []
    for i, frame in enumerate(frames):
        fp = frame["file_path"]
        if fp.startswith("./"):
            fp = fp[2:]
        img_path = os.path.join(root_dir, fp)
        if not os.path.splitext(img_path)[1]:
            for ext in (".png", ".jpg"):
                if os.path.exists(img_path + ext):
                    img_path += ext
                    break
        images.append(_load(img_path))
        poses.append(np.asarray(frame["transform_matrix"], np.float32))
        if "time" in frame:
            times.append(float(frame["time"]))
        else:
            times.append(i / (len(frames) - 1) if len(frames) > 1 else 0.0)

    return (np.stack(images), np.stack(poses),
            np.asarray(times, np.float32), camera_angle_x)


class BlenderDataset:
    """Static NeRF-Synthetic dataset (reference: src/dataset.py:9-171)."""

    has_time = False

    def __init__(self, root_dir: str, split: str = "train",
                 downscale: int = 1, white_bkgd: bool = True,
                 scene_scale: float = 1.0):
        self.root_dir = root_dir
        self.split = split
        self.downscale = max(int(downscale), 1)
        self.white_bkgd = white_bkgd
        self.scene_scale = float(scene_scale)

        images, poses, times, cax = _load_frames(
            root_dir, split, self.downscale)
        self.images_np = images
        self.poses_np = poses
        self.times_np = times
        self.camera_angle_x = cax
        self.H, self.W = images.shape[1:3]
        self.focal = 0.5 * self.W / np.tan(0.5 * cax)

        # uint8 on device: see RayData docstring (tunnel-bandwidth bound).
        self.images = jnp.asarray(
            np.clip(np.round(images * 255.0), 0, 255).astype(np.uint8))
        self.poses = jnp.asarray(poses)
        self.times = jnp.asarray(times) if self.has_time else None
        self.directions = camera_directions(self.H, self.W, self.focal)

    def __len__(self):
        return self.images.shape[0]

    @property
    def ray_data(self) -> RayData:
        return RayData(self.images, self.poses, self.times)

    def get_rays(self, c2w):
        return rays_from_pose(self.directions, c2w, self.scene_scale)

    def composite_target(self, index: int, bg_white: Optional[bool] = None):
        """Pre-composited RGB target for eval (reference: src/dataset.py:124-138)."""
        white = self.white_bkgd if bg_white is None else bg_white
        rgba = _to_float_rgba(self.images[index])
        rgb, alpha = rgba[..., :3], rgba[..., 3:4]
        return rgb * alpha + (1.0 - alpha) if white else rgb * alpha

    def get_image_rays(self, index: int):
        rays_o, rays_d = self.get_rays(self.poses[index])
        return rays_o, rays_d, self.composite_target(index)


class DynamicDataset(BlenderDataset):
    """Dynamic dataset with per-frame timestamps
    (reference: src/dataset.py:174-293)."""

    has_time = True

    def get_image_rays(self, index: int):
        rays_o, rays_d, target = super().get_image_rays(index)
        return rays_o, rays_d, target, float(self.times_np[index])


def sample_random_rays(data: RayData, rng: jax.Array, batch_size: int,
                       H: int, W: int, focal: float,
                       scene_scale: float = 1.0):
    """Sample a random (image, pixel) ray batch fully on device.

    Matches reference semantics (reference: src/dataset.py:140-171, 259-293):
    uniform over images and pixels; returns RGBA targets so the training loops
    can composite against random backgrounds; rays_d normalized.

    Returns (rays_o [B,3], rays_d [B,3], target_rgba [B,4], times [B,1]|None).
    """
    n_images = data.images.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    img_idx = jax.random.randint(k1, (batch_size,), 0, n_images)
    pix_y = jax.random.randint(k2, (batch_size,), 0, H)
    pix_x = jax.random.randint(k3, (batch_size,), 0, W)

    dirs = jnp.stack([
        (pix_x.astype(jnp.float32) - W * 0.5) / focal,
        -(pix_y.astype(jnp.float32) - H * 0.5) / focal,
        -jnp.ones((batch_size,), jnp.float32),
    ], axis=-1)

    c2w = data.poses[img_idx]                       # [B, 4, 4]
    rays_d = jnp.einsum("bij,bj->bi", c2w[:, :3, :3], dirs)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = c2w[:, :3, 3]
    if scene_scale != 1.0:
        rays_o = rays_o * scene_scale

    target_rgba = _to_float_rgba(data.images[img_idx, pix_y, pix_x])
    times = None
    if data.times is not None:
        times = data.times[img_idx][:, None]
    return rays_o, rays_d, target_rgba, times
