"""Camera ray generation (pinhole, OpenGL-style axes).

Matches the reference's camera model: x right, y up, -z forward
(reference: src/dataset.py:78-122) and its orbit-video look-at pose synthesis
(reference: run.py:1393-1417).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def camera_directions(H: int, W: int, focal: float) -> jnp.ndarray:
    """Per-pixel camera-space ray directions [H, W, 3]."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jnp.stack([
        (i - W * 0.5) / focal,
        -(j - H * 0.5) / focal,
        -jnp.ones_like(i),
    ], axis=-1)


def rays_from_pose(directions: jnp.ndarray, c2w: jnp.ndarray,
                   scene_scale: float = 1.0):
    """World-space rays for one camera pose.

    Args:
      directions: [..., 3] camera-space dirs (from `camera_directions`).
      c2w: [4, 4] or [3, 4] camera-to-world matrix.

    Returns: (rays_o [..., 3], rays_d [..., 3]); rays_d normalized.
    """
    rot = c2w[:3, :3]
    rays_d = directions @ rot.T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    if scene_scale != 1.0:
        rays_o = rays_o * scene_scale
    return rays_o, rays_d


def orbit_poses(n_frames: int, radius: float, center, height: float,
                n_rotations: float = 2.0) -> np.ndarray:
    """Look-at poses on a circle around `center` at constant height.

    Camera axes: x=right, y=up, z=-forward (reference: run.py:1390-1417).
    Returns [n_frames, 4, 4] float32.
    """
    center = np.asarray(center, np.float64)
    angles = np.linspace(0.0, n_rotations * 2.0 * np.pi, n_frames,
                         endpoint=False)
    poses = np.zeros((n_frames, 4, 4), np.float32)
    for i, ang in enumerate(angles):
        cam = np.array([center[0] + radius * np.cos(ang),
                        center[1] + radius * np.sin(ang),
                        height])
        fwd = center - cam
        fwd = fwd / np.linalg.norm(fwd)
        up_w = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up_w)
        right = right / (np.linalg.norm(right) + 1e-8)
        up = np.cross(right, fwd)
        up = up / np.linalg.norm(up)
        poses[i, :3, :3] = np.stack([right, up, -fwd], axis=1)
        poses[i, :3, 3] = cam
        poses[i, 3, 3] = 1.0
    return poses
