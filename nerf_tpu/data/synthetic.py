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


# --------------------------------------------------------------------------
# Lego-proxy scene: a multi-object, textured, shadowed, view-dependent scene
# at NeRF-Synthetic scale, for validating the training recipes and render
# paths against the reference's published numbers (reference: README.md:11-14)
# without shipping the Blender datasets. Geometry is analytic (spheres +
# axis-aligned boxes), textures are high-frequency procedurals (to exercise
# the fine hash levels), lighting is one directional light with hard ray-
# traced shadows plus a Phong specular lobe (view-dependence for the color
# MLP to learn).
# --------------------------------------------------------------------------

def _lego_proxy_primitives(t: float = 0.0, dynamic: bool = False,
                           motion: str = "smooth"):
    """Scene description (z-up, Blender convention); `t` animates two
    objects when `dynamic`.

    motion="smooth" (default): half-cycle sin(pi t) displacements — the
    D-NeRF benchmark class (the reference's Standup is smooth, roughly
    monotonic motion; reference: README.md:13-14). A 3-anchor tri-grid
    (t = 0, 0.5, 1) can represent this: displacements peak at the mid
    anchor.

    motion="fast" (the round-1/2 scene): sin(2*pi*t) / sin(4*pi*t)
    displacements — dy completes TWO full cycles in t in [0,1], which NO
    3-anchor triangle interpolation can represent (the anchors all see
    dy = 0); kept as the stress variant.

    motion="gentle": ONE object (the striped sphere) translates smoothly,
    everything else static — the Standup-difficulty class the reference's
    Part-4 headline is measured on (a single smoothly-moving subject,
    reference: README.md:14).
    """
    if not dynamic:
        dx = dy = bob = 0.0
    elif motion == "smooth":
        dx = 0.45 * np.sin(np.pi * t)
        dy = 0.125 * (1.0 - np.cos(np.pi * t))      # monotonic 0 -> 0.25
        bob = 0.18 * np.sin(np.pi * t)
    elif motion == "gentle":
        dx = 0.35 * np.sin(np.pi * t)
        dy = 0.0
        bob = 0.0
    elif motion == "fast":
        dx = 0.45 * np.sin(2 * np.pi * t)
        dy = 0.25 * np.sin(4 * np.pi * t)
        bob = 0.18 * np.abs(np.sin(2 * np.pi * t))
    else:
        raise ValueError(f"unknown motion: {motion}")
    return [
        # (kind, geometry, texture, shininess); ground plate then objects
        ("box", (np.array([-1.25, -1.25, -1.05]),
                 np.array([1.25, 1.25, -0.95])), "checker", 0.0),
        ("sphere", (np.array([-0.45 + dx, -0.30, -0.50]), 0.45),
         "stripes", 0.6),
        ("sphere", (np.array([0.55, 0.40, -0.55]), 0.40), "dots", 0.0),
        ("box", (np.array([-0.15, -0.75, -0.95]),
                 np.array([0.40, -0.25, -0.40])), "grain", 0.3),
        ("box", (np.array([-0.75, 0.35, -0.95]),
                 np.array([-0.40, 0.70, 0.15 + bob])), "bricks", 0.0),
        ("sphere", (np.array([0.10, 0.75 + dy, -0.80 + bob]), 0.15),
         "marble", 0.8),
        ("sphere", (np.array([0.85, -0.45, -0.82]), 0.18), "stripes", 0.8),
        ("sphere", (np.array([-0.95, 0.05, -0.78]), 0.22), "dots", 0.4),
    ]


def _isect_sphere(ro, rd, center, radius):
    oc = ro - center
    b = np.sum(rd * oc, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 1e-3)
    return np.where(hit, t, np.inf)


def _isect_box(ro, rd, lo, hi):
    inv = 1.0 / np.where(np.abs(rd) < 1e-9, 1e-9, rd)
    t1 = (lo - ro) * inv
    t2 = (hi - ro) * inv
    tmin = np.max(np.minimum(t1, t2), axis=-1)
    tmax = np.min(np.maximum(t1, t2), axis=-1)
    hit = (tmax > np.maximum(tmin, 1e-3))
    return np.where(hit, np.where(tmin > 1e-3, tmin, np.inf), np.inf)


def _box_normal(p, lo, hi):
    """Outward normal of the face nearest to p."""
    c = (lo + hi) * 0.5
    half = (hi - lo) * 0.5
    q = (p - c) / half
    n = np.zeros_like(p)
    ax = np.argmax(np.abs(q), axis=-1)
    n[np.arange(p.shape[0]), ax] = np.sign(
        q[np.arange(p.shape[0]), ax])
    return n


def _texture(name: str, p: np.ndarray) -> np.ndarray:
    """High-frequency procedural albedo at world points [N,3] -> [N,3]."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    if name == "checker":
        c = (np.floor(x * 6) + np.floor(y * 6)) % 2
        return np.stack([0.85 - 0.6 * c, 0.85 - 0.55 * c,
                         0.8 - 0.3 * c], axis=-1)
    if name == "stripes":
        s = 0.5 + 0.5 * np.sin(40.0 * x + 18.0 * y)
        return np.stack([0.9 * s + 0.05, 0.25 + 0.4 * (1 - s),
                         0.2 + 0.1 * s], axis=-1)
    if name == "dots":
        d = (0.5 + 0.5 * np.sin(30 * x) * np.sin(30 * y) * np.sin(30 * z))
        d = (d > 0.55).astype(np.float32)
        return np.stack([0.15 + 0.75 * d, 0.55 - 0.3 * d,
                         0.75 - 0.5 * d], axis=-1)
    if name == "grain":
        g = 0.5 + 0.5 * np.sin(25 * z + 3.0 * np.sin(8 * x) + 2 * y)
        return np.stack([0.55 + 0.3 * g, 0.35 + 0.2 * g,
                         0.15 + 0.1 * g], axis=-1)
    if name == "bricks":
        row = np.floor(z * 8)
        b = ((np.floor(x * 8 + 0.5 * (row % 2)) + row) % 2)
        m = 0.5 + 0.5 * np.sin(60 * x) * np.sin(60 * y)
        mortar = (np.abs(z * 8 - np.round(z * 8)) < 0.08)
        col = np.stack([0.7 - 0.35 * b + 0.05 * m, 0.25 + 0.1 * b,
                        0.2 + 0.05 * b], axis=-1)
        return np.where(mortar[:, None], np.full_like(col, 0.75), col)
    if name == "marble":
        v = 0.5 + 0.5 * np.sin(12 * x + 5 * np.sin(20 * z) + 9 * y)
        return np.stack([0.7 + 0.25 * v, 0.7 + 0.25 * v,
                         0.75 + 0.2 * v], axis=-1)
    raise ValueError(name)


_LIGHT = np.array([0.45, 0.35, 1.0]) / np.linalg.norm([0.45, 0.35, 1.0])


def _trace_lego_proxy(pose: np.ndarray, H: int, W: int, focal: float,
                      t: float = 0.0, dynamic: bool = False,
                      motion: str = "smooth") -> np.ndarray:
    """Analytic RGBA render (shadows + Phong specular) of the proxy scene."""
    prims = _lego_proxy_primitives(t, dynamic, motion)
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - W * 0.5) / focal,
                     -(j - H * 0.5) / focal,
                     -np.ones_like(i)], axis=-1).reshape(-1, 3)
    rd = dirs @ pose[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.broadcast_to(pose[:3, 3], rd.shape)

    def closest_hit(o, d):
        t_best = np.full(o.shape[0], np.inf, np.float32)
        idx = np.full(o.shape[0], -1, np.int32)
        for k, (kind, geo, _, _) in enumerate(prims):
            tk = (_isect_sphere(o, d, *geo) if kind == "sphere"
                  else _isect_box(o, d, *geo))
            closer = tk < t_best
            t_best = np.where(closer, tk, t_best)
            idx = np.where(closer, k, idx)
        return t_best, idx

    t_hit, obj = closest_hit(ro, rd)
    hit = obj >= 0
    p = ro + rd * np.where(hit, t_hit, 0.0)[:, None]

    # normals + albedo per object
    n = np.zeros_like(p)
    albedo = np.zeros_like(p)
    shin = np.zeros(p.shape[0], np.float32)
    for k, (kind, geo, tex, sh) in enumerate(prims):
        sel = obj == k
        if not np.any(sel):
            continue
        ps = p[sel]
        if kind == "sphere":
            nk = (ps - geo[0]) / geo[1]
        else:
            nk = _box_normal(ps, *geo)
        n[sel] = nk
        albedo[sel] = _texture(tex, ps)
        shin[sel] = sh

    # hard shadow: occlusion of the shadow ray toward the light
    sro = p + n * 1e-3
    t_sh, obj_sh = closest_hit(sro, np.broadcast_to(_LIGHT, sro.shape))
    lit = ~(obj_sh >= 0)

    lam = np.clip(np.sum(n * _LIGHT, axis=-1), 0.0, 1.0) * lit
    # Phong specular (view-dependent)
    refl = 2.0 * lam[:, None] * n - _LIGHT
    spec = np.clip(np.sum(refl * (-rd), axis=-1), 0.0, 1.0) ** 32 * lit
    rgb = albedo * (0.30 + 0.70 * lam[:, None]) \
        + (shin * spec)[:, None] * np.array([1.0, 0.97, 0.9])

    img = np.zeros((H * W, 4), np.float32)
    img[:, :3] = np.where(hit[:, None], np.clip(rgb, 0.0, 1.0), 0.0)
    img[:, 3] = hit.astype(np.float32)
    return img.reshape(H, W, 4)


def make_lego_proxy_scene(
    root: str,
    n_train: int = 100,
    n_val: int = 10,
    n_test: int = 20,
    image_size: int = 800,
    dynamic: bool = False,
    cam_radius: float = 4.0,
    seed: int = 0,
    motion: str = "smooth",
) -> str:
    """Write a NeRF-Synthetic-scale procedural scene under `root`.

    Matches the Blender dataset layout and camera conventions
    (reference: src/dataset.py:30-66): upper-hemisphere cameras looking at
    the origin, camera_angle_x ~0.69, RGBA PNGs with background alpha 0.
    Skips generation when the directory is already populated.
    """
    done_marker = os.path.join(root, ".complete")
    if os.path.exists(done_marker):
        return root
    rng = np.random.default_rng(seed)
    H = W = image_size
    camera_angle_x = 0.6911112070083618  # the NeRF-Synthetic value
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    os.makedirs(root, exist_ok=True)

    from PIL import Image

    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        split_dir = os.path.join(root, split)
        os.makedirs(split_dir, exist_ok=True)
        frames = []
        for k in range(n):
            t = k / max(n - 1, 1)
            # deterministic but varied upper-hemisphere viewpoints
            ang = 2 * np.pi * ((k * 0.6180339887) % 1.0)
            height = 0.6 + 2.2 * rng.uniform()
            pose = orbit_poses(1, radius=cam_radius, center=[0, 0, 0],
                               height=height, n_rotations=1.0)[0]
            # rotate the orbit position to `ang` (z-up world, like the
            # Blender datasets)
            ca, sa = np.cos(ang), np.sin(ang)
            rot = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]],
                           np.float32)
            pose4 = np.eye(4, dtype=np.float32)
            pose4[:3, 3] = rot @ pose[:3, 3]
            pose4[:3, :3] = rot @ pose[:3, :3]
            img = _trace_lego_proxy(pose4, H, W, focal, t, dynamic,
                                    motion)
            Image.fromarray((img * 255).astype(np.uint8), "RGBA").save(
                os.path.join(split_dir, f"r_{k}.png"))
            frame = {"file_path": f"./{split}/r_{k}",
                     "transform_matrix": pose4.tolist()}
            if dynamic:
                frame["time"] = t
            frames.append(frame)
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    with open(done_marker, "w") as f:
        f.write("ok\n")
    return root


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
