"""Native C++ dataset loader vs the PIL reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.data.native_loader import get_lib, load_image_rgba


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(37, 53, 4)) * 255).astype(np.uint8)
    paths = {}
    Image.fromarray(img, "RGBA").save(root / "rgba.png")
    Image.fromarray(img[..., :3], "RGB").save(root / "rgb.png")
    Image.fromarray(img[..., 0], "L").save(root / "gray.png")
    y, x = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 80),
                       indexing="ij")
    smooth = np.stack([x, y, 0.5 + 0.4 * np.sin(4 * x),
                       np.ones_like(x)], -1)
    Image.fromarray((smooth * 255).astype(np.uint8), "RGBA").save(
        root / "smooth.png")
    return root


@pytest.mark.skipif(get_lib() is None, reason="native loader not built")
def test_decode_bit_exact_vs_pil(pngs):
    from PIL import Image
    for name in ("rgba.png", "rgb.png", "gray.png"):
        path = str(pngs / name)
        native = load_image_rgba(path, 1)
        pil = np.asarray(Image.open(path).convert("RGBA"),
                         np.float32) / 255.0
        np.testing.assert_array_equal(native, pil)


@pytest.mark.skipif(get_lib() is None, reason="native loader not built")
def test_lanczos_downscale_close_to_pil(pngs):
    from PIL import Image
    path = str(pngs / "smooth.png")
    native = load_image_rgba(path, 2)
    pil = np.asarray(Image.open(path).convert("RGBA").resize(
        (40, 32), Image.LANCZOS), np.float32) / 255.0
    assert native.shape == pil.shape == (32, 40, 4)
    # PIL rounds to uint8 between passes; allow small differences.
    assert float(np.abs(native - pil).mean()) < 5e-3


def test_dataset_loads_with_native_path(tmp_path):
    from nerf_tpu.data.blender import BlenderDataset
    from nerf_tpu.data.synthetic import make_synthetic_blender_scene
    root = make_synthetic_blender_scene(str(tmp_path / "s"), n_train=2,
                                        n_val=1, n_test=1, image_size=16)
    ds = BlenderDataset(root, "train")
    assert ds.images.shape == (2, 16, 16, 4)
    # Device stack is uint8 0-255 (tunnel-bandwidth design, RayData doc);
    # the host copy keeps the float 0-1 contract.
    assert ds.images.dtype == jnp.uint8
    assert float(ds.images_np.max()) <= 1.0
