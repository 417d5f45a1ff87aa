"""Checkpoint hash-layout stamping and legacy back-compat.

The round-5 default flip (brick -> exact) made checkpoint configs saved
without an explicit `hash_impl` key ambiguous: rebuilding such a field
under a different package default would mis-shape the stored tables.
`save_checkpoint` therefore stamps the resolved layout, and
`load_checkpoint` injects the LEGACY default (brick when F==2) into
unstamped configs, which can only predate the flip.

Reference parity context: the reference stores `config` verbatim in its
checkpoint dict (reference: run.py:707-715) and has a single tcnn layout,
so it never faced this; the stamp is layout-metadata our multi-layout
`ops/hashgrid.py` needs for faithful reload.
"""

import numpy as np
import pytest

from nerf_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture
def params():
    return {"w": np.arange(6, dtype=np.float32)}


def _roundtrip(tmp_path, params, cfg):
    path = str(tmp_path / "ckpt.pth")
    save_checkpoint(path, params, cfg)
    return load_checkpoint(path)


def test_unpinned_config_is_stamped_with_current_default(tmp_path, params):
    from nerf_tpu.ops.hashgrid import DEFAULT_HASH_IMPL
    ckpt = _roundtrip(tmp_path, params, {"mode": "part2_instant",
                                         "n_levels": 8})
    assert ckpt["config"]["hash_impl"] == DEFAULT_HASH_IMPL


def test_pinned_config_passes_through_unchanged(tmp_path, params):
    for impl in ("brick", "exact", "mixed", "cell", "vcell"):
        ckpt = _roundtrip(tmp_path, params, {"mode": "part4",
                                             "hash_impl": impl})
        assert ckpt["config"]["hash_impl"] == impl


def test_part1_config_is_not_stamped(tmp_path, params):
    # part1 (2D Fourier fit) has no hash grid; stamping would be noise.
    ckpt = _roundtrip(tmp_path, params, {"mode": "part1", "L_embed": 10})
    assert "hash_impl" not in ckpt["config"]


def test_legacy_unstamped_checkpoint_gets_brick_default(tmp_path, params):
    # Simulate a pre-flip checkpoint: bypass save_checkpoint's stamp.
    import pickle
    path = str(tmp_path / "legacy.pth")
    with open(path, "wb") as f:
        pickle.dump({"model_state_dict": params,
                     "config": {"mode": "part2_instant",
                                "n_features_per_level": 2},
                     "step": 100, "val_psnr": 20.0}, f)
    ckpt = load_checkpoint(path)
    assert ckpt["config"]["hash_impl"] == "brick"


def test_legacy_unstamped_f4_checkpoint_gets_exact(tmp_path, params):
    # F != 2 never had a brick layout (brick rows require F=2); the
    # legacy default for such configs was already exact.
    import pickle
    path = str(tmp_path / "legacy_f4.pth")
    with open(path, "wb") as f:
        pickle.dump({"model_state_dict": params,
                     "config": {"mode": "part2_instant",
                                "n_features_per_level": 4},
                     "step": 1, "val_psnr": 0.0}, f)
    ckpt = load_checkpoint(path)
    assert ckpt["config"]["hash_impl"] == "exact"


def test_save_does_not_mutate_caller_config(tmp_path, params):
    cfg = {"mode": "part2_instant"}
    save_checkpoint(str(tmp_path / "c.pth"), params, cfg)
    assert "hash_impl" not in cfg
