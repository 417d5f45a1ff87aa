"""Checkpoint I/O.

Preserves the reference's checkpoint dict schema
{model_state_dict, config, step, val_psnr[, density_grid]}
(reference: run.py:707-715, 1325-1333, 2084-2092) so `--checkpoint` /
`--eval_only` semantics carry over. Arrays are stored as host numpy inside a
single pickle — no torch dependency, no device state.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, model_params, config: dict, step: int = 0,
                    val_psnr: float = 0.0, density_grid=None,
                    extra: dict | None = None) -> None:
    # Stamp the resolved hash layout so a later load rebuilds the field
    # with the SAME table layout even if the package default changes
    # again (round 5 flipped it twice: brick -> exact -> tbrick).
    # Missing key here means the field was built with the current
    # default, so stamp exactly that.
    if config.get("mode") != "part1" and "hash_impl" not in config:
        from ..ops.hashgrid import DEFAULT_HASH_IMPL
        config = {**config, "hash_impl": DEFAULT_HASH_IMPL}
    ckpt = {
        "model_state_dict": _to_numpy(model_params),
        "config": config,
        "step": step,
        "val_psnr": val_psnr,
    }
    if density_grid is not None:
        ckpt["density_grid"] = _to_numpy(density_grid)
    if extra:
        ckpt.update(_to_numpy(extra))
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    # Back-compat: checkpoints saved before the round-5 default flip
    # carry no `hash_impl` key; they were trained under the legacy
    # default (brick rows when F==2). Rebuilding them with today's
    # default would mis-shape the tables, so pin the legacy layout.
    cfg = ckpt.get("config")
    if isinstance(cfg, dict) and cfg.get("mode") != "part1" \
            and "hash_impl" not in cfg:
        n_feats = cfg.get("n_features_per_level", 2)
        ckpt["config"] = {
            **cfg, "hash_impl": "brick" if n_feats == 2 else "exact",
        }
    return ckpt
