"""Outage-resumable training state.

The reference has no resume story beyond `--checkpoint` (params only,
training restarts at step 0 — reference: run.py:295-298, 529-536). This
framework trains over a tunneled TPU whose relay has died mid-run in
three separate rounds, so each trainer additionally persists its FULL
train state — params, optimizer state, step counter, best-val scalar,
density-grid state, and the host-side PRNG key — to `resume.pth` in the
run's output dir at every validation checkpoint. `run.py --resume` then
continues a killed run from the last checkpoint instead of from zero:
the optimizer's cosine phase and Adam moments come back exactly (they
live in `opt_state`), the step-keyed grid-update/compaction schedule is
position-independent, and the saved `rng` key continues the same sample
stream.

The accumulated `wall` seconds across segments keep reported training
wall-clocks honest: a resumed run reports the SUM of its segments, not
just the final one.

Writes are atomic (tmp + os.replace) so a relay death mid-save cannot
leave a truncated state file.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_train_state(path: str, params, opt_state, step: int,
                     best_val: float, rng, wall: float,
                     extra: dict | None = None) -> None:
    state = {
        "params": _np(params),
        "opt_state": _np(opt_state),
        "step": int(step),
        "best_val": float(best_val),
        "rng": np.asarray(rng),
        "wall": float(wall),
    }
    if extra:
        for k, v in extra.items():
            state[k] = _np(v) if v is not None else None
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_train_state(path: str) -> dict | None:
    """Return the saved state dict, or None if absent/unreadable.

    A corrupt file (e.g. half-written before atomic writes landed, or a
    pickle from an incompatible optax) must not kill the retry that is
    trying to recover from a crash — fall back to a fresh start.
    """
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:  # noqa: BLE001 — any unpickling failure
        print(f">>> WARNING: resume state {path} unreadable ({e}); "
              f"starting fresh")
        return None
