"""Checkpoint save/load/auto-resume via Orbax.

TPU equivalent of reference ``utils.py:18-103``: rolling per-epoch save plus
numbered snapshots every SAVE_FREQ, newest-checkpoint auto-resume, and exact
RNG-state capture (here: the jax PRNG key + step; the reference saves four
RNG streams because torch scatters randomness across libraries —
``utils.py:64-67``). ``.pth`` files are handled by :mod:`.pth_import` and
can be passed anywhere a native checkpoint is accepted.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "auto_resume_helper"]

_CKPT_RE = re.compile(r"ckpt_epoch_(\d+)$")


def save_checkpoint(
    output_dir: str,
    epoch: int,
    state,
    max_accuracy: float,
    rng: jax.Array,
    keep_every: int = 5,
) -> str:
    """Write ``ckpt_epoch_<e>`` under ``output_dir``. The latest checkpoint is
    always present; multiples of ``keep_every`` are retained (SAVE_FREQ=5,
    reference ``utils.py:71-77``)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(output_dir), f"ckpt_epoch_{epoch}")
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(epoch),
            "max_accuracy": np.asarray(max_accuracy),
            "rng": np.asarray(jax.random.key_data(rng)),
        },
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() != 0:
        return path
    # prune old non-multiple checkpoints (rank 0 only; shared filesystem)
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m:
            e = int(m.group(1))
            if e != epoch and (keep_every <= 0 or e % keep_every != 0):
                import shutil

                shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
    return path


def load_checkpoint(path: str, state) -> Tuple[Any, int, float, jax.Array]:
    """Restore ``(state, epoch, max_accuracy, rng)`` from ``ckpt_epoch_*``."""
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(0),
            "max_accuracy": np.asarray(0.0),
            "rng": np.asarray(jax.random.key_data(jax.random.PRNGKey(0))),
        },
    }
    restored = ckptr.restore(os.path.abspath(path), payload)
    meta = restored["meta"]
    rng = jax.random.wrap_key_data(np.asarray(meta["rng"]))
    return restored["state"], int(meta["epoch"]), float(meta["max_accuracy"]), rng


def auto_resume_helper(output_dir: str) -> Optional[str]:
    """Newest ``ckpt_epoch_*`` dir by mtime (reference ``utils.py:93-103``)."""
    if not os.path.isdir(output_dir):
        return None
    cands = [
        os.path.join(output_dir, d)
        for d in os.listdir(output_dir)
        if _CKPT_RE.match(d)
    ]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)
