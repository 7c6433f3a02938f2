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

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "auto_resume_helper",
    "wait_for_checkpoints",
]

_CKPT_RE = re.compile(r"ckpt_epoch_(\d+)$")

# One async checkpointer for the process: ``save`` returns once the
# device->host copy is done and the serialization/fsync continues on a
# background thread, overlapping the next epoch's compute (the reference
# blocks training for the whole torch.save, ``utils.py:69``). Orbax commits
# atomically (tmp dir + rename), so auto-resume only ever sees complete
# checkpoints and a crash mid-write costs no more than the reference's.
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed (call before
    process exit and before reading a just-saved checkpoint)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    output_dir: str,
    epoch: int,
    state,
    max_accuracy: float,
    rng: jax.Array,
    keep_every: int = 5,
    block: bool = False,
) -> str:
    """Write ``ckpt_epoch_<e>`` under ``output_dir``. The latest checkpoint is
    always present; multiples of ``keep_every`` are retained (SAVE_FREQ=5,
    reference ``utils.py:71-77``). Async by default — returns as soon as the
    device->host copy finishes; ``block=True`` (or
    :func:`wait_for_checkpoints`) waits for the commit."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(output_dir), f"ckpt_epoch_{epoch}")
    ckptr = _async_ckptr()
    # at most one save in flight; once the previous one committed, pruning
    # below never touches an uncommitted directory
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        # prune old non-multiple checkpoints, keeping the newest (rank 0
        # only; shared filesystem). Pruning BEFORE enqueueing the new save
        # keeps the previous rolling checkpoint alive until this one exists.
        committed = {}
        for name in os.listdir(output_dir):
            m = _CKPT_RE.match(name)
            if m:
                committed[int(m.group(1))] = name
        newest = max(committed, default=None)
        for e, name in committed.items():
            if e != newest and e != epoch and (
                keep_every <= 0 or e % keep_every != 0
            ):
                import shutil

                shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(epoch),
            "max_accuracy": np.asarray(max_accuracy),
            "rng": np.asarray(jax.random.key_data(rng)),
        },
    }
    ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state) -> Tuple[Any, int, float, jax.Array]:
    """Restore ``(state, epoch, max_accuracy, rng)`` from ``ckpt_epoch_*``."""
    wait_for_checkpoints()  # a just-enqueued async save must commit first
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
    wait_for_checkpoints()  # in-flight async saves are invisible until commit
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
