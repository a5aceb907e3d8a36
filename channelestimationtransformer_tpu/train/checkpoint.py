"""Checkpoint save/restore with step-exact resume.

Reference: ``FullPrecision/QuantizationAwareTraining.py:301-313`` saves
``{epoch, model_state_dict, optimizer_state_dict, global_step}`` as
``weights/tmodel_<tag><epoch>.pt``; ``config.py:36-50`` implements
latest-checkpoint globbing. Here the full :class:`TrainState` (params, opt
state, batch stats, step) serializes via flax msgpack; writes are atomic
(tmp + rename) so an interrupted job can always resume from the newest file.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Optional

from flax import serialization


def checkpoint_path(folder: str, basename: str, epoch) -> str:
    return str(Path(folder) / f"{basename}{epoch}.msgpack")


def save_checkpoint(state, folder: str, basename: str, epoch, *, extra: Optional[dict] = None) -> str:
    """Atomically serialize a TrainState (+ optional metadata dict)."""
    os.makedirs(folder, exist_ok=True)
    payload = {"state": serialization.to_state_dict(state), "epoch": epoch}
    if extra:
        payload["extra"] = extra
    path = checkpoint_path(folder, basename, epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, state):
    """Restore into a template TrainState; returns (state, epoch, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    restored = serialization.from_state_dict(state, payload["state"])
    return restored, payload.get("epoch"), payload.get("extra")


def latest_checkpoint(folder: str, basename: str) -> Optional[str]:
    """Newest checkpoint by numeric epoch suffix (reference
    ``latest_weights_file_path``, ``FullPrecision/config.py:44-50``)."""
    p = Path(folder)
    if not p.exists():
        return None
    best, best_epoch = None, -1
    pat = re.compile(re.escape(basename) + r"(\d+)\.msgpack$")
    for f in p.glob(f"{basename}*.msgpack"):
        m = pat.match(f.name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = str(f), int(m.group(1))
    return best
