"""Orbax checkpointing with true resume.

Replaces the reference's `torch.save(state_dict)` every 50 k steps
(`main/train/training_loop.py:300-320`) and its commented-out resume
machinery (`:109-131`): here the full train state (params, optimizer,
EMA, step) is saved atomically and `latest_step`/`restore` give real
crash recovery.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params_npz(path: str, params: Any) -> None:
    """Flat-npz export for interchange (mirrors the reference's bare
    `model{step:09d}.pt` weight dumps)."""
    import numpy as np

    def part(p):
        for attr in ("key", "idx", "name"):  # Dict/Sequence/GetAttr keys
            if hasattr(p, attr):
                return str(getattr(p, attr))
        return str(p).strip(".")

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, v in flat:
        key = "/".join(part(p) for p in kp)
        out[key] = np.asarray(v)
    np.savez(path, **out)


def load_params_npz(path: str) -> dict:
    """Inverse of `save_params_npz`: rebuild the nested dict tree from the
    flat 'a/b/c'-keyed npz."""
    import numpy as np

    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out
