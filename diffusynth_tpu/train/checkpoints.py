"""Orbax checkpointing with JSON hyperparameter sidecars.

Mirrors the reference's checkpoint roles (model + optimizer state per model,
best-loss gating, historical snapshots; reference: VQGAN.py:746-757,
diffusion.py:496-521) with orbax instead of torch.save, plus the same
write-only JSON sidecar convention (models/hyperparameters/*.json;
reference: VQGAN.py:607-621).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, root: str = "models"):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        os.makedirs(os.path.join(self.root, "hyperparameters"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "history"), exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str, role: str, step: Optional[int] = None) -> str:
        if step is not None:
            return os.path.join(self.root, "history", f"{name}_{step}_{role}")
        return os.path.join(self.root, f"{name}_{role}")

    def save(self, name: str, role: str, state: Dict[str, Any],
             step: Optional[int] = None, overwrite: bool = True):
        """state: pytree dict, e.g. {"variables": ..., "opt_state": ...,
        "step": ...}.

        Crash-safe overwrite: the new checkpoint is written NEXT TO the
        old one and swapped in only after it is fully committed, so a
        kill mid-save never destroys the last good checkpoint (the r5
        endurance run caught the old rmtree-first ordering leaving a
        window where exists() was False and a concurrent --resume
        started from scratch).
        """
        import shutil

        path = self._path(name, role, step)
        if not (overwrite and os.path.exists(path)):
            self._ckpt.save(path, state)
            self._ckpt.wait_until_finished()
            return
        new = path + f".new-{os.getpid()}"
        if os.path.exists(new):
            shutil.rmtree(new)
        self._ckpt.save(new, state)
        self._ckpt.wait_until_finished()
        old = path + f".old-{os.getpid()}"
        os.rename(path, old)        # atomic; tiny window between the two
        os.rename(new, path)        # renames, never without a checkpoint
        shutil.rmtree(old)

    def restore(self, name: str, role: str, template: Dict[str, Any],
                step: Optional[int] = None) -> Dict[str, Any]:
        path = self._path(name, role, step)
        return self._ckpt.restore(path, template)

    def exists(self, name: str, role: str) -> bool:
        return os.path.exists(self._path(name, role))

    def save_hyperparameters(self, name: str, role: str,
                             hyper: Dict[str, Any]):
        path = os.path.join(self.root, "hyperparameters", f"{name}_{role}.json")
        clean = {}
        for k, v in hyper.items():
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            elif isinstance(v, (tuple, list)):
                v = list(v)
            elif hasattr(v, "tolist"):
                v = v.tolist()
            clean[k] = v
        with open(path, "w") as f:
            json.dump(clean, f, ensure_ascii=False, indent=4)
