"""Checkpoint save/resume via orbax (SURVEY.md section 6.4).

Reference behavior: ``torch.save({epoch, state_dict, optimizer, best_perf},
'checkpoint.pth')`` every epoch + ``model_best.pth``; ``--resume`` reloads
both. TPU-native: orbax CheckpointManager with async save, step-numbered
directories, a ``best`` alias, and exact optimizer/BN-state restore.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper holding (params, batch_stats, opt_state, meta)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=lambda m: m.get("perf", 0.0), best_mode="max",
            ),
        )

    def save(self, epoch: int, state, perf: float = 0.0, wait: bool = False):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload),
                       metrics={"perf": float(perf)})
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into the structure of ``state``; returns (state, epoch)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            return state, -1
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        return state.replace(**restored), epoch

    @property
    def best_epoch(self):
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_variables(path: str, variables: Any):
    """One-shot save of a flax variable tree (model zoo export)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), variables, force=True)
    ckpt.wait_until_finished()
    ckpt.close()


def load_variables(path: str, template: Any = None):
    ckpt = ocp.StandardCheckpointer()
    out = ckpt.restore(os.path.abspath(path), template)
    ckpt.close()
    return out


def load_npz_variables(path: str):
    """Load a flax variable tree from a flat .npz (portable zoo format:
    keys are '/'-joined paths)."""
    flat = dict(np.load(path))
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz_variables(path: str, variables: Any):
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(jax.tree.map(np.asarray, variables), ())
    np.savez(path, **flat)
