"""Checkpointing with the reference's periodic / last / best-mAP semantics
(reference ``train_vqvae.py:205-206``, ``train_vqvae_deep_bi.py:464-479``,
``train_pixelsnail.py:150-156`` — which saves ``{'model', 'args'}`` and
restores argparse args from the checkpoint, mirrored here by storing the
model config dict alongside the state).

Orbax-backed: sharded-array-aware, async-capable, multi-host-safe (only one
process writes each shard). A plain ``msgpack``-style fallback is deliberately
not provided — Orbax is baked into the image.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Periodic + last + best checkpoints under one directory.

    Layout: ``<dir>/step_<N>/`` (periodic), ``<dir>/last/``, ``<dir>/best/``,
    with ``config.json`` holding the model config (the analogue of PixelSNAIL
    ckpts carrying their argparse args, reference ``train_pixelsnail.py:100-102``).
    """

    def __init__(self, directory: str, config: Optional[Dict[str, Any]] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric = -float("inf")
        if config is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def _save(self, name: str, state) -> None:
        path = os.path.join(self.directory, name)
        self._ckptr.save(path, _to_host(state), force=True)
        # Orbax saves are async; block so short-lived driver processes don't
        # race interpreter shutdown mid-commit.
        self._ckptr.wait_until_finished()

    def save_periodic(self, step: int, state) -> None:
        self._save(f"step_{step:07d}", state)

    def save_last(self, state) -> None:
        self._save("last", state)

    def save_best(self, metric: float, state) -> bool:
        """Keep the best-metric checkpoint (reference best-mAP dict,
        ``train_vqvae_deep_bi.py:464-474``). Returns True if improved."""
        if metric > self.best_metric:
            self.best_metric = metric
            self._save("best", state)
            if jax.process_index() == 0:
                with open(os.path.join(self.directory, "best_metric.json"), "w") as f:
                    json.dump({"metric": float(metric)}, f)
            return True
        return False

    def restore(self, name: str, target):
        """Restore by name ('last', 'best', 'step_0000010') with ``target``
        as the abstract pytree template."""
        path = os.path.join(self.directory, name)
        return self._ckptr.restore(path, target=jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, _to_host(target)))

    def restore_latest(self, target):
        """Restore the newest checkpoint if one exists, else return
        ``target`` untouched. Returns ``(state, name_or_None)``.

        Tolerant of a fresh directory so trainers can pass ``--resume``
        unconditionally (first launch starts clean; a relaunch after an
        outage picks up the newest ``step_*``/``last``) — the reference
        likewise only loads when a checkpoint path is given
        (``train_pixelsnail.py:100-106``)."""
        latest = self.latest_step()
        name = f"step_{latest:07d}" if latest is not None else "last"
        if not os.path.isdir(os.path.join(self.directory, name)):
            return target, None
        return self.restore(name, target), name

    def load_config(self) -> Optional[Dict[str, Any]]:
        p = os.path.join(self.directory, "config.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def latest_step(self) -> Optional[int]:
        steps = []
        for d in os.listdir(self.directory):
            if d.startswith("step_"):
                try:
                    steps.append(int(d.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None
