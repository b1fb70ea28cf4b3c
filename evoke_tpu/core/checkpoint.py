"""Checkpoint save / resume / cross-stage partial load (orbax-backed).

Capability parity: EVOKE modules/trainer_v0401.py:160-202 —
``current_checkpoint.pth`` every save_period + ``model_best.pth`` on monitor
improvement; three load modes: **resume** (full state incl. optimizer/epoch),
**load** (cross-stage partial: keep only keys present in the target with
matching shapes, strict=False — how Stage-1 weights seed Stage-2), and
test-time load. Checkpoints carry {epoch, monitor_best, scheduler} metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


class CheckpointManager:
    """Directory layout: {dir}/current/, {dir}/best/, plus meta.json per slot.

    async_save=True uses orbax's AsyncCheckpointer so the epoch loop continues
    while the state streams to disk (SURVEY §5.3's preemption-resilience
    mandate); saves are serialized (wait before starting the next).
    """

    def __init__(self, directory: str, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.async_save = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _slot(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def wait(self) -> None:
        if self.async_save:
            self._ckptr.wait_until_finished()

    def save(self, name: str, state: Any, meta: Optional[Dict[str, Any]] = None,
             force: bool = True) -> None:
        """state: any pytree (e.g. TrainState). meta: JSON-serializable extras."""
        path = self._slot(name)
        self.wait()  # serialize in-flight async saves
        self._ckptr.save(path, jax.device_get(state), force=force)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta or {}, f)

    def exists(self, name: str) -> bool:
        self.wait()
        return os.path.isdir(self._slot(name))

    def restore(self, name: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
        """Full restore into the structure of ``target`` (shapes must match)."""
        self.wait()  # an in-flight async save of this slot must land first
        path = self._slot(name)
        restored = self._ckptr.restore(path, item=jax.device_get(target))
        meta = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return restored, meta

    def restore_raw(self, name: str) -> Any:
        self.wait()
        return self._ckptr.restore(self._slot(name))

    def partial_restore(self, source: Any, target: Any) -> Tuple[Any, Dict[str, int]]:
        """Merge ``source`` leaves into ``target`` by path + shape match (strict=False).

        The reference's cross-stage load (trainer_v0401.py:191-202): keys absent
        from the target or with mismatched shapes are skipped silently.
        """
        src_flat = {
            _path_str(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(source)[0]
        }
        loaded, skipped = 0, 0

        def merge(path, tgt_leaf):
            nonlocal loaded, skipped
            key = _path_str(path)
            src = src_flat.get(key)
            if src is not None and tuple(src.shape) == tuple(np.shape(tgt_leaf)):
                loaded += 1
                return jax.numpy.asarray(src, dtype=jax.numpy.asarray(tgt_leaf).dtype)
            skipped += 1
            return tgt_leaf

        merged = jax.tree_util.tree_map_with_path(merge, target)
        return merged, {"loaded": loaded, "skipped": skipped}

    def partial_restore_from(self, name_or_path: str, target: Any
                             ) -> Tuple[Any, Dict[str, int]]:
        path = name_or_path if os.path.isabs(name_or_path) else self._slot(name_or_path)
        source = self._ckptr.restore(path)
        # saved TrainState pytrees keep params under 'params'
        if isinstance(source, dict) and "params" in source and (
                not isinstance(target, dict) or "params" not in target):
            source = source["params"]
        return self.partial_restore(source, target)
