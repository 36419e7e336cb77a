"""Checkpoint save/restore (orbax) + partial weight loading.

Replaces the reference's Lightning ModelCheckpoint / EMAModelCheckpoint
(utils/ema.py:184-258, launch.py:206-239): async orbax checkpoints of the
full TrainState (params, opt_state, EMA params, step) with `save_last` and
`every_n_train_steps` retention semantics, plus `load_module_weights`-style
partial loading with regex filtering (utils/misc.py:40-70).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..parallel.train_step import TrainState


class CheckpointManager:
    """Thin orbax wrapper with the reference's retention behavior:
    save_top_k=-1 => keep all periodic checkpoints; save_last => a rolling
    'last' is always available (orbax keeps every step we save)."""

    def __init__(self, directory: str, every_n_train_steps: int = 1000,
                 max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.every_n = max(1, int(every_n_train_steps))
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True)
        self.mngr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, state: TrainState, force: bool = False,
                   step: Optional[int] = None) -> bool:
        """Save every_n steps (or always when force).  `step` avoids a
        device sync when the caller tracks it host-side.  Re-saving an
        already-saved step is a no-op (a forced final save after a periodic
        one would otherwise raise in orbax)."""
        step = int(state.step) if step is None else int(step)
        if not force and step % self.every_n != 0:
            return False
        if step in (self.mngr.all_steps() or []):
            return False
        self.mngr.save(step, args=ocp.args.StandardSave(_to_save(state)))
        return True

    def wait(self):
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mngr.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(_to_save(state_like)))
        return TrainState(**restored)

    def close(self):
        self.mngr.wait_until_finished()
        self.mngr.close()


def _to_save(state: TrainState) -> dict:
    return {"step": state.step, "params": state.params,
            "opt_state": state.opt_state, "ema_params": state.ema_params}


def load_module_weights(params: Any, source_params: Any,
                        include: Optional[str] = None,
                        ignore: Optional[str] = None) -> Any:
    """Copy matching leaves from source into params by path
    (utils/misc.py:40-70 equivalent).  include/ignore are regexes over the
    '/'-joined path."""
    flat_src = {"/".join(str(k.key) for k in path): v
                for path, v in jax.tree_util.tree_flatten_with_path(
                    source_params)[0]}

    def pick(path, leaf):
        key = "/".join(str(k.key) for k in path)
        if key not in flat_src:
            return leaf
        if include and not re.search(include, key):
            return leaf
        if ignore and re.search(ignore, key):
            return leaf
        src = flat_src[key]
        assert src.shape == leaf.shape, (key, src.shape, leaf.shape)
        return src.astype(leaf.dtype) if hasattr(src, "astype") else src

    return jax.tree_util.tree_map_with_path(pick, params)
