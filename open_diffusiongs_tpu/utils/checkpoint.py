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


def _flatten_params(tree: Any) -> dict:
    """Pytree -> {'a/b/c': leaf}, with any leading 'params/' stripped so
    flax trees align with converted-NPZ key layout."""
    flat = {}
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(k.key) for k in path)
        if key.startswith("params/"):
            key = key[len("params/"):]
        flat[key] = v
    return flat


def load_weights_file(path: str, use_ema: bool = True) -> dict:
    """Load a weight source into a flat {'a/b/c': array} dict.

    Accepts either
      * an NPZ from tools/convert_reference_ckpt.py ('/'-joined keys), or
      * an orbax checkpoint directory (a training trial's `ckpts/`, a
        pretrained dir containing `ckpts/`, or the ckpt dir itself) — the
        TrainState's EMA params when available (use_ema) else raw params.

    This is the TPU-side counterpart of the reference's torch.load +
    prefix-strip in denoiser_scene.py:264-290 / utils/misc.py:40-70.
    """
    if os.path.isfile(path):
        return dict(np.load(path))
    d = path
    if os.path.isdir(os.path.join(path, "ckpts")):
        d = os.path.join(path, "ckpts")
    mngr = ocp.CheckpointManager(os.path.abspath(d))
    step = mngr.latest_step()
    assert step is not None, f"no checkpoint found under {path}"
    restored = mngr.restore(step)
    mngr.close()
    params = restored.get("ema_params") if use_ema else None
    if params is None:
        params = restored["params"]
    return _flatten_params(params)


def load_module_weights(params: Any, source: Any,
                        include: Optional[str] = None,
                        ignore: Optional[str] = None,
                        strict: bool = False,
                        verbose: bool = True) -> Any:
    """Copy matching leaves from `source` into `params` by '/'-joined path
    (utils/misc.py:40-70 equivalent; key remap semantics of
    denoiser_scene.py:264-290 are handled by `load_weights_file`).

    source: a params pytree or an already-flat {'a/b/c': array} dict.
    include/ignore: regexes over the path ('params/' prefix stripped).
    strict: every non-ignored target leaf MUST be found in source
      (reference load_state_dict(strict=True)); shape mismatches always
      raise.
    """
    flat_src = _flatten_params(source)
    loaded, skipped, missing = [], [], []

    def pick(path, leaf):
        key = "/".join(str(k.key) for k in path)
        if key.startswith("params/"):
            key = key[len("params/"):]
        if include and not re.search(include, key):
            skipped.append(key)
            return leaf
        if ignore and re.search(ignore, key):
            skipped.append(key)
            return leaf
        if key not in flat_src:
            missing.append(key)
            return leaf
        src = flat_src[key]
        if getattr(src, "shape", ()) != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: ckpt {src.shape} vs model "
                f"{leaf.shape}")
        loaded.append(key)
        return src.astype(leaf.dtype) if hasattr(src, "astype") else src

    out = jax.tree_util.tree_map_with_path(pick, params)
    if strict and missing:
        raise KeyError(
            f"strict load: {len(missing)} target leaves not in source, "
            f"e.g. {missing[:5]}")
    if verbose:
        print(f"[open_diffusiongs_tpu] loaded {len(loaded)} tensors"
              + (f", {len(missing)} missing" if missing else "")
              + (f", {len(skipped)} filtered out" if skipped else ""))
    return out
