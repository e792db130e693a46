"""Crash-safe training checkpoints.

Behavioral reference: save_checkpoint / load_checkpoint
(src/trainer/marigold_depth_trainer.py:614-696): the UNet is saved in
diffusers layout (so composed pipeline checkpoints remain loadable by the
reference stack — README.md:446-450 checkpoint-compose contract), plus a
trainer state blob (optimizer/LR state, effective iter, epoch,
n_batch_in_epoch, best metric, seed sequence, in_evaluation flag). The old
checkpoint is renamed `_old_*` before writing and removed only after
success (crash safety, reference :617-661).

Format: our trainer state is a flat npz of numpy leaves + a JSON manifest
(framework-neutral, no pickle)."""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def _unflatten_into(tree, flat: dict):
    def rebuild(path, leaf):
        key = jax.tree_util.keystr(path)
        arr = flat[key]
        return type(leaf)(arr) if np.isscalar(leaf) else arr

    return jax.tree_util.tree_map_with_path(rebuild, tree)


def save_train_state(
    ckpt_dir: str,
    unet_cfg,
    unet_params,
    scheduler,
    trainer_state: dict[str, Any],
    opt_state=None,
) -> None:
    """Write ckpt_dir/{unet/, scheduler/, trainer_state.npz, trainer.json}
    atomically (old dir kept as _old_* during the write)."""
    from marigold_tpu.models import weights as W

    parent = os.path.dirname(ckpt_dir.rstrip("/")) or "."
    name = os.path.basename(ckpt_dir.rstrip("/"))
    os.makedirs(parent, exist_ok=True)
    tmp_old = os.path.join(parent, f"_old_{name}")
    if os.path.exists(ckpt_dir):
        if os.path.exists(tmp_old):
            shutil.rmtree(tmp_old)
        os.rename(ckpt_dir, tmp_old)
    try:
        os.makedirs(ckpt_dir, exist_ok=True)
        W.save_unet(unet_cfg, unet_params, os.path.join(ckpt_dir, "unet"))
        scheduler.save_pretrained(os.path.join(ckpt_dir, "scheduler"))
        if opt_state is not None:
            np.savez(
                os.path.join(ckpt_dir, "opt_state.npz"), **_flatten(opt_state)
            )
        with open(os.path.join(ckpt_dir, "trainer.json"), "w") as f:
            json.dump(trainer_state, f, indent=2)
    except Exception:
        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        if os.path.exists(tmp_old):
            os.rename(tmp_old, ckpt_dir)
        raise
    if os.path.exists(tmp_old):
        shutil.rmtree(tmp_old)


def load_train_state(ckpt_dir: str, opt_state_template=None) -> Tuple:
    """-> (unet_cfg, unet_params, schedule, trainer_state dict, opt_state)."""
    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import weights as W

    unet_cfg, unet_params = W.load_unet(os.path.join(ckpt_dir, "unet"))
    schedule = DiffusionSchedule.from_pretrained(os.path.join(ckpt_dir, "scheduler"))
    with open(os.path.join(ckpt_dir, "trainer.json")) as f:
        trainer_state = json.load(f)
    opt_state = None
    opt_path = os.path.join(ckpt_dir, "opt_state.npz")
    if opt_state_template is not None and os.path.exists(opt_path):
        with np.load(opt_path) as z:
            flat = dict(z)
        opt_state = _unflatten_into(opt_state_template, flat)
    return unet_cfg, unet_params, schedule, trainer_state, opt_state
