"""Orbax checkpointing with full train-state restore.

The reference saves full accelerate state every 5 epochs but its manual
resume restores weights only (reference: pose_diffusion/train.py:84-91 —
optimizer/scheduler/epoch are silently dropped, SURVEY.md section 5).  Here
``save``/``restore`` round-trip the complete TrainState (step counter,
params, optimizer state), exceeding the reference's resume fidelity.

Also supports loading the reference's torch .pth checkpoints through the
converter (``load_reference_checkpoint``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from posediffusion_tpu.utils.convert import (
    convert_pose_diffusion_checkpoint,
    load_torch_checkpoint,
)


def save(ckpt_dir: str, state, step: Optional[int] = None, keep: int = 3) -> str:
    """Save a train state (or bare params pytree) under ckpt_dir/<step>."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
    path = os.path.join(ckpt_dir, f"ckpt_{step:06d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # Multi-host: every process participates in the (collective) orbax save,
    # but only process 0 prunes — concurrent rmtree of the same dirs races
    # (reference gates ckpt housekeeping on rank 0, train.py:128,142).
    if jax.process_index() == 0:
        _prune_old(ckpt_dir, keep)
    return path


def restore(path: str, target):
    """Restore into the structure of ``target`` (a concrete pytree)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    names = sorted(n for n in os.listdir(ckpt_dir) if n.startswith("ckpt_"))
    return os.path.join(ckpt_dir, names[-1]) if names else None


def _prune_old(ckpt_dir: str, keep: int):
    import shutil

    names = sorted(n for n in os.listdir(ckpt_dir) if n.startswith("ckpt_"))
    for n in names[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, n), ignore_errors=True)


def load_reference_checkpoint(path: str):
    """Load a reference torch .pth checkpoint as a params pytree
    (demo/test parity path, reference: demo.py:56-57)."""
    return convert_pose_diffusion_checkpoint(load_torch_checkpoint(path))
