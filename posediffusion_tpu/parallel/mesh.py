"""Device mesh construction for DP / FSDP sharding.

Replaces the reference's NCCL DDP-through-accelerate
(reference: pose_diffusion/train.py:36,81; SURVEY.md section 2.2): instead of
wrapping the model, we build a ``jax.sharding.Mesh`` over the slice and
annotate shardings; XLA emits the all-reduces over ICI.

The model is ~30M params, so the primary axis is data parallelism ("dp");
an optional "fsdp" axis shards parameters (and their optimizer state) when
memory demands it — GSPMD inserts the all-gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    fsdp: int = 1,
    axis_names: Tuple[str, str] = ("dp", "fsdp"),
) -> Mesh:
    """Mesh over the first n_devices with shape (n/fsdp, fsdp)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % fsdp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by fsdp={fsdp}")
    grid = np.asarray(devices[:n_devices]).reshape(n_devices // fsdp, fsdp)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(x: jax.ShapeDtypeStruct, fsdp_size: int) -> P:
    """Shard the largest divisible axis of a >=2D param over 'fsdp'."""
    if fsdp_size <= 1 or x.ndim < 2:
        return P()
    # prefer the last axis (output features) for Dense kernels
    for axis in (x.ndim - 1, x.ndim - 2):
        if x.shape[axis] % fsdp_size == 0 and x.shape[axis] >= 2 * fsdp_size:
            spec = [None] * x.ndim
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Per-leaf NamedShardings: FSDP if the mesh has a real fsdp axis."""
    fsdp_size = mesh.shape.get("fsdp", 1)

    def leaf(x):
        return NamedSharding(mesh, fsdp_param_spec(x, fsdp_size))

    return jax.tree.map(leaf, params)
