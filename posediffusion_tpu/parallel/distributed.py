"""Multi-process (multi-host) runtime initialization.

Replaces the reference's ``accelerate launch --multi_gpu --num_processes=N``
process bootstrap (reference: pose_diffusion/train.py:36,81, README.md:70):
one Python process per host, coordinated through JAX's distributed runtime;
GSPMD then treats the union of all hosts' chips as one mesh.

Two launch modes:

* managed clusters (SLURM / OpenMPI / k8s / Cloud TPU): JAX auto-detects the
  coordinator and process ids — ``jax.distributed.initialize()`` no-arg.
* manual launchers: set ``JAX_COORDINATOR_ADDRESS`` (host:port) plus
  ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` on each process; this module
  passes them explicitly (JAX has no generic env-var cluster detector).

Pinned by tests/test_distributed.py, which launches two local CPU processes
through this exact path and runs one sharded train step.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when a coordinator is configured.

    Returns True when the distributed runtime was initialized (multi-process
    mode), False for the ordinary single-process case.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr and not _cluster_auto_detectable():
        return False

    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if (nproc is None) != (pid is None):
            raise ValueError(
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID must be set together"
            )
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
            kwargs["process_id"] = int(pid)
        ids = os.environ.get("JAX_LOCAL_DEVICE_IDS")
        if ids:
            kwargs["local_device_ids"] = [int(x) for x in ids.split(",")]
    jax.distributed.initialize(**kwargs)
    return True


def _cluster_auto_detectable() -> bool:
    """True when JAX's built-in cluster detectors would find a coordinator
    (SLURM / OpenMPI / Cloud TPU pods) AND there is more than one process;
    keeps no-arg initialize working on managed clusters without requiring
    our env vars.  The >1 guard matters: single-chip environments can set
    e.g. ``TPU_WORKER_HOSTNAMES=localhost`` without any coordinator."""
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        val = os.environ.get(var)
        if val and val.isdigit() and int(val) > 1:
            return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def shard_host_batch(mesh, batch, sharding):
    """Assemble a global device batch from this process's host-local shard.

    Single-process: a plain ``device_put`` (the host array IS the global
    batch).  Multi-process: each host's loader produced 1/process_count of
    the global batch (process-unique sampler seeds); stitch them into one
    global jax.Array with ``make_array_from_process_local_data`` — the
    multi-controller equivalent of accelerate's per-rank dataloader shards
    (reference: pose_diffusion/train.py:81).
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
