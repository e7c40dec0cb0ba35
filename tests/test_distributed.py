"""Two-process ``jax.distributed`` smoke test (localhost coordinator).

Exercises the one multi-host code path no in-process test can touch: the
distributed-runtime bootstrap (parallel/distributed.py, used by train.py),
per-process data sharding into a GLOBAL batch
(``shard_host_batch`` / ``make_array_from_process_local_data``), and one
SPMD train step over a mesh spanning both processes — the stand-in for the
reference's ``accelerate launch --multi_gpu --num_processes=8``
(reference: pose_diffusion/train.py:81, README.md:70).

Each child gets 2 virtual CPU devices; the global mesh is dp=4 across the
two processes, gloo backing the cross-process collectives.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys

import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

# sitecustomize may pin an accelerator PJRT plugin; force CPU before the
# first backend touch (same recipe as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

from posediffusion_tpu.parallel import (
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    param_shardings,
    shard_host_batch,
)

assert maybe_initialize_distributed(), "coordinator env not picked up"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

pid = jax.process_index()

# ---- per-process data sharding: common shape stream, disjoint item streams
from posediffusion_tpu.data import DynamicBatchSampler

sampler = DynamicBatchSampler(
    1000, dataset_len=3, max_images=8, images_per_seq=(3, 6),
    frame_buckets=(4, 8), batch_multiple=2,
    seed=7 + 1000 * pid, shape_seed=31,
)
specs = [list(map(list, b)) for b in sampler]

# ---- one SPMD train step over the global dp=4 mesh
from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
from posediffusion_tpu.training import (
    TrainState, jit_train_step, make_optimizer, make_train_step,
)

mesh = make_mesh(4)
model = PoseDiffusionModel(
    PoseDiffusionConfig(
        z_dim=32, d_model=32, nhead=2, num_encoder_layers=2,
        dim_feedforward=64, mlp_hidden_dim=16, vit_depth=1, vit_heads=2,
        timesteps=8, scale_factors=(1.0,),
    )
)
params = model.init(jax.random.PRNGKey(0), image_hw=(64, 64))
params = jax.device_put(params, param_shardings(mesh, params))
opt, _ = make_optimizer(lr=1e-4, T_0=50, iters_per_epoch=16384)
state = TrainState.create(params, opt)
step_fn = jit_train_step(
    make_train_step(model, opt, batch_repeat=2, compute_metrics=True)
)

# local half of the global batch: DIFFERENT data per process (seeded by pid)
rng = np.random.default_rng(100 + pid)
local = {
    "images": rng.uniform(size=(2, 3, 3, 64, 64)).astype(np.float32),
    "pose_encodings": (rng.normal(size=(2, 3, 9)) * 0.3).astype(np.float32),
    "mask": np.tile([True, True, False], (2, 1)),
}
batch = shard_host_batch(mesh, local, batch_sharding(mesh))
assert batch["images"].shape == (4, 3, 3, 64, 64)  # global, not local

new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["loss"])
assert np.isfinite(loss)
assert int(jax.device_get(new_state.step)) == 1

# ---- multi-host checkpoint round-trip: all processes join the collective
# orbax save (only process 0 prunes), then restore into a fresh state and
# verify step + params survive across the process boundary.
from posediffusion_tpu.training import restore, save

ckpt_dir = os.environ["DIST_TEST_CKPT_DIR"]
path = save(ckpt_dir, new_state)
fresh = TrainState.create(
    jax.device_put(params, jax.tree.map(lambda a: a.sharding, new_state.params)), opt
)
restored = restore(path, fresh)
assert int(jax.device_get(restored.step)) == 1
ref_leaves = jax.tree.leaves(new_state.params)
got_leaves = jax.tree.leaves(restored.params)
for a, b in zip(ref_leaves, got_leaves):
    np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))
ckpt_ok = True

print("RESULT " + json.dumps(
    {"pid": pid, "loss": loss, "specs": specs, "ckpt_ok": ckpt_ok}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            DIST_TEST_CKPT_DIR=str(tmp_path / "ckpts"),
        )
        # Drop any single-process virtual-device forcing from the pytest env.
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child rc={p.returncode}\n{out}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}

    # SPMD consistency: both controllers computed the same global loss.
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # Checkpoint round-trip succeeded on both controllers.
    assert results[0]["ckpt_ok"] and results[1]["ckpt_ok"]

    # Data sharding: same shape stream (frames-per-seq and batch size match
    # step-for-step), different items.
    s0, s1 = results[0]["specs"], results[1]["specs"]
    for b0, b1 in zip(s0, s1):
        assert len(b0) == len(b1)
        assert b0[0][1] == b1[0][1]  # same n_per_seq
    assert s0 != s1  # process-unique item streams
