"""On-chip kernel correctness: the Mosaic-compiled failure classes the CPU
suite cannot reach (VMEM budgets, MXU input-precision truncation, in-kernel
PRNG), executed on the real chip.

Each test wraps a committed, standalone on-chip checker (they assert /
``sys.exit(1)`` on failure, which pytest reports as a test failure), so the
evidence path is identical whether driven by hand or by this lane:

- ``bench_ggs.py --parity``       -> fused GGS vs jnp/autodiff
- ``bench_matching.py --parity``  -> fused SuperGlue vs batched XLA matcher
- ``experiments/tpu_smoke_train_kernels.py`` -> fused train trunks:
  f32-exact ViT fwd/bwd parity, encoder parity, in-kernel dropout
  determinism + finite-difference-checked dropout backward

Reference contrast: the reference has no custom kernels and therefore needs
no such lane (plain torch ops, pose_diffusion/train.py:151-253); this
framework's single-chip speedups all flow through these kernels, so their
on-chip behavior is pinned here.
"""

import importlib.util
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ggs_fused_matches_autodiff_on_chip():
    _load("bench_ggs.py", "bench_ggs").parity()


def test_superglue_fused_matches_xla_on_chip():
    _load("bench_matching.py", "bench_matching").parity()


def test_fused_train_trunks_smoke_on_chip():
    _load(
        "experiments/tpu_smoke_train_kernels.py", "tpu_smoke_train_kernels"
    ).main()
