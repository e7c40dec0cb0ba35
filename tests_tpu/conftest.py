"""On-chip test lane: runs on the REAL TPU, unlike tests/ (CPU mesh).

The default suite (``pytest tests/``) pins an 8-virtual-device CPU backend
so it runs anywhere; Mosaic-compiled kernel behavior (VMEM budgets, MXU
precision, in-kernel PRNG) is exactly what that lane cannot see.  This
directory is the complement: ``python -m pytest tests_tpu/ -q`` on a
TPU-attached host executes the committed on-chip checks — the artifacts in
TPU_SMOKE.log / KERNEL_PARITY.log are captures of these — as plain pytest
tests.  Every test is skipped (not failed) when no TPU is the default
backend, so the command is safe to include in any CI matrix.

Not collected by the default run: pytest.ini sets ``testpaths = tests``.
"""

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from posediffusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    platform = jax.devices()[0].platform
    if platform in ("cpu",):
        skip = pytest.mark.skip(
            reason=f"tests_tpu/ needs a real TPU backend (got {platform!r})"
        )
        for item in items:
            item.add_marker(skip)
