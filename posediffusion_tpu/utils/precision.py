"""Precision control for the geometry stack.

TPU matmuls default to bfloat16 accumulation, which is fine for the model's
big MXU matmuls but corrupts small geometric quantities: a pose round trip
through bf16 rotation products shows up as multi-degree relative-pose error.
Every public geometry function is therefore traced under
``jax.default_matmul_precision("float32")`` — negligible FLOPs, exact
metrics.
"""

from __future__ import annotations

import functools

import jax


def highp(fn):
    """Decorator: trace ``fn`` with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
