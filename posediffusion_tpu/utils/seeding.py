"""Seeding helpers.

Replaces the reference's global seeding (util/utils.py:14-17,
train_util.py:146-148).  JAX randomness is structural (explicit PRNG keys
threaded everywhere), so this only seeds the host-side numpy/python streams
used by the data pipeline, with a per-process offset standing in for
accelerate's ``device_specific=True`` rank-distinct streams.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_all_random_engines(seed: int, process_unique: bool = False) -> int:
    if process_unique:
        seed = seed + jax.process_index()
    np.random.seed(seed % (2**32))
    random.seed(seed)
    return seed
