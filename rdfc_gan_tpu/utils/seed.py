"""Deterministic seeding (reference: lib/utils/seed_all.py:6-22).

JAX is functionally seeded via explicit PRNG keys; this seeds the host-side
python/numpy RNGs used by the data pipeline and returns the root jax key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int, deterministic: bool = False) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        # XLA is deterministic by default on TPU for a fixed program; nothing
        # analogous to cudnn.benchmark to disable.
        pass
    return jax.random.PRNGKey(seed)
