"""Deterministic seeding (reference: misc/shared_utils.py:120-126 seed_everything).

JAX is functionally random (explicit PRNG keys), so the main job here is
seeding the *host-side* numpy/python RNGs used by the data pipeline, and
providing a root jax key derivation helper.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def fold_in_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a named subkey deterministically (stable across runs)."""
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(key, h)
