"""PRNG discipline: one root key per run, folded per purpose/step.

Replaces the reference's global seeding (EVOKE modules/utils.py:147-157
``setup_seed``: python/numpy/torch + deterministic cuDNN) with JAX's explicit
functional keys — deterministic by construction, reproducible across restarts
because keys derive from (seed, step, name).
"""

from __future__ import annotations

import hashlib
from typing import Dict

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def _name_to_int(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


def fold_name(key: jax.Array, name: str) -> jax.Array:
    return jax.random.fold_in(key, _name_to_int(name))


def step_key(key: jax.Array, step, name: str = "step") -> jax.Array:
    """Key for a given step (accepts traced step values inside jit)."""
    return jax.random.fold_in(fold_name(key, name), step)


def split_named(key: jax.Array, *names: str) -> Dict[str, jax.Array]:
    return {n: fold_name(key, n) for n in names}


def seed_numpy(seed: int) -> np.random.Generator:
    """Host-side generator for data-pipeline shuffling (never used on device)."""
    return np.random.default_rng(seed)
