"""Seeding (reference: utils.py:6-16 seeds python/numpy/torch + deterministic
cuDNN). In JAX, determinism is structural — PRNG keys are explicit and
threaded — so this only covers the host-side numpy/python RNGs used by the
input pipeline, plus a root jax key helper."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 2025) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
