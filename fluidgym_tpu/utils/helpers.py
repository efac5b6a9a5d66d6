"""Misc helpers (reference util/helpers.py:9-20)."""

from __future__ import annotations

import random

import numpy as np

__all__ = ["seed_all"]


def seed_all(seed: int):
    """Seed python, numpy and return a jax PRNG key."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
