"""Seeding & deterministic-resume seed streams.

The reference achieves bit-reproducible-in-expectation resume by
pre-generating a per-step seed list from a global seed
(src/util/seeding.py:47-64) and popping one seed per training step. We keep
the same contract (a finite, saveable list of per-step seeds) but the seeds
feed `jax.random.PRNGKey` streams rather than torch generators.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_all(seed: int) -> None:
    """Seed host-side RNGs (python, numpy). JAX randomness is explicit via
    keys, so there is no global JAX seed to set."""
    random.seed(seed)
    np.random.seed(seed % (2**32))


def generate_seed_sequence(initial_seed: int, length: int,
                           min_val=-0x8000_0000_0000_0000,
                           max_val=0xFFFF_FFFF_FFFF_FFFF) -> list[int]:
    """Deterministic per-step seed list derived from a global seed
    (contract of reference src/util/seeding.py:47-64)."""
    if initial_seed is None:
        raise ValueError("initial_seed must not be None")
    gen = random.Random(initial_seed)
    return [gen.randint(min_val, max_val) for _ in range(length)]


def key_from_seed(seed: int) -> jax.Array:
    """Map an arbitrary (possibly negative / 64-bit) seed onto a PRNGKey."""
    return jax.random.PRNGKey(seed % (2**31))
