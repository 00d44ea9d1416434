"""Seeding (utils/random_utils.py:9-23 equivalent).

JAX threads PRNG keys explicitly; this seeds the host-side generators
(python/numpy) used by data pipelines."""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
