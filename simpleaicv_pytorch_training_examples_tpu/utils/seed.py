"""Deterministic seeding.

Parity with /root/reference/tools/utils.py:95-116 (`set_seed`,
`worker_seed_init_fn`). On TPU/JAX most randomness flows through explicit
`jax.random.PRNGKey` threading, so this only has to pin the host-side numpy /
python RNGs used by the data pipeline, plus PYTHONHASHSEED.
"""

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def worker_seed(worker_id: int, process_index: int, seed: int) -> int:
    """Derive a distinct seed per data-pipeline worker per process."""
    return (seed + worker_id * 1000003 + process_index * 7919) % (2**31)
