"""Global seeding (reference set_seed, tasks/speech_to_speech.py:33-42).

In JAX the PRNG is explicit and threaded (no global torch/cuda state), so
this only pins host-side randomness (numpy for data order/noise draws,
python hash) and returns the root jax.random key for the run.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int):
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
