"""Device-mesh helpers.

The reference is strictly single-GPU (SURVEY §2: no distributed execution
of any kind); multi-chip scale-out is new, idiomatic TPU capability:
rays are data-parallel over the ICI mesh with the octree + MLP weights
replicated per chip, and the per-frame tile gather is the only collective
(BASELINE config 5).  The MLP can additionally be tensor-parallel over a
second ``model`` axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


RAY_AXIS = "rays"
MODEL_AXIS = "model"


def make_mesh(shape: Sequence[int],
              axis_names: Sequence[str],
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh of {n} devices requested, only {len(devices)} available")
    dev = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(dev, tuple(axis_names))


def default_mesh(devices: Optional[Sequence] = None,
                 model_parallel: int = 1) -> Mesh:
    """All local devices as (rays, model); model_parallel=1 -> pure DP."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError("device count not divisible by model_parallel")
    return make_mesh((n // model_parallel, model_parallel),
                     (RAY_AXIS, MODEL_AXIS), devices)
