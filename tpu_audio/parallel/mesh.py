"""Device-mesh construction.

The reference is single-device (its "communication backend" is the Metal
queue — SURVEY §2.17); all multi-chip structure here is new TPU design:
a 2-D (dp, tp) mesh whose tp axis rides ICI for tensor-parallel attention/
MLP shards and whose dp axis carries batch replicas. Collectives are
whatever XLA GSPMD inserts — no NCCL/MPI analogue exists or is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, tp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = all devices, dp = 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = 1, n
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp})×tp({tp}) != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
