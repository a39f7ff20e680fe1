"""Device-mesh construction for multi-chip / multi-host runs.

The reference has no distributed layer at all (SURVEY.md §2.2); this is
new TPU-native design: a 2D ("data", "model") mesh where

  * "data"  — frames/cameras (batch) parallelism; gradients all-reduce
              over this axis (DCN-friendly across hosts),
  * "model" — Gaussian-parallel geometry stage + tile-parallel raster
              stage inside each replica (ICI-friendly).

Multi-host initialization goes through jax.distributed; single-process
multi-device uses the local devices directly.
"""

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = -1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. model=-1 uses all remaining
    devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model == -1:
        assert n % data == 0, (n, data)
        model = n // data
    assert data * model <= n
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def local_mesh() -> Mesh:
    """Single-device mesh (degenerate but keeps one code path)."""
    return make_mesh(1, 1)


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host entry (`jax.distributed.initialize`); call before any
    JAX computation on pod slices."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
