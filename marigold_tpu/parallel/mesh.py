"""Device-mesh & sharding layer.

The reference has NO distributed code (SURVEY.md §2.6): one GPU, ensemble
members chunked into batches. The TPU-native design scales the same
semantics over chips:

  * inference: the ensemble/batch axis shards over a 1-D `data` mesh axis
    riding ICI — E independent denoise trajectories are embarrassingly
    parallel, so XLA inserts zero collectives in the UNet loop and one
    all-gather before the ensemble reduction.
  * training: pjit data-parallel — same `data` axis, psum gradient
    all-reduce inserted by XLA from the sharding annotations.

Everything is expressed through `jax.sharding.NamedSharding` annotations on
jitted functions; no explicit collectives in model code.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over (the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_parallel_sharding(mesh: Mesh, ndim: int, axis_name: str = "data"):
    """NamedSharding that splits the leading (batch/ensemble) dim."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicate(mesh: Mesh, x):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(
        x, NamedSharding(mesh, P())
    )


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Shard array(s) along the leading dim. Pads semantics are the
    caller's responsibility (leading dim should divide the axis size)."""
    def put(a):
        return jax.device_put(a, data_parallel_sharding(mesh, a.ndim, axis_name))

    return jax.tree_util.tree_map(put, x)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m
