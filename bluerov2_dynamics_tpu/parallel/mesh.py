"""Device-mesh helpers for multi-chip scale-out.

The reference has no distributed runtime at all (SURVEY.md §2.5); the
natural parallel axis of this workload is the rollout/start-index batch
(pure data parallelism: the 12-dim state needs no tensor parallelism), with
an optional 'model' axis for sharding the Koopman lift dimension.
Collectives (psum for RMSE partial sums, all-reduce for DP gradients) are
inserted by XLA from sharding annotations and ride the ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default shape puts everything on the 'data' axis: ``(n_devices, 1)``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def shard_along(mesh: Mesh, x, axis_name: str = "data", dim: int = 0):
    """Device-put ``x`` sharded along ``dim`` over the named mesh axis."""
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
