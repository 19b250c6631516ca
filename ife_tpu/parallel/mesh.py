"""Device mesh construction and volume sharding.

Volumes are (X, Y, Z) arrays; we block-shard the leading spatial axes over
a 1D or 2D device mesh (axis names "x", "y"). Z — the minor, lane-mapped
axis on TPU — stays unsharded so VPU lanes and DMA rows remain contiguous.

The reference has no distributed layer at all (SURVEY.md §2.4); the design
here is the standard JAX recipe: build a Mesh, annotate NamedShardings, let
XLA place collectives on ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("x",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1D ("x") or 2D ("x", "y") spatial decomposition mesh.

    For 2D, devices are factored as close to square as possible (a square
    block decomposition minimizes halo surface per device).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]

    if len(axis_names) == 1:
        shape: Tuple[int, ...] = (n_devices,)
    elif len(axis_names) == 2:
        a = int(np.floor(np.sqrt(n_devices)))
        while n_devices % a:
            a -= 1
        shape = (n_devices // a, a)
    else:
        raise ValueError("mesh must be 1D ('x',) or 2D ('x','y')")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def volume_pspec(mesh: Mesh) -> P:
    """PartitionSpec for a (X, Y, Z[, C...]) volume on this mesh: shard the
    leading spatial axes by mesh axis name, replicate everything else."""
    names = mesh.axis_names
    if len(names) == 1:
        return P(names[0])
    return P(names[0], names[1])


def shard_volume(data: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a volume array onto the mesh with block sharding."""
    return jax.device_put(data, NamedSharding(mesh, volume_pspec(mesh)))
