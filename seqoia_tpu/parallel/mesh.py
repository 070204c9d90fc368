"""Device mesh helpers.

The corpus workload is embarrassingly parallel over images, so the primary
axis is data-parallel ("b"). Large single images additionally shard their
pixel dimension ("s") for the tiled path (SURVEY.md §2.3 mapping table).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(devices=None, axis: str = "b") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "b") -> NamedSharding:
    """Shard the leading (batch) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
