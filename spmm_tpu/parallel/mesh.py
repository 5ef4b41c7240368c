"""Device mesh helpers.

TPU-native equivalent of the reference's (absent) multi-process runtime
(SURVEY.md §2.12): scaling is expressed as a ``jax.sharding.Mesh`` +
``shard_map`` with XLA collectives over ICI/DCN — no custom transport.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Sequence[int] | int | None = None,
    axis_names: Sequence[str] = ("rows",),
    *,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` → 1-D mesh over all devices on axis "rows".
    ``make_mesh((r, c), ("rows", "cols"))`` → 2-D row×col mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if isinstance(shape, int):
        shape = (shape,)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    axis_names = tuple(axis_names)[: len(shape)]
    if len(axis_names) != len(shape):
        raise ValueError(f"axis_names {axis_names} does not match mesh shape {shape}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def initialize_distributed() -> None:
    """Multi-host bootstrap (no-op single-host).  Call before building
    meshes on a real pod slice."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        import os

        if "COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass
