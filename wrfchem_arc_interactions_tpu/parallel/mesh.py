"""2D device mesh construction — the RSL_LITE patch-decomposition analog.

The reference decomposes the horizontal (x, y) plane into MPI patches
(canonical: external/RSL_LITE/task_for_point.c; SURVEY.md §2.5).  Here the
decomposition is a `jax.sharding.Mesh` with axes ("my", "mx"); fields shard
(y over my, x over mx) per the registry-derived PartitionSpecs, z stays
on-device.  On multi-host slices, lay the mesh out so one axis rides ICI
within a host and the other crosses DCN (the axis order of `mesh_shape`
controls which — devices enumerate fastest along the last axis).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_Y = "my"
AXIS_X = "mx"


def make_mesh(mesh_y: int, mesh_x: int,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = mesh_y * mesh_x
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(mesh_y, mesh_x)
    return Mesh(arr, (AXIS_Y, AXIS_X))


def block_shape(ny: int, nx: int, mesh: Mesh) -> Tuple[int, int]:
    my = mesh.shape[AXIS_Y]
    mx = mesh.shape[AXIS_X]
    if ny % my or nx % mx:
        raise ValueError(f"grid ({ny},{nx}) not divisible by mesh ({my},{mx})")
    return ny // my, nx // mx
