"""Public entry for running the model over a 2D device mesh.

Wraps `dycore.solve.step` (and, when configured, the physics/chem drivers
via `models.driver`) in `jax.shard_map` with registry-derived PartitionSpecs:
state and base-state fields shard (y, x) over the ("my", "mx") mesh, the
vertical and any spectral axes stay on-device, halos flow through
`HaloOps`'s ppermute path (SURVEY.md §2.5, §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import AXIS_X, AXIS_Y
from wrfchem_arc_interactions_tpu.registry.state import State, state_partition_specs


def grid_partition_specs(grid: Grid):
    """PartitionSpecs for the Grid pytree: trailing (ny, nx) axes shard over
    the mesh, 1D vertical-coordinate arrays replicate."""

    def spec_of(a):
        if a.ndim == 1:
            return P()
        if a.ndim == 2:
            return P(AXIS_Y, AXIS_X)
        if a.ndim == 3:
            return P(None, AXIS_Y, AXIS_X)
        raise ValueError(a.shape)

    return jax.tree.map(spec_of, grid)


def halo_ops_for(cfg: Config, mesh: Optional[Mesh]) -> HaloOps:
    if mesh is None:
        return HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    return HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y,
                   mesh_y=mesh.shape[AXIS_Y], mesh_x=mesh.shape[AXIS_X],
                   sharded=True)


def make_sharded_step(cfg: Config, grid: Grid, mesh: Mesh,
                      step_fn: Callable, dt: float):
    """Build a jitted sharded step: step_fn(state, grid, cfg, hx, dt) -> state.

    Returns (sharded_step, place) where `place(state, grid)` device_puts the
    inputs with the proper shardings (avoiding implicit resharding on the
    first call).
    """
    hx = halo_ops_for(cfg, mesh)
    s_specs = {k: v for k, v in state_partition_specs(cfg).items()}
    g_specs = grid_partition_specs(grid)

    fn = jax.shard_map(
        lambda s, g: step_fn(s, g, cfg, hx, dt),
        mesh=mesh, in_specs=(s_specs, g_specs), out_specs=s_specs)
    jitted = jax.jit(fn)

    def place(state: State, grid_in: Grid):
        s = {k: jax.device_put(v, NamedSharding(mesh, s_specs[k]))
             for k, v in state.items()}
        g = jax.tree.map(
            lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
            grid_in, g_specs)
        return s, g

    return jitted, place
