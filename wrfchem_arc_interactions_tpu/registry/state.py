"""State pytree construction and sharding derivation from the field table.

Replaces the Registry-generated `alloc_space_field` / `module_domain` `grid`
object (canonical: frame/module_domain.F; SURVEY.md §2.4): state is a plain
``dict[str, jax.Array]`` — already a pytree, already orbax-checkpointable,
already shardable — built from :func:`registry.fields.field_table`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.registry.fields import FieldSpec, field_table

State = Dict[str, jax.Array]


def build_state(cfg: Config, dtype=jnp.float32) -> State:
    """Allocate an all-zeros state for this configuration."""
    d = cfg.domain
    return {
        spec.name: jnp.zeros(spec.shape(d.nz, d.ny, d.nx), dtype)
        for spec in field_table(cfg)
    }


def spec_index(cfg: Config) -> Dict[str, FieldSpec]:
    return {s.name: s for s in field_table(cfg)}


def partition_spec(spec: FieldSpec, mesh_axes: Tuple[str, str] = ("my", "mx")) -> PartitionSpec:
    """Derive the PartitionSpec: y,x sharded over the 2D device mesh, z and
    any extra (band/bin) axes replicated on-device (SURVEY.md §5.7: vertical
    never decomposed)."""
    parts = []
    for _ in spec.extra:
        parts.append(None)
    for d in spec.dims:
        if d in ("z", "zs"):
            parts.append(None)
        elif d == "y":
            parts.append(mesh_axes[0])
        elif d == "x":
            parts.append(mesh_axes[1])
    return PartitionSpec(*parts)


def state_partition_specs(cfg: Config,
                          mesh_axes: Tuple[str, str] = ("my", "mx")) -> Dict[str, PartitionSpec]:
    return {s.name: partition_spec(s, mesh_axes) for s in field_table(cfg)}


def restart_names(cfg: Config) -> Tuple[str, ...]:
    """Fields in the exact-restart set (the Registry `r` flag; SURVEY.md §3.5)."""
    return tuple(s.name for s in field_table(cfg) if s.restart)


def history_names(cfg: Config) -> Tuple[str, ...]:
    return tuple(s.name for s in field_table(cfg) if s.history)


def advected_names(cfg: Config) -> Tuple[str, ...]:
    """Scalar-advection set (moist + chem + tke): advanced by rk_scalar_tend
    with the time-averaged acoustic mass fluxes."""
    return tuple(s.name for s in field_table(cfg) if s.advected)


def halo_width(cfg: Config) -> int:
    return max((s.halo for s in field_table(cfg)), default=0)


def validate_state(cfg: Config, state: State) -> None:
    """Shape-check a state dict against the registry (debug aid)."""
    d = cfg.domain
    table = spec_index(cfg)
    missing = set(table) - set(state)
    extra = set(state) - set(table)
    if missing or extra:
        raise ValueError(f"state/table mismatch: missing={sorted(missing)} extra={sorted(extra)}")
    for name, spec in table.items():
        want = spec.shape(d.nz, d.ny, d.nx)
        got = tuple(state[name].shape)
        if want != got:
            raise ValueError(f"{name}: shape {got}, registry expects {want}")
