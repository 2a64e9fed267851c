import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec

from wrfchem_arc_interactions_tpu.config import Config, DomainConfig
from wrfchem_arc_interactions_tpu.config.namelist import ChemConfig, ChemOpt, MPScheme, PhysicsConfig
from wrfchem_arc_interactions_tpu.registry.state import (
    advected_names,
    build_state,
    restart_names,
    state_partition_specs,
    validate_state,
)


def small_cfg(**kw):
    return Config(domain=DomainConfig(nx=8, ny=4, nz=6), **kw)


def test_build_and_validate():
    cfg = small_cfg()
    state = build_state(cfg)
    validate_state(cfg, state)
    assert state["u"].shape == (6, 4, 8)
    assert state["w"].shape == (7, 4, 8)
    assert state["mu"].shape == (4, 8)


def test_partition_specs_shard_yx_only():
    cfg = small_cfg()
    specs = state_partition_specs(cfg)
    assert specs["u"] == PartitionSpec(None, "my", "mx")
    assert specs["mu"] == PartitionSpec("my", "mx")


def test_restart_set_includes_prognostics():
    cfg = small_cfg()
    names = restart_names(cfg)
    for f in ("u", "v", "w", "ph", "t", "mu", "qv"):
        assert f in names


def test_advected_set_kessler():
    cfg = small_cfg()
    assert set(advected_names(cfg)) == {"qv", "qc", "qr"}


def test_chem_package_gates_fields():
    cfg = small_cfg(chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN))
    state = build_state(cfg)
    assert "chem_so4_a01" in state
    assert "chem_num_a04" in state
    assert "tau_aer_sw" in state
    assert state["tau_aer_sw"].shape[0] > 1  # band axis
    cfg_none = small_cfg()
    assert "chem_so4_a01" not in build_state(cfg_none)


def test_morrison_moist_set():
    cfg = small_cfg(physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2))
    state = build_state(cfg)
    for f in ("qi", "qs", "qg", "nc", "nr"):
        assert f in state
