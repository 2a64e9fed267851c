"""1.5-order TKE closure test: LES-style convective case develops and
sustains bounded subgrid TKE (km_opt=2; canonical em_les case)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import KMOpt, PBLScheme, SFScheme
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


@pytest.mark.slow
def test_les_tke_develops():
    cfg = Config(
        domain=DomainConfig(nx=24, ny=24, nz=16, dx=100.0, dy=100.0,
                            ztop=2000.0, p_top=80000.0),
        time_control=TimeControl(dt=0.4),
        dynamics=DynamicsConfig(km_opt=KMOpt.TKE_15),
        physics=PhysicsConfig(sf_sfclay_physics=SFScheme.REVISED_MM5),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=0.5,
                                  zc=300.0, xr=400.0, zr=200.0, three_d=True)
    state["tsk"] = state["tsk"] + 6.0
    state["tke"] = jnp.full_like(state["tke"], 0.1)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(150)   # 1 min
    tke = np.asarray(sim.state["tke"])
    assert np.isfinite(tke).all()
    assert tke.max() > 0.05          # turbulence sustained/produced
    assert tke.max() < 50.0          # bounded
    assert tke.min() >= 0.0
