"""b_wave and LES ideal cases (canonical: module_initialize_b_wave.F /
module_initialize_les.F; SURVEY.md §2.1 'Ideal-case initializers')."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import BCKind, KMOpt
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


def test_b_wave_jet_is_balanced():
    """Unperturbed baroclinic jet: the discrete thermal-wind initialisation
    must stay near-balanced (w small) over an hour — the hard part of the
    case."""
    cfg = Config(
        domain=DomainConfig(nx=20, ny=40, nz=16, dx=100e3, dy=100e3,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=240.0),
        # emdiv=0: the external-mode filter's lagged signal resonates in the
        # 100-km inertia-gravity regime (it is a convective-dx tool; WRF
        # idealized channel cases likewise run with filters off)
        dynamics=DynamicsConfig(bc_y=BCKind.SYMMETRIC, khdif=1e4,
                                time_step_sound=6, emdiv=0.0),
    )
    grid, state = ideal.b_wave(cfg, perturb=0.0)
    u0 = np.asarray(state["u"])
    assert u0.max() > 5.0, "thermal-wind jet missing"
    assert abs(u0[:, 0, :].mean()) < abs(u0[:, 20, :]).max()
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(15)                   # 1 h
    w = np.asarray(sim.state["w"])
    assert np.isfinite(w).all()
    assert np.abs(w).max() < 0.1, f"jet unbalanced: w_max {np.abs(w).max()}"


@pytest.mark.slow
def test_b_wave_perturbation_grows():
    cfg = Config(
        domain=DomainConfig(nx=20, ny=40, nz=16, dx=100e3, dy=100e3,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=240.0),
        dynamics=DynamicsConfig(bc_y=BCKind.SYMMETRIC, khdif=1e4,
                                time_step_sound=6, emdiv=0.0),
    )
    grid, state = ideal.b_wave(cfg, perturb=1.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    v0 = float(jnp.abs(sim.state["v"]).max())
    sim.advance(90)                   # 6 h of baroclinic development
    v1 = float(jnp.abs(sim.state["v"]).max())
    assert np.isfinite(np.asarray(sim.state["w"])).all()
    assert v1 > v0, "no meridional eddy development"


@pytest.mark.slow
def test_les_cbl_develops_convection():
    cfg = Config(
        domain=DomainConfig(nx=24, ny=24, nz=20, dx=100.0, dy=100.0,
                            ztop=2000.0, p_top=78000.0),
        time_control=TimeControl(dt=1.0),
        dynamics=DynamicsConfig(km_opt=KMOpt.TKE_15, time_step_sound=6),
        physics=PhysicsConfig(tke_heat_flux=0.24),   # ~290 W/m2
    )
    grid, state = ideal.make_case(cfg, "les")
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(600)                 # 10 min spin-up of the CBL
    w = np.asarray(sim.state["w"])
    assert np.isfinite(w).all()
    # resolved convective plumes: w variance well above the seed noise
    assert w.std() > 0.05, f"no resolved convection (w std {w.std()})"
    assert np.abs(w).max() < 25.0
    # the imposed surface heating has warmed the boundary layer (the lowest
    # layer itself gets vented by the plumes, so check the BL-mean theta)
    t0 = np.asarray(state["t"])
    t1 = np.asarray(sim.state["t"])
    assert (t1[:8] - t0[:8]).mean() > 0.05
