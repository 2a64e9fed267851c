"""FDDA analysis (grid) nudging tests (canonical:
phys/module_fdda_psufddagd.F; VERDICT r3 item 8)."""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import FDDAConfig
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.models.lateral_bc import LateralBoundary


def _cfg(fdda=None):
    return Config(
        domain=DomainConfig(nx=24, ny=8, nz=16, dx=2000.0, dy=2000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=10.0),
        dynamics=DynamicsConfig(kvdif=10.0),
        fdda=fdda or FDDAConfig(),
    )


def _analysis_window(state, u_target, t_hi=7200.0):
    """Two-snapshot analysis: initial state -> same state with the wind
    replaced by a uniform u_target."""
    lo = {k: state[k] for k in ("u", "v", "t", "qv") if k in state}
    hi = dict(lo)
    hi["u"] = jnp.full_like(state["u"], u_target)
    z = jnp.zeros((), jnp.float32)
    return LateralBoundary(lo=lo, hi=hi, t_lo=z, t_hi=z + t_hi)


def test_grid_nudging_tracks_analysis():
    cfg = _cfg(FDDAConfig(grid_fdda=True, guv=2.0e-3, gt=2.0e-3, gq=2.0e-4))
    grid, state = ideal.make_case(cfg, "quiescent")
    anal = _analysis_window(state, u_target=6.0, t_hi=1800.0)
    sim = Simulation(cfg, grid, state, check_nans=True, fdda=anal)
    sim.run_seconds(1800.0)
    u = np.asarray(sim.state["u"])
    # tau = 1/guv = 500 s; after 1800 s of ramping target the wind must
    # have moved most of the way to 6 m/s
    assert u.mean() > 2.5, f"nudging too weak: u_mean={u.mean():.2f}"
    assert u.mean() < 6.5
    # still a healthy model state
    assert np.isfinite(np.asarray(sim.state["t"])).all()
    assert np.abs(np.asarray(sim.state["w"])).max() < 2.0


def test_fdda_off_is_bit_identical():
    """With grid_fdda disabled the fdda argument must be completely inert
    (identical executable, identical results)."""
    cfg = _cfg(FDDAConfig(grid_fdda=False))
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)
    anal = _analysis_window(state, u_target=6.0)
    sim_a = Simulation(cfg, grid, state, fdda=anal)
    sim_b = Simulation(cfg, grid, dict(state))
    sim_a.advance(20)
    sim_b.advance(20)
    for k in sim_a.state:
        np.testing.assert_array_equal(np.asarray(sim_a.state[k]),
                                      np.asarray(sim_b.state[k]), err_msg=k)


def test_k_start_masks_low_levels():
    fd = FDDAConfig(grid_fdda=True, guv=2.0e-3, k_start=6)
    cfg = _cfg(fd)
    grid, state = ideal.make_case(cfg, "quiescent")
    anal = _analysis_window(state, u_target=6.0, t_hi=1.0)  # full target now
    sim = Simulation(cfg, grid, state, check_nans=True, fdda=anal)
    sim.run_seconds(600.0)
    u = np.asarray(sim.state["u"])
    # upper levels nudged hard, lowest levels only via mixing (much less)
    assert u[8:].mean() > 3.0
    assert u[:3].mean() < 0.5 * u[8:].mean()
