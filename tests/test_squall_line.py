"""BASELINE config 2: the 2D squall line end-to-end (dycore + Kessler
microphysics + Smagorinsky diffusion), the minimum end-to-end slice of
SURVEY.md §7.2."""

import numpy as np
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


@pytest.mark.slow
def test_squall_line_convection_develops():
    cfg = Config(
        domain=DomainConfig(nx=60, ny=4, nz=24, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    mub = np.asarray(grid.mub)
    dnw = np.asarray(grid.dnw).reshape(-1, 1, 1)

    def total_water():
        mu_full = mub + np.asarray(sim.state["mu"])
        q = sum(np.asarray(sim.state[n]) for n in ("qv", "qc", "qr"))
        col = -np.sum(dnw * q, axis=0) * mu_full / 9.81
        return float(col.sum() + np.asarray(sim.state["rainnc"]).sum())

    w0 = total_water()
    # 30 min: past the vigorous-updraft peak at ~20 min that detonated the
    # inverted vertical upwinding (vflux) and the non-positive low-order
    # limiter premise — the regression window for both fixes
    sim.run_seconds(1800.0)
    w = np.asarray(sim.state["w"])
    qc = np.asarray(sim.state["qc"])
    assert np.isfinite(w).all()
    # the triggered cell should be convecting with cloud + rain formed
    assert w.max() > 1.0, f"w_max={w.max()}"
    assert w.max() < 60.0, f"runaway updraft: w_max={w.max()}"
    assert qc.max() > 1e-4, f"qc_max={qc.max()}"
    assert np.asarray(sim.state["rainnc"]).max() > 1.0, "no rain after 30 min"
    # moisture stays positive (PD limiter + scheme floors)
    for q in ("qv", "qc", "qr"):
        assert np.asarray(sim.state[q]).min() >= 0.0
    # water budget closes (advection + limiter + microphysics conservative)
    drift = abs(total_water() - w0) / w0
    assert drift < 5e-3, f"water budget drift {drift*100:.2f}%"
    # moist static energy bounded: theta_e must not exceed its initial
    # tropospheric max by more than mixing-level artifacts
    pb = np.asarray(grid.pb)[:17]
    th = np.asarray(sim.state["t"])[:17] + 300.0
    qv = np.asarray(sim.state["qv"])[:17]
    t_abs = th * (pb / 1e5) ** 0.2857
    th_e = th * np.exp(2.5e6 * qv / (1004.0 * np.maximum(t_abs, 150.0)))
    assert th_e.max() < 360.0, f"theta_e pumped to {th_e.max():.1f}"


@pytest.mark.slow
def test_supercell_3d_runs():
    """quarter_ss 3D supercell ideal case (canonical em_quarter_ss)."""
    cfg = Config(
        domain=DomainConfig(nx=32, ny=32, nz=20, dx=2000.0, dy=2000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "quarter_ss", bubble_amp=3.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.run_seconds(600.0)
    w = np.asarray(sim.state["w"])
    assert np.isfinite(w).all()
    assert w.max() > 1.0
