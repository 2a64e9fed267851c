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
    sim.run_seconds(900.0)  # 15 min
    w = np.asarray(sim.state["w"])
    qc = np.asarray(sim.state["qc"])
    assert np.isfinite(w).all()
    # the triggered cell should be convecting with cloud formed
    assert w.max() > 1.0, f"w_max={w.max()}"
    assert qc.max() > 1e-4, f"qc_max={qc.max()}"
    # moisture stays positive (PD limiter + scheme floors)
    for q in ("qv", "qc", "qr"):
        assert np.asarray(sim.state[q]).min() >= 0.0


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
