"""Pressure-level diagnostics stream (io/diags.py — the auxhist analog,
SURVEY.md §5.5): SLP reduction, log-p interpolation correctness, and the
Simulation alarm writing auxdiag files."""

import glob

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.io import diags
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


def _case(nx=16, ny=4, nz=20):
    cfg = Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0, history_interval_s=0.0,
                                 auxhist_interval_s=50.0),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    return cfg, grid, state


def test_interp_and_slp_physical():
    cfg, grid, state = _case()
    out = diags.compute_diags(state, grid, cfg)
    slp = out["slp"]
    # quiescent sea-level domain: SLP ~ surface pressure ~ 1000 hPa
    assert 9.5e4 < slp.mean() < 1.03e5
    # 500 hPa height ~ 5.5 km, 850 ~ 1.5 km for a standard-ish sounding
    z500 = out["z_pl"][2]
    z850 = out["z_pl"][0]
    assert np.isfinite(z500).all() and np.isfinite(z850).all()
    assert 4500.0 < np.nanmean(z500) < 6500.0
    assert 1000.0 < np.nanmean(z850) < 2200.0
    # temperature decreases with altitude across the levels
    t = out["t_pl"]
    assert np.nanmean(t[0]) > np.nanmean(t[2]) > np.nanmean(t[3])
    # interpolation exactness: T at a pressure equal to a model level
    # reproduces that level's value
    p, t_air, z, qv, mu = diags._column_fields(state, grid, cfg)
    k = 5
    got = diags._interp_p(p, t_air, [float(p[k, 0, 0])])[0, 0, 0]
    np.testing.assert_allclose(got, t_air[k, 0, 0], rtol=1e-6)
    # levels above the model top are missing-valued
    high = diags._interp_p(p, t_air, [1.0])
    assert np.isnan(high).all()


def test_auxhist_alarm_writes_files(tmp_path):
    cfg, grid, state = _case()
    sim = Simulation(cfg, grid, state, output_dir=str(tmp_path))
    sim.advance(10)        # 100 s -> auxdiag every 50 s
    from wrfchem_arc_interactions_tpu.io import history as hio
    hio.flush()
    files = sorted(glob.glob(str(tmp_path / "auxdiag_*")))
    assert len(files) == 2
    if files[0].endswith(".npz"):
        with np.load(files[0]) as z:
            assert "slp" in z.files and "z_pl" in z.files
    else:
        from wrfchem_arc_interactions_tpu.io import netcdf as ncio
        f, attrs = ncio.read_netcdf(files[0])
        assert "slp" in f and "z_pl" in f
