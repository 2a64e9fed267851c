"""ndown (models/ndown.py — offline one-way nesting from saved coarse
output; canonical: main/ndown_em.F).  Round trip: run a coarse domain with
history writes, feed the files to ndown, advance the fine domain on the
interpolated initial state + boundary segments."""

import glob

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.models import ideal, ndown, soundings
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.models.nest import NestSpec


@pytest.mark.slow
def test_ndown_round_trip(tmp_path):
    cfg = Config(
        domain=DomainConfig(nx=32, ny=12, nz=10, dx=3000.0, dy=3000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=12.0, history_interval_s=60.0),
        dynamics=DynamicsConfig(kvdif=20.0),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.5,
                                  zc=1500.0, xr=8000.0, zr=1200.0,
                                  three_d=True)
    coarse = Simulation(cfg, grid, state, output_dir=str(tmp_path))
    coarse.advance(15)                      # 3 min -> 3 history files
    from wrfchem_arc_interactions_tpu.io import history as hio
    hio.flush()
    files = sorted(glob.glob(str(tmp_path / "hist_*")))
    assert len(files) >= 3

    spec = NestSpec(i_start=10, j_start=3, nx_parent_cells=10,
                    ny_parent_cells=6, ratio=3)
    cfg_c, grid_c, state0, segs = ndown.ndown(
        cfg, files, spec, soundings.constant_n2_theta())
    assert len(segs) == len(files) - 1
    # initial child state carries the interpolated parent bubble signal
    assert float(jnp.max(jnp.abs(state0["t"]))) > 0.05

    fine = Simulation(cfg_c, grid_c, state0, boundary=segs[0],
                      check_nans=True)
    n_per_seg = int(round(60.0 / cfg_c.time_control.dt))
    fine.advance(n_per_seg)
    fine.boundary = segs[1]
    fine.advance(n_per_seg)
    out = fine.state
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(jnp.max(jnp.abs(out["w"]))) < 10.0
