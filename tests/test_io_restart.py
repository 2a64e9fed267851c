"""Restart bit-exactness (SURVEY.md §4.2: run 2N steps vs N + restart + N —
the reference's core regression invariant) and history stream contents,
exercised through the default container (native netCDF when the C++ backend
builds, npz otherwise)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import Config, DomainConfig, TimeControl
from wrfchem_arc_interactions_tpu.io import history as hio
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.registry.state import history_names, restart_names


def _cfg(tmp):
    return Config(
        domain=DomainConfig(nx=24, ny=4, nz=12, dx=1000.0, dy=1000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=5.0, history_interval_s=25.0,
                                 restart_interval_s=25.0),
    )


@pytest.mark.parametrize("ext", [hio.default_extension(), ".npz"])
def test_restart_bit_exact(tmp_path, ext):
    cfg = _cfg(tmp_path)
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)

    # run 2N straight
    sim_a = Simulation(cfg, grid, state)
    sim_a.advance(10)

    # run N, dump (explicitly in this container), restart, run N
    out = str(tmp_path)
    sim_b = Simulation(cfg, grid, state)
    sim_b.advance(5)
    path = f"{out}/restart_000005{ext}"
    hio.write_restart(path, cfg, sim_b.state, 5, sim_b.time_s)
    hio.flush()
    restored, step, t_s = hio.read_restart(path, cfg, state)
    assert step == 5 and t_s == 25.0
    sim_c = Simulation(cfg, grid, restored)
    sim_c.step_idx = step
    sim_c.time_s = t_s
    sim_c.advance(5)

    for name in restart_names(cfg):
        a = np.asarray(sim_a.state[name])
        b = np.asarray(sim_c.state[name])
        np.testing.assert_array_equal(a, b, err_msg=f"restart drift in {name}")


def test_history_written(tmp_path):
    cfg = _cfg(tmp_path)
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)
    sim = Simulation(cfg, grid, state, output_dir=str(tmp_path))
    sim.advance(5)
    hio.flush()
    ext = hio.default_extension()
    f, time_s = hio.read_history(str(tmp_path / f"hist_000005{ext}"))
    for name in history_names(cfg):
        assert name in f, name
    assert time_s == 25.0
    assert f["u"].shape == (12, 4, 24)


def test_driver_restart_alarm_writes_default_container(tmp_path):
    cfg = _cfg(tmp_path)
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)
    sim = Simulation(cfg, grid, state, output_dir=str(tmp_path))
    sim.advance(5)
    hio.flush()
    ext = hio.default_extension()
    restored, step, t_s = hio.read_restart(
        str(tmp_path / f"restart_000005{ext}"), cfg, state)
    assert step == 5 and t_s == 25.0
    for name in restart_names(cfg):
        np.testing.assert_array_equal(np.asarray(restored[name]),
                                      np.asarray(sim.state[name]))
