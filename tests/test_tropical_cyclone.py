"""Tropical-cyclone ideal case (canonical:
dyn_em/module_initialize_tropical_cyclone.F): axisymmetric warm-core vortex
on an f-plane over a warm SST.  Closes the last missing initializer from
SURVEY.md §2.1's ideal-case list (VERDICT r4 ask #9)."""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import (
    MPScheme, SFScheme,
)
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


def _cfg(nx=36, ny=36, nz=16):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=20e3, dy=20e3,
                            ztop=20000.0, p_top=5000.0),
        time_control=TimeControl(dt=60.0),
        dynamics=DynamicsConfig(kvdif=50.0, khdif=300.0),
        physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                              sf_sfclay_physics=SFScheme.REVISED_MM5),
    )


def test_tc_init_warm_core_and_gradient_wind():
    """The initial vortex must carry a thermal-wind-balanced warm core
    (theta decays outward aloft where v_t decays with height) and a
    cyclonic tangential wind with its maximum at r_max."""
    cfg = _cfg()
    grid, state = ideal.make_case(cfg, "tropical_cyclone", v_max=20.0,
                                  r_max=80e3)
    th = np.asarray(state["t"])
    u = np.asarray(state["u"])
    v = np.asarray(state["v"])
    spd = np.sqrt(u ** 2 + v ** 2)
    assert np.isfinite(th).all() and np.isfinite(spd).all()
    assert 15.0 < spd.max() < 25.0
    # warm core at mid levels: centre warmer than the domain corners
    k = cfg.domain.nz // 2
    c0 = cfg.domain.nx // 2
    core = th[k, c0 - 2:c0 + 2, c0 - 2:c0 + 2].mean()
    far = th[k, :4, :4].mean()
    assert core - far > 0.3, (core, far)
    # cyclonic rotation (northern hemisphere): v > 0 east of centre,
    # v < 0 west of centre at the surface
    assert v[0, c0, c0 + 2] > 1.0
    assert v[0, c0, c0 - 3] < -1.0
    # SST is warm-ocean
    assert abs(float(state["tsk"][0, 0]) - 302.0) < 0.5


def test_tc_spinup_stable_and_surface_fluxes_moisten_core():
    """30 min of integration with surface fluxes over the 302 K ocean: the
    vortex persists (no collapse/blowup) and the spin-up mechanism is
    active — boundary-layer theta_e at the core rises as latent+sensible
    heat flows in at high wind speed (WISHE; full intensification needs
    hours of model time, which belongs to scripts, not the test suite)."""
    cfg = _cfg()
    grid, state = ideal.make_case(cfg, "tropical_cyclone", v_max=20.0,
                                  r_max=80e3)
    c0 = cfg.domain.nx // 2
    sl = np.s_[0, c0 - 3:c0 + 3, c0 - 3:c0 + 3]

    def theta_e_proxy(s):
        # theta + Lv/cp * qv at the lowest level, core average
        return float(np.asarray(s["t"][sl]).mean()
                     + 2.5e6 / 1004.0 * np.asarray(s["qv"][sl]).mean())

    te0 = theta_e_proxy(state)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(30)                      # 30 minutes
    out = sim.state
    for k, a in out.items():
        assert np.isfinite(np.asarray(a)).all(), k
    u = np.asarray(out["u"])
    v = np.asarray(out["v"])
    spd = np.sqrt(u ** 2 + v ** 2)
    # vortex persists: winds neither collapsed nor blew up
    assert 10.0 < spd.max() < 60.0, spd.max()
    te1 = theta_e_proxy(out)
    assert te1 > te0, (te0, te1)
