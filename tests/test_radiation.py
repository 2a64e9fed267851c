"""Radiation tests (BASELINE config 1 shape: single/multi-column RRTMG
SW+LW, CPU-runnable). The k-tables are synthetic (see ktables.py provenance
note), so validation is internal: energy conservation, physical limits,
monotone responses to cloud/aerosol/zenith — not AER line-by-line numbers."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_lw import (
    band_planck_fractions, lw_fluxes,
)
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import sw_fluxes
from wrfchem_arc_interactions_tpu.physics.radiation import bands
from wrfchem_arc_interactions_tpu.utils import constants as c


def standard_column(nz=40, ncol=2, qv0=0.012, lwp_cloud=0.0):
    """Idealised tropical-ish column, surface-first (k=0 at the ground)."""
    p_w = np.linspace(1.0e5, 5.0e3, nz + 1)
    p_lay = 0.5 * (p_w[:-1] + p_w[1:])
    dp_lay = -(np.diff(p_w))
    z = 16.0e3 * (1.0 - (p_lay / 1.0e5) ** 0.29)
    t_lay = np.maximum(300.0 - 6.5e-3 * z, 210.0)
    qv = qv0 * (p_lay / 1.0e5) ** 3
    lwp = np.zeros(nz)
    if lwp_cloud > 0:
        lwp[nz // 3] = lwp_cloud
    rep = lambda a: jnp.asarray(np.repeat(a[:, None], ncol, 1), jnp.float32)
    return (rep(p_lay), rep(t_lay), rep(dp_lay), rep(qv), rep(lwp),
            jnp.full((ncol,), 300.0, jnp.float32))


def test_planck_band_fractions_normalised():
    t = jnp.asarray([[210.0, 260.0], [300.0, 320.0]])
    f = band_planck_fractions(t)
    assert f.shape[0] == bands.NBND_LW
    np.testing.assert_allclose(np.asarray(f.sum(axis=0)), 1.0, rtol=1e-5)


def test_lw_physical_limits():
    args = standard_column()
    out = lw_fluxes(*args)
    olr = float(out["olr"][0])
    glw = float(out["glw"][0])
    sigts4 = c.STBOLT * 300.0 ** 4   # ~459 W/m2
    assert 120.0 < olr < sigts4, olr
    assert 100.0 < glw < sigts4, glw
    # flux-heating consistency (telescoping identity, f32 tolerance)
    fnet = np.asarray(out["flux_up"] - out["flux_dn"])
    hr = np.asarray(out["heating"])
    dp = np.asarray(args[2])
    lhs = (hr * c.CP * dp / c.G).sum(axis=0)
    rhs = fnet[0] - fnet[-1]
    np.testing.assert_allclose(lhs, rhs, atol=0.5)
    # clear-sky LW cooling is bounded
    assert np.abs(hr).max() * 86400.0 < 50.0, "heating exceeds 50 K/day"


def test_lw_greenhouse_effect():
    clear = lw_fluxes(*standard_column(qv0=1e-4))
    moist = lw_fluxes(*standard_column(qv0=0.015))
    # more vapor -> lower OLR, higher downwelling at the surface
    assert float(moist["olr"][0]) < float(clear["olr"][0])
    assert float(moist["glw"][0]) > float(clear["glw"][0])


def test_lw_cloud_effect():
    clear = lw_fluxes(*standard_column())
    cloudy = lw_fluxes(*standard_column(lwp_cloud=0.2))
    assert float(cloudy["olr"][0]) < float(clear["olr"][0])


def test_sw_conservation_and_limits():
    p, t, dp, qv, lwp, ts = standard_column()
    ncol = p.shape[1]
    mu0 = jnp.asarray([1.0, 0.5], jnp.float32)
    alb = jnp.full((ncol,), 0.2, jnp.float32)
    out = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    toa_dn = np.asarray(out["flux_dn"])[-1]
    np.testing.assert_allclose(toa_dn, c.SOLAR_CONSTANT * np.asarray(mu0),
                               rtol=1e-3)
    # energy budget: TOA_dn = TOA_up + sfc_net + atm_absorbed, all >= 0
    fdn = np.asarray(out["flux_dn"])
    fup = np.asarray(out["flux_up"])
    atm_abs = (fdn[-1] - fup[-1]) - (fdn[0] - fup[0])
    assert (atm_abs > 0).all()
    assert (fdn >= -1e-3).all() and (fup >= -1e-3).all()
    assert (np.asarray(out["swdown"]) > 0.3 * c.SOLAR_CONSTANT * np.asarray(mu0)).all()
    # heating positive-ish and bounded in clear sky
    hr_day = np.asarray(out["heating"]) * 86400.0
    assert hr_day.max() < 30.0 and hr_day.min() > -5.0
    # lower sun -> less surface SW
    assert float(out["swdown"][1]) < float(out["swdown"][0])


def test_sw_night_is_zero():
    p, t, dp, qv, lwp, ts = standard_column()
    mu0 = jnp.zeros((2,), jnp.float32)
    alb = jnp.full((2,), 0.2, jnp.float32)
    out = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    assert float(np.abs(np.asarray(out["flux_dn"])).max()) == 0.0
    assert float(np.abs(np.asarray(out["heating"])).max()) == 0.0


def test_sw_cloud_albedo_effect():
    p, t, dp, qv, lwp, ts = standard_column()
    mu0 = jnp.full((2,), 0.8, jnp.float32)
    alb = jnp.full((2,), 0.2, jnp.float32)
    clear = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    p, t, dp, qv, lwp_c, ts = standard_column(lwp_cloud=0.2)
    cloudy = sw_fluxes(p, t, dp, qv, lwp_c, mu0, alb)
    assert float(cloudy["swdown"][0]) < 0.7 * float(clear["swdown"][0])
    assert float(cloudy["swup_toa"][0]) > float(clear["swup_toa"][0])


def test_sw_aerosol_direct_effect():
    """The ARC direct-effect hook: scattering aerosol raises planetary
    albedo and cuts surface SW; absorbing aerosol cuts surface SW without
    the same TOA brightening."""
    p, t, dp, qv, lwp, ts = standard_column()
    nz, ncol = p.shape
    mu0 = jnp.full((ncol,), 0.8, jnp.float32)
    alb = jnp.full((ncol,), 0.2, jnp.float32)
    clear = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    nb = bands.NBND_SW
    tau = jnp.zeros((nb, nz, ncol), jnp.float32).at[:, :8, :].set(0.05)
    # near-conservative scattering with low asymmetry so the TOA brightening
    # is unambiguous (at ssa ~0.95 over a 0.2-albedo surface the TOA effect
    # is legitimately near-neutral — the critical-SSA regime)
    scat = sw_fluxes(p, t, dp, qv, lwp, mu0, alb,
                     tau_aer_sw=tau, ssa_aer_sw=jnp.full_like(tau, 0.999),
                     asy_aer_sw=jnp.full_like(tau, 0.5))
    absb = sw_fluxes(p, t, dp, qv, lwp, mu0, alb,
                     tau_aer_sw=tau, ssa_aer_sw=jnp.full_like(tau, 0.5),
                     asy_aer_sw=jnp.full_like(tau, 0.65))
    assert float(scat["swdown"][0]) < float(clear["swdown"][0])
    assert float(absb["swdown"][0]) < float(scat["swdown"][0])
    assert float(scat["swup_toa"][0]) > float(clear["swup_toa"][0])


def test_radiation_in_simulation():
    """Driver integration: RRTMG on the radt alarm inside a full model run
    (BASELINE config 3 shape, small)."""
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import MPScheme, RAScheme
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = Config(
        domain=DomainConfig(nx=16, ny=4, nz=16, dx=2000.0, dy=2000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG,
                              radt_s=60.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=2.0)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(8)
    swdown = np.asarray(sim.state["swdown"])
    olr = np.asarray(sim.state["olr"])
    hr = np.asarray(sim.state["rthraten_lw"])
    assert np.isfinite(swdown).all() and np.isfinite(olr).all()
    assert (olr > 100.0).all() and (olr < 400.0).all()
    assert np.abs(hr).max() > 0.0


def test_simple_radiation_scheme():
    """RAScheme.SIMPLE cross-check: broadband fluxes in the same physical
    ballpark as the spectral solver."""
    from wrfchem_arc_interactions_tpu.physics.radiation.simple import (
        lw_simple, sw_simple,
    )
    p, t, dp, qv, lwp, ts = standard_column()
    lw_ref = lw_fluxes(p, t, dp, qv, lwp, ts)
    lw_s = lw_simple(p, t, dp, qv, lwp, ts)
    assert 0.5 < float(lw_s["olr"][0]) / float(lw_ref["olr"][0]) < 2.0
    assert 0.5 < float(lw_s["glw"][0]) / float(lw_ref["glw"][0]) < 2.0
    mu0 = jnp.full((2,), 0.7, jnp.float32)
    alb = jnp.full((2,), 0.2, jnp.float32)
    sw_ref = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    sw_s = sw_simple(p, t, dp, qv, lwp, mu0, alb)
    assert 0.6 < float(sw_s["swdown"][0]) / float(sw_ref["swdown"][0]) < 1.6
    # cloudy: simple scheme must also dim the surface
    p, t, dp, qv, lwp_c, ts = standard_column(lwp_cloud=0.2)
    sw_c = sw_simple(p, t, dp, qv, lwp_c, mu0, alb)
    assert float(sw_c["swdown"][0]) < 0.7 * float(sw_s["swdown"][0])


class TestMcICA:
    def test_mask_samples_cloud_fraction(self):
        import jax.numpy as jnp
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        cf = jnp.broadcast_to(jnp.asarray([0.0, 0.3, 0.7, 1.0])[:, None], (4, 8))
        mask = mcica.mcica_mask(cf, 2000, seed=3)
        freq = np.asarray(mask.mean(axis=0))
        np.testing.assert_allclose(freq, np.asarray(cf), atol=0.04)

    def test_max_random_overlap(self):
        """Adjacent cloudy layers overlap maximally; layers separated by
        clear air overlap randomly."""
        import jax.numpy as jnp
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        ngpt = 4000
        # contiguous: both layers cf=0.5 -> total cover ~0.5
        cf_adj = jnp.broadcast_to(jnp.asarray([0.5, 0.5])[:, None], (2, 4))
        m = mcica.mcica_mask(cf_adj, ngpt, seed=1)
        cover = np.asarray((m.max(axis=1)).mean(axis=0))
        np.testing.assert_allclose(cover, 0.5, atol=0.04)
        # separated by a clear layer -> random overlap: 1-(1-.5)^2 = 0.75
        cf_sep = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.5])[:, None], (3, 4))
        m2 = mcica.mcica_mask(cf_sep, ngpt, seed=1)
        cover2 = np.asarray((m2.max(axis=1)).mean(axis=0))
        np.testing.assert_allclose(cover2, 0.75, atol=0.04)

    def test_overcast_limit_matches_no_mcica(self):
        """cldfra == 1 everywhere must reproduce the overcast (no-cldfra)
        fluxes exactly -- the McICA path collapses to deterministic."""
        import jax.numpy as jnp
        from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import sw_fluxes
        from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_lw import lw_fluxes
        nz, ncol = 12, 4
        p = jnp.broadcast_to(jnp.linspace(95000.0, 20000.0, nz)[:, None], (nz, ncol))
        t = jnp.broadcast_to(jnp.linspace(290.0, 220.0, nz)[:, None], (nz, ncol))
        dp = jnp.full((nz, ncol), 75000.0 / nz)
        qv = jnp.full((nz, ncol), 2e-3)
        lwp = jnp.zeros((nz, ncol)).at[4:6].set(0.08)
        mu0 = jnp.full((ncol,), 0.7)
        alb = jnp.full((ncol,), 0.2)
        tsfc = jnp.full((ncol,), 295.0)
        cf1 = jnp.where(lwp > 0, 1.0, 0.0)
        sw_a = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
        sw_b = sw_fluxes(p, t, dp, qv, lwp, mu0, alb, cldfra=cf1, mcica_seed=9)
        np.testing.assert_allclose(np.asarray(sw_a["swdown"]),
                                   np.asarray(sw_b["swdown"]), rtol=1e-5)
        lw_a = lw_fluxes(p, t, dp, qv, lwp, tsfc)
        lw_b = lw_fluxes(p, t, dp, qv, lwp, tsfc, cldfra=cf1, mcica_seed=9)
        np.testing.assert_allclose(np.asarray(lw_a["olr"]),
                                   np.asarray(lw_b["olr"]), rtol=1e-5)

    def test_partial_cloud_between_clear_and_overcast(self):
        """cf=0.5 SW surface flux sits between the clear and overcast runs."""
        import jax.numpy as jnp
        from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import sw_fluxes
        nz, ncol = 12, 8
        p = jnp.broadcast_to(jnp.linspace(95000.0, 20000.0, nz)[:, None], (nz, ncol))
        t = jnp.broadcast_to(jnp.linspace(290.0, 220.0, nz)[:, None], (nz, ncol))
        dp = jnp.full((nz, ncol), 75000.0 / nz)
        qv = jnp.full((nz, ncol), 2e-3)
        lwp_half = jnp.zeros((nz, ncol)).at[4:6].set(0.05)   # grid-mean LWP
        mu0 = jnp.full((ncol,), 0.7)
        alb = jnp.full((ncol,), 0.2)
        clear = sw_fluxes(p, t, dp, qv, jnp.zeros_like(lwp_half), mu0, alb)
        over = sw_fluxes(p, t, dp, qv, lwp_half * 2.0, mu0, alb)  # in-cloud lwp
        cf = jnp.where(lwp_half > 0, 0.5, 0.0)
        part = sw_fluxes(p, t, dp, qv, lwp_half, mu0, alb, cldfra=cf, mcica_seed=4)
        sd_c = float(clear["swdown"][0]); sd_o = float(over["swdown"][0])
        sd_p = float(part["swdown"].mean())
        assert sd_o < sd_p < sd_c

    def test_xu_randall(self):
        import jax.numpy as jnp
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        p = jnp.full((1, 3), 85000.0)
        t = jnp.full((1, 3), 280.0)
        qs = mcica._qsat(p, t)
        qv = jnp.stack([0.3 * qs[0], 0.9 * qs[0], 1.0 * qs[0]], axis=1)
        qc = jnp.asarray([[0.0, 2e-4, 1e-3]])
        cf = np.asarray(mcica.xu_randall_cldfra(p, t, qv, qc))
        assert cf[0, 0] == 0.0
        assert 0.0 < cf[0, 1] < 1.0
        assert cf[0, 2] == 1.0
