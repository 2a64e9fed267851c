"""Morrison 2-moment + AR&G activation tests — the ARC indirect-effect
chain (SURVEY.md §2.2 mixactivate; the paired feedbacks-on/off comparison
mirrors the reference repo's scenario methodology)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.physics.mixactivate import activate


def _chem(nbin=4, shp=(3,), so4=2.0, num=2e9):
    from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
    f = {}
    for b in range(1, nbin + 1):
        scale = [1.0, 0.5, 0.05, 0.005][b - 1]
        for s in mbins.AER_SPECIES:
            f[f"chem_{s}_a{b:02d}"] = jnp.full(shp, 0.05 * scale)
        f[f"chem_so4_a{b:02d}"] = jnp.full(shp, so4 * scale)
        f[f"chem_water_a{b:02d}"] = jnp.full(shp, 0.1 * scale)
        f[f"chem_num_a{b:02d}"] = jnp.full(shp, num * scale)
    return f


def test_activation_basic():
    t = jnp.full((3,), 283.0)
    p = jnp.full((3,), 9.0e4)
    rho = jnp.full((3,), 1.1)
    w = jnp.asarray([0.5, 2.0, 5.0])
    n_act, smax = activate(_chem(), t, p, rho, w, 4)
    n_act = np.asarray(n_act)
    smax = np.asarray(smax)
    assert (n_act > 1e6).all()               # some activation
    assert (smax > 1e-5).all() and (smax < 0.1).all()
    # stronger updraft -> higher smax -> more activated
    assert smax[2] > smax[0]
    assert n_act[2] >= n_act[0]


def test_activation_more_aerosol_more_droplets():
    t = jnp.full((2,), 283.0)
    p = jnp.full((2,), 9.0e4)
    rho = jnp.full((2,), 1.1)
    w = jnp.full((2,), 1.0)
    lo, _ = activate(_chem(shp=(2,), num=5e8), t, p, rho, w, 4)
    hi, _ = activate(_chem(shp=(2,), num=5e9), t, p, rho, w, 4)
    assert float(hi[0]) > float(lo[0])


def _run_squall(progn, chem_on, steps=60):
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt, MPScheme
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = Config(
        domain=DomainConfig(nx=40, ny=4, nz=20, dx=1000.0, dy=1000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=5.0),
        dynamics=DynamicsConfig(kvdif=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=progn),
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN if chem_on else ChemOpt.NONE,
                        chemdt_s=30.0, aerchem_onoff=False,
                        gaschem_onoff=False),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    if chem_on:
        for b in (1, 2):
            state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 3.0)
            state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 5e9)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(steps)
    return sim.state


@pytest.mark.slow
def test_morrison_squall_runs_and_makes_cloud():
    out = _run_squall(progn=False, chem_on=False)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(out["qc"].max()) > 1e-5
    assert float(out["nc"].max()) > 1e5
    for q in ("qv", "qc", "qr", "qi", "qs", "qg"):
        assert float(out[q].min()) >= 0.0


@pytest.mark.slow
def test_indirect_effect_progn_changes_nc():
    """Paired runs (the ARC-Interactions methodology): prognostic aerosol
    activation vs default Nc produce different droplet fields."""
    base = _run_squall(progn=False, chem_on=False, steps=60)
    arc = _run_squall(progn=True, chem_on=True, steps=60)
    nc_b = float(base["nc"].max())
    nc_a = float(arc["nc"].max())
    assert nc_a > 0 and nc_b > 0
    assert abs(nc_a - nc_b) / max(nc_a, nc_b) > 0.05


def test_hallett_mossop_and_bigg_freezing():
    """New cold processes: rime splintering multiplies ice number in the
    -8..-3C window; supercooled rain freezes to graupel when cold."""
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import MPScheme
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
    from wrfchem_arc_interactions_tpu.physics.microphysics import morrison as mo

    cfg = Config(
        domain=DomainConfig(nx=4, ny=2, nz=20, dx=1000.0, dy=1000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2),
    )

    def run_col(t_target_c, qr0=0.0, qc0=2e-3, qs0=5e-3):
        grid, state = ideal.make_case(cfg, "quiescent")
        diag = diagnose(state, grid, cfg.moist_species())
        pii = np.asarray((diag.p_full / 1e5) ** 0.2857)
        th = np.asarray(state["t"]) + 300.0
        t_abs = th * pii
        # pick the level whose temperature is closest to the target, then
        # nudge theta so the level sits exactly at the target
        k = int(np.argmin(np.abs(t_abs[:, 0, 0] - (273.15 + t_target_c))))
        dth = (273.15 + t_target_c - t_abs[k]) / pii[k]
        state["t"] = state["t"].at[k].add(jnp.asarray(dth, jnp.float32))
        z = jnp.zeros_like(state["t"])
        # saturate the level so cloud water survives the adjustment step
        from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import _qvs
        qvs_k = _qvs(diag.p_full[k], jnp.asarray(273.15 + t_target_c))
        state["qv"] = state["qv"].at[k].set(qvs_k)
        state["qc"] = z.at[k].set(qc0)
        state["qs"] = z.at[k].set(qs0)
        state["ns"] = z.at[k].set(1e4)
        state["qr"] = z.at[k].set(qr0)
        state["nr"] = z.at[k].set(1e5 if qr0 > 0 else 0.0)
        state["nc"] = jnp.full_like(state["t"], 1e8)
        diag = diagnose(state, grid, cfg.moist_species())
        out = mo.morrison(state, diag, grid, cfg, 10.0)
        return {kk: float(np.asarray(v)[k].max()) for kk, v in out.items()
                if kk in ("qi", "ni", "qg", "qr")}

    # Hallett-Mossop: riming at -5C (inside the window, Cooper inactive)
    # produces secondary ice; at -2C (outside the window) it must not
    r_hm = run_col(-5.0)
    r_edge = run_col(-2.0)
    assert r_hm["ni"] > 50.0, r_hm
    assert r_edge["ni"] < 1e-3, r_edge

    # Bigg: supercooled rain at -20C freezes to graupel; at -5C barely
    f_cold = run_col(-20.0, qr0=1e-3)
    f_warm = run_col(-5.0, qr0=1e-3)
    assert f_cold["qg"] > 1e-4, f_cold
    assert f_cold["qg"] > 10.0 * max(f_warm["qg"], 1e-12), (f_cold, f_warm)


@pytest.mark.slow
def test_supersat_parcel_smax_depends_on_nc():
    """Parcel test of the predicted-supersaturation path (VERDICT r2 ask
    #8): an adiabatically cooling parcel develops a peak supersaturation
    that DECREASES with droplet number (faster phase relaxation), the
    AR&G expectation; with plentiful droplets the result converges to the
    saturation-adjustment limit."""
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.physics.microphysics.morrison import (
        _supersat_condense,
    )
    from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import (
        _qvs, saturation_adjust,
    )
    from wrfchem_arc_interactions_tpu.utils import constants as c

    p = jnp.full((1,), 8.5e4)
    pii = (p / c.P0) ** c.RCP
    w_up, dt = 2.0, 1.0
    cool = c.G / c.CP * w_up * dt / pii       # adiabatic d(theta)/step

    def run(nc0):
        theta = jnp.full((1,), 285.0) / pii
        qv = _qvs(p, theta * pii)             # start exactly saturated
        qc = jnp.full((1,), 1e-5)
        nc = jnp.full((1,), nc0)
        s_peak = 0.0
        for _ in range(60):                   # 2-minute, 120-m ascent
            theta = theta - cool
            theta, qv, qc, smax = _supersat_condense(
                theta, qv, qc, nc, p, pii, jnp.full((1,), 1.05), dt)
            s_peak = max(s_peak, float(smax[0]))
        return s_peak, float(qc[0]), theta, qv

    s_lo, qc_lo, _, _ = run(30e6)             # maritime-clean
    s_hi, qc_hi, th_hi, qv_hi = run(1000e6)   # polluted
    assert s_lo > 1.5 * s_hi, (s_lo, s_hi)
    assert s_hi < 0.01, f"polluted parcel S_max {s_hi} should stay <1%"
    assert s_lo > 1e-4
    # polluted limit ~ saturation adjustment: residual vapor excess tiny
    excess = float((qv_hi - _qvs(p, th_hi * pii))[0])
    assert abs(excess) < 5e-5
    # both condensed comparable total water (first indirect effect is about
    # partitioning/number, not total condensate)
    assert abs(qc_lo - qc_hi) / qc_hi < 0.25


def test_rime_density_and_wet_growth():
    """Variable bulk rime density (canonical rime-density/wet-growth of
    module_mp_morr_two_moment.F; VERDICT r3 item 10): cold light riming
    deposits low-density rime, warm heavy riming soaks toward solid ice;
    the denser graupel FALLS FASTER at equal mass/number."""
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import MPScheme
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
    from wrfchem_arc_interactions_tpu.physics.microphysics import morrison as mo

    cfg = Config(
        domain=DomainConfig(nx=4, ny=2, nz=20, dx=1000.0, dy=1000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2),
    )

    def rime_run(t_target_c, qc0):
        grid, state = ideal.make_case(cfg, "quiescent")
        assert "qgv" in state, "Morrison registry must carry rime volume"
        diag = diagnose(state, grid, cfg.moist_species())
        pii = np.asarray((diag.p_full / 1e5) ** 0.2857)
        th = np.asarray(state["t"]) + 300.0
        t_abs = th * pii
        k = int(np.argmin(np.abs(t_abs[:, 0, 0] - (273.15 + t_target_c))))
        dth = (273.15 + t_target_c - t_abs[k]) / pii[k]
        state["t"] = state["t"].at[k].add(jnp.asarray(dth, jnp.float32))
        # saturate the level so the seeded cloud water survives the
        # condensation step, then heavy snow drives riming -> graupel
        t_k = t_abs[k, 0, 0]
        es = 611.2 * np.exp(17.67 * (t_k - 273.15) / (t_k - 29.65))
        qvs = 0.622 * es / np.asarray(diag.p_full)[k, 0, 0]
        state["qv"] = state["qv"].at[k].set(float(qvs))
        state["qs"] = state["qs"].at[k].set(5e-3)
        state["ns"] = state["ns"].at[k].set(2e5)
        state["qc"] = state["qc"].at[k].set(qc0)
        state["nc"] = state["nc"].at[k].set(1e8)
        diag = diagnose(state, grid, cfg.moist_species())
        out = mo.morrison(state, diag, grid, cfg, 10.0)
        qg = np.asarray(out["qg"]).sum()
        qgv = np.asarray(out["qgv"]).sum()
        rho_g = qg / max(qgv, 1e-20)
        return qg, rho_g

    qg_cold, rho_cold = rime_run(-10.0, 3e-3)     # cold, dry rime growth
    qg_wet, rho_wet = rime_run(-1.5, 6e-3)        # near 0C, heavy -> wet
    assert qg_cold > 1e-6 and qg_wet > 1e-6, (qg_cold, qg_wet)
    # dry rime deposits porous low-density ice; wet growth soaks to ~900
    assert rho_wet > rho_cold + 300.0, (rho_cold, rho_wet)
    assert 100.0 <= rho_cold <= 650.0
    assert rho_wet <= 900.0 + 1e-3

    # density -> fall speed: equal (qg, ng), denser graupel falls faster
    q = jnp.full((4, 2, 2), 2e-3)
    n = jnp.full((4, 2, 2), 1e4)
    rho_air = jnp.full((4, 2, 2), 1.0)
    v_light, _ = mo._fallspeeds(q, n, "g", rho_air,
                                rho_x=jnp.full((4, 2, 2), 200.0))
    v_dense, _ = mo._fallspeeds(q, n, "g", rho_air,
                                rho_x=jnp.full((4, 2, 2), 800.0))
    assert float(v_dense.mean()) > 1.3 * float(v_light.mean())
