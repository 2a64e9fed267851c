"""Chemistry tests: gas mechanism box model, MOSAIC aerosol process
invariants (mass/number bookkeeping), and the chem_driver integration
(SURVEY.md §4.4: box-model style validation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.chem import gas
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.chem.mosaic import coag, nucleation, thermo


def box_concentrations(ncell=3):
    """Polluted-ish box in molec/cm3."""
    m_air = 2.5e19
    ppb = 1e-9 * m_air
    conc = np.full((gas.NS, ncell), 1e3)
    setv = lambda s, v: conc.__setitem__(gas.IDX[s], v)
    setv("o3", 30 * ppb)
    setv("no", 5 * ppb)
    setv("no2", 10 * ppb)
    setv("co", 200 * ppb)
    setv("so2", 5 * ppb)
    setv("nh3", 2 * ppb)
    setv("hcho", 3 * ppb)
    setv("par", 20 * ppb)
    setv("olet", 2 * ppb)
    setv("isop", 1 * ppb)
    setv("h2o2", 1 * ppb)
    return jnp.asarray(conc, jnp.float32), m_air, ppb


def test_gas_daytime_photochemistry():
    conc, m_air, ppb = box_concentrations()
    t_air = jnp.full((3,), 298.0)
    k = gas.rate_constants(t_air, m_air, jnp.ones(3))
    out = conc
    for _ in range(6):                      # 6 x 10 min
        out = gas.integrate(out, k, 600.0, n_sub=5)
    out = np.asarray(out)
    assert np.isfinite(out).all() and (out >= 0).all()
    # photochemical O3 production from the NOx/VOC mix
    assert out[gas.IDX["o3"], 0] > float(conc[gas.IDX["o3"], 0])
    # OH present at daytime
    assert out[gas.IDX["oh"], 0] > 1e4
    # SO2 oxidised to H2SO4
    assert out[gas.IDX["h2so4"], 0] > 1e7
    # NOx partially converted to HNO3
    assert out[gas.IDX["hno3"], 0] > 0.1 * float(ppb)


def test_gas_night_no_photolysis():
    conc, m_air, ppb = box_concentrations()
    t_air = jnp.full((3,), 288.0)
    k = gas.rate_constants(t_air, m_air, jnp.zeros(3))  # j_scale = 0
    out = gas.integrate(conc, k, 1800.0, n_sub=5)
    out = np.asarray(out)
    # NO + O3 titration proceeds, but no new O3
    assert out[gas.IDX["o3"], 0] < float(conc[gas.IDX["o3"], 0])
    assert out[gas.IDX["oh"], 0] < 1e5


def _aer_fields(nbin=4, shp=(2, 2, 2)):
    f = {}
    for b in range(1, nbin + 1):
        for s in mbins.AER_SPECIES:
            f[f"chem_{s}_a{b:02d}"] = jnp.full(shp, 0.5 if b < 3 else 0.05)
        f[f"chem_water_a{b:02d}"] = jnp.full(shp, 0.2)
        f[f"chem_num_a{b:02d}"] = jnp.full(shp, [5e9, 1e9, 2e7, 1e5][b - 1]
                                           if nbin == 4 else 1e8)
    for g_ in ("h2so4", "hno3", "nh3", "hcl"):
        f[f"chem_{g_}"] = jnp.full(shp, 1e-4)   # 0.1 ppb
    return f


def test_thermo_h2so4_condenses_and_conserves():
    shp = (2, 2, 2)
    chem = _aer_fields(4, shp)
    rho = jnp.full(shp, 1.1)
    t = jnp.full(shp, 290.0)
    rh = jnp.full(shp, 0.6)
    out = thermo.partition(chem, t, rho, rh, 4, 300.0)
    assert float(out["chem_h2so4"][0, 0, 0]) < float(chem["chem_h2so4"][0, 0, 0])
    so4_before = sum(float(chem[f"chem_so4_a{b:02d}"][0, 0, 0]) for b in range(1, 5))
    so4_after = sum(float(out[f"chem_so4_a{b:02d}"][0, 0, 0]) for b in range(1, 5))
    dso4 = so4_after - so4_before
    dgas_ug = thermo.ppmv_to_ugkg(
        float(chem["chem_h2so4"][0, 0, 0]) - float(out["chem_h2so4"][0, 0, 0]),
        mbins.MW["so4"])
    np.testing.assert_allclose(dso4, dgas_ug, rtol=1e-4)
    # water increases with RH
    hi = thermo.water_uptake(out, jnp.full(shp, 0.9), 4)
    lo = thermo.water_uptake(out, jnp.full(shp, 0.3), 4)
    assert float(hi["chem_water_a01"][0, 0, 0]) > float(lo["chem_water_a01"][0, 0, 0])


def test_nucleation_makes_particles():
    shp = (2, 2, 2)
    chem = _aer_fields(4, shp)
    chem["chem_h2so4"] = jnp.full(shp, 5e-5)   # high acid
    rho = jnp.full(shp, 1.1)
    out = nucleation.nucleate(chem, rho, jnp.full(shp, 0.7), 4, 60.0)
    assert float(out["chem_num_a01"][0, 0, 0]) > float(chem["chem_num_a01"][0, 0, 0])
    assert float(out["chem_h2so4"][0, 0, 0]) <= float(chem["chem_h2so4"][0, 0, 0])


def test_coagulation_conserves_mass_reduces_number():
    shp = (1, 1, 1)
    chem = _aer_fields(4, shp)
    chem["chem_num_a01"] = jnp.full(shp, 1e12)   # very high number: fast coag
    rho = jnp.full(shp, 1.2)
    out = coag.coagulate(chem, rho, 4, 600.0)
    n_before = sum(float(chem[f"chem_num_a{b:02d}"].sum()) for b in range(1, 5))
    n_after = sum(float(out[f"chem_num_a{b:02d}"].sum()) for b in range(1, 5))
    assert n_after < n_before
    for s in ("so4", "bc", "oc"):
        m_before = sum(float(chem[f"chem_{s}_a{b:02d}"].sum()) for b in range(1, 5))
        m_after = sum(float(out[f"chem_{s}_a{b:02d}"].sum()) for b in range(1, 5))
        np.testing.assert_allclose(m_after, m_before, rtol=1e-5)


@pytest.mark.slow
def test_chem_in_simulation():
    """Full ARC integration: MOSAIC aerosol + CBMZ gas + optics + RRTMG
    direct effect inside a running simulation (BASELINE config 4 shape)."""
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = Config(
        domain=DomainConfig(nx=12, ny=4, nz=12, dx=2000.0, dy=2000.0,
                            ztop=14000.0, p_top=14000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG, radt_s=120.0),
        chem=ChemConfig(chem_opt=ChemOpt.CBMZ_MOSAIC_4BIN, chemdt_s=60.0,
                        aer_ra_feedback=True, cldchem_onoff=True,
                        wetscav_onoff=True),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=2.0)
    # seed aerosol + precursors
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 1.0)
        state[f"chem_oc_a{b:02d}"] = jnp.full_like(state["t"], 1.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 1e9)
    state["chem_so2"] = jnp.full_like(state["t"], 5e-3)
    state["chem_no2"] = jnp.full_like(state["t"], 1e-2)
    state["chem_o3"] = jnp.full_like(state["t"], 3e-2)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(12)   # 2 min, two chem calls, one rad call
    out = sim.state
    tau = np.asarray(out["tau_aer_sw"])
    assert np.isfinite(tau).all() and tau.max() > 0.0
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # aerosol stayed non-negative through advection + chem
    assert float(out["chem_so4_a01"].min()) >= 0.0


# ---------------------------------------------------------------------------
# movesect (moving-center bin remap) + MESA phase state — round 2
# ---------------------------------------------------------------------------

def _bins_state(nbin=4, shp=(2, 2, 3)):
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
    chem = {}
    for b in range(1, nbin + 1):
        for s in list(mbins.AER_SPECIES) + ["water"]:
            chem[f"chem_{s}_a{b:02d}"] = jnp.zeros(shp)
        chem[f"chem_num_a{b:02d}"] = jnp.zeros(shp)
    return chem


def test_movesect_conserves_and_moves_grown_particles():
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
    from wrfchem_arc_interactions_tpu.chem.mosaic import movesect

    nbin = 4
    grid = mbins.make_bins(nbin)
    chem = _bins_state(nbin)
    # bin 1 particles grown by condensation far beyond the bin-1 range:
    # mean volume equals the bin-2 center -> the whole section must move
    num = 1e9
    v_target = np.pi / 6.0 * grid.d_center[1] ** 3          # bin-2 center
    mass_ug = v_target * num * mbins.DENSITY["so4"] * 1e9
    chem["chem_so4_a01"] = jnp.full((2, 2, 3), mass_ug)
    chem["chem_num_a01"] = jnp.full((2, 2, 3), num)
    # bin 3 stays put (mean volume at its own center)
    v3 = np.pi / 6.0 * grid.d_center[2] ** 3
    chem["chem_oc_a03"] = jnp.full((2, 2, 3), v3 * num * mbins.DENSITY["oc"] * 1e9)
    chem["chem_num_a03"] = jnp.full((2, 2, 3), num)

    out = movesect.remap(chem, nbin)
    # conservation of total mass and number
    for s in ("so4", "oc", "num"):
        tot_in = sum(np.asarray(chem[f"chem_{s}_a{b:02d}"]).sum()
                     for b in range(1, nbin + 1))
        tot_out = sum(np.asarray(out[f"chem_{s}_a{b:02d}"]).sum()
                      for b in range(1, nbin + 1))
        np.testing.assert_allclose(tot_out, tot_in, rtol=1e-6, err_msg=s)
    # the grown section moved 1 -> 2
    assert float(out["chem_so4_a01"].max()) == 0.0
    assert float(out["chem_so4_a02"].min()) > 0.0
    assert float(out["chem_num_a02"].min()) >= num * 0.999
    # the stationary section stayed
    assert float(out["chem_oc_a03"].min()) > 0.0
    assert float(out["chem_oc_a04"].max()) == 0.0


def test_mesa_phase_state_gates_water():
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem.mosaic import thermo

    nbin = 4
    chem = _bins_state(nbin, shp=(3,))
    chem["chem_so4_a01"] = jnp.full((3,), 5.0)   # ammonium-sulfate-like bin
    chem["chem_nh4_a01"] = jnp.full((3,), 1.9)
    rh = jnp.asarray([0.30, 0.70, 0.95])
    out = thermo.water_uptake(chem, rh, nbin)
    w = np.asarray(out["chem_water_a01"])
    assert w[0] == 0.0, "solid below the mutual DRH must carry no water"
    assert w[2] > 0.0, "deliquesced bin must take up water"
    assert w[2] > w[1], "water grows with RH"


def test_mesa_hysteresis_branch():
    """Deliquescence/efflorescence hysteresis: between CRH and DRH the phase
    follows its history (carried by the prognostic aerosol water)."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem.mosaic import thermo

    nbin = 4
    chem = _bins_state(nbin, shp=(1,))
    chem["chem_so4_a01"] = jnp.full((1,), 5.0)
    chem["chem_nh4_a01"] = jnp.full((1,), 1.9)

    rh_mid = jnp.asarray([0.60])        # between CRH (~0.36) and DRH (0.80)

    # ascending branch: never deliquesced -> solid at mid RH
    w_up = np.asarray(thermo.water_uptake(chem, rh_mid, nbin)["chem_water_a01"])
    assert w_up[0] == 0.0, "ascending branch must stay solid below DRH"

    # deliquesce at high RH, then descend to mid RH carrying its water:
    # metastable upper branch -> stays liquid
    chem_wet = dict(chem)
    chem_wet.update(thermo.water_uptake(chem, jnp.asarray([0.95]), nbin))
    w_down = np.asarray(
        thermo.water_uptake(chem_wet, rh_mid, nbin)["chem_water_a01"])
    assert w_down[0] > 0.0, "descending branch must stay liquid above CRH"

    # below CRH the particle effloresces regardless of history
    w_dry = np.asarray(
        thermo.water_uptake(chem_wet, jnp.asarray([0.25]), nbin)["chem_water_a01"])
    assert w_dry[0] == 0.0, "below CRH the bin must crystallize"


def test_resistance_deposition_velocities():
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import aux
    from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins

    ust = jnp.asarray([[0.3, 0.6]])
    z1 = jnp.asarray([[25.0, 25.0]])
    diams = mbins.make_bins(4).d_center
    vd_gas, vd_aer = aux.deposition_velocities(ust, z1, diams)
    # HNO3 (rc ~ 1 s/m) deposits much faster than CO (rc ~ 1e5)
    assert float(vd_gas["hno3"][0, 0]) > 20 * float(vd_gas["co"][0, 0])
    # stronger turbulence -> faster deposition
    assert float(vd_gas["o3"][0, 1]) > float(vd_gas["o3"][0, 0])
    # aerosol: coarse bin (gravitational settling) deposits faster than
    # accumulation mode (the Slinn minimum)
    assert float(vd_aer[3][0, 0]) > float(vd_aer[1][0, 0])
    for v in vd_aer:
        assert np.isfinite(np.asarray(v)).all() and (np.asarray(v) > 0).all()


def test_plume_rise_injects_aloft():
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import aux

    nz = 20
    z_w = jnp.broadcast_to(jnp.arange(nz + 1).reshape(-1, 1, 1) * 250.0,
                           (nz + 1, 1, 2)).astype(jnp.float32)
    heat = jnp.asarray([[500.0, 0.01]])     # big fire vs negligible source
    u = jnp.asarray([[2.0, 2.0]])
    w = aux.plume_rise_profile(heat, u, z_w)
    w_np = np.asarray(w)
    np.testing.assert_allclose(w_np.sum(axis=0), 1.0, rtol=1e-5)
    # the 50 MW fire injects above the lowest layers
    assert w_np[0, 0, 0] == 0.0
    assert w_np[:, 0, 0].argmax() > 1
    # the negligible source stays at the surface
    assert w_np[0, 0, 1] > 0.99
