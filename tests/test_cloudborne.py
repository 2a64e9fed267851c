"""Cloud-borne aerosol phase (_cw tracers) — the activation/resuspension,
aqueous-production and in-cloud-removal bookkeeping of the ARC indirect
effect (canonical: phys/module_mixactivate.F cloud-borne handling +
chem/module_mosaic_cloudchem.F + module_mosaic_wetscav.F; VERDICT r2 ask #4).

Load-bearing invariants:
- per-(bin, species) interstitial + cloud-borne totals conserved to
  machine precision through activation/resuspension;
- sulfur (SO2 + interstitial SO4 + cloud-borne SO4) closes across a full
  cloud cycle (activate -> aqueous oxidation -> evaporate/resuspend);
- wet removal drains only the cloud-borne phase at the cloud->rain
  conversion rate;
- the whole pipeline is cell-local, hence decomposition-invariant.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem import aux
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.chem.mosaic.thermo import ugkg_to_ppmv

NBIN = 4
SHAPE = (4, 2, 2)


def _state(**over):
    base = {"chem_so2": 2e-3, "chem_h2o2": 2e-3, "chem_o3": 0.05}
    for b in range(1, NBIN + 1):
        for s in mbins.AER_SPECIES:
            base[f"chem_{s}_a{b:02d}"] = 0.0
            base[f"chem_{s}_cw{b:02d}"] = 0.0
        base[f"chem_num_a{b:02d}"] = 0.0
        base[f"chem_num_cw{b:02d}"] = 0.0
    # accumulation-mode aerosol in bins 1-2
    base["chem_so4_a01"] = 2.0
    base["chem_so4_a02"] = 1.0
    base["chem_nh4_a01"] = 0.5
    base["chem_oc_a02"] = 1.0
    base["chem_num_a01"] = 2e9
    base["chem_num_a02"] = 5e8
    base.update(over)
    return {k: jnp.full(SHAPE, v, jnp.float32) for k, v in base.items()}


def _met(cloudy=True):
    qc = jnp.full(SHAPE, 5e-4 if cloudy else 0.0)
    t = jnp.full(SHAPE, 280.0)
    p = jnp.full(SHAPE, 8e4)
    rho = jnp.full(SHAPE, 1.0)
    w = jnp.full(SHAPE, 1.0)
    return qc, t, p, rho, w


def test_activation_moves_mass_and_conserves():
    chem = _state()
    qc, t, p, rho, w = _met(cloudy=True)
    out = aux.cw_exchange(chem, qc, t, p, rho, w, NBIN)
    moved = sum(float(out[f"chem_num_cw{b:02d}"].sum())
                for b in range(1, NBIN + 1))
    assert moved > 0.0, "updraft + aerosol + cloud must activate something"
    for b in range(1, NBIN + 1):
        for s in tuple(mbins.AER_SPECIES) + ("num",):
            tot0 = np.asarray(chem[f"chem_{s}_a{b:02d}"]
                              + chem[f"chem_{s}_cw{b:02d}"])
            tot1 = np.asarray(out[f"chem_{s}_a{b:02d}"]
                              + out[f"chem_{s}_cw{b:02d}"])
            np.testing.assert_array_equal(tot0, tot1)
    # mass moved along with number for the populated bins
    assert float(out["chem_so4_cw01"].min()) > 0.0


def test_activation_is_a_ratchet_in_cloud():
    """A second exchange with a weaker updraft must not deactivate."""
    chem = _state()
    qc, t, p, rho, w = _met(cloudy=True)
    once = aux.cw_exchange(chem, qc, t, p, rho, w, NBIN)
    again = aux.cw_exchange(once, qc, t, p, rho, 0.0 * w + 0.05, NBIN)
    for b in range(1, NBIN + 1):
        assert np.all(np.asarray(again[f"chem_num_cw{b:02d}"])
                      >= np.asarray(once[f"chem_num_cw{b:02d}"]) - 1e-6)


def test_evaporation_resuspends_everything():
    chem = _state()
    qc, t, p, rho, w = _met(cloudy=True)
    act = aux.cw_exchange(chem, qc, t, p, rho, w, NBIN)
    clear = aux.cw_exchange(act, jnp.zeros(SHAPE), t, p, rho, w, NBIN)
    for b in range(1, NBIN + 1):
        for s in tuple(mbins.AER_SPECIES) + ("num",):
            assert float(clear[f"chem_{s}_cw{b:02d}"].max()) == 0.0
            np.testing.assert_allclose(
                np.asarray(clear[f"chem_{s}_a{b:02d}"]),
                np.asarray(chem[f"chem_{s}_a{b:02d}"]), rtol=1e-6)


def test_sulfur_closes_over_cloud_cycle():
    """activate -> aqueous S(IV)->S(VI) into _cw -> evaporate/resuspend:
    total S (gas SO2 + interstitial SO4 + cloud-borne SO4, in ppmv-S)
    conserved; the oxidised sulfur ends up in the INTERSTITIAL bins after
    the cloud evaporates (the aqueous-processing growth signature)."""
    chem = _state()
    qc, t, p, rho, w = _met(cloudy=True)

    def s_total(c):
        s = np.asarray(c["chem_so2"], np.float64).copy()
        for b in range(1, NBIN + 1):
            for ph in ("a", "cw"):
                so4 = np.asarray(c[f"chem_so4_{ph}{b:02d}"], np.float64)
                s += np.asarray(ugkg_to_ppmv(jnp.asarray(so4),
                                             mbins.MW["so4"]))
        return float(s.sum())

    s0 = s_total(chem)
    act = aux.cw_exchange(chem, qc, t, p, rho, w, NBIN)
    oxi = aux.cloud_chemistry(act, qc, t, NBIN, dt=600.0)
    d_so2 = float((act["chem_so2"] - oxi["chem_so2"]).sum())
    assert d_so2 > 1e-5, "no aqueous oxidation happened"
    # production went to the cloud-borne phase, not the interstitial
    d_cw = sum(float((oxi[f"chem_so4_cw{b:02d}"]
                      - act[f"chem_so4_cw{b:02d}"]).sum())
               for b in range(1, NBIN + 1))
    d_int = sum(float((oxi[f"chem_so4_a{b:02d}"]
                       - act[f"chem_so4_a{b:02d}"]).sum())
                for b in range(1, NBIN + 1))
    assert d_cw > 0.0 and abs(d_int) < 1e-10
    np.testing.assert_allclose(s_total(oxi), s0, rtol=1e-4)

    clear = aux.cw_exchange(oxi, jnp.zeros(SHAPE), t, p, rho, w, NBIN)
    np.testing.assert_allclose(s_total(clear), s0, rtol=1e-4)
    for b in range(1, NBIN + 1):
        assert float(clear[f"chem_so4_cw{b:02d}"].max()) == 0.0
    grown = sum(float(clear[f"chem_so4_a{b:02d}"].sum())
                for b in range(1, NBIN + 1))
    orig = sum(float(chem[f"chem_so4_a{b:02d}"].sum())
               for b in range(1, NBIN + 1))
    assert grown > orig, "aqueous sulfate must grow the resuspended aerosol"


def test_wet_removal_drains_cw_only_when_raining():
    chem = _state()
    qc, t, p, rho, w = _met(cloudy=True)
    act = aux.cw_exchange(chem, qc, t, p, rho, w, NBIN)

    no_rain = aux.wet_scavenging(act, jnp.zeros(SHAPE), 60.0, (), nbin=NBIN)
    for b in range(1, NBIN + 1):
        np.testing.assert_array_equal(
            np.asarray(no_rain[f"chem_so4_cw{b:02d}"]),
            np.asarray(act[f"chem_so4_cw{b:02d}"]))

    rain = aux.wet_scavenging(act, jnp.full(SHAPE, 1e-3), 60.0, (),
                              nbin=NBIN)
    cw0 = sum(float(act[f"chem_so4_cw{b:02d}"].sum())
              for b in range(1, NBIN + 1))
    cw1 = sum(float(rain[f"chem_so4_cw{b:02d}"].sum())
              for b in range(1, NBIN + 1))
    assert cw1 < cw0 * 0.95, "rain must drain the cloud-borne phase"


@pytest.mark.slow
def test_cw_in_full_simulation():
    """Driver-level smoke: moist convection with cldchem_onoff grows a
    cloud-borne phase where the cloud is, everything stays finite, and a
    paired run with cldchem off has no _cw fields at all."""
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation
    from wrfchem_arc_interactions_tpu.registry.state import build_state

    cfg = Config(
        domain=DomainConfig(nx=12, ny=4, nz=12, dx=2000.0, dy=2000.0,
                            ztop=14000.0, p_top=14000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True),
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=30.0,
                        gaschem_onoff=False, cldchem_onoff=True,
                        wetscav_onoff=True),
    )
    assert any(k.startswith("chem_num_cw") for k in build_state(cfg))

    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(60)   # 10 min: convection forms cloud, chem runs 20x
    out = sim.state
    qc = np.asarray(out["qc"])
    cw = sum(np.asarray(out[f"chem_num_cw{b:02d}"]) for b in (1, 2, 3, 4))
    assert qc.max() > 1e-5, "no cloud formed — test setup broken"
    assert cw.max() > 0.0, "no cloud-borne aerosol in a cloudy run"
    # cloud-borne lives only where cloud is (or where it just was, pending
    # the next chem call) — nowhere without any cloud history
    assert cw[qc <= 0].max() <= cw.max()
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k

    cfg_off = Config(
        domain=cfg.domain, time_control=cfg.time_control,
        physics=cfg.physics,
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=30.0,
                        gaschem_onoff=False, cldchem_onoff=False))
    assert not any(k.startswith("chem_num_cw") for k in build_state(cfg_off))


@pytest.mark.slow
def test_cw_decomposition_invariance():
    """The cloud-borne phase claims cell-locality => decomposition
    invariance; prove it with the full driver (Morrison progn + cldchem +
    wetscav) on a 2x4 mesh vs one device."""
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation
    from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh

    cfg = Config(
        domain=DomainConfig(nx=16, ny=8, nz=12, dx=2000.0, dy=2000.0,
                            ztop=14000.0, p_top=14000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True),
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=20.0,
                        gaschem_onoff=False, cldchem_onoff=True,
                        wetscav_onoff=True),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
    # note: so2/h2o2 are not in the aerosol-only package's registry, so the
    # aqueous-production path is off here; the sharded property under test
    # is the activation/resuspension/wet-removal bookkeeping

    sim1 = Simulation(cfg, grid, dict(state))
    sim1.advance(45)                      # 7.5 min: cloud forms, cw activates
    sim8 = Simulation(cfg, grid, dict(state), mesh=make_mesh(2, 4))
    sim8.advance(45)

    cw1 = sum(jnp.asarray(sim1.state[f"chem_so4_cw{b:02d}"])
              for b in (1, 2, 3, 4))
    assert float(jnp.max(cw1)) > 0.0, "no cloud-borne phase formed"
    for name in (["qc", "nc", "t"]
                 + [f"chem_so4_cw{b:02d}" for b in (1, 2)]
                 + [f"chem_num_cw{b:02d}" for b in (1, 2)]
                 + [f"chem_so4_a{b:02d}" for b in (1, 2)]):
        a = jnp.asarray(sim1.state[name])
        b_ = jnp.asarray(sim8.state[name])
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        d = float(jnp.max(jnp.abs(a - b_))) / scale
        assert d < 5e-3, f"{name}: rel diff {d}"
