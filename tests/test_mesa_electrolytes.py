"""MESA electrolyte-ladder tests (canonical: module_mosaic_therm.F
electrolyte speciation + MDRH tables; VERDICT r3 item 10)."""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem.mosaic import thermo
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins

# electrolyte -> ion stoichiometry, for the conservation check
STOICH = {
    "caso4": {"ca": 1, "so4": 1}, "caco3": {"ca": 1, "co3": 1},
    "na2so4": {"na": 2, "so4": 1}, "nh42so4": {"nh4": 2, "so4": 1},
    "nh4hso4": {"nh4": 1, "so4": 1}, "h2so4": {"so4": 1},
    "cano32": {"ca": 1, "no3": 2}, "nano3": {"na": 1, "no3": 1},
    "nacl": {"na": 1, "cl": 1}, "nh4no3": {"nh4": 1, "no3": 1},
    "nh4cl": {"nh4": 1, "cl": 1},
    "_residual_na": {"na": 1}, "_residual_co3": {"co3": 1},
    "_residual_nh4": {"nh4": 1}, "_residual_no3": {"no3": 1},
    "_residual_cl": {"cl": 1}, "_residual_ca": {"ca": 1},
}


def _random_ions(rng, n=64):
    return {k: jnp.asarray(rng.uniform(0.0, 2.0, n))
            for k in ("so4", "no3", "nh4", "na", "cl", "ca", "co3")}


def test_ladder_conserves_every_ion():
    rng = np.random.default_rng(3)
    ions = _random_ions(rng)
    e = thermo.electrolyte_ladder(ions)
    for ion in ions:
        back = sum(st[ion] * np.asarray(e[name])
                   for name, st in STOICH.items() if ion in st)
        np.testing.assert_allclose(back, np.asarray(ions[ion]),
                                   rtol=1e-6, atol=1e-7, err_msg=ion)
    for name, v in e.items():
        assert (np.asarray(v) >= -1e-9).all(), name


def test_ladder_precedence():
    """Ca binds sulfate before Na; Na binds sulfate before nitrate; the
    sulfate-rich regime produces bisulfate then free acid."""
    one = jnp.ones(1)
    zero = jnp.zeros(1)
    # sea-salt + sulfate: Na2SO4 forms first, leftover Na takes Cl
    e = thermo.electrolyte_ladder(
        {"so4": one, "no3": zero, "nh4": zero, "na": 4 * one, "cl": 2 * one,
         "ca": zero, "co3": zero})
    assert float(e["na2so4"][0]) == 1.0
    assert float(e["nacl"][0]) == 2.0
    # sulfate-rich, ammonium-poor: bisulfate + free sulfuric acid
    e = thermo.electrolyte_ladder(
        {"so4": 3 * one, "no3": zero, "nh4": one, "na": zero, "cl": zero,
         "ca": zero, "co3": zero})
    assert float(e["nh42so4"][0]) == 0.5
    assert float(e["nh4hso4"][0]) == 0.0
    assert float(e["h2so4"][0]) == 2.5
    # dust: CaSO4 before CaCO3 before Ca(NO3)2
    e = thermo.electrolyte_ladder(
        {"so4": 0.5 * one, "no3": 2 * one, "nh4": zero, "na": zero,
         "cl": zero, "ca": 2 * one, "co3": one})
    assert float(e["caso4"][0]) == 0.5
    assert float(e["caco3"][0]) == 1.0
    assert float(e["cano32"][0]) == 0.5


def _bin_chem(comp, shp=(8,)):
    chem = {}
    for b in (1,):
        for s in list(mbins.AER_SPECIES) + ["water"]:
            chem[f"chem_{s}_a{b:02d}"] = jnp.full(shp, comp.get(s, 0.0))
    return chem


def test_mutual_drh_mixture_below_pure():
    """The eutonic behavior: an AS+AN mixed bin deliquesces below both
    pure-salt DRHs; pure bins keep the laboratory values."""
    pure_as = _bin_chem({"so4": 96.0, "nh4": 36.0})      # ~(NH4)2SO4
    pure_an = _bin_chem({"no3": 62.0, "nh4": 18.0})      # NH4NO3
    mixed = _bin_chem({"so4": 48.0, "no3": 31.0, "nh4": 27.0})
    d_as = float(thermo.mutual_drh(pure_as, 1)[0])
    d_an = float(thermo.mutual_drh(pure_an, 1)[0])
    d_mix = float(thermo.mutual_drh(mixed, 1)[0])
    assert 0.76 < d_as < 0.84, d_as
    assert 0.58 < d_an < 0.66, d_an
    assert d_mix < min(d_as, d_an), (d_mix, d_as, d_an)
    assert d_mix > 0.4


def test_insoluble_bin_never_deliquesces():
    dust = _bin_chem({"bc": 5.0})
    d = float(thermo.mutual_drh(dust, 1)[0])
    assert d > 1.0
    flags = thermo.phase_state(dust, jnp.full((8,), 0.99), 1)
    assert float(np.asarray(flags[0]).max()) == 0.0


def test_seasalt_sulfate_bin_phase_transition():
    """A sea-salt bin with sulfate: solid at RH 0.5, liquid at RH 0.9,
    hysteresis branch in between."""
    chem = _bin_chem({"na": 23.0, "cl": 35.45, "so4": 9.6})
    lo = thermo.phase_state(chem, jnp.full((8,), 0.30), 1)[0]
    hi = thermo.phase_state(chem, jnp.full((8,), 0.90), 1)[0]
    assert float(np.asarray(lo).max()) == 0.0
    assert float(np.asarray(hi).min()) == 1.0
    # mid-range, dry history -> still solid; wet history -> stays liquid
    mid_dry = thermo.phase_state(chem, jnp.full((8,), 0.55), 1)[0]
    chem_wet = dict(chem)
    chem_wet["chem_water_a01"] = jnp.full((8,), 10.0)
    mid_wet = thermo.phase_state(chem_wet, jnp.full((8,), 0.55), 1)[0]
    assert float(np.asarray(mid_dry).max()) == 0.0
    assert float(np.asarray(mid_wet).min()) == 1.0
