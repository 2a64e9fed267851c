"""pH-dependent aqueous S(IV)->S(VI) chemistry and size-resolved wet
scavenging (chem/aux.py; canonical module_cmu_bulkaqchem.F /
module_mosaic_wetscav.F behavior checks)."""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem import aux
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins


def _chem(shape=(4, 2, 2), nbin=4, **over):
    base = {
        "chem_so2": 2e-3, "chem_h2o2": 1e-3, "chem_o3": 0.05,
        f"chem_so4_a{nbin:02d}": 0.5, f"chem_no3_a{nbin:02d}": 0.0,
        f"chem_nh4_a{nbin:02d}": 0.0,
    }
    base.update(over)
    return {k: jnp.full(shape, v, jnp.float32) for k, v in base.items()}


def test_aqueous_sulfate_production_and_budget():
    chem = _chem()
    qc = jnp.full((4, 2, 2), 5e-4)      # cloudy everywhere
    t = jnp.full((4, 2, 2), 280.0)
    out = aux.cloud_chemistry(chem, qc, t, 4, dt=600.0)
    d_so2 = float(chem["chem_so2"][0, 0, 0] - out["chem_so2"][0, 0, 0])
    assert d_so2 > 1e-5, "no S(IV) oxidation in cloud"
    # sulfur budget: consumed SO2 (ppmv) appears as so4 (ug/kg)
    d_so4 = float(out["chem_so4_a04"][0, 0, 0] - chem["chem_so4_a04"][0, 0, 0])
    from wrfchem_arc_interactions_tpu.chem.mosaic.thermo import ppmv_to_ugkg
    np.testing.assert_allclose(d_so4, float(ppmv_to_ugkg(
        jnp.float32(d_so2), mbins.MW["so4"])), rtol=1e-4)
    # oxidants consumed, nothing negative
    assert float(out["chem_h2o2"][0, 0, 0]) <= float(chem["chem_h2o2"][0, 0, 0])
    for k, v in out.items():
        assert float(jnp.min(v)) >= 0.0, k


def test_no_oxidation_outside_cloud():
    chem = _chem()
    qc = jnp.zeros((4, 2, 2))
    out = aux.cloud_chemistry(chem, qc, jnp.full((4, 2, 2), 280.0), 4, 600.0)
    np.testing.assert_array_equal(np.asarray(out["chem_so2"]),
                                  np.asarray(chem["chem_so2"]))


def test_o3_path_shuts_off_in_acid_cloud():
    """The O3 pathway is self-limiting: acidified cloud water (high sulfate,
    no ammonia) must oxidize much less via O3 than a neutralized cloud."""
    qc = jnp.full((4, 2, 2), 5e-4)
    t = jnp.full((4, 2, 2), 280.0)
    acid = _chem(**{"chem_h2o2": 0.0, "chem_so4_a04": 20.0})
    neut = _chem(**{"chem_h2o2": 0.0, "chem_so4_a04": 0.05,
                    "chem_nh4_a04": 5.0})
    d_acid = float((acid["chem_so2"] - aux.cloud_chemistry(
        acid, qc, t, 4, 600.0)["chem_so2"])[0, 0, 0])
    d_neut = float((neut["chem_so2"] - aux.cloud_chemistry(
        neut, qc, t, 4, 600.0)["chem_so2"])[0, 0, 0])
    assert d_neut > 5.0 * max(d_acid, 1e-12), (
        f"O3 path not pH-limited: acid {d_acid}, neutral {d_neut}")


def test_greenfield_gap_scavenging():
    """Below-cloud collection: accumulation-mode bins scavenge slower than
    both the smallest (Brownian) and coarsest (impaction) bins."""
    diams = mbins.make_bins(4).d_center
    effs = [aux._collection_efficiency(d) for d in diams]
    i_min = int(np.argmin(effs))
    assert 0 < i_min < 3, f"no Greenfield gap: {effs}"
    nbin = 4
    chem = {f"chem_so4_a{b:02d}": jnp.full((4, 2, 2), 1.0)
            for b in range(1, nbin + 1)}
    qr = jnp.full((4, 2, 2), 1e-3)       # 1 g/kg rain
    out = aux.wet_scavenging(chem, qr, dt=600.0, gas_names=(), nbin=nbin)
    rem = [float(out[f"chem_so4_a{b:02d}"][0, 0, 0]) for b in range(1, 5)]
    # survival maximal in the gap bin
    assert rem[i_min] == max(rem), rem
    assert rem[3] < rem[i_min], "coarse bin not preferentially scavenged"
    assert all(0.0 <= r <= 1.0 for r in rem)


def test_gases_scavenged_by_solubility():
    chem = {"chem_hno3": jnp.full((4, 2, 2), 1.0),
            "chem_so2": jnp.full((4, 2, 2), 1.0),
            "chem_co": jnp.full((4, 2, 2), 1.0)}
    qr = jnp.full((4, 2, 2), 1e-3)
    out = aux.wet_scavenging(chem, qr, dt=600.0,
                             gas_names=("hno3", "so2", "co"), nbin=4)
    hno3 = float(out["chem_hno3"][0, 0, 0])
    so2 = float(out["chem_so2"][0, 0, 0])
    co = float(out["chem_co"][0, 0, 0])
    assert hno3 < so2 < co == 1.0      # solubility ordering; CO insoluble
