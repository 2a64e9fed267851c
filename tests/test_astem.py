"""ASTEM per-bin semi-volatile dynamics (canonical: the ASTEM solver of
chem/module_mosaic_therm.F, Zaveri et al. 2008; VERDICT r2 ask #5).

Invariants:
- total N (HNO3 + per-bin NO3), NH3+NH4 and Cl+HCl conserved (molar);
- bin-resolved: small bins (Kelvin) hold less NO3 at equilibrium;
- the fixed-substep path converges to a dense f64 reference integration
  of the same per-bin ODE;
- warming drives evaporation (Kp grows), cooling condensation;
- NaCl displacement: HNO3 condensing on a sea-salt bin releases HCl.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.chem.mosaic import thermo

NBIN = 4
SHAPE = (2, 2)


def _chem(nh3=5e-3, hno3=5e-3, hcl=0.0, **over):
    base = {"chem_h2so4": 0.0, "chem_nh3": nh3, "chem_hno3": hno3,
            "chem_hcl": hcl}
    for b in range(1, NBIN + 1):
        for s in mbins.AER_SPECIES:
            base[f"chem_{s}_a{b:02d}"] = 0.0
        base[f"chem_water_a{b:02d}"] = 0.0
        base[f"chem_num_a{b:02d}"] = 0.0
    # ammonium-sulfate seed in every bin so uptake surfaces exist
    for b in range(1, NBIN + 1):
        base[f"chem_so4_a{b:02d}"] = 1.0
        base[f"chem_nh4_a{b:02d}"] = 0.4
    base["chem_num_a01"] = 5e9      # small particles
    base["chem_num_a02"] = 1e9
    base["chem_num_a03"] = 2e8
    base["chem_num_a04"] = 4e7      # large particles
    base.update(over)
    return {k: jnp.full(SHAPE, v, jnp.float32) for k, v in base.items()}


def _run(chem, t=270.0, rh=0.4, dt=60.0):
    t_air = jnp.full(SHAPE, t)
    rho = jnp.full(SHAPE, 1.1)
    rh_f = jnp.full(SHAPE, rh)
    return thermo.partition(chem, t_air, rho, rh_f, NBIN, dt)


def _mol_totals(c):
    n = np.asarray(thermo.ppmv_to_ugkg(c["chem_hno3"], mbins.MW["no3"]),
                   np.float64) / mbins.MW["no3"]
    a = np.asarray(thermo.ppmv_to_ugkg(c["chem_nh3"], mbins.MW["nh4"]),
                   np.float64) / mbins.MW["nh4"]
    cl = np.asarray(thermo.ppmv_to_ugkg(c["chem_hcl"], mbins.MW["cl"]),
                    np.float64) / mbins.MW["cl"]
    for b in range(1, NBIN + 1):
        n = n + np.asarray(c[f"chem_no3_a{b:02d}"], np.float64) / mbins.MW["no3"]
        a = a + np.asarray(c[f"chem_nh4_a{b:02d}"], np.float64) / mbins.MW["nh4"]
        cl = cl + np.asarray(c[f"chem_cl_a{b:02d}"], np.float64) / mbins.MW["cl"]
    return float(np.sum(n)), float(np.sum(a)), float(np.sum(np.asarray(cl)))


def test_cold_condenses_warm_evaporates():
    cold = _run(_chem(), t=260.0)
    no3_cold = sum(float(cold[f"chem_no3_a{b:02d}"].sum())
                   for b in range(1, NBIN + 1))
    assert no3_cold > 1e-3, "cold NH3+HNO3 must condense NH4NO3"

    # start loaded with NO3, then warm: it must evaporate
    loaded = {k: v for k, v in cold.items()}
    warm = _run(loaded, t=300.0, dt=600.0)
    no3_warm = sum(float(warm[f"chem_no3_a{b:02d}"].sum())
                   for b in range(1, NBIN + 1))
    assert no3_warm < 0.5 * no3_cold, (no3_cold, no3_warm)


def test_nitrogen_and_ammonium_conserved():
    chem = _chem()
    n0, a0, _ = _mol_totals(chem)
    out = _run(chem, t=262.0, dt=300.0)
    n1, a1, _ = _mol_totals(out)
    np.testing.assert_allclose(n1, n0, rtol=2e-5)
    np.testing.assert_allclose(a1, a0, rtol=2e-5)
    for k, v in out.items():
        assert float(v.min()) >= 0.0, k


def test_bin_resolved_kelvin_partitioning():
    """Per-unit-surface the large bins must out-compete the smallest bin
    (Kelvin factor raises the small-bin equilibrium vapor pressure).  The
    observable: NO3-per-particle must grow much faster than the particle
    count ratio alone implies."""
    out = _run(_chem(), t=258.0, dt=600.0)
    no3 = [float(out[f"chem_no3_a{b:02d}"].mean()) for b in range(1, NBIN + 1)]
    num = [float(out[f"chem_num_a{b:02d}"].mean()) for b in range(1, NBIN + 1)]
    per_particle = [m / n for m, n in zip(no3, num)]
    assert all(b > a for a, b in zip(per_particle, per_particle[1:])), \
        per_particle
    assert per_particle[3] > 5.0 * per_particle[0], per_particle


def test_fixed_substeps_match_dense_f64_reference():
    """The ASTEM_SUBSTEPS=6 path at chemdt=60 s must track a 600-substep
    f64 integration of the same per-bin ODE to a few percent."""
    jax.config.update("jax_enable_x64", True)
    try:
        import wrfchem_arc_interactions_tpu.chem.mosaic.thermo as th

        def run_with_substeps(nsub, dtype):
            chem = {k: v.astype(dtype) for k, v in _chem().items()}
            old = th.ASTEM_SUBSTEPS
            th.ASTEM_SUBSTEPS = nsub
            try:
                out = _run(chem, t=262.0, dt=60.0)
            finally:
                th.ASTEM_SUBSTEPS = old
            return out

        ref = run_with_substeps(600, jnp.float64)
        got = run_with_substeps(6, jnp.float64)
        no3_ref = np.array([float(ref[f"chem_no3_a{b:02d}"].mean())
                            for b in range(1, NBIN + 1)])
        no3_got = np.array([float(got[f"chem_no3_a{b:02d}"].mean())
                            for b in range(1, NBIN + 1)])
        assert no3_ref.sum() > 1e-3
        np.testing.assert_allclose(no3_got, no3_ref, rtol=0.05)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_nacl_displacement_releases_hcl():
    chem = _chem(nh3=2e-3, hno3=8e-3, hcl=0.0)
    # bin 3 is sea salt
    chem["chem_na_a03"] = jnp.full(SHAPE, 2.0)
    chem["chem_cl_a03"] = jnp.full(SHAPE, 3.0)
    n0, a0, c0 = _mol_totals(chem)
    out = _run(chem, t=262.0, dt=600.0)
    n1, a1, c1 = _mol_totals(out)
    assert float(out["chem_hcl"].max()) > 0.0, "no HCl displaced"
    assert float(out["chem_cl_a03"].mean()) < float(chem["chem_cl_a03"].mean())
    np.testing.assert_allclose(c1, c0, rtol=2e-5)   # Cl conserved
    np.testing.assert_allclose(n1, n0, rtol=2e-5)
