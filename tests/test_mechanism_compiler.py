"""Native mechanism compiler (tools/mechc + chem/mechanism.py — the KPP
analog): round-trip exactness against the built-in CBM-Z and compile-time
validation of user mechanisms."""

import numpy as np
import pytest

from wrfchem_arc_interactions_tpu.chem import gas, mechanism


def _have_gpp():
    try:
        mechanism.build_mechc()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_gpp(),
                                reason="no C++ toolchain for mechc")


def test_cbmz_round_trip_exact(tmp_path):
    """export .eqn -> native compile -> tables == the built-in tables."""
    p = tmp_path / "cbmz.eqn"
    mechanism.export_eqn(str(p))
    mech = mechanism.compile_eqn(str(p))
    species, order, net, rkind, rparams = mechanism.tables_from(mech)
    assert species == gas.GAS_SPECIES
    np.testing.assert_array_equal(order, gas._ORDER)
    np.testing.assert_array_equal(net, gas._NET)
    assert rkind == gas._RKIND
    assert rparams == [tuple(p) for p in gas._RPARAMS]


def test_user_mechanism_integrates(tmp_path):
    """A tiny hand-written mechanism compiles and runs through the generic
    ROS2 solver: NO2 photolysis + NO+O3 titration reaches the
    photostationary state ratio k1[NO2] ~ J[NO][O3]."""
    import jax.numpy as jnp

    p = tmp_path / "tiny.eqn"
    p.write_text(
        "#SPECIES o3 no no2\n"
        "no2 = no + o3 : PHOT(no2, 1.0) ;\n"
        "no + o3 = no2 : ARR(3.0e-12, 0.0, 1500.0) ;\n")
    mech = mechanism.compile_eqn(str(p))
    species, order, net, rkind, rparams = mechanism.tables_from(mech)
    assert species == ("o3", "no", "no2")

    # build rate constants manually (T=298K, J_no2 at clear-sky scale 1)
    t = 298.0
    ks = []
    for kind, pr in zip(rkind, rparams):
        if kind == "phot":
            ks.append(gas.J_CLEAR[pr[0]] * pr[1])
        else:
            a, n, e_r = pr
            ks.append(a * (t / 300.0) ** n * np.exp(-e_r / t))
    k = jnp.asarray(ks).reshape(-1, 1)

    # integrate with a local copy of the solver machinery on these tables
    conc0 = jnp.asarray([[9e11], [2.5e11], [2.5e11]])   # molec/cm3
    # monkey-patch the module tables to the compiled mechanism for the
    # solver call (the solver reads module-level _ORDER/_NET)
    saved = (gas._ORDER, gas._NET, gas.NS, gas.NR_RXN)
    try:
        gas._ORDER, gas._NET = order, net
        gas.NS, gas.NR_RXN = len(species), len(rkind)
        out = gas.integrate(conc0, k, 600.0)
    finally:
        gas._ORDER, gas._NET, gas.NS, gas.NR_RXN = saved
    out = np.asarray(out)[:, 0]
    o3, no, no2 = out
    # photostationary state: J*[NO2] == k*[NO]*[O3]
    j, karr = float(k[0, 0]), float(k[1, 0])
    lhs, rhs = j * no2, karr * no * o3
    assert abs(lhs - rhs) / rhs < 0.05, (lhs, rhs)
    # nitrogen conserved
    np.testing.assert_allclose(no + no2, 5e11, rtol=1e-3)


def test_compile_time_validation(tmp_path):
    """Undeclared species and malformed rates are compile errors (the
    validation role KPP plays)."""
    bad1 = tmp_path / "bad1.eqn"
    bad1.write_text("#SPECIES o3 no\nno2 = no + o3 : PHOT(no2) ;\n")
    with pytest.raises(ValueError, match="undeclared"):
        mechanism.compile_eqn(str(bad1))

    bad2 = tmp_path / "bad2.eqn"
    bad2.write_text("#SPECIES o3 no\nno + o3 = : FOO(1.0) ;\n")
    with pytest.raises(ValueError, match="unknown rate"):
        mechanism.compile_eqn(str(bad2))

    bad3 = tmp_path / "bad3.eqn"
    bad3.write_text("#SPECIES o3 no\nno + o3 = o3 : ARR(1.0, 0.0, 0.0)\n")
    with pytest.raises(ValueError, match="without ';'"):
        mechanism.compile_eqn(str(bad3))
