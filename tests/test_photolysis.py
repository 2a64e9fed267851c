"""Fast-J-style spectral photolysis (chem/photolysis.py).

Physics invariants rather than absolute magnitudes (which are anchored to
gas.J_CLEAR by construction): the clear-sky overhead-sun standard atmosphere
gives scale 1 at the surface; O3-column changes hit the Hartley-band
species (o3_o1d) hardest and visible absorbers (no2/no3) barely; thick
cloud kills J below and brightens J above (scattering); absorbing aerosol
dims J below itself; night is zero.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.chem import photolysis as ph


def _std_column(nz=40, o3_du=300.0, ncol=1):
    p_w = np.linspace(101325.0, 1000.0, nz + 1)
    dp = np.repeat((p_w[:-1] - p_w[1:]).reshape(nz, 1), ncol, 1)
    z_mid = -7.5 * np.log(0.5 * (p_w[:-1] + p_w[1:]) / 101325.0)
    shape = np.exp(-0.5 * ((z_mid - 23.0) / 5.0) ** 2) + 0.02
    n_col = dp[:, 0] * ph.MOLEC_PER_PA
    o3 = (shape / np.sum(shape * n_col) * o3_du * 2.687e16).reshape(nz, 1)
    o3 = np.repeat(o3, ncol, 1)
    return (jnp.asarray(dp, jnp.float32), jnp.asarray(o3, jnp.float32),
            jnp.zeros((nz, ncol), jnp.float32))


def test_clear_sky_anchor_is_one():
    dp, o3, lwp = _std_column()
    js = ph.j_scales(jnp.ones((1,)), dp, o3, lwp)
    for name, j in js.items():
        surf = float(j[0, 0])
        assert surf == pytest.approx(1.0, rel=1e-4), name


def test_ozone_column_selectivity():
    """Halving the O3 column boosts Hartley-band J(O3->O1D) strongly but
    J(NO2) (350-420 nm, no O3 absorption) by far less."""
    dp, o3, lwp = _std_column()
    j_ref = ph.j_scales(jnp.ones((1,)), dp, o3, lwp)
    j_thin = ph.j_scales(jnp.ones((1,)), dp, 0.5 * o3, lwp)
    gain_o1d = float(j_thin["o3_o1d"][0, 0] / j_ref["o3_o1d"][0, 0])
    gain_no2 = float(j_thin["no2"][0, 0] / j_ref["no2"][0, 0])
    assert gain_o1d > 1.3
    assert gain_no2 < 1.05
    assert gain_o1d > 5.0 * (gain_no2 - 1.0) + 1.0


def test_cloud_dims_below_brightens_above():
    dp, o3, lwp = _std_column()
    j_clear = ph.j_scales(jnp.ones((1,)), dp, o3, lwp)
    # thick stratus: 0.2 kg/m2 LWP in layers 5-7 (tau ~ 30)
    lwp_c = lwp.at[5:8].set(0.07)
    j_cld = ph.j_scales(jnp.ones((1,)), dp, o3, lwp_c)
    below = float(j_cld["no2"][0, 0] / j_clear["no2"][0, 0])
    above = float(j_cld["no2"][15, 0] / j_clear["no2"][15, 0])
    assert below < 0.6, f"below-cloud J not attenuated: {below}"
    assert above > 1.02, f"above-cloud J not brightened: {above}"


def test_absorbing_aerosol_dims_surface_j():
    from wrfchem_arc_interactions_tpu.physics.radiation.bands import NBND_SW
    dp, o3, lwp = _std_column()
    nz = dp.shape[0]
    tau = jnp.zeros((NBND_SW, nz, 1)).at[:, 3:6].set(0.5)   # tau ~ 1.5 total
    ssa = jnp.full_like(tau, 0.85)                          # absorbing (BC mix)
    asy = jnp.full_like(tau, 0.65)
    j_clear = ph.j_scales(jnp.ones((1,)), dp, o3, lwp)
    j_aer = ph.j_scales(jnp.ones((1,)), dp, o3, lwp, tau, ssa, asy)
    ratio = float(j_aer["no2"][0, 0] / j_clear["no2"][0, 0])
    assert ratio < 0.9, f"aerosol did not reduce surface J: {ratio}"


def test_night_is_zero_and_slant_path_reduces_j():
    dp, o3, lwp = _std_column(ncol=3)
    mu0 = jnp.asarray([1.0, 0.3, -0.2], jnp.float32)
    js = ph.j_scales(mu0, dp, o3, lwp)
    j = js["o3_o1d"]
    assert float(j[0, 2]) == 0.0                       # night
    assert float(j[0, 1]) < 0.6 * float(j[0, 0])       # slant O3 path


def test_profile_shape_increases_with_height():
    """Clear sky: actinic flux (hence J) grows with altitude (less Rayleigh
    + O3 above)."""
    dp, o3, lwp = _std_column()
    js = ph.j_scales(jnp.ones((1,)), dp, o3, lwp)
    j = np.asarray(js["h2o2"][:, 0])
    assert j[20] > j[0]
    assert np.all(np.isfinite(j))
