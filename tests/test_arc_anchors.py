"""Anchors for the AEROSOL-RADIATION-CLOUD pathways themselves (VERDICT r4
ask #8): the clear-sky radiation anchors (test_radiation_anchors.py) pin the
column; these pin the PERTURBATIONS the repo exists to model against
external physics envelopes:

- aerosol DIRECT effect: surface-SW dimming per unit AOD (sign, tens of
  W/m2 at AOD 0.5, monotone in AOD) [canonical:
  chem/module_optical_averaging.F -> phys/module_radiation_driver.F;
  literature surface forcing efficiency ~ -(40..150) W/m2 per unit AOD];
- aerosol LW absorption: a dust-like absorbing layer raises surface
  downwelling LW and lowers OLR (greenhouse sign);
- Twomey / first INDIRECT effect: at fixed LWP, higher droplet number ->
  smaller effective radius -> brighter cloud (albedo susceptibility
  dA/dlnN within the published 0.01-0.12 envelope for intermediate
  clouds) [canonical: module_mp_morr_two_moment.F effradius ->
  module_ra_rrtmg_sw.F cldprop_sw].
"""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.physics.radiation import bands
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_lw import lw_fluxes
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import sw_fluxes

from test_radiation import standard_column


def _aer_sw(nz, ncol, aod, ssa=0.92, asy=0.65, k_lo=2, k_hi=8):
    """Spectrally-gray aerosol confined to layers k_lo..k_hi."""
    tau = np.zeros((bands.NBND_SW, nz, ncol), np.float32)
    nlay = k_hi - k_lo
    tau[:, k_lo:k_hi, :] = aod / nlay
    return (jnp.asarray(tau), jnp.full_like(jnp.asarray(tau), ssa),
            jnp.full_like(jnp.asarray(tau), asy))


def test_aerosol_direct_surface_dimming_per_aod():
    p, t, dp, qv, lwp, _ = standard_column(qv0=0.008)
    nz, ncol = p.shape
    mu0 = jnp.full((ncol,), 1.0)
    alb = jnp.full((ncol,), 0.08)        # dark (ocean-like) surface
    clean = float(sw_fluxes(p, t, dp, qv, lwp, mu0, alb)["flux_dn"][0, 0])
    dims = []
    for aod in (0.25, 0.5, 1.0):
        ta, sa, ga = _aer_sw(nz, ncol, aod)
        dirty = float(sw_fluxes(p, t, dp, qv, lwp, mu0, alb,
                                tau_aer_sw=ta, ssa_aer_sw=sa,
                                asy_aer_sw=ga)["flux_dn"][0, 0])
        dims.append(clean - dirty)
    # sign + monotone in AOD
    assert 0.0 < dims[0] < dims[1] < dims[2], dims
    # magnitude envelope at AOD 0.5: tens of W/m2 (forcing efficiency
    # ~40-150 W/m2 per unit AOD for ssa ~0.9 over a dark surface)
    assert 20.0 < dims[1] < 120.0, dims[1]


def test_aerosol_lw_absorption_greenhouse_sign():
    """Dust-like LW-absorbing layer in a DRY column (the humid column is
    already opaque near the surface — measured dGLW there is ~0.05 W/m2,
    physically correct but not a useful anchor; in the dry column the
    window is open and the signal is W/m2-scale)."""
    p, t, dp, qv, lwp, tsfc = standard_column(qv0=0.002)
    nz, ncol = p.shape
    base = lw_fluxes(p, t, dp, qv, lwp, tsfc)
    tau = np.zeros((bands.NBND_LW, nz, ncol), np.float32)
    tau[:, 2:8, :] = 0.5 / 6.0           # dust-like absorbing layer
    pert = lw_fluxes(p, t, dp, qv, lwp, tsfc, tau_aer_lw=jnp.asarray(tau))
    dglw = float(pert["glw"][0] - base["glw"][0])
    dolr = float(pert["olr"][0] - base["olr"][0])
    assert dglw > 1.0, dglw              # more downwelling at the surface
    assert dolr < -0.2, dolr             # less escaping to space
    # and the humid-column suppression itself is an anchor: the same layer
    # over qv0=0.008 must do far less at the surface
    p2, t2, dp2, qv2, lwp2, ts2 = standard_column(qv0=0.008)
    b2 = lw_fluxes(p2, t2, dp2, qv2, lwp2, ts2)
    p2o = lw_fluxes(p2, t2, dp2, qv2, lwp2, ts2,
                    tau_aer_lw=jnp.asarray(tau))
    dglw_humid = float(p2o["glw"][0] - b2["glw"][0])
    assert dglw_humid < 0.5 * dglw, (dglw_humid, dglw)


def test_twomey_albedo_susceptibility():
    """Fixed LWP, droplet number 30 -> 300 /cc: the cloud must brighten,
    with dA/dln(N) inside the published 0.01-0.12 envelope."""
    p, t, dp, qv, lwp, _ = standard_column(qv0=0.008, lwp_cloud=0.08)
    nz, ncol = p.shape
    mu0 = jnp.full((ncol,), 0.8)
    alb = jnp.full((ncol,), 0.08)
    k_cld = nz // 3
    # effective radius from (qc, Nc) exactly as the radiation driver does:
    # re = 1.1 (3 qc / (4 pi rho_w Nc))^(1/3); qc/Nc per kg air.  Pick qc
    # consistent with the LWP layer so re lands in the 5-20 um range.
    qc = 4.0e-4                          # kg/kg in the cloud layer

    def run(nc_per_cc):
        nc = nc_per_cc * 1.0e6 / 1.2     # /cc -> /kg at rho ~1.2
        rvol = (3.0 * qc / (4.0 * np.pi * 1000.0 * nc)) ** (1.0 / 3.0)
        re = np.full((nz, ncol), 10.0e-6, np.float32)
        re[k_cld] = np.clip(1.1 * rvol, 2.5e-6, 50.0e-6)
        out = sw_fluxes(p, t, dp, qv, lwp, mu0, alb,
                        re_liq=jnp.asarray(re))
        return (float(out["flux_up"][-1, 0] / out["flux_dn"][-1, 0]),
                float(out["flux_dn"][0, 0]))

    a_lo, sfc_lo = run(30.0)
    a_hi, sfc_hi = run(300.0)
    assert a_hi > a_lo, (a_lo, a_hi)     # brighter cloud at higher N
    assert sfc_hi < sfc_lo               # more dimming below it
    dA_dlnN = (a_hi - a_lo) / np.log(10.0)
    assert 0.01 < dA_dlnN < 0.12, dA_dlnN
