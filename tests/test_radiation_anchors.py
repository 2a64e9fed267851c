"""External-physics anchors for the RRTMG-structured radiation
(VERDICT r3 item 5).  The k-coefficients are synthetic (empty reference
mount, ktables.py provenance note), but their OUTPUTS can still be pinned
to literature envelopes so table drift is caught:

- tropical clear-sky OLR in the documented ~280-300 W/m2 window
  [canonical: AER standard tropical atmosphere validation for RRTMG];
- dry-column surface shortwave at overhead sun ~1000-1100 W/m2;
- greenhouse sensitivity signs and magnitudes (2xCO2, added H2O);
- gray-limit analytic two-stream solutions (Beer direct transmission,
  semi-infinite conservative-scattering albedo).
"""

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.physics.radiation import gas_optics, ktables
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_lw import lw_fluxes
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import (
    sw_fluxes, two_stream,
)

from test_radiation import standard_column


def test_tropical_clear_sky_olr_window():
    out = lw_fluxes(*standard_column(qv0=0.012))
    olr = float(out["olr"][0])
    assert 278.0 < olr < 302.0, f"tropical clear OLR {olr} outside window"


def test_dry_column_olr_above_tropical():
    """Less water vapor -> less trapping -> higher OLR, short of sigma T^4."""
    olr_trop = float(lw_fluxes(*standard_column(qv0=0.012))["olr"][0])
    olr_dry = float(lw_fluxes(*standard_column(qv0=0.002))["olr"][0])
    sig_ts4 = 5.670e-8 * 300.0 ** 4
    assert olr_trop + 15.0 < olr_dry < sig_ts4 - 80.0, (olr_trop, olr_dry)


def test_co2_doubling_reduces_olr_by_a_few_wm2():
    args = standard_column(qv0=0.012)
    base = gas_optics.CO2_VMR
    olr1 = float(lw_fluxes(*args)["olr"][0])
    try:
        gas_optics.CO2_VMR = 2.0 * base
        ktables.load_tables.cache_clear()
        olr2 = float(lw_fluxes(*args)["olr"][0])
    finally:
        gas_optics.CO2_VMR = base
        ktables.load_tables.cache_clear()
    d = olr2 - olr1
    # instantaneous 2xCO2 TOA forcing is ~-2.5 to -4 W/m2 in line-by-line
    # models; accept a generous envelope but require the right sign and
    # order of magnitude
    assert -12.0 < d < -1.0, f"2xCO2 dOLR {d}"


def test_surface_sw_overhead_sun_window():
    p, t, dp, qv, lwp, _ = standard_column(qv0=0.002)
    mu0 = jnp.full((2,), 1.0)
    alb = jnp.full((2,), 0.1)
    out = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    sfc = float(out["flux_dn"][0, 0])
    assert 995.0 < sfc < 1120.0, f"dry overhead-sun surface SW {sfc}"
    # humid tropical column absorbs more: lower surface total, still >850
    out_t = sw_fluxes(*standard_column(qv0=0.012)[:5], mu0, alb)
    sfc_t = float(out_t["flux_dn"][0, 0])
    assert 850.0 < sfc_t < sfc, (sfc_t, sfc)


def test_clear_sky_planetary_albedo_plausible():
    """TOA up / TOA down over a 0.1-albedo surface: clear-sky planetary
    albedo should sit near 10-17% (Rayleigh + surface)."""
    p, t, dp, qv, lwp, _ = standard_column(qv0=0.008)
    mu0 = jnp.full((2,), 1.0)
    alb = jnp.full((2,), 0.1)
    out = sw_fluxes(p, t, dp, qv, lwp, mu0, alb)
    a = float(out["flux_up"][-1, 0] / out["flux_dn"][-1, 0])
    assert 0.08 < a < 0.20, a


def test_gray_limit_direct_beam_is_beer_lambert():
    """Pure absorber (ssa=0): the direct transmission of the two-stream
    must be exactly exp(-tau/mu0)."""
    for tau, mu0 in ((0.3, 1.0), (1.0, 0.5), (3.0, 0.8)):
        tt = jnp.full((1, 1), tau)
        _, _, _, _, t0 = two_stream(tt, jnp.zeros_like(tt),
                                    jnp.zeros_like(tt), jnp.full((1,), mu0))
        np.testing.assert_allclose(float(t0[0, 0]), np.exp(-tau / mu0),
                                   rtol=1e-5)


def test_gray_limit_conservative_scattering_reflects_everything():
    """ssa=1, asy=0, tau -> inf: a semi-infinite conservative scatterer
    reflects ~all incident flux (R_dif -> 1)."""
    tt = jnp.full((1, 1), 200.0)
    r_dif, t_dif, _, _, _ = two_stream(tt, jnp.full((1, 1), 0.9999),
                                       jnp.zeros((1, 1)),
                                       jnp.full((1,), 1.0))
    assert float(r_dif[0, 0]) > 0.93
    assert float(t_dif[0, 0]) < 0.05
