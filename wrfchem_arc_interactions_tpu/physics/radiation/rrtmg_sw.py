"""Shortwave spectral radiative transfer (canonical:
phys/module_ra_rrtmg_sw.F — rrtmg_sw / taumol_sw / reftra_sw / spcvmc_sw;
SURVEY.md §2.2).

14 bands x 112 g-points.  Per (g-point, layer, column): combine gas
absorption, Rayleigh scattering, cloud liquid optics, and aerosol
(tau, ssa, g) per band (the ARC direct effect; canonical tauaer/waer/gaer
from chem feeding spcvmc); delta-Eddington scaling; Meador-Weaver
two-stream layer reflectance/transmittance (the reftra_sw analog); then a
vertical adding method as two `lax.scan`s (the vrtqdr analog): an upward
pass building stack-below reflectances and a downward pass propagating the
direct beam and diffuse flux.

All (g-point x column) work is batched dense; the z recursions are short
scans, the same TPU execution shape as the LW solver and the dycore
tridiagonals.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.physics.radiation import bands, gas_optics, ktables
from wrfchem_arc_interactions_tpu.utils import constants as c

# cloud liquid optics (parameterised, re ~ 10 um): tau = 3 LWP/(2 rho_w re)
RE_LIQ = 10.0e-6
SSA_LIQ = 0.995
ASY_LIQ = 0.85
EPS = 1e-6


def cloud_tau_sw(lwp: jax.Array, re_liq=None) -> jax.Array:
    """Geometric-optics liquid cloud extinction tau = 3 LWP / (2 rho_w re).

    `re_liq` (same shape as lwp, metres) carries the microphysics-coupled
    droplet effective radius — the Twomey/first-indirect pathway: higher
    activated Nc at fixed LWC gives smaller re, larger tau, brighter cloud
    (canonical: re_cloud from module_mp_morr_two_moment.F feeding
    module_ra_rrtmg_sw.F cldprop_sw).  None keeps the fixed 10 um default
    used when droplet number is not prognostic."""
    re = RE_LIQ if re_liq is None else re_liq
    return 1.5 * lwp / (c.RHOWATER * re)


def two_stream(tau, ssa, asy, mu0):
    """Meador-Weaver hemispheric-mean two-stream with delta scaling.

    All args (..., ) elementwise; mu0 broadcastable. Returns
    (r_dif, t_dif, r_dir, t_dir, t0): diffuse reflect/transmit, direct-beam
    reflect/transmit (to diffuse), and direct transmittance.
    """
    # delta-Eddington scaling
    f = asy * asy
    tau_d = (1.0 - ssa * f) * tau
    ssa_d = jnp.clip((1.0 - f) * ssa / (1.0 - ssa * f + EPS), 0.0, 1.0 - EPS)
    g_d = asy / (1.0 + asy)

    gamma1 = (7.0 - ssa_d * (4.0 + 3.0 * g_d)) * 0.25
    gamma2 = -(1.0 - ssa_d * (4.0 - 3.0 * g_d)) * 0.25
    gamma2 = jnp.maximum(gamma2, EPS)
    gamma3 = (2.0 - 3.0 * g_d * mu0) * 0.25
    gamma4 = 1.0 - gamma3

    k = jnp.sqrt(jnp.maximum(gamma1 * gamma1 - gamma2 * gamma2, EPS))
    ktau = jnp.minimum(k * tau_d, 50.0)
    ek = jnp.exp(ktau)
    ek_inv = 1.0 / ek

    denom_dif = k * (ek + ek_inv) + gamma1 * (ek - ek_inv)
    r_dif = jnp.clip(gamma2 * (ek - ek_inv) / (denom_dif + EPS), 0.0, 1.0)
    t_dif = jnp.clip(2.0 * k / (denom_dif + EPS), 0.0, 1.0)
    # joint energy bound for the diffuse pair
    t_dif = jnp.minimum(t_dif, 1.0 - r_dif)

    t0 = jnp.exp(-jnp.minimum(tau_d / jnp.maximum(mu0, 1e-3), 50.0))

    # direct-beam source terms (Meador-Weaver); guard the k*mu0 -> 1 resonance
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4
    kmu = k * mu0
    # The Meador-Weaver direct solution has a removable singularity at
    # k*mu0 = 1: finite in exact arithmetic but catastrophically cancelling
    # in f32 within ~0.1 of it. Push kmu symmetrically out of that window
    # (bounded ~4x amplification, no cancellation); clips below are the
    # backstop.
    kmu = 1.0 + jnp.sign(kmu - 1.0) * jnp.maximum(jnp.abs(kmu - 1.0), 0.12)
    denom_dir = 1.0 - kmu * kmu

    # Meador & Weaver (1980) eqs. 14-15 (flux normalisation, diffuse parts)
    r_dir = ssa_d / denom_dir / (denom_dif + EPS) * (
        (1.0 - kmu) * (alpha2 + k * gamma3) * ek
        - (1.0 + kmu) * (alpha2 - k * gamma3) * ek_inv
        - 2.0 * k * (gamma3 - alpha2 * mu0) * t0
    )
    t_dir = -ssa_d / denom_dir / (denom_dif + EPS) * (
        (1.0 + kmu) * (alpha1 + k * gamma4) * ek * t0
        - (1.0 - kmu) * (alpha1 - k * gamma4) * ek_inv * t0
        - 2.0 * k * (gamma4 + alpha1 * mu0)
    )
    # joint direct-beam energy budget: r_dir + t_dir + t0 + absorbed = 1.
    # Near the k*mu0 resonance the raw Meador-Weaver expressions overshoot;
    # cap scattered-up first, then scattered-down by the remainder.
    r_dir = jnp.clip(r_dir, 0.0, jnp.maximum(1.0 - t0, 0.0))
    t_dir = jnp.clip(t_dir, 0.0, jnp.maximum(1.0 - t0 - r_dir, 0.0))
    return r_dif, t_dif, r_dir, t_dir, t0


def sw_fluxes(p_lay, t_lay, dp_lay, qv, lwp, mu0, albedo,
              tau_aer_sw: Optional[jax.Array] = None,
              ssa_aer_sw: Optional[jax.Array] = None,
              asy_aer_sw: Optional[jax.Array] = None,
              cldfra: Optional[jax.Array] = None,
              mcica_seed=0,
              re_liq: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """SW flux profiles. Inputs (nz, ncol); mu0, albedo (ncol,); aerosol
    arrays (nband_sw, nz, ncol). Returns face fluxes (nz+1, ncol), heating
    (nz, ncol), and surface/TOA diagnostics.

    With `cldfra` (nz, ncol), partial cloudiness is handled by McICA
    (canonical mcica_subcol_sw → spcvmc_sw): each g-point samples a binary
    max-random-overlap subcolumn and carries the in-cloud condensate
    lwp/cldfra; without it, clouds are overcast wherever lwp > 0."""
    dtype = p_lay.dtype
    tabs = ktables.load_tables()
    band_of_g = jnp.asarray(bands.BAND_OF_GPT_SW)
    e0_g = jnp.asarray(tabs.solar_src_sw, dtype).reshape(-1, 1)  # (ngpt,1)

    tau_gas = gas_optics.gas_tau("sw", p_lay, t_lay, dp_lay, qv)
    tau_ray = gas_optics.rayleigh_tau(dp_lay, dtype)
    if cldfra is not None:
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        cf = jnp.clip(cldfra, 0.0, 1.0)
        mask = mcica.mcica_mask(cf, tau_gas.shape[0], mcica_seed)
        lwp_ic = lwp / jnp.maximum(cf, mcica.CF_MIN)
        tau_cld = cloud_tau_sw(lwp_ic, re_liq)[None] * mask
    else:
        tau_cld = cloud_tau_sw(lwp, re_liq)[None]

    tau_tot = tau_gas + tau_ray + tau_cld
    w_ray = tau_ray
    w_cld = SSA_LIQ * tau_cld
    wg_cld = ASY_LIQ * w_cld
    w_sum = w_ray + w_cld
    wg_sum = wg_cld
    if tau_aer_sw is not None:
        t_a = tau_aer_sw[band_of_g]
        w_a = (ssa_aer_sw * tau_aer_sw)[band_of_g]
        wg_a = (asy_aer_sw * ssa_aer_sw * tau_aer_sw)[band_of_g]
        tau_tot = tau_tot + t_a
        w_sum = w_sum + w_a
        wg_sum = wg_sum + wg_a
    ssa_tot = jnp.clip(w_sum / (tau_tot + EPS), EPS, 1.0 - EPS)
    asy_tot = wg_sum / (w_sum + EPS)

    mu0b = jnp.maximum(mu0, 1e-3)[None, None]       # broadcast (1,1,ncol)
    r_dif, t_dif, r_dir, t_dir, t0 = two_stream(tau_tot, ssa_tot, asy_tot, mu0b)

    # z-leading for scans: (nz, ngpt, ncol)
    zmove = lambda a: jnp.moveaxis(a, 1, 0)
    r_dif, t_dif, r_dir, t_dir, t0 = map(zmove, (r_dif, t_dif, r_dir, t_dir, t0))

    from wrfchem_arc_interactions_tpu.utils.vma import tie_vma
    alb = tie_vma(jnp.broadcast_to(albedo[None], r_dif.shape[1:]), p_lay)

    # upward pass: stack-below reflectances at each face (faces 0..nz)
    def up(carry, x):
        rb_dif, rb_dir = carry
        rd, td, rdr, tdr, tt0 = x
        d = 1.0 / (1.0 - rd * rb_dif)
        rb_dir_new = rdr + (tt0 * rb_dir + tdr * rb_dif) * td * d
        rb_dif_new = rd + td * td * rb_dif * d
        return (rb_dif_new, rb_dir_new), (rb_dif, rb_dir)

    (rb_dif_top, rb_dir_top), (rb_dif_f, rb_dir_f) = jax.lax.scan(
        up, (alb, alb), (r_dif, t_dif, r_dir, t_dir, t0))
    # rb_*_f[k]: reflectance of everything below face k (face k = bottom of
    # layer k); append the top-of-atmosphere value for face nz
    rb_dif_faces = jnp.concatenate([rb_dif_f, rb_dif_top[None]], axis=0)
    rb_dir_faces = jnp.concatenate([rb_dir_f, rb_dir_top[None]], axis=0)

    # downward pass from TOA: carry (direct S, diffuse Fd) at the face above
    # each layer; compute values at the face below
    s_toa = e0_g * jnp.maximum(mu0, 0.0)[None]       # (ngpt, ncol)

    def down(carry, x):
        s_above, fd_above = carry
        rd, td, rdr, tdr, tt0, rb_dif_below, rb_dir_below = x
        d = 1.0 / (1.0 - rd * rb_dif_below)
        s_below = s_above * tt0
        fd_below = d * (td * fd_above
                        + s_above * (tdr + tt0 * rb_dir_below * rd))
        return (s_below, fd_below), (s_below, fd_below)

    s_toa = tie_vma(s_toa, p_lay)     # carry must be mesh-varying like the body
    zeros = jnp.zeros_like(s_toa)
    xs = (r_dif[::-1], t_dif[::-1], r_dir[::-1], t_dir[::-1], t0[::-1],
          rb_dif_faces[:-1][::-1], rb_dir_faces[:-1][::-1])
    _, (s_rev, fd_rev) = jax.lax.scan(down, (s_toa, zeros), xs)
    s_f = jnp.concatenate([s_rev[::-1], s_toa[None]], axis=0)    # faces 0..nz
    fd_f = jnp.concatenate([fd_rev[::-1], zeros[None]], axis=0)
    fu_f = rb_dif_faces * fd_f + rb_dir_faces * s_f

    fdn_tot = jnp.sum(s_f + fd_f, axis=1)           # (nz+1, ncol)
    fup_tot = jnp.sum(fu_f, axis=1)
    fnet = fdn_tot - fup_tot                         # net DOWNWARD
    hr = (fnet[1:] - fnet[:-1]) * c.G / (c.CP * dp_lay)
    night = (mu0 <= 0.0)[None]
    fdn_tot = jnp.where(night, 0.0, fdn_tot)
    fup_tot = jnp.where(night, 0.0, fup_tot)
    hr = jnp.where(night, 0.0, hr)
    return {"flux_dn": fdn_tot, "flux_up": fup_tot, "heating": hr,
            "swdown": fdn_tot[0], "swup_toa": fup_tot[-1]}
