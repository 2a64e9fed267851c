"""Cheap broadband radiation option (canonical: the Dudhia SW scheme of
phys/module_ra_sw.F and an emissivity-method gray LW in the spirit of
module_ra_rrtm.F's predecessors; SURVEY.md §2.2 'Other radiation options').

ra_*_physics = SIMPLE: one band each way.  SW: downward beam depleted by
water-vapor absorption (sqrt-path Dudhia curve), cloud albedo/absorption;
no multiple scattering.  LW: broadband water-vapor emissivity columns with
cloud as near-black emitter.  ~50x cheaper than the spectral solver; used
for fast spinup runs and as a sanity cross-check on RRTMG's fluxes.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.utils import constants as c


def sw_simple(p_lay, t_lay, dp_lay, qv, lwp, mu0, albedo) -> Dict[str, jax.Array]:
    mu = jnp.maximum(mu0, 1e-3)[None]
    s0 = c.SOLAR_CONSTANT * jnp.maximum(mu0, 0.0)          # (ncol,)
    # water vapor path from each level to TOA [kg/m2] (cumulative from top)
    wv = qv * dp_lay / c.G
    wv_above = jnp.cumsum(wv[::-1], axis=0)[::-1] / mu
    # Dudhia-style absorption fraction ~ 0.077 (wv_path)^0.3
    absorb = 0.077 * jnp.maximum(wv_above, 1e-6) ** 0.3
    # cloud: albedo and absorption from overlying LWP
    lwp_above = jnp.cumsum(lwp[::-1], axis=0)[::-1] / mu
    tau_c = 0.15e3 * lwp_above
    cld_alb = tau_c / (6.7 + tau_c)
    cld_abs = 0.04 * tau_c / (1.0 + 0.04 * tau_c) * 0.2
    trans = jnp.clip(1.0 - absorb - cld_alb - cld_abs, 0.0, 1.0)
    # flux at layer bottoms; faces k=0..nz
    fdn_lay_bottom = s0[None] * trans
    fdn = jnp.concatenate([fdn_lay_bottom, s0[None]], axis=0)
    fup = albedo[None] * fdn[0][None] * jnp.ones_like(fdn)
    fnet = fdn - fup
    hr = (fnet[1:] - fnet[:-1]) * c.G / (c.CP * dp_lay)
    night = (mu0 <= 0.0)[None]
    fdn = jnp.where(night, 0.0, fdn)
    hr = jnp.where(night, 0.0, hr)
    return {"flux_dn": fdn, "flux_up": jnp.where(night, 0.0, fup),
            "heating": hr, "swdown": fdn[0],
            "swup_toa": jnp.where(night[0], 0.0, fup[-1])}


def _emissivity(wv_path):
    """Broadband water-vapor flux emissivity (Sasamori-style fit)."""
    u = jnp.maximum(wv_path, 1e-8)
    return jnp.clip(0.58 + 0.09 * jnp.log10(u), 0.05, 0.98)


def lw_simple(p_lay, t_lay, dp_lay, qv, lwp, t_sfc,
              emissivity_sfc: float = 0.98) -> Dict[str, jax.Array]:
    nz = p_lay.shape[0]
    wv = qv * dp_lay / c.G
    sig_t4 = c.STBOLT * t_lay ** 4
    # layer emissivity: vapor + cloud (near-black for LWP > ~0.05 kg/m2)
    eps_lay = jnp.clip(1.0 - jnp.exp(-1.66 * (0.1 * wv ** 0.5 + 60.0 * lwp)),
                       1e-4, 1.0)

    def down(carry, x):
        e, s = x
        fd = carry * (1.0 - e) + e * s
        return fd, fd

    zero = jnp.zeros_like(sig_t4[0])
    _, fd_below = jax.lax.scan(down, zero, (eps_lay[::-1], sig_t4[::-1]))
    fd_below = fd_below[::-1]
    fd = jnp.concatenate([fd_below, zero[None]], axis=0)

    fu_sfc = emissivity_sfc * c.STBOLT * t_sfc ** 4 + (1 - emissivity_sfc) * fd[0]

    def up(carry, x):
        e, s = x
        fu = carry * (1.0 - e) + e * s
        return fu, fu

    _, fu_above = jax.lax.scan(up, fu_sfc, (eps_lay, sig_t4))
    fu = jnp.concatenate([fu_sfc[None], fu_above], axis=0)
    fnet = fu - fd
    hr = (fnet[:-1] - fnet[1:]) * c.G / (c.CP * dp_lay)
    return {"flux_up": fu, "flux_dn": fd, "heating": hr,
            "olr": fu[-1], "glw": fd[0]}
