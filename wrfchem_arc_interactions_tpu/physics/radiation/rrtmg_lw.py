"""Longwave spectral radiative transfer (canonical:
phys/module_ra_rrtmg_lw.F — rrtmg_lw / taumol / rtrnmc; SURVEY.md §2.2).

16 bands x 140 g-points, batched dense over (g-point, layer, column) — the
TPU reformulation of the reference's per-column g-point loops (SURVEY.md
§2.5 'Embarrassing column parallelism').  Absorption-only RT with the
standard 1.66 diffusivity angle (the reference's rtrnmc without McICA
subcolumn sampling in round 1: cloud overlap is binary/overcast per cell,
with cloud fraction support plumbed for the McICA upgrade).

The spectral solve is two `lax.scan`s over z (downward then upward
emission/transmission recursions) with all (g-point x column) work
vectorised in the carry — identical wall-clock structure to the
tridiagonal dycore solves.

Aerosol coupling (ARC direct effect): `tau_aer_lw` (nband_lw, nz, ncol)
absorption optical depths from chem.optics are added to the gas optical
depth, g-point-broadcast within each band (canonical: extaerlw consumed in
rtrnmc).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.physics.radiation import bands, gas_optics, ktables
from wrfchem_arc_interactions_tpu.utils import constants as c

DIFFUSIVITY = 1.66
ABS_LIQ = 0.07e3     # cloud liquid mass absorption [m2/kg] (~0.07 m2/g)


def band_planck_fractions(t: jax.Array) -> jax.Array:
    """Fraction of sigma T^4 emitted in each LW band: Planck radiance at the
    band center x band width, renormalised (T-dependent partitioning).

    t: (...,) -> (nband, ...)."""
    wn = 0.5 * (bands.WAVENUM_LW[:-1] + bands.WAVENUM_LW[1:])   # cm-1
    dwn = np.diff(bands.WAVENUM_LW)
    # Planck in wavenumber: B ~ wn^3 / (exp(c2 wn / T) - 1), c2 = 1.4388 K cm
    wn_ = jnp.asarray(wn, t.dtype).reshape((-1,) + (1,) * t.ndim)
    dwn_ = jnp.asarray(dwn, t.dtype).reshape((-1,) + (1,) * t.ndim)
    x = 1.4388 * wn_ / jnp.maximum(t, 100.0)[None]
    b = wn_ ** 3 / jnp.expm1(x) * dwn_
    return b / jnp.sum(b, axis=0, keepdims=True)


def lw_fluxes(p_lay, t_lay, dp_lay, qv, lwp, t_sfc,
              tau_aer_lw: Optional[jax.Array] = None,
              emissivity: float = 0.98,
              cldfra: Optional[jax.Array] = None,
              mcica_seed=0) -> Dict[str, jax.Array]:
    """All inputs (nz, ncol) except t_sfc (ncol,) and tau_aer_lw
    (nband, nz, ncol). Returns fluxes at faces (nz+1, ncol) and heating.

    lwp: layer cloud liquid water path [kg/m2].  With `cldfra` (nz, ncol),
    partial cloudiness is McICA-sampled per g-point (canonical
    mcica_subcol_lw → rtrnmc), max-random overlap.
    """
    dtype = p_lay.dtype
    tabs = ktables.load_tables()
    ngpt = bands.NGPT_LW
    band_of_g = jnp.asarray(bands.BAND_OF_GPT_LW)
    pfrac_g = jnp.asarray(tabs.planck_frac_lw, dtype)          # (ngpt,)

    tau = gas_optics.gas_tau("lw", p_lay, t_lay, dp_lay, qv)    # (ngpt,nz,ncol)
    if cldfra is not None:
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        cf = jnp.clip(cldfra, 0.0, 1.0)
        mask = mcica.mcica_mask(cf, ngpt, mcica_seed)
        lwp_ic = lwp / jnp.maximum(cf, mcica.CF_MIN)
        tau = tau + (ABS_LIQ * lwp_ic)[None] * mask
    else:
        tau = tau + (ABS_LIQ * lwp)[None]
    if tau_aer_lw is not None:
        tau = tau + tau_aer_lw[band_of_g]

    trans = jnp.exp(-DIFFUSIVITY * tau)

    # layer emission flux per g-point: sigma T^4 * band fraction * g weight
    bfrac_lay = band_planck_fractions(t_lay)                   # (nband,nz,ncol)
    b_lay = c.STBOLT * t_lay ** 4                               # (nz,ncol)
    src = b_lay[None] * bfrac_lay[band_of_g] * pfrac_g.reshape(-1, 1, 1)

    # z-leading layout for the scans: (nz, ngpt, ncol)
    trans_z = jnp.moveaxis(trans, 1, 0)
    src_z = jnp.moveaxis(src, 1, 0)

    # downward scan from TOA (z index nz-1 is the top layer)
    def down(carry, x):
        tr, s = x
        fd = carry * tr + s * (1.0 - tr)
        return fd, fd

    zero = jnp.zeros_like(src_z[0])
    _, fd_below = jax.lax.scan(down, zero, (trans_z, src_z), reverse=True)
    # fd_below[k]: downward flux at the BOTTOM face of layer k
    fd_sfc = fd_below[0]

    # upward scan from the surface
    bfrac_s = band_planck_fractions(t_sfc)                     # (nband, ncol)
    src_sfc = (c.STBOLT * t_sfc ** 4)[None] * bfrac_s[band_of_g] \
        * pfrac_g.reshape(-1, 1)
    fu_sfc = emissivity * src_sfc + (1.0 - emissivity) * fd_sfc

    def up(carry, x):
        tr, s = x
        fu = carry * tr + s * (1.0 - tr)
        return fu, fu

    _, fu_above = jax.lax.scan(up, fu_sfc, (trans_z, src_z))   # Fu at layer tops

    # assemble face fluxes (faces k = 0..nz), summed over g-points
    fd_f = jnp.concatenate([fd_below, jnp.zeros_like(fd_below[:1])], axis=0)
    fu_f = jnp.concatenate([fu_sfc[None], fu_above], axis=0)
    fd_tot = jnp.sum(fd_f, axis=1)                              # (nz+1, ncol)
    fu_tot = jnp.sum(fu_f, axis=1)

    fnet = fu_tot - fd_tot
    # heating: layer k gains (Fnet[k] - Fnet[k+1]) over dp
    hr = (fnet[:-1] - fnet[1:]) * c.G / (c.CP * dp_lay)         # K/s
    return {"flux_up": fu_tot, "flux_dn": fd_tot, "heating": hr,
            "olr": fu_tot[-1], "glw": fd_tot[0]}
