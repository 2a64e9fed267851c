"""Aerosol optical properties: MOSAIC bins -> (tau, ssa, g) per radiation
band (canonical: chem/module_optical_driver.F + module_optical_averaging.F
optical_averaging/mieaer; SURVEY.md §2.3, §3.3).

Per (cell, bin, band): volume-average the complex refractive index over the
species mix including water (aer_op_opt=1 volume mixing; Maxwell-Garnett /
core-shell are later-round options), get the wet size parameter, evaluate
the Chebyshev-fit Mie efficiencies with bilinear (n_r, log n_i)
interpolation — a fully dense, vmap-free batched computation whose inner
Clenshaw recurrence keeps only two (nband, nz, ncol) temporaries live.

Writes the tau_aer_sw/ssa_aer_sw/asy_aer_sw/tau_aer_lw state arrays read by
the radiation driver at the next radt alarm — the ARC direct-effect bridge
("Mie optics recomputed each radiation call", BASELINE config 4, is
achieved by calling this from chem_driver every chemdt <= radt).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.chem import mie
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.physics.radiation import bands as rbands

UG_TO_KG = 1.0e-9


def _interp_coefs(tabs: mie.MieTables, nr, ni, dtype):
    """Bilinear interpolation weights into the (NR_GRID, NI_GRID) tables.
    nr, ni: (...). Returns (c_q, c_s, c_g) each (NCHEB, ...)."""
    nrg = mie.NR_GRID
    fr = (jnp.clip(nr, nrg[0], nrg[-1]) - nrg[0]) / (nrg[1] - nrg[0])
    jr = jnp.clip(jnp.floor(fr).astype(jnp.int32), 0, len(nrg) - 2)
    wr = fr - jr
    lni = jnp.log10(jnp.clip(ni, 1e-9, 1.0))
    fi = (lni - (-9.0)) / 1.0
    ji = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, len(mie.NI_GRID) - 2)
    wi = fi - ji

    def interp(table):
        tb = jnp.asarray(table, dtype)           # (n_nr, n_ni, NCHEB)
        c00 = tb[jr, ji]                          # (..., NCHEB)
        c01 = tb[jr, ji + 1]
        c10 = tb[jr + 1, ji]
        c11 = tb[jr + 1, ji + 1]
        c = ((1 - wr)[..., None] * ((1 - wi)[..., None] * c00 + wi[..., None] * c01)
             + wr[..., None] * ((1 - wi)[..., None] * c10 + wi[..., None] * c11))
        return jnp.moveaxis(c, -1, 0)            # (NCHEB, ...)

    return interp(tabs.coef_qext), interp(tabs.coef_qsca), interp(tabs.coef_g)


def bin_optics(d_wet, n_air, nr_eff, ni_eff, wavelengths_um, tabs: mie.MieTables):
    """Mie optics for one bin over a band axis.

    d_wet: (...,) wet diameter [m]; n_air: (...,) number per m3;
    nr_eff/ni_eff: (nband, ...); wavelengths_um: (nband,).
    Returns (ext, sca, g_as): ext/sca are extinction/scatter coefficients
    [1/m] (multiply by layer dz for optical depth).
    """
    dtype = d_wet.dtype
    lam = jnp.asarray(wavelengths_um * 1e-6, dtype).reshape(
        (-1,) + (1,) * d_wet.ndim)
    x = jnp.pi * d_wet[None] / lam
    lnx = jnp.log(jnp.maximum(x, 1e-6))
    t = jnp.clip(2.0 * (lnx - tabs.lnx_min) / (tabs.lnx_max - tabs.lnx_min) - 1.0,
                 -1.0, 1.0)
    cq, cs, cg = _interp_coefs(tabs, nr_eff, ni_eff, dtype)
    qe = jnp.exp(jnp.clip(mie.cheb_eval(cq, t), -60.0, 3.0))
    qs = jnp.exp(jnp.clip(mie.cheb_eval(cs, t), -60.0, 3.0))
    gg = mie.cheb_eval(cg, t)
    qs = jnp.minimum(qs, qe)
    gg = jnp.clip(gg, 0.0, 1.0)
    area = 0.25 * jnp.pi * d_wet ** 2 * n_air     # [1/m] cross-section conc.
    return qe * area[None], qs * area[None], gg


def aerosol_optics(chem_fields: Dict[str, jax.Array], rho_air, dz,
                   nbin: int) -> Dict[str, jax.Array]:
    """Compute (tau, ssa, asy) per SW band and absorption tau per LW band.

    chem_fields: state chem arrays (ug/kg for masses, #/kg for num_*),
    each (nz, ny, nx); rho_air, dz same shape. Returns the four state
    optics arrays.
    """
    dtype = rho_air.dtype
    tabs = mie.build_cheb_tables()
    sw_um = rbands.band_centers_sw_um()
    lw_um = rbands.band_centers_lw_um()
    sp_sw = mbins.species_arrays(sw_um)
    sp_lw = mbins.species_arrays(lw_um)
    grid_b = mbins.make_bins(nbin)
    names = list(mbins.AER_SPECIES) + ["water"]

    shp = rho_air.shape
    tau_sw = jnp.zeros((rbands.NBND_SW,) + shp, dtype)
    sca_sw = jnp.zeros_like(tau_sw)
    g_sca_sw = jnp.zeros_like(tau_sw)
    tau_lw_abs = jnp.zeros((rbands.NBND_LW,) + shp, dtype)

    for b in range(1, nbin + 1):
        vol = jnp.zeros(shp, dtype)
        vols = []
        for s in names:
            m = chem_fields[f"chem_{s}_a{b:02d}"] * UG_TO_KG   # kg/kg
            v = m / mbins.DENSITY[s]                           # m3/kg air
            vols.append(v)
            vol = vol + v
        num = jnp.maximum(chem_fields[f"chem_num_a{b:02d}"], 1.0)  # #/kg
        vol = jnp.maximum(vol, 1e-30)
        d_wet = (6.0 * vol / (jnp.pi * num)) ** (1.0 / 3.0)
        d_wet = jnp.clip(d_wet, 1e-9, 50e-6)
        n_air = num * rho_air                                   # #/m3

        for kind, sp, nbnd in (("sw", sp_sw, rbands.NBND_SW),
                               ("lw", sp_lw, rbands.NBND_LW)):
            nr_t = jnp.asarray(sp["nr"], dtype)   # (nspecies, nband)
            ni_t = jnp.asarray(sp["ni"], dtype)
            nr_eff = jnp.zeros((nbnd,) + shp, dtype)
            ni_eff = jnp.zeros((nbnd,) + shp, dtype)
            for i, v in enumerate(vols):
                f = (v / vol)
                nr_eff = nr_eff + nr_t[i].reshape((-1,) + (1,) * len(shp)) * f[None]
                ni_eff = ni_eff + ni_t[i].reshape((-1,) + (1,) * len(shp)) * f[None]
            um = sw_um if kind == "sw" else lw_um
            ext, sca, gg = bin_optics(d_wet, n_air, nr_eff, ni_eff, um, tabs)
            if kind == "sw":
                tau_sw = tau_sw + ext * dz[None]
                sca_sw = sca_sw + sca * dz[None]
                g_sca_sw = g_sca_sw + gg * sca * dz[None]
            else:
                tau_lw_abs = tau_lw_abs + (ext - sca) * dz[None]

    ssa = jnp.where(tau_sw > 0, sca_sw / jnp.maximum(tau_sw, 1e-30), 1.0)
    asy = jnp.where(sca_sw > 0, g_sca_sw / jnp.maximum(sca_sw, 1e-30), 0.0)
    return {"tau_aer_sw": tau_sw, "ssa_aer_sw": jnp.clip(ssa, 0.0, 1.0),
            "asy_aer_sw": jnp.clip(asy, 0.0, 1.0),
            "tau_aer_lw": jnp.maximum(tau_lw_abs, 0.0)}
