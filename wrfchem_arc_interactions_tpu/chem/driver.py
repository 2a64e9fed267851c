"""Chemistry orchestrator — the chem_driver equivalent (canonical:
chem/chem_driver.F; the operator order of SURVEY.md §3.3 is the load-bearing
structure reproduced here):

  dry deposition -> emissions -> photolysis -> gas-phase chemistry ->
  cloud chemistry -> aerosol dynamics (nucleation, condensation/
  partitioning, coagulation, water) -> wet scavenging -> optical properties

Every stage is column/cell-local — no halos anywhere in this file
(SURVEY.md §3.3 'No intra-chem communication') — so the whole stack is
batched dense TPU work between two halo-bearing dynamics steps.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem import aux, gas, optics
from wrfchem_arc_interactions_tpu.chem.mosaic import (
    coag, movesect, nucleation, thermo,
)
from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.physics.radiation.driver import cos_zenith
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c


def _nbin(cfg: Config) -> int:
    return 8 if "8bin" in cfg.chem.chem_opt.value else 4


def _has_gas(cfg: Config) -> bool:
    return cfg.chem.chem_opt in (ChemOpt.CBMZ_MOSAIC_4BIN, ChemOpt.CBMZ_MOSAIC_8BIN)


def chem_driver(state: State, grid: Grid, cfg: Config, hx, dt: float,
                time_s=0.0,
                emissions: Optional[Dict[str, jax.Array]] = None,
                julian_day: Optional[float] = None) -> State:
    ch = cfg.chem
    nbin = _nbin(cfg)
    moist = cfg.moist_species()
    diag = diagnose(state, grid, moist)
    exner = (diag.p_full / c.P0) ** c.RCP
    t_air = diag.theta * exner
    rho_air = 1.0 / (diag.alpha_d * diag.eps_ratio)
    ph_full = grid.phb + state["ph"]
    dz = (ph_full[1:] - ph_full[:-1]) / c.G
    qv = state.get("qv", jnp.zeros_like(t_air))
    qc = state.get("qc", jnp.zeros_like(t_air))
    qr = state.get("qr", jnp.zeros_like(t_air))
    # relative humidity w.r.t. liquid
    es = 611.2 * jnp.exp(c.SVP2 * (t_air - c.SVPT0) / (t_air - c.SVP3))
    qvs = c.EP_2 * es / jnp.maximum(diag.p_full - es, 1.0)
    rh = jnp.clip(qv / jnp.maximum(qvs, 1e-8), 0.0, 1.0)

    chem = {k: v for k, v in state.items() if k.startswith("chem_")}

    # 1. dry deposition (resistance-in-series when the surface scheme
    # provides a friction velocity)
    if ch.drydep_opt:
        ust = state.get("ust")
        chem = aux.dry_deposition(chem, dz[0], dt, gas.GAS_SPECIES,
                                  ust=ust, nbin=nbin)

    # 2. emissions (surface fluxes + Briggs plume rise for elevated
    # `elev_*` sources carrying a `heat_mw` entry)
    if ch.emiss_opt and emissions:
        plume_w = None
        if any(k.startswith("elev_") for k in emissions):
            z_w = (ph_full - ph_full[0:1]) / c.G
            u_mean = jnp.sqrt(state["u"][0] ** 2 + state["v"][0] ** 2)
            heat = emissions.get("heat_mw", jnp.ones_like(u_mean))
            plume_w = aux.plume_rise_profile(heat, u_mean, z_w)
        chem = aux.apply_emissions(chem, emissions, rho_air[0], dz[0], dt,
                                   plume_w=plume_w, rho=rho_air, dz=dz)

    # 3-4. photolysis profile (coupled to the computed cloud + aerosol
    # optical state — the chem->J ARC pathway) + gas-phase mechanism
    if ch.gaschem_onoff and _has_gas(cfg):
        zen_kw = {} if julian_day is None else {"julian_day": julian_day}
        mu0 = cos_zenith(time_s, grid.xlat, grid.xlong, **zen_kw)
        if int(ch.phot_opt) >= 2:
            # Fast-J-style spectral actinic flux: prognostic O3 absorption,
            # Rayleigh, cloud LWP, and the chem-computed aerosol optical
            # state per band -> per-reaction J scales (chem/photolysis.py)
            from wrfchem_arc_interactions_tpu.chem import photolysis
            j_scale = photolysis.j_scales(
                mu0, rho_air * c.G * dz, chem["chem_o3"] * 1e-6,
                qc * rho_air * dz,
                state.get("tau_aer_sw"), state.get("ssa_aer_sw"),
                state.get("asy_aer_sw"))
        else:
            # bulk gray attenuation (phot_opt=1 legacy path); near-UV
            # aerosol extinction band 10 = 0.345-0.442 um of the SW grid
            tau_uv = state["tau_aer_sw"][10] if "tau_aer_sw" in state else None
            j_scale = aux.photolysis_profile(mu0, qc, rho_air, dz, tau_uv)
        # ppmv -> molec/cm3
        m_air = diag.p_full / (1.380649e-23 * t_air) * 1e-6      # molec/cm3
        shape = t_air.shape
        conc = jnp.stack([chem[f"chem_{s}"] * 1e-6 * m_air
                          for s in gas.GAS_SPECIES]).reshape(gas.NS, -1)
        k_rxn = gas.rate_constants(t_air, m_air,
                                   j_scale).reshape(gas.NR_RXN, -1)
        if ch.gas_adaptive:
            # KPP-style error-controlled stepping (accuracy audits /
            # stiff-event robustness); fixed substeps are the production
            # default — see gas.integrate_adaptive
            conc = gas.integrate_adaptive(conc, k_rxn, dt,
                                          rtol=ch.gas_rtol, atol=ch.gas_atol)
        else:
            conc = gas.integrate(conc, k_rxn, dt)
        conc = conc.reshape((gas.NS,) + shape)
        for i, s in enumerate(gas.GAS_SPECIES):
            chem[f"chem_{s}"] = conc[i] / m_air * 1e6

    # 5. cloud chemistry: activation/resuspension bookkeeping of the
    # cloud-borne (_cw) phase, then aqueous S(IV)->S(VI) into the droplets
    if ch.cldchem_onoff:
        w_c = 0.5 * (state["w"][:-1] + state["w"][1:])
        chem = aux.cw_exchange(chem, qc, t_air, diag.p_full, rho_air, w_c,
                               nbin)
        chem = aux.cloud_chemistry(chem, qc, t_air, nbin, dt)

    # 6. aerosol dynamics
    if ch.aerchem_onoff:
        chem = nucleation.nucleate(chem, rho_air, rh, nbin, dt)
        chem = thermo.partition(chem, t_air, rho_air, rh, nbin, dt)
        chem = coag.coagulate(chem, rho_air, nbin, dt)
        # moving-center bin remap: growth moves particles between sections
        chem = movesect.remap(chem, nbin)

    # 7. wet scavenging (size-resolved per bin: Greenfield-gap collection)
    if ch.wetscav_onoff:
        chem = aux.wet_scavenging(chem, qr, dt, gas.GAS_SPECIES, nbin=nbin)

    # 8. aerosol optical properties (the ARC direct-effect bridge)
    out = dict(state)
    out.update(chem)
    if ch.aer_ra_feedback or "tau_aer_sw" in state:
        opt = optics.aerosol_optics(chem, rho_air, dz, nbin)
        out.update(opt)
    return out
