"""MOSAIC aerosol thermodynamics — gas-particle partitioning and water
uptake (canonical: chem/module_mosaic_therm.F MESA/ASTEM;
SURVEY.md §2.3, §7.3-5).

The reference's MESA/ASTEM is an iterative per-cell solver with
data-dependent iteration counts; the TPU reformulation is fixed-work and
branchless (SURVEY.md §7.3-5):

- **Aerosol water** by kappa-Kohler/ZSR: V_w = V_dry kappa_mix RH/(1-RH).
- **H2SO4**: irreversible kinetic condensation with Fuchs-Sutugin
  transition-regime mass transfer per bin, integrated analytically
  (exponential decay of the gas over dt; bin shares ~ per-bin uptake
  coefficients) — the ASTEM non-volatile pathway.
- **NH3**: condenses toward sulfate neutralisation (NH4)2SO4,
  rate-limited by the same kinetic coefficients.
- **NH4NO3**: bulk equilibrium with the Mozurkewich dissociation constant
  Kp(T, RH); excess product condenses (or particulate NO3 evaporates)
  toward Kp, distributed over bins by uptake coefficient — the ASTEM
  semi-volatile pathway in its bulk-equilibration mode.

All quantities are (nz, ny, nx) fields; gases in ppmv, aerosol in ug/kg.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.utils import constants as c

D_GAS = 9.4e-6        # H2SO4 vapor diffusivity [m2/s]
LAMBDA_AIR = 6.5e-8   # mean free path at stp [m]
ACCOM = 0.65          # accommodation coefficient
MW_AIR_G = 28.966


def ppmv_to_ugkg(x_ppmv, mw):
    return x_ppmv * 1e3 * mw / MW_AIR_G      # 1 ppmv = mw/Mair * 1e-6 kg/kg = ... ug/kg


def ugkg_to_ppmv(x_ugkg, mw):
    return x_ugkg * MW_AIR_G / (mw * 1e3)


def uptake_coeffs(chem: Dict[str, jax.Array], rho_air, nbin: int):
    """Per-bin kinetic uptake coefficient k_b [1/s] for gas condensation:
    k_b = 2 pi D_g D_wet N_b beta(Kn) with Fuchs-Sutugin beta."""
    ks = []
    for b in range(1, nbin + 1):
        vol = None
        for s in list(mbins.AER_SPECIES) + ["water"]:
            v = chem[f"chem_{s}_a{b:02d}"] * 1e-9 / mbins.DENSITY[s]
            vol = v if vol is None else vol + v
        num = jnp.maximum(chem[f"chem_num_a{b:02d}"], 1.0)     # #/kg
        d_wet = jnp.clip((6.0 * jnp.maximum(vol, 1e-30)
                          / (jnp.pi * num)) ** (1.0 / 3.0), 1e-9, 50e-6)
        kn = 2.0 * LAMBDA_AIR / d_wet
        beta = (1.0 + kn) / (1.0 + kn * (1.71 + 1.33 * kn) / ACCOM)
        n_m3 = num * rho_air
        ks.append(2.0 * jnp.pi * D_GAS * d_wet * n_m3 * beta)
    return ks                                                   # list of (nz,ny,nx)


# deliquescence RH of the pure salts (MESA's phase-state inputs; canonical
# module_mosaic_therm.F MDRH tables)
DRH = {"so4": 0.80, "nh4": 0.80,    # (NH4)2SO4
       "no3": 0.62,                 # NH4NO3
       "cl": 0.75, "na": 0.75,      # NaCl
       "oin": 0.95, "bc": 1.01, "oc": 0.85}


# crystallization (efflorescence) RH: the lower hysteresis branch sits far
# below deliquescence (canonical: (NH4)2SO4 effloresces near 35% RH)
CRH_FRACTION = 0.45          # CRH ~ 0.45 * DRH of the mix


def phase_state(chem: Dict[str, jax.Array], rh, nbin: int):
    """MESA-style solid/liquid phase flag per bin WITH the deliquescence/
    efflorescence hysteresis branch (canonical: module_mosaic_therm.F MESA
    jhyst_leg logic).

    - RH above the mole-weighted mutual DRH of the inorganic mix: liquid
      (the mutual DRH of a mixture sits below the pure-salt values —
      captured by the mole weighting).
    - RH below the crystallization RH (CRH ~ 0.45 DRH): solid.
    - In between, the phase is HISTORY-dependent: a particle that was wet
      stays wet (the metastable upper branch).  The history carrier is the
      prognostic aerosol water itself (chem_water_aXX > 0 from the previous
      chemistry step — advected with the bin, exactly like the reference's
      hysteresis water), so the branch survives transport and restart.

    Returns a list of (nz, ny, nx) liquid fractions in {0, 1}."""
    flags = []
    for b in range(1, nbin + 1):
        mol = None
        drh_mol = None
        dry_mass = None
        for s in mbins.AER_SPECIES:
            m = chem[f"chem_{s}_a{b:02d}"] / mbins.MW[s]
            mol = m if mol is None else mol + m
            dm = DRH[s] * m
            drh_mol = dm if drh_mol is None else drh_mol + dm
            dry_mass = (chem[f"chem_{s}_a{b:02d}"] if dry_mass is None
                        else dry_mass + chem[f"chem_{s}_a{b:02d}"])
        drh_mix = drh_mol / jnp.maximum(mol, 1e-30)
        crh_mix = CRH_FRACTION * drh_mix
        was_wet = chem.get(f"chem_water_a{b:02d}")
        if was_wet is None:
            on_upper_branch = jnp.zeros_like(rh)
        else:
            # "was wet": carried water exceeding a trace of the dry mass
            on_upper_branch = (was_wet > 1e-3 * jnp.maximum(dry_mass, 1e-30)
                               ).astype(rh.dtype)
        liquid = jnp.where(rh > drh_mix, 1.0,
                           jnp.where(rh > crh_mix, on_upper_branch, 0.0))
        flags.append(liquid.astype(rh.dtype))
    return flags


def water_uptake(chem: Dict[str, jax.Array], rh, nbin: int) -> Dict[str, jax.Array]:
    """kappa-Kohler aerosol water per bin: V_w = V_dry kappa RH/(1-RH),
    gated by the MESA phase state (solid bins carry no water)."""
    out = {}
    aw = jnp.clip(rh, 0.05, 0.98)
    liquid = phase_state(chem, rh, nbin)
    for b in range(1, nbin + 1):
        v_dry = None
        v_kappa = None
        for s in mbins.AER_SPECIES:
            v = chem[f"chem_{s}_a{b:02d}"] * 1e-9 / mbins.DENSITY[s]
            v_dry = v if v_dry is None else v_dry + v
            kv = mbins.KAPPA[s] * v
            v_kappa = kv if v_kappa is None else v_kappa + kv
        v_w = v_kappa * aw / (1.0 - aw) * liquid[b - 1]
        out[f"chem_water_a{b:02d}"] = v_w * mbins.DENSITY["water"] * 1e9  # ug/kg
    return out


def mozurkewich_kp(t_air):
    """NH4NO3 dissociation constant [ppb^2] (Mozurkewich 1993)."""
    return jnp.exp(118.87 - 24084.0 / t_air - 6.025 * jnp.log(t_air))


def partition(chem: Dict[str, jax.Array], t_air, rho_air, rh,
              nbin: int, dt: float) -> Dict[str, jax.Array]:
    """One chemdt of gas-particle mass transfer. Returns updated fields."""
    out = dict(chem)
    ks = uptake_coeffs(chem, rho_air, nbin)
    k_tot = sum(ks)
    k_tot_safe = jnp.maximum(k_tot, 1e-30)
    frac = [k / k_tot_safe for k in ks]
    transfer = 1.0 - jnp.exp(-k_tot * dt)      # fraction of gas taken up

    # --- H2SO4: irreversible condensation --------------------------------
    h2so4 = chem["chem_h2so4"]                                   # ppmv
    dh = h2so4 * transfer
    out["chem_h2so4"] = h2so4 - dh
    dso4_ug = ppmv_to_ugkg(dh, mbins.MW["so4"])
    for b in range(1, nbin + 1):
        key = f"chem_so4_a{b:02d}"
        out[key] = chem[key] + dso4_ug * frac[b - 1]

    # --- NH3 -> neutralise sulfate (2 NH4 : 1 SO4 target) ----------------
    nh3 = chem["chem_nh3"]
    so4_tot = sum(out[f"chem_so4_a{b:02d}"] for b in range(1, nbin + 1))
    nh4_tot = sum(chem[f"chem_nh4_a{b:02d}"] for b in range(1, nbin + 1))
    so4_mol = so4_tot / mbins.MW["so4"]
    nh4_mol = nh4_tot / mbins.MW["nh4"]
    deficit_mol = jnp.maximum(2.0 * so4_mol - nh4_mol, 0.0)      # umol-ish/kg
    nh3_avail_mol = ppmv_to_ugkg(nh3, mbins.MW["nh4"]) / mbins.MW["nh4"]
    dnh4_mol = jnp.minimum(deficit_mol, nh3_avail_mol * transfer)
    dnh4_ug = dnh4_mol * mbins.MW["nh4"]
    out["chem_nh3"] = nh3 - ugkg_to_ppmv(dnh4_ug, mbins.MW["nh4"])
    for b in range(1, nbin + 1):
        key = f"chem_nh4_a{b:02d}"
        out[key] = chem[key] + dnh4_ug * frac[b - 1]

    # --- NH4NO3 bulk equilibrium ----------------------------------------
    nh3_ppb = out["chem_nh3"] * 1e3
    hno3_ppb = chem["chem_hno3"] * 1e3
    kp = mozurkewich_kp(t_air) * jnp.where(rh > 0.6, 0.1, 1.0)  # deliquesced branch
    prod = nh3_ppb * hno3_ppb
    # condense d (ppb) solving (nh3-d)(hno3-d) = kp; one Newton step from 0
    # is adequate at the chemdt cadence
    s_ = nh3_ppb + hno3_ppb
    disc = jnp.sqrt(jnp.maximum(s_ * s_ - 4.0 * (prod - kp), 0.0))
    d_eq = 0.5 * (s_ - disc)                                     # exact root
    d_eq = jnp.clip(d_eq, -1e3, jnp.minimum(nh3_ppb, hno3_ppb))
    # rate-limit by kinetic transfer; allow evaporation (d_eq < 0) bounded
    # by existing particulate NO3
    no3_tot = sum(chem[f"chem_no3_a{b:02d}"] for b in range(1, nbin + 1))
    d = d_eq * transfer
    d_ug = ppmv_to_ugkg(d * 1e-3, mbins.MW["no3"])
    d_ug = jnp.maximum(d_ug, -no3_tot)
    out["chem_hno3"] = chem["chem_hno3"] - ugkg_to_ppmv(d_ug, mbins.MW["no3"])
    out["chem_nh3"] = out["chem_nh3"] - ugkg_to_ppmv(
        d_ug * mbins.MW["nh4"] / mbins.MW["no3"], mbins.MW["nh4"])
    no3_tot_safe = jnp.maximum(no3_tot, 1e-30)
    for b in range(1, nbin + 1):
        key = f"chem_no3_a{b:02d}"
        gain = jnp.where(d_ug >= 0.0, d_ug * frac[b - 1],
                         d_ug * chem[key] / no3_tot_safe)
        out[key] = jnp.maximum(chem[key] + gain, 0.0)
        keyn = f"chem_nh4_a{b:02d}"
        out[keyn] = jnp.maximum(
            out[keyn] + gain * mbins.MW["nh4"] / mbins.MW["no3"], 0.0)

    # --- water equilibrium ----------------------------------------------
    out.update(water_uptake(out, rh, nbin))
    return out
