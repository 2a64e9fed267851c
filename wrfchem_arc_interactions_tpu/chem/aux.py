"""Auxiliary chemistry processes: photolysis scaling, dry deposition, wet
scavenging, aqueous cloud chemistry, emissions (canonical:
chem/module_phot_*.F, dry_dep_driver.F, module_wetscav_driver.F,
module_mosaic_cloudchem.F/module_cmu_bulkaqchem.F, emissions_driver.F;
SURVEY.md §2.3, §3.3).

Round-1 scope, one documented simplification each:
- photolysis: clear-sky J table scaled by cos-zenith and a cloud
  transmission factor (Fast-J/TUV's actinic flux machinery reduces to a
  multiplicative J-scale here; the full spectral version rides on the
  SW solver in a later round).
- dry deposition: species-class deposition velocities applied as a
  first-order sink in the lowest layer.
- wet scavenging: first-order in-cloud + below-cloud removal proportional
  to precipitation production rate.
- cloud chemistry: bulk aqueous S(IV)->S(VI) by H2O2 (the dominant in-cloud
  path), producing so4 in the activated (largest) bins.
- emissions: user-supplied surface flux table injected into layer 0.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.chem.mosaic.thermo import ppmv_to_ugkg, ugkg_to_ppmv

# deposition velocities [m/s] by species class
VDEP = {"o3": 0.004, "hno3": 0.02, "so2": 0.008, "nh3": 0.01, "h2o2": 0.01,
        "no2": 0.002, "pan": 0.002, "hcho": 0.005, "default_gas": 0.002,
        "aerosol": 0.002}


def photolysis_scale(mu0, qc_column):
    """J-rate scale: cos-zenith * cloud attenuation (2D, broadcastable).
    Legacy column-bulk form; prefer photolysis_profile."""
    cloud_od = 150.0 * qc_column            # ~tau per kg/m2 LWP
    cloud_fac = jnp.exp(-0.4 * jnp.clip(cloud_od, 0.0, 10.0))
    return jnp.maximum(mu0, 0.0) * cloud_fac


def photolysis_profile(mu0, qc, rho, dz, tau_aer_vis=None):
    """3D J-rate scale coupled to the COMPUTED optical state (canonical:
    the cloud/aerosol adjustment of chem/module_phot_fastj.F; the ARC
    pathway where aerosol loading modulates photochemistry).

    Per-layer optical depth = cloud (tau = 150 * LWP_layer, i.e. 3/2 LWP /
    (rho_w r_eff) with r_eff = 10 um) + the chem-computed near-UV aerosol
    extinction profile ``tau_aer_vis`` (a band of tau_aer_sw).  The actinic
    scale at layer k attenuates with the slant overhead optical depth:
    J ~ mu0 * exp(-0.4 tau_above / max(mu0, 0.2)).

    Returns (nz, ny, nx).
    """
    tau_lay = 150.0 * qc * rho * dz
    if tau_aer_vis is not None:
        tau_lay = tau_lay + tau_aer_vis
    # overhead OD at layer k = sum of layers above (k indexes upward)
    od_above = jnp.flip(jnp.cumsum(jnp.flip(tau_lay, 0), axis=0), 0) - tau_lay
    slant = jnp.clip(od_above, 0.0, 20.0) / jnp.maximum(mu0, 0.2)[None]
    return jnp.maximum(mu0, 0.0)[None] * jnp.exp(-0.4 * slant)


def dry_deposition(chem: Dict[str, jax.Array], dz0, dt: float,
                   gas_names) -> Dict[str, jax.Array]:
    """First-order sink in the lowest model layer; dz0 (ny, nx)."""
    out = dict(chem)
    for name, arr in chem.items():
        short = name.replace("chem_", "")
        if short in gas_names:
            v = VDEP.get(short, VDEP["default_gas"])
        elif "_a" in short:
            v = VDEP["aerosol"]
        else:
            continue
        fac = jnp.exp(-v * dt / jnp.maximum(dz0, 1.0))
        out[name] = arr.at[0].set(arr[0] * fac)
    return out


def wet_scavenging(chem: Dict[str, jax.Array], qr, dt: float,
                   gas_names) -> Dict[str, jax.Array]:
    """First-order scavenging where rain exists: rate ~ 1e-3 s-1 per g/kg
    of rain water (soluble gases + all aerosol species)."""
    soluble = {"hno3": 1.0, "h2so4": 1.0, "nh3": 0.3, "so2": 0.15,
               "h2o2": 0.7, "hcl": 1.0}
    lam = 1.0e-3 * qr * 1.0e3              # [1/s]
    fac_aer = jnp.exp(-lam * dt)
    out = dict(chem)
    for name, arr in chem.items():
        short = name.replace("chem_", "")
        if "_a" in short:
            out[name] = arr * fac_aer
        elif short in soluble:
            out[name] = arr * jnp.exp(-soluble[short] * lam * dt)
    return out


def cloud_chemistry(chem: Dict[str, jax.Array], qc, t_air, nbin: int,
                    dt: float) -> Dict[str, jax.Array]:
    """Bulk aqueous SO2 + H2O2 -> SO4 in cloudy cells (first-order in the
    limiting reagent; effective rate for pH ~4.5 cloud water)."""
    out = dict(chem)
    in_cloud = qc > 1e-6
    k_aq = 3.0e-3                            # effective [1/s] conversion
    so2 = chem["chem_so2"]
    h2o2 = chem["chem_h2o2"]
    lim = jnp.minimum(so2, h2o2)
    d = jnp.where(in_cloud, lim * (1.0 - jnp.exp(-k_aq * dt)), 0.0)
    out["chem_so2"] = so2 - d
    out["chem_h2o2"] = h2o2 - d
    dso4 = ppmv_to_ugkg(d, mbins.MW["so4"])
    # product goes to the activated (cloud-borne) larger bins
    b_act = nbin                             # largest bin index
    key = f"chem_so4_a{b_act:02d}"
    out[key] = chem[key] + dso4
    return out


def apply_emissions(chem: Dict[str, jax.Array], emis: Dict[str, jax.Array],
                    rho0, dz0, dt: float) -> Dict[str, jax.Array]:
    """Inject surface fluxes into layer 0. emis values:
    gases [mol/m2/s -> here ppmv*kg/m2/s simplified: ppmv/s*m], aerosol
    [ug/m2/s]; divided by the layer air mass rho0*dz0."""
    out = dict(chem)
    for name, flux in emis.items():
        key = name if name.startswith("chem_") else f"chem_{name}"
        if key not in chem:
            continue
        d = flux * dt / jnp.maximum(rho0 * dz0, 1e-3)
        out[key] = chem[key].at[0].add(d)
    return out
