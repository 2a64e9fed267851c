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
import numpy as np

from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.chem.mosaic.thermo import ppmv_to_ugkg, ugkg_to_ppmv

# fallback deposition velocities [m/s] by species class (used when no
# friction velocity is available)
VDEP = {"o3": 0.004, "hno3": 0.02, "so2": 0.008, "nh3": 0.01, "h2o2": 0.01,
        "no2": 0.002, "pan": 0.002, "hcho": 0.005, "default_gas": 0.002,
        "aerosol": 0.002}

# Wesely (1989) bulk surface (canopy) resistances [s/m] — the rc of the
# resistance-in-series scheme (canonical: module_dep_simple.F tables,
# midsummer land-use category collapsed to one value per species)
RC_WESELY = {"o3": 100.0, "so2": 130.0, "hno3": 1.0, "nh3": 80.0,
             "h2o2": 50.0, "no2": 300.0, "no": 3000.0, "pan": 500.0,
             "hcho": 150.0, "co": 1.0e5, "ald2": 300.0, "hono": 50.0,
             "n2o5": 1.0, "hno4": 10.0, "ch3ooh": 200.0, "rooh": 200.0,
             "default_gas": 400.0}
KARMAN = 0.4
Z0_DEP = 0.1           # roughness length [m] (land)


def deposition_velocities(ust, z1, bin_diam_m):
    """Resistance-in-series deposition velocities (canonical:
    chem/dry_dep_driver.F + module_aer_drydep.F).

    Gases: vd = 1/(ra + rb + rc) with aerodynamic ra = ln(z1/z0)/(k u*),
    quasi-laminar rb ~ 5/u* (Sc/Pr)^(2/3), Wesely rc per species.
    Aerosol (Slinn): vd = vg + 1/(ra + rs + ra rs vg) with gravitational
    settling vg(D) and surface resistance rs = 1/(u*(Sc^-2/3 + 10^(-3/St))).

    Returns ({species: vd_gas (ny,nx)}, [vd_aer per bin]).
    """
    ust = jnp.maximum(ust, 0.05)
    ra = jnp.log(jnp.maximum(z1, 2.0 * Z0_DEP) / Z0_DEP) / (KARMAN * ust)
    rb = 5.0 / ust
    vd_gas = {s: 1.0 / (ra + rb + rc) for s, rc in RC_WESELY.items()}

    vd_aer = []
    mu_air = 1.8e-5
    for d in bin_diam_m:
        # Cunningham slip correction
        kn = 2.0 * 6.5e-8 / d
        cc = 1.0 + kn * (1.257 + 0.4 * np.exp(-1.1 / kn))
        vg = 1500.0 * d ** 2 * 9.81 * cc / (18.0 * mu_air)
        # Brownian Schmidt number + impaction Stokes number
        diff = 1.38e-23 * 293.0 * cc / (3.0 * np.pi * mu_air * d)
        sc = mu_air / (1.2 * diff)
        st = vg * ust ** 2 / (9.81 * mu_air / 1.2)
        rs = 1.0 / (ust * (sc ** (-2.0 / 3.0) + 10.0 ** (-3.0 / jnp.maximum(st, 1e-3))))
        vd_aer.append(vg + 1.0 / (ra + rs + ra * rs * vg))
    return vd_gas, vd_aer


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
                   gas_names, ust=None, nbin: int = 4) -> Dict[str, jax.Array]:
    """Dry-deposition sink in the lowest model layer; dz0 (ny, nx).

    With a friction velocity, uses the resistance-in-series velocities
    (deposition_velocities); otherwise the fallback class table."""
    out = dict(chem)
    vd_gas = vd_aer = None
    if ust is not None:
        diams = mbins.make_bins(nbin).d_center
        vd_gas, vd_aer = deposition_velocities(ust, 0.5 * dz0, diams)
    for name, arr in chem.items():
        short = name.replace("chem_", "")
        if short in gas_names:
            if vd_gas is not None:
                v = vd_gas.get(short, vd_gas["default_gas"])
            else:
                v = VDEP.get(short, VDEP["default_gas"])
        elif "_a" in short:
            if vd_aer is not None:
                b = int(short[-2:]) - 1
                v = vd_aer[min(b, len(vd_aer) - 1)]
            else:
                v = VDEP["aerosol"]
        else:
            continue
        fac = jnp.exp(-v * dt / jnp.maximum(dz0, 1.0))
        out[name] = arr.at[0].set(arr[0] * fac)
    return out


# ---------------------------------------------------------------------------
# Plume rise (canonical: chem/module_plumerise1.F, Briggs-style rise of
# buoyant fire/stack emissions into an elevated injection layer)
# ---------------------------------------------------------------------------

def plume_rise_profile(heat_mw, u_mean, z_w):
    """Injection-weight profile for buoyant elevated emissions.

    heat_mw: source heat flux [MW] (ny, nx); u_mean: transport wind [m/s];
    z_w: (nz+1, ny, nx) w-level heights above ground.  Briggs (1975) final
    rise for buoyant plumes in neutral flow: dh = 1.6 Fb^(1/3) xf^(2/3) / u
    with Fb ~ 8.8e-6 * Q[W] m4/s3 and xf = 120 m * Fb^(2/5) (Fb>55) —
    collapsed to the standard dh ~ 38.7 Fb^(3/5)/u form.  Emissions spread
    uniformly between 0.5 dh and dh (the reference's top/bottom detrainment
    layer).  Returns (nz, ny, nx) weights summing to 1 per column.
    """
    q_w = jnp.maximum(heat_mw, 1e-3) * 1e6
    fb = 8.8e-6 * q_w
    u = jnp.maximum(u_mean, 1.0)
    dh = 38.7 * fb ** 0.6 / u
    z_top = jnp.clip(dh, 50.0, 8000.0)[None]
    z_bot = 0.5 * z_top
    z_lo = z_w[:-1]
    z_hi = z_w[1:]
    overlap = jnp.clip(jnp.minimum(z_hi, z_top) - jnp.maximum(z_lo, z_bot),
                       0.0, None)
    w = overlap / jnp.maximum(jnp.sum(overlap, axis=0, keepdims=True), 1.0)
    # degenerate columns (plume below the first level): inject at level 0
    empty = jnp.sum(overlap, axis=0, keepdims=True) <= 0.0
    w0 = jnp.zeros_like(w).at[0].set(1.0)
    return jnp.where(empty, w0, w)


def _collection_efficiency(d_m: float) -> float:
    """Raindrop-aerosol collection efficiency E(d): Brownian capture for
    small particles, inertial impaction for large, with the Greenfield gap
    (minimum ~1e-3 near 0.3 um) between — the Slinn (1983) shape used by
    the reference's size-resolved below-cloud scheme."""
    d_um = d_m * 1e6
    # E ~ 0.1 at 0.01 um (diffusion), minimum ~1e-3 near 0.3 um, -> O(1)
    # above ~10 um (Slinn 1983 fig. for ~1 mm drops)
    e_brown = 0.1 * (0.01 / d_um) ** (4.0 / 3.0)
    e_impact = (d_um / (d_um + 2.5)) ** 3
    return float(min(1.0, e_brown + e_impact + 1e-4))


def wet_scavenging(chem: Dict[str, jax.Array], qr, dt: float,
                   gas_names, nbin: int = 4) -> Dict[str, jax.Array]:
    """Size-resolved precipitation scavenging (canonical:
    module_wetscav_driver.F + module_mosaic_wetscav.F).

    Aerosol (below-cloud): per-bin coefficient
    Lambda_b = (3/2) E(d_bin) P / (rho_w D_rain) with rain rate
    P = rho qr v_t inferred from the local rain water (Kessler fall speed),
    D_rain = 1 mm effective drop size — small particles (Brownian) and
    coarse particles (impaction) scavenge fast, accumulation mode sits in
    the Greenfield gap.  Gases: Henry-law-weighted first-order uptake.
    """
    soluble = {"hno3": 1.0, "h2so4": 1.0, "nh3": 0.3, "so2": 0.15,
               "h2o2": 0.7, "hcl": 1.0}
    # rain rate [kg/m2/s] per unit air density: v_t ~ 5 m/s bulk fall speed
    rain_flux = 1.2 * qr * 5.0                   # rho_air ~ 1.2
    lam_gas = 1.0e-3 * qr * 1.0e3                # [1/s] legacy gas uptake rate
    d_rain, rho_w = 1.0e-3, 1000.0
    diams = mbins.make_bins(nbin).d_center
    # in-cloud (nucleation) scavenging of the cloud-borne phase: the
    # aerosol inside droplets is removed at the cloud-water -> rain
    # conversion rate; the Kessler accretion rate 2.2 qr^0.875 [1/s] is the
    # bulk proxy for that conversion (canonical: module_mosaic_wetscav.F
    # drains the _cw species with the MP-provided qc->qr rates)
    lam_cw = 2.2 * jnp.maximum(qr, 0.0) ** 0.875
    out = dict(chem)
    for name, arr in chem.items():
        short = name.replace("chem_", "")
        if "_cw" in short:
            out[name] = arr * jnp.exp(-lam_cw * dt)
        elif "_a" in short:
            b = int(short[-2:]) - 1
            eff = _collection_efficiency(diams[min(b, nbin - 1)])
            lam_b = 1.5 * eff * rain_flux / (rho_w * d_rain)
            out[name] = arr * jnp.exp(-lam_b * dt)
        elif short in soluble:
            out[name] = arr * jnp.exp(-soluble[short] * lam_gas * dt)
    return out


# Henry constants [M/atm] at 298K and effective dissociation constants
H_SO2, K1_SO2, K2_SO2 = 1.23, 1.3e-2, 6.6e-8
H_H2O2, H_O3 = 7.45e4, 1.13e-2

QC_CLOUD = 1e-6         # [kg/kg] cloud presence threshold for the cw phase


def _cw_keys(chem) -> bool:
    return any(k.startswith("chem_num_cw") for k in chem)


def cw_exchange(chem: Dict[str, jax.Array], qc, t_air, p_air, rho_air,
                w_up, nbin: int) -> Dict[str, jax.Array]:
    """Interstitial <-> cloud-borne aerosol exchange (canonical: the
    activation/resuspension bookkeeping of phys/module_mixactivate.F
    feeding the _cw species of module_mosaic_cloudchem.F).

    In cloudy cells (qc > QC_CLOUD) the AR&G per-bin activated fraction
    sets a floor on the cloud-borne share of each bin's (interstitial +
    cloud-borne) total — activation is a ratchet while the cloud persists
    (droplets, once nucleated, keep their aerosol).  Where the cloud has
    evaporated, the entire cloud-borne load resuspends to the interstitial
    phase.  Per-(bin, species) totals are conserved to machine precision;
    decomposition-invariant (cell-local).
    """
    if not _cw_keys(chem):
        return chem
    from wrfchem_arc_interactions_tpu.physics.mixactivate import (
        activate_fractions,
    )
    out = dict(chem)
    _, _, fracs = activate_fractions(chem, t_air, p_air, rho_air, w_up, nbin)
    in_cloud = qc > QC_CLOUD
    species = tuple(mbins.AER_SPECIES) + ("num",)
    for b in range(1, nbin + 1):
        frac = fracs[b - 1]
        for s in species:
            ki = f"chem_{s}_a{b:02d}"
            kc = f"chem_{s}_cw{b:02d}"
            tot = chem[ki] + chem[kc]
            cw_new = jnp.where(in_cloud,
                               jnp.maximum(chem[kc], frac * tot), 0.0)
            out[kc] = cw_new
            out[ki] = tot - cw_new
    return out


def cloud_chemistry(chem: Dict[str, jax.Array], qc, t_air, nbin: int,
                    dt: float) -> Dict[str, jax.Array]:
    """Bulk aqueous S(IV) -> S(VI) with pH-dependent H2O2 AND O3 pathways
    (canonical: module_cmu_bulkaqchem.F; rate constants per Seinfeld &
    Pandis ch. 7).

    - cloud-water pH from the strong-acid balance of the activated aerosol:
      [H+] = max(2[SO4] + [NO3] - [NH4] in cloud water, 1e-7 M);
    - S(IV) speciation from Henry + first/second dissociation:
      H_eff = H_SO2 (1 + K1/[H+] + K1 K2/[H+]^2);
    - H2O2 path k = 7.45e7 [H+]/(1+13[H+]) [HSO3-][H2O2(aq)] — nearly
      pH-independent; O3 path (k1 [HSO3-] + k2 [SO3--])[O3(aq)] — shuts
      off below pH ~4.5 (the self-limiting acidification feedback).
    Consumes so2 + h2o2/o3; produces so4 in the activated (largest) bin.
    """
    out = dict(chem)
    if "chem_so2" not in chem:      # aerosol-only package: no S(IV) gases
        return out
    lwc = jnp.clip(qc * 1.2, 0.0, None)          # kg water / m3 air (~rho=1.2)
    in_cloud = qc > 1e-6
    lwc_l = jnp.maximum(lwc * 1e-3, 1e-9)        # m3 water / m3 air

    # --- pH from activated-aerosol strong acids dissolved in cloud water.
    # With the cloud-borne phase live (cldchem_onoff -> _cw tracers), the
    # acids actually inside the droplets are the summed _cw composition
    # (canonical: module_mosaic_cloudchem.F builds droplet chemistry from
    # the cloud-borne species); without it, fall back to the round-2
    # activated-largest-bin proxy.
    def _aq_molar(key, mw):
        ug_m3 = chem.get(key, jnp.zeros_like(qc)) * 1.2   # ug/m3 air
        return ug_m3 * 1e-6 / mw / (lwc_l * 1e3)          # mol/L water

    has_cw = _cw_keys(chem)
    if has_cw:
        def _aq_sum(spec):
            tot = jnp.zeros_like(qc)
            for b in range(1, nbin + 1):
                tot = tot + _aq_molar(f"chem_{spec}_cw{b:02d}",
                                      mbins.MW[spec])
            return tot
        so4_aq, no3_aq, nh4_aq = _aq_sum("so4"), _aq_sum("no3"), _aq_sum("nh4")
    else:
        b_act = nbin
        so4_aq = _aq_molar(f"chem_so4_a{b_act:02d}", mbins.MW["so4"])
        no3_aq = _aq_molar(f"chem_no3_a{b_act:02d}", mbins.MW["no3"])
        nh4_aq = _aq_molar(f"chem_nh4_a{b_act:02d}", mbins.MW["nh4"])
    h_plus = jnp.clip(2.0 * so4_aq + no3_aq - nh4_aq, 1e-7, 1e-3)

    # --- S(IV) speciation (partial pressures in atm: ppmv * 1e-6).
    # Oxidants not carried by the active package (aerosol-only MOSAIC has
    # no O3/H2O2 tracers) contribute zero — the corresponding pathway
    # simply shuts off.
    zeros = jnp.zeros_like(qc)
    p_so2 = chem["chem_so2"] * 1e-6
    hso3 = H_SO2 * K1_SO2 / h_plus * p_so2               # [HSO3-] M
    so3 = hso3 * K2_SO2 / h_plus                          # [SO3--] M
    h2o2_aq = H_H2O2 * chem.get("chem_h2o2", zeros) * 1e-6
    o3_aq = H_O3 * chem.get("chem_o3", zeros) * 1e-6

    k_h2o2 = 7.45e7 * h_plus / (1.0 + 13.0 * h_plus)     # M-1 s-1
    r_h2o2 = k_h2o2 * h2o2_aq * hso3                     # M/s in cloud water
    r_o3 = (3.7e5 * hso3 + 1.5e9 * so3) * o3_aq

    # aqueous M/s -> ppmv/s of gas-phase S converted: * lwc_l * 1e3 (mol/m3
    # air) -> / (air mol/m3 ~ 40) * 1e6 ppmv
    to_ppmv = lwc_l * 1e3 / 40.0 * 1e6
    d_h2o2 = jnp.where(in_cloud, r_h2o2 * to_ppmv * dt, 0.0)
    d_o3 = jnp.where(in_cloud, r_o3 * to_ppmv * dt, 0.0)
    # limit by available reagents
    d_h2o2 = jnp.minimum(d_h2o2, jnp.minimum(chem["chem_so2"],
                                             chem.get("chem_h2o2", zeros)))
    d_o3 = jnp.minimum(d_o3, jnp.minimum(chem["chem_so2"] - d_h2o2,
                                         chem.get("chem_o3", zeros)))
    d_o3 = jnp.maximum(d_o3, 0.0)

    out["chem_so2"] = chem["chem_so2"] - d_h2o2 - d_o3
    if "chem_h2o2" in chem:
        out["chem_h2o2"] = chem["chem_h2o2"] - d_h2o2
    if "chem_o3" in chem:
        out["chem_o3"] = chem["chem_o3"] - d_o3
    dso4 = ppmv_to_ugkg(d_h2o2 + d_o3, mbins.MW["so4"])
    if has_cw:
        # sulfate produced in the droplets deposits into the CLOUD-BORNE
        # distribution, split across bins by droplet (cloud-borne) number
        # — evaporation later resuspends it into the interstitial bins,
        # the aqueous pathway's particle-growth signature (canonical:
        # module_mosaic_cloudchem.F sulfate partitioning by droplet number)
        nums = [chem[f"chem_num_cw{b:02d}"] for b in range(1, nbin + 1)]
        tot_n = sum(nums)
        safe = jnp.maximum(tot_n, 1e-10)
        for b, n_b in zip(range(1, nbin + 1), nums):
            w_b = jnp.where(tot_n > 1e-10, n_b / safe,
                            1.0 if b == nbin else 0.0)
            key = f"chem_so4_cw{b:02d}"
            out[key] = chem[key] + dso4 * w_b
    else:
        key = f"chem_so4_a{b_act:02d}"
        out[key] = chem[key] + dso4
    return out


def apply_emissions(chem: Dict[str, jax.Array], emis: Dict[str, jax.Array],
                    rho0, dz0, dt: float,
                    plume_w=None, rho=None, dz=None) -> Dict[str, jax.Array]:
    """Inject emission fluxes. emis values:
    gases [ppmv/s*m simplified], aerosol [ug/m2/s]; divided by the layer
    air mass rho0*dz0.

    Keys prefixed ``elev_`` are ELEVATED buoyant sources (fire/stack aux
    streams): they are distributed over levels with the ``plume_w``
    injection profile from plume_rise_profile (requires rho, dz 3D)."""
    out = dict(chem)
    for name, flux in emis.items():
        elevated = name.startswith("elev_")
        base = name[5:] if elevated else name
        key = base if base.startswith("chem_") else f"chem_{base}"
        if key not in chem:
            continue
        if elevated and plume_w is not None:
            d = plume_w * flux[None] * dt / jnp.maximum(rho * dz, 1e-3)
            out[key] = out[key] + d
        else:
            d = flux * dt / jnp.maximum(rho0 * dz0, 1e-3)
            out[key] = out[key].at[0].add(d)
    return out
