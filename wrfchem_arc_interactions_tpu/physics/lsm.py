"""Noah-class land-surface model: 4-layer soil temperature/moisture with a
canopy-resistance evaporation (canonical: phys/module_sf_noahdrv.F +
module_sf_noahlsm.F behind sf_surface_physics=2; SURVEY.md §2.2 'Surface
layer + LSM', VERDICT r1 missing item 8).

Per column (fully elementwise over (ny, nx); the 4 soil layers unroll):

1. Surface energy balance on the skin: Rn = (1-alpha)SW + eps(LWd - sig
   Tsk^4), partitioned into H (given by the surface layer), LE (below),
   and ground heat flux G = k_soil (Tsk - Tsoil1)/(0.5 dz1); Tsk relaxes
   with a thin-skin heat capacity (linearised sigma-T^4 for stability).
2. Soil heat diffusion through the Noah layer thicknesses (0.1/0.3/0.6/1.0
   m), implicit 4x4 tridiagonal solved by unrolled Thomas; bottom boundary
   anchored at the deep soil temperature tmn.
3. Evaporation: potential rate from the surface layer's exchange
   coefficient, limited by soil moisture through the beta-method
   (sm - smwlt)/(smfc - smwlt) on layer 1 plus a canopy resistance
   rc = RC_MIN / (LAI * f_sm) in series with the aerodynamic resistance —
   the Noah veg/bare-soil split in bulk form.
4. Bucket hydrology: precipitation infiltrates layer 1 (runoff above
   saturation), evaporation draws from layer 1, inter-layer Richards-like
   diffusion/drainage with constant diffusivity, gravitational drainage
   from the bottom layer.

Simplifications vs the reference, documented: single land-use/soil
category (loam-like constants), no snowpack, no canopy interception store.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.utils import constants as c

DZ_SOIL = (0.1, 0.3, 0.6, 1.0)   # Noah layer thicknesses [m]
SM_SAT = 0.45                    # porosity [m3/m3] (loam)
SM_FC = 0.33                     # field capacity
SM_WLT = 0.10                    # wilting point
K_SOIL_DRY = 0.25                # dry thermal conductivity [W/m/K]
K_SOIL_WET = 1.6
C_SOIL = 2.2e6                   # volumetric heat capacity [J/m3/K]
D_SM = 2.0e-7                    # soil moisture diffusivity [m2/s]
K_DRAIN = 3.0e-8                 # gravitational drainage [m/s] at saturation
RC_MIN = 70.0                    # minimum canopy resistance [s/m]
LAI = 2.0
ALBEDO = 0.2
EMISS = 0.98
C_SKIN = 2.0e4                   # skin heat capacity [J/m2/K]


def _k_soil(sm):
    w = jnp.clip((sm - SM_WLT) / (SM_SAT - SM_WLT), 0.0, 1.0)
    return K_SOIL_DRY + (K_SOIL_WET - K_SOIL_DRY) * w


def soil_beta(sm1):
    """Moisture-availability factor from layer-1 soil moisture."""
    return jnp.clip((sm1 - SM_WLT) / (SM_FC - SM_WLT), 0.02, 1.0)


def noah_step(state: Dict[str, jax.Array], hfx, qfx_pot, ra, rho0,
              precip_rate, swdown, glw, dt: float) -> Dict[str, jax.Array]:
    """Advance (tsk, tslb, smois). qfx_pot: potential evaporation
    [kg/m2/s] at beta=1 without canopy resistance; ra: aerodynamic
    resistance [s/m].  Returns updated state dict entries + 'qfx_eff'."""
    tslb = state["tslb"]                          # (4, ny, nx)
    smois = state["smois"]
    tsk = state["tsk"]
    tmn = state.get("tmn", tslb[-1])

    # ---- 3. actual evaporation --------------------------------------------
    beta = soil_beta(smois[0])
    f_sm = soil_beta(0.5 * (smois[0] + smois[1]))
    rc = RC_MIN / (LAI * f_sm)
    qfx = qfx_pot * beta * ra / (ra + rc)
    lh = c.XLV * qfx

    # ---- 1. skin energy balance (linearised emission) ----------------------
    rn = (1.0 - ALBEDO) * swdown + EMISS * (glw - c.STBOLT * tsk ** 4)
    k1 = _k_soil(smois[0])
    g_flux = k1 * (tsk - tslb[0]) / (0.5 * DZ_SOIL[0])
    resid = rn - hfx - lh - g_flux
    # implicit-in-emission update: d(resid)/dTsk ~ -4 eps sig T^3 - k/dz
    denom = C_SKIN / dt + 4.0 * EMISS * c.STBOLT * tsk ** 3 \
        + k1 / (0.5 * DZ_SOIL[0])
    tsk_new = tsk + resid / denom

    # ---- 2. soil heat diffusion (4-layer implicit, unrolled Thomas) -------
    kf = [0.5 * (_k_soil(smois[i]) + _k_soil(smois[i + 1])) for i in range(3)]
    dz = DZ_SOIL
    dzw = [0.5 * (dz[i] + dz[i + 1]) for i in range(3)]
    g_top = k1 * (tsk_new - tslb[0]) / (0.5 * dz[0])
    k_bot = _k_soil(smois[3])
    # rows: C_SOIL dz_i dT_i/dt = F_{i-1/2} - F_{i+1/2}
    a = [0.0] * 4
    b = [0.0] * 4
    cc = [0.0] * 4
    d = [tslb[i] for i in range(4)]
    for i in range(4):
        lam = dt / (C_SOIL * dz[i])
        up = kf[i - 1] / dzw[i - 1] if i > 0 else 0.0
        dn = kf[i] / dzw[i] if i < 3 else k_bot / dz[3]
        a[i] = -lam * up
        cc[i] = -lam * dn if i < 3 else 0.0
        b[i] = 1.0 + lam * (up + dn)
        if i == 0:
            d[i] = d[i] + dt * g_top / (C_SOIL * dz[0])
        if i == 3:
            d[i] = d[i] + lam * (k_bot / dz[3]) * tmn
    # unrolled Thomas over 4 rows
    cp = [None] * 4
    dp = [None] * 4
    cp[0] = cc[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, 4):
        m = b[i] - a[i] * cp[i - 1]
        cp[i] = cc[i] / m if i < 3 else 0.0
        dp[i] = (d[i] - a[i] * dp[i - 1]) / m
    t_new = [None] * 4
    t_new[3] = dp[3]
    for i in range(2, -1, -1):
        t_new[i] = dp[i] - cp[i] * t_new[i + 1]
    tslb_new = jnp.stack(t_new)

    # ---- 4. bucket hydrology ----------------------------------------------
    sm = [smois[i] for i in range(4)]
    # infiltration + evaporation on layer 1 [m3/m3 per layer depth]
    infil = precip_rate * 1e-3 / dz[0]            # mm/s -> m/s / dz
    sm[0] = sm[0] + dt * (infil - qfx / (1000.0 * dz[0]))
    # inter-layer diffusion + drainage
    for i in range(3):
        grad = (sm[i] - sm[i + 1]) / dzw[i]
        flux = D_SM * grad + K_DRAIN * jnp.clip(sm[i] / SM_SAT, 0.0, 1.0) ** 3
        sm[i] = sm[i] - dt * flux / dz[i]
        sm[i + 1] = sm[i + 1] + dt * flux / dz[i + 1]
    drain = K_DRAIN * jnp.clip(sm[3] / SM_SAT, 0.0, 1.0) ** 3
    sm[3] = sm[3] - dt * drain / dz[3]
    smois_new = jnp.stack([jnp.clip(s, 0.02, SM_SAT) for s in sm])

    return {"tsk": tsk_new, "tslb": tslb_new, "smois": smois_new,
            "qfx_eff": qfx}
