"""Mass-flux cumulus parameterization — Kain-Fritsch-style entraining plume
with CAPE-removal closure (canonical: phys/module_cu_kfeta.F behind
cumulus_driver, cu_physics=1; SURVEY.md §2.2 'Cumulus', VERDICT r1
missing item 6 'mass-flux cumulus (KF/Grell)').

Structure (the KF essentials, in fixed-work branchless form):

1. Updraft source layer: the lowest ~60 hPa mixed parcel; LCL via Bolton.
2. Entraining updraft ascent: the parcel's theta_e and total water dilute
   into the environment at a constant fractional entrainment rate eps; the
   in-cloud temperature comes from the same fixed-count theta_e inversion
   the BMJ scheme uses.  Normalised updraft mass flux eta(z) grows with
   net entrainment minus detrainment.
3. Trigger: CAPE > CAPE_MIN and cloud depth > DEPTH_MIN (KF's 3-4 km deep
   threshold), with the LFC search skipping the CIN layer.
4. Closure: the cloud-base mass flux Mb removes the column CAPE over
   TAU_CAPE (KF's 90%-CAPE-removal closure in closed form): tendencies are
   computed for unit Mb, their CAPE tendency is integrated, and
   Mb = CAPE / (TAU_CAPE * |dCAPE/dMb|), capped by the stability bound
   Mb <= rho dz / dt (no more than the source-layer mass per step).
5. Tendencies: compensating subsidence (-Mc dX/dz) + detrainment of cloud
   air at the updraft top layers; precipitation = PE * condensate
   generation, with a fraction evaporated into the subcloud layer (the
   downdraft's moistening role, in bulk form).

Column-local (no halos); everything is fused elementwise + a few z-scans.
Simplifications vs the reference, documented: no explicit downdraft plume
(bulk subcloud evaporation instead), constant entrainment rate rather than
the radius-dependent KF formulation, single updraft per column.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.physics.cumulus import (
    _moist_adiabat_t, _theta_e, ML_DEPTH,
)
from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import _qvs
from wrfchem_arc_interactions_tpu.utils import constants as c

EPS_ENT = 5.0e-5       # fractional entrainment rate [1/m] (KF's value for
                       # a ~1-2 km updraft radius)
DEL_DET = 5.0e-5       # background detrainment below the top [1/m]
TAU_CAPE = 2700.0      # CAPE-removal timescale [s] (KF: 0.5-1 h)
CAPE_MIN = 50.0        # trigger threshold [J/kg]
DEPTH_MIN = 3000.0     # minimum cloud depth [m]
PE_RAIN = 0.9          # precipitation efficiency
EVAP_SUB = 0.3         # fraction of rain evaporated into the subcloud layer


def kf_mass_flux(theta: jax.Array, qv: jax.Array, p: jax.Array,
                 rho: jax.Array, dz: jax.Array, dt: float,
                 eps_ent=EPS_ENT, del_det=DEL_DET, tau_cape=TAU_CAPE,
                 pe_rain=PE_RAIN
                 ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """KF-style tendencies. Inputs (nz, ny, nx), k=0 surface. Returns
    ({"th": dtheta/dt, "qv": dqv/dt}, precip rate [mm/s]).

    The plume parameters are arguments (traced values allowed) so the
    Grell-style ensemble (cumulus_grell.py) can vmap over the member
    space; the defaults are the single-member KF configuration."""
    pii = (p / c.P0) ** c.RCP
    t_air = theta * pii
    nz = theta.shape[0]
    z = jnp.cumsum(dz, axis=0) - 0.5 * dz            # mid-layer heights

    # ---- 1. source parcel ------------------------------------------------
    in_ml = (p[0:1] - p) < ML_DEPTH
    wgt = jnp.where(in_ml, 1.0, 0.0)
    wsum = jnp.maximum(jnp.sum(wgt, axis=0), 1.0)
    th_ml = jnp.sum(theta * wgt, axis=0) / wsum
    qv_ml = jnp.sum(qv * wgt, axis=0) / wsum
    t_ml = th_ml * pii[0]
    e_ml = jnp.maximum(p[0] * qv_ml / (c.EP_2 + qv_ml), 1.0)
    t_lcl = 2840.0 / (3.5 * jnp.log(t_ml) - jnp.log(e_ml / 100.0) - 4.805) + 55.0
    t_lcl = jnp.minimum(t_lcl, t_ml)
    p_lcl = p[0] * (t_lcl / t_ml) ** (c.CP / c.R_D)

    # ---- 2. entraining ascent (scan up) ----------------------------------
    the_env = _theta_e(t_air, p, qv)
    the0 = _theta_e(t_lcl, p_lcl, _qvs(p_lcl, t_lcl))

    def ascend(carry, xs):
        the_u, eta = carry
        the_e, dzk = xs
        f = jnp.clip(eps_ent * dzk, 0.0, 0.5)
        the_u = the_u * (1.0 - f) + the_e * f        # dilution
        eta = eta * (1.0 + f - jnp.clip(del_det * dzk, 0.0, 0.5))
        return (the_u, eta), (the_u, eta)

    (_, _), (the_u, eta) = jax.lax.scan(
        ascend, (the0, jnp.ones_like(the0)), (the_env, dz))

    # in-cloud temperature from theta_e inversion (above the LCL only)
    t_u = _moist_adiabat_t(the_u, p, t_air)
    above_base = p <= p_lcl[None]
    buoy = t_u * (1.0 + 0.61 * _qvs(p, t_u)) - t_air * (1.0 + 0.61 * qv)
    buoyant = buoy > 0.0
    above_lfc = jnp.cumsum(jnp.where(above_base & buoyant, 1.0, 0.0), axis=0) > 0.0
    stop = above_lfc & (~buoyant)
    blocked = jnp.cumsum(jnp.where(stop, 1.0, 0.0), axis=0) > 0.0
    in_cloud = above_lfc & buoyant & (~blocked)
    depth = jnp.sum(jnp.where(in_cloud, dz, 0.0), axis=0)

    # CAPE over the cloud layer
    cape = jnp.sum(jnp.where(in_cloud, c.G * buoy / t_air * dz, 0.0), axis=0)
    active = (cape > CAPE_MIN) & (depth > DEPTH_MIN)

    # ---- 5a. unit-Mb tendencies -------------------------------------------
    # normalized cloud mass flux: eta inside the cloud; mass continuity
    # extends the compensating subsidence through the subcloud/CIN layers
    # (the updraft draws its mass from below cloud base), which is what
    # dries the source layer and closes the column moisture budget
    mask = jnp.where(in_cloud, 1.0, 0.0)
    below_base = ~above_lfc
    eta_c = eta * mask + jnp.where(below_base, 1.0, 0.0)
    # compensating subsidence on theta and qv (upwind d/dz toward surface)
    dth_dz = jnp.concatenate([theta[1:] - theta[:-1],
                              jnp.zeros_like(theta[:1])], axis=0) / dz
    dqv_dz = jnp.concatenate([qv[1:] - qv[:-1],
                              jnp.zeros_like(qv[:1])], axis=0) / dz
    # compensating subsidence WARMS/dries: +Mc/rho dX/dz (environment air
    # descends between updrafts)
    sub_th = eta_c * dth_dz / rho                    # per unit Mb [K m2/kg]
    sub_qv = eta_c * dqv_dz / rho
    # detrainment at the top layer of the cloud: deposit cloud properties
    top_idx = jnp.sum(mask, axis=0, keepdims=True)   # count of cloudy layers
    kidx = jnp.cumsum(mask, axis=0)
    is_top = mask * jnp.where(kidx == top_idx, 1.0, 0.0)
    th_u = t_u / pii
    det_th = is_top * eta_c * (th_u - theta) / (rho * dz)
    qvs_u = _qvs(p, t_u)
    det_qv = is_top * eta_c * (qvs_u - qv) / (rho * dz)

    dth_unit = sub_th + det_th
    dqv_unit = sub_qv + det_qv

    # condensation in the updraft per unit Mb: moisture convergence of the
    # plume = entrained vapor flux minus detrained saturation vapor
    qt_excess = jnp.maximum(qv_ml[None] - qvs_u, 0.0)
    cond_unit = jnp.sum(mask * eta_c * qt_excess * eps_ent * dz
                        + is_top * eta_c * qt_excess, axis=0)

    # ---- 4. CAPE-removal closure ------------------------------------------
    # dCAPE/dMb: warming the ENVIRONMENT reduces the parcel buoyancy
    # integral, so dCAPE = -int g/T dT_env dz over the cloud layer
    dcape_unit = -jnp.sum(mask * c.G / t_air * (dth_unit * pii) * dz, axis=0)
    mb = jnp.where(dcape_unit < -1e-10,
                   cape / (tau_cape * jnp.maximum(-dcape_unit, 1e-10)), 0.0)
    # stability bound: subsidence CFL — at most the layer mass per step
    mb_max = 0.5 * jnp.min(
        jnp.where(mask > 0, rho * dz / jnp.maximum(eta_c, 1e-3), 1e9), axis=0) / dt
    mb = jnp.minimum(mb, mb_max)
    act = jnp.where(active, 1.0, 0.0)
    mb = mb * act

    dth = mb[None] * dth_unit
    dqv = mb[None] * dqv_unit
    rain = pe_rain * mb * cond_unit                   # [kg m-2 s-1]

    # ---- 5b. subcloud evaporation (bulk downdraft role) -------------------
    sub_mask = jnp.where(~above_base, 1.0, 0.0)
    m_sub = jnp.sum(sub_mask * rho * dz, axis=0)
    evap = EVAP_SUB * rain
    dqv = dqv + sub_mask * (evap / jnp.maximum(m_sub, 1.0))[None]
    dth = dth - sub_mask * (c.XLV / c.CP / pii) \
        * (evap / jnp.maximum(m_sub, 1.0))[None]
    rain = rain - evap
    return {"th": dth, "qv": dqv}, jnp.maximum(rain, 0.0)
