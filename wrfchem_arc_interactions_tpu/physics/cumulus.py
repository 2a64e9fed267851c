"""Cumulus parameterization — Betts-Miller-Janjic-style deep convective
adjustment (canonical: phys/module_cu_bmj.F behind cumulus_driver in
phys/module_cumulus_driver.F, cu_physics=2; SURVEY.md §2.2 'Cumulus').

The reference offers KF/BMJ/Grell; this round implements the adjustment
family (BMJ), whose fixed-point structure maps cleanly onto TPU (pure
elementwise + cumulative ops along z, no data-dependent iteration):

1. Mixed-layer parcel from the lowest ~60 hPa; LCL from Bolton (1980).
2. Moist-adiabat reference temperature above the LCL by conservation of
   equivalent potential temperature (fixed-count Newton solve of
   theta_e(T_ref, p) = theta_e_parcel — branchless, 5 iterations).
3. Cloud layer = contiguous buoyant levels from the LFC up (a CIN layer
   between LCL and LFC is skipped, as in the reference's upward search);
   deep trigger: depth > 2 km.
4. Reference humidity profile = sub-saturated moist adiabat (RH ramping
   0.95 -> 0.75 cloud base -> top, the BMJ shape), then swept toward
   drier profiles in fixed-count branchless form until the column dries
   — the analog of the reference's DSP/entropy-sweep loop that enforces
   positive precipitation before accepting deep convection.
5. Enthalpy-conserving shift of T_ref (the BMJ "first guess correction"),
   then relax T, qv toward the reference over tau = 2400 s.  Columns whose
   adjustment would still moisten after the sweep are deactivated, as
   in the reference's swap/deactivation logic.

The mass-flux schemes (KF, Grell-3) remain on the roadmap (PARITY.md).
Column-local: no halos (SURVEY.md §2.5 'Embarrassing column parallelism').
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import _qvs
from wrfchem_arc_interactions_tpu.utils import constants as c

TAU_ADJ = 2400.0        # BMJ relaxation timescale [s]
DEPTH_MIN = 2000.0      # minimum cloud depth for deep convection [m]
ML_DEPTH = 6000.0       # mixed-layer source depth [Pa]
DT_BUOY = 1.0           # buoyancy trigger margin [K]


def _theta_e(t, p, qv):
    """Equivalent potential temperature (Bolton-like, saturated form used
    along the reference moist adiabat where qv = qvs)."""
    return (t * (c.P0 / p) ** c.RCP
            * jnp.exp(c.XLV * qv / (c.CP * jnp.maximum(t, 200.0))))


def _moist_adiabat_t(theta_e_parcel, p, t_guess, n_iter: int = 5):
    """Invert theta_e(T, p) with qv = qvs(T, p) for T (fixed Newton count)."""
    t = t_guess
    for _ in range(n_iter):
        qvs = _qvs(p, t)
        f = _theta_e(t, p, qvs) - theta_e_parcel
        dt = 0.5
        fp = (_theta_e(t + dt, p, _qvs(p, t + dt)) - _theta_e(t, p, qvs)) / dt
        t = t - f / jnp.maximum(fp, 1e-3)
        t = jnp.clip(t, 150.0, 350.0)
    return t


def bmj_adjust(theta: jax.Array, qv: jax.Array, p: jax.Array,
               rho: jax.Array, dz: jax.Array,
               dt: float) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Convective adjustment tendencies.

    All inputs (nz, ny, nx), k=0 at the surface. Returns
    ({"th": dtheta/dt, "qv": dqv/dt}, precip_rate [mm/s at the surface]).
    """
    pii = (p / c.P0) ** c.RCP
    t_air = theta * pii

    # ---- 1. mixed-layer source parcel --------------------------------
    p_sfc = p[0:1]
    in_ml = (p_sfc - p) < ML_DEPTH
    wgt = jnp.where(in_ml, 1.0, 0.0)
    wsum = jnp.maximum(jnp.sum(wgt, axis=0), 1.0)
    th_ml = jnp.sum(theta * wgt, axis=0) / wsum
    qv_ml = jnp.sum(qv * wgt, axis=0) / wsum
    t_ml = th_ml * pii[0]
    # Bolton LCL temperature from the parcel vapor pressure
    e_ml = jnp.maximum(p[0] * qv_ml / (c.EP_2 + qv_ml), 1.0)
    t_lcl = 2840.0 / (3.5 * jnp.log(t_ml) - jnp.log(e_ml / 100.0) - 4.805) + 55.0
    t_lcl = jnp.minimum(t_lcl, t_ml)
    p_lcl = p[0] * (t_lcl / t_ml) ** (c.CP / c.R_D)

    # ---- 2. reference moist adiabat above the LCL ---------------------
    theta_e_p = _theta_e(t_lcl, p_lcl, _qvs(p_lcl, t_lcl))
    t_ref = _moist_adiabat_t(theta_e_p[None], p, t_air)

    # ---- 3. cloud layer (contiguous buoyant levels above the LFC) ------
    above_base = p <= p_lcl[None]
    buoyant = t_ref >= t_air - DT_BUOY
    # the LFC is the first buoyant level above the LCL: a CIN layer below
    # it must not terminate the search (the reference walks upward past
    # non-buoyant levels until the parcel becomes buoyant)
    above_lfc = jnp.cumsum(jnp.where(above_base & buoyant, 1.0, 0.0),
                           axis=0) > 0.0
    # first non-buoyant level above the LFC terminates the cloud
    stop = above_lfc & (~buoyant)
    blocked = jnp.cumsum(jnp.where(stop, 1.0, 0.0), axis=0) > 0.0
    in_cloud = above_lfc & buoyant & (~blocked)
    depth = jnp.sum(jnp.where(in_cloud, dz, 0.0), axis=0)
    active = depth > DEPTH_MIN                       # (ny, nx)

    # ---- 4. reference profiles ----------------------------------------
    # RH ramp 0.95 (base) -> 0.75 (top) weighted by height inside the cloud
    zc = jnp.cumsum(jnp.where(in_cloud, dz, 0.0), axis=0)
    frac = jnp.where(depth[None] > 0.0, zc / jnp.maximum(depth[None], 1.0), 0.0)
    rh_ref = 0.95 - 0.20 * jnp.clip(frac, 0.0, 1.0)
    q_ref = rh_ref * _qvs(p, t_ref)

    dm = rho * dz                                    # layer mass [kg/m2]
    mask = jnp.where(in_cloud, 1.0, 0.0)

    # ---- 4b. humidity sweep toward drier profiles -----------------------
    # The reference iterates the deficit-saturation-pressure profile drier
    # until the column adjustment produces net drying (positive DENTPY /
    # precipitation), only then accepting deep convection.  Branchless
    # fixed-count equivalent: scale the reference RH down by 0.75 per
    # sweep while the column would still moisten.
    scale = jnp.ones_like(depth)
    for _ in range(8):
        dq_try = jnp.sum(mask * dm * (qv - scale[None] * q_ref), axis=0)
        scale = jnp.where(dq_try <= 0.0, scale * 0.75, scale)
    q_ref = scale[None] * q_ref

    # ---- 5. enthalpy-conserving shift + relaxation ---------------------
    num = jnp.sum(mask * dm * (c.CP * (t_ref - t_air)
                               + c.XLV * (q_ref - qv)), axis=0)
    den = jnp.maximum(jnp.sum(mask * dm * c.CP, axis=0), 1.0)
    t_ref = t_ref - num[None] / den[None]            # BMJ first-guess shift

    # precipitation = column net drying; deactivate moistening columns
    dq_col = jnp.sum(mask * dm * (qv - q_ref), axis=0) / TAU_ADJ  # [kg/m2/s]
    active = active & (dq_col > 0.0)
    act = jnp.where(active, 1.0, 0.0)[None] * mask

    dth = act * (t_ref - t_air) / pii / TAU_ADJ
    dqv = act * (q_ref - qv) / TAU_ADJ
    precip = jnp.where(active, dq_col, 0.0)          # [kg m-2 s-1] == [mm/s]
    return {"th": dth, "qv": dqv}, precip
