"""Kessler warm-rain microphysics (canonical: phys/module_mp_kessler.F;
SURVEY.md §2.2 'Microphysics driver + schemes', mp_physics=1).

Column-local (embarrassingly parallel over (ny, nx); SURVEY.md §2.5): the
whole scheme is fused elementwise VPU work plus one short sedimentation
scan over z. Processes, in the reference's operator order:

1. rain sedimentation (upwind flux, sub-stepped for fall-speed CFL),
2. autoconversion qc -> qr and accretion of qc by qr,
3. rain evaporation in subsaturated air,
4. saturation adjustment qv <-> qc with latent heating.

State update is operator-split after the dynamics step (solve_em calls the
microphysics driver after the RK loop; SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.dycore.diagnostics import Diag
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

# Kessler constants (reference values)
K1_AUTO = 1.0e-3       # autoconversion rate [s-1]
QC0_AUTO = 1.0e-3      # autoconversion threshold [kg/kg]
K2_ACCR = 2.2          # accretion rate coefficient
RHO0_REF = 1.0         # reference density for fall speed [kg m-3]


def _qvs(p, t):
    """Saturation mixing ratio over liquid (Bolton/Teten)."""
    es = 611.2 * jnp.exp(c.SVP2 * (t - c.SVPT0) / (t - c.SVP3))
    es = jnp.minimum(es, 0.99 * p)
    return c.EP_2 * es / (p - es)


def saturation_adjust(theta, qv, qc, p, pii, max_iter: int = 3):
    """Condense/evaporate to saturation with latent heating.

    theta: potential temperature; pii: Exner function (p/p0)^(R/cp).
    Returns (theta, qv, qc).
    """
    for _ in range(max_iter):
        t = theta * pii
        qvs = _qvs(p, t)
        # linearised adjustment (Newton step on qv - qvs(T))
        dqsdt = qvs * c.SVP2 * (c.SVPT0 - c.SVP3) / (t - c.SVP3) ** 2
        gamma = c.XLV / (c.CP * pii)
        excess = (qv - qvs) / (1.0 + gamma * pii * dqsdt)
        cond = jnp.clip(excess, -qc, None)       # cannot evaporate more than qc
        theta = theta + gamma * cond
        qv = qv - cond
        qc = qc + cond
    return theta, qv, qc


def rain_fall_speed(qr, rho):
    """Marshall-Palmer terminal velocity [m/s] (Kessler/Wisner form)."""
    qr_rho = jnp.maximum(qr, 0.0) * rho
    return 36.34 * qr_rho ** 0.1364 * jnp.sqrt(RHO0_REF / rho)


def _sedimentation(qr, rho, dz8w, dt, nfall: int):
    """Sub-stepped upwind sedimentation; returns (qr_new, surface_rain_mm)."""
    dtf = dt / nfall
    rain = jnp.zeros_like(qr[0])
    for _ in range(nfall):
        vt = rain_fall_speed(qr, rho)
        flux = rho * vt * qr                       # [kg m-2 s-1] downward
        # flux through cell bottoms; inflow from the cell above
        inflow = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
        dq = dtf * (inflow - flux) / (rho * dz8w)
        rain = rain + dtf * flux[0]                # surface flux [kg m-2]
        qr = jnp.maximum(qr + dq, 0.0)
    return qr, rain                                # rain in kg m-2 == mm


def kessler(state: State, diag: Diag, grid: Grid, dt: float) -> State:
    theta = diag.theta
    qv = state["qv"]
    qc = state["qc"]
    qr = state["qr"]
    p = diag.p_full
    pii = (p / c.P0) ** c.RCP
    t_air = theta * pii
    rho = 1.0 / (diag.alpha_d * diag.eps_ratio)    # moist density
    # layer geometric thickness from the geopotential
    ph_full = grid.phb + state["ph"]
    dz8w = (ph_full[1:] - ph_full[:-1]) / c.G

    # --- sedimentation (CFL-substepped with a static bound: vt <= ~15 m/s,
    # assuming layers >= 150 m; the substep count must be static under jit)
    nfall = max(1, int(-(-dt * 15.0 // 150.0)))
    qr, rain = _sedimentation(qr, rho, dz8w, dt, nfall)

    # --- autoconversion + accretion (semi-implicit like the reference)
    auto = jnp.maximum(K1_AUTO * (qc - QC0_AUTO), 0.0)
    accr = jnp.maximum(K2_ACCR * qc * jnp.maximum(qr, 0.0) ** 0.875, 0.0)
    dqr = jnp.minimum((auto + accr) * dt, qc)      # cannot exceed available qc
    qc = qc - dqr
    qr = qr + dqr

    # --- rain evaporation (ventilated, capped by subsaturation deficit)
    qvs = _qvs(p, t_air)
    deficit = jnp.maximum(qvs - qv, 0.0)
    qr_rho = jnp.maximum(qr, 0.0) * rho
    vent = 1.6 + 124.9 * qr_rho ** 0.2046
    evap_rate = (vent * qr_rho ** 0.525
                 / (2.55e8 / (p * qvs) + 5.4e5)) * (deficit / (rho * qvs + 1e-12))
    evap = jnp.minimum(jnp.minimum(evap_rate * dt, qr), deficit)
    qr = qr - evap
    qv = qv + evap
    theta = theta - (c.XLV / (c.CP * pii)) * evap

    # --- saturation adjustment
    theta, qv, qc = saturation_adjust(theta, qv, qc, p, pii)

    out = dict(state)
    out["t"] = theta - c.T0
    out["qv"] = jnp.maximum(qv, 0.0)
    out["qc"] = jnp.maximum(qc, 0.0)
    out["qr"] = jnp.maximum(qr, 0.0)
    out["rainnc"] = state["rainnc"] + rain
    return out
