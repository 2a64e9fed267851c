"""WSM6 single-moment 6-class microphysics (canonical:
phys/module_mp_wsm6.F, mp_physics=6; SURVEY.md §2.2 'also WSM6, Thompson,
Kessler' under 'Microphysics driver + schemes').

Mass mixing ratios only (qv, qc, qr, qi, qs, qg); size distributions are
inverse-exponential with the WSM6 intercepts (N0r fixed, N0s
temperature-dependent per Houze et al., N0g fixed), so every process rate
closes in the slope parameter lambda = (pi rho_x N0 / (rho q))^(1/4).

Process set, in the reference's operator order: ice nucleation (Fletcher)
with vapor deposition, warm-rain autoconversion (Tripoli & Cotton 1980,
the WSM6 form) + accretion, snow/graupel riming of cloud water, ice->snow autoconversion,
melting above 0C, rain evaporation, saturation adjustment, and
CFL-substepped upwind sedimentation per precipitating class.  Relative to
the reference this round omits: graupel wet growth/shedding, rain freezing
to graupel, and snow/graupel sublimation (documented simplifications).

Everything is fused elementwise VPU work over (z, y, x) plus short
sedimentation passes — embarrassingly column-parallel (SURVEY.md §2.5), no
halos.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.dycore.diagnostics import Diag
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import (
    _qvs, saturation_adjust,
)
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

T0C = 273.15
# intercepts [m-4] and bulk densities [kg m-3]
N0R = 8.0e6
N0G = 4.0e6
N0S_BASE = 2.0e6            # N0s = N0S_BASE * exp(0.12 (T0C - T)), capped
RHO_R, RHO_S, RHO_G, RHO_I = 1000.0, 100.0, 500.0, 500.0
# fall-speed power laws V = a D^b (WSM6 values)
AV_R, BV_R = 841.99667, 0.8
AV_S, BV_S = 11.72, 0.41
AV_G, BV_G = 330.0, 0.8
# autoconversion (Tripoli & Cotton 1980, the WSM6 warm-rain form):
# praut = qck1 * qc^(7/3) above qc0, with qc0 = 4/3 pi rho_w r0^3 Ncr / rho
XNCR = 3.0e8                # cloud droplet number [m-3]
R0_AUTO = 8.0e-6            # critical mean droplet radius [m]
PEAUT = 0.55                # collection efficiency
XMYU = 1.718e-5             # dynamic viscosity [kg m-1 s-1]
QI0 = 8.0e-5                # ice->snow threshold


def _g(x):
    from math import gamma
    return gamma(x)


def _lam(q, rho, rho_x, n0):
    """Marshall-Palmer slope; q [kg/kg] -> lambda [1/m], clipped as in WSM6."""
    lam = (np.pi * rho_x * n0 / (rho * jnp.maximum(q, 1e-15))) ** 0.25
    return jnp.clip(lam, 1e2, 1e6)


def _vt_mass(q, rho, rho_x, n0, a, b):
    """Mass-weighted terminal velocity of an inverse-exponential spectrum."""
    lam = _lam(q, rho, rho_x, n0)
    rho_fac = jnp.sqrt(1.2 / jnp.maximum(rho, 0.1))
    return jnp.minimum(a * _g(4.0 + b) / 6.0 / lam ** b * rho_fac, 25.0)


def _sediment(q, vt_fn, rho, dz, dt, nfall):
    dtf = dt / nfall
    sfc = jnp.zeros_like(q[0])
    for _ in range(nfall):
        flux = rho * vt_fn(q) * q
        inflow = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
        q = jnp.maximum(q + dtf * (inflow - flux) / (rho * dz), 0.0)
        sfc = sfc + dtf * flux[0]
    return q, sfc


def wsm6(state: State, diag: Diag, grid: Grid, cfg, dt: float) -> State:
    theta = diag.theta
    p = diag.p_full
    pii = (p / c.P0) ** c.RCP
    t_air = theta * pii
    rho = 1.0 / (diag.alpha_d * diag.eps_ratio)
    ph_full = grid.phb + state["ph"]
    dz = (ph_full[1:] - ph_full[:-1]) / c.G

    qv, qc, qr = state["qv"], state["qc"], state["qr"]
    qi, qs, qg = state["qi"], state["qs"], state["qg"]

    cold = t_air < T0C
    n0s = jnp.minimum(N0S_BASE * jnp.exp(0.12 * (T0C - t_air)), 1e11)

    # --- 1. ice nucleation + vapor deposition on ice (cold only) --------
    esi = 611.2 * jnp.exp(21.87 * (t_air - T0C) / (t_air - 7.66))
    qvsi = c.EP_2 * esi / jnp.maximum(p - esi, 1.0)
    n_i = jnp.minimum(1.0e-2 * jnp.exp(0.6 * (T0C - t_air)), 1.0e6)  # Fletcher [1/L]->[1/m3]*1e3
    n_i = n_i * 1.0e3 / rho                                           # [#/kg]
    init_ice = jnp.where(cold & (qv > qvsi),
                         jnp.minimum(1e-12 * n_i, jnp.maximum(qv - qvsi, 0.0)), 0.0)
    qi = qi + init_ice
    qv = qv - init_ice
    # deposition/sublimation: relax toward ice saturation over the ice field
    dep_cap = qv - qvsi
    mi = jnp.maximum(qi, 1e-15) / jnp.maximum(n_i, 1.0)              # mean ice mass
    di = jnp.minimum((mi / (np.pi / 6.0 * RHO_I)) ** (1.0 / 3.0), 500e-6)
    dep = jnp.where(cold, 4.0 * 2.2e-5 * di * n_i * rho * dep_cap
                    / jnp.maximum(qvsi, 1e-8), 0.0)
    d_dep = jnp.clip(dep * dt, -qi, jnp.maximum(dep_cap, 0.0))
    qi = qi + d_dep
    qv = qv - d_dep
    theta = theta + (c.XLS / (c.CP * pii)) * (d_dep + init_ice)
    t_air = theta * pii

    # --- 2. warm rain: autoconversion + accretion ------------------------
    # Tripoli-Cotton: rate ~ qc^(7/3) once the mean droplet exceeds r0
    qc0 = (4.0 / 3.0) * np.pi * RHO_R * R0_AUTO ** 3 * XNCR / rho
    qck1 = (0.104 * c.G * PEAUT / (XNCR * RHO_R) ** (1.0 / 3.0) / XMYU
            * rho ** (4.0 / 3.0))
    auto = jnp.where(qc > qc0, qck1 * jnp.maximum(qc, 0.0) ** (7.0 / 3.0), 0.0)
    lam_r = _lam(qr, rho, RHO_R, N0R)
    # rain sweeps cloud: Pracw = pi/4 a_r N0r Gamma(3+b) qc / lam^(3+b)
    pracw = (np.pi / 4.0) * AV_R * N0R * _g(3.0 + BV_R) * qc / lam_r ** (3.0 + BV_R)
    d_auto = jnp.minimum(auto * dt, qc)
    d_accr = jnp.minimum(pracw * dt, qc - d_auto)
    qc = qc - d_auto - d_accr
    qr = qr + d_auto + d_accr

    # --- 3. riming + ice->snow autoconversion ---------------------------
    lam_s = _lam(qs, rho, RHO_S, n0s)
    psacw = (np.pi / 4.0) * AV_S * n0s * _g(3.0 + BV_S) * qc / lam_s ** (3.0 + BV_S)
    lam_g = _lam(qg, rho, RHO_G, N0G)
    pgacw = (np.pi / 4.0) * AV_G * N0G * _g(3.0 + BV_G) * qc / lam_g ** (3.0 + BV_G)
    d_sacw = jnp.minimum(psacw * dt, qc)
    d_gacw = jnp.minimum(pgacw * dt, qc - d_sacw)
    # cold: rimed cloud water freezes onto snow/graupel (latent heat of
    # fusion); warm: collected cloud water sheds to rain
    qs = qs + jnp.where(cold, d_sacw, 0.0)
    qg = qg + jnp.where(cold, d_gacw, 0.0)
    qr = qr + jnp.where(~cold, d_sacw + d_gacw, 0.0)
    qc = qc - d_sacw - d_gacw
    theta = theta + jnp.where(cold, (c.XLF / (c.CP * pii)) * (d_sacw + d_gacw), 0.0)
    # ice -> snow above threshold; heavy riming converts snow -> graupel
    d_saut = jnp.minimum(jnp.maximum(qi - QI0, 0.0) * (1.0 - jnp.exp(-1e-3 * dt)), qi)
    qs = qs + d_saut
    qi = qi - d_saut
    d_gaut = jnp.where(d_sacw > 2.0 * (d_saut + 1e-12),
                       jnp.minimum(0.5 * d_sacw, qs), 0.0)
    qg = qg + d_gaut
    qs = qs - d_gaut

    # --- 4. melting above 0C ---------------------------------------------
    t_air = theta * pii
    warm = t_air > T0C
    melt_fac = jnp.where(warm, jnp.minimum((t_air - T0C) * 0.05 * dt, 1.0), 0.0)
    dm = (qs + qg + qi) * melt_fac
    qr = qr + dm
    qs = qs * (1.0 - melt_fac)
    qg = qg * (1.0 - melt_fac)
    qi = qi * (1.0 - melt_fac)
    theta = theta - (c.XLF / (c.CP * pii)) * dm

    # --- 5. rain evaporation ----------------------------------------------
    t_air = theta * pii
    qvs = _qvs(p, t_air)
    deficit = jnp.maximum(qvs - qv, 0.0)
    lam_r = _lam(qr, rho, RHO_R, N0R)
    vent = 0.78 + 0.31 * jnp.sqrt(rho * AV_R / 1.8e-5) * _g(2.5 + BV_R / 2.0) \
        / lam_r ** (0.5 + BV_R / 2.0)
    prevp = 2.0 * np.pi * N0R * vent / lam_r ** 2 * 2.2e-5 \
        * deficit / jnp.maximum(qvs, 1e-8)
    d_ev = jnp.minimum(jnp.minimum(prevp * dt, qr), deficit)
    qr = qr - d_ev
    qv = qv + d_ev
    theta = theta - (c.XLV / (c.CP * pii)) * d_ev

    # --- 6. saturation adjustment (cloud water) ---------------------------
    theta, qv, qc = saturation_adjust(theta, qv, qc, p, pii)

    # --- 7. sedimentation --------------------------------------------------
    nfall = max(1, int(-(-dt * 25.0 // 150.0)))
    qr, acc_r = _sediment(qr, lambda q: _vt_mass(q, rho, RHO_R, N0R, AV_R, BV_R),
                          rho, dz, dt, nfall)
    qs, acc_s = _sediment(qs, lambda q: _vt_mass(q, rho, RHO_S, n0s, AV_S, BV_S),
                          rho, dz, dt, nfall)
    qg, acc_g = _sediment(qg, lambda q: _vt_mass(q, rho, RHO_G, N0G, AV_G, BV_G),
                          rho, dz, dt, nfall)

    out = dict(state)
    out["t"] = theta - c.T0
    floor = lambda a: jnp.maximum(a, 0.0)
    out.update({"qv": floor(qv), "qc": floor(qc), "qr": floor(qr),
                "qi": floor(qi), "qs": floor(qs), "qg": floor(qg)})
    out["rainnc"] = state["rainnc"] + acc_r + acc_s + acc_g
    return out
