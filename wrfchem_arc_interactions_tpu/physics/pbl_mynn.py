"""MYNN-class level-2.5 TKE boundary-layer scheme (canonical:
phys/module_bl_mynn.F, Nakanishi & Niino 2009; SURVEY.md §2.2 'PBL
(YSU, MYNN, MYJ)').

Prognostic QKE = 2*TKE column field; the eddy diffusivities come from the
Mellor-Yamada hierarchy:

    K_m = l q S_m,   K_h = l q S_h,   q = sqrt(QKE)

with the quasi-equilibrium (Galperin et al. 1988) level-2.5 stability
functions SOLVED FROM THE CLOSURE CONSTANTS at trace time (A1, A2, B1,
B2, C1 of NN2009) rather than transcribed as magic numbers:

    S_h [1 - 3 A2 G_h (6 A1 + B2)] = A2 (1 - 6 A1/B1)
    S_m [1 - 9 A1 A2 G_h] - S_h [G_h (18 A1^2 + 9 A1 A2)] =
        A1 (1 - 3 C1 - 6 A1/B1)

with G_h = -(N l / q)^2 clipped to the Galperin realizability band.
The master length is the Blackadar blend 1/l = 1/(kz) + 1/l_bl with the
turbulence-weighted boundary-layer scale l_bl = 0.23 integral(q z)/
integral(q), capped in stable air by 0.76 q/N.

QKE: dQKE/dt = 2(P_s + P_b - eps) + d/dz(K_q dQKE/dz), with shear/buoyancy
production from the SAME K's (energy-consistent), dissipation
eps = q^3/(B1 l) handled implicitly, surface QKE = B1^(2/3) u*^2, and
K_q = 3 l q S_m (the reference's Sq = 3 Sm).

Everything is column-local dense math sharing the batched tridiagonal
(`_implicit_mix`) with the YSU scheme; decomposition-invariant.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.physics.pbl import (
    _implicit_mix, pbl_height, surface_fluxes,
)
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

# NN2009 closure constants
A1, A2 = 1.18, 0.665
B1, B2 = 24.0, 15.0
C1 = 0.137
QKE_MIN = 1e-4
GH_MIN, GH_MAX = -3.5, 0.0228          # Galperin realizability band


def stability_functions(gh):
    """Quasi-equilibrium level-2.5 (S_m, S_h) from G_h."""
    gh = jnp.clip(gh, GH_MIN, GH_MAX)
    sh = A2 * (1.0 - 6.0 * A1 / B1) / (1.0 - 3.0 * A2 * gh * (6.0 * A1 + B2))
    sm = (A1 * (1.0 - 3.0 * C1 - 6.0 * A1 / B1)
          + sh * gh * (18.0 * A1 * A1 + 9.0 * A1 * A2)) \
        / (1.0 - 9.0 * A1 * A2 * gh)
    return jnp.maximum(sm, 1e-4), jnp.maximum(sh, 1e-4)


def mynn_column(state: State, grid: Grid, cfg: Config,
                dt: float) -> Tuple[State, Dict[str, jax.Array]]:
    """Surface fluxes + MYNN level-2.5 mixing; same contract as
    pbl.surface_and_pbl."""
    moist = cfg.moist_species()
    diag = diagnose(state, grid, moist)
    pii = (diag.p_full / c.P0) ** c.RCP
    t_air = diag.theta * pii
    rho = 1.0 / (diag.alpha_d * diag.eps_ratio)
    ph_full = grid.phb + state["ph"]
    z_w = ph_full / c.G
    z_c = 0.5 * (z_w[:-1] + z_w[1:])
    z_agl = z_c - z_w[0]
    dz_c = z_w[1:] - z_w[:-1]
    dz_w = z_c[1:] - z_c[:-1]
    rho_w = 0.5 * (rho[1:] + rho[:-1])

    from wrfchem_arc_interactions_tpu.physics.pbl import soil_moisture_beta
    beta, noah = soil_moisture_beta(state, cfg)
    qv = state.get("qv", jnp.zeros_like(t_air))
    hfx, qfx, ust, cd, ch_wind = surface_fluxes(
        t_air[0], qv[0], diag.p_full[0], rho[0],
        state["u"][0], state["v"][0], z_agl[0], state["tsk"],
        beta_moist=beta)

    thv = diag.theta * (1.0 + c.EP_1 * qv)
    h_pbl, _ = pbl_height(thv, z_agl, ust, hfx, rho[0])

    qke = jnp.maximum(state["qke"], QKE_MIN)
    q = jnp.sqrt(qke)

    # --- master length scale (Blackadar blend) --------------------------
    int_qz = jnp.sum(q * z_agl * dz_c, axis=0)
    int_q = jnp.sum(q * dz_c, axis=0)
    l_bl = 0.23 * int_qz / jnp.maximum(int_q, 1e-6)
    l_bl = jnp.clip(l_bl, 10.0, 3000.0)
    l_s = c.KARMAN * jnp.maximum(z_agl, 1.0)
    l_mix = 1.0 / (1.0 / l_s + 1.0 / l_bl[None])
    # stable limit: l <= 0.76 q / N
    dthv_dz_c = jnp.gradient(thv, axis=0) / jnp.maximum(dz_c, 1.0)
    n2 = c.G / jnp.maximum(thv, 100.0) * dthv_dz_c
    n_bv = jnp.sqrt(jnp.maximum(n2, 1e-10))
    l_mix = jnp.where(n2 > 1e-10,
                      jnp.minimum(l_mix, 0.76 * q / n_bv), l_mix)

    # --- stability functions and diffusivities --------------------------
    # G_h = -N^2 l^2 / q^2: negative (stabilising) for N^2 > 0, positive
    # (convective enhancement) for N^2 < 0, clipped to realizability
    gh = -n2 * (l_mix / jnp.maximum(q, 1e-2)) ** 2
    sm, sh = stability_functions(gh)
    km = l_mix * q * sm
    kh = l_mix * q * sh
    km = jnp.clip(km, 0.1, 2000.0)
    kh = jnp.clip(kh, 0.1, 2000.0)
    km_w = 0.5 * (km[1:] + km[:-1])
    kh_w = 0.5 * (kh[1:] + kh[:-1])

    # --- QKE sources ----------------------------------------------------
    du_dz = jnp.gradient(state["u"], axis=0) / jnp.maximum(dz_c, 1.0)
    dv_dz = jnp.gradient(state["v"], axis=0) / jnp.maximum(dz_c, 1.0)
    shear2 = du_dz ** 2 + dv_dz ** 2
    p_s = km * shear2
    p_b = -kh * n2
    # implicit dissipation: qke (1 + 2 dt q/(B1 l)) = qke + 2 dt (Ps+Pb)
    qke_new = (qke + 2.0 * dt * jnp.maximum(p_s + p_b, -0.45 * qke / dt)) \
        / (1.0 + 2.0 * dt * q / (B1 * l_mix))
    qke_new = jnp.maximum(qke_new, QKE_MIN)
    # vertical transport of QKE with K_q = 3 l q S_m, surface BC from u*
    kq_w = 3.0 * 0.5 * ((l_mix * q * sm)[1:] + (l_mix * q * sm)[:-1])
    qke_new = _implicit_mix(qke_new, kq_w, rho_w, rho, dz_c, dz_w, dt)
    qke_sfc = B1 ** (2.0 / 3.0) * ust ** 2
    qke_new = qke_new.at[0].set(jnp.maximum(qke_new[0], qke_sfc))

    # --- implicit mixing of mean fields ---------------------------------
    theta_new = _implicit_mix(diag.theta, kh_w, rho_w, rho, dz_c, dz_w, dt,
                              sfc_flux=hfx / c.CP / pii[0])
    qv_new = _implicit_mix(qv, kh_w, rho_w, rho, dz_c, dz_w, dt,
                           sfc_flux=qfx)
    wind0 = jnp.sqrt(state["u"][0] ** 2 + state["v"][0] ** 2) + 0.1
    u_new = _implicit_mix(state["u"], km_w, rho_w, rho, dz_c, dz_w, dt,
                          sfc_flux=-rho[0] * cd * wind0 * state["u"][0])
    v_new = _implicit_mix(state["v"], km_w, rho_w, rho, dz_c, dz_w, dt,
                          sfc_flux=-rho[0] * cd * wind0 * state["v"][0])

    tend = {
        "th": (theta_new - diag.theta) / dt,
        "qv": (qv_new - qv) / dt,
        "u": (u_new - state["u"]) / dt,
        "v": (v_new - state["v"]) / dt,
    }
    out = dict(state)
    out["qke"] = qke_new
    out["hfx"] = hfx
    out["qfx"] = qfx
    out["ust"] = ust
    out["pblh"] = h_pbl
    from wrfchem_arc_interactions_tpu.physics.pbl import apply_surface_update
    out = apply_surface_update(state, out, hfx, qfx, ch_wind, beta, noah,
                               rho[0], t_air[0], dt)
    return out, tend
