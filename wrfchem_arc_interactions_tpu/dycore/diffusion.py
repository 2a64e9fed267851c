"""Subgrid turbulence / diffusion (canonical: dyn_em/module_diffusion_em.F;
SURVEY.md §2.1 'Turbulence/diffusion').

Round-1 scope: 2D/3D Smagorinsky first-order closure on coordinate surfaces
(diff_opt=1 + km_opt=3/4 analog) + constant background khdif/kvdif, and the
optional 6th-order numerical filter (diff_6th_opt). The 1.5-order TKE
closure is registry-gated (`tke` field exists when km_opt=tke) and lands
with the LES physics in a later round.

Tendencies are computed on *uncoupled* fields and returned as a phys_tend
dict ({u, v, th, <scalars>}) consumed by dycore.solve.step each RK stage
(the first_rk_step_part2 pattern: computed once per dt, held fixed).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.ops.stencil import win
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps

CS_SMAG = 0.25


def smagorinsky_k(u_pad, v_pad, grid: Grid, cfg: Config):
    """Horizontal eddy viscosity K_h at mass points (2D deformation)."""
    rdx, rdy = grid.rdx, grid.rdy
    # du/dx at mass points (u at faces)
    dudx = (win(u_pad, 0, 1) - win(u_pad, 0, 0)) * rdx
    dvdy = (win(v_pad, 1, 0) - win(v_pad, 0, 0)) * rdy
    # shear terms averaged from corners to mass points
    dudy_c = (win(u_pad, 0, 0) - win(u_pad, -1, 0)) * rdy
    dvdx_c = (win(v_pad, 0, 0) - win(v_pad, 0, -1)) * rdx
    d12 = dudy_c + dvdx_c
    defor2 = (dudx - dvdy) ** 2 + d12 ** 2
    delta2 = grid.dx * grid.dy
    return (CS_SMAG ** 2) * delta2 * jnp.sqrt(jnp.maximum(defor2, 0.0)) \
        + cfg.dynamics.khdif


def _hdiff(q_pad, k_pad, grid: Grid, pad=3):
    """del . (K del q) horizontal, 2nd order, K at mass points."""
    rdx2 = grid.rdx * grid.rdx
    rdy2 = grid.rdy * grid.rdy
    k_e = 0.5 * (win(k_pad, 0, 0, pad=pad) + win(k_pad, 0, 1, pad=pad))
    k_w = 0.5 * (win(k_pad, 0, 0, pad=pad) + win(k_pad, 0, -1, pad=pad))
    k_n = 0.5 * (win(k_pad, 0, 0, pad=pad) + win(k_pad, 1, 0, pad=pad))
    k_s = 0.5 * (win(k_pad, 0, 0, pad=pad) + win(k_pad, -1, 0, pad=pad))
    q0 = win(q_pad, 0, 0, pad=pad)
    return (rdx2 * (k_e * (win(q_pad, 0, 1, pad=pad) - q0)
                    - k_w * (q0 - win(q_pad, 0, -1, pad=pad)))
            + rdy2 * (k_n * (win(q_pad, 1, 0, pad=pad) - q0)
                      - k_s * (q0 - win(q_pad, -1, 0, pad=pad))))


def _vdiff(q, kv, grid: Grid, dz2):
    """Constant-K vertical diffusion d/dz(K dq/dz) on mass levels."""
    dq_up = jnp.concatenate([q[1:] - q[:-1], jnp.zeros_like(q[:1])], axis=0)
    dq_dn = jnp.concatenate([jnp.zeros_like(q[:1]), q[1:] - q[:-1]], axis=0)
    return kv * (dq_up - dq_dn) / dz2


def _filter6(q_pad, grid: Grid, factor: float, dt: float):
    """6th-order numerical filter (diff_6th_opt=1), x and y."""
    def d6(offsets, axis_wins):
        return sum(cf * wq for cf, wq in zip((-1.0, 6.0, -15.0, 20.0, -15.0, 6.0, -1.0), axis_wins))
    wx = [win(q_pad, 0, m) for m in (-3, -2, -1, 0, 1, 2, 3)]
    wy = [win(q_pad, m, 0) for m in (-3, -2, -1, 0, 1, 2, 3)]
    coef = factor / (64.0 * dt)
    sx = (-wx[0] + 6 * wx[1] - 15 * wx[2] + 20 * wx[3] - 15 * wx[4] + 6 * wx[5] - wx[6])
    sy = (-wy[0] + 6 * wy[1] - 15 * wy[2] + 20 * wy[3] - 15 * wy[4] + 6 * wy[5] - wy[6])
    return -coef * (sx + sy)


CK_TKE = 0.10      # K = ck * l * sqrt(e)
CE_TKE = 0.93      # dissipation = ce * e^1.5 / l


def tke_exchange_and_tendency(state, grid: Grid, cfg: Config, dz):
    """1.5-order TKE closure (km_opt=2; canonical tke_rhs of
    module_diffusion_em.F): returns (K_m at mass points, d(tke)/dt from
    shear + buoyancy production and dissipation). Mixing-length limited by
    the stable-stratification scale sqrt(e)/N."""
    from wrfchem_arc_interactions_tpu.utils.constants import G, T0
    e = jnp.maximum(state["tke"], 1e-4)
    theta = state["t"] + T0
    delta = (grid.dx * grid.dy) ** 0.5
    # N^2 and vertical shear on mass levels (central differences)
    dthdz = jnp.gradient(theta, axis=0) / jnp.maximum(dz, 1.0)
    n2 = G / theta * dthdz
    dudz = jnp.gradient(state["u"], axis=0) / jnp.maximum(dz, 1.0)
    dvdz = jnp.gradient(state["v"], axis=0) / jnp.maximum(dz, 1.0)
    shear2 = dudz ** 2 + dvdz ** 2
    l_strat = jnp.where(n2 > 1e-10, 0.76 * jnp.sqrt(e / jnp.maximum(n2, 1e-10)),
                        delta)
    l_mix = jnp.minimum(delta, l_strat)
    k_m = CK_TKE * l_mix * jnp.sqrt(e)
    k_h_fac = 1.0 + 2.0 * l_mix / delta          # Pr_t^-1 of the closure
    prod_s = k_m * shear2
    prod_b = -k_m * k_h_fac * n2
    dissip = CE_TKE * e ** 1.5 / jnp.maximum(l_mix, 1.0)
    dtke = prod_s + prod_b - dissip
    return k_m, dtke


def diffusion_tendencies(state, grid: Grid, cfg: Config, hx: HaloOps,
                         dt: float, scalars: Tuple[str, ...]) -> Dict[str, jax.Array]:
    """phys_tend contributions from subgrid mixing (uncoupled rates)."""
    dyn = cfg.dynamics
    fields = {"u": state["u"], "v": state["v"], "t": state["t"]}
    for q in scalars:
        fields[q] = state[q]
    g = hx.pad_many(fields, 3)
    if dyn.km_opt.value == "tke" and "tke" in state:
        ph_full = grid.phb + state["ph"]
        dz_tke = (ph_full[1:] - ph_full[:-1]) / 9.81
        k_h, dtke = tke_exchange_and_tendency(state, grid, cfg, dz_tke)
    else:
        k_h = smagorinsky_k(g["u"], g["v"], grid, cfg)
        dtke = None
    k_pad = hx.pad(k_h, 3)

    out: Dict[str, jax.Array] = {}
    out["u"] = _hdiff(g["u"], k_pad, grid)
    out["v"] = _hdiff(g["v"], k_pad, grid)
    out["th"] = _hdiff(g["t"], k_pad, grid)
    for q in scalars:
        out[q] = _hdiff(g[q], k_pad, grid)

    if dyn.kvdif > 0.0:
        ph_full = grid.phb + state["ph"]
        dz = (ph_full[1:] - ph_full[:-1]) / 9.81
        dz2 = dz * dz
        out["u"] = out["u"] + _vdiff(state["u"], dyn.kvdif, grid, dz2)
        out["v"] = out["v"] + _vdiff(state["v"], dyn.kvdif, grid, dz2)
        out["th"] = out["th"] + _vdiff(state["t"], dyn.kvdif, grid, dz2)
        for q in scalars:
            out[q] = out[q] + _vdiff(state[q], dyn.kvdif, grid, dz2)

    if dyn.diff_6th_opt:
        f = dyn.diff_6th_factor
        out["u"] = out["u"] + _filter6(g["u"], grid, f, dt)
        out["v"] = out["v"] + _filter6(g["v"], grid, f, dt)
        out["th"] = out["th"] + _filter6(g["t"], grid, f, dt)
        for q in scalars:
            out[q] = out[q] + _filter6(g[q], grid, f, dt)
    if dtke is not None:
        out["tke"] = out.get("tke", 0.0) + dtke
    return out
