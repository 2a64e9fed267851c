"""Large-timestep RHS terms: pressure gradient, buoyancy, Coriolis, omega
diagnosis, geopotential advection (canonical:
dyn_em/module_big_step_utilities_em.F + the tendency assembly of
module_em.F rk_tendency; SURVEY.md §2.1).

All horizontal-stencil inputs are PAD-padded arrays (see ops.stencil);
outputs are interior-sized *coupled* tendencies.

Map-scale factors (grid.has_msf, real projections): the coupled momentum
variables are U = mu_d u / m_u, V = mu_d v / m_v, W = mu_d w / m_t and the
code's omega (ww) carries mu eta_dot = m_t * Omega.  In this arrangement
(ARW tech-note eqs. 2.19-2.23 with isotropic m_x = m_y = m):

- the horizontal PGF terms keep their flat form (their (m_x/m_y) prefactor
  is 1 for the conformal projections supported);
- flux divergences pick up m (momentum) or m^2 (mass-point scalars);
- the buoyancy of the coupled W equation and the g W term of the
  geopotential equation pick up 1/m and m respectively;
- Coriolis generalises to f_eff = f + u dm/dy - v dm/dx (which contains
  the spherical curvature u tan(lat)/a exactly on a Mercator grid).

With m == 1 every branch reduces bit-exactly to the flat-metric path
(tests/test_map_factors.py).

Perturbation arrangement for f32 accuracy: horizontal gradients act on
perturbation p' and phi' (the base state is horizontally uniform, so
d/dx p = d/dx p'); the vertical d(p)/d(eta) splits as mu_bar + d(p')/d(eta)
since the base state satisfies d(pb)/d(eta) = mub exactly on eta levels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.dycore.diagnostics import ddz_center, ddz_faces
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.ops.stencil import avg_z_centers_to_faces, win


def avg_x_to_u(a_pad, **kw):
    """Mass-point field -> u-face (i-1/2) average."""
    return 0.5 * (win(a_pad, 0, -1, **kw) + win(a_pad, 0, 0, **kw))


def avg_y_to_v(a_pad, **kw):
    return 0.5 * (win(a_pad, -1, 0, **kw) + win(a_pad, 0, 0, **kw))


def pgf_uv(p_pert_pad, ph_pert_pad, al_full_pad, eps_pad, mu_full_pad,
           grid: Grid, base_pads=None) -> Tuple[jax.Array, jax.Array]:
    """Horizontal pressure-gradient force for the coupled U and V equations:

      F_U = -mu_d alpha d(p')/dx - (alpha/alpha_d) [mu_b + d(p')/d(eta)] d(phi')/dx
            [+ terrain] + eps d(phb)/dx [ mu_d alpha_d/alb - mu_b - d(p')/d(eta) ]

    with alpha the full *moist* specific volume (alpha = eps * alpha_d) per
    the ARW momentum equations.  The terrain term is the perturbation form
    of the cross terms -mu alpha d(pb)/dx|eta - eps [mu_b + d(p')/d(eta)]
    d(phb)/dx with the discrete base gradient DEFINED by the hydrostatic
    identity d(pb)/dx|eta = -d(phb)/dx / alb, so an unperturbed atmosphere
    at rest over orography is an exact discrete steady state (canonical:
    the base/perturbation split of module_big_step_utilities_em.F
    horizontal_pressure_gradient).

    ``base_pads``: optional dict of PAD-padded {phb, mub, alb} — required
    (and only used) when grid.has_terrain.  Returns interior (nz, ny, nx)
    tendencies at u and v faces.
    """
    rdx, rdy = grid.rdx, grid.rdy
    terrain = grid.has_terrain and base_pads is not None

    al_moist_pad = eps_pad * al_full_pad

    dpdx = (win(p_pert_pad, 0, 0) - win(p_pert_pad, 0, -1)) * rdx
    mu_u = avg_x_to_u(mu_full_pad)
    al_u = avg_x_to_u(al_moist_pad)
    t1_u = -mu_u[None] * al_u * dpdx

    # d(p')/d(eta) at mass levels, averaged to u faces
    dpdn = ddz_center(win(p_pert_pad, 0, -1, ex=1), grid.znu)
    dpdn_u = 0.5 * (dpdn[..., :-1] + dpdn[..., 1:])
    # d(phi')/dx at w levels on u faces -> average to mass levels
    dphdx_w = (win(ph_pert_pad, 0, 0) - win(ph_pert_pad, 0, -1)) * rdx
    dphdx = 0.5 * (dphdx_w[:-1] + dphdx_w[1:])
    eps_u = avg_x_to_u(eps_pad)
    if terrain:
        mub_u = avg_x_to_u(base_pads["mub"])[None]
    else:
        mub_u = grid.mub[None]
    t2_u = -eps_u * (mub_u + dpdn_u) * dphdx

    dpdy = (win(p_pert_pad, 0, 0) - win(p_pert_pad, -1, 0)) * rdy
    mu_v = avg_y_to_v(mu_full_pad)
    al_v = avg_y_to_v(al_moist_pad)
    t1_v = -mu_v[None] * al_v * dpdy

    dpdn_y = ddz_center(win(p_pert_pad, -1, 0, ey=1), grid.znu)
    dpdn_v = 0.5 * (dpdn_y[:, :-1, :] + dpdn_y[:, 1:, :])
    dphdy_w = (win(ph_pert_pad, 0, 0) - win(ph_pert_pad, -1, 0)) * rdy
    dphdy = 0.5 * (dphdy_w[:-1] + dphdy_w[1:])
    eps_v = avg_y_to_v(eps_pad)
    if terrain:
        mub_v = avg_y_to_v(base_pads["mub"])[None]
    else:
        mub_v = grid.mub[None]
    t2_v = -eps_v * (mub_v + dpdn_v) * dphdy

    fu = t1_u + t2_u
    fv = t1_v + t2_v

    if terrain:
        # dry alpha at faces; base-state gradients along eta surfaces
        ald_u = avg_x_to_u(al_full_pad)
        alb_u = avg_x_to_u(base_pads["alb"])
        dphbdx_w = (win(base_pads["phb"], 0, 0)
                    - win(base_pads["phb"], 0, -1)) * rdx
        dphbdx = 0.5 * (dphbdx_w[:-1] + dphbdx_w[1:])
        fu = fu + eps_u * dphbdx * (mu_u[None] * ald_u / alb_u
                                    - mub_u - dpdn_u)
        ald_v = avg_y_to_v(al_full_pad)
        alb_v = avg_y_to_v(base_pads["alb"])
        dphbdy_w = (win(base_pads["phb"], 0, 0)
                    - win(base_pads["phb"], -1, 0)) * rdy
        dphbdy = 0.5 * (dphbdy_w[:-1] + dphbdy_w[1:])
        fv = fv + eps_v * dphbdy * (mu_v[None] * ald_v / alb_v
                                    - mub_v - dpdn_v)

    return fu, fv


def buoyancy_w(p_pert, eps, mu_pert, grid: Grid) -> jax.Array:
    """g [ (alpha/alpha_d) d(p)/d(eta) - mu_d ] at w levels, in the
    perturbation arrangement g [ eps*dp'/deta + mub*(eps - 1) - mu' ].

    Unpadded inputs (column-local).  Returns (nz+1, ny, nx); the surface
    level is zeroed (w(0) is boundary-determined).
    """
    from wrfchem_arc_interactions_tpu.utils.constants import G
    dpdn_w = ddz_faces(p_pert, grid)                     # (nz+1,...)
    eps_w = avg_z_centers_to_faces(eps, grid.fnm, grid.fnp)
    buoy = G * (eps_w * dpdn_w + grid.mub[None] * (eps_w - 1.0) - mu_pert[None])
    if grid.has_msf:
        # coupled-W equation: the buoyancy enters as g[...]/m_t (tech-note
        # 2.21 with W = mu w / m)
        buoy = buoy / grid.msft[None]
    return buoy.at[0].set(0.0)


def coriolis_uv(u_pad, v_pad, mu_full_pad, grid: Grid) -> Tuple[jax.Array, jax.Array]:
    """Coriolis + conformal curvature for coupled U, V (canonical:
    module_big_step_utilities_em.F coriolis + curvature).

    Base terms: +(mu_u/m_u) f_eff v_bar_u, -(mu_v/m_v) f_eff u_bar_v
    (4-point averages of the opposing wind to the staggered point; the /m
    couples the force into the U = mu u / m momentum units).  With a real
    projection (grid.curvature) f varies with latitude and the curvature
    generalises to the conformal-map form

        f_eff = f + u dm/dy - v dm/dx

    which contains the spherical shallow-atmosphere terms exactly (on a
    Mercator grid dm/dy = tan(lat)/a, recovering du/dt += u v tan(lat)/a).
    dm/dx = 0 for all supported projections (m varies with the row only).
    Traditional approximation: the 2*Omega*cos(lat) terms and the u w / a
    metric terms are omitted, as in hydrostatic-scaling practice.
    """
    f = grid.f[None]
    # v averaged to u points: mean of v[j], v[j+1] at i-1, i
    v_at_u = 0.25 * (win(v_pad, 0, -1) + win(v_pad, 1, -1)
                     + win(v_pad, 0, 0) + win(v_pad, 1, 0))
    u_at_v = 0.25 * (win(u_pad, -1, 0) + win(u_pad, -1, 1)
                     + win(u_pad, 0, 0) + win(u_pad, 0, 1))
    mu_u = avg_x_to_u(mu_full_pad)[None]
    mu_v = avg_y_to_v(mu_full_pad)[None]
    if grid.curvature:
        dmdy = grid.dmdy[None]
        u_at_u = win(u_pad, 0, 0)
        feff_u = f + u_at_u * dmdy
        feff_v = f + u_at_v * dmdy
        fu = (mu_u / grid.msfu[None]) * feff_u * v_at_u
        fv = -(mu_v / grid.msfv[None]) * feff_v * u_at_v
    else:
        fu = mu_u * f * v_at_u
        fv = -mu_v * f * u_at_v
    return fu, fv


def omega_diagnosis(ru_pad, rv_pad, grid: Grid, hx) -> Tuple[jax.Array, jax.Array]:
    """Diagnose (d(mu)/dt, omega at w levels) from the coupled mass fluxes
    via the continuity equation (canonical: the ww/wdtn computation in
    solve_em/advance_mu_t).

    Level divergence D[k] = m^2 [dx(ru) + dy(rv)] (ru/rv are the
    map-factor-coupled fluxes U = mu u / m when grid.has_msf); column mass
    tendency dmu/dt = + sum_k dnw[k] D[k]; omega integrates
    d(omega)/d(eta) = -(dmu/dt + D) upward from omega(surface) = 0, which
    closes exactly at the top (omega(0) = 0) by construction.  The returned
    ww carries mu eta_dot (= m_t * Omega of the tech note).
    """
    div = ((win(ru_pad, 0, 1) - win(ru_pad, 0, 0)) * grid.rdx
           + (win(rv_pad, 1, 0) - win(rv_pad, 0, 0)) * grid.rdy)
    if grid.has_msf:
        div = (grid.msft * grid.msft)[None] * div
    dnw = grid.dnw.reshape(-1, 1, 1)
    dmudt = jnp.sum(dnw * div, axis=0)
    incr = dnw * (-dmudt[None] - div)
    om = jnp.cumsum(incr, axis=0)
    ww = jnp.concatenate([jnp.zeros_like(om[:1]), om], axis=0)
    return dmudt, ww


def rphi_tendency(u_pad, v_pad, ph_pert_pad, w, ww, mu_full, grid: Grid,
                  phb_pad=None) -> jax.Array:
    """R_phi = -(1/mu_d)[ U d(phi)/dx + V d(phi)/dy + omega d(phi)/d(eta)
    - g W ] at w levels; the advective-form geopotential equation.

    u_pad/v_pad here are the *coupled* U, V (PAD-padded); w, ww, mu_full
    are interior.  With terrain the horizontal gradient includes the base
    geopotential slope (phb_pad); over a flat base d(phb)/dx = 0 and only
    the perturbation gradient remains.  Surface level (k=0) is zeroed:
    phi_sfc is time-invariant.
    """
    from wrfchem_arc_interactions_tpu.utils.constants import G
    fnm, fnp = grid.fnm, grid.fnp
    terrain = grid.has_terrain and phb_pad is not None
    # U at (u-face, w-level); product with d(phi)/dx there; avg back to mass x
    u_w = avg_z_centers_to_faces(win(u_pad, 0, 0, ex=1), fnm, fnp)
    dphdx_w = (win(ph_pert_pad, 0, 0, ex=1) - win(ph_pert_pad, 0, -1, ex=1)) * grid.rdx
    if terrain:
        dphdx_w = dphdx_w + (win(phb_pad, 0, 0, ex=1)
                             - win(phb_pad, 0, -1, ex=1)) * grid.rdx
    adv_x = 0.5 * (u_w[..., :-1] * dphdx_w[..., :-1] + u_w[..., 1:] * dphdx_w[..., 1:])

    v_w = avg_z_centers_to_faces(win(v_pad, 0, 0, ey=1), fnm, fnp)
    dphdy_w = (win(ph_pert_pad, 0, 0, ey=1) - win(ph_pert_pad, -1, 0, ey=1)) * grid.rdy
    if terrain:
        dphdy_w = dphdy_w + (win(phb_pad, 0, 0, ey=1)
                             - win(phb_pad, -1, 0, ey=1)) * grid.rdy
    adv_y = 0.5 * (v_w[:, :-1, :] * dphdy_w[:, :-1, :] + v_w[:, 1:, :] * dphdy_w[:, 1:, :])

    # omega * d(phi)/d(eta) at w levels (central in eta over full levels)
    ph = win(ph_pert_pad, 0, 0)
    znw = grid.znw.reshape(-1, 1, 1)
    dphdn_int = (ph[2:] - ph[:-2]) / (znw[2:] - znw[:-2])
    dphdn_top = (ph[-1:] - ph[-2:-1]) / (znw[-1:] - znw[-2:-1])
    # include the base-state part: d(phb)/d(eta) = -mub*alb (at w levels)
    alb_w = avg_z_centers_to_faces(grid.alb, fnm, fnp)
    dphbdn = -grid.mub[None] * alb_w
    dphdn = jnp.concatenate([jnp.zeros_like(ph[:1]), dphdn_int, dphdn_top], axis=0) + dphbdn
    adv_z = ww * dphdn

    adv_h = adv_x + adv_y
    if grid.has_msf:
        # tech-note 2.23: m^2 (U dphi/dx + V dphi/dy); the vertical
        # ww dphi/deta and the g W terms carry mu eta_dot and mu w (the m
        # factors cancel against the coupled definitions)
        adv_h = (grid.msft * grid.msft)[None] * adv_h
    rphi = (-(adv_h + adv_z) + G * w) / mu_full[None]
    return rphi.at[0].set(0.0)
