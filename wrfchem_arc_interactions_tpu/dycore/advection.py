"""Finite-volume flux advection operators (2nd-6th order, upwind-biased odd
orders) on the Arakawa-C grid, plus the positive-definite flux limiter.

Capability surface of canonical dyn_em/module_advect_em.F (SURVEY.md §2.1
'FV advection'): `advect_scalar`, `advect_u/v/w`, `pd_limit` for
`advect_scalar_pd`.  The ARW default — 5th-order horizontal, 3rd-order
vertical — is the tested hot path.

Discretisation notes:

- Fields are (nz, ny, nx); horizontal stencils consume PAD(=3)-padded
  arrays and emit face arrays with one extra point (nx+1 or ny+1 faces) so
  the flux divergence is an exact telescoping difference — machine-precision
  conservation, verified in tests.
- Mass fluxes are the coupled ru = mu_u*u [Pa m s-1] at u faces, rv at v
  faces, and omega = mu*eta_dot [Pa s-1] at w levels (ww); scalar fluxes are
  vel * q_hat with q_hat the order-dependent face interpolation of the
  *uncoupled* scalar.
- Odd orders are the even-order flux plus an upwind dissipation term scaled
  by |vel| (Wicker & Skamarock 2002) — branchless, so one fused VPU loop.
- Vertical fluxes use edge-replicated ghost values near the boundaries
  (order degrades gracefully there, as the reference degrades to one-sided
  stencils); boundary face fluxes vanish because omega = 0 at eta = 0, 1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.ops.stencil import avg_z_centers_to_faces, win


# ---------------------------------------------------------------------------
# Face-flux formulas. `qm1` is the cell just upwind of the face for vel > 0,
# `q0` just downwind (i.e. face sits between qm1 and q0).
# ---------------------------------------------------------------------------

def flux1(vel, qm1, q0):
    return vel * jnp.where(vel > 0, qm1, q0)


def flux2(vel, qm1, q0):
    return vel * 0.5 * (q0 + qm1)


def flux4(vel, qm2, qm1, q0, qp1):
    return vel * (7.0 * (q0 + qm1) - (qp1 + qm2)) * (1.0 / 12.0)


def flux3(vel, qm2, qm1, q0, qp1):
    return flux4(vel, qm2, qm1, q0, qp1) - jnp.abs(vel) * (
        3.0 * (q0 - qm1) - (qp1 - qm2)) * (1.0 / 12.0)


def flux6(vel, qm3, qm2, qm1, q0, qp1, qp2):
    return vel * (37.0 * (q0 + qm1) - 8.0 * (qp1 + qm2) + (qp2 + qm3)) * (1.0 / 60.0)


def flux5(vel, qm3, qm2, qm1, q0, qp1, qp2):
    return flux6(vel, qm3, qm2, qm1, q0, qp1, qp2) - jnp.abs(vel) * (
        10.0 * (q0 - qm1) - 5.0 * (qp1 - qm2) + (qp2 - qm3)) * (1.0 / 60.0)


def _weno5_face(a, b, c, d, e):
    """Classic WENO5-JS face reconstruction from the five upwind-ordered
    cells (a..e = q_{f-3}..q_{f+1} for flow toward +, mirrored otherwise).

    f32-safe formulation: smoothness indicators are normalised by the local
    field scale (scale-invariant, so tiny tracers and theta ~ 300 K adapt
    identically) and the nonlinear weights are normalised BEFORE the
    candidate dot product — the naive w*p sum overflows f32 when all betas
    vanish (w ~ 1/eps^2 ~ 1e36 times q ~ 1e2 > f32 max)."""
    beta0 = (13.0 / 12.0) * (a - 2.0 * b + c) ** 2 + 0.25 * (a - 4.0 * b + 3.0 * c) ** 2
    beta1 = (13.0 / 12.0) * (b - 2.0 * c + d) ** 2 + 0.25 * (b - d) ** 2
    beta2 = (13.0 / 12.0) * (c - 2.0 * d + e) ** 2 + 0.25 * (3.0 * c - 4.0 * d + e) ** 2
    # local scale: mean square of the stencil differences keeps the weights
    # invariant under q -> s*q + const (the +const matters for theta)
    scale = beta0 + beta1 + beta2 + 1e-30
    eps = 1e-8
    w0 = 0.1 / (eps + beta0 / scale) ** 2
    w1 = 0.6 / (eps + beta1 / scale) ** 2
    w2 = 0.3 / (eps + beta2 / scale) ** 2
    wsum = w0 + w1 + w2
    p0 = (2.0 * a - 7.0 * b + 11.0 * c) * (1.0 / 6.0)
    p1 = (-b + 5.0 * c + 2.0 * d) * (1.0 / 6.0)
    p2 = (2.0 * c + 5.0 * d - e) * (1.0 / 6.0)
    return (w0 / wsum) * p0 + (w1 / wsum) * p1 + (w2 / wsum) * p2


def flux_weno5(vel, qm3, qm2, qm1, q0, qp1, qp2):
    """5th-order WENO flux (canonical advect_weno*; momentum_adv_opt=3 /
    moist_adv_opt=3,4 analogs).  Both upwind orientations are evaluated and
    selected branchlessly by the face-velocity sign — one fused VPU pass, no
    data-dependent control flow under jit."""
    q_pos = _weno5_face(qm3, qm2, qm1, q0, qp1)   # flow toward +: upwind is -
    q_neg = _weno5_face(qp2, qp1, q0, qm1, qm2)   # mirrored stencil
    return vel * jnp.where(vel > 0, q_pos, q_neg)


def _hflux(vel, stencil, order: int):
    """Apply the order-`order` flux formula to a 6-point stencil tuple
    (qm3..qp2) of equally-shaped arrays."""
    qm3, qm2, qm1, q0, qp1, qp2 = stencil
    if order == 1:
        return flux1(vel, qm1, q0)
    if order == 2:
        return flux2(vel, qm1, q0)
    if order == 3:
        return flux3(vel, qm2, qm1, q0, qp1)
    if order == 4:
        return flux4(vel, qm2, qm1, q0, qp1)
    if order == 5:
        return flux5(vel, qm3, qm2, qm1, q0, qp1, qp2)
    if order == 6:
        return flux6(vel, qm3, qm2, qm1, q0, qp1, qp2)
    if order == 7:   # AdvOrder.WENO5: nonlinear 5th-order WENO reconstruction
        return flux_weno5(vel, qm3, qm2, qm1, q0, qp1, qp2)
    raise ValueError(order)


def _stencil_x(q_pad, ex=1, dy=0, ey=0):
    """6-point x stencil around west faces: face f sits between cells f-1, f."""
    return tuple(win(q_pad, dy, m, ey=ey, ex=ex) for m in (-3, -2, -1, 0, 1, 2))


def _stencil_y(q_pad, ey=1, dx=0, ex=0):
    return tuple(win(q_pad, m, dx, ey=ey, ex=ex) for m in (-3, -2, -1, 0, 1, 2))


def _zsl(q, lo, hi):
    """Slice the z axis (axis -3, so arbitrary leading batch axes work)."""
    return q[..., lo:hi, :, :]


def _zpad(q, n=2):
    """Edge-replicate ghost levels above/below along the z (-3) axis."""
    top = jnp.repeat(_zsl(q, q.shape[-3] - 1, q.shape[-3]), n, axis=-3)
    bot = jnp.repeat(_zsl(q, 0, 1), n, axis=-3)
    return jnp.concatenate([bot, q, top], axis=-3)


def _stencil_z(q, nfaces: int):
    """Stencil tuple for vertical faces k = 0..nfaces-1 where face k sits
    between levels k-1 and k of `q` (z = axis -3; leading axes batch)."""
    qe = _zpad(q, 3)
    # face k: qm1 = q[k-1] = qe[k+2], q0 = q[k] = qe[k+3]
    return tuple(_zsl(qe, 3 + m, 3 + m + nfaces) for m in (-3, -2, -1, 0, 1, 2))


def vflux(vel_faces, q, order: int):
    """Vertical fluxes at the `vel_faces.shape[-3]` faces of levels of q,
    face k between q[k-1] and q[k].  Leading axes (before z, y, x) batch —
    the stacked-scalar path advects every tracer in one fused pass.

    SIGN OF THE UPWINDING: eta DECREASES with k (rdnw < 0), so the
    index-space transport direction is sign(ww * rdnw) = -sign(ww).  The
    shared flux formulas upwind by sign(vel) along +index; feeding ww
    directly therefore selects the DOWNWIND cell and flips the odd-order
    |vel| dissipation into ANTI-diffusion — a latent instability that only
    bites in strong updrafts (it pumped theta_e by +100 K and detonated the
    squall-line case at minute 20; see tests/test_advection.py vertical
    upwind tests).  Evaluating with -ww and negating restores correct
    upwinding: even orders are algebraically unchanged, odd orders get the
    dissipation sign right."""
    return -_hflux(-vel_faces, _stencil_z(q, vel_faces.shape[-3]), order)


# ---------------------------------------------------------------------------
# Flux divergence
# ---------------------------------------------------------------------------

def flux_div(fx, fy, fz, grid: Grid, m_h=None) -> jax.Array:
    """-(m_h (d/dx Fx + d/dy Fy) + d/eta Fz): the coupled-scalar tendency.

    fx: (nz, ny, nx+1) at west faces (+ east boundary face),
    fy: (nz, ny+1, nx), fz: (nz+1, ny, nx) at w levels.

    ``m_h`` is the map-factor scaling of the horizontal divergence at the
    control-volume centre: msft^2 for mass-point scalars (ARW flux form
    m_x m_y [d_x(Uq) + d_y(Vq)] with U = mu u / m), msfu/msfv/msft for the
    U/V/W momentum equations (single m; canonical: the msf handling of
    module_advect_em.F).  None (ideal, m == 1) keeps the flat-metric form.
    """
    rdnw = grid.rdnw.reshape(-1, 1, 1)
    hdiv = ((fx[..., 1:] - fx[..., :-1]) * grid.rdx
            + (fy[..., 1:, :] - fy[..., :-1, :]) * grid.rdy)
    if m_h is not None:
        hdiv = m_h[None] * hdiv
    dfz = _zsl(fz, 1, fz.shape[-3]) - _zsl(fz, 0, fz.shape[-3] - 1)
    return -(hdiv + dfz * rdnw)


def scalar_fluxes(q_pad, ru_pad, rv_pad, ww, h_order: int, v_order: int):
    """Fluxes of an uncoupled mass-point scalar. q_pad/ru_pad/rv_pad are
    PAD-padded; ww is the unpadded (nz+1, ny, nx) omega."""
    fx = _hflux(win(ru_pad, 0, 0, ex=1), _stencil_x(q_pad), h_order)
    fy = _hflux(win(rv_pad, 0, 0, ey=1), _stencil_y(q_pad), v_order_to_h(h_order))
    fz = vflux(ww, win(q_pad, 0, 0), v_order)
    # omega vanishes at the rigid eta boundaries; enforce exactly.
    fz = fz.at[..., 0, :, :].set(0.0).at[..., -1, :, :].set(0.0)
    return fx, fy, fz


def v_order_to_h(h_order: int) -> int:
    # y direction uses the same order as x
    return h_order


def advect_scalar(q_pad, ru_pad, rv_pad, ww, grid: Grid,
                  h_order: int = 5, v_order: int = 3) -> jax.Array:
    fx, fy, fz = scalar_fluxes(q_pad, ru_pad, rv_pad, ww, h_order, v_order)
    m2 = grid.msft * grid.msft if getattr(grid, "has_msf", False) else None
    return flux_div(fx, fy, fz, grid, m_h=m2)


# ---------------------------------------------------------------------------
# Momentum advection. Control volumes are centred on the staggered points;
# mass fluxes are averaged to the CV faces (canonical advect_u/v/w).
# ---------------------------------------------------------------------------

def advect_u(u_pad, ru_pad, rv_pad, ww_pad, grid: Grid,
             h_order: int = 5, v_order: int = 3) -> jax.Array:
    """Tendency of coupled U at u faces. All horizontal args PAD-padded;
    ww_pad is (nz+1, ny+2P, nx+2P)."""
    # x fluxes at mass centers c = -1..nx-1 (the u-CV faces)
    vel_c = 0.5 * (win(ru_pad, 0, -1, ex=1) + win(ru_pad, 0, 0, ex=1))
    fx = _hflux(vel_c, _stencil_x(u_pad), h_order)
    # y fluxes at corners (j-1/2, i-1/2)
    vel_k = 0.5 * (win(rv_pad, 0, -1, ey=1) + win(rv_pad, 0, 0, ey=1))
    fy = _hflux(vel_k, _stencil_y(u_pad), h_order)
    # z fluxes at (w-level, u-face); vertical transport velocity is
    # Omega_u = ww_u / m_u (ww carries mu*eta_dot = m * Omega)
    ww_u = 0.5 * (win(ww_pad, 0, -1) + win(ww_pad, 0, 0))
    if getattr(grid, "has_msf", False):
        ww_u = ww_u / grid.msfu[None]
    fz = vflux(ww_u, win(u_pad, 0, 0), v_order)
    fz = fz.at[0].set(0.0).at[-1].set(0.0)
    return flux_div(fx, fy, fz, grid,
                    m_h=grid.msfu if getattr(grid, "has_msf", False) else None)


def advect_v(v_pad, ru_pad, rv_pad, ww_pad, grid: Grid,
             h_order: int = 5, v_order: int = 3) -> jax.Array:
    vel_k = 0.5 * (win(ru_pad, -1, 0, ex=1) + win(ru_pad, 0, 0, ex=1))
    fx = _hflux(vel_k, _stencil_x(v_pad), h_order)
    vel_c = 0.5 * (win(rv_pad, -1, 0, ey=1) + win(rv_pad, 0, 0, ey=1))
    fy = _hflux(vel_c, _stencil_y(v_pad), h_order)
    ww_v = 0.5 * (win(ww_pad, -1, 0) + win(ww_pad, 0, 0))
    if getattr(grid, "has_msf", False):
        ww_v = ww_v / grid.msfv[None]
    fz = vflux(ww_v, win(v_pad, 0, 0), v_order)
    fz = fz.at[0].set(0.0).at[-1].set(0.0)
    return flux_div(fx, fy, fz, grid,
                    m_h=grid.msfv if getattr(grid, "has_msf", False) else None)


def advect_w(w_pad, ru_pad, rv_pad, ww, grid: Grid,
             h_order: int = 5, v_order: int = 3) -> jax.Array:
    """Tendency of coupled W at w levels (nz+1). Vertical CV spans mass
    levels; the surface level k=0 is boundary-determined (tendency zeroed by
    the caller)."""
    fnm, fnp = grid.fnm, grid.fnp
    ru_w = avg_z_centers_to_faces(win(ru_pad, 0, 0, ex=1), fnm, fnp)
    fx = _hflux(ru_w, _stencil_x(w_pad), h_order)
    rv_w = avg_z_centers_to_faces(win(rv_pad, 0, 0, ey=1), fnm, fnp)
    fy = _hflux(rv_w, _stencil_y(w_pad), h_order)
    # vertical flux of w at mass levels: omega averaged to centers
    om_c = 0.5 * (ww[:-1] + ww[1:])                     # (nz, ny, nx)
    if getattr(grid, "has_msf", False):
        om_c = om_c / grid.msft[None]
    w_int = win(w_pad, 0, 0)                            # (nz+1, ny, nx)
    fz_c = vflux(om_c, w_int[1:], v_order)              # faces between w levels k, k+1
    # divergence at w level k uses fluxes at mass levels k-1, k over dn[k]
    zeros = jnp.zeros_like(fz_c[:1])
    fz_lo = jnp.concatenate([zeros, fz_c], axis=0)      # (nz+1, ...): below level k
    fz_hi = jnp.concatenate([fz_c, zeros], axis=0)      # above level k
    rdn_w = jnp.concatenate([grid.rdn[1:], -1.0 / grid.znu[-1:]]).reshape(-1, 1, 1)
    dfz = jnp.concatenate([
        jnp.zeros_like(fz_c[:1]),
        (fz_hi[1:] - fz_lo[1:]) * rdn_w,
    ], axis=0)
    hdiv = ((fx[:, :, 1:] - fx[:, :, :-1]) * grid.rdx
            + (fy[:, 1:, :] - fy[:, :-1, :]) * grid.rdy)
    if getattr(grid, "has_msf", False):
        hdiv = grid.msft[None] * hdiv
    return -hdiv - dfz


# ---------------------------------------------------------------------------
# Positive-definite limiter (Skamarock 2006; canonical advect_scalar_pd)
# ---------------------------------------------------------------------------

def limit_low_order(phi_old, lx, ly, lz, dt, grid: Grid, hx):
    """Donor-cell renormalisation of the FIRST-ORDER upwind fluxes so the
    transported solution stays non-negative even where the summed outgoing
    Courant number exceeds 1 (violent convective updrafts).

    The textbook limiters assume the low-order solution is positive by the
    CFL condition; when a storm breaks that premise the downstream
    `max(phi, 0)` floors silently CREATE scalar mass — measured as a
    runaway +6% water source feeding back into latent heating in the
    squall-line case.  Scaling every face that drains a cell by the same
    donor factor r = min(1, phi_old/outgoing) restores guaranteed
    positivity while remaining exactly conservative (each face is scaled
    once, by its donor's factor)."""
    rdnw = grid.rdnw.reshape(-1, 1, 1)
    m2 = (grid.msft * grid.msft)[None] if getattr(grid, "has_msf", False) else 1.0
    nzf = lz.shape[-3]
    out_x = jnp.maximum(lx[..., 1:], 0.0) - jnp.minimum(lx[..., :-1], 0.0)
    out_y = jnp.maximum(ly[..., 1:, :], 0.0) - jnp.minimum(ly[..., :-1, :], 0.0)
    up_c = -_zsl(lz, 1, nzf) * rdnw
    lo_c = _zsl(lz, 0, nzf - 1) * rdnw
    out_z = jnp.maximum(-up_c, 0.0) + jnp.maximum(-lo_c, 0.0)
    p_out = dt * (m2 * (out_x * grid.rdx + out_y * grid.rdy) + out_z)
    r = jnp.where(p_out > 0.0,
                  jnp.minimum(1.0, jnp.maximum(phi_old, 0.0)
                              / jnp.maximum(p_out, 1e-30)), 1.0)
    r_pad = hx.pad(r, 1)
    rw = lambda dy, dx, ey=0, ex=0: win(r_pad, dy, dx, ey=ey, ex=ex, pad=1)
    lx_s = lx * jnp.where(lx > 0, rw(0, -1, ex=1), rw(0, 0, ex=1))
    ly_s = ly * jnp.where(ly > 0, rw(-1, 0, ey=1), rw(0, 0, ey=1))
    r_ze = _zpad(r, 1)
    r_lo, r_hi = _zsl(r_ze, 0, nzf), _zsl(r_ze, 1, nzf + 1)
    # positive lz transports downward, draining the upper cell k (see the
    # az sign convention in pd_limit)
    lz_s = lz * jnp.where(lz > 0, r_hi, r_lo)
    return lx_s, ly_s, lz_s


def pd_limit(q_pad, phi_old, fx, fy, fz, ru_pad, rv_pad, ww,
             dt: float, grid: Grid, hx) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Renormalise high-order fluxes so the coupled scalar stays >= 0.

    phi_old = mu^t * q^t (coupled, interior); (fx, fy, fz) are the
    high-order fluxes. Returns limited fluxes. `hx` is the HaloOps for the
    one-cell exchange of the renormalisation factor.
    """
    q_int = win(q_pad, 0, 0)
    # low-order (1st upwind) fluxes
    lx = flux1(win(ru_pad, 0, 0, ex=1), win(q_pad, 0, -1, ex=1), win(q_pad, 0, 0, ex=1))
    ly = flux1(win(rv_pad, 0, 0, ey=1), win(q_pad, -1, 0, ey=1), win(q_pad, 0, 0, ey=1))
    lz = vflux(ww, q_int, 1)
    lz = lz.at[..., 0, :, :].set(0.0).at[..., -1, :, :].set(0.0)
    # rescale so the first-order transported solution is non-negative by
    # construction (not by assumption — see limit_low_order)
    lx, ly, lz = limit_low_order(phi_old, lx, ly, lz, dt, grid, hx)
    m2 = (grid.msft * grid.msft) if getattr(grid, "has_msf", False) else None
    m2v = m2[None] if m2 is not None else 1.0
    phi_td = phi_old + dt * flux_div(lx, ly, lz, grid, m_h=m2)
    phi_td = jnp.maximum(phi_td, 0.0)
    # antidiffusive fluxes
    ax, ay, az = fx - lx, fy - ly, fz - lz
    rdnw = grid.rdnw.reshape(-1, 1, 1)
    nzf = az.shape[-3]
    # total outgoing antidiffusive mass per cell (in phi units over dt)
    out_x = jnp.maximum(ax[..., 1:], 0.0) - jnp.minimum(ax[..., :-1], 0.0)
    out_y = jnp.maximum(ay[..., 1:, :], 0.0) - jnp.minimum(ay[..., :-1, :], 0.0)
    # eta flux divergence has a negative metric (rdnw < 0): outgoing mass in
    # phi units is dt * max(-(az[k+1]-az[k])*rdnw_contrib, 0) per face; split
    # per-face with the sign of the face contribution to -div.
    up_c = -_zsl(az, 1, nzf) * rdnw    # contribution of upper face to +d(phi)/dt
    lo_c = _zsl(az, 0, nzf - 1) * rdnw  # contribution of lower face
    out_z = jnp.maximum(-up_c, 0.0) + jnp.maximum(-lo_c, 0.0)
    p_out = dt * (m2v * (out_x * grid.rdx + out_y * grid.rdy) + out_z)
    r = jnp.where(p_out > 0.0, jnp.minimum(1.0, phi_td / jnp.maximum(p_out, 1e-30)), 1.0)
    r_pad = hx.pad(r, 1)
    rw = lambda dy, dx, ey=0, ex=0: win(r_pad, dy, dx, ey=ey, ex=ex, pad=1)
    # donor-cell scaling: a face's antidiffusive flux is limited by the cell
    # it drains (the upwind cell w.r.t. the sign of the antidiffusive flux)
    ax_l = ax * jnp.where(ax > 0, rw(0, -1, ex=1), rw(0, 0, ex=1))
    ay_l = ay * jnp.where(ay > 0, rw(-1, 0, ey=1), rw(0, 0, ey=1))
    r_int = r
    r_ze = _zpad(r_int, 1)
    r_lo = _zsl(r_ze, 0, nzf)       # level k-1 for face k
    r_hi = _zsl(r_ze, 1, nzf + 1)   # level k
    # eta increases downward, so positive az at face k transports mass
    # downward, draining the upper cell k (donor); negative az drains the
    # lower cell k-1.
    az_l = az * jnp.where(az > 0, r_hi, r_lo)
    return lx + ax_l, ly + ay_l, lz + az_l


# ---------------------------------------------------------------------------
# Monotonic (FCT/Zalesak) limiter — moist_adv_opt=2 (canonical
# advect_scalar_mono)
# ---------------------------------------------------------------------------

def mono_limit(q_pad, phi_old, mu_new, fx, fy, fz, ru_pad, rv_pad, ww,
               dt: float, grid: Grid, hx) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Zalesak flux-corrected transport: the final solution stays within the
    local min/max of the upwind solution and the old field (positivity plus
    no new extrema). Bounds are enforced in coupled units Phi = mu q with
    the new column mass `mu_new` (ny, nx)."""
    q_int = win(q_pad, 0, 0)
    lx = flux1(win(ru_pad, 0, 0, ex=1), win(q_pad, 0, -1, ex=1), win(q_pad, 0, 0, ex=1))
    ly = flux1(win(rv_pad, 0, 0, ey=1), win(q_pad, -1, 0, ey=1), win(q_pad, 0, 0, ey=1))
    lz = vflux(ww, q_int, 1)
    lz = lz.at[..., 0, :, :].set(0.0).at[..., -1, :, :].set(0.0)
    # guaranteed-positive low-order solution (see limit_low_order): without
    # this, phi_td < 0 under summed-CFL > 1 collapses r_minus to 0 and the
    # downstream floor manufactures scalar mass
    lx, ly, lz = limit_low_order(phi_old, lx, ly, lz, dt, grid, hx)
    m2 = (grid.msft * grid.msft) if getattr(grid, "has_msf", False) else None
    m2v = m2[None] if m2 is not None else 1.0
    phi_td = phi_old + dt * flux_div(lx, ly, lz, grid, m_h=m2)

    # local bounds from the 7-point neighborhood of q (old) and q_td
    q_td = phi_td / mu_new[None]
    qtd_pad = hx.pad(q_td, 1)
    wn = lambda a, dy, dx, p: win(a, dy, dx, pad=p)
    neigh = [wn(q_pad, 0, 0, 3), wn(q_pad, 0, 1, 3), wn(q_pad, 0, -1, 3),
             wn(q_pad, 1, 0, 3), wn(q_pad, -1, 0, 3),
             wn(qtd_pad, 0, 0, 1), wn(qtd_pad, 0, 1, 1), wn(qtd_pad, 0, -1, 1),
             wn(qtd_pad, 1, 0, 1), wn(qtd_pad, -1, 0, 1),
             jnp.concatenate([_zsl(q_int, 0, 1),
                              _zsl(q_int, 0, q_int.shape[-3] - 1)], axis=-3),
             jnp.concatenate([_zsl(q_int, 1, q_int.shape[-3]),
                              _zsl(q_int, q_int.shape[-3] - 1,
                                   q_int.shape[-3])], axis=-3)]
    q_max = neigh[0]
    q_min = neigh[0]
    for n_ in neigh[1:]:
        q_max = jnp.maximum(q_max, n_)
        q_min = jnp.minimum(q_min, n_)
    phi_max = q_max * mu_new[None]
    phi_min = jnp.maximum(q_min, 0.0) * mu_new[None]

    ax, ay, az = fx - lx, fy - ly, fz - lz
    rdnw = grid.rdnw.reshape(-1, 1, 1)
    nzf = az.shape[-3]
    # incoming / outgoing antidiffusive sums (in Phi units over dt)
    in_x = jnp.maximum(-ax[..., 1:], 0.0) + jnp.maximum(ax[..., :-1], 0.0)
    out_x = jnp.maximum(ax[..., 1:], 0.0) + jnp.maximum(-ax[..., :-1], 0.0)
    in_y = jnp.maximum(-ay[..., 1:, :], 0.0) + jnp.maximum(ay[..., :-1, :], 0.0)
    out_y = jnp.maximum(ay[..., 1:, :], 0.0) + jnp.maximum(-ay[..., :-1, :], 0.0)
    up_c = -_zsl(az, 1, nzf) * rdnw
    lo_c = _zsl(az, 0, nzf - 1) * rdnw
    in_z = jnp.maximum(up_c, 0.0) + jnp.maximum(lo_c, 0.0)
    p_in = dt * (m2v * (in_x * grid.rdx + in_y * grid.rdy) + in_z)
    out_z = jnp.maximum(-up_c, 0.0) + jnp.maximum(-lo_c, 0.0)
    p_out = dt * (m2v * (out_x * grid.rdx + out_y * grid.rdy) + out_z)
    r_plus = jnp.where(p_in > 0.0,
                       jnp.minimum(1.0, (phi_max - phi_td) / jnp.maximum(p_in, 1e-30)),
                       1.0)
    r_minus = jnp.where(p_out > 0.0,
                        jnp.minimum(1.0, (phi_td - phi_min) / jnp.maximum(p_out, 1e-30)),
                        1.0)
    r_plus = jnp.clip(r_plus, 0.0, 1.0)
    r_minus = jnp.clip(r_minus, 0.0, 1.0)
    g1 = hx.pad_many({"rp": r_plus, "rm": r_minus}, 1)
    rp, rm = g1["rp"], g1["rm"]
    w1 = lambda a, dy, dx, ey=0, ex=0: win(a, dy, dx, ey=ey, ex=ex, pad=1)
    # face factor = min(R- of donor, R+ of receiver)
    ax_f = jnp.where(ax > 0,
                     jnp.minimum(w1(rm, 0, -1, ex=1), w1(rp, 0, 0, ex=1)),
                     jnp.minimum(w1(rm, 0, 0, ex=1), w1(rp, 0, -1, ex=1)))
    ay_f = jnp.where(ay > 0,
                     jnp.minimum(w1(rm, -1, 0, ey=1), w1(rp, 0, 0, ey=1)),
                     jnp.minimum(w1(rm, 0, 0, ey=1), w1(rp, -1, 0, ey=1)))
    rp_ze = _zpad(r_plus, 1)
    rm_ze = _zpad(r_minus, 1)
    rp_lo, rp_hi = _zsl(rp_ze, 0, nzf), _zsl(rp_ze, 1, nzf + 1)
    rm_lo, rm_hi = _zsl(rm_ze, 0, nzf), _zsl(rm_ze, 1, nzf + 1)
    az_f = jnp.where(az > 0,
                     jnp.minimum(rm_hi, rp_lo),   # downward: drains upper k
                     jnp.minimum(rm_lo, rp_hi))
    return lx + ax * ax_f, ly + ay * ay_f, lz + az * az_f
