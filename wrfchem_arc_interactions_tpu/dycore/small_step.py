"""Acoustic (small) substeps: forward-backward horizontal integration +
vertically implicit w-geopotential solve (canonical:
dyn_em/module_small_step_em.F — small_step_prep / advance_uv / advance_mu_t /
advance_w; SURVEY.md §2.1 'Acoustic (small) steps', §3.2).

Formulation (re-derived from the ARW flux-form equations; the linearisation
grouping follows Klemp-Skamarock-Dudhia 2007 in spirit, with products of two
acoustic perturbations dropped):

Perturbations X'' are relative to the RK-stage reference state (suffix
`_ref`); the loop starts from X''(0) = X(t0) - X_ref so that after the
substeps X_ref + X'' realises the RK stage update plus the fast-wave
integral.  Per substep dtau:

1. EOS linearisation (the mu'' terms cancel exactly):
     p'' = (gamma p_ref / Theta_ref) Theta''            [coef_pt]
         + (gamma p_ref rdnw / (alpha_ref mu_ref)) dphi''   [s]
   Divergence damping uses p''_d = p'' + smdiv (p'' - p''_prev).
2. Forward U'', V'' update with the linearised horizontal PGF.
3. Column mass mu'' and the perturbation omega'' by vertical integration of
   the new divergence (closes exactly at the top).
4. Forward Theta'' update advecting the reference theta with the new
   acoustic winds.
5. Implicit W''-phi'' solve: eliminating phi''(new) and p''(new) yields a
   tridiagonal system in W''(new) along z with time off-centering beta
   (epssm); solved by the batched Thomas scan.  Optional implicit Rayleigh
   damping on w (damp_opt=3) adds to the diagonal.

Boundary conditions: phi''(surface) = 0 (the surface geopotential is static);
W'' at the surface is 0 over flat terrain and the kinematic free-slip value
w = u.grad(phi_sfc)/g over orography, evaluated with the substep's new
acoustic winds; p'' = 0 at the model top (constant-pressure lid for the
acoustic modes); omega'' = 0 at both eta boundaries by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.dycore.tridiag import thomas
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.ops.stencil import win
from wrfchem_arc_interactions_tpu.parallel.halo import overlap_stencil
from wrfchem_arc_interactions_tpu.utils.constants import G


def _div(u_pad1, v_pad1, grid: Grid):
    return ((win(u_pad1, 0, 1, pad=1) - win(u_pad1, 0, 0, pad=1)) * grid.rdx
            + (win(v_pad1, 1, 0, pad=1) - win(v_pad1, 0, 0, pad=1)) * grid.rdy)


def acoustic_loop(pp: Dict[str, jax.Array],
                  R: Dict[str, jax.Array],
                  ac: Dict[str, jax.Array],
                  ns: int, dtau: float,
                  grid: Grid, cfg, hx) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Run `ns` acoustic substeps of length `dtau`.

    pp: initial perturbations {u, v, w, th, mu, ph} (coupled U'', V'', W'',
        Theta''; mu'', phi'').
    R: slow tendencies {ru, rv, rw, rth, rph, rmu} held fixed.
    ac: stage-precomputed reference coefficients (see solve.prepare_acoustic).
    Returns (final perturbations, {ru_avg, rv_avg, ww_avg} time-averaged
    total mass fluxes for scalar advection).
    """
    dyn = cfg.dynamics
    beta = dyn.epssm
    bp, bm = 0.5 * (1.0 + beta), 0.5 * (1.0 - beta)
    smdiv = dyn.smdiv
    # External-mode filter (canonical: the emdiv `mudf` term of
    # module_small_step_em.F advance_uv/advance_mu_t): the previous
    # substep's column-mass tendency dmu_ac is the barotropic (external)
    # divergence signal; adding -nu * grad(dmu_ac) to the momentum forcing
    # (nu = emdiv dx^2; dmu_ac ~ -div so div_t picks up -nu k^2 div) damps
    # the external gravity/Lamb mode that the divergence damper (which acts
    # on p'') leaves untouched.
    emdiv = dyn.emdiv

    dnw = grid.dnw.reshape(-1, 1, 1)
    rdnw = grid.rdnw.reshape(-1, 1, 1)

    coef_pt = ac["coef_pt"]      # (nz,ny,nx) gamma p_ref / Theta_ref(coupled)
    s = ac["s"]                  # (nz,ny,nx) gamma p_ref rdnw/(alpha_ref mu_ref)
    inv_mu = ac["inv_mu"]        # (ny,nx)
    eps_w = ac["eps_w"]          # (nz+1,ny,nx)
    rdn_w = ac["rdn_w"]          # (nz+1,1,1) incl. top half-layer metric
    dphdn_ref = ac["dphdn_ref"]  # (nz+1,ny,nx) d(phi_ref)/d(eta) at w levels

    # Map factors (real projections; see dycore/big_step.py docstring).
    # m^2 scales the acoustic divergence and theta flux terms, 1/m the
    # buoyancy of the W'' row, m the (g W/mu) coupling of phi''.  The
    # implicit diagonal K is m-free: the 1/m of the buoyancy cancels the m
    # of the phi coupling exactly (m is constant along a column).
    msf = "msft" in ac
    m_t = ac.get("msft")                         # (ny,nx) or None
    inv_m = ac["inv_msft"][None] if msf else 1.0
    m2 = (m_t * m_t) if msf else None

    def p_of2(th_pp, ph_pp):
        return coef_pt * th_pp + s * (ph_pp[1:] - ph_pp[:-1])

    u, v, w, th, mu, ph = pp["u"], pp["v"], pp["w"], pp["th"], pp["mu"], pp["ph"]
    p_prev = p_of2(th, ph)

    nzp1 = w.shape[0]
    ru_avg = jnp.zeros_like(u)
    rv_avg = jnp.zeros_like(v)
    ww_avg = jnp.zeros_like(w)
    mudf = jnp.zeros_like(mu)          # lagged external-mode signal

    # Overlapped-exchange substep kernels (SURVEY.md §7.3-2: halos inside the
    # innermost loop are THE scaling-efficiency risk).  Each substep does two
    # exchanges; both go through `overlap_stencil`, which issues the X and Y
    # strip ppermutes concurrently up front and computes the block-interior
    # stencil while they are in flight (every stencil below is plus-shaped,
    # so the garbage corners of the overlapped pad are never read).

    # split theta face coefficients into west/east, south/north pairs so all
    # stencil outputs are interior-sized (overlap_stencil's band patching
    # requires it)
    th_x_w, th_x_e = ac["th_x"][:, :, :-1], ac["th_x"][:, :, 1:]
    th_y_s, th_y_n = ac["th_y"][:, :-1, :], ac["th_y"][:, 1:, :]

    def mom_fn(padded, cs):
        """Forward U'', V'' update from padded p_d/ph/mu/mudf."""
        p_pad, ph_pad = padded["p"], padded["ph"]
        mu_pad, mudf_pad = padded["mu"], padded["mudf"]
        dppdx = (win(p_pad, 0, 0, pad=1) - win(p_pad, 0, -1, pad=1)) * grid.rdx
        dphdx_w = (win(ph_pad, 0, 0, pad=1) - win(ph_pad, 0, -1, pad=1)) * grid.rdx
        dphdx = 0.5 * (dphdx_w[:-1] + dphdx_w[1:])
        mu_u = 0.5 * (win(mu_pad, 0, -1, pad=1) + win(mu_pad, 0, 0, pad=1))
        du = (cs["R_ru"] - cs["c_ux"] * dppdx - cs["c_ux2"] * dphdx
              - mu_u[None] * cs["c_ux3"])
        if emdiv > 0.0:
            dxs = 1.0 / grid.rdx
            du = du - (emdiv * dxs) * (win(mudf_pad, 0, 0, pad=1)
                                       - win(mudf_pad, 0, -1, pad=1))[None]
        dppdy = (win(p_pad, 0, 0, pad=1) - win(p_pad, -1, 0, pad=1)) * grid.rdy
        dphdy_w = (win(ph_pad, 0, 0, pad=1) - win(ph_pad, -1, 0, pad=1)) * grid.rdy
        dphdy = 0.5 * (dphdy_w[:-1] + dphdy_w[1:])
        mu_v = 0.5 * (win(mu_pad, -1, 0, pad=1) + win(mu_pad, 0, 0, pad=1))
        dv = (cs["R_rv"] - cs["c_vy"] * dppdy - cs["c_vy2"] * dphdy
              - mu_v[None] * cs["c_vy3"])
        if emdiv > 0.0:
            dys = 1.0 / grid.rdy
            dv = dv - (emdiv * dys) * (win(mudf_pad, 0, 0, pad=1)
                                       - win(mudf_pad, -1, 0, pad=1))[None]
        if grid.has_terrain:
            # sloped-coordinate term: -eps d(phb)/dx * d(p'')/d(eta)
            from wrfchem_arc_interactions_tpu.dycore.diagnostics import ddz_center
            dpdn = ddz_center(win(p_pad, 0, -1, ex=1, pad=1), grid.znu)
            dpdn_u = 0.5 * (dpdn[..., :-1] + dpdn[..., 1:])
            du = du - cs["c_ux4"] * dpdn_u
            dpdn_y = ddz_center(win(p_pad, -1, 0, ey=1, pad=1), grid.znu)
            dpdn_v = 0.5 * (dpdn_y[:, :-1, :] + dpdn_y[:, 1:, :])
            dv = dv - cs["c_vy4"] * dpdn_v
        return {"u": cs["u"] + dtau * du, "v": cs["v"] + dtau * dv}

    def divth_fn(padded, cs):
        """Horizontal divergence + theta horizontal flux divergence from the
        padded new acoustic winds (+ the kinematic surface-w target over
        terrain, which needs the same u/v halos)."""
        u_e = win(padded["u"], 0, 1, pad=1)
        u_w = win(padded["u"], 0, 0, pad=1)
        v_n = win(padded["v"], 1, 0, pad=1)
        v_s = win(padded["v"], 0, 0, pad=1)
        div = (u_e - u_w) * grid.rdx + (v_n - v_s) * grid.rdy
        hdiv_th = ((u_e * cs["th_x_e"] - u_w * cs["th_x_w"]) * grid.rdx
                   + (v_n * cs["th_y_n"] - v_s * cs["th_y_s"]) * grid.rdy)
        if "m2" in cs:
            div = cs["m2"][None] * div
            hdiv_th = cs["m2"][None] * hdiv_th
        out = {"div": div, "hdiv_th": hdiv_th}
        if grid.has_terrain:
            out["wsfc_pp"] = (cs["cwx_w"] * u_w[0] + cs["cwx_e"] * u_e[0]
                              + cs["cwy_s"] * v_s[0] + cs["cwy_n"] * v_n[0])
        return out

    mom_consts = {"R_ru": R["ru"], "R_rv": R["rv"],
                  "c_ux": ac["c_ux"], "c_ux2": ac["c_ux2"], "c_ux3": ac["c_ux3"],
                  "c_vy": ac["c_vy"], "c_vy2": ac["c_vy2"], "c_vy3": ac["c_vy3"]}
    divth_consts = {"th_x_w": th_x_w, "th_x_e": th_x_e,
                    "th_y_s": th_y_s, "th_y_n": th_y_n}
    if msf:
        divth_consts["m2"] = m2
    if grid.has_terrain:
        mom_consts["c_ux4"] = ac["c_ux4"]
        mom_consts["c_vy4"] = ac["c_vy4"]
        for k in ("cwx_w", "cwx_e", "cwy_s", "cwy_n"):
            divth_consts[k] = ac[k]

    for _ in range(ns):
        p_now = p_of2(th, ph)
        p_d = p_now + smdiv * (p_now - p_prev)
        p_prev = p_now

        # --- forward horizontal momentum (overlapped exchange 1) --------
        uv = overlap_stencil(hx, {"p": p_d, "ph": ph, "mu": mu, "mudf": mudf},
                             1, mom_fn, {**mom_consts, "u": u, "v": v},
                             overlap=dyn.overlap_halo)
        u, v = uv["u"], uv["v"]

        # --- divergence + theta fluxes (overlapped exchange 2) ----------
        dd = overlap_stencil(hx, {"u": u, "v": v}, 1, divth_fn, divth_consts,
                             overlap=dyn.overlap_halo)
        div = dd["div"]

        # --- column mass and omega'' ----------------------------------
        dmu_ac = jnp.sum(dnw * div, axis=0)              # (ny,nx)
        mudf = dmu_ac                                    # used next substep
        mu = mu + dtau * (R["rmu"] + dmu_ac)
        incr = dnw * (-dmu_ac[None] - div)
        om = jnp.concatenate([jnp.zeros_like(div[:1]), jnp.cumsum(incr, axis=0)], axis=0)

        # --- forward Theta'' ------------------------------------------
        fz = om * ac["th_z"]
        dth = R["rth"] - (dd["hdiv_th"] + (fz[1:] - fz[:-1]) * rdnw)
        th = th + dtau * dth

        # --- implicit W''-phi'' ---------------------------------------
        a_w = dtau * G * bp * inv_mu                      # (ny,nx)
        gw_m = (G * m_t * inv_mu)[None] if msf else G * inv_mu[None]
        ph_exp_t = (R["rph"] - om * dphdn_ref * inv_mu[None]
                    + gw_m * bm * w)
        ph_exp = ph + dtau * ph_exp_t
        ph_exp = ph_exp.at[0].set(ph[0])                  # phi''_sfc frozen

        p_theta = coef_pt * th                            # Theta''-part of p''(new)
        # explicit part of p''(new) excluding the a_w*W terms
        p_exp = p_theta + s * (ph_exp[1:] - ph_exp[:-1])
        # p'' = 0 above the lid: "up" arrays padded with zero at k = nz
        zero2d = jnp.zeros_like(p_exp[:1])
        p_exp_up = jnp.concatenate([p_exp, zero2d], axis=0)       # (nz+1,...)
        p_exp_dn = jnp.concatenate([zero2d, p_exp], axis=0)
        p_old_up = jnp.concatenate([p_now, zero2d], axis=0)
        p_old_dn = jnp.concatenate([zero2d, p_now], axis=0)
        s_up = jnp.concatenate([s, jnp.zeros_like(s[:1])], axis=0)  # (nz+1,...)
        s_dn = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)

        dpdn_exp = rdn_w * (p_exp_up - p_exp_dn)          # at w levels (k=0 bogus)
        dpdn_old = rdn_w * (p_old_up - p_old_dn)

        K = dtau * G * eps_w * bp * rdn_w * a_w[None]     # (nz+1,ny,nx)
        A = -K * s_dn
        C = -K * s_up
        B = 1.0 + K * (s_up + s_dn) + dtau * ac["w_damp"]
        D = (w + dtau * (R["rw"]
                         + (G * inv_m) * eps_w * (bp * dpdn_exp + bm * dpdn_old)
                         - (G * inv_m) * mu[None]))
        # surface row: flat => W'' = 0; terrain => the kinematic BC
        # w_sfc = (u dx(phi_sfc) + v dy(phi_sfc))/g evaluated with the NEW
        # acoustic winds (wsfc_const carries the reference part and the
        # subtraction of the stage w; wsfc_pp the perturbation-wind part)
        A = A.at[0].set(0.0)
        C = C.at[0].set(0.0)
        B = B.at[0].set(1.0)
        if grid.has_terrain:
            D = D.at[0].set(ac["wsfc_const"] + dd["wsfc_pp"])
        else:
            D = D.at[0].set(0.0)
        w = thomas(A, B, C, D)
        ph = ph_exp + (a_w * m_t if msf else a_w)[None] * w
        ph = ph.at[0].set(ph_exp[0])

        # --- averaged mass fluxes for scalar advection ----------------
        ru_avg = ru_avg + (ac["ru_ref"] + u) * (1.0 / ns)
        rv_avg = rv_avg + (ac["rv_ref"] + v) * (1.0 / ns)
        ww_avg = ww_avg + (ac["ww_ref"] + om) * (1.0 / ns)

    out = {"u": u, "v": v, "w": w, "th": th, "mu": mu, "ph": ph}
    avg = {"ru": ru_avg, "rv": rv_avg, "ww": ww_avg}
    return out, avg
