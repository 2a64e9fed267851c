"""One RK3 split-explicit model timestep — the solve_em equivalent
(canonical: dyn_em/solve_em.F + module_em.F rk_tendency/rk_scalar_tend;
SURVEY.md §3.2 is the load-bearing call order this reproduces):

  for rk_step in 1..3:
      halo exchange (group A, width 3)            <- HALO_EM_A analog
      diagnostics (calc_p_rho_phi)
      large-step tendencies R (advection + PGF + buoyancy + Coriolis + physics)
      acoustic loop (1, ns/2, ns substeps)        <- halos inside (HALO_EM_C)
      scalar advection (stage winds; final stage: time-averaged acoustic
      mass fluxes + PD limiter)                   <- HALO_EM_MOIST/CHEM analog

The whole function is pure (State -> State) and jit/shard_map friendly; all
halo traffic flows through the HaloOps context.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.config.namelist import AdvLimiter
from wrfchem_arc_interactions_tpu.dycore import advection as adv
from wrfchem_arc_interactions_tpu.dycore import big_step as bs
from wrfchem_arc_interactions_tpu.dycore.diagnostics import Diag, diagnose
from wrfchem_arc_interactions_tpu.dycore.small_step import acoustic_loop
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.ops.stencil import avg_z_centers_to_faces, win
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.registry.state import State, advected_names
from wrfchem_arc_interactions_tpu.utils import constants as c


def _mu_u(mu_full_pad, pad=3):
    """mu at u faces, valid over the padded region except the outer ring."""
    return 0.5 * (mu_full_pad + jnp.roll(mu_full_pad, 1, axis=-1))


def _mu_v(mu_full_pad, pad=3):
    return 0.5 * (mu_full_pad + jnp.roll(mu_full_pad, 1, axis=-2))


def _dphi_deta_w(ph_pert, grid: Grid):
    """d(phi_full)/d(eta) at w levels (interior arrays)."""
    znw = grid.znw.reshape(-1, 1, 1)
    dint = (ph_pert[2:] - ph_pert[:-2]) / (znw[2:] - znw[:-2])
    dtop = (ph_pert[-1:] - ph_pert[-2:-1]) / (znw[-1:] - znw[-2:-1])
    dbot = (ph_pert[1:2] - ph_pert[0:1]) / (znw[1:2] - znw[0:1])
    alb_w = avg_z_centers_to_faces(grid.alb, grid.fnm, grid.fnp)
    return jnp.concatenate([dbot, dint, dtop], axis=0) - grid.mub[None] * alb_w


def _rdn_w(grid: Grid):
    top = (-1.0 / grid.znu[-1]).reshape(1)
    return jnp.concatenate([jnp.ones(1, grid.rdn.dtype), grid.rdn[1:], top]).reshape(-1, 1, 1)


# w_damping=1 analog (canonical module_em.F rk_tendency 'w damping'): where
# the vertical Courant number exceeds W_DAMP_BETA, damp w toward zero with a
# rate proportional to the excess.  Applied IMPLICITLY through the acoustic
# tridiagonal diagonal (more stable than the reference's explicit tendency
# version, and branchless: a relu instead of an IF).
W_DAMP_BETA = 0.9
W_DAMP_ALPHA = 2.0


def _w_damp_profile(grid: Grid, cfg: Config):
    """Implicit Rayleigh w-damping coefficient at w levels (damp_opt=3)."""
    dyn = cfg.dynamics
    if cfg.dynamics.damp_opt != 3:
        return jnp.zeros((1, 1, 1), grid.phb.dtype)
    z_w = grid.phb / c.G                       # (nz+1, ny, nx) base heights
    z_top = z_w[-1:]
    zd = z_top - dyn.zdamp
    frac = jnp.clip((z_w - zd) / jnp.maximum(dyn.zdamp, 1.0), 0.0, 1.0)
    return dyn.dampcoef * jnp.sin(0.5 * jnp.pi * frac) ** 2


def step(state: State, grid: Grid, cfg: Config, hx: HaloOps, dt: float,
         phys_tend: Optional[Dict[str, jax.Array]] = None) -> State:
    """Advance the dynamical state one dt (physics tendencies held fixed)."""
    dyn = cfg.dynamics
    moist = cfg.moist_species()
    scalars = advected_names(cfg)
    ns_total = cfg.n_acoustic
    pt = phys_tend or {}

    # ---- chem-scalar stage split (canonical: solve_em.F advects the
    # chem/tracer 4D arrays ONLY on the final RK3 step — one flux-form
    # update from the step-start value with the time-averaged acoustic
    # mass fluxes and PD/monotonic limiting — while moist and TKE ride
    # every stage because diagnose()/physics consume their stage values).
    # Besides matching the reference, this cuts chem advection work and
    # the stage-0/1 scalar halo traffic by 3x.
    stage_set = set(moist) | {"tke", "qke"} | set(pt)
    if dyn.chem_adv_final_only:
        final_scalars = tuple(q for q in scalars if q not in stage_set)
    else:
        final_scalars = ()
    stage_scalars = tuple(q for q in scalars if q not in final_scalars)

    h_m, v_m = dyn.h_mom_adv_order.value, dyn.v_mom_adv_order.value
    h_s, v_s = dyn.h_sca_adv_order.value, dyn.v_sca_adv_order.value

    w_damp = _w_damp_profile(grid, cfg)
    rdn_w = _rdn_w(grid)

    # ---- map-factor coupling (grid.has_msf: U = mu u / m, W = mu w / m;
    # the flat path keeps m == 1 with zero extra work) -----------------
    msf = grid.has_msf
    inv_mu_f = 1.0 / grid.msfu if msf else None      # (ny,nx) at u faces
    inv_mv_f = 1.0 / grid.msfv if msf else None
    inv_mt = 1.0 / grid.msft if msf else None
    m2_t = grid.msft * grid.msft if msf else None

    # ---- step-start (t0) coupled quantities --------------------------
    mu_full_0 = grid.mub + state["mu"]
    g0 = hx.pad_many({"u": state["u"], "v": state["v"], "mu": mu_full_0}, 1)
    mu_u0 = win(_mu_u(g0["mu"]), 0, 0, pad=1)
    mu_v0 = win(_mu_v(g0["mu"]), 0, 0, pad=1)
    if msf:
        mu_u0 = mu_u0 * inv_mu_f
        mu_v0 = mu_v0 * inv_mv_f
    cpl0 = {
        "u": mu_u0[None] * state["u"],
        "v": mu_v0[None] * state["v"],
        "w": (mu_full_0 * inv_mt if msf else mu_full_0)[None] * state["w"],
        "th": mu_full_0[None] * (state["t"] + c.T0),
        "mu": state["mu"],
        "ph": state["ph"],
    }

    # ---- scalar batching decision ------------------------------------
    # Three paths (round-3/round-5 A/Bs on the v5e):
    # - unrolled per-tracer loop: fastest at moist-only counts (3-7), and
    #   the only path for tracers carrying physics tendencies;
    # - lax.scan over the stacked tracers (scan_tracer_min, DEFAULT for
    #   chemistry configs): the advection/limiter body traces ONCE, so the
    #   HLO is O(1) in tracer count (kills the 200x200 cold-compile
    #   blowup) and it measured FASTER than the unrolled loop (5.7 vs
    #   6.2 ms plain, 7.8 vs 10.4 ms PD at 44 tracers);
    # - one batched (n_tracers, nz, ny, nx) pass (stack_tracer_min,
    #   default off): XLA's 4D-batched stencil layouts measured slower at
    #   every tracer count, kept for program-size-bound uses.
    use_stack = len(stage_scalars) >= dyn.stack_tracer_min
    scan_names: tuple = ()
    if not use_stack and len(stage_scalars) >= dyn.scan_tracer_min:
        scan_names = stage_scalars
    loop_names = tuple(q for q in stage_scalars if q not in scan_names)
    if final_scalars:
        sc_fin = jnp.stack([state[q] for q in final_scalars])
        phi_fin = mu_full_0[None, None] * sc_fin
    if use_stack:
        sc_stack = jnp.stack([state[q] for q in stage_scalars])
        phi_old_st = mu_full_0[None, None] * sc_stack
        moist_idx = {q: stage_scalars.index(q) for q in moist
                     if q in stage_scalars}
        if any(q in pt for q in stage_scalars):
            shp3 = state["t"].shape
            dtype = state["t"].dtype
            pt_stack = jnp.stack(
                [jnp.broadcast_to(jnp.asarray(pt.get(q, 0.0), dtype), shp3)
                 for q in stage_scalars])
        else:
            pt_stack = None
        phi_old = None
    else:
        phi_old = {name: mu_full_0[None] * state[name] for name in loop_names}
        if scan_names:
            sc_scan = jnp.stack([state[q] for q in scan_names])
            phi_scan = mu_full_0[None, None] * sc_scan
            moist_scan = {q: scan_names.index(q) for q in moist
                          if q in scan_names}
            # physics tendencies ride the scan as a third input, stacked
            # ONCE per step (pt is stage-invariant); an all-zero broadcast
            # stub keeps the body uniform when no tracer carries one
            dtype = state["t"].dtype
            if any(q in pt for q in scan_names):
                shp3 = state["t"].shape
                pt_scan = jnp.stack(
                    [jnp.broadcast_to(jnp.asarray(pt.get(q, 0.0), dtype),
                                      shp3) for q in scan_names])
            else:
                pt_scan = jnp.zeros((len(scan_names), 1, 1, 1), dtype)

    stage_state = state
    stage_dts = [dt / 3.0, dt / 2.0, dt]
    stage_ns = [1, max(ns_total // 2, 1), ns_total]

    for istage in range(3):
        dts = stage_dts[istage]
        ns = stage_ns[istage]
        dtau = dts / ns

        diag = diagnose(stage_state, grid, moist)
        mu_full = diag.mu_full

        # ---- group-A halo exchange (width 3) -------------------------
        fields = {
            "u": stage_state["u"], "v": stage_state["v"], "w": stage_state["w"],
            "ph": stage_state["ph"], "t": stage_state["t"],
            "mu": mu_full, "p": diag.p_pert, "al": diag.alpha_d, "eps": diag.eps_ratio,
        }
        if grid.has_terrain:
            # time-invariant base-state fields ride the group-A exchange
            # (packed into the same-shape stacks, so no extra ppermutes)
            fields["phb"] = grid.phb
            fields["mub"] = grid.mub
            fields["alb"] = grid.alb
        if msf:
            # map factors ride the exchange too (time-invariant, needed in
            # the halo to build the coupled fluxes U = mu u / m there)
            fields["msfu"] = grid.msfu
            fields["msfv"] = grid.msfv
        if use_stack:
            fields["_scalars"] = sc_stack
        else:
            for q in loop_names:
                fields[q] = stage_state[q]
            if scan_names:
                fields["_scan"] = sc_scan
        if istage == 2 and final_scalars:
            # chem tracers join the exchange only on the final stage (their
            # state still holds the step-start values — exactly the phi_t
            # the canonical final-stage flux update advects)
            fields["_final"] = sc_fin
        gA = hx.pad_many(fields, 3)
        base_pads = ({"phb": gA["phb"], "mub": gA["mub"], "alb": gA["alb"]}
                     if grid.has_terrain else None)

        mu_u_pad = _mu_u(gA["mu"])
        mu_v_pad = _mu_v(gA["mu"])
        if msf:
            ru_pad = mu_u_pad[None] * gA["u"] / gA["msfu"][None]
            rv_pad = mu_v_pad[None] * gA["v"] / gA["msfv"][None]
        else:
            ru_pad = mu_u_pad[None] * gA["u"]
            rv_pad = mu_v_pad[None] * gA["v"]
        dmudt, ww = bs.omega_diagnosis(ru_pad, rv_pad, grid, hx)
        ww_pad = hx.pad(ww, 3)
        th_full_pad = gA["t"] + c.T0
        U_pad = ru_pad  # coupled U == mass flux at u faces
        V_pad = rv_pad

        # ---- large-step tendencies R --------------------------------
        pgf_u, pgf_v = bs.pgf_uv(gA["p"], gA["ph"], gA["al"], gA["eps"], gA["mu"],
                                 grid, base_pads=base_pads)
        cor_u, cor_v = bs.coriolis_uv(gA["u"], gA["v"], gA["mu"], grid)
        mu_u = win(mu_u_pad, 0, 0)
        mu_v = win(mu_v_pad, 0, 0)
        # physics tendencies couple into the momentum-flux units mu/m
        mu_u_c = mu_u * inv_mu_f if msf else mu_u
        mu_v_c = mu_v * inv_mv_f if msf else mu_v

        R = {}
        R["ru"] = (adv.advect_u(gA["u"], ru_pad, rv_pad, ww_pad, grid, h_m, v_m)
                   + pgf_u + cor_u + mu_u_c[None] * pt.get("u", 0.0))
        R["rv"] = (adv.advect_v(gA["v"], ru_pad, rv_pad, ww_pad, grid, h_m, v_m)
                   + pgf_v + cor_v + mu_v_c[None] * pt.get("v", 0.0))
        rw_adv = adv.advect_w(gA["w"], ru_pad, rv_pad, ww, grid, h_m, v_m)
        buoy = bs.buoyancy_w(diag.p_pert, diag.eps_ratio, stage_state["mu"], grid)
        R["rw"] = (rw_adv + buoy).at[0].set(0.0)
        if dyn.w_damping:
            # runaway-updraft protection (w_damping=1; canonical module_em.F
            # 'w-damping'): Rayleigh-damp the coupled W where the vertical
            # Courant number of the stage omega exceeds W_DAMP_BETA; the rate
            # is clamped so the explicit RK integration stays stable.
            cflv = jnp.abs(ww) * dt * rdn_w / mu_full[None]
            rate = jnp.minimum(
                W_DAMP_ALPHA * jnp.maximum(cflv - W_DAMP_BETA, 0.0), 0.3)
            mu_w_c = mu_full * inv_mt if msf else mu_full
            R["rw"] = R["rw"] - (rate / dt) * (mu_w_c[None] * stage_state["w"])
        R["rth"] = (adv.advect_scalar(th_full_pad, ru_pad, rv_pad, ww, grid, h_s, v_s)
                    + mu_full[None] * pt.get("th", 0.0))
        # rphi takes the *coupled* W (= mu w) so its g W / mu term reduces to
        # g w, matching the acoustic loop's (g/mu) W'' fast term exactly —
        # any mismatch in the fast terms between R and the acoustic
        # linearisation is integrated explicitly at the RK dt and blows up
        # the vertical acoustic modes (see scripts/acoustic_stability.py).
        R["rph"] = bs.rphi_tendency(U_pad, V_pad, gA["ph"],
                                    mu_full[None] * stage_state["w"], ww,
                                    mu_full, grid,
                                    phb_pad=gA.get("phb"))
        R["rmu"] = dmudt

        # ---- acoustic coefficients ----------------------------------
        th_cpl = mu_full[None] * (stage_state["t"] + c.T0)
        eal_pad = gA["eps"] * gA["al"]
        eal_u = 0.5 * (win(eal_pad, 0, -1) + win(eal_pad, 0, 0))
        eal_v = 0.5 * (win(eal_pad, -1, 0) + win(eal_pad, 0, 0))
        eps_u = 0.5 * (win(gA["eps"], 0, -1) + win(gA["eps"], 0, 0))
        eps_v = 0.5 * (win(gA["eps"], -1, 0) + win(gA["eps"], 0, 0))
        from wrfchem_arc_interactions_tpu.dycore.diagnostics import ddz_center
        dpdn = ddz_center(win(gA["p"], 0, -1, ex=1), grid.znu)
        dpdn_u = 0.5 * (dpdn[..., :-1] + dpdn[..., 1:])
        dpdn_y = ddz_center(win(gA["p"], -1, 0, ey=1), grid.znu)
        dpdn_v = 0.5 * (dpdn_y[:, :-1, :] + dpdn_y[:, 1:, :])
        dpdx_ref = (win(gA["p"], 0, 0) - win(gA["p"], 0, -1)) * grid.rdx
        dpdy_ref = (win(gA["p"], 0, 0) - win(gA["p"], -1, 0)) * grid.rdy

        ac = {
            "coef_pt": c.GAMMA * diag.p_full / th_cpl,
            "s": c.GAMMA * diag.p_full * grid.rdnw.reshape(-1, 1, 1)
                 / (diag.alpha_d * mu_full[None]),
            "inv_mu": 1.0 / mu_full,
            "eps_w": avg_z_centers_to_faces(diag.eps_ratio, grid.fnm, grid.fnp),
            "rdn_w": rdn_w,
            "dphdn_ref": _dphi_deta_w(stage_state["ph"], grid),
            "c_ux": win(mu_u_pad, 0, 0)[None] * eal_u,
            "c_vy": win(mu_v_pad, 0, 0)[None] * eal_v,
            "c_ux2": eps_u * (grid.mub[None] + dpdn_u),
            "c_vy2": eps_v * (grid.mub[None] + dpdn_v),
            "c_ux3": eal_u * dpdx_ref,
            "c_vy3": eal_v * dpdy_ref,
            "th_x": 0.5 * (win(th_full_pad, 0, -1, ex=1) + win(th_full_pad, 0, 0, ex=1)),
            "th_y": 0.5 * (win(th_full_pad, -1, 0, ey=1) + win(th_full_pad, 0, 0, ey=1)),
            "th_z": avg_z_centers_to_faces(stage_state["t"] + c.T0, grid.fnm, grid.fnp),
            "w_damp": w_damp,
            "ru_ref": win(ru_pad, 0, 0),
            "rv_ref": win(rv_pad, 0, 0),
            "ww_ref": ww,
        }
        if msf:
            # acoustic-loop map factors: m^2 scales the divergence/theta
            # flux terms, 1/m the buoyancy of the implicit W row, m the
            # g W / mu coupling of the phi equation (small_step.py)
            ac["msft"] = grid.msft
            ac["inv_msft"] = inv_mt

        if grid.has_terrain:
            # Sloped-coordinate metric terms for the acoustic linearisation
            # (canonical: the ph_b gradients of module_small_step_em.F
            # advance_uv).  Linearising the terrain PGF term
            #   F = eps d(phb)/dx [mu alpha_d/alb - mub - d(p')/d(eta)]
            # around the stage reference gives a mu''-coefficient (folded
            # into c_ux3) and a d(p'')/d(eta)-coefficient (c_ux4).
            mub_u = 0.5 * (win(gA["mub"], 0, -1) + win(gA["mub"], 0, 0))
            mub_v = 0.5 * (win(gA["mub"], -1, 0) + win(gA["mub"], 0, 0))
            alb_u = 0.5 * (win(gA["alb"], 0, -1) + win(gA["alb"], 0, 0))
            alb_v = 0.5 * (win(gA["alb"], -1, 0) + win(gA["alb"], 0, 0))
            ald_u = 0.5 * (win(gA["al"], 0, -1) + win(gA["al"], 0, 0))
            ald_v = 0.5 * (win(gA["al"], -1, 0) + win(gA["al"], 0, 0))
            dphbdx_w = (win(gA["phb"], 0, 0, ex=1)
                        - win(gA["phb"], 0, -1, ex=1)) * grid.rdx
            dphbdx = 0.5 * (dphbdx_w[:-1, :, :-1] + dphbdx_w[1:, :, :-1])
            dphbdy_w = (win(gA["phb"], 0, 0, ey=1)
                        - win(gA["phb"], -1, 0, ey=1)) * grid.rdy
            dphbdy = 0.5 * (dphbdy_w[:-1, :-1, :] + dphbdy_w[1:, :-1, :])
            ac["c_ux2"] = eps_u * (mub_u[None] + dpdn_u)
            ac["c_vy2"] = eps_v * (mub_v[None] + dpdn_v)
            ac["c_ux3"] = eal_u * dpdx_ref - eps_u * dphbdx * (ald_u / alb_u)
            ac["c_vy3"] = eal_v * dpdy_ref - eps_v * dphbdy * (ald_v / alb_v)
            ac["c_ux4"] = eps_u * dphbdx
            ac["c_vy4"] = eps_v * dphbdy

            # kinematic surface BC  w_sfc = (u dxphi_sfc + v dyphi_sfc)/g,
            # split into a reference part (wsfc_const) and coefficients for
            # the acoustic wind perturbations at the four surrounding faces
            mu_u_facex = win(mu_u_pad, 0, 0, ex=1)            # faces 0..nx
            mu_v_facey = win(mu_v_pad, 0, 0, ey=1)
            dhdx_f = dphbdx_w[0] / c.G                        # (ny, nx+1)
            dhdy_f = dphbdy_w[0] / c.G
            if msf:
                # physical winds from the /m-coupled fluxes; the coupled-W
                # target scales by mu/m_t
                msfu_fx = win(gA["msfu"], 0, 0, ex=1)
                msfv_fy = win(gA["msfv"], 0, 0, ey=1)
                mu_w_cpl = mu_full * inv_mt
            else:
                msfu_fx = jnp.ones_like(mu_u_facex)
                msfv_fy = jnp.ones_like(mu_v_facey)
                mu_w_cpl = mu_full
            u_ref_f = win(ru_pad, 0, 0, ex=1)[0] * msfu_fx / mu_u_facex
            v_ref_f = win(rv_pad, 0, 0, ey=1)[0] * msfv_fy / mu_v_facey
            w_ref_sfc = 0.5 * (u_ref_f[:, :-1] * dhdx_f[:, :-1]
                               + u_ref_f[:, 1:] * dhdx_f[:, 1:]
                               + v_ref_f[:-1, :] * dhdy_f[:-1, :]
                               + v_ref_f[1:, :] * dhdy_f[1:, :])
            ac["wsfc_const"] = mu_w_cpl * (w_ref_sfc - stage_state["w"][0])
            ac["cwx_w"] = mu_w_cpl * 0.5 * dhdx_f[:, :-1] * msfu_fx[:, :-1] / mu_u_facex[:, :-1]
            ac["cwx_e"] = mu_w_cpl * 0.5 * dhdx_f[:, 1:] * msfu_fx[:, 1:] / mu_u_facex[:, 1:]
            ac["cwy_s"] = mu_w_cpl * 0.5 * dhdy_f[:-1, :] * msfv_fy[:-1, :] / mu_v_facey[:-1, :]
            ac["cwy_n"] = mu_w_cpl * 0.5 * dhdy_f[1:, :] * msfv_fy[1:, :] / mu_v_facey[1:, :]

        # ---- acoustic perturbation initial values -------------------
        cplref = {
            "u": ac["ru_ref"], "v": ac["rv_ref"],
            "w": (mu_full * inv_mt if msf else mu_full)[None] * stage_state["w"],
            "th": th_cpl, "mu": stage_state["mu"], "ph": stage_state["ph"],
        }
        if istage == 0:
            pp = {k: jnp.zeros_like(v) for k, v in cplref.items()}
        else:
            pp = {k: cpl0[k] - cplref[k] for k in cplref}

        pp_out, avg_flux = acoustic_loop(pp, R, ac, ns, dtau, grid, cfg, hx)

        # ---- assemble the new stage state ---------------------------
        mu_new = cplref["mu"] + pp_out["mu"]
        mu_full_new = grid.mub + mu_new
        gmu = hx.pad(mu_full_new, 1)
        mu_u_new = win(_mu_u(gmu), 0, 0, pad=1)
        mu_v_new = win(_mu_v(gmu), 0, 0, pad=1)
        if msf:
            mu_u_new = mu_u_new * inv_mu_f
            mu_v_new = mu_v_new * inv_mv_f
        mu_w_new = mu_full_new * inv_mt if msf else mu_full_new
        new = dict(stage_state)
        new["u"] = (cplref["u"] + pp_out["u"]) / mu_u_new[None]
        new["v"] = (cplref["v"] + pp_out["v"]) / mu_v_new[None]
        new["w"] = (cplref["w"] + pp_out["w"]) / mu_w_new[None]
        new["t"] = (cplref["th"] + pp_out["th"]) / mu_full_new[None] - c.T0
        new["mu"] = mu_new
        new["ph"] = cplref["ph"] + pp_out["ph"]

        # ---- scalars -------------------------------------------------
        # Two production paths (gate: dyn.stack_tracer_min, see the
        # batching decision above): a per-tracer loop for small moist-only
        # sets, and ONE stacked (n_tracers, nz, ny, nx) pass — the
        # advection/limiter operators batch over leading axes — for
        # chemistry-laden configs where 3 stages x n_tracers operator
        # instantiations dominated both the HLO size and the dispatch
        # count.
        final = istage == 2
        if final:
            gF = hx.pad_many({"ru": avg_flux["ru"], "rv": avg_flux["rv"]}, 3)
            ru_s, rv_s, ww_s = gF["ru"], gF["rv"], avg_flux["ww"]
        else:
            ru_s, rv_s, ww_s = ru_pad, rv_pad, ww
        if use_stack:
            q_pad = gA["_scalars"]
            fx, fy, fz = adv.scalar_fluxes(q_pad, ru_s, rv_s, ww_s, h_s, v_s)
            if final and dyn.moist_adv_opt == AdvLimiter.POSITIVE_DEFINITE:
                fx, fy, fz = adv.pd_limit(q_pad, phi_old_st, fx, fy, fz,
                                          ru_s, rv_s, ww_s, dts, grid, hx)
            elif final and dyn.moist_adv_opt == AdvLimiter.MONOTONIC:
                fx, fy, fz = adv.mono_limit(q_pad, phi_old_st, mu_full_new,
                                            fx, fy, fz, ru_s, rv_s, ww_s,
                                            dts, grid, hx)
            tend = adv.flux_div(fx, fy, fz, grid, m_h=m2_t)
            if pt_stack is not None:
                tend = tend + mu_full[None, None] * pt_stack
            sc_new = (phi_old_st + dts * tend) / mu_full_new[None, None]
            if final and dyn.moist_adv_opt != AdvLimiter.NONE:
                sc_new = jnp.maximum(sc_new, 0.0)
            sc_stack = sc_new
            # diagnose() needs the moist subset in the state dict each
            # stage; everything else unstacks only once, at the end
            for q in moist:
                if q in moist_idx:
                    new[q] = sc_new[moist_idx[q]]
            if final:
                for i, q in enumerate(stage_scalars):
                    new[q] = sc_new[i]
        else:
            for q in loop_names:
                q_pad = gA[q]
                fx, fy, fz = adv.scalar_fluxes(q_pad, ru_s, rv_s, ww_s,
                                               h_s, v_s)
                if final and dyn.moist_adv_opt == AdvLimiter.POSITIVE_DEFINITE:
                    fx, fy, fz = adv.pd_limit(q_pad, phi_old[q], fx, fy, fz,
                                              ru_s, rv_s, ww_s, dts, grid, hx)
                elif final and dyn.moist_adv_opt == AdvLimiter.MONOTONIC:
                    fx, fy, fz = adv.mono_limit(q_pad, phi_old[q],
                                                mu_full_new,
                                                fx, fy, fz, ru_s, rv_s, ww_s,
                                                dts, grid, hx)
                tend = (adv.flux_div(fx, fy, fz, grid, m_h=m2_t)
                        + mu_full[None] * pt.get(q, 0.0))
                qn = (phi_old[q] + dts * tend) / mu_full_new[None]
                if final and dyn.moist_adv_opt != AdvLimiter.NONE:
                    qn = jnp.maximum(qn, 0.0)
                new[q] = qn
            if scan_names:
                # one traced advection body for ALL scan tracers
                def scan_body(_, inp, final=final, mu_new=mu_full_new,
                              ru_s=ru_s, rv_s=rv_s, ww_s=ww_s, dts=dts):
                    q_pad, phi_q, pt_q = inp
                    fx, fy, fz = adv.scalar_fluxes(q_pad, ru_s, rv_s, ww_s,
                                                   h_s, v_s)
                    if final and dyn.moist_adv_opt == AdvLimiter.POSITIVE_DEFINITE:
                        fx, fy, fz = adv.pd_limit(q_pad, phi_q, fx, fy, fz,
                                                  ru_s, rv_s, ww_s, dts,
                                                  grid, hx)
                    elif final and dyn.moist_adv_opt == AdvLimiter.MONOTONIC:
                        fx, fy, fz = adv.mono_limit(q_pad, phi_q, mu_new,
                                                    fx, fy, fz, ru_s, rv_s,
                                                    ww_s, dts, grid, hx)
                    tend = (adv.flux_div(fx, fy, fz, grid, m_h=m2_t)
                            + mu_full[None] * pt_q)
                    qn = (phi_q + dts * tend) / mu_new[None]
                    if final and dyn.moist_adv_opt != AdvLimiter.NONE:
                        qn = jnp.maximum(qn, 0.0)
                    return None, qn

                _, sc_new = jax.lax.scan(scan_body, None,
                                         (gA["_scan"], phi_scan, pt_scan))
                sc_scan = sc_new
                for q, i in moist_scan.items():
                    new[q] = sc_new[i]
                if final:
                    for i, q in enumerate(scan_names):
                        new[q] = sc_new[i]

        if final and final_scalars:
            # ---- chem tracers: ONE final-stage flux-form update from the
            # step-start value with the time-averaged acoustic mass fluxes
            # and the chem_adv_opt limiter (canonical solve_em.F chem /
            # tracer treatment); a lax.scan keeps the HLO O(1) in species
            # count.
            def fin_body(_, inp, mu_new=mu_full_new,
                         ru_s=ru_s, rv_s=rv_s, ww_s=ww_s, dts=dts):
                q_pad, phi_q = inp
                fx, fy, fz = adv.scalar_fluxes(q_pad, ru_s, rv_s, ww_s,
                                               h_s, v_s)
                if dyn.chem_adv_opt == AdvLimiter.POSITIVE_DEFINITE:
                    fx, fy, fz = adv.pd_limit(q_pad, phi_q, fx, fy, fz,
                                              ru_s, rv_s, ww_s, dts,
                                              grid, hx)
                elif dyn.chem_adv_opt == AdvLimiter.MONOTONIC:
                    fx, fy, fz = adv.mono_limit(q_pad, phi_q, mu_new,
                                                fx, fy, fz, ru_s, rv_s,
                                                ww_s, dts, grid, hx)
                tend = adv.flux_div(fx, fy, fz, grid, m_h=m2_t)
                qn = (phi_q + dts * tend) / mu_new[None]
                if dyn.chem_adv_opt != AdvLimiter.NONE:
                    qn = jnp.maximum(qn, 0.0)
                return None, qn

            _, fin_new = jax.lax.scan(fin_body, None, (gA["_final"], phi_fin))
            for i, q in enumerate(final_scalars):
                new[q] = fin_new[i]

        if dyn.fft_filter_lat < 90.0:
            # global lat-lon runs: zonally truncate the poleward rows after
            # each stage's updates (the solve_em.F pxft call sites), sharp
            # truncation on the dynamical fields, tapered + clipped on
            # positive-definite scalars (dycore/polar_filter.py)
            from wrfchem_arc_interactions_tpu.dycore.polar_filter import (
                PolarFilter,
            )
            pf = PolarFilter(grid, dyn.fft_filter_lat, new["t"].shape[-1])
            new = pf.momentum(new)
            for q in (scalars if final else stage_scalars):
                new[q] = pf.scalar(new[q])

        stage_state = new

    return stage_state
