"""Physics orchestration (canonical: the first_rk_step_part1/2 physics-call
sequence + microphysics_driver placement of solve_em; SURVEY.md §3.2).

Two hooks around the dynamical step, matching the reference's operator
splitting:

- `pre_dynamics(state, ...) -> (state, phys_tend)`: radiation (on the radt
  alarm; updates the held rthraten_* fields), surface layer, PBL, cumulus,
  plus diffusion — everything whose tendencies are computed once per dt and
  held through the RK stages.
- `post_dynamics(state, ...) -> state`: microphysics (saturation adjustment
  etc. operate on the post-advection state), and the chem driver on its
  chemdt alarm (chem.driver).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.config.namelist import (
    CUScheme, MPScheme, PBLScheme, RAScheme, SFScheme,
)
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.dycore.diffusion import diffusion_tendencies
from wrfchem_arc_interactions_tpu.utils import constants as c_
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.registry.state import State, advected_names


def pre_dynamics(state: State, grid: Grid, cfg: Config, hx: HaloOps, dt: float,
                 do_radiation: bool, time_s: float) -> Tuple[State, Dict[str, jax.Array]]:
    phys = cfg.physics
    moist = cfg.moist_species()
    tend: Dict[str, jax.Array] = {}
    state = dict(state)

    if do_radiation and (phys.ra_sw_physics != RAScheme.NONE
                         or phys.ra_lw_physics != RAScheme.NONE):
        from wrfchem_arc_interactions_tpu.physics.radiation.driver import radiation_driver
        state = radiation_driver(state, grid, cfg, time_s)

    # held radiative heating applied every step (the rthraten pattern)
    if "rthraten_sw" in state:
        tend["th"] = state["rthraten_sw"] + state["rthraten_lw"]

    if phys.sf_sfclay_physics != SFScheme.NONE or phys.bl_pbl_physics != PBLScheme.NONE:
        if phys.bl_pbl_physics == PBLScheme.MYNN:
            from wrfchem_arc_interactions_tpu.physics.pbl_mynn import (
                mynn_column,
            )
            state, pbl_tend = mynn_column(state, grid, cfg, dt)
        else:
            from wrfchem_arc_interactions_tpu.physics.pbl import (
                surface_and_pbl,
            )
            state, pbl_tend = surface_and_pbl(state, grid, cfg, dt)
        for k, v in pbl_tend.items():
            tend[k] = tend.get(k, 0.0) + v

    if phys.tke_heat_flux > 0.0:
        # em_les's imposed kinematic surface heat flux [K m/s]: a theta
        # source in the lowest layer driving the resolved convection (the
        # LES case's surface forcing; vertical transport is the resolved
        # motion + the TKE closure)
        ph_full = grid.phb + state["ph"]
        dz0 = (ph_full[1] - ph_full[0]) / c_.G
        src = jnp.zeros_like(state["t"]).at[0].set(phys.tke_heat_flux / dz0)
        tend["th"] = tend.get("th", 0.0) + src

    if phys.cu_physics != CUScheme.NONE:
        # cumulus_driver slot of first_rk_step_part1 (SURVEY.md §3.2):
        # tendencies held through the RK stages like the other physics.
        from wrfchem_arc_interactions_tpu.utils import constants as cc
        diag = diagnose(state, grid, moist)
        pii = (diag.p_full / cc.P0) ** cc.RCP
        rho = 1.0 / (diag.alpha_d * diag.eps_ratio)
        ph_full = grid.phb + state["ph"]
        dz = (ph_full[1:] - ph_full[:-1]) / cc.G
        if phys.cu_physics == CUScheme.BMJ:
            from wrfchem_arc_interactions_tpu.physics.cumulus import bmj_adjust
            cu_tend, precip = bmj_adjust(diag.theta, state["qv"], diag.p_full,
                                         rho, dz, dt)
        elif phys.cu_physics == CUScheme.GRELL:
            from wrfchem_arc_interactions_tpu.physics.cumulus_grell import (
                grell_ensemble,
            )
            cu_tend, precip = grell_ensemble(diag.theta, state["qv"],
                                             diag.p_full, rho, dz, dt)
        else:
            from wrfchem_arc_interactions_tpu.physics.cumulus_kf import kf_mass_flux
            cu_tend, precip = kf_mass_flux(diag.theta, state["qv"],
                                           diag.p_full, rho, dz, dt)
        for k, v in cu_tend.items():
            tend[k] = tend.get(k, 0.0) + v
        state["rainc"] = state["rainc"] + precip * dt

    if cfg.dynamics.diff_opt.value != "none":
        scalars = advected_names(cfg)
        d = diffusion_tendencies(state, grid, cfg, hx, dt, scalars)
        for k, v in d.items():
            tend[k] = tend.get(k, 0.0) + v

    dyn = cfg.dynamics
    if dyn.sppt_amp > 0.0 or dyn.skebs_amp > 0.0:
        # stochastic physics (SPPT on the assembled tendencies, SKEBS on
        # momentum) — the module_stoch.F slot
        from wrfchem_arc_interactions_tpu.dycore import stoch
        step_no = jnp.round(time_s / dt).astype(jnp.uint32)
        if dyn.sppt_amp > 0.0:
            pat = stoch.evolve_pattern(state["sppt_pattern"], hx, dt,
                                       step_no, seed=0)
            state["sppt_pattern"] = pat
            tend = stoch.apply_sppt(tend, pat, dyn.sppt_amp)
        if dyn.skebs_amp > 0.0:
            psi = stoch.evolve_pattern(state["skebs_psi"], hx, dt,
                                       step_no, seed=1)
            state["skebs_psi"] = psi
            du, dv = stoch.skebs_increments(psi, hx, dyn.skebs_amp,
                                            1.0 / grid.rdx, 1.0 / grid.rdy)
            tend["u"] = tend.get("u", 0.0) + du[None]
            tend["v"] = tend.get("v", 0.0) + dv[None]

    return state, tend


def post_dynamics(state: State, grid: Grid, cfg: Config, hx: HaloOps, dt: float,
                  do_chem: bool) -> State:
    phys = cfg.physics
    moist = cfg.moist_species()

    if phys.mp_physics == MPScheme.KESSLER:
        from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import kessler
        diag = diagnose(state, grid, moist)
        state = kessler(state, diag, grid, dt)
    elif phys.mp_physics == MPScheme.WSM6:
        from wrfchem_arc_interactions_tpu.physics.microphysics.wsm6 import wsm6
        diag = diagnose(state, grid, moist)
        state = wsm6(state, diag, grid, cfg, dt)
    elif phys.mp_physics == MPScheme.MORRISON2:
        from wrfchem_arc_interactions_tpu.physics.microphysics.morrison import morrison
        diag = diagnose(state, grid, moist)
        n_act = None
        if phys.progn and cfg.chem.chem_opt.value != "none":
            # ARC indirect effect: MOSAIC bins -> AR&G activation -> Nc
            from wrfchem_arc_interactions_tpu.chem.driver import _nbin
            from wrfchem_arc_interactions_tpu.physics.mixactivate import activate
            from wrfchem_arc_interactions_tpu.utils import constants as cc
            exner = (diag.p_full / cc.P0) ** cc.RCP
            t_air = diag.theta * exner
            rho_air = 1.0 / (diag.alpha_d * diag.eps_ratio)
            w_c = 0.5 * (state["w"][:-1] + state["w"][1:])
            chem = {k: v for k, v in state.items() if k.startswith("chem_")}
            n_act, _ = activate(chem, t_air, diag.p_full, rho_air, w_c,
                                _nbin(cfg))
        state = morrison(state, diag, grid, cfg, dt, n_act=n_act)

    if do_chem and cfg.chem.chem_opt.value != "none":
        from wrfchem_arc_interactions_tpu.chem.driver import chem_driver
        state = chem_driver(state, grid, cfg, hx, cfg.chem.chemdt_s)

    return state
