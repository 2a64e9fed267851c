"""Stage diagnostics: pressure, specific volume, sound speed from prognostic
state — the calc_p_rho_phi equivalent (canonical:
dyn_em/module_big_step_utilities_em.F; SURVEY.md §2.1 'Big-step utilities').

Given prognostic (mu', theta', phi', q*) the hydrostatic relation in the
dry-mass coordinate diagnoses alpha_d = -(1/mu_d) d(phi)/d(eta), and the
(moist) equation of state diagnoses p = p0 (R_d theta_m / (p0 alpha_d))^gamma.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Diag:
    mu_full: jax.Array      # (ny,nx)    mu_bar + mu'
    theta: jax.Array        # (nz,ny,nx) full dry potential temperature
    theta_m: jax.Array      # (nz,ny,nx) moist potential temperature
    alpha_d: jax.Array      # (nz,ny,nx) dry inverse density
    eps_ratio: jax.Array    # (nz,ny,nx) alpha/alpha_d = 1/(1+sum q)
    p_full: jax.Array       # (nz,ny,nx) full pressure
    p_pert: jax.Array       # (nz,ny,nx) p - pb
    al_pert: jax.Array      # (nz,ny,nx) alpha_d - alb
    cs2: jax.Array          # (nz,ny,nx) sound speed squared gamma*p*alpha_d


def moist_sums(state: State, moist: tuple) -> tuple:
    """(qv, sum of all hydrometeor+vapor mixing ratios)."""
    qv = state.get("qv")
    if qv is None:
        zeros = jnp.zeros_like(state["t"])
        return zeros, zeros
    qtot = jnp.zeros_like(qv)
    for name in moist:
        # mass mixing ratios only: qgv is the graupel rime VOLUME mixing
        # ratio [m3/kg] (Morrison rime-density physics) and must not be
        # counted in the condensate mass loading
        if name.startswith("q") and name != "qgv":
            qtot = qtot + state[name]
    return qv, qtot


def diagnose(state: State, grid: Grid, moist: tuple) -> Diag:
    mu_full = grid.mub + state["mu"]
    theta = state["t"] + c.T0
    qv, qtot = moist_sums(state, moist)
    theta_m = theta * (1.0 + c.RVOVRD * qv)
    ph_full = grid.phb + state["ph"]
    rdnw = grid.rdnw.reshape(-1, 1, 1)
    alpha_d = -(ph_full[1:] - ph_full[:-1]) * rdnw / mu_full[None]
    eps_ratio = 1.0 / (1.0 + qtot)
    p_full = c.P0 * (c.R_D * theta_m / (c.P0 * alpha_d)) ** c.GAMMA
    return Diag(
        mu_full=mu_full,
        theta=theta,
        theta_m=theta_m,
        alpha_d=alpha_d,
        eps_ratio=eps_ratio,
        p_full=p_full,
        p_pert=p_full - grid.pb,
        al_pert=alpha_d - grid.alb,
        cs2=c.GAMMA * p_full * alpha_d,
    )


def ddz_center(p: jax.Array, znu: jax.Array) -> jax.Array:
    """d(p)/d(eta) at mass levels from mass-level values (central interior,
    one-sided at the boundaries)."""
    z = znu.reshape(-1, 1, 1)
    interior = (p[2:] - p[:-2]) / (z[2:] - z[:-2])
    lo = (p[1:2] - p[0:1]) / (z[1:2] - z[0:1])
    hi = (p[-1:] - p[-2:-1]) / (z[-1:] - z[-2:-1])
    return jnp.concatenate([lo, interior, hi], axis=0)


def ddz_faces(p: jax.Array, grid: Grid, top_value: float = 0.0) -> jax.Array:
    """d(p)/d(eta) at w levels (k=0..nz) from mass-level p.

    Interior w-level k: (p[k]-p[k-1]) * rdn[k].  Surface (k=0): one-sided
    copy of the first interior value.  Top (k=nz): uses the model-top
    boundary condition p'(eta=0) = top_value (pressure held at p_top).
    """
    interior = (p[1:] - p[:-1]) * grid.rdn[1:].reshape(-1, 1, 1)
    lo = interior[0:1]
    rdn_top = (-1.0 / grid.znu[-1]).reshape(1, 1, 1)
    hi = (top_value - p[-1:]) * rdn_top
    return jnp.concatenate([lo, interior, hi], axis=0)
