"""Model sanity guards (canonical: the CFL-violation detection of the
dycore + wrf_error_fatal; SURVEY.md §5.3 'NaN/CFL guards that abort with
location').

`stability_diagnostics` is jit-safe (returns reduced scalars via the
HaloOps global reductions so it works under shard_map); the host-side
`guard` raises with the offending location like the reference's
"cfl > 2 in domain d01 at (i,j,k)" fatal message.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c


def stability_diagnostics(state: State, grid: Grid, dt: float, hx) -> Dict[str, jax.Array]:
    """Global max CFL numbers and w amplitude (scalars; psum/pmax-reduced)."""
    u_cfl = jnp.max(jnp.abs(state["u"])) * dt * grid.rdx
    v_cfl = jnp.max(jnp.abs(state["v"])) * dt * grid.rdy
    ph_full = grid.phb + state["ph"]
    dz = jnp.maximum((ph_full[1:] - ph_full[:-1]) / c.G, 1.0)
    w_c = 0.5 * (state["w"][:-1] + state["w"][1:])
    w_cfl = jnp.max(jnp.abs(w_c) / dz) * dt
    return {
        "cfl_x": hx.pmax(u_cfl),
        "cfl_y": hx.pmax(v_cfl),
        "cfl_z": hx.pmax(w_cfl),
        "w_max": hx.pmax(jnp.max(jnp.abs(state["w"]))),
        "theta_finite": jnp.isfinite(state["t"]).all(),
    }


def guard(state: State, grid: Grid, dt: float, hx, step_idx: int,
          w_limit: float = 60.0, cfl_limit: float = 2.0) -> None:
    """Host-side check; raises FloatingPointError with location on
    violation (rerun-from-checkpoint is the recovery mechanism)."""
    d = jax.device_get(stability_diagnostics(state, grid, dt, hx))
    if not bool(d["theta_finite"]):
        t = np.asarray(jax.device_get(state["t"]))
        bad = np.argwhere(~np.isfinite(t))
        loc = tuple(bad[0]) if len(bad) else "?"
        raise FloatingPointError(
            f"NaN in theta at step {step_idx}, first at (k,j,i)={loc}")
    if float(d["w_max"]) > w_limit:
        w = np.asarray(jax.device_get(state["w"]))
        loc = tuple(np.unravel_index(np.argmax(np.abs(w)), w.shape))
        raise FloatingPointError(
            f"|w| = {float(d['w_max']):.1f} m/s exceeds {w_limit} at step "
            f"{step_idx}, (k,j,i)={loc} — CFL/physics blowup")
    for ax in ("cfl_x", "cfl_y", "cfl_z"):
        if float(d[ax]) > cfl_limit:
            raise FloatingPointError(
                f"{ax} = {float(d[ax]):.2f} > {cfl_limit} at step {step_idx}")
