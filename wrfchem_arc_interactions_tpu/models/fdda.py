"""FDDA analysis (grid) nudging (canonical: phys/module_fdda_psufddagd.F,
called from dyn_em/module_first_rk_step_part2.F; SURVEY.md §3.2).

Interior Newtonian relaxation of the prognostic fields toward a
time-interpolated gridded analysis:

    d(f)/dt += G_f * (f_analysis(t) - f)

for f in {u, v, theta', qv} with the standard coefficients guv/gt/gq
[1/s].  The analysis container is the same two-snapshot
``LateralBoundary`` pytree used by the Davies boundary stream (its
``at_time`` does the linear time interpolation as traced arithmetic), so
one compiled step serves every time inside the bracketing window.  The
tendencies join the held physics tendencies before the RK loop — exactly
the fdda slot of first_rk_step_part2.

``k_start`` masks nudging below a model level (the if_no_pbl_nudging_*
analog: analysis increments should not fight the locally-resolved
boundary layer).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.registry.state import State

# state field -> (tendency key consumed by dycore/solve.py, coefficient)
_NUDGED = (("u", "u", "guv"), ("v", "v", "guv"),
           ("t", "th", "gt"), ("qv", "qv", "gq"))


def grid_nudge_tendencies(state: State, analysis: Dict[str, jax.Array],
                          cfg: Config) -> Dict[str, jax.Array]:
    """Nudging tendencies toward `analysis` (full-domain target fields in
    the prognostic conventions: u/v [m/s], t = theta perturbation, qv)."""
    fd = cfg.fdda
    tend: Dict[str, jax.Array] = {}
    for field, key, coef_name in _NUDGED:
        if field not in analysis or field not in state:
            continue
        g = getattr(fd, coef_name)
        d = g * (analysis[field] - state[field])
        if fd.k_start > 0:
            nz = d.shape[0]
            mask = (jnp.arange(nz) >= fd.k_start).astype(d.dtype)
            d = d * mask.reshape((nz,) + (1,) * (d.ndim - 1))
        tend[key] = d
    return tend


def apply_nudging(phys_tend: Dict[str, jax.Array], state: State,
                  analysis_container, time_s, cfg: Config) -> Dict[str, jax.Array]:
    """Merge nudging into the held physics tendencies (the
    first_rk_step_part2 call order)."""
    anal = analysis_container.at_time(time_s)
    nudge = grid_nudge_tendencies(state, anal, cfg)
    out = dict(phys_tend)
    for k, v in nudge.items():
        out[k] = out.get(k, 0.0) + v
    return out
