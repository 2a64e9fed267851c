"""ndown — offline one-way nest forcing from saved coarse-run output
(canonical: main/ndown_em.F; SURVEY.md §1 L1 executables: wrf.exe ->
Simulation, ideal.exe -> ideal.make_case, real.exe -> models/real.py,
ndown.exe -> THIS).

The reference's ndown workflow: run the coarse domain to completion with
history output, then spin a fine domain whose initial state and lateral
boundary stream are interpolated from those saved files — no concurrent
parent integration, arbitrarily long gaps between runs.  Here the "wrfout"
files are this framework's own history dumps (native netCDF or npz — the
files `Simulation(output_dir=...)` writes), the interpolation is the same
dense-matmul ParentToChild operator the online nests use, and the boundary
stream is the same LateralBoundary segment list the real-data path emits —
so `Simulation(cfg_child, ..., boundary=segs[k])` consumes it unchanged.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid.grid import make_grid
from wrfchem_arc_interactions_tpu.io import history as hio
from wrfchem_arc_interactions_tpu.models.lateral_bc import LateralBoundary
from wrfchem_arc_interactions_tpu.models.nest import (
    NestSpec, ParentToChild, child_config,
)
from wrfchem_arc_interactions_tpu.registry.state import build_state

FORCED_DEFAULT = ("u", "v", "w", "t", "mu", "ph", "qv")


def ndown(parent_cfg: Config, history_paths: Sequence[str], spec: NestSpec,
          theta_of_z, forced_names: Tuple[str, ...] = FORCED_DEFAULT,
          dtype=jnp.float32):
    """Build (cfg_child, grid_child, state0, boundary_segments) from a
    time-ordered list of coarse-run history files.

    The child starts at the FIRST file's time; each consecutive file pair
    becomes one LateralBoundary segment (swap `sim.boundary` as model time
    crosses t_hi — traced argument, no recompile)."""
    if len(history_paths) < 1:
        raise ValueError("ndown needs at least one parent history file")
    cfg_child = child_config(parent_cfg, spec)
    interp = ParentToChild(spec, parent_cfg.domain.ny, parent_cfg.domain.nx)
    grid_child = make_grid(cfg_child, theta_of_z)

    snaps: List[Tuple[float, dict]] = []
    for path in history_paths:
        fields, t_s = hio.read_history(path)
        target = {}
        for name in forced_names:
            if name not in fields:
                continue
            arr = np.asarray(fields[name])
            target[name] = jnp.asarray(
                np.asarray(interp.field(jnp.asarray(arr), name)), dtype)
        missing = [n for n in forced_names if n not in target]
        if missing:
            raise ValueError(
                f"{path}: history lacks forced fields {missing} — "
                "write history with the default registry history set")
        snaps.append((t_s, target))
    snaps.sort(key=lambda x: x[0])

    state0 = dict(build_state(cfg_child, dtype))
    state0.update({k: v for k, v in snaps[0][1].items()})

    # the child run's clock starts at 0 = the first parent snapshot's
    # valid time (the reference's ndown re-bases the fine run the same way)
    t0 = snaps[0][0]
    segs: List[LateralBoundary] = []
    for (ta, a), (tb, b) in zip(snaps[:-1], snaps[1:]):
        segs.append(LateralBoundary(lo=a, hi=b,
                                    t_lo=jnp.asarray(ta - t0, dtype),
                                    t_hi=jnp.asarray(tb - t0, dtype)))
    if not segs:
        from wrfchem_arc_interactions_tpu.models.lateral_bc import (
            constant_boundary,
        )
        segs = [constant_boundary(snaps[0][1])]
    return cfg_child, grid_child, state0, segs
