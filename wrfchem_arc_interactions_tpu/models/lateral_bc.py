"""Specified / relaxation lateral boundary conditions — the real-data BC
capability (canonical: share/module_bc.F spec_bdy_* / relax_bdy_* behind
specified=.true. in &bdy_control; SURVEY.md §2.1 'Lateral BCs').

The reference's scheme (Davies & Turner 1977 as implemented in WRF):

- a SPEC zone (outermost ``spec_zone`` rows, default 1) where prognostic
  fields are SET to externally supplied boundary values, time-interpolated
  between bracketing boundary snapshots (the wrfbdy stream);
- a RELAX zone (next ``relax_zone`` rows, default 4) where fields are nudged
  toward the boundary values with inward-decaying weights
  F1 = (1/10dt) * w  (linear) and a diffusive term F2 = (1/50dt) * w acting
  on the deviation's Laplacian, w ramping 1 -> 0 across the zone with the
  reference's exponential taper.

TPU-native form: the zone weights are precomputed (ny, nx) masks; the update
is one fused `where`/arithmetic pass over each field — no boundary loops, no
scatter.  Time interpolation of the snapshots is linear in `time_s`, traced
as arithmetic so one compiled step serves all boundary times.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.registry.state import State


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LateralBoundary:
    """Boundary forcing: two bracketing snapshots of the forced fields.

    ``lo``/``hi``: dicts of full-domain target fields (only their boundary
    zones are consumed — the interior values are ignored, mirroring how
    wrfbdy stores only boundary strips; full arrays keep the pytree simple
    and XLA slices away the unused interior).
    """

    lo: Dict[str, jax.Array]
    hi: Dict[str, jax.Array]
    t_lo: jax.Array            # scalar [s]
    t_hi: jax.Array            # scalar [s]

    def at_time(self, time_s) -> Dict[str, jax.Array]:
        f = jnp.clip((time_s - self.t_lo)
                     / jnp.maximum(self.t_hi - self.t_lo, 1e-6), 0.0, 1.0)
        return {k: (1.0 - f) * self.lo[k] + f * self.hi[k] for k in self.lo}


def constant_boundary(fields: Dict[str, jax.Array]) -> LateralBoundary:
    """Time-invariant boundary target (ideal-case analog of a steady inflow)."""
    z = jnp.zeros((), jnp.float32)
    return LateralBoundary(lo=dict(fields), hi=dict(fields),
                           t_lo=z, t_hi=z + 1.0)


def zone_masks(ny: int, nx: int, spec_zone: int = 1, relax_zone: int = 4,
               x_sides: Tuple[bool, bool] = (True, True),
               y_sides: Tuple[bool, bool] = (True, True),
               dtype=np.float32):
    """(spec_mask, relax_w): spec_mask is 1 in the outermost spec_zone rows;
    relax_w ramps from ~1 (just inside the spec zone) to 0 at the interior
    edge of the relax zone with the reference's exponential taper."""
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    dist = np.full((ny, nx), 10 ** 9)
    if x_sides[0]:
        dist = np.minimum(dist, ii)
    if x_sides[1]:
        dist = np.minimum(dist, nx - 1 - ii)
    if y_sides[0]:
        dist = np.minimum(dist, jj)
    if y_sides[1]:
        dist = np.minimum(dist, ny - 1 - jj)
    spec = (dist < spec_zone).astype(dtype)
    n = dist - spec_zone + 1                      # 1..relax_zone inside zone
    in_relax = (dist >= spec_zone) & (dist < spec_zone + relax_zone)
    # WRF taper: weight ~ (zone+1-n)/zone * exp(-(n-1)/2)
    w = np.where(in_relax,
                 (relax_zone + 1.0 - n) / relax_zone * np.exp(-(n - 1) / 2.0),
                 0.0).astype(dtype)
    return spec, w


@dataclasses.dataclass(frozen=True)
class SpecifiedBC:
    """Precompiled specified/relaxation boundary operator.

    ``spec_names`` are SET in the spec zone (everything with boundary data);
    ``relax_names`` are additionally Davies-nudged in the relax zone —
    everything except the geopotential: nudging ph fights the model's own
    hydrostatic adjustment, and the dycore re-diagnoses it from mu/theta
    anyway.  Relaxing w as well measurably halves the trapped boundary-zone
    wave energy for nonhydrostatic disturbances (bubble experiment in
    tests/test_lateral_bc.py).
    """

    spec_mask: jax.Array       # (ny, nx) 1 in the set zone
    relax_w: jax.Array         # (ny, nx) inward-decaying relax weight
    spec_names: Tuple[str, ...]
    relax_names: Tuple[str, ...]

    def apply(self, state: State, bdy: LateralBoundary, time_s, dt,
              hx=None) -> State:
        """Apply the Davies zones.  Under shard_map pass the HaloOps `hx`
        (and shard-local spec_mask/relax_w via dataclasses.replace): the
        deviation Laplacian then rides a 1-cell ppermute exchange instead
        of a local edge pad, making the operator decomposition-invariant."""
        tgt = bdy.at_time(time_s)
        out = dict(state)
        f1 = self.relax_w / (10.0 * dt)
        f2 = self.relax_w / (50.0 * dt)
        spec = self.spec_mask
        for name in self.spec_names:
            if name not in state or name not in tgt:
                continue
            q = state[name]
            t = tgt[name]
            if name in self.relax_names:
                dev = t - q
                # 5-point Laplacian of the deviation (edge-replicated at
                # the domain boundary, so the diffusive term vanishes on
                # the outermost ring; halo-exchanged at shard seams)
                if hx is not None and getattr(hx, "sharded", False):
                    three_d = dev.ndim == 3
                    devp = hx.pad(dev if three_d else dev[None], 1)
                    if not three_d:
                        devp = devp[0]
                else:
                    devp = jnp.pad(
                        dev, [(0, 0)] * (dev.ndim - 2) + [(1, 1), (1, 1)],
                        mode="edge")
                lap = (devp[..., 1:-1, 2:] + devp[..., 1:-1, :-2]
                       + devp[..., 2:, 1:-1] + devp[..., :-2, 1:-1]
                       - 4.0 * dev)
                q = q + dt * (f1 * dev + f2 * lap)
            out[name] = spec * t + (1.0 - spec) * q
        return out


def make_specified_bc(cfg, grid, names: Optional[Tuple[str, ...]] = None,
                      dtype=jnp.float32) -> SpecifiedBC:
    d = cfg.domain
    dyn = cfg.dynamics
    from wrfchem_arc_interactions_tpu.config.namelist import BCKind
    x_on = dyn.bc_x == BCKind.SPECIFIED
    y_on = dyn.bc_y == BCKind.SPECIFIED
    spec, w = zone_masks(d.ny, d.nx, dyn.spec_zone, dyn.relax_zone,
                         x_sides=(x_on, x_on), y_sides=(y_on, y_on))
    if names is None:
        names = ("u", "v", "w", "t", "mu", "ph", "qv")
    relax = tuple(n for n in names if n != "ph")
    return SpecifiedBC(spec_mask=jnp.asarray(spec, dtype),
                       relax_w=jnp.asarray(w, dtype),
                       spec_names=tuple(names), relax_names=relax)
