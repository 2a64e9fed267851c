"""Nested domains — one-way and two-way horizontal nesting (canonical:
frame/module_nesting.F + share/interp_fcn.F + the recursive child walk of
frame/module_integrate.F; SURVEY.md §2.4 "Nesting", §3.1).

The reference nests a child domain at 3:1 (or other odd) refinement inside
a parent: each parent step (1) interpolates parent fields to the child
boundary (the wrfbdy-like forcing stream), (2) advances the child
`ratio` small steps with specified/relaxation lateral BCs, and (3) with
two-way feedback, replaces the overlapped parent cells by the averaged
child solution.

TPU-native design decisions:

- **Interpolation as dense matmuls**: parent->child bilinear interpolation
  is a fixed linear map, so it is expressed as two small dense matrices
  (child = Wy @ field @ Wx^T, einsum over the z batch) instead of gathers —
  MXU-friendly and fully determined by the static NestSpec. Separate row
  matrices handle the u/v face staggering of this framework's same-size
  array convention (u lives at west faces: position i, mass at i+0.5).
- **Boundary forcing** reuses the Davies specified/relaxation machinery
  (models/lateral_bc.py): the two bracketing snapshots are the parent state
  before and after its step, time-interpolated inside the child's compiled
  step (the boundary pytree is a traced argument, so no recompilation).
- **Feedback** (two-way) block-averages the child interior (ratio x ratio
  cells) onto the overlapped parent region, excluding the child's
  spec+relax zones (the reference's feedback stencil).

The child shares the parent's vertical levels and physics configuration —
exactly the reference's constraint.

- **Sharded nests**: pass ``mesh=`` (forwarded to both Simulations) — the
  child advances under shard_map with the sharded specified-BC path; the
  parent<->child interpolation matmuls and feedback block-averages run as
  global (auto-sharded) XLA ops outside the shard_map regions, exactly the
  RSL_LITE nest scatter/gather role (canonical: module_nesting.F
  med_nest_* over distributed patches).
- **Moving nests** (canonical: the prescribed-move/vortex-following nests
  of frame/module_nesting.F): :meth:`NestedSimulation.move` shifts the
  child window by whole parent cells — child content is rolled by
  ratio*shift (exact: the grids align), newly exposed strips fill from
  parent interpolation, and the interpolation matrices are rebuilt
  host-side (same shapes, so the child's compiled step is reused).
  :meth:`follow_max_w` recentres the window on the parent's strongest
  updraft column (the vortex-following analog).  Moving nests require
  flat terrain (a moving child over orography would need base-state
  regeneration — documented limitation).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.grid.grid import make_grid
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.models.lateral_bc import LateralBoundary
from wrfchem_arc_interactions_tpu.registry.state import restart_names


@dataclasses.dataclass(frozen=True)
class NestSpec:
    """Child placement in parent mass-point index space.

    The child covers parent cells [i_start, i_start + nx_parent_cells) x
    [j_start, j_start + ny_parent_cells) with `ratio` child cells per
    parent cell per direction (WRF's 3:1 default).
    """

    i_start: int
    j_start: int
    nx_parent_cells: int
    ny_parent_cells: int
    ratio: int = 3

    @property
    def cnx(self) -> int:
        return self.nx_parent_cells * self.ratio

    @property
    def cny(self) -> int:
        return self.ny_parent_cells * self.ratio


def _interp_matrix(n_parent: int, start: int, n_child: int, ratio: int,
                   stagger: bool) -> np.ndarray:
    """(n_child, n_parent) 1D linear-interpolation matrix.

    Positions in parent grid units: mass points at i+0.5, face (staggered)
    points at i. Child point c maps to parent coordinate
    start + (c+0.5)/ratio (mass) or start + c/ratio (face)."""
    w = np.zeros((n_child, n_parent), np.float32)
    for cindex in range(n_child):
        if stagger:
            xp = start + cindex / ratio
            xi = xp          # face coordinates align: parent face i at x=i
        else:
            xp = start + (cindex + 0.5) / ratio
            xi = xp - 0.5    # index space of parent mass points
        i0 = int(np.floor(xi))
        frac = xi - i0
        i0c = min(max(i0, 0), n_parent - 1)
        i1c = min(max(i0 + 1, 0), n_parent - 1)
        w[cindex, i0c] += 1.0 - frac
        w[cindex, i1c] += frac
    return w


class ParentToChild:
    """Dense-matmul interpolator for the full state dict."""

    def __init__(self, spec: NestSpec, pny: int, pnx: int):
        s = spec
        self.wx_mass = jnp.asarray(
            _interp_matrix(pnx, s.i_start, s.cnx, s.ratio, stagger=False))
        self.wx_face = jnp.asarray(
            _interp_matrix(pnx, s.i_start, s.cnx, s.ratio, stagger=True))
        self.wy_mass = jnp.asarray(
            _interp_matrix(pny, s.j_start, s.cny, s.ratio, stagger=False))
        self.wy_face = jnp.asarray(
            _interp_matrix(pny, s.j_start, s.cny, s.ratio, stagger=True))

    def field(self, a: jax.Array, name: str) -> jax.Array:
        wx = self.wx_face if name == "u" else self.wx_mass
        wy = self.wy_face if name == "v" else self.wy_mass
        if a.ndim == 2:
            return jnp.einsum("Yy,yx,Xx->YX", wy, a, wx)
        return jnp.einsum("Yy,zyx,Xx->zYX", wy, a, wx)

    def state(self, state: Dict[str, jax.Array], names) -> Dict[str, jax.Array]:
        return {n: self.field(state[n], n) for n in names if n in state}


def child_config(cfg: Config, spec: NestSpec) -> Config:
    """Derive the child namelist: refined dx/dt, specified lateral BCs,
    same physics/chem/vertical levels (the reference's nest contract)."""
    d = cfg.domain
    tc = cfg.time_control
    return dataclasses.replace(
        cfg,
        domain=dataclasses.replace(d, nx=spec.cnx, ny=spec.cny,
                                   dx=d.dx / spec.ratio, dy=d.dy / spec.ratio),
        time_control=dataclasses.replace(tc, dt=tc.dt / spec.ratio),
        dynamics=dataclasses.replace(cfg.dynamics, bc_x=BCKind.SPECIFIED,
                                     bc_y=BCKind.SPECIFIED),
    )


class NestedSimulation:
    """Parent + one child domain, advanced in the reference's order:
    parent step -> child boundary bracketing -> `ratio` child steps ->
    optional two-way feedback."""

    def __init__(self, cfg: Config, grid, state, spec: NestSpec,
                 theta_of_z: Callable, feedback: bool = False,
                 forced_names: Optional[Tuple[str, ...]] = None,
                 p_surf: Optional[float] = None, **sim_kw):
        self.spec = spec
        self.feedback = feedback
        self.parent = Simulation(cfg, grid, state, **sim_kw)
        self.cfg_child = child_config(cfg, spec)
        self.interp = ParentToChild(spec, cfg.domain.ny, cfg.domain.nx)

        # child grid: same sounding/top; terrain interpolated from parent
        ht_c = np.asarray(self.interp.field(grid.ht, "ht"))
        grid_kw = {} if p_surf is None else {"p_surf": p_surf}
        self.grid_child = make_grid(
            self.cfg_child, theta_of_z,
            terrain=ht_c if float(np.abs(ht_c).max()) > 0.0 else None,
            f0=float(np.asarray(grid.f).ravel()[0]), **grid_kw)

        moist = cfg.moist_species()
        if forced_names is None:
            forced_names = ("u", "v", "w", "t", "mu", "ph") + moist
        self.forced_names = forced_names
        # prognostic child state: interpolate EVERY restart-flagged parent
        # field (chem tracers included) — the nest-initial scatter
        names = [n for n in restart_names(cfg)]
        child_state = self.interp.state(self.parent.state, names)
        # non-restart diagnostics start from the registry defaults
        from wrfchem_arc_interactions_tpu.registry.state import build_state
        base = dict(build_state(self.cfg_child))
        base.update(child_state)

        snap = self.interp.state(self.parent.state, self.forced_names)
        t0 = jnp.float32(self.parent.time_s)
        bdy = LateralBoundary(lo=snap, hi=snap, t_lo=t0, t_hi=t0 + 1.0)
        self.child = Simulation(self.cfg_child, self.grid_child, base,
                                boundary=bdy, **sim_kw)

    # -- feedback ---------------------------------------------------------
    def _feedback(self):
        """Average child (ratio x ratio) blocks back onto the parent,
        excluding the child's boundary zones."""
        r = self.spec.ratio
        dyn = self.cfg_child.dynamics
        skip = dyn.spec_zone + dyn.relax_zone          # child cells
        skip_p = -(-skip // r) + 1                     # parent cells to skip
        s = self.spec
        out = dict(self.parent.state)
        cs = self.child.state
        for n in self.forced_names:
            if n not in cs:
                continue
            a = cs[n]
            if n == "u":
                # parent u face i_p maps to child face (i_p - i_start)*r
                idx = jnp.arange(s.nx_parent_cells) * r
                cols = a[..., idx]                     # (nz, cny, npx_cells)
                blk = cols.reshape(a.shape[:-2] + (s.ny_parent_cells, r, -1)).mean(-2)
            elif n == "v":
                idx = jnp.arange(s.ny_parent_cells) * r
                rows = a[..., idx, :]
                blk = rows.reshape(a.shape[:-2] + (s.ny_parent_cells, -1, r)).mean(-1)
            else:
                blk = a.reshape(a.shape[:-2]
                                + (s.ny_parent_cells, r,
                                   s.nx_parent_cells, r)).mean((-3, -1))
            p = out[n]
            j0, i0 = s.j_start + skip_p, s.i_start + skip_p
            j1 = s.j_start + s.ny_parent_cells - skip_p
            i1 = s.i_start + s.nx_parent_cells - skip_p
            sub = blk[..., skip_p:s.ny_parent_cells - skip_p,
                      skip_p:s.nx_parent_cells - skip_p]
            out[n] = p.at[..., j0:j1, i0:i1].set(sub.astype(p.dtype))
        self.parent.state = out

    # -- moving nest ------------------------------------------------------
    def move(self, di: int, dj: int):
        """Shift the child window by (di, dj) PARENT cells.

        Child cell content moves by (-di*ratio, -dj*ratio) in child index
        space (the window slides over the fluid); strips newly exposed on
        the leading edge are filled by parent interpolation.  Prognostic
        alignment is exact because moves are whole parent cells.
        """
        if float(np.abs(np.asarray(self.grid_child.ht)).max()) > 0.0:
            raise NotImplementedError("moving nests require flat terrain")
        s = self.spec
        pny, pnx = self.parent.grid.ny, self.parent.grid.nx
        ni = s.i_start + di
        nj = s.j_start + dj
        if not (0 <= ni and ni + s.nx_parent_cells <= pnx
                and 0 <= nj and nj + s.ny_parent_cells <= pny):
            raise ValueError("move would push the child outside the parent")
        self.spec = dataclasses.replace(s, i_start=ni, j_start=nj)
        self.interp = ParentToChild(self.spec, pny, pnx)
        r = s.ratio
        sx, sy = di * r, dj * r
        cny, cnx = s.cny, s.cnx
        names = [n for n in restart_names(self.parent.cfg)]
        fresh = self.interp.state(self.parent.state, names)
        ii = jnp.arange(cnx)
        jj = jnp.arange(cny)
        new_x = (ii >= cnx - sx) if sx > 0 else (ii < -sx)
        new_y = (jj >= cny - sy) if sy > 0 else (jj < -sy)
        newly = new_x[None, :] | new_y[:, None]          # (cny, cnx)
        out = {}
        for n, a in self.child.state.items():
            b = jnp.roll(a, (-sy, -sx), axis=(-2, -1))
            if n in fresh:
                out[n] = jnp.where(newly, fresh[n].astype(a.dtype), b)
            else:
                out[n] = b                                # diagnostics ride along
        self.child.state = out
        # re-centre the boundary forcing on the new window immediately
        snap = self.interp.state(self.parent.state, self.forced_names)
        t0 = jnp.float32(self.parent.time_s)
        self.child.boundary = LateralBoundary(lo=snap, hi=snap,
                                              t_lo=t0, t_hi=t0 + 1.0)

    def follow_max_w(self, threshold_cells: int = 2):
        """Vortex-following analog: recentre the child window on the
        parent column with the strongest updraft, moving at most one
        parent cell per call per axis (the reference's move-rate cap)."""
        w = self.parent.state["w"]
        col = jnp.max(jnp.abs(w), axis=0)                # (ny, nx)
        j, i = np.unravel_index(int(jnp.argmax(col)), col.shape)
        s = self.spec
        ci = s.i_start + s.nx_parent_cells // 2
        cj = s.j_start + s.ny_parent_cells // 2
        di = int(np.clip(i - ci, -1, 1)) if abs(i - ci) > threshold_cells else 0
        dj = int(np.clip(j - cj, -1, 1)) if abs(j - cj) > threshold_cells else 0
        if di or dj:
            ni = np.clip(s.i_start + di, 0, self.parent.grid.nx - s.nx_parent_cells)
            nj = np.clip(s.j_start + dj, 0, self.parent.grid.ny - s.ny_parent_cells)
            di, dj = int(ni - s.i_start), int(nj - s.j_start)
            if di or dj:
                self.move(di, dj)
        return di, dj

    # -- time stepping ----------------------------------------------------
    def advance(self, n_parent_steps: int):
        r = self.spec.ratio
        for _ in range(n_parent_steps):
            snap_lo = self.interp.state(self.parent.state, self.forced_names)
            t_lo = self.parent.time_s
            self.parent.advance(1)
            snap_hi = self.interp.state(self.parent.state, self.forced_names)
            self.child.boundary = LateralBoundary(
                lo=snap_lo, hi=snap_hi,
                t_lo=jnp.float32(t_lo), t_hi=jnp.float32(self.parent.time_s))
            self.child.advance(r)
            if self.feedback:
                self._feedback()

    @property
    def time_s(self) -> float:
        return self.parent.time_s
