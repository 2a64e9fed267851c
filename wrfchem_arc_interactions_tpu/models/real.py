"""Real-data initialization path — the real.exe analog (canonical:
main/real_em.F + share/input_wrf.F vertical interpolation and hydrostatic
rebalance; SURVEY.md §3.4 'real.exe', VERDICT r2 ask #6).

Pipeline, mirroring the reference's met_em -> wrfinput/wrfbdy flow:

1. ``AnalysisSnapshot`` is the met_em.* analog: gridded analysis fields
   (T, qv, u, v on pressure levels + surface pressure + terrain) at one
   valid time.  In this environment there is no external data source
   (SURVEY.md §0: empty reference mount, no network), so
   :func:`synthetic_analysis` manufactures a physically plausible,
   time-evolving baroclinic analysis as the stand-in; the ingestion code
   is agnostic to where the arrays came from.
2. :func:`real_init` builds the model grid over the analysis terrain,
   derives the base-state sounding from the domain-mean analysis profile,
   vertically interpolates each column from pressure levels to the model's
   eta levels (linear in ln p, the reference's default), and
   hydrostatically rebalances (ideal.balance_columns — the same machinery
   the ideal cases use, exercised here with horizontally varying mu).
3. :func:`boundary_stream` converts the remaining snapshots into
   time-bracketed :class:`LateralBoundary` segments for the Davies
   specified/relaxation zones (the wrfbdy analog).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid.grid import Grid, make_grid
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.lateral_bc import LateralBoundary
from wrfchem_arc_interactions_tpu.registry.state import State, build_state
from wrfchem_arc_interactions_tpu.utils import constants as c


@dataclasses.dataclass(frozen=True)
class AnalysisSnapshot:
    """One gridded analysis valid time (the met_em.* file analog).

    All 3D arrays are (np_levels, ny, nx) with p_levels DECREASING
    (surface-first, like the model's eta ordering); 2D are (ny, nx).
    """

    time_s: float
    p_levels: np.ndarray      # (np,) [Pa], decreasing
    t: np.ndarray             # (np, ny, nx) temperature [K]
    qv: np.ndarray            # (np, ny, nx) vapor mixing ratio [kg/kg]
    u: np.ndarray             # (np, ny, nx) x-wind [m/s]
    v: np.ndarray             # (np, ny, nx) y-wind [m/s]
    p_sfc: np.ndarray         # (ny, nx) surface pressure [Pa]
    ht: np.ndarray            # (ny, nx) terrain height [m]


def synthetic_analysis(cfg: Config, times_s: Sequence[float],
                       delta_t: float = 10.0, u0: float = 12.0,
                       advect_speed: float = 15.0,
                       terrain_amp: float = 0.0) -> List[AnalysisSnapshot]:
    """Manufacture a time-evolving baroclinic analysis (the stand-in for
    GFS/ERA gridded data in this data-less environment).

    A meridional temperature gradient (delta_t across the domain) in
    thermal-wind-ish balance with westerly shear, plus a warm anomaly that
    advects eastward at ``advect_speed`` so the inflow boundary genuinely
    changes between snapshots."""
    d = cfg.domain
    ny, nx = d.ny, d.nx
    n_lev = 20
    p_levels = np.linspace(1000e2, 150e2, n_lev)          # decreasing
    yy = (np.arange(ny) + 0.5) / ny - 0.5                 # -0.5..0.5
    xx = (np.arange(nx) + 0.5) / nx
    out = []
    ht = (terrain_amp * np.exp(-((np.arange(nx) - nx / 2.0) / (nx / 8.0)) ** 2)
          [None, :] * np.ones((ny, 1)))
    for t_s in times_s:
        # reference T profile ~ standard atmosphere in p
        t_ref = 288.0 * (p_levels / 1000e2) ** 0.19
        t3 = np.broadcast_to(t_ref[:, None, None], (n_lev, ny, nx)).copy()
        # meridional gradient, decaying aloft
        decay = np.clip((p_levels - 200e2) / 800e2, 0.0, 1.0)
        t3 += -delta_t * yy[None, :, None] * decay[:, None, None]
        # eastward-advecting warm anomaly (what the west boundary sees)
        xc = (0.2 + advect_speed * t_s / (nx * d.dx)) % 1.0
        dist = np.minimum(np.abs(xx - xc), 1.0 - np.abs(xx - xc))
        bump = 3.0 * np.exp(-(dist / 0.12) ** 2)
        t3 += bump[None, None, :] * decay[:, None, None]
        # thermal-wind-ish shear: u grows with height, stronger with dT/dy
        zfac = np.log(1000e2 / p_levels)
        u3 = (u0 + 8.0 * zfac[:, None, None] * (0.5 + yy[None, :, None]))
        u3 = np.broadcast_to(u3, (n_lev, ny, nx)).copy()
        v3 = np.zeros((n_lev, ny, nx))
        # moisture: ~80% RH near surface decaying aloft
        es = 611.2 * np.exp(17.67 * (t3 - 273.15) / (t3 - 29.65))
        qvs = 0.622 * es / np.maximum(p_levels[:, None, None] - es, 1.0)
        qv3 = 0.8 * qvs * np.clip((p_levels / 1000e2)[:, None, None] ** 3,
                                  0.02, 1.0)
        # surface pressure: hydrostatic reduction over terrain
        p_sfc = 1000e2 * np.exp(-ht / (c.R_D * t3[0] / c.G))
        out.append(AnalysisSnapshot(
            time_s=float(t_s), p_levels=p_levels, t=t3, qv=qv3, u=u3, v=v3,
            p_sfc=p_sfc, ht=ht))
    return out


def _interp_ln_p(p_target: np.ndarray, p_levels: np.ndarray,
                 field: np.ndarray) -> np.ndarray:
    """Column-wise linear-in-ln(p) interpolation of (np, ny, nx) ``field``
    to (nz, ny, nx) target pressures; clamped at the ends (the reference's
    extrapolate-by-persistence below the lowest analysis level)."""
    ln_src = np.log(p_levels)[::-1]                  # increasing for interp
    f_src = field[::-1]
    nz, ny, nx = p_target.shape
    ln_t = np.log(np.maximum(p_target, 1.0))
    out = np.empty_like(p_target)
    for j in range(ny):
        for i in range(nx):
            out[:, j, i] = np.interp(ln_t[:, j, i], ln_src, f_src[:, j, i])
    return out


def _mean_theta_of_z(snap: AnalysisSnapshot) -> Callable:
    """Base-state sounding theta(z) from the domain-mean analysis profile
    (the reference derives its base state from namelist constants; using
    the analysis mean keeps perturbations small everywhere)."""
    t_mean = snap.t.mean(axis=(1, 2))
    p = snap.p_levels
    theta = t_mean * (c.P0 / p) ** c.RCP
    # hydrostatic heights of the analysis levels from the mean profile
    z = np.zeros_like(p)
    for k in range(1, len(p)):
        t_half = 0.5 * (t_mean[k - 1] + t_mean[k])
        z[k] = z[k - 1] + c.R_D * t_half / c.G * np.log(p[k - 1] / p[k])
    z_grid, th_grid = z.copy(), theta.copy()

    def theta_of_z(zq):
        return np.interp(np.asarray(zq, np.float64), z_grid, th_grid)

    return theta_of_z


def interp_to_model(grid: Grid, snap: AnalysisSnapshot,
                    n_outer: int = 2) -> Dict[str, np.ndarray]:
    """Vertically interpolate one snapshot to the model grid and
    hydrostatically rebalance.  Returns full-domain model fields
    {u, v, w, t, mu, ph, qv} (float64 numpy) — directly usable as a state
    fill or a LateralBoundary target."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    znu = np.asarray(grid.znu, np.float64)
    p_top = grid.p_top
    mu_est = np.asarray(snap.p_sfc, np.float64) - p_top
    t_pert = mu_pert = ph_pert = None
    for _ in range(n_outer):
        # target full pressures at mass levels from the current mu estimate
        p_t = znu[:, None, None] * mu_est[None] + p_top
        t_col = _interp_ln_p(p_t, snap.p_levels, snap.t)
        qv_col = np.maximum(_interp_ln_p(p_t, snap.p_levels, snap.qv), 0.0)
        theta = t_col * (c.P0 / p_t) ** c.RCP
        t_pert, mu_pert, ph_pert, p_half = ideal.balance_columns(
            grid, theta, qv_col, p_sfc=np.asarray(snap.p_sfc, np.float64))
        mu_est = np.asarray(grid.mub, np.float64) + mu_pert
    p_t = znu[:, None, None] * mu_est[None] + p_top
    u_col = _interp_ln_p(p_t, snap.p_levels, snap.u)
    v_col = _interp_ln_p(p_t, snap.p_levels, snap.v)
    qv_col = np.maximum(_interp_ln_p(p_t, snap.p_levels, snap.qv), 0.0)
    return {
        "u": u_col, "v": v_col,
        "w": np.zeros((nz + 1, ny, nx)),
        "t": t_pert, "mu": mu_pert, "ph": ph_pert, "qv": qv_col,
    }


def real_init(cfg: Config, snapshots: Sequence[AnalysisSnapshot],
              projection=None, dtype=jnp.float32
              ) -> Tuple[Grid, State, List[LateralBoundary]]:
    """The real.exe pipeline: (grid, balanced initial state, wrfbdy-analog
    boundary segments) from a time-ordered analysis sequence."""
    snap0 = snapshots[0]
    grid = make_grid(cfg, _mean_theta_of_z(snap0),
                     terrain=snap0.ht if np.any(snap0.ht != 0.0) else None,
                     projection=projection, dtype=dtype)
    fields0 = interp_to_model(grid, snap0)
    state = dict(build_state(cfg, dtype))
    for k, v in fields0.items():
        if k in state:
            state[k] = jnp.asarray(v, dtype)
    segments = boundary_stream(grid, cfg, snapshots, dtype)
    return grid, state, segments


def boundary_stream(grid: Grid, cfg: Config,
                    snapshots: Sequence[AnalysisSnapshot],
                    dtype=jnp.float32) -> List[LateralBoundary]:
    """Bracketing LateralBoundary segments between consecutive snapshots
    (the wrfbdy_d01 stream analog; Simulation time-interpolates within a
    segment and the caller swaps segments as model time crosses t_hi —
    segments are traced arguments, so no recompile)."""
    targets = [
        {k: jnp.asarray(v, dtype)
         for k, v in interp_to_model(grid, s).items()}
        for s in snapshots
    ]
    segs = []
    for a, b, sa, sb in zip(targets[:-1], targets[1:],
                            snapshots[:-1], snapshots[1:]):
        segs.append(LateralBoundary(
            lo=a, hi=b,
            t_lo=jnp.asarray(sa.time_s, dtype),
            t_hi=jnp.asarray(sb.time_s, dtype)))
    if not segs:
        from wrfchem_arc_interactions_tpu.models.lateral_bc import (
            constant_boundary,
        )
        segs = [constant_boundary(targets[0])]
    return segs
