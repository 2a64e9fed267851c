"""Pressure-level diagnostics — the auxiliary-history stream analog
(canonical: the pressure-level diagnostic stream of
share/module_diag_pld.F / auxhist namelist streams; SURVEY.md §5.5
'auxiliary diagnostic streams (pressure-level diags ...)').

Host-side post-processing at write time (like the reference's diagnostic
packages, this runs outside the hot step): geopotential height,
temperature, winds and RH interpolated to standard pressure levels, plus
sea-level pressure via the standard T-extrapolation reduction.  Written
through the same history writer (native netCDF or npz) on the
``auxhist_interval_s`` alarm of TimeControl.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

P_LEVELS_DEFAULT = (850e2, 700e2, 500e2, 250e2)


def _column_fields(state: State, grid: Grid, cfg: Config):
    mub = np.asarray(grid.mub, np.float64)
    mu = mub + np.asarray(state["mu"], np.float64)
    znu = np.asarray(grid.znu, np.float64)
    p = znu[:, None, None] * mu[None] + grid.p_top
    theta = np.asarray(state["t"], np.float64) + 300.0
    t_air = theta * (p / c.P0) ** c.RCP
    ph = np.asarray(grid.phb, np.float64) + np.asarray(state["ph"], np.float64)
    z_w = ph / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    qv = np.asarray(state.get("qv", np.zeros_like(theta)), np.float64)
    return p, t_air, z, qv, mu


def _interp_p(p: np.ndarray, field: np.ndarray,
              p_levels: Sequence[float]) -> np.ndarray:
    """(nlev, ny, nx) log-p interpolation of a (nz, ny, nx) field; NaN
    below ground / above top (the reference's missing-value convention)."""
    nz, ny, nx = field.shape
    lnp = np.log(p)
    out = np.full((len(p_levels), ny, nx), np.nan)
    for li, pl in enumerate(p_levels):
        lt = np.log(pl)
        # p decreases with k: find bracketing levels
        below = lnp >= lt                       # levels with higher pressure
        klo = np.clip(below.sum(axis=0) - 1, 0, nz - 2)
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        l0 = lnp[klo, jj, ii]
        l1 = lnp[klo + 1, jj, ii]
        f0 = field[klo, jj, ii]
        f1 = field[klo + 1, jj, ii]
        w = (lt - l0) / np.where(np.abs(l1 - l0) > 1e-12, l1 - l0, 1.0)
        val = f0 + w * (f1 - f0)
        inside = (lt <= lnp[0]) & (lt >= lnp[-1])
        out[li] = np.where(inside, val, np.nan)
    return out


def sea_level_pressure(state: State, grid: Grid, cfg: Config) -> np.ndarray:
    """SLP [Pa] by the standard reduction: surface pressure extrapolated
    down the 6.5 K/km lapse from the lowest-level temperature."""
    p, t_air, z, qv, mu = _column_fields(state, grid, cfg)
    p_sfc = mu + grid.p_top
    z_sfc = np.asarray(grid.phb, np.float64)[0] / c.G
    t0 = t_air[0] * (1.0 + 0.608 * qv[0]) + 0.0065 * (z[0] - z_sfc)
    t_msl = t0 + 0.0065 * z_sfc
    return p_sfc * np.exp(c.G * z_sfc / (c.R_D * 0.5 * (t0 + t_msl)))


def compute_diags(state: State, grid: Grid, cfg: Config,
                  p_levels: Sequence[float] = P_LEVELS_DEFAULT
                  ) -> Dict[str, np.ndarray]:
    p, t_air, z, qv, mu = _column_fields(state, grid, cfg)
    u = np.asarray(state["u"], np.float64)
    v = np.asarray(state["v"], np.float64)
    es = 611.2 * np.exp(c.SVP2 * (t_air - c.SVPT0) / (t_air - c.SVP3))
    qvs = c.EP_2 * es / np.maximum(p - es, 1.0)
    rh = np.clip(qv / np.maximum(qvs, 1e-10), 0.0, 1.1) * 100.0
    out = {
        "slp": sea_level_pressure(state, grid, cfg).astype(np.float32),
        "p_levels": np.asarray(p_levels, np.float32),
    }
    for name, fld in (("z_pl", z), ("t_pl", t_air), ("u_pl", u),
                      ("v_pl", v), ("rh_pl", rh)):
        out[name] = _interp_p(p, fld, p_levels).astype(np.float32)
    return out


def write_diags(path: str, cfg: Config, grid: Grid, state: State,
                time_s: float,
                p_levels: Sequence[float] = P_LEVELS_DEFAULT) -> None:
    """Write the pressure-level diagnostic stream (auxhist analog)."""
    import os

    data = compute_diags(state, grid, cfg, p_levels)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".nc"):
        from wrfchem_arc_interactions_tpu.io import netcdf as ncio
        w = ncio.NetCDFWriter()
        for k, v in data.items():
            w.put_var(k, v)
        w.put_att("_time_s", float(time_s))
        w.write(path, async_write=True)
    else:
        data["_time_s"] = np.float64(time_s)
        np.savez(path, **data)
