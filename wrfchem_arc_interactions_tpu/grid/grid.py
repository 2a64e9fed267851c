"""Grid container: eta coordinate, metric terms, dry hydrostatic base state.

Plays the role of the reference's domain setup (canonical: dyn_em/start_em.F,
share/start_domain.F, and the znu/znw/dnw/rdnw/fnm/fnp metric fields of
Registry.EM_COMMON; SURVEY.md §2.1 'Domain start/setup').

Coordinate: ARW terrain-following dry-mass coordinate
``eta = (p_dh - p_top) / mu_d`` with ``mu_d = p_surf_dry - p_top``; eta
decreases from 1 (surface, k=0) to 0 (model top, k=nz) — arrays are stored
surface-first so k indexes upward.

All 3D arrays are (nz[, +1], ny, nx); 2D are (ny, nx). Base state is dry and
hydrostatically balanced, so an unperturbed initial state is an exact steady
state of the discrete equations (tested in tests/test_dycore.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.utils import constants as c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    # --- vertical coordinate arrays (1D) ---
    znw: jax.Array   # (nz+1,) eta at w (full) levels, znw[0]=1 … znw[nz]=0
    znu: jax.Array   # (nz,)   eta at mass (half) levels
    dnw: jax.Array   # (nz,)   znw[k+1]-znw[k]  (negative)
    rdnw: jax.Array  # (nz,)   1/dnw
    dn: jax.Array    # (nz,)   znu[k]-znu[k-1] (dn[0] unused)
    rdn: jax.Array   # (nz,)
    fnp: jax.Array   # (nz,)   interp weight of level k   to w-level k
    fnm: jax.Array   # (nz,)   interp weight of level k-1 to w-level k
    # --- base state (dry, hydrostatic) ---
    mub: jax.Array     # (ny,nx)     base dry column mass [Pa]
    pb: jax.Array      # (nz,ny,nx)  base pressure at mass levels
    alb: jax.Array     # (nz,ny,nx)  base inverse density alpha_d
    phb: jax.Array     # (nz+1,ny,nx) base geopotential at w-levels
    t_init: jax.Array  # (nz,ny,nx)  base potential temperature (full theta)
    # --- horizontal metrics ---
    msft: jax.Array  # (ny,nx) map factor at mass points (1 for ideal)
    msfu: jax.Array  # (ny,nx) at u faces
    msfv: jax.Array  # (ny,nx) at v faces
    dmdy: jax.Array  # (ny,nx) d(msf)/dy at mass points (conformal curvature)
    f: jax.Array     # (ny,nx) Coriolis parameter
    ht: jax.Array    # (ny,nx) terrain height [m]
    xlat: jax.Array  # (ny,nx) latitude [deg] (radiation zenith angle)
    xlong: jax.Array  # (ny,nx) longitude [deg]
    # --- static metadata ---
    dx: float = dataclasses.field(metadata=dict(static=True))
    dy: float = dataclasses.field(metadata=dict(static=True))
    p_top: float = dataclasses.field(metadata=dict(static=True))
    # non-flat terrain switches on the sloped-coordinate metric terms in the
    # PGF and the acoustic loop (static: selects the compiled program)
    has_terrain: bool = dataclasses.field(default=False,
                                          metadata=dict(static=True))
    # real projection: latitude-varying f, conformal-curvature momentum
    # terms, AND map-scale factors in every flux operator of the dycore
    # (coupled mass fluxes U = mu u / m, m^2-scaled flux divergences, the
    # 1/m-scaled buoyancy of the coupled W equation; canonical: the
    # msft/msfu/msfv scaling of module_big_step_utilities_em.F and
    # module_small_step_em.F throughout).  Static: selects the compiled
    # program; with m == 1 the msf path is bit-identical to the flat path
    # (tested in tests/test_map_factors.py).
    curvature: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))

    @property
    def has_msf(self) -> bool:
        """Map-scale factors active (real projection)."""
        return self.curvature

    @property
    def nz(self) -> int:
        return self.znu.shape[0]

    @property
    def ny(self) -> int:
        return self.mub.shape[0]

    @property
    def nx(self) -> int:
        return self.mub.shape[1]

    @property
    def rdx(self) -> float:
        return 1.0 / self.dx

    @property
    def rdy(self) -> float:
        return 1.0 / self.dy


def make_eta_levels(nz: int,
                    ztop: float,
                    p_top: float,
                    theta_of_z: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                    stretch: str = "uniform_dz") -> np.ndarray:
    """Full (w) eta levels znw[0..nz], 1 at surface decreasing to 0 at top.

    ``uniform_dz`` places w-levels at equal height spacing in the base state
    (the common ideal-case choice); ``uniform_eta`` spaces eta linearly.
    """
    if stretch == "uniform_eta" or theta_of_z is None:
        return np.linspace(1.0, 0.0, nz + 1)
    # Build a fine hydrostatic p(z) for the given theta profile, then read
    # eta(z) at equally spaced heights.
    zf = np.linspace(0.0, ztop, 4001)
    theta = theta_of_z(zf)
    # integrate dp/dz = -g p / (R_d T), T = theta*(p/p0)^(R/cp) => use exner
    # form: d(pi)/dz = -g/(cp*theta), pi = (p/p0)^(R/cp)
    pi = np.empty_like(zf)
    pi[0] = 1.0
    dz = zf[1] - zf[0]
    th_mid = 0.5 * (theta[:-1] + theta[1:])
    for i in range(len(zf) - 1):
        pi[i + 1] = pi[i] - dz * c.G / (c.CP * th_mid[i])
    p_of_z = c.P0 * pi ** (c.CP / c.R_D)
    p_surf = p_of_z[0]
    # heights of the w-levels: uniform in z, but eta must end exactly at 0 =>
    # rescale so that z=ztop maps to p_top exactly.
    z_levels = np.linspace(0.0, ztop, nz + 1)
    p_levels = np.interp(z_levels, zf, p_of_z)
    eta = (p_levels - p_top) / (p_surf - p_top)
    eta[0] = 1.0
    # guard monotonicity and force the top closed
    eta = np.maximum.accumulate(eta[::-1])[::-1]
    eta[-1] = 0.0
    return eta


def make_grid(cfg: Config,
              theta_of_z: Callable[[np.ndarray], np.ndarray],
              terrain: Optional[np.ndarray] = None,
              f0: float = 0.0,
              lat0: float = 40.0,
              lon0: float = 0.0,
              p_surf: float = c.P0,
              stretch: str = "uniform_dz",
              projection=None,
              dtype=jnp.float32) -> Grid:
    """Construct the grid + dry hydrostatic base state for an ideal case.

    ``theta_of_z`` is the base-state potential-temperature sounding (numpy,
    called at setup time only — this runs on host, not under jit).

    Terrain: per-column surface dry pressure is read from the fine
    hydrostatic p(z) of the sounding at z = ht, giving a column-dependent
    mub (canonical start_em.F); the base state is then iterated per column
    (vectorised over (ny, nx)) so phb/alb/pb satisfy the discrete
    hydrostatic relation d(phb)/d(eta) = -mub*alb exactly, which the
    perturbation-form PGF relies on for exact rest-state balance over
    orography.
    """
    d = cfg.domain
    nz, ny, nx = d.nz, d.ny, d.nx
    znw = make_eta_levels(nz, d.ztop, d.p_top, theta_of_z, stretch)
    znu = 0.5 * (znw[:-1] + znw[1:])
    dnw = np.diff(znw)
    rdnw = 1.0 / dnw
    dn = np.zeros(nz)
    dn[1:] = znu[1:] - znu[:-1]
    rdn = np.zeros(nz)
    rdn[1:] = 1.0 / dn[1:]
    # interpolation weights from half levels (k, k-1) to w-level k
    # (canonical start_em.F: fnp = .5*dnw(k)/dn(k), fnm = .5*dnw(k-1)/dn(k))
    fnp = np.zeros(nz)
    fnm = np.zeros(nz)
    fnp[1:] = 0.5 * dnw[1:] / dn[1:]
    fnm[1:] = 0.5 * dnw[:-1] / dn[1:]

    if terrain is None:
        terrain = np.zeros((ny, nx))
    terrain = np.asarray(terrain, np.float64)
    has_terrain = bool(np.any(terrain != terrain.flat[0])) or bool(terrain.flat[0] != 0.0)

    if has_terrain:
        # per-column surface dry pressure from the fine hydrostatic p(z)
        zf = np.linspace(0.0, max(d.ztop, float(terrain.max()) + 1.0), 4001)
        theta_f = theta_of_z(zf)
        pi = np.empty_like(zf)
        pi[0] = (p_surf / c.P0) ** (c.R_D / c.CP)
        dzf = zf[1] - zf[0]
        th_mid = 0.5 * (theta_f[:-1] + theta_f[1:])
        for i in range(len(zf) - 1):
            pi[i + 1] = pi[i] - dzf * c.G / (c.CP * th_mid[i])
        p_of_z = c.P0 * pi ** (c.CP / c.R_D)
        p_surf_col = np.interp(terrain, zf, p_of_z)          # (ny, nx)
    else:
        p_surf_col = np.full((ny, nx), p_surf)

    # vectorised per-column base-state iteration (float64 host-side)
    mub = p_surf_col - d.p_top                               # (ny, nx)
    pb = znu[:, None, None] * mub[None] + d.p_top            # (nz, ny, nx)
    z_half = terrain[None] + np.linspace(100.0, 10.0e3, nz)[:, None, None]
    phb = np.empty((nz + 1, ny, nx))
    for _ in range(12):
        t_init = theta_of_z(z_half)
        alb = (c.R_D * t_init / c.P0) * (pb / c.P0) ** (-c.CV / c.CP)
        phb[0] = c.G * terrain
        for k in range(nz):
            phb[k + 1] = phb[k] - dnw[k] * mub * alb[k]
        z_half = 0.5 * (phb[:-1] + phb[1:]) / c.G
    t_init = theta_of_z(z_half)
    alb = (c.R_D * t_init / c.P0) * (pb / c.P0) ** (-c.CV / c.CP)
    phb[0] = c.G * terrain
    for k in range(nz):
        phb[k + 1] = phb[k] - dnw[k] * mub * alb[k]

    ones = np.ones((ny, nx))
    arr = lambda a: jnp.asarray(a, dtype)
    if projection is not None and projection.kind != "cartesian":
        # real-projection metrics: map factors, latitude-varying Coriolis,
        # lat/lon for radiation zenith angles (grid/projection.py — the WPS
        # geogrid role); spherical-curvature momentum terms switch on
        from wrfchem_arc_interactions_tpu.grid.projection import (
            projection_fields,
        )
        pf = projection_fields(projection, ny, nx, d.dx, d.dy)
        msft, msfu, msfv = pf["msft"], pf["msfu"], pf["msfv"]
        dmdy = pf["dmdy"]
        f_field, xlat, xlong = pf["f"], pf["xlat"], pf["xlong"]
        curvature = True
    else:
        msft = msfu = msfv = ones
        dmdy = np.zeros((ny, nx))
        f_field = f0 * ones
        xlat, xlong = lat0 * ones, lon0 * ones
        curvature = False
    return Grid(
        znw=arr(znw), znu=arr(znu), dnw=arr(dnw), rdnw=arr(rdnw),
        dn=arr(dn), rdn=arr(rdn), fnp=arr(fnp), fnm=arr(fnm),
        mub=arr(mub), pb=arr(pb), alb=arr(alb), phb=arr(phb), t_init=arr(t_init),
        msft=arr(msft), msfu=arr(msfu), msfv=arr(msfv), dmdy=arr(dmdy),
        f=arr(f_field), ht=arr(terrain),
        xlat=arr(xlat), xlong=arr(xlong),
        dx=float(d.dx), dy=float(d.dy), p_top=float(d.p_top),
        has_terrain=has_terrain, curvature=curvature,
    )
