"""Ideal-case initialisation (canonical: dyn_em/module_initialize_<case>.F +
the `ideal.exe` path of SURVEY.md §3.4).

The initial state is built to satisfy the *discrete* hydrostatic balance of
this model's own operators (the same fnm/fnp eps interpolation and the same
d(p)/d(eta) differencing as dycore.big_step.buoyancy_w), so an unperturbed
column is a stationary point of `dycore.solve.step` to rounding — the ideal
analog of the reference's base-state/perturbation consistency.

Construction per column (float64 on host, cast to the state dtype):
 1. theta(z), qv(z) from the sounding; iterate the column dry mass mu_d so
    the moist surface pressure hits p_sfc.
 2. March the moist-hydrostatic full pressure up the half levels with the
    model's eps_w interpolation: dp/deta = mu_d / eps_w.
 3. alpha_d from the EOS at (theta_m, p); phi from d(phi)/d(eta) = -mu_d
    alpha_d; perturbations relative to the grid base state.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid, make_grid
from wrfchem_arc_interactions_tpu.models import soundings
from wrfchem_arc_interactions_tpu.registry.state import State, build_state
from wrfchem_arc_interactions_tpu.utils import constants as c


def _eps_w_np(qtot: np.ndarray, fnm: np.ndarray, fnp: np.ndarray) -> np.ndarray:
    """Mirror ops.stencil.avg_z_centers_to_faces for eps = 1/(1+qtot):
    qtot is (nz, ...); returns (nz+1, ...)."""
    eps = 1.0 / (1.0 + qtot)
    shp = (-1,) + (1,) * (eps.ndim - 1)
    inner = fnp[1:].reshape(shp) * eps[:-1] + fnm[1:].reshape(shp) * eps[1:]
    return np.concatenate([eps[:1], inner, eps[-1:]], axis=0)


def balance_columns(grid: Grid, theta: np.ndarray, qv: np.ndarray,
                    p_sfc=c.P0, n_iter: int = 30):
    """Hydrostatically balance (theta, qv) columns on the model grid.

    theta, qv: (nz, ny, nx) float64 full fields (perturbations included).
    p_sfc: surface (moist) pressure — scalar, or (ny, nx) per column for
    terrain (the hill cases pass grid.mub + p_top).
    Returns (t_pert, mu_pert, ph_pert, p_half) as float64 numpy arrays.
    """
    p_sfc = np.asarray(p_sfc, np.float64)
    znw = np.asarray(grid.znw, np.float64)
    znu = np.asarray(grid.znu, np.float64)
    dnw = np.asarray(grid.dnw, np.float64)
    dn = np.zeros_like(znu)
    dn[1:] = znu[1:] - znu[:-1]
    fnm = np.asarray(grid.fnm, np.float64)
    fnp = np.asarray(grid.fnp, np.float64)
    nz = len(znu)

    theta = np.asarray(theta, np.float64)
    qv = np.asarray(qv, np.float64)
    theta_m = theta * (1.0 + c.RVOVRD * qv)
    eps_w = _eps_w_np(qv, fnm, fnp)          # (nz+1, ny, nx) water loading
    inv_eps_w = 1.0 / eps_w

    p_top = grid.p_top
    mu_d = np.full(theta.shape[1:], p_sfc - p_top)
    p = np.empty_like(theta)
    for _ in range(n_iter):
        # March full (moist) hydrostatic pressure DOWN from the model top:
        # the top face is pinned at p_top (the model's acoustic/buoyancy top
        # BC assumes p'(eta=0) = 0), then the column dry mass is scaled so
        # the implied surface pressure matches p_sfc.
        p[-1] = p_top + (znu[-1] - 0.0) * mu_d * inv_eps_w[-1]
        for k in range(nz - 2, -1, -1):
            p[k] = p[k + 1] - dn[k + 1] * mu_d * inv_eps_w[k + 1]
        p_sfc_col = p[0] - (znu[0] - 1.0) * mu_d * inv_eps_w[0]
        resid = np.max(np.abs(p_sfc_col - p_sfc))
        mu_d = mu_d * (p_sfc - p_top) / (p_sfc_col - p_top)
        if resid < 1e-9:
            break

    alpha_d = (c.R_D * theta_m / c.P0) * (p / c.P0) ** c.CVPM
    ph = np.empty((nz + 1,) + theta.shape[1:])
    ph[0] = np.asarray(grid.phb, np.float64)[0]
    for k in range(nz):
        ph[k + 1] = ph[k] - dnw[k] * mu_d * alpha_d[k]

    t_pert = theta - c.T0
    mu_pert = mu_d - np.asarray(grid.mub, np.float64)
    ph_pert = ph - np.asarray(grid.phb, np.float64)
    return t_pert, mu_pert, ph_pert, p


def _bubble(grid: Grid, amplitude: float, xc: Optional[float], zc: float,
            xr: float, zr: float, yc: Optional[float] = None,
            yr: Optional[float] = None) -> np.ndarray:
    """Cosine-squared thermal perturbation (nz, ny, nx).  xc=None builds a
    line bubble uniform in x (the squall2d_y orientation); yc=None one
    uniform in y (squall2d_x)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    x = (np.arange(nx) + 0.5) * grid.dx
    y = (np.arange(ny) + 0.5) * grid.dy
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])           # (nz, ny, nx)
    dist2 = ((z - zc) / zr) ** 2
    if xc is not None:
        dist2 = dist2 + ((x[None, None, :] - xc) / xr) ** 2
    if yc is not None:
        dist2 = dist2 + ((y[None, :, None] - yc) / yr) ** 2
    dist = np.sqrt(dist2)
    return np.where(dist < 1.0, amplitude * np.cos(0.5 * np.pi * dist) ** 2, 0.0)


def init_balanced(cfg: Config, grid: Grid,
                  theta_full: np.ndarray, qv: np.ndarray,
                  u: Optional[np.ndarray] = None,
                  v: Optional[np.ndarray] = None,
                  tsk: Optional[float] = None,
                  p_sfc=c.P0) -> State:
    """Build a state from full (theta, qv) fields + optional winds."""
    state = build_state(cfg)
    t_pert, mu_pert, ph_pert, p = balance_columns(grid, theta_full, qv, p_sfc)
    dtype = state["t"].dtype
    state["t"] = jnp.asarray(t_pert, dtype)
    state["mu"] = jnp.asarray(mu_pert, dtype)
    state["ph"] = jnp.asarray(ph_pert, dtype)
    if "qv" in state:
        state["qv"] = jnp.asarray(qv, dtype)
    if u is not None:
        state["u"] = jnp.asarray(np.broadcast_to(u, state["u"].shape), dtype)
    if v is not None:
        state["v"] = jnp.asarray(np.broadcast_to(v, state["v"].shape), dtype)
    if tsk is None:
        tsk = float(theta_full[0].mean() * (p[0].mean() / c.P0) ** c.RCP)
    state["tsk"] = jnp.full_like(state["tsk"], tsk)
    if "tslb" in state:       # Noah soil columns: isothermal at tsk, moist
        state["tslb"] = jnp.full_like(state["tslb"], tsk)
        state["smois"] = jnp.full_like(state["smois"], 0.25)
    if "tmn" in state:
        state["tmn"] = jnp.full_like(state["tmn"], tsk)
    return state


def warm_bubble(cfg: Config, grid: Grid, amplitude: float = 2.0,
                zc: float = 1500.0, xr: float = 4000.0, zr: float = 1500.0,
                three_d: bool = False, xc_frac: float = 0.5) -> State:
    """Dry(ish) rising warm bubble — the basic dycore validation case."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta0 = np.asarray(grid.t_init, np.float64)
    xc = xc_frac * nx * grid.dx
    yc = 0.5 * ny * grid.dy if three_d else None
    yr = xr if three_d else None
    theta = theta0 + _bubble(grid, amplitude, xc, zc, xr, zr, yc, yr)
    qv = np.zeros((nz, ny, nx))
    return init_balanced(cfg, grid, theta, qv)


def squall_line_x(cfg: Config, grid: Grid, bubble_amp: float = 3.0,
                  shear_depth: float = 2500.0, u_shear: float = -12.0) -> Tuple[State, Grid]:
    """2D(x-z) squall line: Weisman-Klemp sounding, low-level shear, line
    thermal trigger (canonical module_initialize_squall2d_x.F; BASELINE
    config 2)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta_fn = soundings.weisman_klemp_theta()
    rh_fn = soundings.weisman_klemp_rh()
    theta0 = theta_fn(z)
    # first-guess pressure from the grid base state for qv computation
    pb = np.asarray(grid.pb, np.float64)
    qv = soundings.qv_from_rh(theta0, pb, rh_fn(z))
    # iterate once: balance -> better p -> qv
    _, _, _, p = balance_columns(grid, theta0, qv)
    qv = soundings.qv_from_rh(theta0, p, rh_fn(z))
    theta = theta0 + _bubble(grid, bubble_amp, 0.5 * nx * grid.dx, 1500.0,
                             4000.0, 1500.0)
    # WK shear: u ramps from u_shear at the surface to 0 above shear_depth
    u_prof = np.where(z < shear_depth, u_shear * (1.0 - z / shear_depth), 0.0)
    state = init_balanced(cfg, grid, theta, qv, u=u_prof)
    return state, grid


def squall_line_y(cfg: Config, grid: Grid, bubble_amp: float = 3.0,
                  shear_depth: float = 2500.0,
                  v_shear: float = -12.0) -> Tuple[State, Grid]:
    """2D(y-z) squall line — the exact y-axis mirror of squall_line_x
    (canonical module_initialize_squall2d_y.F): Weisman-Klemp sounding,
    low-level v-shear, thermal line uniform in x.  Its role in the test
    suite is the x/y symmetry check of the advection/acoustic operators
    (tests/test_ideal_cases.py)."""
    ny = grid.ny
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta_fn = soundings.weisman_klemp_theta()
    rh_fn = soundings.weisman_klemp_rh()
    theta0 = theta_fn(z)
    pb = np.asarray(grid.pb, np.float64)
    qv = soundings.qv_from_rh(theta0, pb, rh_fn(z))
    _, _, _, p = balance_columns(grid, theta0, qv)
    qv = soundings.qv_from_rh(theta0, p, rh_fn(z))
    theta = theta0 + _bubble(grid, bubble_amp, None, 1500.0, 4000.0, 1500.0,
                             yc=0.5 * ny * grid.dy, yr=4000.0)
    v_prof = np.where(z < shear_depth, v_shear * (1.0 - z / shear_depth), 0.0)
    state = init_balanced(cfg, grid, theta, qv, v=v_prof)
    return state, grid


def grav2d_x(cfg: Config, amplitude: float = -15.0, zc: float = 3000.0,
             xr: float = 4000.0, zr: float = 2000.0) -> Tuple[Grid, State]:
    """Straka density current (canonical module_initialize_grav2d_x.F):
    isentropic 300 K base state, a -15 K cold blob aloft that collapses
    into gravity-current heads spreading along the ground."""
    grid = make_grid(cfg, lambda z: np.full_like(np.asarray(z, np.float64),
                                                 300.0))
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    theta0 = np.asarray(grid.t_init, np.float64)
    theta = theta0 + _bubble(grid, amplitude, 0.5 * nx * grid.dx, zc, xr, zr)
    qv = np.zeros((nz, ny, nx))
    return grid, init_balanced(cfg, grid, theta, qv)


def seabreeze2d_x(cfg: Config, tsk_sea: float = 288.0,
                  delta_tsk: float = 10.0,
                  qv_bl: float = 6e-3) -> Tuple[Grid, State]:
    """2D sea-breeze case (canonical module_initialize_seabreeze2d_x.F):
    quiescent stable sounding over a surface whose skin temperature steps
    from sea (left half) to heated land (right half); surface-layer +
    PBL physics then drive the onshore breeze circulation.  The sounding
    starts ~1 K above the sea skin so the ocean side is weakly stable and
    the land side delta_tsk-warm relative to the air (the differential
    heating that drives the breeze)."""
    grid = make_grid(cfg, soundings.constant_n2_theta(theta0=tsk_sea + 1.0))
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta = np.asarray(grid.t_init, np.float64).copy()
    # moist, well-mixed boundary layer air
    qv = np.where(z < 1500.0, qv_bl, qv_bl * np.exp(-(z - 1500.0) / 3000.0))
    state = init_balanced(cfg, grid, theta, qv, tsk=tsk_sea)
    x_frac = (np.arange(nx) + 0.5) / nx
    land = (x_frac >= 0.5)
    tsk = np.where(land, tsk_sea + delta_tsk, tsk_sea)
    state["tsk"] = jnp.asarray(np.broadcast_to(tsk, (ny, nx)),
                               state["tsk"].dtype)
    if "tmn" in state:
        state["tmn"] = state["tsk"]
    if "tslb" in state:
        state["tslb"] = jnp.broadcast_to(state["tsk"][None],
                                         state["tslb"].shape)
    return grid, state


def supercell_3d(cfg: Config, grid: Grid, bubble_amp: float = 3.0,
                 u_max: float = 30.0, shear_depth: float = 6000.0) -> State:
    """3D supercell: WK sounding + quarter-circle shear hodograph
    (canonical module_initialize_quarter_ss.F)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta0 = np.asarray(grid.t_init, np.float64)
    rh_fn = soundings.weisman_klemp_rh()
    pb = np.asarray(grid.pb, np.float64)
    qv = soundings.qv_from_rh(theta0, pb, rh_fn(z))
    _, _, _, p = balance_columns(grid, theta0, qv)
    qv = soundings.qv_from_rh(theta0, p, rh_fn(z))
    theta = theta0 + _bubble(grid, bubble_amp, 0.5 * nx * grid.dx, 1500.0,
                             10000.0, 1500.0, yc=0.5 * ny * grid.dy, yr=10000.0)
    # quarter-circle hodograph: turning through the lowest ~2 km, then
    # unidirectional westerly shear to shear_depth
    frac = np.clip(z / shear_depth, 0.0, 1.0)
    turn = np.clip(z / 2000.0, 0.0, 1.0) * 0.5 * np.pi
    speed = u_max * frac
    u_prof = speed * np.sin(turn)
    v_prof = speed * (1.0 - np.cos(turn))
    # subtract a mean storm motion so the cell stays in the domain
    u_prof = u_prof - 0.5 * u_max
    v_prof = v_prof - 0.25 * u_max
    return init_balanced(cfg, grid, theta, qv, u=u_prof, v=v_prof)


def hill2d_x(cfg: Config, hm: float = 100.0, a_half: float = 10000.0,
             u0: float = 10.0) -> Tuple[Grid, State]:
    """2D (x-z) flow over a witch-of-Agnesi hill — the mountain-wave case
    (canonical: module_initialize_hill2d_x.F).  Constant-N sounding, uniform
    wind u0; the initial state is the exact discrete base state over the
    terrain (dry, at rest relative to the base state except for u0), so the
    terrain-following PGF balance is exercised directly.
    """
    d = cfg.domain
    x = (np.arange(d.nx) + 0.5 - 0.5 * d.nx) * d.dx
    ht = hm / (1.0 + (x / a_half) ** 2)
    ht2d = np.broadcast_to(ht[None, :], (d.ny, d.nx))
    grid = make_grid(cfg, soundings.constant_n2_theta(), terrain=ht2d)
    theta = np.asarray(grid.t_init, np.float64)
    qv = np.zeros((d.nz, d.ny, d.nx))
    p_sfc = np.asarray(grid.mub, np.float64) + grid.p_top
    state = init_balanced(cfg, grid, theta, qv, u=u0, p_sfc=p_sfc)
    return grid, state


def b_wave(cfg: Config, delta_t: float = 12.0, ly_frac: float = 0.15,
           f0: float = 1.0e-4, perturb: float = 1.0) -> Tuple[Grid, State]:
    """Baroclinic-wave channel (canonical: module_initialize_b_wave.F):
    meridional tanh temperature front, zonal jet in DISCRETE thermal-wind
    balance with the model's own y pressure gradient, and a small theta
    perturbation seeding the unstable wave.  Periodic in x, symmetric y
    walls, f-plane.
    """
    d = cfg.domain
    grid = make_grid(cfg, soundings.constant_n2_theta(), f0=f0)
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta0 = np.asarray(grid.t_init, np.float64)
    y = (np.arange(d.ny) + 0.5) * d.dy
    yc = 0.5 * d.ny * d.dy
    ly = ly_frac * d.ny * d.dy
    # front confined below ~10 km, fading toward the model top
    fade = np.clip(1.0 - z / 12000.0, 0.0, 1.0)
    front = -delta_t * np.tanh((y[None, :, None] - yc) / ly)
    theta = theta0 + front * fade
    if perturb:
        # seed perturbation goes in BEFORE hydrostatic balancing, so the
        # initial state is only geostrophically (mildly) unbalanced, not
        # hydrostatically shocked
        x = (np.arange(d.nx) + 0.5) * d.dx
        lx = d.nx * d.dx
        theta = theta + (perturb
                         * np.exp(-((y[None, :, None] - yc) / ly) ** 2)
                         * np.sin(2.0 * np.pi * x[None, None, :] / lx)
                         * np.clip(1.0 - z / 9000.0, 0.0, 1.0))
    qv = np.zeros_like(theta)
    state = init_balanced(cfg, grid, theta, qv)
    # discrete geostrophic jet: in the dry-mass coordinate with uniform
    # surface pressure, p is uniform ON eta surfaces, so the meridional PGF
    # is carried entirely by the geopotential slope: f u_g = -dPhi/dy|eta
    # (the Montgomery-like balance the model's own PGF reduces to here)
    ph_full = np.asarray(grid.phb, np.float64) + np.asarray(state["ph"], np.float64)
    phi_m = 0.5 * (ph_full[:-1] + ph_full[1:])       # mass levels
    u_g = -np.gradient(phi_m, d.dy, axis=1) / f0
    u_g[:, 0, :] = u_g[:, 1, :]
    u_g[:, -1, :] = u_g[:, -2, :]
    state["u"] = jnp.asarray(u_g, state["u"].dtype)
    return grid, state


def les_cbl(cfg: Config, theta_sfc: float = 300.0,
            inv_height: float = 1000.0) -> Tuple[Grid, State]:
    """Convective-boundary-layer LES case (canonical:
    module_initialize_les.F): well-mixed layer capped by an inversion,
    driven by cfg.physics.tke_heat_flux; random sub-K seed perturbations
    break the symmetry so resolved convection develops."""
    d = cfg.domain

    def theta_of_z(z):
        z = np.asarray(z)
        return np.where(z < inv_height, theta_sfc,
                        theta_sfc + 0.01 * (z - inv_height))

    grid = make_grid(cfg, theta_of_z)
    theta = np.asarray(grid.t_init, np.float64).copy()
    rng = np.random.default_rng(7)
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])
    theta += np.where(z < 0.5 * inv_height,
                      rng.uniform(-0.1, 0.1, theta.shape), 0.0)
    qv = np.zeros_like(theta)
    state = init_balanced(cfg, grid, theta, qv, tsk=theta_sfc + 2.0)
    return grid, state


def tropical_cyclone(cfg: Config, v_max: float = 15.0, r_max: float = 80e3,
                     z_decay: float = 12000.0, sst: float = 302.0,
                     f0: float = 5.0e-5) -> Tuple[Grid, State]:
    """Axisymmetric warm-core vortex on an f-plane over a warm SST
    (canonical: dyn_em/module_initialize_tropical_cyclone.F, the
    Rotunno-Emanuel-style TC spin-up case; SURVEY.md §2.1 ideal cases).

    Construction:
    - moist-tropical base state: Weisman-Klemp theta sounding with a
      Jordan-like RH profile (near-saturated boundary layer, drying aloft);
    - tangential wind  v_t(r, z) = v_max (r/r_m) exp(1 - r/r_m) fade(z)
      (smooth Rankine; fade = cos^2 ramp to zero at z_decay);
    - thermal-wind-balanced warm core: with G(r, z) = f v_t + v_t^2/r, the
      gradient-wind/hydrostatic compatibility in height coordinates gives
      (g/theta0) dtheta'/dr = dG/dz, so
          theta'(r, z) = (theta0/g) * integral_r^R dG/dz dr'  (inward)
      — positive where v_t decays with height, i.e. a warm core;
    - hydrostatic rebalance via init_balanced; winds projected onto the
      C-grid axes; SST fixed at `sst` (ocean column: the Noah fields are
      set water-like by init_balanced's tsk handling).

    The case is deliberately resolution-agnostic: the vortex is placed at
    the domain centre and the default r_max spans ~4 cells at dx = 20 km.
    """
    d = cfg.domain

    def rh_of_z(z):
        z = np.asarray(z)
        return np.clip(0.95 - 0.55 * z / 14000.0, 0.25, 0.95)

    grid = make_grid(cfg, soundings.weisman_klemp_theta(), f0=f0, lat0=15.0)
    z_w = np.asarray(grid.phb, np.float64) / c.G
    z = 0.5 * (z_w[:-1] + z_w[1:])                     # (nz, ny, nx)
    theta0 = np.asarray(grid.t_init, np.float64)

    x = (np.arange(d.nx) + 0.5) * d.dx
    y = (np.arange(d.ny) + 0.5) * d.dy
    xc, yc = 0.5 * d.nx * d.dx, 0.5 * d.ny * d.dy
    dx_ = x[None, :] - xc                               # (1, nx) -> broadcast
    dy_ = y[:, None] - yc                               # (ny, 1)
    r = np.sqrt(dx_ ** 2 + dy_ ** 2)[None]              # (1, ny, nx)
    r = np.maximum(r, 1.0)

    fade = np.where(z < z_decay, np.cos(0.5 * np.pi * np.clip(z / z_decay, 0.0, 1.0)) ** 2, 0.0)
    vt = v_max * (r / r_max) * np.exp(1.0 - r / r_max) * fade   # (nz, ny, nx)

    # thermal-wind warm core: integrate dG/dz inward from the domain
    # edge on an axisymmetric 1D radial profile, then sample by radius
    nr = 200
    r1 = np.linspace(0.0, max(xc, yc) * 1.5, nr)
    r1 = np.maximum(r1, 1.0)
    z1 = z[:, d.ny // 2, d.nx // 2]                     # centre column heights
    fade1 = np.where(z1 < z_decay,
                     np.cos(0.5 * np.pi * np.clip(z1 / z_decay, 0.0, 1.0)) ** 2,
                     0.0)
    vt1 = v_max * (r1[None, :] / r_max) * np.exp(1.0 - r1[None, :] / r_max) \
        * fade1[:, None]                                # (nz, nr)
    G1 = f0 * vt1 + vt1 ** 2 / r1[None, :]
    dz1 = np.gradient(z1)
    dG1dz = np.gradient(G1, axis=0) / dz1[:, None]
    # thermal wind dtheta'/dr = (theta0/g) dG/dz < 0 aloft, so
    # theta'(r) = -(theta0/g) * int_r^R dG/dz dr'  (zero at the outer
    # edge; positive at the core where v_t decays with height)
    dr1 = np.gradient(r1)
    cum = np.cumsum((dG1dz * dr1[None, :])[:, ::-1], axis=1)[:, ::-1]
    th1 = -(300.0 / c.G) * cum                          # (nz, nr)
    # sample onto the 3D grid by radius
    th_pert = np.stack([np.interp(r[0], r1, th1[k]) for k in range(d.nz)])

    theta = theta0 + th_pert
    p_mass = c.P0 * np.exp(-z / 8000.0)                 # rough p for qv calc
    qv = soundings.qv_from_rh(theta, p_mass, rh_of_z(z))

    state = init_balanced(cfg, grid, theta, qv, tsk=sst)
    # project the tangential wind onto the grid axes:
    # u = -v_t sin(phi), v = v_t cos(phi)
    sin_phi = dy_[None] / r
    cos_phi = dx_[None] / r
    state["u"] = jnp.asarray(-vt * sin_phi, state["u"].dtype)
    state["v"] = jnp.asarray(vt * cos_phi, state["v"].dtype)
    return grid, state


def make_case(cfg: Config, case: str = "warm_bubble", **kw):
    """Convenience: (grid, state) for a named ideal case."""
    if case == "hill2d_x":
        return hill2d_x(cfg, **kw)
    if case == "b_wave":
        return b_wave(cfg, **kw)
    if case == "les":
        return les_cbl(cfg, **kw)
    if case == "warm_bubble":
        grid = make_grid(cfg, soundings.constant_n2_theta())
        return grid, warm_bubble(cfg, grid, **kw)
    if case == "squall2d_x":
        grid = make_grid(cfg, soundings.weisman_klemp_theta())
        state, grid = squall_line_x(cfg, grid, **kw)
        return grid, state
    if case == "squall2d_y":
        grid = make_grid(cfg, soundings.weisman_klemp_theta())
        state, grid = squall_line_y(cfg, grid, **kw)
        return grid, state
    if case == "grav2d_x":
        return grav2d_x(cfg, **kw)
    if case == "seabreeze2d_x":
        return seabreeze2d_x(cfg, **kw)
    if case == "quarter_ss":
        grid = make_grid(cfg, soundings.weisman_klemp_theta())
        return grid, supercell_3d(cfg, grid, **kw)
    if case == "tropical_cyclone":
        return tropical_cyclone(cfg, **kw)
    if case == "quiescent":
        grid = make_grid(cfg, soundings.constant_n2_theta())
        theta = np.asarray(grid.t_init, np.float64)
        qv = np.zeros((grid.nz, grid.ny, grid.nx))
        return grid, init_balanced(cfg, grid, theta, qv)
    raise ValueError(case)
