import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import Config, DomainConfig
from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.dycore import advection as adv
from wrfchem_arc_interactions_tpu.grid import make_grid
from wrfchem_arc_interactions_tpu.models.soundings import constant_n2_theta
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps


def setup(nx, ny=4, nz=4):
    cfg = Config(domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1.0 / nx, dy=1.0))
    grid = make_grid(cfg, constant_n2_theta())
    hx = HaloOps(bc_x=BCKind.PERIODIC, bc_y=BCKind.PERIODIC)
    return cfg, grid, hx


def x_advection_error(nx, order):
    """Error of d/dx flux divergence vs analytic for q = sin(2 pi x), u = 1."""
    cfg, grid, hx = setup(nx)
    nz, ny = grid.nz, grid.ny
    x = (np.arange(nx) + 0.5) / nx
    q = np.broadcast_to(np.sin(2 * np.pi * x), (nz, ny, nx)).astype(np.float64)
    ru = np.ones((nz, ny, nx))
    rv = np.zeros((nz, ny, nx))
    ww = np.zeros((nz + 1, ny, nx))
    q_pad = hx.pad(jnp.asarray(q))
    ru_pad = hx.pad(jnp.asarray(ru))
    rv_pad = hx.pad(jnp.asarray(rv))
    tend = np.asarray(adv.advect_scalar(q_pad, ru_pad, rv_pad, jnp.asarray(ww),
                                        grid, order, 3))
    exact = -2 * np.pi * np.cos(2 * np.pi * x) * 1.0
    return np.max(np.abs(tend[0, 0] - exact))


@pytest.mark.parametrize("order,rate_min", [(2, 1.8), (3, 2.8), (4, 3.7), (5, 4.6), (6, 5.4)])
def test_convergence_order(order, rate_min):
    # high orders need f64 to see the truncation error above roundoff
    import jax
    with jax.enable_x64(True):
        e1 = x_advection_error(32, order)
        e2 = x_advection_error(64, order)
    rate = np.log2(e1 / e2)
    assert rate > rate_min, f"order {order}: observed rate {rate:.2f}"


def test_conservation_periodic():
    """Total scalar mass change must telescope to zero on a periodic box."""
    cfg, grid, hx = setup(16, ny=8, nz=6)
    rng = np.random.default_rng(1)
    nz, ny, nx = 6, 8, 16
    q = rng.uniform(0.5, 1.5, (nz, ny, nx))
    ru = rng.normal(size=(nz, ny, nx))
    rv = rng.normal(size=(nz, ny, nx))
    ww = rng.normal(size=(nz + 1, ny, nx))
    ww[0] = ww[-1] = 0.0
    tend = np.asarray(adv.advect_scalar(
        hx.pad(jnp.asarray(q)), hx.pad(jnp.asarray(ru)), hx.pad(jnp.asarray(rv)),
        jnp.asarray(ww), grid, 5, 3))
    # integral weighted by layer thickness (-dnw)
    dnw = np.asarray(grid.dnw)
    total = np.sum(tend * (-dnw[:, None, None]))
    # telescoping sum: zero up to f32 accumulation noise
    assert abs(total) < 3e-6 * np.sum(np.abs(tend))


def test_pd_limiter_keeps_positive():
    cfg, grid, hx = setup(32, ny=4, nz=6)
    nz, ny, nx = 6, 4, 32
    rng = np.random.default_rng(2)
    # sharp blob with zeros around it + strong winds: unlimited 5th order
    # would undershoot below zero
    q = np.zeros((nz, ny, nx))
    q[:, :, 10:13] = 1.0
    mu = np.full((ny, nx), 1.0)
    u = rng.uniform(0.5, 1.0, (nz, ny, nx)) * nx / 4
    ru = u  # mu = 1
    rv = np.zeros((nz, ny, nx))
    ww = np.zeros((nz + 1, ny, nx))
    dt = 0.2 / (nx / 4 * nx)  # CFL ~ 0.2... dt * u / dx
    dt = 0.5 * (1.0 / nx) / np.max(u)
    q_pad = hx.pad(jnp.asarray(q))
    ru_pad = hx.pad(jnp.asarray(ru))
    rv_pad = hx.pad(jnp.asarray(rv))
    fx, fy, fz = adv.scalar_fluxes(q_pad, ru_pad, rv_pad, jnp.asarray(ww), 5, 3)
    phi_old = jnp.asarray(q)  # mu=1
    tend_unlim = adv.flux_div(fx, fy, fz, grid)
    q_unlim = np.asarray(phi_old + dt * tend_unlim)
    assert q_unlim.min() < -1e-6  # the limiter has work to do
    fxl, fyl, fzl = adv.pd_limit(q_pad, phi_old, fx, fy, fz,
                                 ru_pad, rv_pad, jnp.asarray(ww), dt, grid, hx)
    q_lim = np.asarray(phi_old + dt * adv.flux_div(fxl, fyl, fzl, grid))
    assert q_lim.min() > -1e-7
    # limiter must conserve mass
    np.testing.assert_allclose(q_lim.sum(), q_unlim.sum(), rtol=1e-6)


def test_mono_limiter_no_new_extrema():
    """FCT keeps the solution within local bounds and conserves mass."""
    cfg, grid, hx = setup(32, ny=4, nz=6)
    nz, ny, nx = 6, 4, 32
    rng = np.random.default_rng(5)
    q = np.zeros((nz, ny, nx))
    q[:, :, 10:13] = 1.0
    mu_new = jnp.ones((ny, nx))
    # x-independent u => nondivergent flow, so mu stays 1 and the coupled
    # FCT bounds apply pointwise (a divergent test field would legitimately
    # exceed pointwise bounds through real mass convergence)
    u = np.broadcast_to(
        rng.uniform(0.5, 1.0, (nz, ny, 1)), (nz, ny, nx)).copy() * nx / 4
    ru = u
    rv = np.zeros((nz, ny, nx))
    ww = np.zeros((nz + 1, ny, nx))
    dt = 0.5 * (1.0 / nx) / np.max(u)
    q_pad = hx.pad(jnp.asarray(q))
    ru_pad = hx.pad(jnp.asarray(ru))
    rv_pad = hx.pad(jnp.asarray(rv))
    fx, fy, fz = adv.scalar_fluxes(q_pad, ru_pad, rv_pad, jnp.asarray(ww), 5, 3)
    phi_old = jnp.asarray(q)
    q_unlim = np.asarray(phi_old + dt * adv.flux_div(fx, fy, fz, grid))
    assert q_unlim.min() < -1e-6 or q_unlim.max() > 1.0 + 1e-6
    fxl, fyl, fzl = adv.mono_limit(q_pad, phi_old, mu_new, fx, fy, fz,
                                   ru_pad, rv_pad, jnp.asarray(ww), dt, grid, hx)
    q_lim = np.asarray(phi_old + dt * adv.flux_div(fxl, fyl, fzl, grid))
    assert q_lim.min() > -1e-6
    assert q_lim.max() < 1.0 + 1e-5
    np.testing.assert_allclose(q_lim.sum(), q_unlim.sum(), rtol=1e-6)


def test_weno5_smooth_convergence():
    """WENO5 reaches ~5th order on smooth fields."""
    import jax
    with jax.enable_x64(True):
        e1 = x_advection_error(32, 7)
        e2 = x_advection_error(64, 7)
    rate = np.log2(e1 / e2)
    assert rate > 4.2, f"WENO5 observed rate {rate:.2f}"


def test_weno5_essentially_nonoscillatory():
    """On a step profile WENO5 overshoots far less than linear 5th order,
    and conserves mass exactly (telescoping fluxes)."""
    cfg, grid, hx = setup(64, ny=4, nz=4)
    nz, ny, nx = 4, 4, 64
    q = np.zeros((nz, ny, nx))
    q[:, :, 20:33] = 1.0
    u = np.full((nz, ny, nx), float(nx) / 4)
    rv = np.zeros((nz, ny, nx))
    ww = np.zeros((nz + 1, ny, nx))
    dt = 0.5 * (1.0 / nx) / u.max()
    q_pad = hx.pad(jnp.asarray(q))
    ru_pad = hx.pad(jnp.asarray(u))
    rv_pad = hx.pad(jnp.asarray(rv))

    def overshoot(order):
        qq = jnp.asarray(q)
        for _ in range(20):
            qq_pad = hx.pad(qq)
            tend = adv.advect_scalar(qq_pad, ru_pad, rv_pad,
                                     jnp.asarray(ww), grid, order, order)
            qq = qq + dt * tend
        arr = np.asarray(qq)
        return max(arr.max() - 1.0, -arr.min()), arr.sum()

    over5, mass5 = overshoot(5)
    overw, massw = overshoot(7)
    np.testing.assert_allclose(massw, q.sum(), rtol=1e-5)
    assert overw < 0.2 * max(over5, 1e-12) or overw < 1e-3, \
        f"WENO5 overshoot {overw:.2e} vs linear-5th {over5:.2e}"


def test_vertical_upwind_direction_and_dissipation():
    """Regression for the inverted vertical upwinding (vflux sign contract):
    eta decreases with k, so the index-space transport direction is
    -sign(ww).  First-order vertical advection must translate a peak in the
    right direction and stay monotone (0 <= q <= 1) for BOTH wind signs —
    with the sign inverted it is a downwind scheme that explodes (the bug
    that detonated the squall-line case at minute 20)."""
    nz = 64
    rdnw = jnp.full((nz,), -float(nz)).reshape(-1, 1, 1)
    q0 = jnp.asarray(np.exp(-0.5 * ((np.arange(nz) - 32) / 4.0) ** 2),
                     jnp.float32).reshape(nz, 1, 1)

    for sign, expect_com in ((+1, 32 - 12), (-1, 32 + 12)):
        ww = jnp.full((nz + 1, 1, 1), sign * 0.3 / nz)
        q = q0
        for _ in range(40):                     # 40 steps x CFL 0.3
            fz = adv.vflux(ww, q, 1)
            fz = fz.at[0].set(0.0).at[-1].set(0.0)
            q = q + (-(fz[1:] - fz[:-1]) * rdnw)
        a = np.asarray(q)[:, 0, 0]
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6, \
            f"1st-order vertical advection non-monotone (sign {sign}): " \
            f"[{a.min()}, {a.max()}]"
        com = float((a * np.arange(nz)).sum() / a.sum())
        assert abs(com - expect_com) < 1.0, \
            f"peak moved to {com}, expected {expect_com} (sign {sign})"

    # odd-order dissipation must DAMP (not amplify) a 2-dz sawtooth
    saw = jnp.asarray((-1.0) ** np.arange(nz), jnp.float32).reshape(nz, 1, 1)
    ww = jnp.full((nz + 1, 1, 1), -0.3 / nz)
    q = saw
    for _ in range(10):
        fz = adv.vflux(ww, q, 3)
        fz = fz.at[0].set(0.0).at[-1].set(0.0)
        q = q + (-(fz[1:] - fz[:-1]) * rdnw)
    amp = float(np.abs(np.asarray(q)[8:-8]).max())
    assert amp < 1.0, f"3rd-order vertical advection amplifies 2dz noise: {amp}"


def test_rk3_translation_convergence_order():
    """SURVEY §4.5 / VERDICT r3 item 7: advect an analytic profile one full
    period through the Wicker-Skamarock RK3 + 5th-order flux pipeline and
    measure the SOLUTION convergence order (not just the operator's).
    dt ~ dx^(5/3) keeps the O(dt^3) time error at the O(dx^5) level so the
    spatial order is visible; required slope >= 4.5."""
    import jax

    def solution_error(nx):
        cfg, grid, hx = setup(nx)
        nz, ny = grid.nz, grid.ny
        x = (np.arange(nx) + 0.5) / nx
        q0 = np.broadcast_to(np.sin(2 * np.pi * x) + 0.25
                             * np.sin(4 * np.pi * x), (nz, ny, nx))
        ru = jnp.asarray(np.ones((nz, ny, nx)))
        rv = jnp.asarray(np.zeros((nz, ny, nx)))
        ww = jnp.asarray(np.zeros((nz + 1, ny, nx)))
        ru_pad, rv_pad = hx.pad(ru), hx.pad(rv)

        def rhs(q):
            return adv.advect_scalar(hx.pad(q), ru_pad, rv_pad, ww,
                                     grid, 5, 3)

        dt = 0.4 * (1.0 / nx) ** (5.0 / 3.0)
        n = int(np.ceil(1.0 / dt))
        dt = 1.0 / n

        def step(q, _):
            q1 = q + (dt / 3.0) * rhs(q)
            q2 = q + (dt / 2.0) * rhs(q1)
            return q + dt * rhs(q2), None

        q, _ = jax.lax.scan(step, jnp.asarray(q0), None, length=n)
        return np.max(np.abs(np.asarray(q)[0, 0] - q0[0, 0]))

    with jax.enable_x64(True):
        e1 = solution_error(24)
        e2 = solution_error(48)
    rate = np.log2(e1 / e2)
    assert rate > 4.5, f"translation convergence rate {rate:.2f}"
