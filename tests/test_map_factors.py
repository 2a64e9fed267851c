"""Map-scale factors in the dynamics (canonical: the msft/msfu/msfv
scaling of module_big_step_utilities_em.F, module_advect_em.F and
module_small_step_em.F; SURVEY.md §2.1 'Big-step utilities' map-factor
row).  Three load-bearing invariants:

1. with m == 1 the msf code path is BIT-EXACT against the flat path
   (the real-projection program is a strict generalisation);
2. on a real (Lambert) projection, total dry mass sum(mu / m^2) is
   conserved to roundoff by the discrete flux form (the m^2-scaled
   divergence telescopes);
3. the msf dynamics stay decomposition-invariant under shard_map.
"""

import dataclasses

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.dycore.solve import step
from wrfchem_arc_interactions_tpu.grid.grid import make_grid
from wrfchem_arc_interactions_tpu.grid.projection import (
    EARTH_R, Projection, projection_fields,
)
from wrfchem_arc_interactions_tpu.models import ideal, soundings
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
from wrfchem_arc_interactions_tpu.parallel.sharded import make_sharded_step


_LAMBERT = Projection(kind="lambert", ref_lat=45.0, truelat1=30.0,
                      truelat2=60.0)


def _bubble_case(nx=24, ny=16, nz=10, dx=2000.0, projection=None):
    cfg = Config(domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx,
                                     ztop=10000.0, p_top=26000.0),
                 time_control=TimeControl(dt=10.0),
                 dynamics=DynamicsConfig(kvdif=0.0))
    grid = make_grid(cfg, soundings.constant_n2_theta(), projection=projection)
    state = ideal.warm_bubble(cfg, grid, amplitude=2.0, zc=1500.0,
                              xr=4000.0, zr=1200.0, three_d=True)
    return cfg, grid, state


def test_msf_unity_reduces_to_flat():
    """curvature=True with m == 1, dm/dy == 0 must reproduce the
    flat-metric program: every msf op multiplies/divides by an exact 1.0 or
    adds an exact 0.0.  Each such op is individually bit-exact, but the two
    programs compile to different XLA graphs (different fusion/FMA
    contraction choices), so the comparison is at the one-ulp level rather
    than array_equal."""
    cfg, grid, state = _bubble_case()
    grid_msf = dataclasses.replace(grid, curvature=True)
    assert grid_msf.has_msf and not grid.has_msf

    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    s_flat = jax.jit(lambda s: step(s, grid, cfg, hx, 10.0))(state)
    s_msf = jax.jit(lambda s: step(s, grid_msf, cfg, hx, 10.0))(state)
    # a few ulps of the field magnitudes (phi ~ 1e5, mu ~ 1e5 Pa, winds O(10))
    tol = {"u": 1e-6, "v": 1e-6, "w": 1e-6, "t": 1e-5, "mu": 1e-4,
           "ph": 1e-3}
    for name in s_flat:
        d = float(np.max(np.abs(np.asarray(s_flat[name])
                                - np.asarray(s_msf[name]))))
        assert d <= tol.get(name, 1e-6), f"{name}: msf path off by {d}"


@pytest.mark.slow
def test_lambert_mass_conservation():
    """Total dry mass sum(mu_full / m^2) (physical cell area ~ dx dy / m^2)
    is exactly conserved by the m^2-scaled flux-form continuity equation
    with periodic BCs."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg, grid, state = _bubble_case(dx=20e3, projection=_LAMBERT)
        grid = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            grid)
        state = {k: v.astype(jnp.float64) for k, v in state.items()}
        assert float(np.ptp(np.asarray(grid.msft))) > 1e-4, "m must vary"

        hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
        stp = jax.jit(lambda s: step(s, grid, cfg, hx, 10.0))
        inv_m2 = 1.0 / (np.asarray(grid.msft) ** 2)

        def total_mass(s):
            return float(np.sum((np.asarray(grid.mub) + np.asarray(s["mu"]))
                                * inv_m2))

        m0 = total_mass(state)
        s = state
        for _ in range(10):
            s = stp(s)
        drift = abs(total_mass(s) - m0) / m0
        assert drift < 1e-12, f"dry-mass drift {drift}"
        # and the run stayed healthy
        assert float(jnp.max(jnp.abs(s["w"]))) < 10.0
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_lambert_scalar_mass_conservation():
    """Advected-scalar mass sum(mu q / m^2) is conserved through the
    m^2-scaled flux divergence + PD limiter."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg, grid, state = _bubble_case(dx=20e3, projection=_LAMBERT)
        grid = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            grid)
        state = {k: v.astype(jnp.float64) for k, v in state.items()}

        hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
        stp = jax.jit(lambda s: step(s, grid, cfg, hx, 10.0))
        inv_m2 = 1.0 / (np.asarray(grid.msft) ** 2)

        def scalar_mass(s):
            mu = np.asarray(grid.mub) + np.asarray(s["mu"])
            return float(np.sum(mu[None] * np.asarray(s["qv"]) * inv_m2))

        q0 = scalar_mass(state)
        s = state
        for _ in range(8):
            s = stp(s)
        drift = abs(scalar_mass(s) - q0) / max(abs(q0), 1e-300)
        assert drift < 1e-11, f"scalar-mass drift {drift}"
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_lambert_decomposition_invariance():
    """msf dynamics are bitwise-reproducible across decompositions to f32
    roundoff (msf fields ride the group-A halo exchange)."""
    cfg, grid, state = _bubble_case(nx=32, ny=8, dx=20e3,
                                    projection=_LAMBERT)
    hx1 = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    step1 = jax.jit(lambda s: step(s, grid, cfg, hx1, 10.0))
    s1 = state
    for _ in range(3):
        s1 = step1(s1)

    mesh = make_mesh(2, 4)
    sstep, place = make_sharded_step(cfg, grid, mesh, step, 10.0)
    s8, g8 = place(state, grid)
    for _ in range(3):
        s8 = sstep(s8, g8)

    tol = {"u": 5e-3, "v": 5e-3, "w": 5e-3, "t": 5e-3, "mu": 0.1,
           "ph": 0.3, "qv": 1e-8}
    for name, tl in tol.items():
        d = float(jnp.max(jnp.abs(s1[name] - s8[name])))
        assert d < tl, f"{name}: 1-dev vs (2,4) diff {d}"


def test_mercator_dmdy_is_spherical_curvature():
    """On a Mercator grid dm/dy = tan(lat)/a exactly, so the conformal
    f_eff = f + u dm/dy reproduces the spherical curvature term
    u tan(lat)/a."""
    proj = Projection(kind="mercator", ref_lat=30.0, truelat1=30.0)
    pf = projection_fields(proj, 41, 3, 50e3, 50e3)
    lat = pf["xlat"][:, 0]
    expect = np.tan(np.radians(lat)) / EARTH_R
    got = pf["dmdy"][:, 0]
    np.testing.assert_allclose(got, expect, rtol=2e-3)


def test_lambert_quiescent_still_at_rest():
    """A hydrostatically *balanced* resting atmosphere on a Lambert grid
    with full msf dynamics stays at rest (the msf terms all multiply zero
    fluxes; the balanced base state cancels the PGF/buoyancy exactly)."""
    cfg, grid, _ = _bubble_case(nx=16, ny=16, dx=50e3, projection=_LAMBERT)
    theta = np.asarray(grid.t_init, np.float64)
    qv = np.zeros((grid.nz, grid.ny, grid.nx))
    state = ideal.init_balanced(cfg, grid, theta, qv)
    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    stp = jax.jit(lambda s: step(s, grid, cfg, hx, 10.0))
    s = state
    for _ in range(10):
        s = stp(s)
    assert float(jnp.max(jnp.abs(s["u"]))) < 1e-3
    assert float(jnp.max(jnp.abs(s["w"]))) < 1e-3
