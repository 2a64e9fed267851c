"""Map projections + curvature terms (grid/projection.py; canonical
WPS-geogrid/module_llxy.F role and the curvature terms of
module_big_step_utilities_em.F)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.grid.projection import (
    EARTH_R, Projection, projection_fields,
)


def test_map_factors_unity_at_true_latitudes():
    """Conformal projections have m = 1 exactly at their true latitudes."""
    ny, nx, d = 81, 5, 50e3
    for kind, tl in (("mercator", 20.0), ("polar", 70.0), ("lambert", 45.0)):
        proj = Projection(kind=kind, ref_lat=tl, truelat1=tl, truelat2=tl)
        pf = projection_fields(proj, ny, nx, d, d)
        # the center row sits at ref_lat = truelat
        m_c = pf["msft"][ny // 2, 0]
        assert abs(m_c - 1.0) < 5e-3, (kind, m_c)
        lat_c = pf["xlat"][ny // 2, 0]
        assert abs(lat_c - tl) < 0.3, (kind, lat_c)


def test_lambert_two_truelats_m_below_one_between():
    """With two true latitudes the scale factor dips below 1 between them
    and exceeds 1 outside — the defining secant-cone property."""
    proj = Projection(kind="lambert", ref_lat=45.0, truelat1=30.0,
                      truelat2=60.0)
    pf = projection_fields(proj, 161, 3, 25e3, 25e3)
    lat = pf["xlat"][:, 0]
    m = pf["msft"][:, 0]
    between = (lat > 32.0) & (lat < 58.0)
    outside = (lat < 27.0) | (lat > 63.0)
    assert (m[between] < 1.0).all()
    assert (m[outside] > 1.0).all()


def test_coriolis_increases_with_latitude():
    proj = Projection(kind="lambert", ref_lat=45.0, truelat1=30.0,
                      truelat2=60.0)
    pf = projection_fields(proj, 81, 3, 50e3, 50e3)
    f = pf["f"][:, 0]
    assert (np.diff(f) > 0).all(), "f must grow northward"
    k = 81 // 2
    f_expect = 2 * 7.292e-5 * np.sin(np.radians(pf["xlat"][k, 0]))
    np.testing.assert_allclose(f[k], f_expect, rtol=1e-5)


def test_curvature_term_direction():
    """A pure westerly on a real projection feels an equatorward
    acceleration -u^2 tan(lat)/a beyond the f term."""
    from wrfchem_arc_interactions_tpu.dycore.big_step import coriolis_uv
    from wrfchem_arc_interactions_tpu.models import ideal, soundings
    from wrfchem_arc_interactions_tpu.grid.grid import make_grid
    from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps

    cfg = Config(domain=DomainConfig(nx=16, ny=16, nz=8, dx=50e3, dy=50e3,
                                     ztop=12000.0, p_top=20000.0))
    proj = Projection(kind="lambert", ref_lat=45.0, truelat1=30.0,
                      truelat2=60.0)
    grid = make_grid(cfg, soundings.constant_n2_theta(), projection=proj)
    assert grid.curvature
    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    u = jnp.full((8, 16, 16), 10.0)
    v = jnp.zeros((8, 16, 16))
    gp = hx.pad_many({"u": u, "v": v,
                      "mu": jnp.broadcast_to(grid.mub, (16, 16))}, 3)
    fu, fv = coriolis_uv(gp["u"], gp["v"], gp["mu"], grid)
    mu0 = float(np.asarray(grid.mub)[8, 8])
    expect = -mu0 * 10.0 ** 2 * np.tan(np.radians(45.0)) / EARTH_R \
        - mu0 * float(np.asarray(grid.f)[8, 8]) * 10.0
    got = float(np.asarray(fv)[4, 8, 8])
    np.testing.assert_allclose(got, expect, rtol=0.05)


def test_quiescent_on_lambert_grid_stays_at_rest():
    """Null balance on a real-projection grid: varying f and curvature must
    not spin up a resting atmosphere."""
    from wrfchem_arc_interactions_tpu.models import ideal, soundings
    from wrfchem_arc_interactions_tpu.grid.grid import make_grid
    from wrfchem_arc_interactions_tpu.models.driver import Simulation
    from wrfchem_arc_interactions_tpu.registry.state import build_state

    cfg = Config(
        domain=DomainConfig(nx=24, ny=24, nz=12, dx=50e3, dy=50e3,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=60.0),
        dynamics=DynamicsConfig(kvdif=0.0),
    )
    proj = Projection(kind="lambert", ref_lat=45.0, truelat1=30.0,
                      truelat2=60.0)
    grid = make_grid(cfg, soundings.constant_n2_theta(), projection=proj)
    state = dict(build_state(cfg))
    sim = Simulation(cfg, grid, state)
    sim.advance(20)
    w = np.abs(np.asarray(sim.state["w"]))
    u = np.abs(np.asarray(sim.state["u"]))
    assert w.max() < 5e-3, f"|w|max={w.max()}"
    assert u.max() < 5e-2, f"|u|max={u.max()}"
