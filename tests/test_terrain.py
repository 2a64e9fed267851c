"""Terrain / sloped-coordinate tests (canonical: start_em.F non-flat base
state + module_initialize_hill2d_x.F; SURVEY.md §2.1 'Domain start/setup',
VERDICT r1 item 5).

The sharp test is discrete rest-state balance: an unperturbed atmosphere
over orography must stay at rest, which only holds if the perturbation-form
PGF's terrain cross terms cancel exactly on the discrete grid.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.dycore.solve import step
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
from wrfchem_arc_interactions_tpu.parallel.sharded import make_sharded_step


def _hill_cfg(nx=64, nz=20, dx=2000.0, dt=8.0, bc=BCKind.PERIODIC, ny=4):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=dt),
        dynamics=DynamicsConfig(bc_x=bc, bc_y=BCKind.PERIODIC),
    )


def test_base_state_over_hill_is_discretely_hydrostatic():
    """make_grid terrain base state: alb/phb/pb satisfy the model's own
    discrete relations per column, and mub varies with the orography."""
    cfg = _hill_cfg()
    grid, state = ideal.make_case(cfg, "hill2d_x", hm=300.0, a_half=8000.0,
                                  u0=0.0)
    mub = np.asarray(grid.mub, np.float64)
    assert mub.std() > 0.0, "terrain must produce column-dependent mub"
    assert bool(grid.has_terrain)
    # d(phb)/d(eta) = -mub*alb exactly
    phb = np.asarray(grid.phb, np.float64)
    alb = np.asarray(grid.alb, np.float64)
    dnw = np.asarray(grid.dnw, np.float64).reshape(-1, 1, 1)
    resid = phb[1:] - phb[:-1] + dnw * mub[None] * alb
    assert np.abs(resid).max() < 2.0  # f32 storage of phi ~ 1e5 J/kg
    # the balanced initial state has (near-)zero perturbations
    assert np.abs(np.asarray(state["mu"])).max() < 1.0
    assert np.abs(np.asarray(state["ph"])).max() < 2.0


def test_rest_over_hill_stays_at_rest():
    """Quiescent atmosphere over a 300 m hill: the terrain PGF terms must
    cancel discretely; spurious winds stay at the f32 noise floor."""
    cfg = _hill_cfg()
    grid, state = ideal.make_case(cfg, "hill2d_x", hm=300.0, a_half=8000.0,
                                  u0=0.0)
    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    stepper = jax.jit(lambda s: step(s, grid, cfg, hx, cfg.time_control.dt))
    for _ in range(30):
        state = stepper(state)
    for name in ("u", "v", "w"):
        a = np.asarray(state[name])
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() < 2e-2, \
            f"spurious {name} over orography: {np.abs(a).max()}"


@pytest.mark.slow
def test_mountain_wave_amplitude():
    """u0 = 10 m/s over a witch-of-Agnesi hill: a quasi-steady gravity wave
    forms with w of order u0*hm/a over the hill (linear theory scale)."""
    cfg = _hill_cfg(nx=128, nz=32, dx=2000.0, dt=10.0, bc=BCKind.OPEN)
    hm, a_half, u0 = 250.0, 10000.0, 10.0
    grid, state = ideal.make_case(cfg, "hill2d_x", hm=hm, a_half=a_half,
                                  u0=u0)
    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    stepper = jax.jit(lambda s: step(s, grid, cfg, hx, cfg.time_control.dt))
    for _ in range(180):  # 30 min: wave established over the hill
        state = stepper(state)
    w = np.asarray(state["w"])
    assert np.isfinite(w).all()
    w_scale = u0 * hm / a_half              # 0.25 m/s linear estimate
    w_max = np.abs(w).max()
    assert 0.1 * w_scale < w_max < 6.0 * w_scale, \
        f"w_max {w_max} vs linear scale {w_scale}"
    # the wave is anchored to the hill: column max |w| peaks within +-3a of
    # the crest (center of the domain)
    col = np.abs(w[:, 2, :]).max(axis=0)
    i_peak = int(col.argmax())
    i_crest = cfg.domain.nx // 2
    assert abs(i_peak - i_crest) * cfg.domain.dx < 3.0 * a_half
    # surface w obeys the kinematic BC sign pattern: upslope ascent,
    # downslope descent (check correlation with u0 * dh/dx)
    x = (np.arange(cfg.domain.nx) + 0.5 - 0.5 * cfg.domain.nx) * cfg.domain.dx
    dhdx = np.gradient(hm / (1.0 + (x / a_half) ** 2), cfg.domain.dx)
    w_sfc = w[0, 2, :]
    mask = np.abs(x) < 2 * a_half
    corr = np.corrcoef(w_sfc[mask], (u0 * dhdx)[mask])[0, 1]
    assert corr > 0.8, f"surface kinematic BC violated (corr={corr})"


@pytest.mark.slow
def test_terrain_decomposition_invariance():
    cfg = _hill_cfg(nx=32, nz=12, dx=2000.0, dt=6.0, ny=8)
    grid, state = ideal.make_case(cfg, "hill2d_x", hm=300.0, a_half=6000.0,
                                  u0=8.0)
    hx1 = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    step1 = jax.jit(lambda s: step(s, grid, cfg, hx1, cfg.time_control.dt))
    s1 = state
    for _ in range(3):
        s1 = step1(s1)
    mesh = make_mesh(2, 2)
    sstep, place = make_sharded_step(cfg, grid, mesh, step,
                                     cfg.time_control.dt)
    s4, g4 = place(state, grid)
    for _ in range(3):
        s4 = sstep(s4, g4)
    tol = {"u": 5e-3, "v": 5e-3, "w": 5e-3, "t": 5e-3, "mu": 0.1, "ph": 0.5}
    for name, tl in tol.items():
        d = float(jnp.max(jnp.abs(s1[name] - s4[name])))
        assert d < tl, f"{name}: 1-dev vs (2,2) diff {d}"
