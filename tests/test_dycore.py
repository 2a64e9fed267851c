import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import Config, DomainConfig, DynamicsConfig, TimeControl
from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.dycore.solve import step
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps


def make_hx(cfg):
    return HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)


def run_steps(state, grid, cfg, n, dt):
    hx = make_hx(cfg)
    stepper = jax.jit(lambda s: step(s, grid, cfg, hx, dt))
    for _ in range(n):
        state = stepper(state)
    return state


def test_quiescent_stays_at_rest():
    cfg = Config(
        domain=DomainConfig(nx=24, ny=4, nz=16, dx=2000.0, dy=2000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=10.0),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    out = run_steps(state, grid, cfg, 10, cfg.time_control.dt)
    for name in ("u", "v", "w"):
        m = float(jnp.max(jnp.abs(out[name])))
        assert m < 5e-3, f"{name} grew to {m}"
    assert float(jnp.max(jnp.abs(out["t"] - state["t"]))) < 1e-2
    assert float(jnp.max(jnp.abs(out["mu"] - state["mu"]))) < 1.0
    for name, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), name


def test_warm_bubble_rises():
    cfg = Config(
        domain=DomainConfig(nx=40, ny=4, nz=20, dx=500.0, dy=500.0,
                            ztop=10000.0, p_top=26000.0),
        time_control=TimeControl(dt=3.0),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=2000.0, zr=1000.0)
    out = run_steps(state, grid, cfg, 60, cfg.time_control.dt)  # 3 minutes
    w = np.asarray(out["w"])
    assert np.isfinite(w).all()
    assert w.max() > 0.5, f"bubble failed to rise: w_max={w.max()}"
    # updraft should sit above the initial bubble center in the middle
    kmax, jmax, imax = np.unravel_index(np.argmax(w), w.shape)
    assert 10 <= imax <= 30
    # mass conservation: domain-total mu drift tiny
    mu0 = float(jnp.sum(state["mu"]))
    mu1 = float(jnp.sum(out["mu"]))
    assert abs(mu1 - mu0) < 1e-2 * state["mu"].size + 50.0


def test_stacked_scalar_path_matches_per_tracer_loop():
    """The stacked (n_tracers, nz, ny, nx) advection pass must be
    numerically identical to the per-tracer loop (they share the same
    operators; the gate is purely a performance/compile-size choice)."""
    import dataclasses
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    def run(stack_min):
        cfg = Config(
            domain=DomainConfig(nx=16, ny=6, nz=12, dx=2000.0, dy=2000.0,
                                ztop=14000.0, p_top=14000.0),
            time_control=TimeControl(dt=10.0),
            dynamics=DynamicsConfig(kvdif=20.0, stack_tracer_min=stack_min,
                                    scan_tracer_min=10_000),
            chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=1e9,
                            gaschem_onoff=False, aerchem_onoff=False),
        )
        grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
        for b in (1, 2):
            state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
            state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
        sim = Simulation(cfg, grid, state, check_nans=True)
        sim.advance(8)
        return sim.state

    a = run(1)          # stacked (tracer count >= 1)
    b = run(10_000)     # per-tracer loop
    for k in a:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert np.array_equal(va, vb) or np.allclose(va, vb, rtol=0,
                                                     atol=1e-6 * max(1.0, np.abs(vb).max())), k


def test_scan_scalar_path_matches_per_tracer_loop():
    """The lax.scan tracer path (round-5 production default for chem
    configs: O(1) HLO in tracer count AND measured faster than the
    unrolled loop) must reproduce the per-tracer loop exactly, including
    the PD-limited final stage and physics-tendency routing (tendency
    carriers stay on the unrolled path)."""
    import dataclasses
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, PBLScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    def run(scan_min):
        cfg = Config(
            domain=DomainConfig(nx=16, ny=6, nz=12, dx=2000.0, dy=2000.0,
                                ztop=14000.0, p_top=14000.0),
            time_control=TimeControl(dt=10.0),
            dynamics=DynamicsConfig(kvdif=20.0, scan_tracer_min=scan_min),
            # PBL on so moist tracers carry physics tendencies (they must
            # route to the unrolled path under scan)
            physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                                  bl_pbl_physics=PBLScheme.YSU),
            chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=1e9,
                            gaschem_onoff=False, aerchem_onoff=False),
        )
        grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
        for b in (1, 2):
            state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
            state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
        sim = Simulation(cfg, grid, state, check_nans=True)
        sim.advance(1)
        return sim.state

    # ONE step, 1e-5-relative tolerance: the scan body compiles separately
    # from the unrolled loop, so XLA's fusion/FMA choices differ by an ulp
    # (measured 1e-7 relative at step 1) and the moist->acoustic/PBL
    # feedback amplifies that nonlinearly with step count (1.3e-4 on w by
    # step 2); a structural error (wrong tracer index, dropped tendency,
    # missing limiter) shows up at O(1) in the very first step.
    a = run(1)          # scan path
    b = run(10_000)     # per-tracer loop
    for k in a:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert np.array_equal(va, vb) or np.allclose(
            va, vb, rtol=0, atol=1e-5 * max(1.0, np.abs(vb).max())), k
