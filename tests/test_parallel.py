"""Distributed-correctness tests (SURVEY.md §4.2-3): identical results for
1-device vs 2D-mesh sharded runs — the TPU translation of WRF's
bit-for-bit-across-decompositions regression invariant — on the 8 virtual
CPU devices provided by conftest."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from wrfchem_arc_interactions_tpu.config import (
    ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
    TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import (
    ChemOpt, MPScheme, RAScheme,
)
from wrfchem_arc_interactions_tpu.dycore.solve import step
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import full_step
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
from wrfchem_arc_interactions_tpu.parallel.sharded import (
    grid_partition_specs, halo_ops_for, make_sharded_step,
)
from wrfchem_arc_interactions_tpu.registry.state import state_partition_specs


def _case():
    cfg = Config(domain=DomainConfig(nx=32, ny=8, nz=12, dx=500.0, dy=500.0,
                                     ztop=10000.0, p_top=26000.0),
                 time_control=TimeControl(dt=3.0))
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0, zc=1500.0,
                                  xr=2500.0, zr=1200.0, three_d=True)
    return cfg, grid, state


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4), (2, 2)])
def test_decomposition_invariance(mesh_shape):
    cfg, grid, state = _case()
    hx1 = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y)
    step1 = jax.jit(lambda s: step(s, grid, cfg, hx1, 3.0))
    s1 = state
    for _ in range(3):
        s1 = step1(s1)

    mesh = make_mesh(*mesh_shape)
    sstep, place = make_sharded_step(cfg, grid, mesh, step, 3.0)
    s8, g8 = place(state, grid)
    for _ in range(3):
        s8 = sstep(s8, g8)

    # f32: tolerance is the roundoff floor of the FULL field magnitude
    # (phi ~ 1e5, mu ~ 1e5, theta ~ 300, winds O(1))
    tol = {"u": 5e-3, "v": 5e-3, "w": 5e-3, "t": 5e-3, "mu": 0.1,
           "ph": 0.2, "qv": 1e-8}
    for name, tl in tol.items():
        d = float(jnp.max(jnp.abs(s1[name] - s8[name])))
        assert d < tl, f"{name}: 1-dev vs {mesh_shape} diff {d}"


def test_halo_pad_matches_single_device():
    """ppermute-padded blocks must reproduce the single-device physical pad."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from wrfchem_arc_interactions_tpu.config.namelist import BCKind

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    hx1 = HaloOps(bc_x=BCKind.PERIODIC, bc_y=BCKind.PERIODIC)
    ref = hx1.pad(a, 3)

    mesh = make_mesh(2, 4)
    hx8 = HaloOps(bc_x=BCKind.PERIODIC, bc_y=BCKind.PERIODIC,
                  mesh_y=2, mesh_x=4, sharded=True)

    def f(block):
        return hx8.pad(block, 3)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(None, "my", "mx"),
        out_specs=P(None, "my", "mx")))(a)
    # sharded output concatenates per-block padded arrays; check block (0,0)
    blk = np.asarray(out)[:, :4 + 6, :4 + 6]
    # block (0,0) owns y 0:4, x 0:4 of the global array
    expect = np.asarray(hx1.pad(a, 3))[:, 0:10, 0:10]
    np.testing.assert_allclose(blk, expect, rtol=0, atol=0)


def test_open_bc_pad():
    from wrfchem_arc_interactions_tpu.config.namelist import BCKind
    a = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4)
    hx = HaloOps(bc_x=BCKind.OPEN, bc_y=BCKind.OPEN)
    p = np.asarray(hx.pad(a, 2))
    assert p.shape == (1, 7, 8)
    # edge replication
    assert (p[0, :, 0] == p[0, :, 2]).all()
    assert (p[0, 0, :] == p[0, 2, :]).all()


# ---------------------------------------------------------------------------
# FULL-step (radiation + chemistry + microphysics/activation) decomposition
# invariance — SURVEY.md §4.2-3 applied to the whole ARC-coupled step, not
# just the dycore: covers radiation column flattening + chunked maps, McICA
# subcolumn generation, Mie optics, and the chem operator chain under
# shard_map.
# ---------------------------------------------------------------------------

def _arc_case(nx=16, ny=8, nz=10, dtype=jnp.float32):
    cfg = Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=4.0),
        dynamics=DynamicsConfig(kvdif=20.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG),
        chem=ChemConfig(chem_opt=ChemOpt.CBMZ_MOSAIC_4BIN, chemdt_s=8.0,
                        aer_ra_feedback=True),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=2500.0, zr=1200.0,
                                  three_d=True)
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 3.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 5e9)
    # seed the gas phase so CBM-Z + Fast-J photolysis do real work under
    # shard_map (spectral actinic-flux scans are part of the invariant)
    for s, v in (("o3", 0.04), ("no2", 2e-3), ("no", 1e-3), ("co", 0.12),
                 ("so2", 2e-3), ("h2o2", 1e-3), ("hcho", 2e-3)):
        state[f"chem_{s}"] = jnp.full_like(state["t"], v)
    if dtype != jnp.float32:
        state = {k: v.astype(dtype) for k, v in state.items()}
        grid = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            grid)
    return cfg, grid, state


def _run_full(cfg, grid, state, mesh, n_steps, dtype=jnp.float32):
    hx = halo_ops_for(cfg, mesh)
    dt = cfg.time_control.dt

    def fn(s, g, t_s):
        return full_step(s, g, cfg, hx, dt, True, True, t_s)

    if mesh is not None:
        s_specs = state_partition_specs(cfg)
        g_specs = grid_partition_specs(grid)
        fn = jax.shard_map(fn, mesh=mesh, in_specs=(s_specs, g_specs, P()),
                           out_specs=s_specs)
    stepf = jax.jit(fn)
    s = state
    for i in range(n_steps):
        s = stepf(s, grid, jnp.zeros((), dtype) + i * dt)
    return s


@pytest.mark.slow
def test_full_step_decomposition_invariance():
    """1 device vs 2x2 mesh over the FULL ARC step (f32)."""
    cfg, grid, state = _arc_case()
    s1 = _run_full(cfg, grid, state, None, 2)
    s4 = _run_full(cfg, grid, state, make_mesh(2, 2), 2)
    tol = {"u": 5e-3, "v": 5e-3, "w": 5e-3, "t": 5e-3, "mu": 0.1, "ph": 0.2,
           "qv": 1e-7, "qc": 1e-7, "nc": 5e2,
           "rthraten_sw": 1e-9, "rthraten_lw": 1e-9,
           "chem_so4_a01": 1e-4, "chem_num_a01": 5e3,
           "chem_o3": 1e-6, "chem_no2": 1e-6}
    for name, tl in tol.items():
        d = float(jnp.max(jnp.abs(s1[name] - s4[name])))
        assert d < tl, f"{name}: 1-dev vs (2,2) diff {d}"


@pytest.mark.slow
def test_full_step_decomposition_invariance_f64():
    """f64 tight-tolerance variant: the decomposition changes only the
    reduction/exchange order, so double precision must agree to ~1e-10
    relative (substantiates the PARITY claim)."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg, grid, state = _arc_case(nx=8, ny=8, nz=8, dtype=jnp.float64)
        s1 = _run_full(cfg, grid, state, None, 1, dtype=jnp.float64)
        s4 = _run_full(cfg, grid, state, make_mesh(2, 2), 1, dtype=jnp.float64)
        for name in ("u", "v", "w", "t", "mu", "ph", "qv", "qc",
                     "rthraten_sw", "rthraten_lw", "chem_so4_a01", "chem_o3"):
            a, b = np.asarray(s1[name]), np.asarray(s4[name])
            scale = np.abs(a).max() + 1e-30
            d = np.abs(a - b).max() / scale
            assert d < 1e-10, f"{name}: f64 relative diff {d}"
    finally:
        jax.config.update("jax_enable_x64", False)
