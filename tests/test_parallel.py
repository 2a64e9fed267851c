"""Distributed-correctness tests (SURVEY.md §4.2-3): identical results for
1-device vs 2D-mesh sharded runs — the TPU translation of WRF's
bit-for-bit-across-decompositions regression invariant — on the 8 virtual
CPU devices provided by conftest."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import Config, DomainConfig, TimeControl
from wrfchem_arc_interactions_tpu.dycore.solve import step
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
from wrfchem_arc_interactions_tpu.parallel.sharded import make_sharded_step


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
