"""SPPT/SKEBS stochastic-physics tests (canonical: dyn_em/module_stoch.F)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.dycore import stoch
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh


def test_pattern_statistics_and_correlation():
    hx = HaloOps()
    # spin the AR(1) up to its stationary variance before measuring
    r1 = stoch.smooth(stoch.white_noise((32, 48), hx, 0), hx)
    for s in range(1, 30):
        r1 = stoch.evolve_pattern(r1, hx, 600.0, s)
    r2 = stoch.evolve_pattern(r1, hx, 60.0, 99)
    a1, a2 = np.asarray(r1), np.asarray(r2)
    # O(1) amplitude, zero-ish mean
    assert 0.2 < a1.std() < 3.0
    assert abs(a1.mean()) < 0.5
    # strong temporal correlation at dt << tau
    corr_t = np.corrcoef(a1.ravel(), a2.ravel())[0, 1]
    assert corr_t > 0.95
    # spatial smoothing: neighbor correlation far above white noise
    corr_x = np.corrcoef(a1[:, :-1].ravel(), a1[:, 1:].ravel())[0, 1]
    assert corr_x > 0.5
    # reproducible (stateless hash)
    w1 = stoch.white_noise((8, 8), hx, 5)
    w2 = stoch.white_noise((8, 8), hx, 5)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_pattern_decomposition_invariant():
    """The global-index hash + halo-borne smoothing must give the identical
    pattern for any decomposition (the stochastic analog of the McICA
    invariance contract)."""
    ny, nx = 16, 32
    hx1 = HaloOps()
    ref = stoch.evolve_pattern(jnp.zeros((ny, nx)), hx1, 60.0, 3)

    mesh = make_mesh(2, 4)
    hx8 = HaloOps(mesh_y=2, mesh_x=4, sharded=True)

    def f(blk):
        return stoch.evolve_pattern(blk, hx8, 60.0, 3)

    out = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("my", "mx"),
                                out_specs=P("my", "mx")))(jnp.zeros((ny, nx)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_skebs_increments_are_rotational():
    hx = HaloOps()
    psi = stoch.smooth(stoch.white_noise((24, 24), hx, 7), hx)
    du, dv = stoch.skebs_increments(psi, hx, 1e-5, 1000.0, 1000.0)
    du, dv = np.asarray(du), np.asarray(dv)
    # nondivergent to discretisation accuracy: div ~ 0 for interior cells
    div = (np.roll(du, -1, 1) - np.roll(du, 1, 1)) / 2000.0 \
        + (np.roll(dv, -1, 0) - np.roll(dv, 1, 0)) / 2000.0
    scale = max(np.abs(du).max(), np.abs(dv).max()) / 1000.0
    assert np.abs(div[2:-2, 2:-2]).max() < 0.3 * scale + 1e-12
    assert np.abs(du).max() > 0.0


def test_sppt_paired_runs_diverge():
    """The ARC-Interactions methodology applied to stochastic physics:
    paired runs with/without SPPT must differ, and the perturbed run stays
    stable."""
    base = Config(
        domain=DomainConfig(nx=32, ny=4, nz=12, dx=1000.0, dy=1000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=5.0),
        dynamics=DynamicsConfig(kvdif=20.0),
    )
    out = {}
    for name, amp in (("off", 0.0), ("on", 0.5)):
        cfg = base.replace(dynamics=DynamicsConfig(kvdif=20.0, sppt_amp=amp))
        grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0)
        sim = Simulation(cfg, grid, state, check_nans=True)
        sim.advance(40)
        out[name] = np.asarray(sim.state["w"])
    assert np.isfinite(out["on"]).all()
    d = np.abs(out["on"] - out["off"]).max()
    assert d > 1e-4, "SPPT has no effect"
    assert d < 2.0 * np.abs(out["off"]).max() + 0.1, "SPPT destabilised the run"
