"""Polar FFT filter (canonical: dyn_em/module_polar_fft.F via solve_em.F's
pxft calls) — mask construction, spectral truncation, and the solve-step
wiring under fft_filter_lat."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from wrfchem_arc_interactions_tpu.dycore.polar_filter import (
    PolarFilter,
    apply_filter,
    filter_mask,
)


def test_mask_identity_equatorward_truncation_poleward():
    nx = 64
    lats = jnp.array([0.0, 30.0, 44.9, 60.0, 80.0, 89.0])
    m = np.asarray(filter_mask(lats, nx, 45.0))
    # equatorward rows: identity
    assert (m[:3] == 1.0).all()
    # poleward rows: zonal mean always passes, high-k truncated
    assert (m[:, 0] == 1.0).all()
    assert m[3:, -1].max() == 0.0
    # k_max shrinks with latitude: retained mode count decreases
    kept = (m > 0).sum(axis=1)
    assert kept[3] > kept[4] > kept[5] >= 1
    # sharp mask is exactly 0/1
    assert set(np.unique(m)) <= {0.0, 1.0}
    # k_max formula: (nx/2) cos(lat)/cos(45)
    for i, lat in ((3, 60.0), (4, 80.0)):
        k_max = (nx / 2) * np.cos(np.deg2rad(lat)) / np.cos(np.deg2rad(45.0))
        assert kept[i] == int(np.floor(k_max)) + 1


def test_filter_removes_high_k_preserves_low_k_and_mean():
    nx, ny = 64, 5
    x = np.arange(nx) * (2 * np.pi / nx)
    lats = jnp.array([0.0, 50.0, 70.0, 85.0, 89.0])
    # field = mean + low-k + high-k
    f = (3.0 + np.cos(2 * x)[None, :] + 0.5 * np.cos(25 * x)[None, :]
         ) * np.ones((ny, 1))
    mask = filter_mask(lats, nx, 45.0)
    out = np.asarray(apply_filter(jnp.asarray(f, jnp.float32), mask))
    spec = np.abs(np.fft.rfft(out, axis=-1)) / nx
    # zonal mean exact on every row
    np.testing.assert_allclose(out.mean(-1), f.mean(-1), rtol=1e-6)
    # row 0 untouched
    np.testing.assert_allclose(out[0], f[0], atol=1e-5)
    # k=2 survives everywhere lat<~82 (k_max(70)=15.5, k_max(85)=3.9)
    assert spec[2, 2] > 0.49
    # k=25 survives at lat 50 (k_max=29.1) but is gone poleward of it
    assert spec[0, 25] > 0.2 and spec[1, 25] > 0.2
    assert (spec[2:, 25] < 1e-6).all()
    # idempotent (sharp projection)
    out2 = np.asarray(apply_filter(jnp.asarray(out), mask))
    np.testing.assert_allclose(out2, out, atol=1e-5)


def test_scalar_taper_positive_definite():
    nx = 64
    lats = jnp.array([85.0])
    x = np.arange(nx) * (2 * np.pi / nx)
    q = jnp.asarray(0.05 + 0.05 * np.sign(np.cos(20 * x))[None, :],
                    jnp.float32)  # square wave, would ring when truncated

    class G:
        xlat = jnp.array([[85.0]]) * jnp.ones((1, nx))

    pf = PolarFilter(G(), 45.0, nx)
    out = np.asarray(pf.scalar(q))
    assert (out >= 0.0).all()
    # mean preserved to the clip (clip only raises it)
    assert out.mean() >= float(q.mean()) - 1e-6


@pytest.mark.slow
def test_solve_step_with_polar_filter():
    """2 steps of the full RK3 step with fft_filter_lat=45 on a grid whose
    rows reach 88N: stays finite, and theta's poleward rows carry no energy
    above their k_max while an equatorward row keeps its spectrum."""
    import jax

    import bench
    from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = bench._cfg3(nx=32, ny=16, nz=20)
    cfg = cfg.replace(
        chem=dataclasses.replace(cfg.chem, chem_opt=ChemOpt.NONE),
        dynamics=dataclasses.replace(cfg.dynamics, fft_filter_lat=45.0))
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    ny, nx = grid.xlat.shape
    lat_rows = jnp.linspace(0.0, 88.0, ny)
    grid = dataclasses.replace(
        grid, xlat=jnp.broadcast_to(lat_rows[:, None], (ny, nx)))
    # seed zonal noise so there is high-k energy to remove
    key = jax.random.PRNGKey(0)
    state["t"] = state["t"] + 0.1 * jax.random.normal(key, state["t"].shape)
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(2)
    th = np.asarray(sim.state["t"])
    assert np.isfinite(th).all()
    spec = np.abs(np.fft.rfft(th, axis=-1)).max(axis=0)   # (ny, nk)
    k = np.arange(spec.shape[1])
    for j, lat in enumerate(np.asarray(lat_rows)):
        if lat <= 45.0:
            continue
        k_max = (nx / 2) * np.cos(np.deg2rad(lat)) / np.cos(np.deg2rad(45.0))
        # tapered scalar path keeps some roll-off up to k_max; nothing above
        assert spec[j, k > k_max + 0.5].max() < 1e-3, (j, lat)
    # an unfiltered row still has near-Nyquist energy (nx=32 -> nk=17)
    assert spec[0, k > 12].max() > 1e-3
