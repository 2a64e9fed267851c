"""Mie + aerosol optics tests (SURVEY.md §4.5: 'Mie optics vs exact Mie
series'; the fast Chebyshev path vs the Bohren-Huffman oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.chem import mie
from wrfchem_arc_interactions_tpu.chem.optics import aerosol_optics, bin_optics
from wrfchem_arc_interactions_tpu.physics.radiation import bands as rbands


def test_bhmie_rayleigh_limit():
    m = complex(1.5, 0.0)
    x = 0.02
    qext, qsca, g = mie.bhmie(x, m)
    qs_rayleigh = (8.0 / 3.0) * x ** 4 * abs((m * m - 1) / (m * m + 2)) ** 2
    np.testing.assert_allclose(qsca, qs_rayleigh, rtol=1e-2)
    assert abs(g) < 0.05


def test_bhmie_geometric_limit():
    qext, qsca, g = mie.bhmie(50.0, complex(1.33, 1e-8))
    assert 1.9 < qext < 2.3      # extinction paradox
    assert qsca == pytest.approx(qext, rel=1e-3)  # non-absorbing


def test_bhmie_absorbing():
    qext, qsca, g = mie.bhmie(2.0, complex(1.82, 0.74))  # BC-like
    assert qext > qsca > 0
    assert 0.3 < g < 0.95


def test_cheb_fit_vs_exact():
    """Fast path within a few percent of the exact series across the fitted
    range (bin-averaged use tolerates Mie-ripple smoothing)."""
    tabs = mie.build_cheb_tables()
    rng = np.random.default_rng(3)
    worst = 0.0
    for _ in range(30):
        nr = rng.uniform(1.3, 2.0)
        ni = 10 ** rng.uniform(-8, -0.2)
        x = 10 ** rng.uniform(-1.5, 1.5)
        qe_ref, qs_ref, g_ref = mie.bhmie(x, complex(nr, ni))
        # evaluate the table the way optics.py does
        from wrfchem_arc_interactions_tpu.chem.optics import _interp_coefs
        cq, cs, cg = _interp_coefs(tabs, jnp.asarray(nr), jnp.asarray(ni),
                                   jnp.float32)
        t = jnp.asarray(tabs.t_of_lnx(np.log(x)), jnp.float32)
        qe = float(np.exp(mie.cheb_eval(cq, t)))  # tables store ln Q
        err = abs(qe - qe_ref) / max(qe_ref, 0.05)
        worst = max(worst, err)
    assert worst < 0.35, f"worst relative qext error {worst:.3f}"


def _chem_fields(nbin, shp, bc_heavy=False):
    fields = {}
    for b in range(1, nbin + 1):
        base = 1.0 if b <= 2 else 0.1
        for s in ("so4", "no3", "nh4", "cl", "na", "oin", "oc"):
            fields[f"chem_{s}_a{b:02d}"] = jnp.full(shp, base * 0.5)
        fields[f"chem_bc_a{b:02d}"] = jnp.full(shp, base * (5.0 if bc_heavy else 0.05))
        fields[f"chem_water_a{b:02d}"] = jnp.full(shp, base * 1.0)
        fields[f"chem_num_a{b:02d}"] = jnp.full(shp, base * 1e8)
    return fields


def test_aerosol_optics_sanity():
    shp = (6, 2, 3)
    rho = jnp.full(shp, 1.0)
    dz = jnp.full(shp, 500.0)
    out = aerosol_optics(_chem_fields(4, shp), rho, dz, 4)
    tau = np.asarray(out["tau_aer_sw"])
    ssa = np.asarray(out["ssa_aer_sw"])
    asy = np.asarray(out["asy_aer_sw"])
    tlw = np.asarray(out["tau_aer_lw"])
    assert tau.shape == (rbands.NBND_SW,) + shp
    assert tlw.shape == (rbands.NBND_LW,) + shp
    assert (tau >= 0).all() and (tlw >= 0).all()
    assert (ssa >= 0).all() and (ssa <= 1).all()
    assert (asy >= 0).all() and (asy <= 1).all()
    assert tau.max() > 1e-5     # nonzero optics for nonzero aerosol
    # mostly-scattering mix should have high visible ssa
    vis_band = 9                # ~0.5 um region
    assert ssa[vis_band].mean() > 0.8


def test_bc_darkens_aerosol():
    shp = (4, 2, 2)
    rho = jnp.full(shp, 1.0)
    dz = jnp.full(shp, 500.0)
    clean = aerosol_optics(_chem_fields(4, shp), rho, dz, 4)
    sooty = aerosol_optics(_chem_fields(4, shp, bc_heavy=True), rho, dz, 4)
    vis = 9
    assert float(np.mean(np.asarray(sooty["ssa_aer_sw"][vis]))) < \
        float(np.mean(np.asarray(clean["ssa_aer_sw"][vis])))


def test_band_scan_poly_eval_matches_unrolled():
    """The compile-size-bounded band-scan/matmul evaluator (the production
    path after the round-5 TPU-compile pathology fix) must reproduce the
    unrolled scalar-Horner tensor-poly evaluation per band: same Clenshaw
    recurrence, coefficients contracted by one (90,35) matmul instead of
    6300 fused scalar FMAs."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import mie, optics

    ptabs = mie.build_poly_tables()
    rng = np.random.default_rng(11)
    nband, n = 7, 64
    nr_n = jnp.asarray(rng.uniform(0, 1, (nband, n)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (nband, n)), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, (nband, n)), jnp.float32)

    qe, qs, g = optics._poly_cheb_eval_bands(ptabs, nr_n, u, t)
    for got, C in ((qe, ptabs.C_qext), (qs, ptabs.C_qsca), (g, ptabs.C_g)):
        want = jnp.stack([optics._poly_cheb_eval(C, nr_n[b], u[b], t[b])
                          for b in range(nband)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_mie_matches_band_scan():
    """ops/pallas_mie.py (the TPU production Mie evaluator) must match the
    XLA band-scan path — interpreter mode, multi-tile, realistic
    normalised input ranges."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import mie, optics
    from wrfchem_arc_interactions_tpu.ops.pallas_mie import cheb_eval_pallas

    G = mie.build_grid_matrix()
    rng = np.random.default_rng(5)
    nband, n = 7, 200                      # 1400 elements -> 2 tiles
    nr_n = jnp.asarray(rng.uniform(0, 1, (nband, n)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (nband, n)), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, (nband, n)), jnp.float32)

    got = cheb_eval_pallas(nr_n, u, t, interpret=True)
    want = optics._cheb_eval_bands(G, nr_n, u, t)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)


def test_bilinear_eval_matches_interp_coefs():
    """The hat-weight matmul evaluator (_cheb_eval_bands) must reproduce
    the reference gather-based bilinear interpolation (_interp_coefs +
    cheb_eval) — same tables, same interpolation, different contraction."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import mie, optics

    tabs = mie.build_cheb_tables()
    G = mie.build_grid_matrix()
    rng = np.random.default_rng(9)
    for _ in range(10):
        nr = rng.uniform(1.26, 2.09)
        ni = 10 ** rng.uniform(-8.9, -0.1)
        t = rng.uniform(-1, 1)
        cq, cs, cg = optics._interp_coefs(tabs, jnp.asarray(nr),
                                          jnp.asarray(ni), jnp.float32)
        want = [float(mie.cheb_eval(c, jnp.asarray(t, jnp.float32)))
                for c in (cq, cs, cg)]
        nr_n = (nr - mie.NR_GRID[0]) / (mie.NR_GRID[-1] - mie.NR_GRID[0])
        u = (np.log10(ni) + 9.0) / 9.0
        got = optics._cheb_eval_bands(
            G, jnp.full((1, 1), nr_n, jnp.float32),
            jnp.full((1, 1), u, jnp.float32),
            jnp.full((1, 1), t, jnp.float32))
        for gv, wv in zip(got, want):
            assert abs(float(gv[0, 0]) - wv) < 1e-3 * (abs(wv) + 1), (gv, wv)


def test_evaluator_conditioning():
    """The round-5 correctness regression guard: one-ulp-scale input
    perturbations must move ln Q by a proportionally tiny amount.  The
    retired tensor-poly refit moved ln Q by O(1) under 1e-6 input noise
    (hardware-diagnosed: two XLA programs computing identical physics
    disagreed 2x in Q because their fused preps differed in the last ulp);
    the hat-weight bilinear form has |d lnQ/du| <= 9 * max|C| locally."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.chem import mie, optics

    G = mie.build_grid_matrix()
    rng = np.random.default_rng(7)
    shp = (5, 300)
    nr_n = jnp.asarray(rng.uniform(0, 1, shp), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, shp), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, shp), jnp.float32)
    eps = 1e-6
    base = optics._cheb_eval_bands(G, nr_n, u, t)
    pert = optics._cheb_eval_bands(G, nr_n + eps, u + eps,
                                   jnp.clip(t + eps, -1, 1))
    for b, q in zip(base, pert):
        d = float(jnp.max(jnp.abs(b - q)))
        assert d < 5e-3, d


def test_pallas_mie_under_shard_map():
    """The production multi-chip chem path traces cheb_eval_pallas under
    shard_map (models/driver.py jits chem_driver over the mesh); the
    out_shape must carry the inputs' varying-manual-axes type.  Abstract
    eval on the production-shaped 2x4 mesh exercises the full vma
    typecheck without TPU hardware (same pattern as the ROS2 kernel's
    test_pallas_ros2_under_shard_map part b)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from wrfchem_arc_interactions_tpu.ops.pallas_mie import (
        TILE, cheb_eval_pallas,
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("my", "mx"))
    n = 8 * TILE
    spec = P(None, ("my", "mx"))
    a = jnp.zeros((4, n), jnp.float32)
    prod = jax.shard_map(
        lambda x, y, z: cheb_eval_pallas(x, y, z),
        mesh=mesh, in_specs=(spec,) * 3, out_specs=(spec,) * 3)
    outs = jax.eval_shape(prod, a, a, a)
    for o in outs:
        assert o.shape == a.shape and o.dtype == a.dtype
