"""WPS intermediate-format ingestion (io/wps_intermediate.py — canonical:
WPS ungrib output_module.F90 / metgrid read_met_module.F90, feeding
main/real_em.F): byte-level roundtrip, snapshot conversion, bilinear
regrid exactness, and the full real-init pipeline from files on disk."""

import numpy as np
import pytest

from wrfchem_arc_interactions_tpu.io.wps_intermediate import (
    LVL_SURFACE,
    WPSRecord,
    read_wps_intermediate,
    snapshots_from_wps,
    write_wps_intermediate,
)


def _mkrec(field, xlvl, slab, hdate="2019-07-01_00:00:00", units="K",
           iproj=0, proj=None):
    ny, nx = slab.shape
    return WPSRecord(
        hdate=hdate, xfcst=0.0, map_source="SYNTHETIC GFS", field=field,
        units=units, desc=f"{field} test slab", xlvl=xlvl, iproj=iproj,
        startloc="SWCORNER",
        proj=proj or dict(startlat=30.0, startlon=-110.0, deltalat=0.5,
                          deltalon=0.5, earth_radius=6367.47),
        wind_earth_rel=False, slab=np.asarray(slab, np.float32))


def _records_for_time(hdate, ny=12, nx=20, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for p in (1000e2, 700e2, 300e2):
        t = 288.0 - 50.0 * np.log(1000e2 / p) + rng.normal(0, 0.5, (ny, nx))
        recs.append(_mkrec("TT", p, t))
        recs.append(_mkrec("UU", p, 10.0 + rng.normal(0, 1, (ny, nx)), "m s-1"))
        recs.append(_mkrec("VV", p, rng.normal(0, 1, (ny, nx)), "m s-1"))
        recs.append(_mkrec("RH", p, np.clip(
            70 + rng.normal(0, 10, (ny, nx)), 0, 100), "%"))
    recs.append(_mkrec("PSFC", LVL_SURFACE,
                       101000.0 + rng.normal(0, 100, (ny, nx)), "Pa"))
    recs.append(_mkrec("SOILHGT", LVL_SURFACE, np.zeros((ny, nx)), "m"))
    for r in recs:
        r.hdate = hdate
    return recs


def test_roundtrip_exact(tmp_path):
    path = str(tmp_path / "FILE:2019-07-01_00")
    recs = _records_for_time("2019-07-01_00:00:00")
    write_wps_intermediate(path, recs)
    back = read_wps_intermediate(path)
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        assert (b.field, b.units.strip(), b.iproj) == (
            a.field, a.units.strip(), a.iproj)
        assert b.hdate.strip() == a.hdate.strip()
        assert b.xlvl == np.float32(a.xlvl)
        for k, v in a.proj.items():
            assert b.proj[k] == pytest.approx(v, rel=1e-6)
        np.testing.assert_array_equal(b.slab, np.asarray(a.slab, np.float32))


def test_snapshots_from_wps(tmp_path):
    paths = []
    for i, hd in enumerate(("2019-07-01_00:00:00", "2019-07-01_06:00:00")):
        p = str(tmp_path / f"FILE:{hd[:13]}")
        write_wps_intermediate(p, _records_for_time(hd, seed=i))
        paths.append(p)
    snaps = snapshots_from_wps(paths)
    assert [s.time_s for s in snaps] == [0.0, 6 * 3600.0]
    s = snaps[0]
    assert (np.diff(s.p_levels) < 0).all()          # decreasing
    assert s.t.shape == (3, 12, 20) and s.u.shape == s.t.shape
    # RH -> qv: warm moist surface air ~ 10 g/kg scale, drier aloft
    assert 0.005 < s.qv[0].mean() < 0.02
    assert s.qv[-1].mean() < s.qv[0].mean()
    assert abs(s.p_sfc.mean() - 101000.0) < 500.0


def test_bilinear_regrid_exact_on_linear_field():
    from wrfchem_arc_interactions_tpu.io.wps_intermediate import _regrid
    ny_s, nx_s = 25, 41
    rec = _mkrec("TT", 500e2, np.zeros((ny_s, nx_s)),
                 proj=dict(startlat=20.0, startlon=-120.0, deltalat=0.5,
                           deltalon=0.5, earth_radius=6367.47))
    lat_s = 20.0 + 0.5 * np.arange(ny_s)
    lon_s = -120.0 + 0.5 * np.arange(nx_s)
    slab = 2.0 * lat_s[:, None] - 3.0 * lon_s[None, :] + 1.0
    xlat = np.linspace(21.0, 30.0, 7)[:, None] * np.ones((1, 9))
    xlong = np.ones((7, 1)) * np.linspace(-118.0, -105.0, 9)[None, :]
    out = _regrid(slab, rec, xlat, xlong)
    np.testing.assert_allclose(out, 2.0 * xlat - 3.0 * xlong + 1.0,
                               rtol=1e-6)


@pytest.mark.slow
def test_real_init_from_wps_files(tmp_path):
    """End-to-end: files on disk -> snapshots -> balanced state + boundary
    stream -> 5 stable steps with specified BCs (the met_em -> wrfinput ->
    wrfbdy -> run flow of the reference, from REAL-format inputs)."""
    from tests.test_real_init import _cfg
    from wrfchem_arc_interactions_tpu.models import real
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = _cfg(nx=20, ny=12, nz=16)
    paths = []
    for i, hd in enumerate(("2019-07-01_00:00:00", "2019-07-01_01:00:00")):
        p = str(tmp_path / f"FILE:{hd[:13]}")
        write_wps_intermediate(p, _records_for_time(hd, ny=12, nx=20, seed=i))
        paths.append(p)
    snaps = snapshots_from_wps(paths)
    grid, state, segs = real.real_init(cfg, snaps)
    mu_full = np.asarray(grid.mub) + np.asarray(state["mu"])
    np.testing.assert_allclose(mu_full + grid.p_top, snaps[0].p_sfc,
                               rtol=5e-3)
    sim = Simulation(cfg, grid, state, boundary=segs[0], check_nans=True)
    sim.advance(5)
    w = np.asarray(sim.state["w"])
    assert np.isfinite(w).all() and np.abs(w).max() < 5.0
