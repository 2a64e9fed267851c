"""Native C++ netCDF backend (io/native/wrfio.cpp via io/netcdf.py).

The format claim — "real netCDF classic files" — is validated two ways:
round-trip through our own reader, and cross-validation against scipy's
independent pure-Python netCDF implementation. The quilt pool's async
semantics (submit returns immediately; drain is the barrier) are exercised
with a burst of concurrent writes.
"""

import numpy as np
import pytest

from wrfchem_arc_interactions_tpu.io import netcdf as nc

pytestmark = pytest.mark.skipif(
    not nc.available(), reason="no C++ toolchain to build the native backend")


def _sample_fields():
    rng = np.random.default_rng(7)
    return {
        "t": rng.standard_normal((12, 8, 16)).astype(np.float32),
        "mu": rng.standard_normal((8, 16)).astype(np.float32),
        "znw": np.linspace(1.0, 0.0, 13),
        "counts": np.arange(9, dtype=np.int32),
    }


def _write(path, fields, async_write=False):
    w = nc.NetCDFWriter()
    w.put_var("t", fields["t"], ["bottom_top", "south_north", "west_east"])
    w.put_var("mu", fields["mu"], ["south_north", "west_east"])
    w.put_var("znw", fields["znw"], ["bottom_top_stag"])
    w.put_var("counts", fields["counts"])
    w.put_att("_time_s", 360.0)
    w.put_att("title", "round-trip test")
    w.write(str(path), async_write=async_write)


def test_round_trip_exact(tmp_path):
    fields = _sample_fields()
    p = tmp_path / "out.nc"
    _write(p, fields)
    got, attrs = nc.read_netcdf(str(p))
    for k, v in fields.items():
        assert got[k].dtype == v.dtype, k
        np.testing.assert_array_equal(got[k], v, err_msg=k)
    assert attrs["_time_s"] == 360.0


def test_scipy_cross_validation(tmp_path):
    """Independent implementation agreement: scipy reads our files."""
    scipy_io = pytest.importorskip("scipy.io")
    fields = _sample_fields()
    p = tmp_path / "out.nc"
    _write(p, fields)
    f = scipy_io.netcdf_file(str(p), "r", mmap=False)
    for k, v in fields.items():
        np.testing.assert_array_equal(np.asarray(f.variables[k][:]), v,
                                      err_msg=k)
    assert f.variables["t"].dimensions == (
        "bottom_top", "south_north", "west_east")
    assert float(f._attributes["_time_s"]) == 360.0
    assert f._attributes["title"] == b"round-trip test"
    f.close()


def test_async_quilt_burst(tmp_path):
    """16 concurrent async writes through the C++ writer pool all land."""
    for i in range(16):
        w = nc.NetCDFWriter()
        w.put_var("x", np.full((64, 64), float(i), np.float32),
                  ["south_north", "west_east"])
        w.write(str(tmp_path / f"q{i}.nc"), async_write=True)
    nc.drain()
    for i in range(16):
        got, _ = nc.read_netcdf(str(tmp_path / f"q{i}.nc"))
        assert (got["x"] == i).all(), i


def test_float64_bits_exact(tmp_path):
    """Restart contract: f64 payloads survive with exact IEEE bits."""
    v = np.array([np.pi, -0.0, 1e-308, 1e308, np.finfo(np.float64).tiny])
    w = nc.NetCDFWriter()
    w.put_var("v", v, ["n"])
    w.write(str(tmp_path / "bits.nc"))
    got, _ = nc.read_netcdf(str(tmp_path / "bits.nc"))
    assert got["v"].tobytes() == v.tobytes()
