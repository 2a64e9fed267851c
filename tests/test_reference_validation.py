"""The reference-data watcher (scripts/validate_reference.py) must run
cleanly in BOTH worlds: while /root/reference stays empty it reports every
oracle as absent (with the blocking consequence named), and the moment
data appears its scanners engage — exercised here against a synthetic
populated mount so the found-path code cannot rot."""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(_REPO, "scripts", "validate_reference.py")


def _run(ref_dir):
    out = str(ref_dir) + "_report.json"
    env = dict(os.environ, REFERENCE_DIR=str(ref_dir),
               REFERENCE_VALIDATION_OUT=out)
    r = subprocess.run([sys.executable, SCRIPT], env=env, timeout=300,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out) as f:
        return json.load(f)


def test_empty_mount_reports_absent(tmp_path):
    rep = _run(tmp_path)
    assert rep["mount_populated"] is False
    for key in ("rrtmg_data", "golden_wrfout", "cbmz_rates"):
        assert rep[key]["status"] == "absent"
        assert "blocking" in rep[key]


def test_populated_mount_engages_scanners(tmp_path):
    (tmp_path / "dyn_em").mkdir()
    (tmp_path / "dyn_em" / "solve_em.F").write_text("! ARW solver\n")
    (tmp_path / "chem").mkdir()
    (tmp_path / "chem" / "module_cbmz.F").write_text(
        "rk(1) = ARR( 2.6e-34 , 0.0 )\nrk(2) = ARR( 1.8e-12 , -1370.0 )\n")
    rep = _run(tmp_path)
    assert rep["mount_populated"] is True
    assert rep["source_tree"]["status"] == "found"
    assert rep["source_tree"]["markers_found"] >= 2
    cb = rep["cbmz_rates"]
    assert cb["status"] == "found"
    assert len(cb["sample_rate_constants"]) == 2


def test_nc_inventory_reads_real_file(tmp_path):
    """ADVICE r3: read_netcdf returns (vars, attrs); the watcher's .nc
    inventory must unpack it — exercised on a real file produced by the
    native writer, not just the empty-mount path."""
    import numpy as np
    from wrfchem_arc_interactions_tpu.io import netcdf as nc

    if not nc.available():
        import pytest
        pytest.skip("native wrfio backend unavailable")
    w = nc.NetCDFWriter()
    w.put_var("kmajor", np.ones((16, 3, 5), np.float32))
    w.put_var("press_ref", np.linspace(1e5, 1e3, 5).astype(np.float32))
    w.write(str(tmp_path / "rrtmg_sw_data.nc"))
    rep = _run(tmp_path)
    ing = rep["rrtmg_data"]["ingest"]["rrtmg_sw_data.nc"]
    assert "_error" not in ing, ing
    assert tuple(ing["kmajor"]) == (16, 3, 5)
