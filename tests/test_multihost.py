"""Two-process multi-host rehearsal as a CI-runnable test (SURVEY.md §4.5;
VERDICT r2 ask #9): jax.distributed joins two OS processes (4 virtual CPU
devices each) into one 8-device global mesh whose process axis is the DCN
analog, and the FULL ARC step executes over it.  The heavy lifting lives in
scripts/multihost_rehearsal.py (also runnable standalone)."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_full_arc_step():
    script = os.path.join(_REPO, "scripts", "multihost_rehearsal.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, script], env=env, timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    with open(os.path.join(_REPO, "artifacts", "MULTIHOST_2PROC.json")) as f:
        art = json.load(f)
    assert art["processes"] == 2
    assert art["global_devices"] == 8
    assert art["local_devices"] == 4
    assert art["finite"]
