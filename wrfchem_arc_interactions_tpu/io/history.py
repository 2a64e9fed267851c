"""History and restart I/O (canonical: the stream-based Registry-driven I/O
of share/output_wrf.F + external/io_netcdf, and the wrfrst restart path of
SURVEY.md §3.5).

No netCDF/zarr libraries exist in this environment, so the container format
is numpy `.npz` (one file per dump, field name -> array, plus scalar
metadata) — the registry decides *what* goes in each stream exactly like
the reference's `h`/`r` flags:

- history stream: `history_names(cfg)` fields + coordinates, on the
  history_interval alarm;
- restart stream: `restart_names(cfg)` fields + (step, time) metadata,
  bit-exact resume contract (tested in tests/test_io_restart.py).

Writes are host-side (device_get) after the step completes — the async
quilt-server analog is a ThreadPoolExecutor flush so the device never
waits on disk.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import jax
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.registry.state import (
    State, history_names, restart_names,
)

_EXECUTOR = ThreadPoolExecutor(max_workers=2)


def _gather(state: State, names) -> Dict[str, np.ndarray]:
    return {n: np.asarray(jax.device_get(state[n])) for n in names if n in state}


def write_history(path: str, cfg: Config, grid: Grid, state: State,
                  time_s: float, async_write: bool = True) -> None:
    data = _gather(state, history_names(cfg))
    data["_time_s"] = np.float64(time_s)
    data["_znu"] = np.asarray(grid.znu)
    data["_znw"] = np.asarray(grid.znw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if async_write:
        _EXECUTOR.submit(np.savez_compressed, path, **data)
    else:
        np.savez_compressed(path, **data)


def write_restart(path: str, cfg: Config, state: State, step_idx: int,
                  time_s: float) -> None:
    """Restart dump: every Registry `r` field, exact (no compression loss —
    savez stores raw arrays)."""
    data = _gather(state, restart_names(cfg))
    data["_step_idx"] = np.int64(step_idx)
    data["_time_s"] = np.float64(time_s)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **data)


def read_restart(path: str, cfg: Config, state: State):
    """Load a restart into a (copy of) state; returns (state, step, time).
    Fields absent from the file keep their in-memory values (new diagnostics
    added after the dump was written)."""
    import jax.numpy as jnp
    with np.load(path) as f:
        out = dict(state)
        for n in restart_names(cfg):
            if n in f:
                out[n] = jnp.asarray(f[n], state[n].dtype)
        step = int(f["_step_idx"])
        time_s = float(f["_time_s"])
    return out, step, time_s


def flush() -> None:
    """Block until pending async history writes land (end-of-run barrier)."""
    global _EXECUTOR
    _EXECUTOR.shutdown(wait=True)
    _EXECUTOR = ThreadPoolExecutor(max_workers=2)
