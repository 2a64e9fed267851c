"""History and restart I/O (canonical: the stream-based Registry-driven I/O
of share/output_wrf.F + external/io_netcdf, and the wrfrst restart path of
SURVEY.md §3.5).

Two container backends, chosen per call (default: native netCDF):

- **netCDF classic** via the native C++ backend (`io/native/wrfio.cpp`,
  bound in `io/netcdf.py`) — real `wrfout`-compatible files with WRF-ish
  dimension names (bottom_top/south_north/west_east), written through the
  C++ quilt writer pool so the device never waits on disk (the
  module_io_quilt.F analog). Cross-validated against scipy's independent
  netCDF reader in tests/test_native_io.py.
- **npz** fallback when no C++ toolchain exists to build the backend.

The registry decides *what* goes in each stream exactly like the
reference's `h`/`r` flags:

- history stream: `history_names(cfg)` fields + coordinates, on the
  history_interval alarm;
- restart stream: `restart_names(cfg)` fields + (step, time) metadata,
  bit-exact resume contract (tested in tests/test_io_restart.py — raw
  IEEE bits in both containers, no compression loss).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict

import jax
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.io import netcdf as ncio
from wrfchem_arc_interactions_tpu.registry.state import (
    State, history_names, restart_names,
)

_EXECUTOR = ThreadPoolExecutor(max_workers=2)  # npz-fallback async writes

_DIM_BASES = ("bottom_top", "south_north", "west_east")


def _gather(state: State, names) -> Dict[str, np.ndarray]:
    return {n: np.asarray(jax.device_get(state[n])) for n in names if n in state}


def default_extension() -> str:
    return ".nc" if ncio.available() else ".npz"


def _dim_names(cfg: Config, name: str, shape) -> list:
    """WRF-ish dimension names; lengths that differ from the mass-point grid
    get a length suffix so netCDF dim names stay unique per length."""
    expect = (cfg.domain.nz, cfg.domain.ny, cfg.domain.nx)
    # 1D z-coordinate arrays (znu/znw, length nz or nz+1) would otherwise
    # right-align against west_east; give them the WRF vertical dim name
    if len(shape) == 1 and shape[0] in (cfg.domain.nz, cfg.domain.nz + 1):
        return ["bottom_top" if shape[0] == cfg.domain.nz else "bottom_top_stag"]
    k = min(len(shape), 3)
    lead = [f"{name}_d{i}" for i in range(len(shape) - k)]
    tail = []
    for base, n, size in zip(_DIM_BASES[3 - k:], expect[3 - k:], shape[-k:]):
        tail.append(base if size == n else f"{base}{size}")
    return lead + tail


def _write_nc(path: str, cfg: Config, data: Dict[str, np.ndarray],
              attrs: Dict[str, float], async_write: bool) -> None:
    w = ncio.NetCDFWriter()
    for n, a in data.items():
        w.put_var(n, a, _dim_names(cfg, n, a.shape))
    for k, v in attrs.items():
        w.put_att(k, v)
    w.put_att("title", "wrfchem-arc-interactions-tpu")
    w.write(path, async_write=async_write)


def write_history(path: str, cfg: Config, grid: Grid, state: State,
                  time_s: float, async_write: bool = True) -> None:
    use_nc = path.endswith(".nc")
    data = _gather(state, history_names(cfg))
    data["znu"] = np.asarray(grid.znu)
    data["znw"] = np.asarray(grid.znw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if use_nc:
        _write_nc(path, cfg, data, {"_time_s": float(time_s)}, async_write)
    else:
        data["_time_s"] = np.float64(time_s)
        if async_write:
            _EXECUTOR.submit(np.savez_compressed, path, **data)
        else:
            np.savez_compressed(path, **data)


def write_restart(path: str, cfg: Config, state: State, step_idx: int,
                  time_s: float) -> None:
    """Restart dump: every Registry `r` field, exact IEEE bits (synchronous —
    a restart must be durable when the call returns)."""
    data = _gather(state, restart_names(cfg))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".nc"):
        _write_nc(path, cfg, data,
                  {"_step_idx": float(step_idx), "_time_s": float(time_s)},
                  async_write=False)
    else:
        data["_step_idx"] = np.int64(step_idx)
        data["_time_s"] = np.float64(time_s)
        np.savez(path, **data)


def read_restart(path: str, cfg: Config, state: State):
    """Load a restart into a (copy of) state; returns (state, step, time).
    Fields absent from the file keep their in-memory values (new diagnostics
    added after the dump was written)."""
    import jax.numpy as jnp

    if path.endswith(".nc"):
        f, attrs = ncio.read_netcdf(path)
        step = int(attrs["_step_idx"])
        time_s = float(attrs["_time_s"])
    else:
        with np.load(path) as z:
            f = {k: z[k] for k in z.files}
        step = int(f["_step_idx"])
        time_s = float(f["_time_s"])
    out = dict(state)
    for n in restart_names(cfg):
        if n in f:
            out[n] = jnp.asarray(f[n], state[n].dtype)
    return out, step, time_s


def read_history(path: str):
    """Read one history dump back: (fields dict, time_s)."""
    if path.endswith(".nc"):
        f, attrs = ncio.read_netcdf(path)
        return f, float(attrs["_time_s"])
    with np.load(path) as z:
        f = {k: z[k] for k in z.files}
    return f, float(f.pop("_time_s"))


def flush() -> None:
    """Block until pending async history writes land (end-of-run barrier):
    both the native quilt pool and the npz-fallback thread pool."""
    global _EXECUTOR
    _EXECUTOR.shutdown(wait=True)
    _EXECUTOR = ThreadPoolExecutor(max_workers=2)
    if ncio.available():
        ncio.drain()
