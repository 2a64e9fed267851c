"""Overlap-on/off A/B: what does the overlapped acoustic-halo schedule buy?
(VERDICT r2 ask #7 'overlap-on/off step-time comparison to convert the HLO
artifact's claim into a number'.)

Runs the config-2-shaped dycore step with `dynamics.overlap_halo` True vs
False on a sharded mesh and reports mean step times.  On the CPU virtual
mesh the numbers characterise the schedule (collective latency is fake);
on a real multi-chip TPU slice the same script measures the ICI win.

    python scripts/overlap_ab.py [--mesh 2x4] [--nx 96 --ny 64 --nz 40]

Writes artifacts/OVERLAP_AB.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)



def _enable_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tpu", action="store_true",
                    help="use the real backend instead of 8 virtual CPUs")
    a = ap.parse_args()
    my, mx = (int(v) for v in a.mesh.split("x"))

    if not a.tpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={my * mx}")
    import jax
    _enable_cache()
    if not a.tpu:
        jax.config.update("jax_platforms", "cpu")

    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, DynamicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.dycore.solve import step
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
    from wrfchem_arc_interactions_tpu.parallel.sharded import make_sharded_step

    def run(overlap: bool) -> float:
        cfg = Config(
            domain=DomainConfig(nx=a.nx, ny=a.ny, nz=a.nz, dx=500.0,
                                dy=500.0, ztop=12000.0, p_top=20000.0),
            time_control=TimeControl(dt=3.0),
            dynamics=DynamicsConfig(kvdif=20.0, overlap_halo=overlap))
        grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                      zc=1500.0, xr=3000.0, zr=1200.0,
                                      three_d=True)
        mesh = make_mesh(my, mx)
        sstep, place = make_sharded_step(cfg, grid, mesh, step, 3.0)
        s, g = place(state, grid)
        s = sstep(s, g)
        jax.block_until_ready(s["t"])              # compile + warm
        t0 = time.perf_counter()
        for _ in range(a.steps):
            s = sstep(s, g)
        jax.block_until_ready(s["t"])
        return (time.perf_counter() - t0) / a.steps

    t_on = run(True)
    t_off = run(False)
    res = {
        "backend": "tpu" if a.tpu else "cpu-virtual",
        "mesh": [my, mx],
        "grid": [a.nz, a.ny, a.nx],
        "steps": a.steps,
        "ms_per_step_overlap_on": round(1e3 * t_on, 3),
        "ms_per_step_overlap_off": round(1e3 * t_off, 3),
        "overlap_speedup": round(t_off / t_on, 4),
        "note": ("CPU-virtual collectives have no real link latency; the "
                 "speedup lower-bounds schedule overhead, the real ICI win "
                 "needs a multi-chip slice"),
    }
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(_REPO, "artifacts", "OVERLAP_AB.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
