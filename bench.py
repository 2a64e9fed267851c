"""Headline benchmark: grid-points/s/chip for the BASELINE config-3 step —
3D dycore + RRTMG SW/LW on the radt alarm + aerosol optics from fixed
MOSAIC bins (BASELINE.md metric; the TPU translation of WRF's `Timing for
main` step-time protocol) — plus, in the same single JSON line:

- "breakdown": amortized per-phase step time [ms] (dycore main / radiation
  / chemistry executables, synchronized separately);
- "config4": BASELINE config-4 throughput — the interactive-ARC step
  (CBM-Z gas chem + Fast-J photolysis + MOSAIC aerosol dynamics + Mie
  optics recomputed each radiation call + activation->Morrison Nc);
- "scaling": per-chip throughput at N=1 and a pointer to the harness
  (scripts/scaling.py) that produces the multi-chip efficiency number when
  hardware with >1 chip exists.

Reports the *time-amortised* full step: N steps including their share of
radiation/chem alarm calls, as the reference community benchmark does.
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is 1.0 against the driver-recorded history.
"""

import json
import os
import time


def _cfg3(nx=100, ny=100, nz=50):
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG,
                              radt_s=600.0),
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=600.0,
                        aer_ra_feedback=True, gaschem_onoff=False,
                        aerchem_onoff=False),   # fixed bins -> optics only
    )


def _cfg4(nx=100, ny=100, nz=50):
    """BASELINE config 4: interactive ARC feedback — prognostic MOSAIC bins,
    Mie optics recomputed each radiation call, CBM-Z + Fast-J, activation ->
    Morrison prognostic Nc (direct + indirect effects live)."""
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG,
                              radt_s=600.0),
        chem=ChemConfig(chem_opt=ChemOpt.CBMZ_MOSAIC_4BIN, chemdt_s=60.0,
                        aer_ra_feedback=True),
    )


def _seed(state, jnp, gas=False):
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
        state[f"chem_oc_a{b:02d}"] = jnp.full_like(state["t"], 1.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
    if gas:
        for s, v in (("o3", 0.04), ("no2", 2e-3), ("no", 1e-3),
                     ("co", 0.12), ("so2", 2e-3), ("h2o2", 1e-3)):
            state[f"chem_{s}"] = jnp.full_like(state["t"], v)
    return state


def _run(cfg, n_warm, n_time, gas=False):
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    state = _seed(state, jnp, gas=gas)
    sim = Simulation(cfg, grid, state)
    sim.advance(n_warm)                    # compile all alarm variants
    sim.step_times.clear()
    sim.phase_times = {"chem": 0.0, "rad": 0.0, "main": 0.0}
    sim.advance(n_time, phase_timing=True)
    mean_t = sim.mean_step_time(skip=0)
    d = cfg.domain
    phases_ms = {k: 1e3 * v / n_time for k, v in sim.phase_times.items()}
    return d.nx * d.ny * d.nz / mean_t, mean_t, phases_ms


def _enable_cache():
    # persistent executable cache: the axon remote-compile service is slow
    # and flaky under load; cache hits make reruns (and driver reruns)
    # independent of its health
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main():
    import jax
    _enable_cache()

    # config 3 headline: one full radt cycle = 100 steps at dt=6/radt=600
    gps3, step3, phases3 = _run(_cfg3(), n_warm=3, n_time=100)

    # config 4 (interactive ARC): one radt cycle; chem fires every 10 steps.
    # The CBM-Z executable is a large compile on the axon remote-compile
    # service, so this part is time-boxed in a subprocess — the headline
    # line must land even if the service is slow (driver runs bench once).
    config4 = {"skipped": "time budget exceeded"}
    try:
        import subprocess
        import sys as _sys
        r = subprocess.run(
            [_sys.executable, os.path.abspath(__file__), "--config4"],
            capture_output=True, text=True, timeout=1500)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                config4 = json.loads(line)
    except Exception as e:
        config4 = {"skipped": repr(e)}

    print(json.dumps({
        "metric": "grid-points/s/chip (dycore+RRTMG+aerosol-optics step, 100x100x50)",
        "value": round(gps3, 1),
        "unit": "gridpoints/s",
        "vs_baseline": 1.0,
        "breakdown_ms_per_step": {k: round(v, 2) for k, v in phases3.items()},
        "config4_interactive_arc": config4,
        "scaling": {
            "n_chips": len(jax.devices()),
            "per_chip_gridpoints_per_s": round(gps3, 1),
            "harness": "scripts/scaling.py (virtual-mesh shape on CPU; "
                       "emits efficiency vs N on real multi-chip slices)",
        },
    }))


def config4_main():
    """Subprocess entry: the interactive-ARC benchmark alone, one JSON line.
    Smaller steps-per-cycle than config 3 (chem every 10 steps dominates)."""
    _enable_cache()
    gps4, step4, phases4 = _run(_cfg4(), n_warm=2, n_time=50, gas=True)
    print(json.dumps({
        "gridpoints_per_s_per_chip": round(gps4, 1),
        "ms_per_step": round(1e3 * step4, 2),
        "breakdown_ms_per_step": {k: round(v, 2) for k, v in phases4.items()},
    }))


if __name__ == "__main__":
    import sys

    if "--config4" in sys.argv:
        config4_main()
        sys.exit(0)

    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # transient TPU-service faults: retry
            print(f"bench attempt {attempt + 1} failed: {e!r}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(90)
