"""Headline benchmark: grid-points/s/chip for the BASELINE config-3 step —
3D dycore + RRTMG SW/LW on the radt alarm + aerosol optics from fixed
MOSAIC bins (BASELINE.md metric; the TPU translation of WRF's `Timing for
main` step-time protocol).

Reports the *time-amortised* full step: N steps including their share of
radiation/chem alarm calls, as the reference community benchmark does.
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is 1.0 against the driver-recorded history.
"""

import json
import os
import time


def main():
    import jax

    # persistent executable cache: the axon remote-compile service is slow
    # and flaky under load; cache hits make reruns (and driver reruns)
    # independent of its health
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    nx, ny, nz = 100, 100, 50   # BASELINE config 3 domain
    cfg = Config(
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
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    # fixed aerosol bins (config 3: "aerosol optics from fixed MOSAIC bins")
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
        state[f"chem_oc_a{b:02d}"] = jnp.full_like(state["t"], 1.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
    sim = Simulation(cfg, grid, state)
    # exercise all alarm variants once (compile), then time a radt cycle
    sim.advance(3)
    sim.step_times.clear()
    n_time = 100                # one full radt/chemdt cycle = 100 steps at dt=6
    sim.advance(n_time)
    mean_t = sim.mean_step_time(skip=0)
    gps = nx * ny * nz / mean_t
    print(json.dumps({
        "metric": "grid-points/s/chip (dycore+RRTMG+aerosol-optics step, 100x100x50)",
        "value": round(gps, 1),
        "unit": "gridpoints/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    import sys

    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # transient TPU-service faults: retry
            print(f"bench attempt {attempt + 1} failed: {e!r}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(90)
