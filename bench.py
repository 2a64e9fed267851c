"""Headline benchmark: grid-points/s/chip for the full model step
(BASELINE.md metric; the TPU translation of WRF's `Timing for main`
step-time protocol).

Runs the flagship 3D configuration on whatever single device jax selects
(the real TPU chip under the driver), warms up past compilation, times N
steps, and prints ONE json line. The reference publishes no numbers
(BASELINE.json "published": {}), so vs_baseline is reported against the
driver-recorded history (1.0 = first recorded value).
"""

import json
import time


def main():
    import jax
    import numpy as np

    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, DynamicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    nx, ny, nz = 100, 100, 50   # BASELINE config 3 domain
    cfg = Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    sim = Simulation(cfg, grid, state)
    sim.advance(3)          # compile + warm
    sim.step_times.clear()
    sim.advance(10)
    mean_t = sim.mean_step_time(skip=0)
    gps = nx * ny * nz / mean_t
    print(json.dumps({
        "metric": "grid-points/s/chip (full step, 100x100x50)",
        "value": round(gps, 1),
        "unit": "gridpoints/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
