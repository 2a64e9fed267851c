"""Capture a jax.profiler trace of the model step (SURVEY.md §5.1; VERDICT
round-1 'per-phase breakdown + trace artifact').

Runs a few steps of the benchmark configuration under
``jax.profiler.trace`` and writes a Perfetto/TensorBoard-compatible trace
to --out. On the real TPU this shows the XLA op timeline (fusions, the
acoustic loop's collective-permutes and their overlap with interior
compute); on the virtual-CPU mesh it validates the harness and records the
sharded schedule.

Usage:
    python scripts/profile_trace.py [--cpu] [--sharded] [--out artifacts/trace]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sharded", action="store_true",
                    help="trace the 2x4 virtual-mesh sharded step")
    ap.add_argument("--out", default="artifacts/trace")
    ap.add_argument("--steps", type=int, default=5)
    a = ap.parse_args()

    if a.cpu or a.sharded:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if a.cpu or a.sharded:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, DynamicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import full_step
    from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
    from wrfchem_arc_interactions_tpu.parallel.sharded import (
        grid_partition_specs, halo_ops_for,
    )
    from wrfchem_arc_interactions_tpu.registry.state import (
        state_partition_specs,
    )

    nx, ny, nz = (64, 64, 32) if not a.sharded else (64, 32, 24)
    cfg = Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=16000.0, p_top=10000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
    )
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    mesh = make_mesh(2, 4) if a.sharded else None
    hx = halo_ops_for(cfg, mesh)
    dt = cfg.time_control.dt

    def fn(s, g, t_s):
        return full_step(s, g, cfg, hx, dt, False, False, t_s)

    if mesh is not None:
        fn = jax.shard_map(fn, mesh=mesh,
                           in_specs=(state_partition_specs(cfg),
                                     grid_partition_specs(grid), P()),
                           out_specs=state_partition_specs(cfg))
    stepf = jax.jit(fn)
    t0 = jnp.float32(0.0)
    s = stepf(state, grid, t0)            # compile outside the trace
    jax.block_until_ready(s["t"])

    os.makedirs(a.out, exist_ok=True)
    with jax.profiler.trace(a.out):
        for _ in range(a.steps):
            s = stepf(s, grid, t0)
        jax.block_until_ready(s["t"])
    files = glob.glob(os.path.join(a.out, "**", "*"), recursive=True)
    total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    print(f"trace written: {a.out} ({len(files)} files, {total/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
