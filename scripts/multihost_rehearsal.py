"""Two-process multi-host rehearsal (SURVEY.md §4.5; VERDICT r2 ask #9).

The reference can only prove its multi-node path on a cluster; JAX's
multi-controller runtime lets us rehearse the DCN (cross-host) mesh axis on
one machine: two OS processes, each owning 4 virtual CPU devices, joined by
``jax.distributed`` into one 8-device global mesh (2 hosts x 4 chips — the
"host" mesh axis is the DCN analog).  The FULL ARC-coupled step (dynamics +
RRTMG + chem) is jitted over that global mesh and executed once on tiny
shapes; every collective that would ride DCN on a real pod fires here.

Run directly (spawns its own second process):

    python scripts/multihost_rehearsal.py

or as a worker (internal): multihost_rehearsal.py --worker <pid> <port>

Writes artifacts/MULTIHOST_2PROC.json on success (process 0).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
LOCAL_DEVICES = 4
NUM_PROC = 2


def worker(process_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=NUM_PROC,
                               process_id=process_id)
    assert jax.process_count() == NUM_PROC
    assert len(jax.devices()) == NUM_PROC * LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sys.path.insert(0, _REPO)
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import full_step
    from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
    from wrfchem_arc_interactions_tpu.parallel.mesh import (
        AXIS_X, AXIS_Y, make_mesh,
    )
    from wrfchem_arc_interactions_tpu.parallel.sharded import (
        grid_partition_specs, state_partition_specs,
    )

    cfg = Config(
        domain=DomainConfig(nx=16, ny=8, nz=10, dx=1000.0, dy=1000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=4.0),
        dynamics=DynamicsConfig(kvdif=20.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG),
        chem=ChemConfig(chem_opt=ChemOpt.CBMZ_MOSAIC_4BIN, chemdt_s=8.0,
                        aer_ra_feedback=True),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=2500.0, zr=1200.0,
                                  three_d=True)
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 3.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 5e9)
    for s, v in (("o3", 0.04), ("no2", 2e-3), ("so2", 2e-3), ("h2o2", 1e-3)):
        state[f"chem_{s}"] = jnp.full_like(state["t"], v)

    # 2 hosts along Y (the DCN axis) x 4 local devices along X (ICI):
    # jax.devices() enumerates process-0 devices first, so rows of the
    # (2, 4) mesh coincide with processes — exactly a pod-slice layout.
    mesh = make_mesh(NUM_PROC, LOCAL_DEVICES)
    hx = HaloOps(bc_x=cfg.dynamics.bc_x, bc_y=cfg.dynamics.bc_y,
                 mesh_y=NUM_PROC, mesh_x=LOCAL_DEVICES, sharded=True)
    s_specs = state_partition_specs(cfg)
    g_specs = grid_partition_specs(grid)

    def make_global(arr, spec):
        shard = NamedSharding(mesh, spec)
        np_arr = np.asarray(arr)
        return jax.make_array_from_callback(
            np_arr.shape, shard, lambda idx: np_arr[idx])

    gs = {k: make_global(v, s_specs[k]) for k, v in state.items()}
    gg = jax.tree.map(make_global, grid, g_specs)

    fn = jax.jit(
        jax.shard_map(
            lambda s, g: full_step(s, g, cfg, hx, cfg.time_control.dt,
                                   do_radiation=True, do_chem=True,
                                   time_s=0.0),
            mesh=mesh, in_specs=(s_specs, g_specs), out_specs=s_specs),
        )
    out = fn(gs, gg)
    jax.block_until_ready(out)
    # global reduction across both processes (a DCN-crossing collective)
    w_max = float(jnp.max(jnp.abs(out["w"])))
    t_max = float(jnp.max(jnp.abs(out["t"])))
    finite = bool(jnp.all(jnp.isfinite(out["w"])))
    if process_id == 0:
        os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
        with open(os.path.join(_REPO, "artifacts", "MULTIHOST_2PROC.json"),
                  "w") as f:
            json.dump({
                "processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "mesh": {"my(DCN)": NUM_PROC, "mx(ICI)": LOCAL_DEVICES},
                "step": "full ARC (dycore + RRTMG + CBM-Z/MOSAIC/Mie)",
                "w_max_after_step": w_max,
                "t_pert_max": t_max,
                "finite": finite,
            }, f, indent=1)
    print(f"proc {process_id}: ok w_max={w_max:.4f} finite={finite}")
    assert finite
    jax.distributed.shutdown()


def main() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--worker", str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        sys.stdout.write(f"--- process {i} (rc={p.returncode}) ---\n"
                         + out[-3000:] + "\n")
        rc |= p.returncode
    return rc


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        sys.exit(main())
