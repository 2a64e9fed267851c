"""Dissect the no-chem main step (38.9 ms measured at 100x100x50): how much
is the acoustic loop (7 substeps incl. 14 Thomas scans), momentum advection,
physics, scalar advection?  Writes artifacts/PROFILE_dycore_r5.json."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
from wrfchem_arc_interactions_tpu.dycore.solve import step as dyn_step
from wrfchem_arc_interactions_tpu.dycore.tridiag import thomas
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.parallel.sharded import halo_ops_for
from wrfchem_arc_interactions_tpu.physics.driver import post_dynamics, pre_dynamics


def best_of(fn, args, n=10, w=3, fetch=None):
    o = fn(*args)
    fetch = fetch or (lambda o: jax.device_get(jax.tree.leaves(o)[0].ravel()[0]))
    fetch(o)
    best = float("inf")
    for _ in range(w):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        fetch(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return 1e3 * best


def main():
    out = {}
    cfg = bench._cfg3()
    cfg = cfg.replace(chem=dataclasses.replace(cfg.chem, chem_opt=ChemOpt.NONE))
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    hx = halo_ops_for(cfg, None)
    dt = cfg.time_control.dt

    f_pre = jax.jit(lambda s: pre_dynamics(s, grid, cfg, hx, dt, False, 0.0))
    f_dyn = jax.jit(lambda s, t: dyn_step(s, grid, cfg, hx, dt, t))
    f_post = jax.jit(lambda s: post_dynamics(s, grid, cfg, hx, dt, False))

    s1, tend = f_pre(state)
    out["pre_dynamics_ms"] = best_of(f_pre, (state,))
    out["dyn_step_ms"] = best_of(f_dyn, (s1, tend))
    out["post_dynamics_ms"] = best_of(f_post, (s1,))
    print({k: round(v, 2) for k, v in out.items()}, flush=True)

    # acoustic-substep marginal cost: ns_total 4 -> stages (1,2,4) = 7
    # substeps; ns_total 2 -> (1,1,2) = 4.  Delta/3 = per-substep cost.
    cfg2 = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, time_step_sound=2))
    f_dyn2 = jax.jit(lambda s, t: dyn_step(s, grid, cfg2, hx, dt, t))
    out["dyn_step_ns2_ms"] = best_of(f_dyn2, (s1, tend))
    out["acoustic_substep_ms"] = (out["dyn_step_ms"]
                                  - out["dyn_step_ns2_ms"]) / 3.0
    out["acoustic_7sub_ms"] = 7.0 * out["acoustic_substep_ms"]
    print({k: round(v, 2) for k, v in out.items()}, flush=True)

    # Thomas solve alone at acoustic shape
    nz, ny, nx = 51, 100, 100
    rng = np.random.default_rng(0)
    B = jnp.asarray(2.0 + rng.random((nz, ny, nx)), jnp.float32)
    A = jnp.asarray(-0.3 * rng.random((nz, ny, nx)), jnp.float32)
    C = jnp.asarray(-0.3 * rng.random((nz, ny, nx)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    f_th = jax.jit(thomas)
    out["thomas_51x100x100_ms"] = best_of(f_th, (A, B, C, D),
                                          fetch=lambda o: jax.device_get(o[0, 0, 0]))
    out["thomas_x14_ms"] = 14.0 * out["thomas_51x100x100_ms"]

    # momentum advection trio
    from wrfchem_arc_interactions_tpu.dycore import advection as adv
    u = jnp.asarray(rng.standard_normal((50, ny, nx)), jnp.float32)
    up = hx.pad(u, 3)
    wp = hx.pad(jnp.asarray(rng.standard_normal((51, ny, nx)), jnp.float32), 3)
    ww = jnp.asarray(rng.standard_normal((51, ny, nx)), jnp.float32)

    def mom(up, wp, ww):
        au = adv.advect_u(up, up, up, wp, grid, 5, 3)
        av = adv.advect_v(up, up, up, wp, grid, 5, 3)
        aw = adv.advect_w(wp, up, up, ww, grid, 5, 3)
        return au + av + aw[:-1]

    f_mom = jax.jit(mom)
    out["mom_advection_x1_ms"] = best_of(
        f_mom, (up, wp, ww), fetch=lambda o: jax.device_get(o[0, 0, 0]))
    out["mom_advection_x3_ms"] = 3.0 * out["mom_advection_x1_ms"]

    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))
    os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
    with open(os.path.join(_HERE, "artifacts", "PROFILE_dycore_r5.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
