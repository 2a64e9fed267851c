"""Stage-level profile of the config-3 MAIN phase (VERDICT r4 ask #3/#6
groundwork): where do the ~44 ms go at 100x100x50 with 47 advected tracers?

Measures, each jitted separately on the real chip, best-of-k windows:

  1. full main step (production, per-tracer scalar path)   -> baseline
  2. main step with chem_opt=NONE (3 moist tracers only)   -> delta = the
     44 chem-tracer advection share
  3. the isolated scalar-advection block for 44 tracers (fluxes + PD path
     stages mimic) — the code the fused Pallas kernel would replace

Writes artifacts/PROFILE_main_r5.json.  Run from /root/repo (no PYTHONPATH —
it breaks the axon plugin registration, see memory/tpu-bench-hygiene).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation


def _sync(state):
    a = state["t"]
    jax.device_get(a[(0,) * a.ndim])


def time_sim(cfg, label, n=20, windows=3, gas=False):
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    state = bench._seed(state, jnp, gas=gas)
    sim = Simulation(cfg, grid, state)
    t0 = time.perf_counter()
    sim.advance(2)
    _sync(sim.state)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(windows):
        _sync(sim.state)
        t0 = time.perf_counter()
        sim.advance(n)
        _sync(sim.state)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label}: {1e3 * best:.2f} ms/step (compile+warm {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    out = {"device": str(jax.devices()[0])}

    cfg3 = bench._cfg3()
    out["main_full_ms"] = 1e3 * time_sim(cfg3, "config3 full (47 tracers)")

    from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
    cfg3n = cfg3.replace(chem=dataclasses.replace(
        cfg3.chem, chem_opt=ChemOpt.NONE))
    out["main_nochem_ms"] = 1e3 * time_sim(cfg3n, "config3 chem_opt=none (3 tracers)")
    out["chem_tracer_adv_share_ms"] = (
        out["main_full_ms"] - out["main_nochem_ms"])

    # isolated replaced block: per-tracer fluxes + PD + update for 44 tracers
    from wrfchem_arc_interactions_tpu.dycore import advection as adv
    from wrfchem_arc_interactions_tpu.parallel.sharded import halo_ops_for
    from wrfchem_arc_interactions_tpu.registry.state import advected_names

    grid, state = ideal.make_case(cfg3, "squall2d_x", bubble_amp=3.0)
    state = bench._seed(state, jnp)
    hx = halo_ops_for(cfg3, None)
    scalars = [q for q in advected_names(cfg3) if q.startswith("chem_")]
    nz, ny, nx = state["t"].shape
    key = jax.random.PRNGKey(0)
    ru = jax.random.normal(key, (nz, ny, nx), jnp.float32) * 50.0
    rv = jax.random.normal(jax.random.PRNGKey(1), (nz, ny, nx), jnp.float32) * 50.0
    ww = jax.random.normal(jax.random.PRNGKey(2), (nz + 1, ny, nx), jnp.float32)
    mu0 = grid.mub
    mu_new = grid.mub * 1.001

    def one_stage(qs, ru, rv, ww, final):
        g = hx.pad_many({**{q: qs[q] for q in scalars},
                         "ru": ru, "rv": rv}, 3)
        new = {}
        for q in scalars:
            q_pad = g[q]
            fx, fy, fz = adv.scalar_fluxes(q_pad, g["ru"], g["rv"], ww, 5, 3)
            phi_old = mu0[None] * qs[q]
            if final:
                fx, fy, fz = adv.pd_limit(q_pad, phi_old, fx, fy, fz,
                                          g["ru"], g["rv"], ww, 2.0, grid, hx)
            tend = adv.flux_div(fx, fy, fz, grid)
            qn = (phi_old + 2.0 * tend) / mu_new[None]
            if final:
                qn = jnp.maximum(qn, 0.0)
            new[q] = qn
        return new

    qs0 = {q: state[q] for q in scalars}

    for final, label in ((False, "adv_block_44tr_nopd"),
                         (True, "adv_block_44tr_pd")):
        fn = jax.jit(lambda qs: one_stage(qs, ru, rv, ww, final))
        r = fn(qs0)
        jax.device_get(r[scalars[0]][0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                r = fn(qs0)
            jax.device_get(r[scalars[0]][0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 10)
        out[label + "_ms"] = 1e3 * best
        print(f"{label}: {1e3 * best:.2f} ms", flush=True)

    os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
    with open(os.path.join(_HERE, "artifacts", "PROFILE_main_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
