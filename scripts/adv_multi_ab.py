"""Hardware A/B: fused multi-tracer advection kernel (ops/pallas_adv_multi)
vs the per-tracer XLA chain it replaces, at config-3 scale (44 chem tracers,
100x100x50).  Writes artifacts/PALLAS_ADV_MULTI_AB.json.

Run solo (no concurrent TPU jobs) from /root/repo; no PYTHONPATH.
"""

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

from wrfchem_arc_interactions_tpu.dycore import advection as adv
from wrfchem_arc_interactions_tpu.ops.pallas_adv_multi import (
    advect_tracers_fused,
)
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps


class G:
    pass


def main(nt=44, nz=50, ny=100, nx=100):
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.random((nt, nz, ny, nx)), jnp.float32) * 2.0
    ru = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32) * 50.0
    rv = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32) * 50.0
    ww = jnp.asarray(rng.standard_normal((nz + 1, ny, nx)), jnp.float32) * 5.0
    mu0 = jnp.asarray(50000.0 + 1000.0 * rng.random((ny, nx)), jnp.float32)
    mu_new = mu0 * 1.0005
    rdnw = jnp.asarray(-(np.arange(nz) * 0.001 + 1.0), jnp.float32)
    dts, rdx, rdy = 6.0, 1e-3, 1e-3
    hx = HaloOps()
    g = G()
    g.rdx, g.rdy, g.rdnw, g.has_msf = rdx, rdy, rdnw, False
    phi_old = mu0[None, None] * qs

    def xla_stage(qs, ru, rv, ww, pd):
        gp = hx.pad_many({**{f"q{i}": qs[i] for i in range(nt)},
                          "ru": ru, "rv": rv}, 3)
        out = []
        for i in range(nt):
            q_pad = gp[f"q{i}"]
            fx, fy, fz = adv.scalar_fluxes(q_pad, gp["ru"], gp["rv"], ww, 5, 3)
            if pd:
                fx, fy, fz = adv.pd_limit(q_pad, phi_old[i], fx, fy, fz,
                                          gp["ru"], gp["rv"], ww, dts, g, hx)
            tend = adv.flux_div(fx, fy, fz, g)
            qn = (phi_old[i] + dts * tend) / mu_new[None]
            if pd:
                qn = jnp.maximum(qn, 0.0)
            out.append(qn)
        return jnp.stack(out)

    def fused_stage(qs, ru, rv, ww, pd):
        q4 = hx.pad(qs, 4)
        phi2 = hx.pad(phi_old, 2)
        ru4 = hx.pad(ru, 4)
        rv4 = hx.pad(rv, 4)
        ww2 = hx.pad(ww, 2)
        return advect_tracers_fused(q4, phi2, ru4, rv4, ww2, mu_new, rdnw,
                                    rdx, rdy, dts, pd=pd, clip=pd)

    from wrfchem_arc_interactions_tpu.ops.mxu_adv import scalar_fluxes_mxu

    def mxu_stage(qs, ru, rv, ww, pd):
        gp = hx.pad_many({"q": qs, "ru": ru, "rv": rv}, 3)
        q_pad = gp["q"]
        fx, fy, fz = scalar_fluxes_mxu(q_pad, gp["ru"], gp["rv"], ww, 5, 3)
        if pd:
            fx, fy, fz = adv.pd_limit(q_pad, phi_old, fx, fy, fz,
                                      gp["ru"], gp["rv"], ww, dts, g, hx)
        tend = adv.flux_div(fx, fy, fz, g)
        qn = (phi_old + dts * tend) / mu_new[None]
        if pd:
            qn = jnp.maximum(qn, 0.0)
        return qn

    res = {"device": str(jax.devices()[0]), "nt": nt,
           "grid": [nz, ny, nx]}
    for pd in (False, True):
        key = "pd" if pd else "plain"
        fns = {}
        fns["xla"] = jax.jit(lambda qs, ru, rv, ww: xla_stage(qs, ru, rv, ww, pd))
        fns["fused"] = jax.jit(lambda qs, ru, rv, ww: fused_stage(qs, ru, rv, ww, pd))
        fns["mxu"] = jax.jit(lambda qs, ru, rv, ww: mxu_stage(qs, ru, rv, ww, pd))
        outs = {}
        for name, fn in fns.items():
            t0 = time.perf_counter()
            o = fn(qs, ru, rv, ww)
            jax.device_get(o[0, 0, 0, 0])
            res[f"{key}_{name}_compile_s"] = round(time.perf_counter() - t0, 1)
            outs[name] = o
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    o = fn(qs, ru, rv, ww)
                jax.device_get(o[0, 0, 0, 0])
                best = min(best, (time.perf_counter() - t0) / 10)
            res[f"{key}_{name}_ms"] = round(1e3 * best, 3)
            print(f"{key} {name}: {1e3 * best:.3f} ms "
                  f"(compile {res[f'{key}_{name}_compile_s']}s)", flush=True)
        for alt in ("fused", "mxu"):
            da = float(jnp.max(jnp.abs(outs["xla"] - outs[alt])))
            res[f"{key}_{alt}_rel_diff"] = da / float(jnp.max(jnp.abs(outs["xla"])))
        d = float(jnp.max(jnp.abs(outs["xla"] - outs["fused"])))
        rel = d / float(jnp.max(jnp.abs(outs["xla"])))
        res[f"{key}_rel_diff"] = rel
        res[f"{key}_speedup"] = round(res[f"{key}_xla_ms"]
                                      / res[f"{key}_fused_ms"], 2)
        print(f"{key}: speedup {res[f'{key}_speedup']}x rel_diff {rel:.2e}",
              flush=True)

    os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
    with open(os.path.join(_HERE, "artifacts",
                           "PALLAS_ADV_MULTI_AB.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
