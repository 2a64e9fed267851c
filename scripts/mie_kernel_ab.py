"""A/B the Pallas Mie evaluator variants against the XLA band-scan at
config-4 shapes on the real chip; writes artifacts/PALLAS_MIE_AB.json.

Variants: f32 dot, bf16 dot, split (3-pass bf16 reconstruction).  Error is
max |delta ln Q| vs the f32 XLA band-scan on the same inputs."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.chem import mie, optics
from wrfchem_arc_interactions_tpu.ops.pallas_mie import cheb_eval_pallas

SHAPE = (30, 200, 100, 100)          # bands x (4 bins x nz) x ny x nx
REPS = 20


def _sync(out):
    """Honest completion barrier: a data-dependent 4-byte fetch
    (block_until_ready under-reports on the tunneled remote-TPU runtime —
    round-4/5 measurement-integrity finding, PERF_EVIDENCE_r5.md §1)."""
    return float(jax.device_get(out[0][0, 0, 0, 0]))


def main():
    rng = np.random.default_rng(5)
    nr_n = jnp.asarray(rng.uniform(0, 1, SHAPE), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, SHAPE), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, SHAPE), jnp.float32)
    out = {"shape": list(SHAPE), "reps": REPS,
           "backend": jax.devices()[0].platform}

    G = mie.build_grid_matrix()
    xla = jax.jit(lambda a, b, c: optics._cheb_eval_bands(G, a, b, c))
    t0 = time.perf_counter()
    ref = xla(nr_n, u, t)
    _sync(ref)
    out["xla_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        r = xla(nr_n, u, t)
    _sync(r)
    out["xla_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
    ref = [np.asarray(x) for x in ref]

    for variant in ("f32", "bf16", "split"):
        fn = jax.jit(lambda a, b, c, v=variant: cheb_eval_pallas(
            a, b, c, dot_variant=v))
        t0 = time.perf_counter()
        got = fn(nr_n, u, t)
        _sync(got)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            g = fn(nr_n, u, t)
        _sync(g)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        err = max(float(np.max(np.abs(np.asarray(a) - b)))
                  for a, b in zip(got, ref))
        out[variant] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1),
                        "max_abs_err_vs_xla": float(f"{err:.3e}"),
                        "speedup_vs_xla": round(out["xla_ms"] / ms, 2)}
        print(variant, out[variant], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PALLAS_MIE_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
