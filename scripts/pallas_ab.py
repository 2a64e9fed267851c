"""Pallas-vs-jnp A/B for the fused advection kernel on the REAL TPU
(VERDICT r2 ask #7 'measured Pallas-vs-jnp A/B for the advection kernel').

Round 2 could only validate the kernel in interpret mode (Mosaic custom
calls would not compile in this environment); this script is the
hardware A/B: it times `ops.pallas_adv.advect_scalar_5_3` against the jnp
`dycore.advection.advect_scalar` path on matched inputs, verifies
numerical agreement, and records artifacts/PALLAS_AB.json.  If Mosaic
still refuses to compile, the failure is recorded honestly in the same
artifact instead of crashing.

    python scripts/pallas_ab.py [--nx 128 --ny 128 --nz 50] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

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
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--ny", type=int, default=128)
    ap.add_argument("--nz", type=int, default=50)
    ap.add_argument("--iters", type=int, default=50)
    a = ap.parse_args()

    import jax
    _enable_cache()
    import jax.numpy as jnp
    import numpy as np

    backend = jax.devices()[0].platform
    nz, ny, nx = a.nz, a.ny, a.nx
    PAD = 3
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(300.0, 5.0,
                               (nz, ny + 2 * PAD, nx + 2 * PAD)), jnp.float32)
    ru = jnp.asarray(rng.normal(0, 5e3, (nz, ny + 2 * PAD, nx + 2 * PAD)),
                     jnp.float32)
    rv = jnp.asarray(rng.normal(0, 5e3, (nz, ny + 2 * PAD, nx + 2 * PAD)),
                     jnp.float32)
    ww = jnp.asarray(rng.normal(0, 50.0, (nz + 1, ny, nx)), jnp.float32)
    ww = ww.at[0].set(0.0).at[-1].set(0.0)
    znw = np.linspace(1.0, 0.0, nz + 1)
    rdnw = jnp.asarray(1.0 / np.diff(znw), jnp.float32)
    rdx = rdy = 1.0 / 500.0

    from wrfchem_arc_interactions_tpu.dycore import advection as adv
    from wrfchem_arc_interactions_tpu.ops import pallas_adv

    class _G:
        pass

    g = _G()
    g.rdnw = rdnw
    g.rdx = rdx
    g.rdy = rdy

    jnp_fn = jax.jit(lambda *xs: adv.advect_scalar(*xs, g, 5, 3))

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(a.iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / a.iters, out

    res = {"backend": backend, "grid": [nz, ny, nx], "iters": a.iters}
    t_jnp, out_jnp = timeit(jnp_fn, q, ru, rv, ww)
    res["jnp_ms"] = round(1e3 * t_jnp, 4)

    try:
        pl_fn = lambda *xs: pallas_adv.advect_scalar_5_3(
            *xs, rdnw, rdx, rdy, interpret=False)
        t_pl, out_pl = timeit(pl_fn, q, ru, rv, ww)
        err = float(jnp.max(jnp.abs(out_pl - out_jnp)))
        scale = float(jnp.max(jnp.abs(out_jnp)))
        res["pallas_ms"] = round(1e3 * t_pl, 4)
        res["pallas_speedup_vs_jnp"] = round(t_jnp / t_pl, 4)
        res["max_abs_diff"] = err
        res["rel_diff"] = err / max(scale, 1e-30)
        res["agrees"] = bool(err <= 1e-3 * scale)
    except Exception as e:
        res["pallas_error"] = f"{type(e).__name__}: {e}"[:1000]
        res["pallas_traceback_tail"] = traceback.format_exc()[-1500:]

    # roofline context: bytes the jnp path must move vs measured time
    n_int = nz * ny * nx
    bytes_min = 5 * n_int * 4            # 4 reads + 1 write, f32
    res["roofline"] = {
        "interior_gridpoints": n_int,
        "min_bytes_4r1w": bytes_min,
        "jnp_achieved_GBps_if_5pass": round(bytes_min / t_jnp / 1e9, 1),
        "note": ("jnp path materialises fx/fy/fz (~11 passes); the fused "
                 "kernel's target is the 5-pass bound"),
    }

    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(_REPO, "artifacts", "PALLAS_AB.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
