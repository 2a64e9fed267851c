"""Decompose the config-4 MAIN phase (42.6 ms at 100x100x50) using
bench.py's own chained-window protocol: full config-4 vs chem_opt=NONE
(same Morrison microphysics, no ~100-tracer transport) vs Kessler
(config-3's microphysics).  Writes artifacts/PROFILE_main4_r5.json."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt, MPScheme


def main():
    bench._enable_cache()
    out = {}
    cfg4 = bench._cfg4()
    gps, best, phases, stats = bench._run(cfg4, n_warm=2, n_time=100, gas=True)
    out["config4_full"] = {"ms_per_step": round(1e3 * best, 2),
                           "phases_ms": phases, **stats}
    print("config4 full:", phases, flush=True)

    cfg4n = cfg4.replace(chem=dataclasses.replace(
        cfg4.chem, chem_opt=ChemOpt.NONE))
    gps, best, phases, stats = bench._run(cfg4n, n_warm=2, n_time=100)
    out["config4_chem_none"] = {"ms_per_step": round(1e3 * best, 2),
                                "phases_ms": phases, **stats}
    print("config4 chem none:", phases, flush=True)

    cfg4k = cfg4n.replace(physics=dataclasses.replace(
        cfg4n.physics, mp_physics=MPScheme.KESSLER, progn=False))
    gps, best, phases, stats = bench._run(cfg4k, n_warm=2, n_time=100)
    out["config4_kessler_nochem"] = {"ms_per_step": round(1e3 * best, 2),
                                     "phases_ms": phases, **stats}
    print("config4 kessler+nochem:", phases, flush=True)

    m4 = out["config4_full"]["phases_ms"]["main"]
    mn = out["config4_chem_none"]["phases_ms"]["main"]
    mk = out["config4_kessler_nochem"]["phases_ms"]["main"]
    out["decomposition_ms"] = {
        "tracer_transport_share": round(m4 - mn, 2),
        "morrison_activation_share": round(mn - mk, 2),
        "dycore_base": round(mk, 2),
    }
    print("decomposition:", out["decomposition_ms"], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_main4_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
