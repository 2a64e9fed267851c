"""Stage-level profile of the config-4 CHEM call (VERDICT r4 ask #6): with
the gas solver at ~30 ms, where do the remaining ~470 ms of the interactive-
ARC chemistry call go at 100x100x50?  Times each chem_driver stage jitted
separately on the real chip (grid baked, chained calls, best-of-3 windows,
4-byte fetch barrier) plus the full driver for cross-checking.  Writes
artifacts/PROFILE_chem_r5.json."""

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
from wrfchem_arc_interactions_tpu.chem import aux, gas, optics, photolysis
from wrfchem_arc_interactions_tpu.chem.driver import chem_driver
from wrfchem_arc_interactions_tpu.chem.mosaic import (
    coag, movesect, nucleation, thermo,
)
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.parallel.sharded import halo_ops_for
from wrfchem_arc_interactions_tpu.utils import constants as c


def best_of(fn, args, n=5, w=3, fetch=None):
    o = fn(*args)
    if fetch is None:
        def fetch(o):
            a = jax.tree.leaves(o)[0]
            jax.device_get(a.ravel()[0])
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
    out = {"device": str(jax.devices()[0])}
    cfg = bench._cfg4()
    ch = cfg.chem
    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    state = bench._seed(state, jnp, gas=True)
    hx = halo_ops_for(cfg, None)
    dt = ch.chemdt_s
    nbin = 4

    # shared diagnostics (computed once per call in the driver)
    moist = cfg.moist_species()
    diag = diagnose(state, grid, moist)
    exner = (diag.p_full / c.P0) ** c.RCP
    t_air = diag.theta * exner
    rho_air = 1.0 / (diag.alpha_d * diag.eps_ratio)
    ph_full = grid.phb + state["ph"]
    dz = (ph_full[1:] - ph_full[:-1]) / c.G
    qc = state.get("qc", jnp.zeros_like(t_air))
    rh = jnp.clip(0.5 * jnp.ones_like(t_air), 0.0, 1.0)
    chem = {k: v for k, v in state.items() if k.startswith("chem_")}
    mu0 = jnp.full(t_air.shape[1:], 0.7)

    # 0. full driver (reference total)
    f_full = jax.jit(lambda s, t: chem_driver(s, grid, cfg, hx, dt,
                                              time_s=t, julian_day=182.0))
    out["chem_driver_full_ms"] = best_of(
        f_full, (state, jnp.float32(43200.0)), n=3,
        fetch=lambda o: jax.device_get(o["tau_aer_sw"].ravel()[0]))
    print("full:", round(out["chem_driver_full_ms"], 1), flush=True)

    # 1. photolysis (Fast-J spectral)
    f_j = jax.jit(lambda ch_, m0: photolysis.j_scales(
        m0, rho_air * c.G * dz, ch_["chem_o3"] * 1e-6, qc * rho_air * dz,
        state.get("tau_aer_sw"), state.get("ssa_aer_sw"),
        state.get("asy_aer_sw")))
    out["photolysis_ms"] = best_of(f_j, (chem, mu0))

    # 2. gas mechanism (production backend on this platform)
    m_air = diag.p_full / (1.380649e-23 * t_air) * 1e-6
    conc = jnp.stack([chem[f"chem_{s}"] * 1e-6 * m_air
                      for s in gas.GAS_SPECIES]).reshape(gas.NS, -1)
    j_flat = jnp.ones((gas.NR_RXN,) if False else ())  # placeholder
    k_rxn = gas.rate_constants(t_air, m_air,
                               jnp.ones_like(t_air) * 0.7
                               ).reshape(gas.NR_RXN, -1)
    f_gas = jax.jit(lambda cc, kk: gas.integrate(cc, kk, dt))
    out["gas_integrate_ms"] = best_of(
        f_gas, (conc, k_rxn),
        fetch=lambda o: jax.device_get(o.ravel()[0]))

    # 3. rate-constant assembly + ppm<->molec packing (the glue around gas)
    f_pack = jax.jit(lambda ch_: gas.rate_constants(
        t_air, m_air, jnp.ones_like(t_air) * 0.7).reshape(gas.NR_RXN, -1))
    out["rate_constants_ms"] = best_of(
        f_pack, (chem,), fetch=lambda o: jax.device_get(o.ravel()[0]))

    # 4. cloud chemistry (cw exchange + aqueous S(IV))
    w_c = 0.5 * (state["w"][:-1] + state["w"][1:])
    f_cw = jax.jit(lambda ch_: aux.cloud_chemistry(
        aux.cw_exchange(ch_, qc, t_air, diag.p_full, rho_air, w_c, nbin),
        qc, t_air, nbin, dt))
    out["cloud_chem_ms"] = best_of(f_cw, (chem,))

    # 5. aerosol dynamics stages
    f_nuc = jax.jit(lambda ch_: nucleation.nucleate(ch_, rho_air, rh, nbin, dt))
    out["nucleation_ms"] = best_of(f_nuc, (chem,))
    f_th = jax.jit(lambda ch_: thermo.partition(ch_, t_air, rho_air, rh, nbin, dt))
    out["thermo_partition_ms"] = best_of(f_th, (chem,))
    f_cg = jax.jit(lambda ch_: coag.coagulate(ch_, rho_air, nbin, dt))
    out["coagulation_ms"] = best_of(f_cg, (chem,))
    f_mv = jax.jit(lambda ch_: movesect.remap(ch_, nbin))
    out["movesect_ms"] = best_of(f_mv, (chem,))

    # 6. dry deposition + wet scavenging
    f_dd = jax.jit(lambda ch_: aux.dry_deposition(ch_, dz[0], dt,
                                                  gas.GAS_SPECIES, ust=None,
                                                  nbin=nbin))
    out["drydep_ms"] = best_of(f_dd, (chem,))

    # 7. optics (round-5 matmul/band-scan form)
    f_op = jax.jit(lambda ch_: optics.aerosol_optics(ch_, rho_air, dz, nbin))
    out["optics_ms"] = best_of(f_op, (chem,))

    out["stage_sum_ms"] = sum(v for k, v in out.items()
                              if k.endswith("_ms")
                              and k != "chem_driver_full_ms")
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))
    os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
    with open(os.path.join(_HERE, "artifacts", "PROFILE_chem_r5.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
