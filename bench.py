"""Headline benchmark: grid-points/s/chip for the BASELINE config-3 step —
3D dycore + RRTMG SW/LW on the radt alarm + aerosol optics from fixed
MOSAIC bins (BASELINE.md metric; the TPU translation of WRF's `Timing for
main` step-time protocol).

Output contract (the driver runs `python bench.py` ONCE under a timeout and
parses a JSON line from the output tail):

1. The config-3 headline JSON line is printed and flushed the MOMENT the
   measurement finishes — nothing else is allowed to delay it.  The
   measurement itself runs in a time-boxed subprocess; if the TPU service
   is down/hung, a CPU-backend fallback produces a (clearly labelled)
   number rather than nothing.
2. Everything else (config-4 interactive-ARC throughput, per-phase
   breakdown detail) is best-effort EXTRA work written to
   `artifacts/BENCH_extras.json`, never stdout, so it cannot displace the
   headline line no matter how the driver's parser picks lines.

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is 1.0 against the driver-recorded history.
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))


def _cfg3(nx=100, ny=100, nz=50):
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.KESSLER,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG,
                              radt_s=600.0),
        chem=ChemConfig(chem_opt=ChemOpt.MOSAIC_4BIN, chemdt_s=600.0,
                        aer_ra_feedback=True, gaschem_onoff=False,
                        aerchem_onoff=False),   # fixed bins -> optics only
    )


def _cfg4(nx=100, ny=100, nz=50):
    """BASELINE config 4: interactive ARC feedback — prognostic MOSAIC bins,
    Mie optics recomputed each radiation call, CBM-Z + Fast-J, activation ->
    Morrison prognostic Nc (direct + indirect effects live)."""
    from wrfchem_arc_interactions_tpu.config import (
        ChemConfig, Config, DomainConfig, DynamicsConfig, PhysicsConfig,
        TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        ChemOpt, MPScheme, RAScheme,
    )
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=1000.0, dy=1000.0,
                            ztop=17000.0, p_top=8000.0),
        time_control=TimeControl(dt=6.0),
        dynamics=DynamicsConfig(kvdif=30.0),
        physics=PhysicsConfig(mp_physics=MPScheme.MORRISON2, progn=True,
                              ra_sw_physics=RAScheme.RRTMG,
                              ra_lw_physics=RAScheme.RRTMG,
                              radt_s=600.0),
        chem=ChemConfig(chem_opt=ChemOpt.CBMZ_MOSAIC_4BIN, chemdt_s=60.0,
                        aer_ra_feedback=True),
    )


def _seed(state, jnp, gas=False):
    for b in (1, 2):
        state[f"chem_so4_a{b:02d}"] = jnp.full_like(state["t"], 2.0)
        state[f"chem_oc_a{b:02d}"] = jnp.full_like(state["t"], 1.0)
        state[f"chem_num_a{b:02d}"] = jnp.full_like(state["t"], 2e9)
    if gas:
        for s, v in (("o3", 0.04), ("no2", 2e-3), ("no", 1e-3),
                     ("co", 0.12), ("so2", 2e-3), ("h2o2", 1e-3)):
            state[f"chem_{s}"] = jnp.full_like(state["t"], v)
    return state


def _run(cfg, n_warm, n_time, gas=False, windows=3):
    """Measure FULL-CADENCE throughput over `windows` chained windows, each
    spanning one complete alarm period (lcm of the radiation/chemistry
    cadences), closed by a single device sync.

    Protocol notes (round-5 measurement-integrity findings,
    artifacts/PERF_EVIDENCE_r5.md):
    - NO per-step sync: the tunneled TPU's host round trip is ~29 ms, so a
      per-step barrier measures latency, not chip throughput (rounds 1-4
      under-reported by that amount per step).  Steps are chained
      asynchronously; the window's final 4-byte fetch is data-dependent on
      every step in it.
    - Window length = one full alarm period, so EVERY window amortizes
      exactly the same radiation/chemistry work (round 4's best-of-window
      silently excluded the rad+chem amortization — the "contended" 78 ms
      window was the one carrying the alarm).
    - Best window is reported (robust to transient contention from other
      TPU jobs); dispersion across windows quantifies it.
    """
    import math
    import jax
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    grid, state = ideal.make_case(cfg, "squall2d_x", bubble_amp=3.0)
    state = _seed(state, jnp, gas=gas)
    sim = Simulation(cfg, grid, state)
    sim.advance(max(n_warm, 1))            # compile all alarm variants
    sim.sync()

    per = 1
    for e in (sim.rad_every, sim.chem_every):
        if e:
            per = per * e // math.gcd(per, e)
    if per == 1:
        per = max(1, n_time // windows)
    m = max(1, min(per, n_time))

    means = []
    for _ in range(windows):
        t0 = time.perf_counter()
        sim.advance(m)
        sim.sync()
        means.append((time.perf_counter() - t0) / m)
    best = min(means)
    med = sorted(means)[len(means) // 2]
    disp = (max(means) - best) / best

    # phase detail, each executable chained separately (amortized per step)
    s, g = sim.state, sim.grid
    t_now = jnp.float32(sim.time_s)

    def timed(fn, n, sync_field):
        # warm call + fetch first: the very first dispatch after the window
        # loop absorbs queue-drain/launch effects that inflated the chem
        # detail 7x in the round-5 sweep (windows are always the honest
        # totals; this detail is best-effort attribution)
        o = fn(s, g, t_now)
        a = o[sync_field]
        jax.device_get(a[(0,) * a.ndim])
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(s, g, t_now)
        a = o[sync_field]
        jax.device_get(a[(0,) * a.ndim])
        return (time.perf_counter() - t0) / n

    phases_ms = {}
    detail = {}
    phases_ms["main"] = 1e3 * timed(sim._stepper("main"), 20, "t")
    if sim.rad_every:
        detail["rad_call_ms"] = 1e3 * timed(sim._stepper("rad"), 3,
                                            "rthraten_sw")
        phases_ms["rad"] = detail["rad_call_ms"] / sim.rad_every
    if sim.chem_every:
        detail["chem_call_ms"] = 1e3 * timed(sim._stepper("chem"), 3,
                                             sim._chem_sync[0])
        phases_ms["chem"] = detail["chem_call_ms"] / sim.chem_every

    # tunnel RTT, so readers can see what a per-step-synced protocol adds
    a = sim.state["t"]
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_get(a[0, 0, 0])
    rtt = (time.perf_counter() - t0) / 5

    d = cfg.domain
    stats = {
        "window_ms": [round(1e3 * t, 2) for t in means],
        "window_steps": m,
        "median_ms_per_step": round(1e3 * med, 2),
        "dispersion": round(disp, 4),
        "contention_suspected": bool(disp > 0.10),
        "host_rtt_ms": round(1e3 * rtt, 2),
        **{k: round(v, 2) for k, v in detail.items()},
    }
    return d.nx * d.ny * d.nz / best, best, phases_ms, stats


def _enable_cache():
    # persistent executable cache: the axon remote-compile service is slow
    # and flaky under load; cache hits make reruns (and driver reruns)
    # independent of its health.  The cache dir is local-only (gitignored).
    import jax
    cache_dir = os.path.join(_HERE, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _child(args, timeout, env_extra=None):
    """Run this file as a subprocess entry, return its parsed JSON or None."""
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(f"bench child {args}: no JSON (rc={r.returncode})\n"
                         + r.stderr[-2000:] + "\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench child {args}: timeout after {timeout}s\n")
    except Exception as e:
        sys.stderr.write(f"bench child {args}: {e!r}\n")
    return None


def config3_main(n_warm=3, n_time=100, nx=100, ny=100):
    """Subprocess entry: measure config 3, one JSON line."""
    _enable_cache()
    import jax
    gps3, step3, phases3, stats3 = _run(_cfg3(nx=nx, ny=ny), n_warm=n_warm,
                                        n_time=n_time)
    print(json.dumps({
        "gridpoints_per_s_per_chip": round(gps3, 1),
        "ms_per_step": round(1e3 * step3, 2),
        "breakdown_ms_per_step": {k: round(v, 2) for k, v in phases3.items()},
        "backend": jax.devices()[0].platform,
        **stats3,
    }))


def config4_main(nbin8=False):
    """Subprocess entry: the interactive-ARC benchmark alone, one JSON line.
    With nbin8, the MOSAIC_8BIN package (VERDICT r3 item 6: bin count
    scales the production cost; measure it)."""
    _enable_cache()
    import jax
    cfg = _cfg4()
    if nbin8:
        import dataclasses
        from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt
        cfg = cfg.replace(chem=dataclasses.replace(
            cfg.chem, chem_opt=ChemOpt.CBMZ_MOSAIC_8BIN))
    gps4, step4, phases4, stats4 = _run(cfg, n_warm=2, n_time=100,
                                        gas=True)
    print(json.dumps({
        "gridpoints_per_s_per_chip": round(gps4, 1),
        "ms_per_step": round(1e3 * step4, 2),
        "breakdown_ms_per_step": {k: round(v, 2) for k, v in phases4.items()},
        "backend": jax.devices()[0].platform,
        **stats4,
    }))


def main():
    # -- headline: config 3, retried, then CPU fallback; flush immediately --
    r3 = None
    for attempt in range(2):
        r3 = _child(["--config3"], timeout=2000)
        if r3 is not None:
            break
        time.sleep(10)
    if r3 is None:
        # TPU service down: a measured CPU number beats no number
        r3 = _child(["--config3-small"], timeout=1500,
                    env_extra={"JAX_PLATFORMS": "cpu"})
    if r3 is None:
        r3 = {"gridpoints_per_s_per_chip": 0.0, "ms_per_step": None,
              "breakdown_ms_per_step": {}, "backend": "none (all attempts failed)"}

    print(json.dumps({
        "metric": "grid-points/s/chip (dycore+RRTMG+aerosol-optics step, 100x100x50)",
        "value": r3["gridpoints_per_s_per_chip"],
        "unit": "gridpoints/s",
        "vs_baseline": 1.0,
        "backend": r3.get("backend"),
        "breakdown_ms_per_step": r3.get("breakdown_ms_per_step", {}),
        "window_ms": r3.get("window_ms"),
        "dispersion": r3.get("dispersion"),
        "contention_suspected": r3.get("contention_suspected"),
    }), flush=True)

    # -- extras: best-effort, artifacts file only (never stdout) ------------
    # Written INCREMENTALLY after each child completes (VERDICT r4 weak #1:
    # the one end-of-main() write lost the round's flagship config-4 number
    # when the driver's timeout killed a LATER child), and the interactive-
    # ARC measurement — the number that matters — runs before the
    # speculative large-shard child.
    extras = {"config3": r3}

    def _save():
        try:
            os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
            path = os.path.join(_HERE, "artifacts", "BENCH_extras.json")
            with open(path + ".tmp", "w") as f:
                json.dump(extras, f, indent=1)
            os.replace(path + ".tmp", path)
        except Exception as e:
            sys.stderr.write(f"bench extras write failed: {e!r}\n")

    _save()
    extras["config4_interactive_arc"] = (
        _child(["--config4"], timeout=1200)
        or {"skipped": "time budget exceeded or service down"})
    _save()
    extras["config4_8bin"] = (
        _child(["--config4-8bin"], timeout=900)
        or {"skipped": "time budget exceeded or service down"})
    _save()
    # larger per-chip shard: the step is op-overhead-bound at 100^2 x 50
    # (artifacts/PERF_EVIDENCE_r3.md §2), so gridpoints/s/chip should RISE
    # with shard size — the weak-scaling-favourable datapoint.  Short box:
    # this either hits the compile cache (minutes) or cannot finish at all
    # (a cold 200x200 compile exceeded 50 min on round 3/4's degraded
    # remote-compile service), so a long timeout only burns driver budget.
    extras["config3_large_200x200"] = (
        _child(["--config3-large"], timeout=900)
        or {"skipped": "compile cache cold and service too slow"})
    _save()


if __name__ == "__main__":
    if "--config3" in sys.argv:
        config3_main()
    elif "--config3-large" in sys.argv:
        config3_main(n_warm=2, n_time=100, nx=200, ny=200)
    elif "--config3-small" in sys.argv:
        config3_main(n_warm=1, n_time=10)
    elif "--config4-8bin" in sys.argv:
        config4_main(nbin8=True)
    elif "--config4" in sys.argv:
        config4_main()
    else:
        main()
