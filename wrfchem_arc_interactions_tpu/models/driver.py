"""Time-integration driver — the integrate()/wrf_run equivalent (canonical:
frame/module_integrate.F + main/wrf.F; SURVEY.md §3.1), single domain.

A `Simulation` owns the jitted full-step functions (one XLA program per
alarm combination: plain / radiation / chem / both — the TPU analog of the
reference's option-gated call tree), the step clock and alarms (radt,
chemdt, history, restart; the esmf_time_f90 role), step-time bookkeeping
(the `Timing for main` log lines), and optional NaN/CFL guards
(SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.dycore.solve import step as dyn_step
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.sharded import (
    grid_partition_specs,
    halo_ops_for,
)
from wrfchem_arc_interactions_tpu.physics.driver import post_dynamics, pre_dynamics
from wrfchem_arc_interactions_tpu.registry.state import State, state_partition_specs
from wrfchem_arc_interactions_tpu.utils.logging import log


def full_step(state: State, grid: Grid, cfg: Config, hx: HaloOps, dt: float,
              do_radiation: bool, do_chem: bool, time_s: float,
              boundary=None, spec_bc=None) -> State:
    """One complete model step: physics pre -> dynamics -> physics post
    (-> Davies specified/relaxation BC forcing when boundary data is given)."""
    state, phys_tend = pre_dynamics(state, grid, cfg, hx, dt, do_radiation, time_s)
    state = dyn_step(state, grid, cfg, hx, dt, phys_tend)
    state = post_dynamics(state, grid, cfg, hx, dt, do_chem)
    if boundary is not None and spec_bc is not None:
        state = spec_bc.apply(state, boundary, time_s, dt)
    return state


class Simulation:
    def __init__(self, cfg: Config, grid: Grid, state: State,
                 mesh=None, check_nans: bool = False,
                 output_dir: Optional[str] = None,
                 boundary=None, emissions=None, fdda=None):
        self.cfg = cfg
        self.grid = grid
        self.mesh = mesh
        self.boundary = boundary
        self.emissions = emissions    # {species|elev_species: flux, heat_mw}
        # analysis-nudging target: a LateralBoundary two-snapshot window
        # (models/fdda.py); active when cfg.fdda.grid_fdda is set
        self.fdda = fdda if cfg.fdda.grid_fdda else None
        self.spec_bc = None
        from wrfchem_arc_interactions_tpu.config.namelist import BCKind
        if (cfg.dynamics.bc_x == BCKind.SPECIFIED
                or cfg.dynamics.bc_y == BCKind.SPECIFIED):
            if boundary is None:
                raise ValueError("specified BCs need a LateralBoundary")
            from wrfchem_arc_interactions_tpu.models.lateral_bc import (
                make_specified_bc,
            )
            moist = cfg.moist_species()
            self.spec_bc = make_specified_bc(
                cfg, grid, names=("u", "v", "w", "t", "mu", "ph") + moist)
        self.check_nans = check_nans
        self.output_dir = output_dir
        self.dt = cfg.time_control.dt
        self.time_s = 0.0
        # ESMF-time analog: calendar clock for solar geometry, timestamps,
        # and the tslist series (utils/clock.py)
        from wrfchem_arc_interactions_tpu.utils.clock import ModelClock
        self.clock = ModelClock(cfg.time_control.start_date)
        self._solar_off = self.clock.utc_offset_s()
        self._julian = self.clock.julian_day()
        self.ts_series: Dict[str, list] = {
            label: [] for (label, _, _) in cfg.time_control.ts_points}
        self.step_idx = 0
        self.step_times: List[float] = []
        self.hx = halo_ops_for(cfg, mesh)
        tc = cfg.time_control
        self.hist_every = max(1, round(tc.history_interval_s / self.dt)) \
            if (output_dir and tc.history_interval_s > 0) else 0
        self.rst_every = max(1, round(tc.restart_interval_s / self.dt)) \
            if (output_dir and tc.restart_interval_s > 0) else 0
        self.aux_every = max(1, round(tc.auxhist_interval_s / self.dt)) \
            if (output_dir and tc.auxhist_interval_s > 0) else 0

        # alarm cadences in steps (0 = never)
        self.rad_every = max(1, round(cfg.physics.radt_s / self.dt)) \
            if cfg.physics.ra_sw_physics.value != "none" or cfg.physics.ra_lw_physics.value != "none" else 0
        self.chem_every = max(1, round(cfg.chem.chemdt_s / self.dt)) \
            if cfg.chem.chem_opt.value != "none" else 0

        # chem-phase sync field, derived from what the chem driver WRITES
        # under this config (ADVICE r4: a hard-coded list silently degrades
        # to syncing on a pass-through field for configs that lack the
        # listed names).  Preference: the aerosol optics output (computed
        # LAST in chem_driver, so fetching it transitively barriers the
        # whole chem chain) when aer_ra_feedback is on; else the first gas
        # species when the mechanism runs; else any chem_ field (all are
        # rewritten by drydep/vertmix/aerchem); else theta.
        ch = cfg.chem
        self._chem_sync: tuple = ()
        if ch.aer_ra_feedback:
            self._chem_sync += ("tau_aer_sw",)
        if ch.gaschem_onoff:
            self._chem_sync += ("chem_o3",)
        self._chem_sync += tuple(k for k in state if k.startswith("chem_"))
        self._chem_sync += ("t",)

        self._steppers: Dict = {}
        if mesh is not None:
            s_specs = state_partition_specs(cfg)
            g_specs = grid_partition_specs(grid)
            from jax.sharding import NamedSharding
            self.state = {k: jax.device_put(v, NamedSharding(mesh, s_specs[k]))
                          for k, v in state.items()}
            self.grid = jax.tree.map(
                lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
                grid, g_specs)
            self._s_specs, self._g_specs = s_specs, g_specs
        else:
            self.state = state

    def _wrap(self, fn):
        """shard_map+jit a (state, grid, time_s) -> state function."""
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            fn = jax.shard_map(fn, mesh=self.mesh,
                               in_specs=(self._s_specs, self._g_specs, P()),
                               out_specs=self._s_specs)
        return jax.jit(fn)

    def _stepper(self, key: str) -> Callable:
        """Three separately-compiled executables — 'rad', 'main', 'chem' —
        instead of one fused program per alarm combination: XLA compile time
        for the combined graph is prohibitive, the alarm pieces run at
        radt/chemdt cadence anyway, and the main dycore binary is reused on
        every step."""
        if key not in self._steppers:
            cfg, hx, dt = self.cfg, self.hx, self.dt
            if key == "main":
                fdda = self.fdda

                def add_fdda(s, tend, t_s):
                    if fdda is None:
                        return tend
                    from wrfchem_arc_interactions_tpu.models.fdda import (
                        apply_nudging,
                    )
                    return apply_nudging(tend, s, fdda, t_s, cfg)

                spec_bc = self.spec_bc
                if spec_bc is not None:
                    # boundary data + zone masks are traced ARGUMENTS (not
                    # baked into the executable): nesting swaps the
                    # snapshots every parent step without recompiling, and
                    # under a mesh they shard like the state fields
                    import dataclasses as _dc

                    def fn_bdy(s, g, t_s, bdy, spec_mask, relax_w):
                        s, tend = pre_dynamics(s, g, cfg, hx, dt, False, t_s)
                        tend = add_fdda(s, tend, t_s)
                        s = dyn_step(s, g, cfg, hx, dt, tend)
                        s = post_dynamics(s, g, cfg, hx, dt, False)
                        sb = _dc.replace(spec_bc, spec_mask=spec_mask,
                                         relax_w=relax_w)
                        return sb.apply(s, bdy, t_s, dt, hx=hx)

                    if self.mesh is not None:
                        from jax.sharding import PartitionSpec as P
                        from wrfchem_arc_interactions_tpu.models.lateral_bc import (
                            LateralBoundary,
                        )
                        sp2d = P("my", "mx")
                        sspec = self._s_specs
                        bspec = lambda d: {k: sspec.get(k, sp2d) for k in d}
                        bdy0 = self.boundary
                        bdy_specs = LateralBoundary(
                            lo=bspec(bdy0.lo), hi=bspec(bdy0.hi),
                            t_lo=P(), t_hi=P())
                        fn_bdy = jax.shard_map(
                            fn_bdy, mesh=self.mesh,
                            in_specs=(sspec, self._g_specs, P(), bdy_specs,
                                      sp2d, sp2d),
                            out_specs=sspec)
                    self._steppers[key] = jax.jit(fn_bdy)
                    return self._steppers[key]

                def fn(s, g, t_s):
                    s, tend = pre_dynamics(s, g, cfg, hx, dt, False, t_s)
                    tend = add_fdda(s, tend, t_s)
                    s = dyn_step(s, g, cfg, hx, dt, tend)
                    s = post_dynamics(s, g, cfg, hx, dt, False)
                    return s
            elif key == "rad":
                from wrfchem_arc_interactions_tpu.physics.radiation.driver import (
                    radiation_driver,
                )
                jd, off = self._julian, self._solar_off
                # julian day advances CONTINUOUSLY with traced model time
                # (ADVICE r3: baking the construction-time value froze the
                # solar declination at day 1 for multi-day runs).  jd0/off
                # are baked floats, so the program stays byte-stable across
                # runs of the same calendar config and never recompiles at
                # day boundaries.

                def fn(s, g, t_s):
                    jd_t = jd + (t_s + off) / 86400.0
                    return radiation_driver(s, g, cfg, t_s + off,
                                            julian_day=jd_t)
            elif key == "chem_stream":
                # emission-file stream variant: the emissions dict is a
                # TRACED argument so hourly wrfchemi-style snapshots swap
                # without recompiling (io/auxinput.EmissionStream); kept as
                # a separate executable so the constant-emissions programs
                # stay byte-stable for the compile cache
                from wrfchem_arc_interactions_tpu.chem.driver import chem_driver
                jd, off = self._julian, self._solar_off

                def fn_es(s, g, t_s, emis):
                    jd_t = jd + (t_s + off) / 86400.0
                    return chem_driver(s, g, cfg, hx, cfg.chem.chemdt_s,
                                       time_s=t_s + off, emissions=emis,
                                       julian_day=jd_t)

                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P
                    sp2d = P("my", "mx")
                    emis0 = self.emissions.snaps[0]
                    e_specs = {k: (sp2d if np.ndim(v) == 2 else P())
                               for k, v in emis0.items()}
                    fn_es = jax.shard_map(
                        fn_es, mesh=self.mesh,
                        in_specs=(self._s_specs, self._g_specs, P(), e_specs),
                        out_specs=self._s_specs)
                self._steppers[key] = jax.jit(fn_es)
                return self._steppers[key]
            elif key == "chem":
                from wrfchem_arc_interactions_tpu.chem.driver import chem_driver
                emissions = self.emissions
                jd, off = self._julian, self._solar_off

                def fn(s, g, t_s):
                    jd_t = jd + (t_s + off) / 86400.0
                    return chem_driver(s, g, cfg, hx, cfg.chem.chemdt_s,
                                       time_s=t_s + off,
                                       emissions=emissions,
                                       julian_day=jd_t)
            else:
                raise ValueError(key)
            self._steppers[key] = self._wrap(fn)
        return self._steppers[key]

    @staticmethod
    def _sync(state, *names):
        """True device sync: fetch ONE element of the first present field
        the phase actually WRITES (a pass-through field's buffer can
        complete without the phase's compute).  A 4-byte device_get is an
        unambiguous completion barrier — but on this image's tunneled TPU it
        costs a full ~29 ms host round trip (measured round 5), so it is
        used ONLY at window boundaries and in the explicit phase-timing
        mode, never per production step: a per-step sync measures tunnel
        LATENCY, not compute (round 4's 46 ms/step headline was ~29 ms RTT
        + ~17 ms compute)."""
        for n in names:
            if n in state:
                a = state[n]
                jax.device_get(a[(0,) * a.ndim])
                return

    def sync(self):
        """Block until every queued step has executed (window barrier)."""
        self._sync(self.state, "t")

    def advance(self, n_steps: int,
                on_step: Optional[Callable[["Simulation"], None]] = None,
                phase_timing: bool = False):
        """Advance n steps. With `phase_timing`, each executable (chem/rad/
        main) is synchronized and timed separately into `self.phase_times`
        (the per-phase step-time breakdown the benchmark reports); the extra
        device syncs make it bench-mode only."""
        if phase_timing and not hasattr(self, "phase_times"):
            self.phase_times = {"chem": 0.0, "rad": 0.0, "main": 0.0}
        for _ in range(n_steps):
            do_rad = self.rad_every > 0 and self.step_idx % self.rad_every == 0
            do_chem = self.chem_every > 0 and self.step_idx % self.chem_every == 0
            t_start = t0 = time.perf_counter()
            t_now = jnp.float32(self.time_s)
            if do_chem:
                from wrfchem_arc_interactions_tpu.io.auxinput import (
                    EmissionStream,
                )
                if isinstance(self.emissions, EmissionStream):
                    emis = {k: jnp.asarray(v)
                            for k, v in
                            self.emissions.at_time(self.time_s).items()}
                    self.state = self._stepper("chem_stream")(
                        self.state, self.grid, t_now, emis)
                else:
                    self.state = self._stepper("chem")(self.state, self.grid,
                                                       t_now)
                if phase_timing:
                    self._sync(self.state, *self._chem_sync)
                    t1 = time.perf_counter()
                    self.phase_times["chem"] += t1 - t0
                    t0 = t1
            if do_rad:
                self.state = self._stepper("rad")(self.state, self.grid, t_now)
                if phase_timing:
                    self._sync(self.state, "rthraten_sw")
                    t1 = time.perf_counter()
                    self.phase_times["rad"] += t1 - t0
                    t0 = t1
            if self.spec_bc is not None:
                self.state = self._stepper("main")(
                    self.state, self.grid, t_now, self.boundary,
                    self.spec_bc.spec_mask, self.spec_bc.relax_w)
            else:
                self.state = self._stepper("main")(self.state, self.grid, t_now)
            if phase_timing:
                self._sync(self.state, "t")
                self.phase_times["main"] += time.perf_counter() - t0
            # steps are chained asynchronously (XLA queues them back to
            # back); `elapsed` is enqueue time unless phase_timing synced.
            # Throughput is measured over chained windows closed by sync().
            elapsed = time.perf_counter() - t_start
            self.step_times.append(elapsed)
            self.step_idx += 1
            self.time_s += self.dt
            if self.check_nans and not bool(jnp.isfinite(self.state["t"]).all()):
                raise FloatingPointError(
                    f"NaN in theta at step {self.step_idx} (t={self.time_s}s)")
            log(f"Timing for main: time {self.clock.timestamp(self.time_s)} "
                f"on domain 1: {elapsed:.5f} elapsed seconds", level=2)
            if self.ts_series:
                self._record_ts()
            if self.hist_every and self.step_idx % self.hist_every == 0:
                from wrfchem_arc_interactions_tpu.io import history as hio
                ext = hio.default_extension()
                hio.write_history(
                    f"{self.output_dir}/hist_{self.step_idx:06d}{ext}",
                    self.cfg, self.grid, self.state, self.time_s)
            if self.rst_every and self.step_idx % self.rst_every == 0:
                from wrfchem_arc_interactions_tpu.io import history as hio
                ext = hio.default_extension()
                hio.write_restart(
                    f"{self.output_dir}/restart_{self.step_idx:06d}{ext}",
                    self.cfg, self.state, self.step_idx, self.time_s)
            if self.aux_every and self.step_idx % self.aux_every == 0:
                # auxiliary pressure-level diagnostic stream (auxhist
                # analog; io/diags.py)
                from wrfchem_arc_interactions_tpu.io import diags
                from wrfchem_arc_interactions_tpu.io import history as hio
                ext = hio.default_extension()
                diags.write_diags(
                    f"{self.output_dir}/auxdiag_{self.step_idx:06d}{ext}",
                    self.cfg, self.grid, self.state, self.time_s)
            if on_step is not None:
                on_step(self)

    def _record_ts(self):
        """tslist analog (canonical: share/wrf_timeseries.F): per-step
        surface series at registered (label, j, i) points."""
        s = self.state
        for label, j, i in self.cfg.time_control.ts_points:
            row = {
                "time_s": self.time_s,
                "t_sfc": float(s["t"][0, j, i]) + 300.0,
                "u_sfc": float(s["u"][0, j, i]),
                "v_sfc": float(s["v"][0, j, i]),
                "w_max": float(jnp.max(jnp.abs(s["w"][:, j, i]))),
                "psfc": float(s["mu"][j, i]) + float(self.grid.mub[j, i])
                        + self.grid.p_top,
                "rainnc": float(s["rainnc"][j, i]) if "rainnc" in s else 0.0,
            }
            if "qv" in s:
                row["qv_sfc"] = float(s["qv"][0, j, i])
            self.ts_series[label].append(row)

    def write_tslist(self, out_dir: str):
        """Write each registered point's series as <label>.TS (the wrfout
        tslist file analog: one header + one line per step)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        for label, rows in self.ts_series.items():
            path = os.path.join(out_dir, f"{label}.TS")
            with open(path, "w") as f:
                if rows:
                    cols = list(rows[0].keys())
                    f.write(" ".join(cols) + "\n")
                    for r in rows:
                        f.write(" ".join(f"{r[c]:.6g}" for c in cols) + "\n")
        return [os.path.join(out_dir, f"{k}.TS") for k in self.ts_series]

    def run_seconds(self, seconds: float, **kw):
        self.advance(int(round(seconds / self.dt)), **kw)

    def mean_step_time(self, skip: int = 2) -> float:
        ts = self.step_times[skip:] if len(self.step_times) > skip else self.step_times
        return float(np.mean(ts)) if ts else float("nan")
