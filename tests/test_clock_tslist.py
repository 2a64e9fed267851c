"""Calendar time manager (utils/clock.py — the ESMF-time analog) and the
tslist time-series diagnostics (canonical: external/esmf_time_f90 +
share/wrf_timeseries.F; SURVEY.md §2.4 'Time manager', §5.5)."""

import os

import numpy as np
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.utils.clock import (
    Alarm, ModelClock, format_wrf_time, parse_wrf_time,
)


def test_wrf_timestamps_roundtrip():
    s = "2014-07-03_06:30:00"
    assert format_wrf_time(parse_wrf_time(s)) == s
    clk = ModelClock(s)
    assert clk.timestamp(0.0) == s
    assert clk.timestamp(3930.0) == "2014-07-03_07:35:30"
    # crosses a month boundary correctly
    clk2 = ModelClock("2014-06-30_23:00:00")
    assert clk2.timestamp(2 * 3600.0) == "2014-07-01_01:00:00"


def test_julian_and_utc_offset():
    clk = ModelClock("2014-07-03_06:30:00")
    assert abs(clk.julian_day() - 184.0) < 0.5       # July 3 = day 184
    assert clk.utc_offset_s() == 6.5 * 3600.0
    # julian day advances with model time
    assert clk.julian_day(86400.0) - clk.julian_day(0.0) == 1.0


def test_alarm_ring_semantics():
    al = Alarm(interval_s=600.0)
    rings = [t for t in np.arange(0.0, 1900.0, 100.0) if al.is_ringing(t)]
    assert rings == [0.0, 600.0, 1200.0, 1800.0]
    assert not Alarm(interval_s=0.0).is_ringing(100.0)


def test_solar_time_follows_start_date():
    """Starting at local noon vs midnight changes the zenith angle the
    radiation driver sees (the calendar is live, not decorative)."""
    from wrfchem_arc_interactions_tpu.physics.radiation.driver import (
        cos_zenith,
    )
    lat = jnp.asarray([[40.0]])
    lon = jnp.asarray([[0.0]])
    clk_noon = ModelClock("2000-06-21_12:00:00")
    clk_mid = ModelClock("2000-06-21_00:00:00")
    mu_noon = float(cos_zenith(0.0 + clk_noon.utc_offset_s(), lat, lon,
                               julian_day=clk_noon.julian_day())[0, 0])
    mu_mid = float(cos_zenith(0.0 + clk_mid.utc_offset_s(), lat, lon,
                              julian_day=clk_mid.julian_day())[0, 0])
    assert mu_noon > 0.9 and mu_mid == 0.0


def test_tslist_records_and_writes(tmp_path):
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation

    cfg = Config(
        domain=DomainConfig(nx=24, ny=4, nz=10, dx=1000.0, dy=1000.0,
                            ztop=10000.0, p_top=26000.0),
        time_control=TimeControl(dt=5.0, start_date="2014-07-03_06:00:00",
                                 ts_points=(("mid", 2, 12), ("west", 2, 2))),
    )
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=2500.0, zr=1200.0,
                                  three_d=True)
    sim = Simulation(cfg, grid, state)
    sim.advance(6)
    assert len(sim.ts_series["mid"]) == 6
    # the bubble sits mid-domain: the mid point feels it, the west edge not
    assert sim.ts_series["mid"][-1]["w_max"] > \
        5.0 * max(sim.ts_series["west"][-1]["w_max"], 1e-9)
    files = sim.write_tslist(str(tmp_path))
    for p in files:
        assert os.path.exists(p)
        lines = open(p).read().splitlines()
        assert len(lines) == 7 and lines[0].startswith("time_s")
