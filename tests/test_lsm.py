"""Noah-class LSM tests (canonical: phys/module_sf_noahdrv.F behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import (
    PBLScheme, RAScheme, SFScheme, SFSurface,
)
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.physics import lsm


def _soil_state(tsk=300.0, sm=0.25, shp=(2, 3)):
    return {
        "tsk": jnp.full(shp, tsk),
        "tslb": jnp.full((4,) + shp, 285.0),
        "smois": jnp.full((4,) + shp, sm),
        "tmn": jnp.full(shp, 285.0),
    }


def test_soil_heat_diffuses_downward():
    st = _soil_state(tsk=305.0)
    z = jnp.zeros((2, 3))
    for _ in range(200):                      # ~2 h of strong heating
        upd = lsm.noah_step(st, hfx=z, qfx_pot=z, ra=jnp.full((2, 3), 50.0),
                            rho0=1.2, precip_rate=z,
                            swdown=jnp.full((2, 3), 600.0),
                            glw=jnp.full((2, 3), 350.0), dt=36.0)
        st.update({k: upd[k] for k in ("tsk", "tslb", "smois")})
    tslb = np.asarray(st["tslb"])
    assert np.isfinite(tslb).all()
    # heating propagates downward with decreasing amplitude
    assert tslb[0, 0, 0] > tslb[1, 0, 0] > tslb[3, 0, 0]
    assert tslb[0, 0, 0] > 286.0
    assert tslb[3, 0, 0] < 290.0


def test_wet_soil_evaporates_more():
    z = jnp.zeros((1, 1))
    qpot = jnp.full((1, 1), 1e-4)
    ra = jnp.full((1, 1), 50.0)
    sw = jnp.full((1, 1), 500.0)
    glw = jnp.full((1, 1), 350.0)
    wet = lsm.noah_step(_soil_state(sm=0.32), z, qpot, ra, 1.2, z, sw, glw, 60.0)
    dry = lsm.noah_step(_soil_state(sm=0.12), z, qpot, ra, 1.2, z, sw, glw, 60.0)
    assert float(wet["qfx_eff"][0, 0]) > 2.0 * float(dry["qfx_eff"][0, 0])


def test_evaporation_dries_and_rain_moistens_soil():
    z = jnp.zeros((1, 1))
    qpot = jnp.full((1, 1), 2e-4)
    ra = jnp.full((1, 1), 30.0)
    sw = jnp.full((1, 1), 400.0)
    glw = jnp.full((1, 1), 350.0)
    st = _soil_state(sm=0.30)
    sm0 = float(st["smois"][0, 0, 0])
    for _ in range(50):
        upd = lsm.noah_step(st, z, qpot, ra, 1.2, z, sw, glw, 60.0)
        st.update({k: upd[k] for k in ("tsk", "tslb", "smois")})
    assert float(st["smois"][0, 0, 0]) < sm0
    # rain re-moistens (bounded by saturation)
    upd = lsm.noah_step(st, z, qpot, ra, 1.2,
                        jnp.full((1, 1), 1e-2), sw, glw, 600.0)
    assert float(upd["smois"][0, 0, 0]) > float(st["smois"][0, 0, 0])
    assert float(upd["smois"].max()) <= lsm.SM_SAT + 1e-6


@pytest.mark.slow
def test_noah_end_to_end():
    cfg = Config(
        domain=DomainConfig(nx=16, ny=4, nz=16, dx=2000.0, dy=2000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=10.0),
        dynamics=DynamicsConfig(kvdif=20.0),
        physics=PhysicsConfig(ra_sw_physics=RAScheme.SIMPLE,
                              ra_lw_physics=RAScheme.SIMPLE, radt_s=60.0,
                              bl_pbl_physics=PBLScheme.YSU,
                              sf_sfclay_physics=SFScheme.REVISED_MM5,
                              sf_surface_physics=SFSurface.NOAH),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.run_seconds(1200.0)
    out = sim.state
    assert np.isfinite(np.asarray(out["tslb"])).all()
    assert np.isfinite(np.asarray(out["tsk"])).all()
    sm = np.asarray(out["smois"])
    assert (sm >= 0.02 - 1e-6).all() and (sm <= lsm.SM_SAT + 1e-6).all()
    assert 230.0 < float(np.asarray(out["tsk"]).mean()) < 340.0


def test_snowpack_cycle_and_veg_classes():
    """Noah snow physics: frozen precip accumulates SWE, raises albedo,
    caps the skin at 0 C during melt, and melt water infiltrates; the
    vegetation table modulates canopy resistance (forest transpires less
    readily than grassland at equal soil moisture)."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.physics import lsm

    shp = (4, 4)
    base = {
        "tslb": jnp.full((4,) + shp, 272.0),
        "smois": jnp.full((4,) + shp, 0.25),
        "tsk": jnp.full(shp, 271.0),
        "snow": jnp.zeros(shp),
    }
    cold_air = jnp.full(shp, 268.0)
    # 1) snowfall accumulates, nothing infiltrates
    upd = lsm.noah_step(base, jnp.zeros(shp), jnp.zeros(shp),
                        jnp.full(shp, 50.0), jnp.full(shp, 1.2),
                        precip_rate=jnp.full(shp, 2e-3),   # mm/s
                        swdown=jnp.zeros(shp), glw=jnp.full(shp, 250.0),
                        dt=600.0, t_air0=cold_air)
    assert float(upd["snow"].min()) > 1.0, "snow did not accumulate"
    np.testing.assert_allclose(np.asarray(upd["smois"][0]),
                               np.asarray(base["smois"][0]), atol=2e-4)

    # 2) strong sun over a deep pack: skin pinned at 273.15, pack shrinks,
    # melt water moistens layer 1
    snowy = dict(base)
    snowy["snow"] = jnp.full(shp, 30.0)
    upd2 = lsm.noah_step(snowy, jnp.zeros(shp), jnp.zeros(shp),
                         jnp.full(shp, 50.0), jnp.full(shp, 1.2),
                         precip_rate=jnp.zeros(shp),
                         swdown=jnp.full(shp, 700.0),
                         glw=jnp.full(shp, 320.0), dt=1800.0,
                         t_air0=jnp.full(shp, 276.0))
    assert float(upd2["tsk"].max()) <= 273.151
    assert float(upd2["snow"].max()) < 30.0, "no melt under strong sun"
    assert float(upd2["smois"][0].min()) > 0.25, "melt water vanished"

    # 3) vegetation classes: forest (1) vs grass (0) evaporation
    for cls, label in ((0, "grass"), (1, "forest")):
        st = dict(base)
        st["snow"] = jnp.zeros(shp)
        st["ivgtyp"] = jnp.full(shp, float(cls))
        u = lsm.noah_step(st, jnp.zeros(shp), jnp.full(shp, 5e-5),
                          jnp.full(shp, 50.0), jnp.full(shp, 1.2),
                          precip_rate=jnp.zeros(shp),
                          swdown=jnp.full(shp, 300.0),
                          glw=jnp.full(shp, 300.0), dt=600.0,
                          t_air0=jnp.full(shp, 285.0))
        if cls == 0:
            qfx_grass = float(u["qfx_eff"].mean())
        else:
            qfx_forest = float(u["qfx_eff"].mean())
    assert qfx_forest < qfx_grass, (qfx_forest, qfx_grass)


def test_mynn_composes_with_noah():
    """ADVICE r3: selecting MYNN must not route around the land surface —
    the Noah soil columns must evolve exactly as they do under YSU (the
    reference's surface_driver is independent of bl_pbl_physics)."""
    def run(pbl):
        cfg = Config(
            domain=DomainConfig(nx=12, ny=4, nz=16, dx=2000.0, dy=2000.0,
                                ztop=12000.0, p_top=20000.0),
            time_control=TimeControl(dt=10.0),
            dynamics=DynamicsConfig(kvdif=20.0),
            physics=PhysicsConfig(ra_sw_physics=RAScheme.SIMPLE,
                                  ra_lw_physics=RAScheme.SIMPLE, radt_s=60.0,
                                  bl_pbl_physics=pbl,
                                  sf_sfclay_physics=SFScheme.REVISED_MM5,
                                  sf_surface_physics=SFSurface.NOAH),
        )
        grid, state = ideal.make_case(cfg, "quiescent")
        t0 = np.asarray(state["tslb"]).copy()
        sim = Simulation(cfg, grid, state, check_nans=True)
        sim.run_seconds(1200.0)
        return t0, sim.state

    t0, out = run(PBLScheme.MYNN)
    # soil temperature responded to the (daytime simple-rad) forcing
    dT = np.abs(np.asarray(out["tslb"]) - t0)
    assert float(dT[0].max()) > 0.01, "MYNN run left the soil frozen in time"
    assert np.isfinite(np.asarray(out["smois"])).all()
    # skin warmed the topsoil more than the deep layer (diurnal damping)
    assert float(dT[0].mean()) > float(dT[3].mean())


def test_snowmelt_exhaustion_conserves_energy():
    """ADVICE r3: when the pack fully melts within a step, the latent heat
    of fusion must come out of the skin overshoot (no double counting) —
    the post-melt skin must sit BETWEEN freezing and the no-snow skin."""
    shp = (2, 2)
    strong_sun = jnp.full(shp, 900.0)
    glw = jnp.full(shp, 320.0)
    warm_air = jnp.full(shp, 278.0)
    z = jnp.zeros(shp)
    ra = jnp.full(shp, 50.0)
    rho = jnp.full(shp, 1.2)

    def skin_after(swe):
        st = {
            "tslb": jnp.full((4,) + shp, 272.0),
            "smois": jnp.full((4,) + shp, 0.25),
            "tsk": jnp.full(shp, 272.5),
            "snow": jnp.full(shp, swe),
        }
        upd = lsm.noah_step(st, z, z, ra, rho, precip_rate=z,
                            swdown=strong_sun, glw=glw, dt=600.0,
                            t_air0=warm_air)
        return float(np.asarray(upd["tsk"])[0, 0]), \
            float(np.asarray(upd["snow"])[0, 0])

    tsk_none, _ = skin_after(0.0)            # no snow: full overshoot
    tsk_thin, snow_thin = skin_after(0.05)   # thin pack: melts out mid-step
    tsk_thick, snow_thick = skin_after(50.0)  # deep pack: skin pinned at 0C
    assert snow_thin == 0.0
    assert snow_thick > 0.0
    assert abs(tsk_thick - 273.15) < 1e-3
    # thin pack: some energy went to melting, so the skin ends between
    # freezing and the snow-free result (strictly less than no-snow)
    assert 273.15 <= tsk_thin < tsk_none - 0.05, (tsk_thin, tsk_none)
