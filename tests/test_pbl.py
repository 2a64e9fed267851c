"""Surface-layer + PBL tests: flux signs, implicit mixing stability,
boundary-layer growth over a heated surface."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, PhysicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.config.namelist import PBLScheme, SFScheme
from wrfchem_arc_interactions_tpu.models import ideal
from wrfchem_arc_interactions_tpu.models.driver import Simulation
from wrfchem_arc_interactions_tpu.physics.pbl import surface_and_pbl


def test_surface_fluxes_signs():
    cfg = Config(
        domain=DomainConfig(nx=8, ny=4, nz=16, dx=2000.0, dy=2000.0,
                            ztop=12000.0, p_top=20000.0),
        physics=PhysicsConfig(bl_pbl_physics=PBLScheme.YSU,
                              sf_sfclay_physics=SFScheme.REVISED_MM5),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    # warm surface -> upward heat flux
    state["tsk"] = state["tsk"] + 5.0
    state["u"] = state["u"] + 3.0
    out, tend = surface_and_pbl(state, grid, cfg, 10.0)
    hfx = np.asarray(out["hfx"])
    assert (hfx > 0).all(), "heated surface must give positive HFX"
    assert (np.asarray(out["qfx"]) > 0).all()
    assert (np.asarray(out["ust"]) > 0.05).all()
    # heating tendency positive in the lowest layer
    assert float(tend["th"][0].mean()) > 0.0
    # surface drag decelerates the flow
    assert float(tend["u"][0].mean()) < 0.0
    for v in tend.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_convective_boundary_layer_grows():
    cfg = Config(
        domain=DomainConfig(nx=16, ny=4, nz=20, dx=2000.0, dy=2000.0,
                            ztop=10000.0, p_top=26000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(bl_pbl_physics=PBLScheme.YSU,
                              sf_sfclay_physics=SFScheme.REVISED_MM5),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    state["tsk"] = state["tsk"] + 8.0       # strongly heated ground
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(90)                          # 15 min
    pblh = np.asarray(sim.state["pblh"])
    assert (pblh > 100.0).all(), f"PBL failed to grow: {pblh.mean()}"
    # near-surface theta warmed
    dth = np.asarray(sim.state["t"][0]) - np.asarray(state["t"][0])
    assert dth.mean() > 0.05


def test_mynn_grows_tke_and_mixes_cbl():
    """MYNN level-2.5: a surface-heated boundary layer grows QKE from the
    floor, mixes theta toward well-mixed, and stays finite; the stability
    functions recover the neutral Mellor-Yamada values at G_h = 0."""
    import numpy as np
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, PhysicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.config.namelist import (
        PBLScheme, SFScheme,
    )
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.models.driver import Simulation
    from wrfchem_arc_interactions_tpu.physics import pbl_mynn

    sm, sh = pbl_mynn.stability_functions(jnp.zeros(()))
    # neutral limits from the NN2009 constants (computed, not transcribed)
    assert 0.2 < float(sm) < 0.5
    assert 0.2 < float(sh) < 0.8
    # stable air mixes less, unstable more
    sm_st, _ = pbl_mynn.stability_functions(jnp.full((), -0.2))
    sm_un, _ = pbl_mynn.stability_functions(jnp.full((), 0.02))
    assert float(sm_st) < float(sm) < float(sm_un)

    cfg = Config(
        domain=DomainConfig(nx=16, ny=4, nz=20, dx=1000.0, dy=1000.0,
                            ztop=6000.0, p_top=45000.0),
        time_control=TimeControl(dt=10.0),
        physics=PhysicsConfig(bl_pbl_physics=PBLScheme.MYNN,
                              sf_sfclay_physics=SFScheme.REVISED_MM5),
    )
    grid, state = ideal.make_case(cfg, "quiescent")
    state = dict(state)
    state["tsk"] = jnp.full_like(state["tsk"], 310.0)   # hot surface -> CBL
    state["u"] = state["u"] + 5.0                       # shear production
    assert "qke" in state
    sim = Simulation(cfg, grid, state, check_nans=True)
    sim.advance(60)                                     # 10 min
    out = sim.state
    qke = np.asarray(out["qke"])
    assert np.isfinite(qke).all()
    assert qke.max() > 0.5, f"no TKE grew (max {qke.max()})"
    # TKE concentrated near the surface, decaying aloft
    assert qke[:5].mean() > 5.0 * max(qke[-5:].mean(), 1e-6)
    # theta mixed: near-surface lapse reduced vs initial
    th0 = np.asarray(grid.t_init)
    th1 = np.asarray(out["t"]) + 300.0
    d0 = th0[3] - th0[0]
    d1 = th1[3] - th1[0]
    assert d1.mean() < d0.mean() + 0.1
    assert float(np.asarray(out["pblh"]).max()) > 100.0
