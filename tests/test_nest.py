"""Nesting (models/nest.py): interpolation exactness, null-balance,
child sharpening, and two-way feedback consistency."""

import numpy as np
import jax.numpy as jnp
import pytest

from wrfchem_arc_interactions_tpu.config import (
    Config, DomainConfig, DynamicsConfig, TimeControl,
)
from wrfchem_arc_interactions_tpu.models import ideal, soundings
from wrfchem_arc_interactions_tpu.models.nest import (
    NestSpec, NestedSimulation, ParentToChild,
)


def _cfg(nx=48, ny=32, nz=16):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=3000.0, dy=3000.0,
                            ztop=12000.0, p_top=20000.0),
        time_control=TimeControl(dt=12.0),
        dynamics=DynamicsConfig(kvdif=20.0),
    )


SPEC = NestSpec(i_start=16, j_start=10, nx_parent_cells=16,
                ny_parent_cells=12, ratio=3)


def test_interpolation_reproduces_linear_fields():
    """Bilinear interpolation is exact on constant + linear-in-(x,y) fields,
    for mass points and both staggered conventions (interior child points —
    parent edge clamping affects only extrapolated rows)."""
    pny, pnx = 32, 48
    it = ParentToChild(SPEC, pny, pnx)
    yy, xx = np.meshgrid(np.arange(pny, dtype=np.float32),
                         np.arange(pnx, dtype=np.float32), indexing="ij")
    for name, (ox, oy) in (("t", (0.5, 0.5)), ("u", (0.0, 0.5)),
                           ("v", (0.5, 0.0))):
        lin = 2.0 * (xx + ox) - 3.0 * (yy + oy) + 7.0     # physical position
        got = np.asarray(it.field(jnp.asarray(lin), name))
        r = SPEC.ratio
        cj, ci = np.meshgrid(np.arange(SPEC.cny), np.arange(SPEC.cnx),
                             indexing="ij")
        # child physical positions in parent grid units
        xpos = SPEC.i_start + ((ci + 0.5) / r if name != "u" else ci / r)
        ypos = SPEC.j_start + ((cj + 0.5) / r if name != "v" else cj / r)
        want = 2.0 * xpos - 3.0 * ypos + 7.0
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                                   rtol=0, atol=1e-4, err_msg=name)


def test_quiescent_null_balance():
    """A quiescent parent must produce a quiescent child: base-state
    consistency + boundary forcing must not inject spurious motion."""
    cfg = _cfg()
    grid, state = ideal.make_case(cfg, "quiescent")
    nest = NestedSimulation(cfg, grid, state, SPEC,
                            theta_of_z=soundings.constant_n2_theta())
    nest.advance(8)
    w = np.abs(np.asarray(nest.child.state["w"]))
    assert w.max() < 5e-3, f"child spun up from rest: |w|max={w.max()}"
    u = np.abs(np.asarray(nest.child.state["u"]))
    assert u.max() < 5e-2, f"child u from rest: {u.max()}"


@pytest.mark.slow
def test_child_resolves_sharper_updraft():
    """A warm bubble inside the nest: the 3x finer child must resolve a
    stronger updraft than the coarse parent (classic refinement signal),
    and remain finite/stable through repeated boundary cycles."""
    cfg = _cfg()
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=6000.0, zr=1200.0,
                                  three_d=True)
    nest = NestedSimulation(cfg, grid, state, SPEC,
                            theta_of_z=soundings.constant_n2_theta())
    nest.advance(10)
    w_c = np.asarray(nest.child.state["w"])
    w_p = np.asarray(nest.parent.state["w"])
    assert np.isfinite(w_c).all()
    assert w_c.max() > 1.1 * w_p.max(), (
        f"child ({w_c.max()}) not sharper than parent ({w_p.max()})")


@pytest.mark.slow
def test_two_way_feedback_overlap_consistency():
    """With feedback on, the overlapped parent interior equals the child
    block average after each cycle, and the parent stays stable."""
    cfg = _cfg()
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=6000.0, zr=1200.0,
                                  three_d=True)
    nest = NestedSimulation(cfg, grid, state, SPEC,
                            theta_of_z=soundings.constant_n2_theta(),
                            feedback=True)
    nest.advance(6)
    s = SPEC
    r = s.ratio
    # recompute the expected block average of theta and compare to parent
    a = np.asarray(nest.child.state["t"])
    blk = a.reshape(a.shape[0], s.ny_parent_cells, r, s.nx_parent_cells, r
                    ).mean((2, 4))
    dyn = nest.cfg_child.dynamics
    skip_p = -(-(dyn.spec_zone + dyn.relax_zone) // r) + 1
    sub = blk[:, skip_p:s.ny_parent_cells - skip_p,
              skip_p:s.nx_parent_cells - skip_p]
    p = np.asarray(nest.parent.state["t"])[
        :, s.j_start + skip_p:s.j_start + s.ny_parent_cells - skip_p,
        s.i_start + skip_p:s.i_start + s.nx_parent_cells - skip_p]
    np.testing.assert_allclose(p, sub, rtol=0, atol=1e-5)
    assert np.isfinite(np.asarray(nest.parent.state["w"])).all()


@pytest.mark.slow
def test_sharded_child_matches_single_device():
    """Sharded nests: parent AND child advance under a 2x2 mesh (the
    sharded specified-BC path) and match the single-device nested run to
    f32 roundoff — the nest scatter/gather decomposition invariant."""
    from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh

    cfg = _cfg(nx=24, ny=8, nz=12)
    spec = NestSpec(i_start=8, j_start=2, nx_parent_cells=8,
                    ny_parent_cells=4, ratio=3)
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=6000.0, zr=1200.0,
                                  three_d=True)
    n1 = NestedSimulation(cfg, grid, dict(state), spec,
                          theta_of_z=soundings.constant_n2_theta())
    n1.advance(3)
    n4 = NestedSimulation(cfg, grid, dict(state), spec,
                          theta_of_z=soundings.constant_n2_theta(),
                          mesh=make_mesh(2, 2))
    n4.advance(3)
    for which, a, b in (("parent", n1.parent.state, n4.parent.state),
                        ("child", n1.child.state, n4.child.state)):
        for name, tl in (("u", 5e-3), ("v", 5e-3), ("w", 5e-3),
                         ("t", 5e-3), ("mu", 0.5), ("ph", 0.5)):
            d = float(jnp.max(jnp.abs(jnp.asarray(a[name])
                                      - jnp.asarray(b[name]))))
            assert d < tl, f"{which}.{name}: diff {d}"


def test_moving_nest_shift_is_exact():
    """move(di, 0): surviving child content equals the pre-move state
    rolled by di*ratio cells (whole-parent-cell moves align the grids
    exactly); newly exposed strips come from parent interpolation."""
    cfg = _cfg(nx=32, ny=12, nz=10)
    spec = NestSpec(i_start=6, j_start=3, nx_parent_cells=8,
                    ny_parent_cells=6, ratio=3)
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                  zc=1500.0, xr=8000.0, zr=1200.0,
                                  three_d=True)
    nest = NestedSimulation(cfg, grid, state, spec,
                            theta_of_z=soundings.constant_n2_theta())
    nest.advance(1)
    before = np.asarray(nest.child.state["t"]).copy()
    nest.move(1, 0)
    after = np.asarray(nest.child.state["t"])
    r = spec.ratio
    np.testing.assert_array_equal(after[:, :, :-r], before[:, :, r:])
    assert nest.spec.i_start == spec.i_start + 1
    # moving keeps the child advanceable and stable
    nest.advance(2)
    assert np.isfinite(np.asarray(nest.child.state["w"])).all()


def test_follow_max_w_tracks_updraft():
    """The vortex-following helper recentres the window toward the
    parent's strongest updraft column (one parent cell per call)."""
    cfg = _cfg(nx=32, ny=12, nz=10)
    spec = NestSpec(i_start=4, j_start=3, nx_parent_cells=8,
                    ny_parent_cells=6, ratio=3)
    # bubble EAST of the child window centre
    grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=3.0,
                                  zc=1500.0, xr=6000.0, zr=1200.0,
                                  three_d=True, xc_frac=0.7)
    nest = NestedSimulation(cfg, grid, state, spec,
                            theta_of_z=soundings.constant_n2_theta())
    nest.advance(4)          # let the updraft develop
    i0 = nest.spec.i_start
    moved = nest.follow_max_w()
    assert nest.spec.i_start >= i0
    for _ in range(4):
        nest.advance(1)
        nest.follow_max_w()
    assert nest.spec.i_start > i0, "window never moved toward the updraft"
    assert np.isfinite(np.asarray(nest.child.state["w"])).all()
