"""Overlapped halo exchange + Pallas advection kernel tests.

- `overlap_stencil` must reproduce the serial pad()+stencil result exactly
  for plus-shaped stencils on the virtual 2D mesh (SURVEY.md §7.3-2: halo/
  compute overlap without correctness regression).
- The fused Pallas 5th/3rd-order advection kernel must match the jnp path
  (interpret mode on CPU; the TPU path is exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps, overlap_stencil
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
from wrfchem_arc_interactions_tpu.ops.stencil import win


def _plus_stencil(padded, consts):
    """A representative plus-shaped width-1 stencil (gradient + laplacian)."""
    a = padded["a"]
    b = padded["b"]
    gx = (win(a, 0, 0, pad=1) - win(a, 0, -1, pad=1))
    gy = (win(a, -1, 0, pad=1) - win(a, 0, 0, pad=1))
    lap = (win(b, 0, 1, pad=1) + win(b, 0, -1, pad=1)
           + win(b, 1, 0, pad=1) + win(b, -1, 0, pad=1)
           - 4.0 * win(b, 0, 0, pad=1))
    out = gx + 0.5 * gy + consts["c"] * lap
    return {"out": out, "gx": gx}


@pytest.mark.parametrize("bc", [BCKind.PERIODIC, BCKind.OPEN])
def test_overlap_stencil_matches_pad(bc):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))

    hx1 = HaloOps(bc_x=bc, bc_y=bc)
    ref = _plus_stencil({"a": hx1.pad(a, 1), "b": hx1.pad(b, 1)}, {"c": c})

    mesh = make_mesh(2, 4)
    hx8 = HaloOps(bc_x=bc, bc_y=bc, mesh_y=2, mesh_x=4, sharded=True)

    def f(a_blk, b_blk, c_blk):
        return overlap_stencil(hx8, {"a": a_blk, "b": b_blk}, 1,
                               _plus_stencil, {"c": c_blk})

    out = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "my", "mx"), P(None, "my", "mx"), P("my", "mx")),
        out_specs={"out": P(None, "my", "mx"), "gx": P(None, "my", "mx")},
    ))(a, b, c)
    # identical math, but XLA fuses the bulk/band passes differently from
    # the monolithic reference -> f32 ulp-level reassociation differences
    for k in ("out", "gx"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=3e-5, atol=1e-6, err_msg=k)


def test_overlap_stencil_single_device_path():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(3, 6, 7)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3, 6, 7)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(6, 7)).astype(np.float32))
    hx = HaloOps(bc_x=BCKind.PERIODIC, bc_y=BCKind.PERIODIC)
    ref = _plus_stencil({"a": hx.pad(a, 1), "b": hx.pad(b, 1)}, {"c": c})
    out = overlap_stencil(hx, {"a": a, "b": b}, 1, _plus_stencil, {"c": c})
    np.testing.assert_allclose(np.asarray(out["out"]), np.asarray(ref["out"]))


def test_overlap_schedule_structure_in_hlo():
    """Structural overlap evidence in the compiled HLO: (a) the X and Y
    exchanges are issued CONCURRENTLY up front (all collective-permutes
    precede the first edge-band patch), and (b) the bulk stencil does not
    consume any permute result, so XLA's latency-hiding scheduler is free to
    run it while the collectives are in flight.  (The async
    collective-permute-start/done split is TPU-backend lowering; the CPU
    backend keeps the synchronous form, so the graph-independence property
    is what this asserts.)"""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    mesh = make_mesh(2, 4)
    hx8 = HaloOps(bc_x=BCKind.PERIODIC, bc_y=BCKind.PERIODIC,
                  mesh_y=2, mesh_x=4, sharded=True)

    def f(a_blk, b_blk):
        return overlap_stencil(hx8, {"a": a_blk, "b": b_blk}, 1,
                               _plus_stencil, {"c": a_blk[0]})["out"]

    fn = jax.jit(jax.shard_map(f, mesh=mesh,
                               in_specs=(P(None, "my", "mx"), P(None, "my", "mx")),
                               out_specs=P(None, "my", "mx")))
    hlo = fn.lower(a, b).compile().as_text()
    # only the ENTRY computation is in (sequential) schedule order; fusion
    # body definitions are printed before it
    entry = hlo[hlo.index("ENTRY"):]
    lines = entry.splitlines()
    perm_idx = [i for i, l in enumerate(lines) if "collective-permute(" in l
                or "collective-permute-start(" in l]
    patch_idx = [i for i, l in enumerate(lines) if "dynamic-update-slice" in l]
    assert len(perm_idx) >= 4, f"expected >=4 permutes (2 axes x lo/hi x 2 "\
                               f"fields, minus CSE), got {len(perm_idx)}"
    assert patch_idx, "edge-band patches missing from the schedule"
    assert max(perm_idx) < min(patch_idx), (
        "a collective-permute is scheduled after the first edge-band patch "
        "— the exchanges are not issued up front")


def test_pallas_advection_equivalence_interpret():
    from wrfchem_arc_interactions_tpu.dycore import advection as adv
    from wrfchem_arc_interactions_tpu.ops import pallas_adv

    rng = np.random.default_rng(0)
    nz, ny, nx = 10, 16, 24
    q_pad = jnp.asarray(rng.normal(size=(nz, ny + 6, nx + 6)).astype(np.float32)) + 3.0
    ru_pad = jnp.asarray(rng.normal(size=(nz, ny + 6, nx + 6)).astype(np.float32))
    rv_pad = jnp.asarray(rng.normal(size=(nz, ny + 6, nx + 6)).astype(np.float32))
    ww = jnp.asarray(rng.normal(size=(nz + 1, ny, nx)).astype(np.float32))
    ww = ww.at[0].set(0.0).at[-1].set(0.0)

    class G:
        rdx = np.float32(1.0 / 500.0)
        rdy = np.float32(1.0 / 400.0)
        rdnw = jnp.asarray(rng.uniform(-40.0, -20.0, size=nz).astype(np.float32))

    g = G()
    ref = adv.advect_scalar(q_pad, ru_pad, rv_pad, ww, g, 5, 3)
    out = pallas_adv.advect_scalar_5_3(q_pad, ru_pad, rv_pad, ww, g.rdnw,
                                       g.rdx, g.rdy, interpret=True)
    d = np.abs(np.asarray(ref) - np.asarray(out)).max()
    s = np.abs(np.asarray(ref)).max()
    assert d / s < 1e-6, f"pallas vs jnp rel diff {d / s}"


def test_overlap_toggle_equivalence():
    """overlap_halo=False (blocking exchange) must reproduce the overlapped
    schedule's results exactly — it is a pure-schedule A/B lever."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from wrfchem_arc_interactions_tpu.config import (
        Config, DomainConfig, DynamicsConfig, TimeControl,
    )
    from wrfchem_arc_interactions_tpu.dycore.solve import step
    from wrfchem_arc_interactions_tpu.models import ideal
    from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh
    from wrfchem_arc_interactions_tpu.parallel.sharded import make_sharded_step

    def run(overlap):
        cfg = Config(
            domain=DomainConfig(nx=16, ny=8, nz=10, dx=500.0, dy=500.0,
                                ztop=10000.0, p_top=26000.0),
            time_control=TimeControl(dt=3.0),
            dynamics=DynamicsConfig(kvdif=0.0, overlap_halo=overlap))
        grid, state = ideal.make_case(cfg, "warm_bubble", amplitude=2.0,
                                      zc=1500.0, xr=2000.0, zr=1200.0,
                                      three_d=True)
        mesh = make_mesh(2, 4)
        sstep, place = make_sharded_step(cfg, grid, mesh, step, 3.0)
        s, g = place(state, grid)
        for _ in range(2):
            s = sstep(s, g)
        return s

    s_on = run(True)
    s_off = run(False)
    # schedule-only difference: band-patch recompute reorders a few ops,
    # so tolerances sit at the f32 roundoff floor of each field magnitude
    # (phi ~ 1e5 -> 1e-4 is ~1 ulp)
    tol = {"u": 1e-5, "v": 1e-5, "w": 1e-5, "t": 1e-5, "mu": 1e-4,
           "ph": 1e-4}
    for name in ("u", "v", "w", "t", "mu", "ph"):
        d = float(jnp.max(jnp.abs(jnp.asarray(s_on[name])
                                  - jnp.asarray(s_off[name]))))
        assert d < tol[name], f"{name}: overlap toggle changed results by {d}"
