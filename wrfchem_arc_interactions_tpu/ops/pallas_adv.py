"""Pallas TPU kernel: fused 5th/3rd-order FV scalar advection tendency.

The jnp path (`dycore/advection.py::advect_scalar`, canonical
dyn_em/module_advect_em.F advect_scalar) materialises the three face-flux
arrays (fx, fy, fz) in HBM before the divergence consumes them — each flux
array is written once and read twice (the telescoping difference), so one
tendency costs ~11 HBM array passes.  This kernel fuses reconstruction +
flux + divergence into one VMEM-resident pass per y-slab: 4 reads + 1 write.

Layout/schedule:

- grid = (num_y_slabs,); each program DMAs a (nz, TY+2*PAD, nxp) slab of the
  PAD-padded inputs HBM -> VMEM (overlapping slabs — why the inputs stay in
  `pltpu.ANY` and are copied manually rather than blocked by BlockSpec,
  which cannot express overlap), computes the fused stencil on the VPU, and
  writes the (nz, TY, nx) tendency slab.
- The x stencil uses the padded x axis directly (last dim, lane axis); the
  z (3rd-order) stencil is static shifts along the leading axis.
- All arithmetic matches `advection.flux5`/`flux3` exactly (same operation
  order), so the equivalence test demands near-bitwise agreement.

`advect_scalar_fused` is the public entry: it dispatches to this kernel on
TPU for the default (h=5, v=3) orders and falls back to the jnp path
elsewhere (CPU tests, other orders) — same contract either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wrfchem_arc_interactions_tpu.ops.stencil import PAD

# flux formulas duplicated VERBATIM from advection.py flux5/6, flux3/4
# (same operation order so the fused kernel agrees with the jnp path to the
# last ulp rather than to a tolerance)

def _flux5(vel, qm3, qm2, qm1, q0, qp1, qp2):
    f6 = vel * (37.0 * (q0 + qm1) - 8.0 * (qp1 + qm2) + (qp2 + qm3)) * (1.0 / 60.0)
    return f6 - jnp.abs(vel) * (
        10.0 * (q0 - qm1) - 5.0 * (qp1 - qm2) + (qp2 - qm3)) * (1.0 / 60.0)


def _flux3(vel, qm2, qm1, q0, qp1):
    f4 = vel * (7.0 * (q0 + qm1) - (qp1 + qm2)) * (1.0 / 12.0)
    return f4 - jnp.abs(vel) * (
        3.0 * (q0 - qm1) - (qp1 - qm2)) * (1.0 / 12.0)


def _adv_kernel(q_hbm, ru_hbm, rv_hbm, ww_hbm, rdnw_ref, meta_ref, out_ref,
                q_s, ru_s, rv_s, ww_s, sem):
    """One y-slab of the fused tendency. meta_ref (SMEM): [rdx, rdy]."""
    i = pl.program_id(0)
    ty = out_ref.shape[1]
    y0 = i * ty                                  # slab origin in padded coords
    # Mosaic HBM slices must be 8-row (sublane-tile) aligned: the slab
    # LENGTH is the scratch row count (ty + 2*PAD rounded up to 8; the
    # wrapper over-pads the inputs so the last slab stays in bounds), and
    # y0 = i*ty is aligned because ty is a multiple of 8 on hardware.
    slab = q_s.shape[1]

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(y0, slab), :], q_s, sem.at[0])
    cp_u = pltpu.make_async_copy(
        ru_hbm.at[:, pl.ds(y0, slab), :], ru_s, sem.at[1])
    cp_v = pltpu.make_async_copy(
        rv_hbm.at[:, pl.ds(y0, slab), :], rv_s, sem.at[2])
    cp_w = pltpu.make_async_copy(
        ww_hbm.at[:, pl.ds(y0, ww_s.shape[1]), :], ww_s, sem.at[3])
    cp_q.start(); cp_u.start(); cp_v.start(); cp_w.start()
    cp_q.wait(); cp_u.wait(); cp_v.wait(); cp_w.wait()

    rdx = meta_ref[0]
    rdy = meta_ref[1]
    nz = out_ref.shape[0]
    # true interior width from the output block (the scratch x axis is
    # over-padded to a 128-lane multiple for DMA alignment)
    nx = out_ref.shape[2]

    q = q_s[:]                                    # (nz, ty+6, nxp)
    qc = q[:, PAD:PAD + ty, :]                    # central y rows

    # ---- x flux divergence: faces f = 0..nx at x offsets ---------------
    # face f (between padded cols f+PAD-1, f+PAD); need f = 0..nx
    def xs(m, e):                                 # q shifted m, width nx+e
        return qc[:, :, PAD + m:PAD + m + nx + e]

    vel_x = ru_s[:, PAD:PAD + ty, PAD:PAD + nx + 1]
    fx = _flux5(vel_x, xs(-3, 1), xs(-2, 1), xs(-1, 1), xs(0, 1), xs(1, 1),
                xs(2, 1))
    div = (fx[:, :, 1:] - fx[:, :, :-1]) * rdx

    # ---- y flux divergence: faces at y offsets -------------------------
    def ys(m, e):                                 # width ty+e rows
        return q[:, PAD + m:PAD + m + ty + e, PAD:PAD + nx]

    vel_y = rv_s[:, PAD:PAD + ty + 1, PAD:PAD + nx]
    fy = _flux5(vel_y, ys(-3, 1), ys(-2, 1), ys(-1, 1), ys(0, 1), ys(1, 1),
                ys(2, 1))
    div = div + (fy[:, 1:, :] - fy[:, :-1, :]) * rdy

    # ---- z flux divergence (3rd order, edge-replicated ghosts) ---------
    # interior faces k = 1..nz-1 between levels k-1, k; boundary faces 0.
    qi = qc[:, :, PAD:PAD + nx]
    # ghost-padded along z by edge replication (advection._zpad semantics)
    top = qi[nz - 1:nz]
    bot = qi[0:1]
    qe = jnp.concatenate([bot, bot, qi, top, top], axis=0)  # (nz+4, ...)
    # face k (k = 0..nz): qm2..qp1 = qe[k], qe[k+1], qe[k+2], qe[k+3]
    wfull = ww_s[:, :, :nx]                       # (nz+1, ty, nx)
    # index-space upwinding: eta decreases with k, so evaluate the odd-order
    # formula with -ww and negate (advection.vflux sign contract)
    fz = -_flux3(-wfull, qe[0:nz + 1], qe[1:nz + 2], qe[2:nz + 3],
                 qe[3:nz + 4])
    # omega = 0 at the rigid eta boundaries
    zmask = jax.lax.broadcasted_iota(jnp.int32, (nz + 1, 1, 1), 0)
    fz = jnp.where((zmask == 0) | (zmask == nz), 0.0, fz)
    div = div + (fz[1:] - fz[:-1]) * rdnw_ref[:][:, None, :]

    out_ref[:] = -div


def _pick_ty(ny: int) -> int:
    for ty in (8, 4, 2, 1):
        if ny % ty == 0:
            return ty
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def advect_scalar_5_3(q_pad, ru_pad, rv_pad, ww, rdnw, rdx, rdy,
                      interpret: bool = False):
    """Fused tendency of a mass-point scalar, 5th-order horizontal /
    3rd-order vertical (the ARW default).  q_pad/ru_pad/rv_pad are
    PAD-padded (nz, ny+6, nx+6); ww is (nz+1, ny, nx).  Returns (nz, ny, nx).
    """
    nz, nyp, nxp = q_pad.shape
    ny, nx = nyp - 2 * PAD, nxp - 2 * PAD
    if interpret:
        ty = _pick_ty(ny)
        ny8 = ny
        slab8 = ty + 2 * PAD
        y_extra = 0
    else:
        # Mosaic DMA slices must be (8, 128)-tile aligned along the
        # sublane (y) axis: fix ty = 8, round the interior row count up to
        # a multiple of 8 (edge-padded garbage rows, sliced off below),
        # and round the copied slab length ty + 2*PAD up to 16.
        ty = 8
        ny8 = -(-ny // ty) * ty
        slab8 = -(-(ty + 2 * PAD) // 8) * 8
        y_extra = (ny8 - ny) + (slab8 - (ty + 2 * PAD))
    # lane-axis (x) DMA alignment: the copied slabs' last dim must be a
    # 128 multiple on hardware
    nxp_al = nxp if interpret else -(-nxp // 128) * 128
    nxw_al = nx if interpret else -(-nx // 128) * 128
    x_extra = nxp_al - nxp
    if y_extra or x_extra:
        pw = [(0, 0), (0, y_extra), (0, x_extra)]
        q_pad = jnp.pad(q_pad, pw, mode="edge")
        ru_pad = jnp.pad(ru_pad, pw, mode="edge")
        rv_pad = jnp.pad(rv_pad, pw, mode="edge")
    if ny8 != ny or nxw_al != nx:
        ww = jnp.pad(ww, [(0, 0), (0, ny8 - ny), (0, nxw_al - nx)],
                     mode="edge")
    meta = jnp.asarray([rdx, rdy], q_pad.dtype)
    # (nz, nx) layout keeps the lane axis wide (a (nz,1,1) array would tile
    # terribly in VMEM)
    rdnw2 = jnp.broadcast_to(jnp.asarray(rdnw, q_pad.dtype).reshape(-1, 1),
                             (nz, nx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ny8 // ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # q_pad
            pl.BlockSpec(memory_space=pltpu.ANY),      # ru_pad
            pl.BlockSpec(memory_space=pltpu.ANY),      # rv_pad
            pl.BlockSpec(memory_space=pltpu.ANY),      # ww
            pl.BlockSpec(memory_space=pltpu.VMEM),     # rdnw (nz, nx)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # meta
        ],
        out_specs=pl.BlockSpec((nz, ty, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nz, slab8, nxp_al), q_pad.dtype),
            pltpu.VMEM((nz, slab8, nxp_al), q_pad.dtype),
            pltpu.VMEM((nz, slab8, nxp_al), q_pad.dtype),
            pltpu.VMEM((nz + 1, ty, nxw_al), q_pad.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        _adv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny8, nx), q_pad.dtype),
        interpret=interpret,
    )(q_pad, ru_pad, rv_pad, ww, rdnw2, meta)
    return out[:, :ny, :]


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
