"""Pallas TPU kernel: fused multi-tracer FV scalar advection + update.

THE config-3/4 hot loop (canonical dyn_em/module_advect_em.F advect_scalar /
advect_scalar_pd called per tracer from solve_em's rk_scalar_tend): chemistry
configs advect 44-104 tracers, and the per-tracer XLA chain (fluxes ->
limiter -> divergence -> update) costs ~30 XLA ops x 3 RK stages x n_tracers
— both the dominant share of the measured step time at 100x100x50 (op
overhead, ~11 HBM passes per tracer) and the HLO-size driver behind the
200x200 cold-compile blowup (PERF_EVIDENCE_r4 §4).

This kernel runs the WHOLE per-tracer stage — 5th/3rd-order fluxes, optional
positive-definite limiting (Skamarock 2006, incl. the guaranteed-positive
low-order renormalisation of advection.limit_low_order), flux divergence,
coupled update, clip — in VMEM per (y-slab, tracer) tile:

  HBM traffic/tracer/stage = q slab read + phi_old read + q_new write
  (~3 array passes vs ~11), and the whole tracer loop is ONE XLA op.

Schedule: grid = (n_yslabs, n_tracers), tracer minor.  The stage-constant
wind slabs (ru/rv/ww) are DMA'd once per slab (tracer 0); the per-tracer q
and phi_old slabs are double-buffered across tracer iterations (start t+1's
copy before computing t); the output rides BlockSpec auto-pipelining.

Halo bookkeeping (all arrays arrive over-padded from the wrapper):
  q needs 4 halo cells (PD: the renorm factor r of a ring-1 cell needs
  high-order fluxes there, i.e. q at +-3 beyond it), phi_old needs 2, winds
  ride the q padding, ww needs 2.  The limiter's factor exchanges
  (hx.pad(r, 1) in the XLA path) become in-kernel recomputation on the
  extended region — identical values because the halos are true images.

The formulas are transcribed VERBATIM from dycore/advection.py (same op
order) so the equivalence tests can demand near-ulp agreement; interpret
mode runs the identical kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wrfchem_arc_interactions_tpu.ops.pallas_adv import _flux3, _flux5

K = 4        # q / wind halo width
KP = 2       # phi_old halo width
KW = 2       # ww halo width
TY = 8       # y-slab interior rows (Mosaic sublane-tile alignment unit)


def _flux1(vel, qm1, q0):
    return vel * jnp.where(vel > 0, qm1, q0)


def _zghost(q, n):
    """Edge-replicate n ghost levels along z (advection._zpad semantics)."""
    bot = jnp.concatenate([q[0:1]] * n, axis=0)
    top = jnp.concatenate([q[-1:]] * n, axis=0)
    return jnp.concatenate([bot, q, top], axis=0)


def _vflux(ww_cells, q_cells, order: int, nz: int):
    """Vertical fluxes at faces k = 0..nz for the given cell region.
    ww_cells: (nz+1, r, c) omega at the region's columns; q_cells: (nz, r, c).
    Matches advection.vflux (incl. the -ww upwind-sign contract) with the
    omega=0 boundary-face zeroing applied."""
    if order == 1:
        qe = _zghost(q_cells, 1)
        f = -_flux1(-ww_cells, qe[0:nz + 1], qe[1:nz + 2])
    else:  # order 3
        qe = _zghost(q_cells, 2)
        f = -_flux3(-ww_cells, qe[0:nz + 1], qe[1:nz + 2], qe[2:nz + 3],
                    qe[3:nz + 4])
    zmask = jax.lax.broadcasted_iota(jnp.int32, (nz + 1, 1, 1), 0)
    return jnp.where((zmask == 0) | (zmask == nz), 0.0, f)


def _adv_kernel(q_hbm, phi_hbm, ru_hbm, rv_hbm, ww_hbm, rdnw_ref, meta_ref,
                mu_ref, out_ref, q_s, phi_s, ru_s, rv_s, ww_s, sem_q,
                sem_phi, sem_w, *, nz, ny, nx, nt, pd, clip):
    s = pl.program_id(0)
    t = pl.program_id(1)
    ty = TY
    y0 = s * ty                     # 8-aligned slab origin (all padded arrays)

    def q_dma(slot, tr):
        return pltpu.make_async_copy(
            q_hbm.at[tr, :, pl.ds(y0, q_s.shape[2]), :], q_s.at[slot],
            sem_q.at[slot])

    def phi_dma(slot, tr):
        return pltpu.make_async_copy(
            phi_hbm.at[tr, :, pl.ds(y0, phi_s.shape[2]), :], phi_s.at[slot],
            sem_phi.at[slot])

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(ru_hbm.at[:, pl.ds(y0, ru_s.shape[1]), :],
                              ru_s, sem_w.at[0]).start()
        pltpu.make_async_copy(rv_hbm.at[:, pl.ds(y0, rv_s.shape[1]), :],
                              rv_s, sem_w.at[1]).start()
        pltpu.make_async_copy(ww_hbm.at[:, pl.ds(y0, ww_s.shape[1]), :],
                              ww_s, sem_w.at[2]).start()
        q_dma(0, t).start()
        phi_dma(0, t).start()

    @pl.when(t + 1 < nt)
    def _():
        q_dma((t + 1) % 2, t + 1).start()
        phi_dma((t + 1) % 2, t + 1).start()

    slot = t % 2
    q_dma(slot, t).wait()
    phi_dma(slot, t).wait()

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(ru_hbm.at[:, pl.ds(y0, ru_s.shape[1]), :],
                              ru_s, sem_w.at[0]).wait()
        pltpu.make_async_copy(rv_hbm.at[:, pl.ds(y0, rv_s.shape[1]), :],
                              rv_s, sem_w.at[1]).wait()
        pltpu.make_async_copy(ww_hbm.at[:, pl.ds(y0, ww_s.shape[1]), :],
                              ww_s, sem_w.at[2]).wait()

    rdx = meta_ref[0]
    rdy = meta_ref[1]
    dts = meta_ref[2]
    # dynamic-slot reads must be pl.ds slices (a traced integer index
    # lowers as an unsupported gather in Mosaic)
    q = q_s[pl.ds(slot, 1)][0]       # (nz, ty+2K, NXQ); cell j -> row j+K
    phi = phi_s[pl.ds(slot, 1)][0]   # (nz, ty+2KP(+align), NXP); cell j -> row j+KP
    ru = ru_s[:]                     # face i -> col i+K
    rv = rv_s[:]
    ww = ww_s[:]                     # cell j -> row j+KW, col i+KW
    rdnw = rdnw_ref[:]               # (nz, 128) z-metric broadcast along lanes

    # ---- windows -------------------------------------------------------
    # `ring` extends the computed region symmetrically beyond the slab
    # interior; all helpers index cells/faces of the (ty + 2*ring,
    # nx + 2*ring) region whose faces carry one extra point (+e).
    def qc(dy, dx, ring, ey=0, ex=0):
        r0 = K + dy - ring
        c0 = K + dx - ring
        return q[:, r0:r0 + ty + 2 * ring + ey, c0:c0 + nx + 2 * ring + ex]

    def phic(dy, dx, ring, ey=0, ex=0):
        r0 = KP + dy - ring
        c0 = KP + dx - ring
        return phi[:, r0:r0 + ty + 2 * ring + ey, c0:c0 + nx + 2 * ring + ex]

    def ruf(ring):                   # x-face velocities of the ring region
        r0, c0 = K - ring, K - ring
        return ru[:, r0:r0 + ty + 2 * ring, c0:c0 + nx + 2 * ring + 1]

    def rvf(ring):                   # y-face velocities
        r0, c0 = K - ring, K - ring
        return rv[:, r0:r0 + ty + 2 * ring + 1, c0:c0 + nx + 2 * ring]

    def wwc(ring):                   # omega over the ring region's cells
        r0, c0 = KW - ring, KW - ring
        return ww[:, r0:r0 + ty + 2 * ring, c0:c0 + nx + 2 * ring]

    def hflux_x(ring, order):
        # NOTE: windows are built per order — a 6-point stencil at ring 2
        # would index before the slab start
        vel = ruf(ring)
        if order == 1:
            return _flux1(vel, qc(0, -1, ring, ex=1), qc(0, 0, ring, ex=1))
        return _flux5(vel, *(qc(0, m, ring, ex=1)
                             for m in (-3, -2, -1, 0, 1, 2)))

    def hflux_y(ring, order):
        vel = rvf(ring)
        if order == 1:
            return _flux1(vel, qc(-1, 0, ring, ey=1), qc(0, 0, ring, ey=1))
        return _flux5(vel, *(qc(m, 0, ring, ey=1)
                             for m in (-3, -2, -1, 0, 1, 2)))

    def rd(cols):                    # (nz, 1, cols) z metric
        # explicit reshape: None-indexing lowers as an unsupported gather
        return rdnw[:, :cols].reshape(rdnw.shape[0], 1, cols)

    def div(fx, fy, fz, ring):
        w = nx + 2 * ring
        return -((fx[:, :, 1:] - fx[:, :, :-1]) * rdx
                 + (fy[:, 1:, :] - fy[:, :-1, :]) * rdy
                 + (fz[1:] - fz[:-1]) * rd(w))

    if not pd:
        fx = hflux_x(0, 5)
        fy = hflux_y(0, 5)
        fz = _vflux(wwc(0), qc(0, 0, 0), 3, nz)
        tend = div(fx, fy, fz, 0)
        qn = (phic(0, 0, 0) + dts * tend) / mu_ref[:, :].reshape(1, ty, -1)
        if clip:
            qn = jnp.maximum(qn, 0.0)
        out_ref[0] = qn
        return

    # ---- positive-definite path (advection.pd_limit, transcribed) ------
    # low-order fluxes + donor renormalisation on the ring-2 region (the
    # widest place a ring-1 cell's transported solution reaches)
    lx2 = hflux_x(2, 1)
    ly2 = hflux_y(2, 1)
    lz2 = _vflux(wwc(2), qc(0, 0, 2), 1, nz)
    w2 = nx + 4
    out_x = jnp.maximum(lx2[:, :, 1:], 0.0) - jnp.minimum(lx2[:, :, :-1], 0.0)
    out_y = jnp.maximum(ly2[:, 1:, :], 0.0) - jnp.minimum(ly2[:, :-1, :], 0.0)
    up_c = -lz2[1:] * rd(w2)
    lo_c = lz2[:-1] * rd(w2)
    out_z = jnp.maximum(-up_c, 0.0) + jnp.maximum(-lo_c, 0.0)
    p_out = dts * ((out_x * rdx + out_y * rdy) + out_z)
    phi2 = phic(0, 0, 2)
    r_lo = jnp.where(p_out > 0.0,
                     jnp.minimum(1.0, jnp.maximum(phi2, 0.0)
                                 / jnp.maximum(p_out, 1e-30)), 1.0)

    # scale each ring-1 face's low-order flux by its donor's factor; r_lo
    # windows: face f sits between cells f-1, f of the ring-2 indexing
    def rl(dy, dx, ey=0, ex=0):      # ring-1 cell window of r_lo (+1 inside)
        r0, c0 = 1 + dy, 1 + dx
        return r_lo[:, r0:r0 + ty + 2 + ey, c0:c0 + nx + 2 + ex]

    lx1 = lx2[:, 1:-1, 1:-1]         # ring-1 faces (x: nx+3 values)
    ly1 = ly2[:, 1:-1, 1:-1]
    lz1 = lz2[:, 1:-1, 1:-1]
    lx1 = lx1 * jnp.where(lx1 > 0, rl(0, -1, ex=1), rl(0, 0, ex=1))
    ly1 = ly1 * jnp.where(ly1 > 0, rl(-1, 0, ey=1), rl(0, 0, ey=1))
    r1 = rl(0, 0)
    r1e = _zghost(r1, 1)
    lz1 = lz1 * jnp.where(lz1 > 0, r1e[1:], r1e[:-1])

    phi_td = phic(0, 0, 1) + dts * div(lx1, ly1, lz1, 1)
    phi_td = jnp.maximum(phi_td, 0.0)

    # high-order and antidiffusive fluxes on the ring-1 faces
    ax = hflux_x(1, 5) - lx1
    ay = hflux_y(1, 5) - ly1
    az = _vflux(wwc(1), qc(0, 0, 1), 3, nz) - lz1
    w1 = nx + 2
    out_x = jnp.maximum(ax[:, :, 1:], 0.0) - jnp.minimum(ax[:, :, :-1], 0.0)
    out_y = jnp.maximum(ay[:, 1:, :], 0.0) - jnp.minimum(ay[:, :-1, :], 0.0)
    up_c = -az[1:] * rd(w1)
    lo_c = az[:-1] * rd(w1)
    out_z = jnp.maximum(-up_c, 0.0) + jnp.maximum(-lo_c, 0.0)
    p_out = dts * ((out_x * rdx + out_y * rdy) + out_z)
    r = jnp.where(p_out > 0.0,
                  jnp.minimum(1.0, phi_td / jnp.maximum(p_out, 1e-30)), 1.0)

    def rw(dy, dx, ey=0, ex=0):      # interior cell window of r (+1 inside)
        r0, c0 = 1 + dy, 1 + dx
        return r[:, r0:r0 + ty + ey, c0:c0 + nx + ex]

    ax0 = ax[:, 1:-1, 1:-1]          # interior faces
    ay0 = ay[:, 1:-1, 1:-1]
    az0 = az[:, 1:-1, 1:-1]
    ax0 = ax0 * jnp.where(ax0 > 0, rw(0, -1, ex=1), rw(0, 0, ex=1))
    ay0 = ay0 * jnp.where(ay0 > 0, rw(-1, 0, ey=1), rw(0, 0, ey=1))
    r0 = rw(0, 0)
    r0e = _zghost(r0, 1)
    az0 = az0 * jnp.where(az0 > 0, r0e[1:], r0e[:-1])

    fx = lx1[:, 1:-1, 1:-1] + ax0
    fy = ly1[:, 1:-1, 1:-1] + ay0
    fz = lz1[:, 1:-1, 1:-1] + az0
    tend = div(fx, fy, fz, 0)
    qn = (phic(0, 0, 0) + dts * tend) / mu_ref[:, :].reshape(1, ty, -1)
    if clip:
        qn = jnp.maximum(qn, 0.0)
    out_ref[0] = qn


def _align(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit,
                   static_argnames=("pd", "clip", "interpret"))
def advect_tracers_fused(q4, phi2, ru4, rv4, ww2, mu_new, rdnw, rdx, rdy,
                         dts, pd: bool = False, clip: bool = False,
                         interpret: bool = False):
    """Fused per-stage tracer advection + update.

    q4:   (nt, nz, ny+2K, nx+2K)   tracers, halo K=4 (hx.pad width 4)
    phi2: (nt, nz, ny+2KP, nx+2KP) coupled t0 scalars, halo 2
    ru4/rv4: (nz, ny+2K, nx+2K)    stage mass fluxes at x/y faces, halo 4
    ww2:  (nz+1, ny+2KW, nx+2KW)   stage omega, halo 2
    mu_new: (ny, nx) new-stage column mass; rdnw: (nz,) eta metric.
    Returns q_new (nt, nz, ny, nx).
    """
    nt, nz, nyq, nxq = q4.shape
    ny, nx = nyq - 2 * K, nxq - 2 * K
    ty = TY
    ny8 = _align(ny, ty)
    n_slabs = ny8 // ty

    if interpret:
        nxq_al, nxp_al, nxw_al, nxo_al = (nxq, nx + 2 * KP, nx + 2 * KW, nx)
        slab_q = ty + 2 * K
        slab_p = ty + 2 * KP
        slab_w = ty + 2 * KW
    else:
        nxq_al = _align(nxq, 128)
        nxp_al = _align(nx + 2 * KP, 128)
        nxw_al = _align(nx + 2 * KW, 128)
        nxo_al = nx
        slab_q = _align(ty + 2 * K, 8)
        slab_p = _align(ty + 2 * KP, 8)
        slab_w = _align(ty + 2 * KW, 8)

    def ypad(a, rows_needed, cols_needed):
        extra_y = rows_needed - a.shape[-2]
        extra_x = cols_needed - a.shape[-1]
        if extra_y or extra_x:
            pw = [(0, 0)] * (a.ndim - 2) + [(0, extra_y), (0, extra_x)]
            a = jnp.pad(a, pw, mode="edge")
        return a

    q4 = ypad(q4, (n_slabs - 1) * ty + slab_q, nxq_al)
    phi2 = ypad(phi2, (n_slabs - 1) * ty + slab_p, nxp_al)
    ru4 = ypad(ru4, (n_slabs - 1) * ty + slab_q, nxq_al)
    rv4 = ypad(rv4, (n_slabs - 1) * ty + slab_q, nxq_al)
    ww2 = ypad(ww2, (n_slabs - 1) * ty + slab_w, nxw_al)
    rdnw_cols = (nx + 4) if interpret else _align(nx + 4, 128)
    rdnw_b = jnp.broadcast_to(
        jnp.asarray(rdnw, q4.dtype).reshape(-1, 1), (nz, rdnw_cols))
    meta = jnp.asarray([rdx, rdy, dts], q4.dtype)
    mu8 = ypad(mu_new, ny8, nxo_al)

    kern = functools.partial(_adv_kernel, nz=nz, ny=ny, nx=nx, nt=nt,
                             pd=pd, clip=clip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_slabs, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # q4
            pl.BlockSpec(memory_space=pltpu.ANY),      # phi2
            pl.BlockSpec(memory_space=pltpu.ANY),      # ru4
            pl.BlockSpec(memory_space=pltpu.ANY),      # rv4
            pl.BlockSpec(memory_space=pltpu.ANY),      # ww2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # rdnw (nz, lanes)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # meta
            pl.BlockSpec((ty, nxo_al), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM),     # mu_new
        ],
        out_specs=pl.BlockSpec((1, nz, ty, nxo_al), lambda s, t: (t, 0, s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nz, slab_q, nxq_al), q4.dtype),
            pltpu.VMEM((2, nz, slab_p, nxp_al), q4.dtype),
            pltpu.VMEM((nz, slab_q, nxq_al), q4.dtype),
            pltpu.VMEM((nz, slab_q, nxq_al), q4.dtype),
            pltpu.VMEM((nz + 1, slab_w, nxw_al), q4.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, nz, ny8, nxo_al), q4.dtype),
        interpret=interpret,
    )(q4, phi2, ru4, rv4, ww2, rdnw_b, meta, mu8)
    return out[:, :, :ny, :nx]
