"""MXU-banded FV advection: the odd/even-order face reconstructions as
dense banded matmuls.

Round-5 profiling showed the batched scalar-advection chain is VPU
compute-bound, not HBM-bound: a hand-fused Pallas kernel that removes ~8 of
its ~11 HBM passes only reaches parity with XLA (artifacts/
PALLAS_ADV_MULTI_AB.json) because the ~100 elementwise stencil passes per
tracer are the floor.  The escape is the MXU (systolic array, ~30-100x the
VPU's f32 FLOPs): an order-p face reconstruction is a banded convolution
along one axis,

    face_sum[f] = sum_m w_m q[f+m]   ->   q_pad @ W   (W banded, static),

so the 6-point even part and the 5-point dissipation part of flux5/flux3
become TWO matmuls per direction over ALL tracers at once, and the only
remaining VPU work is vel * even - |vel| * diss and the flux divergence.
The banded matrix wastes ~nx/6 of the MXU's multiplies on structural zeros
— irrelevant, the MXU is otherwise idle during advection.

Exactness: fluxes are still computed once per face and then differenced, so
the telescoping-sum conservation property is bitwise intact; the face
values themselves agree with the stencil formulas to f32 dot-product
rounding (HIGHEST-precision dot_general, pinned by tests at rel ~1e-6).

The vertical (eta) direction folds the edge-replicated ghost levels of
advection._zpad into the band matrix rows, and the omega=0 boundary-face
zeroing into zeroed first/last matrix rows.

Canonical reference: dyn_em/module_advect_em.F advect_scalar (the same
flux5/flux3 coefficients; SURVEY.md §2.1 'FV advection').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# face f sits between cells f-1 and f: stencil offsets are cell indices
# f-1+m for m in -2..3 relative to the face, i.e. cells f-3 .. f+2
_EVEN6 = np.array([1.0, -8.0, 37.0, 37.0, -8.0, 1.0]) / 60.0      # qm3..qp2
_DISS5 = np.array([-1.0, 5.0, -10.0, 10.0, -5.0, 1.0]) / 60.0     # sign(+vel)
_EVEN4 = np.array([0.0, -1.0, 7.0, 7.0, -1.0, 0.0]) / 12.0
_DISS3 = np.array([0.0, 1.0, -3.0, 3.0, -1.0, 0.0]) / 12.0
_EVEN2 = np.array([0.0, 0.0, 0.5, 0.5, 0.0, 0.0])
_DISS1 = np.array([0.0, 0.0, -0.5, 0.5, 0.0, 0.0])   # upwind = even2 - |v|*diss1


def _coeffs(order: int):
    if order in (5, 6):
        ev = _EVEN6
    elif order in (3, 4):
        ev = _EVEN4
    elif order in (1, 2):
        ev = _EVEN2
    else:
        raise ValueError(order)
    ds = {5: _DISS5, 3: _DISS3, 1: _DISS1}.get(order)
    return ev, ds


@functools.lru_cache(maxsize=None)
def _band_h(npad: int, nfaces: int, pad: int, order: int, dtype=np.float32):
    """(npad, nfaces) numpy banded matrices (even, diss) for horizontal faces
    of a pad-halo axis (numpy so the lru_cache never captures a tracer)."""
    ev, ds = _coeffs(order)
    We = np.zeros((npad, nfaces), dtype)
    Wd = np.zeros((npad, nfaces), dtype) if ds is not None else None
    for f in range(nfaces):
        for m in range(6):
            row = f + pad - 3 + m
            We[row, f] += ev[m]
            if Wd is not None:
                Wd[row, f] += ds[m]
    return We, Wd


@functools.lru_cache(maxsize=None)
def _band_z(nz: int, order: int, dtype=np.float32):
    """(nz, nz+1) banded matrices for the eta faces, with _zpad edge
    replication folded into the edge rows and faces 0/nz zeroed (omega
    vanishes at the rigid eta boundaries)."""
    ev, ds = _coeffs(order)
    We = np.zeros((nz, nz + 1), dtype)
    Wd = np.zeros((nz, nz + 1), dtype) if ds is not None else None
    for f in range(1, nz):                    # interior faces only
        for m in range(6):
            lev = np.clip(f - 3 + m, 0, nz - 1)   # edge replication
            We[lev, f] += ev[m]
            if Wd is not None:
                Wd[lev, f] += ds[m]
    return We, Wd


_DOT = jax.lax.Precision.HIGHEST


def _mm_last(q, W):
    """Contract the last axis: (..., K) @ (K, N) -> (..., N)."""
    return jax.lax.dot_general(q, W, (((q.ndim - 1,), (0,)), ((), ())),
                               precision=_DOT)


def _mm_axis(q, W, axis):
    """Contract `axis` of q with W's rows, result face axis back in place."""
    out = jax.lax.dot_general(q, W, (((axis % q.ndim,), (0,)), ((), ())),
                              precision=_DOT)
    # dot_general moves the contracted dim's result (N) to the END
    return jnp.moveaxis(out, -1, axis % q.ndim)


def scalar_fluxes_mxu(q_pad, ru_pad, rv_pad, ww, h_order: int, v_order: int,
                      pad: int = 3):
    """Drop-in replacement for advection.scalar_fluxes on (optionally
    batched) pad-halo inputs: q_pad (..., nz, ny+2p, nx+2p), ru_pad/rv_pad
    (nz, ny+2p, nx+2p), ww (nz+1, ny, nx).  Returns (fx, fy, fz) with the
    same shapes/contracts as the stencil path (incl. fz boundary zeroing).
    """
    nz = ww.shape[-3] - 1
    ny = ww.shape[-2]
    nx = ww.shape[-1]
    dtype = q_pad.dtype

    # x faces: 0..nx (nx+1)
    Wxe, Wxd = _band_h(q_pad.shape[-1], nx + 1, pad, h_order)
    qy = q_pad[..., pad:pad + ny, :]
    ex = _mm_last(qy, jnp.asarray(Wxe, dtype))
    vel_x = ru_pad[..., pad:pad + ny, pad:pad + nx + 1]
    if Wxd is None:
        fx = vel_x * ex
    else:
        dx = _mm_last(qy, jnp.asarray(Wxd, dtype))
        fx = vel_x * ex - jnp.abs(vel_x) * dx

    # y faces: 0..ny (ny+1)
    Wye, Wyd = _band_h(q_pad.shape[-2], ny + 1, pad, h_order)
    qx = q_pad[..., pad:pad + nx]
    ey = _mm_axis(qx, jnp.asarray(Wye, dtype), -2)
    vel_y = rv_pad[..., pad:pad + ny + 1, pad:pad + nx]
    if Wyd is None:
        fy = vel_y * ey
    else:
        dy = _mm_axis(qx, jnp.asarray(Wyd, dtype), -2)
        fy = vel_y * ey - jnp.abs(vel_y) * dy

    # eta faces: 0..nz; the vflux sign contract (advection.vflux: transport
    # runs against the eta index, so evaluate with -ww and negate — even
    # part unchanged, dissipation sign flipped)
    Wze, Wzd = _band_z(nz, v_order)
    qi = q_pad[..., pad:pad + ny, pad:pad + nx]
    ez = _mm_axis(qi, jnp.asarray(Wze, dtype), -3)
    if Wzd is None:
        fz = ww * ez
    else:
        dz = _mm_axis(qi, jnp.asarray(Wzd, dtype), -3)
        fz = ww * ez + jnp.abs(ww) * dz
    return fx, fy, fz
