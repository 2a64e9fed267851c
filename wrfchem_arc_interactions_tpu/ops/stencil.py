"""Stencil window helpers over halo-padded arrays.

All horizontal stencil operators in the dycore consume arrays padded by
``PAD`` cells in y and x (the halo region; filled by
`parallel.halo.HaloOps.pad` — physical BCs on a single device, ppermute
exchange + physical BCs at mesh edges under shard_map) and produce
interior-sized results.  ``PAD = 3`` matches the reference's widest halo (the
48/144-point schedules for 5th-order advection; SURVEY.md §2.4 'Generated
halo schedules').

The window helpers return *views* (static slices) that XLA fuses into the
consuming arithmetic — there is no materialised shift, so a chain of
``win``-based operations compiles to one fused stencil loop over the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD = 3


def win(a: jax.Array, dy: int, dx: int, ey: int = 0, ex: int = 0,
        pad: int = PAD) -> jax.Array:
    """Interior window of padded array `a`, shifted by (dy, dx) and extended
    by (ey, ex) points (for face arrays that need n+1 values).

    `a` has shape (..., ny + 2*pad, nx + 2*pad); the result has shape
    (..., ny + ey, nx + ex).  win(a, 0, -1) is "the value one cell to the
    west", i.e. a[j, i-1] aligned with interior cell (j, i).  `pad` is the
    halo width the array was padded with (3 for advection groups, 1 for the
    acoustic-loop groups).
    """
    ny = a.shape[-2] - 2 * pad
    nx = a.shape[-1] - 2 * pad
    j0 = pad + dy
    i0 = pad + dx
    return a[..., j0:j0 + ny + ey, i0:i0 + nx + ex]


def interior(a: jax.Array) -> jax.Array:
    return win(a, 0, 0)


def pad_zero(a: jax.Array) -> jax.Array:
    """Embed an interior-sized array into a PAD-padded array of zeros."""
    pw = [(0, 0)] * (a.ndim - 2) + [(PAD, PAD), (PAD, PAD)]
    return jnp.pad(a, pw)


# ---------------------------------------------------------------------------
# Vertical (z) helpers — never padded, never sharded (SURVEY.md §5.7).
# ---------------------------------------------------------------------------

def dz_faces_to_centers(f: jax.Array) -> jax.Array:
    """(nz+1, ...) w-level values -> (nz, ...) differences f[k+1]-f[k]."""
    return f[1:] - f[:-1]


def avg_z_centers_to_faces(q: jax.Array, fnm: jax.Array, fnp: jax.Array) -> jax.Array:
    """(nz, ...) mass-level values -> (nz+1, ...) w-level values.

    Interior w-level k uses the fnm/fnp weights (stretch-aware, canonical
    start_em.F); boundary w-levels extrapolate linearly like the reference's
    cf1/cf2/cf3 surface extrapolation (simplified to copy for round 1).
    """
    shp = (-1,) + (1,) * (q.ndim - 1)
    # w-level k sits between half-levels k-1 (below) and k (above): the
    # weight of the *upper* point q[k] is fnm[k] = .5*dnw[k-1]/dn[k] (the
    # half-layer on the far side), of the lower q[k-1] is fnp[k].
    interior_faces = fnp[1:].reshape(shp) * q[:-1] + fnm[1:].reshape(shp) * q[1:]
    return jnp.concatenate([q[:1], interior_faces, q[-1:]], axis=0)
