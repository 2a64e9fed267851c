"""Halo exchange — the TPU-native RSL_LITE (SURVEY.md §2.6-1, §5.8).

One interface, two execution paths:

- **Single device / global arrays**: halos are physical boundary conditions,
  materialised with `jnp.pad` (wrap for periodic, edge for open,
  reflect for symmetric).
- **Inside `shard_map` over the 2D mesh**: halos come from neighbor blocks
  via `jax.lax.ppermute` (X phase then Y phase, like RSL_LITE's
  RSL_LITE_EXCH_X/Y), with physical BCs overwriting the outer halos of
  mesh-edge blocks for non-periodic domains.  The corner halo cells are
  correct because the Y exchange operates on the already-X-padded array
  (the standard two-phase trick the reference also uses).

`pad_many` packs same-shaped fields into one stacked exchange — the analog
of RSL_LITE's packed multi-field message buffers — so one RK stage's halo
group costs two ppermutes per mesh axis regardless of field count.

Numerics consume the padded arrays through `ops.stencil.win` and produce
interior-sized results; there is no separate "unpad".
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wrfchem_arc_interactions_tpu.config.namelist import BCKind
from wrfchem_arc_interactions_tpu.parallel.mesh import AXIS_X, AXIS_Y


def _bc_mode(bc: BCKind) -> str:
    return {BCKind.PERIODIC: "wrap", BCKind.OPEN: "edge", BCKind.SYMMETRIC: "reflect"}[bc]


def _bc_strip(a: jax.Array, axis: int, width: int, bc: BCKind, side: str) -> jax.Array:
    """Physical-boundary halo fill for the `side` ('lo'|'hi') of `axis`."""
    n = a.shape[axis]
    idx = [slice(None)] * a.ndim
    if bc == BCKind.OPEN:
        idx[axis] = slice(0, 1) if side == "lo" else slice(n - 1, n)
        strip = a[tuple(idx)]
        reps = [1] * a.ndim
        reps[axis] = width
        return jnp.tile(strip, reps)
    if bc == BCKind.SYMMETRIC:
        idx[axis] = slice(0, width) if side == "lo" else slice(n - width, n)
        return jnp.flip(a[tuple(idx)], axis=axis)
    # periodic handled by the wraparound ppermute links; never called
    raise ValueError(bc)


@dataclasses.dataclass(frozen=True)
class HaloOps:
    """Boundary/halo context threaded through the dycore.

    ``mesh_y``/``mesh_x`` are the mesh extents; when 1 the axis is not
    decomposed and padding is purely physical-BC.  ``sharded=True`` means we
    are executing inside shard_map and must ppermute on decomposed axes.
    """

    bc_x: BCKind = BCKind.PERIODIC
    bc_y: BCKind = BCKind.PERIODIC
    mesh_y: int = 1
    mesh_x: int = 1
    sharded: bool = False

    # -- single-axis pad ----------------------------------------------------

    def _pad_axis_local(self, a: jax.Array, axis: int, width: int, bc: BCKind) -> jax.Array:
        pw = [(0, 0)] * a.ndim
        pw[axis] = (width, width)
        return jnp.pad(a, pw, mode=_bc_mode(bc))

    def _pad_axis_sharded(self, a: jax.Array, axis: int, width: int, bc: BCKind,
                          axis_name: str, nmesh: int) -> jax.Array:
        idx_lo = [slice(None)] * a.ndim
        idx_hi = [slice(None)] * a.ndim
        idx_lo[axis] = slice(0, width)
        idx_hi[axis] = slice(a.shape[axis] - width, a.shape[axis])
        lo_strip = a[tuple(idx_lo)]
        hi_strip = a[tuple(idx_hi)]
        fwd = [(i, (i + 1) % nmesh) for i in range(nmesh)]   # send toward +axis
        bwd = [(i, (i - 1) % nmesh) for i in range(nmesh)]   # send toward -axis
        # my low halo = high strip of my -1 neighbor; my high halo = low strip of +1
        from_lo = lax.ppermute(hi_strip, axis_name, fwd)
        from_hi = lax.ppermute(lo_strip, axis_name, bwd)
        if bc != BCKind.PERIODIC:
            i_mesh = lax.axis_index(axis_name)
            from_lo = jnp.where(i_mesh == 0, _bc_strip(a, axis, width, bc, "lo"), from_lo)
            from_hi = jnp.where(i_mesh == nmesh - 1, _bc_strip(a, axis, width, bc, "hi"), from_hi)
        return jnp.concatenate([from_lo, a, from_hi], axis=axis)

    def _pad_axis(self, a: jax.Array, axis: int, width: int, bc: BCKind,
                  axis_name: str, nmesh: int) -> jax.Array:
        if self.sharded and nmesh > 1:
            return self._pad_axis_sharded(a, axis, width, bc, axis_name, nmesh)
        return self._pad_axis_local(a, axis, width, bc)

    # -- public API ---------------------------------------------------------

    def pad(self, a: jax.Array, width: int = 3) -> jax.Array:
        """Pad the trailing (y, x) axes by `width` halo cells (X then Y phase
        so corners are filled)."""
        a = self._pad_axis(a, a.ndim - 1, width, self.bc_x, AXIS_X, self.mesh_x)
        a = self._pad_axis(a, a.ndim - 2, width, self.bc_y, AXIS_Y, self.mesh_y)
        return a

    def pad_many(self, fields: Dict[str, jax.Array], width: int = 3) -> Dict[str, jax.Array]:
        """Fused multi-field exchange: stack same-shaped fields, pad once."""
        groups: Dict[Tuple[Tuple[int, ...], str], List[str]] = {}
        for name, a in fields.items():
            groups.setdefault((tuple(a.shape), str(a.dtype)), []).append(name)
        out: Dict[str, jax.Array] = {}
        for (_, _), names in groups.items():
            if len(names) == 1:
                out[names[0]] = self.pad(fields[names[0]], width)
                continue
            stacked = jnp.stack([fields[n] for n in names], axis=0)
            padded = self.pad(stacked, width)
            for i, n in enumerate(names):
                out[n] = padded[i]
        return out

    # -- global reductions (diagnostics / CFL guards) -----------------------

    def psum(self, x):
        if self.sharded:
            if self.mesh_x > 1:
                x = lax.psum(x, AXIS_X)
            if self.mesh_y > 1:
                x = lax.psum(x, AXIS_Y)
        return x

    def pmax(self, x):
        if self.sharded:
            if self.mesh_x > 1:
                x = lax.pmax(x, AXIS_X)
            if self.mesh_y > 1:
                x = lax.pmax(x, AXIS_Y)
        return x
