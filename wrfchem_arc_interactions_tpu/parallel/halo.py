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
    # SPECIFIED halos are edge-replicated: the outermost row is pinned to the
    # boundary data post-step (models/lateral_bc.py), so the halo beyond it
    # only needs a consistent extrapolation, exactly like OPEN
    return {BCKind.PERIODIC: "wrap", BCKind.OPEN: "edge",
            BCKind.SYMMETRIC: "reflect", BCKind.SPECIFIED: "edge"}[bc]


def _bc_strip(a: jax.Array, axis: int, width: int, bc: BCKind, side: str) -> jax.Array:
    """Physical-boundary halo fill for the `side` ('lo'|'hi') of `axis`."""
    n = a.shape[axis]
    idx = [slice(None)] * a.ndim
    if bc in (BCKind.OPEN, BCKind.SPECIFIED):
        # SPECIFIED halos are edge-replicated like OPEN: the outermost row is
        # pinned to boundary data post-step (models/lateral_bc.py), so the
        # halo beyond it only needs a consistent extrapolation (same mapping
        # as _bc_mode's SPECIFIED->'edge')
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
        if a.shape[axis] < width:
            raise ValueError(
                f"block extent {a.shape[axis]} on axis {axis} is smaller than "
                f"the halo width {width}: decompose fewer ways or enlarge the "
                f"domain (RSL_LITE's min-patch-size rule)")
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

    # -- overlapped halo exchange (comm/compute overlap; SURVEY.md §7.3-2) --
    #
    # The classic split-stencil schedule: issue BOTH axis exchanges up
    # front from the *unpadded* array (concurrent, unlike pad()'s X-then-Y
    # phases), compute the stencil over the whole block with a locally
    # edge-replicated pad (garbage near block edges, but independent of the
    # collectives so XLA's latency-hiding scheduler runs it while the
    # ppermutes are in flight), then recompute the thin edge bands from the
    # true halos and patch them in.  Because the two exchanges never see
    # each other, the padded array's CORNER cells are garbage — callers must
    # be plus-shaped stencils (every FV flux/divergence/gradient here is:
    # x-terms use x-offsets only, y-terms y-offsets only).  Stencils with
    # diagonal dependence (e.g. deformation cross-derivatives) must keep
    # using pad()/pad_many().

    def exchange_start(self, a: jax.Array, width: int):
        """Kick off concurrent lo/hi strip exchanges on both axes.

        Returns ((from_lo_y, from_hi_y), (from_lo_x, from_hi_x)) where
        entries are None for non-decomposed axes (handled locally at
        finish time)."""
        out = []
        for axis, bc, axis_name, nmesh in (
                (a.ndim - 2, self.bc_y, AXIS_Y, self.mesh_y),
                (a.ndim - 1, self.bc_x, AXIS_X, self.mesh_x)):
            if not (self.sharded and nmesh > 1):
                out.append(None)
                continue
            idx_lo = [slice(None)] * a.ndim
            idx_hi = [slice(None)] * a.ndim
            idx_lo[axis] = slice(0, width)
            idx_hi[axis] = slice(a.shape[axis] - width, a.shape[axis])
            fwd = [(i, (i + 1) % nmesh) for i in range(nmesh)]
            bwd = [(i, (i - 1) % nmesh) for i in range(nmesh)]
            from_lo = lax.ppermute(a[tuple(idx_hi)], axis_name, fwd)
            from_hi = lax.ppermute(a[tuple(idx_lo)], axis_name, bwd)
            if bc != BCKind.PERIODIC:
                i_mesh = lax.axis_index(axis_name)
                from_lo = jnp.where(i_mesh == 0,
                                    _bc_strip(a, axis, width, bc, "lo"), from_lo)
                from_hi = jnp.where(i_mesh == nmesh - 1,
                                    _bc_strip(a, axis, width, bc, "hi"), from_hi)
            out.append((from_lo, from_hi))
        return tuple(out)

    def exchange_finish(self, a: jax.Array, strips, width: int) -> jax.Array:
        """Assemble the padded array from in-flight strips.  Corner halo
        cells are edge-replicated GARBAGE (see class comment): only valid
        for plus-shaped stencils."""
        strips_y, strips_x = strips
        # X axis first (strips span the unpadded y range)
        axis = a.ndim - 1
        if strips_x is None:
            a = self._pad_axis_local(a, axis, width, self.bc_x)
        else:
            a = jnp.concatenate([strips_x[0], a, strips_x[1]], axis=axis)
        # Y axis: true strips cover the unpadded x range; extend over the new
        # x halos with edge replication (the garbage corners)
        axis = a.ndim - 2
        if strips_y is None:
            return self._pad_axis_local(a, axis, width, self.bc_y)
        pw = [(0, 0)] * a.ndim
        pw[a.ndim - 1] = (width, width)
        lo = jnp.pad(strips_y[0], pw, mode="edge")
        hi = jnp.pad(strips_y[1], pw, mode="edge")
        return jnp.concatenate([lo, a, hi], axis=axis)

    def local_pad(self, a: jax.Array, width: int) -> jax.Array:
        """Edge-replicated local pad: correct in the block interior, garbage
        within `width` of block edges; used for the bulk pass of
        overlap_stencil (independent of any collective)."""
        pw = [(0, 0)] * a.ndim
        pw[a.ndim - 1] = (width, width)
        pw[a.ndim - 2] = (width, width)
        return jnp.pad(a, pw, mode="edge")


def overlap_stencil(hx: HaloOps, fields: Dict[str, jax.Array], width: int,
                    fn, consts: Optional[Dict[str, jax.Array]] = None,
                    overlap: bool = True):
    """Evaluate a plus-shaped stencil with halo comm overlapped by compute.

    ``fn(padded_fields, consts) -> pytree`` must be shape-polymorphic in the
    trailing (y, x) axes: given fields padded by `width` and interior-sized
    consts, it returns interior-sized outputs.  Schedule:

      1. start concurrent X/Y strip ppermutes for every field,
      2. run ``fn`` over the whole block with local (garbage-edge) pads —
         XLA overlaps this bulk work with the in-flight collectives,
      3. re-run ``fn`` on four thin slabs built from the true halos and
         patch the `width`-wide output bands.

    On a single device (or unsharded axis pair) it degenerates to one padded
    ``fn`` call.  CORNERS of the padded arrays are garbage — ``fn`` must be
    a plus-shaped stencil (x-terms use x-offsets only, y-terms y-offsets
    only), the shape of every FV flux/gradient/divergence operator here.
    """
    consts = consts or {}
    decomposed = hx.sharded and (hx.mesh_x > 1 or hx.mesh_y > 1)
    if not decomposed or not overlap:
        # `overlap=False` is the A/B lever for measuring what the
        # overlapped schedule buys (scripts/overlap_ab.py): a plain
        # blocking exchange-then-compute pass, still fused via pad_many
        padded = hx.pad_many(fields, width)
        return fn(padded, consts)

    # pack same-shaped fields into one stacked exchange (pad_many's packed
    # message buffers), issued for all groups up front
    groups: Dict[Tuple[Tuple[int, ...], str], List[str]] = {}
    for name, a in fields.items():
        groups.setdefault((tuple(a.shape), str(a.dtype)), []).append(name)
    stacked = {gid: jnp.stack([fields[n] for n in names], axis=0)
               if len(names) > 1 else fields[names[0]]
               for gid, names in groups.items()}
    strips = {gid: hx.exchange_start(a, width) for gid, a in stacked.items()}
    bulk = fn({k: hx.local_pad(v, width) for k, v in fields.items()}, consts)
    padded: Dict[str, jax.Array] = {}
    for gid, names in groups.items():
        p = hx.exchange_finish(stacked[gid], strips[gid], width)
        if len(names) == 1:
            padded[names[0]] = p
        else:
            for i, n in enumerate(names):
                padded[n] = p[i]

    ny = next(iter(fields.values())).shape[-2]
    nx = next(iter(fields.values())).shape[-1]
    w = width

    def band(out, sel_pad, sel_out):
        """Recompute one edge band from true halos and patch it in."""
        slab_fields = {k: v[sel_pad(v.ndim)] for k, v in padded.items()}
        slab_consts = {k: v[sel_out(v.ndim)] for k, v in consts.items()}
        slab_out = fn(slab_fields, slab_consts)
        return jax.tree.map(
            lambda o, s: o.at[sel_out(o.ndim)].set(s), out, slab_out)

    def sel(axis_off, sl):
        """Slice `sl` on the y (axis_off=2) or x (axis_off=1) trailing axis,
        full range elsewhere."""
        def f(ndim):
            idx = [slice(None)] * ndim
            idx[ndim - axis_off] = sl
            return tuple(idx)
        return f

    out = bulk
    # y-lo band: padded rows [0, 3w) -> output rows [0, w); likewise y-hi/x
    out = band(out, sel(2, slice(0, 3 * w)), sel(2, slice(0, w)))
    out = band(out, sel(2, slice(ny - w, ny + 2 * w)), sel(2, slice(ny - w, ny)))
    out = band(out, sel(1, slice(0, 3 * w)), sel(1, slice(0, w)))
    out = band(out, sel(1, slice(nx - w, nx + 2 * w)), sel(1, slice(nx - w, nx)))
    return out
