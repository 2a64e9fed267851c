"""Pallas TPU kernel for the fast-Mie Chebyshev evaluation — the dominant
cost of the interactive-ARC chemistry call (canonical:
chem/module_optical_averaging.F mieaer/binterp's per-(cell, band) Chebyshev
evaluation with bilinear refractive-index interpolation).

Round-5 profile (artifacts/PROFILE_chem_r5.json): after the sparse-LU/
Pallas gas solver work, aerosol optics was 487 ms of the 508 ms config-4
chem call.  The XLA band-scan form (chem/optics.py) is compile-safe but
serializes 120 small (band, bin) steps, each materializing its weight and
coefficient intermediates in HBM.

One kernel instance processes a 1024-element tile of the flattened
(bin, band, cell) axis and keeps everything on-chip:

- inputs are three (8, 128) f32 tiles: the normalised refractive index
  nr_n, absorption u, and Chebyshev argument t (computed by cheap fused
  XLA elementwise code from the per-bin species mix);
- the 80 bilinear hat weights over the (8 nr x 10 ni) grid are built as
  (1, 1024) rows and concatenated to an (80, 1024) VMEM operand — EXACT
  interpolation of the Bohren-Huffman-derived tables (the canonical
  binterp, as one outer product instead of scalar gathers; the
  tensor-poly refit this replaced was catastrophically ill-conditioned,
  see mie.build_grid_matrix);
- ALL 3 tables x 30 Chebyshev coefficients come from ONE
  (90, 80) @ (80, 1024) `jnp.dot` — MXU work with the coefficient matrix
  resident in VMEM (28 KB);
- the Clenshaw recurrence runs unrolled on (1, 1024) rows (~90 FMAs per
  table);
- HBM traffic is the speed-of-light minimum: 3 x 4 B in, 3 x 4 B out per
  element.

Equivalence with the XLA path is pinned by tests/test_mie_optics.py."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024                      # flattened (bin, band, cell) elements


@functools.lru_cache(maxsize=2)
def _eval_fn(interpret: bool):
    from wrfchem_arc_interactions_tpu.chem import mie
    G_np = mie.build_grid_matrix()            # (3*NCHEB, 80)
    nch = mie.NCHEB
    n_nr = len(mie.NR_GRID)
    n_ni = len(mie.NI_GRID)

    def kernel(g_ref, nr_ref, u_ref, t_ref, qe_ref, qs_ref, g_out_ref):
        # blocks are (1, 8, 128) natural tiles; flatten to (1, TILE) rows
        # once on entry so the weight rows concatenate into the (80, TILE)
        # MXU operand
        nr = nr_ref[0].reshape(1, TILE)
        u = u_ref[0].reshape(1, TILE)
        t = t_ref[0].reshape(1, TILE)
        fr = nr * (n_nr - 1)
        fi = u * (n_ni - 1)
        wa = [jnp.maximum(0.0, 1.0 - jnp.abs(fr - a)) for a in range(n_nr)]
        wb = [jnp.maximum(0.0, 1.0 - jnp.abs(fi - b)) for b in range(n_ni)]
        W = jnp.concatenate([a * b for a in wa for b in wb], axis=0)
        cks = jnp.dot(g_ref[...], W,
                      preferred_element_type=jnp.float32)   # (90, TILE)
        t2 = 2.0 * t

        def clenshaw(row0):
            b0 = b1 = jnp.zeros_like(t)
            for k in range(nch - 1, -1, -1):
                b0, b1 = t2 * b0 - b1 + cks[row0 + k][None], b0
            return (b0 - t * b1 - 0.5 * cks[row0][None]).reshape(8, LANES)

        qe_ref[0] = clenshaw(0)
        qs_ref[0] = clenshaw(nch)
        g_out_ref[0] = clenshaw(2 * nch)

    def run(nr_n, u, t):
        """(X,) f32 inputs (X a multiple of TILE) -> three (X,) outputs
        (ln_qext, ln_qsca, g_raw)."""
        X = nr_n.shape[0]
        nt = X // TILE
        shape3 = (nt, 8, LANES)
        try:
            vma = frozenset(jax.typeof(nr_n).vma)
        except Exception:                     # pragma: no cover
            vma = frozenset()
        sds = (jax.ShapeDtypeStruct(shape3, jnp.float32, vma=vma)
               if vma else jax.ShapeDtypeStruct(shape3, jnp.float32))
        spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec(G_np.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        G = jnp.asarray(G_np)
        if vma:
            from wrfchem_arc_interactions_tpu.utils.vma import tie_vma
            G = tie_vma(G, nr_n)
        qe, qs, g = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[gspec] + [spec] * 3,
            out_specs=[spec] * 3,
            out_shape=[sds] * 3,
            interpret=interpret,
        )(G, nr_n.reshape(shape3), u.reshape(shape3), t.reshape(shape3))
        return qe.reshape(X), qs.reshape(X), g.reshape(X)

    return run


def cheb_eval_pallas(nr_n, u, t, interpret: bool = False):
    """Drop-in replacement for optics._cheb_eval_bands: (nband, *shp)
    normalised inputs -> (ln_qext, ln_qsca, g), each (nband, *shp)."""
    shape = t.shape
    X = int(np.prod(shape))
    nt = -(-X // TILE)
    pad = nt * TILE - X

    def prep(a):
        return jnp.pad(a.reshape(-1).astype(jnp.float32), (0, pad))

    run = _eval_fn(interpret)
    qe, qs, g = run(prep(nr_n), prep(u), prep(t))
    dt = t.dtype
    return (qe[:X].reshape(shape).astype(dt),
            qs[:X].reshape(shape).astype(dt),
            g[:X].reshape(shape).astype(dt))
