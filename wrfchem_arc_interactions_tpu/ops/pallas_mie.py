"""Pallas TPU kernel for the fast-Mie Chebyshev evaluation — the dominant
cost of the interactive-ARC chemistry call (canonical:
chem/module_optical_averaging.F mieaer/binterp's per-(cell, band) Chebyshev
evaluation with bilinear refractive-index interpolation).

Round-5 profile (artifacts/PROFILE_chem_r5.json): after the sparse-LU/
Pallas gas solver work, aerosol optics was 487 ms of the 508 ms config-4
chem call.  The XLA band-scan form (chem/optics.py) is compile-safe but
serializes 120 small (band, bin) steps, each materializing its weight and
coefficient intermediates in HBM.

One kernel instance processes an 8192-element tile of the flattened
(bin, band, cell) axis and keeps everything on-chip:

- inputs are three (64, 128) f32 tiles: the normalised refractive index
  nr_n, absorption u, and Chebyshev argument t (computed by cheap fused
  XLA elementwise code from the per-bin species mix);
- the 80 bilinear hat weights over the (8 nr x 10 ni) grid are built by
  broadcasted iota as an (8, T) x (10, T) outer product reshaped to the
  (80, T) VMEM operand — EXACT interpolation of the Bohren-Huffman-derived
  tables (the canonical binterp, as one outer product instead of scalar
  gathers; the tensor-poly refit this replaced was catastrophically
  ill-conditioned, see mie.build_grid_matrix);
- ALL 3 tables x 30 Chebyshev coefficients come from ONE
  (90, 80) @ (80, T) MXU contraction with the coefficient matrix resident
  in VMEM (28 KB).  The contraction runs as a 3-pass bf16 split
  (G = Gh + Gl, W = Wh + Wl to bf16; Gh@Wh + Gh@Wl + Gl@Wh, f32
  accumulate): each term is a full-rate bf16 MXU pass and the dropped
  Gl@Wl term is O(2^-16) relative.  This matters: Mosaic lowers a plain
  f32 jnp.dot to ONE bf16 pass, so the "f32" dot actually carries
  |delta ln Q| up to 0.12 at the large-magnitude small-particle rows
  (hardware-measured; tau-integrated effect 0.3%, but the round-4 Mie
  conditioning episode earns exactness here).  The split restores
  max |delta ln Q| = 3.2e-4 vs the f32 XLA band-scan for two extra MXU
  passes (artifacts/PALLAS_MIE_AB.json: split 80.7 ms vs band-scan
  932 ms = 11.5x; 1-pass variants run 53 ms and stay selectable);
- the Clenshaw recurrence runs unrolled on (1, T) rows (~90 FMAs per
  table);
- HBM traffic is the speed-of-light minimum: 3 x 4 B in, 3 x 4 B out per
  element.

The round-5 first cut used 1024-element tiles, a python-level 80-way
concat for W, and ran the Clenshaw on (1, 1024) rows — one of eight
sublanes live, so the recurrence (not the dot) dominated the kernel.
This form (8x fewer grid steps, 32 KB DMAs, iota-built weights, one
(90, TILE) -> (90, SUBS, LANES) retile so Clenshaw runs on full blocks)
reaches the same wall time WITH the 3-pass exact dot; the per-pass MXU
time (~13.5 ms at config-4 shapes) is ~75% of the padded-tile
speed-of-light for the (96, 128)-padded operand.

Equivalence with the XLA path is pinned by tests/test_mie_optics.py."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBS = 64
TILE = SUBS * LANES              # flattened (bin, band, cell) elements


@functools.lru_cache(maxsize=4)
def _eval_fn(interpret: bool, dot_variant: str = "split"):
    from wrfchem_arc_interactions_tpu.chem import mie
    G_np = mie.build_grid_matrix()            # (3*NCHEB, 80)
    nch = mie.NCHEB
    n_nr = len(mie.NR_GRID)
    n_ni = len(mie.NI_GRID)

    def _contract(G, W):
        f32 = jnp.float32
        if dot_variant == "f32":
            return jnp.dot(G, W, preferred_element_type=f32)
        if dot_variant == "bf16":
            return jnp.dot(G.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                           preferred_element_type=f32)
        # split: 3 bf16 passes reconstruct the f32 product to ~2^-22
        Gh = G.astype(jnp.bfloat16)
        Gl = (G - Gh.astype(f32)).astype(jnp.bfloat16)
        Wh = W.astype(jnp.bfloat16)
        Wl = (W - Wh.astype(f32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot, preferred_element_type=f32)
        return d(Gh, Wh) + (d(Gh, Wl) + d(Gl, Wh))

    def kernel(g_ref, nr_ref, u_ref, t_ref, qe_ref, qs_ref, g_out_ref):
        # blocks are (1, SUBS, 128) natural tiles; flatten nr/u to (1, TILE)
        # rows once on entry so the hat-weight outer product lands as the
        # (80, TILE) MXU operand
        nr = nr_ref[0].reshape(1, TILE)
        u = u_ref[0].reshape(1, TILE)
        fr = nr * (n_nr - 1)
        fi = u * (n_ni - 1)
        ar = jax.lax.broadcasted_iota(jnp.int32, (n_nr, TILE), 0
                                      ).astype(jnp.float32)
        bi = jax.lax.broadcasted_iota(jnp.int32, (n_ni, TILE), 0
                                      ).astype(jnp.float32)
        wa = jnp.maximum(0.0, 1.0 - jnp.abs(fr - ar))        # (8, TILE)
        wb = jnp.maximum(0.0, 1.0 - jnp.abs(fi - bi))        # (10, TILE)
        W = (wa[:, None, :] * wb[None, :, :]).reshape(n_nr * n_ni, TILE)
        cks = _contract(g_ref[...], W)                       # (90, TILE)
        # one retile (90, TILE) -> (90, SUBS, LANES) so every Clenshaw op
        # runs on full (SUBS, LANES) blocks — (1, TILE) rows use 1 of 8
        # sublanes and made the recurrence the kernel's dominant cost
        cks3 = cks.reshape(3 * nch, SUBS, LANES)
        t = t_ref[0]                                         # (SUBS, LANES)
        t2 = 2.0 * t

        def clenshaw(row0):
            b0 = b1 = jnp.zeros_like(t)
            for k in range(nch - 1, -1, -1):
                b0, b1 = t2 * b0 - b1 + cks3[row0 + k], b0
            return b0 - t * b1 - 0.5 * cks3[row0]

        qe_ref[0] = clenshaw(0)
        qs_ref[0] = clenshaw(nch)
        g_out_ref[0] = clenshaw(2 * nch)

    def run(nr_n, u, t):
        """(X,) f32 inputs (X a multiple of TILE) -> three (X,) outputs
        (ln_qext, ln_qsca, g_raw)."""
        X = nr_n.shape[0]
        nt = X // TILE
        shape3 = (nt, SUBS, LANES)
        try:
            vma = frozenset(jax.typeof(nr_n).vma)
        except Exception:                     # pragma: no cover
            vma = frozenset()
        sds = (jax.ShapeDtypeStruct(shape3, jnp.float32, vma=vma)
               if vma else jax.ShapeDtypeStruct(shape3, jnp.float32))
        spec = pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0),
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


def cheb_eval_pallas(nr_n, u, t, interpret: bool = False,
                     dot_variant: str = "split"):
    """Drop-in replacement for optics._cheb_eval_bands: (nband, *shp)
    normalised inputs -> (ln_qext, ln_qsca, g), each (nband, *shp)."""
    shape = t.shape
    X = int(np.prod(shape))
    nt = -(-X // TILE)
    pad = nt * TILE - X

    def prep(a):
        return jnp.pad(a.reshape(-1).astype(jnp.float32), (0, pad))

    run = _eval_fn(interpret, dot_variant)
    qe, qs, g = run(prep(nr_n), prep(u), prep(t))
    dt = t.dtype
    return (qe[:X].reshape(shape).astype(dt),
            qs[:X].reshape(shape).astype(dt),
            g[:X].reshape(shape).astype(dt))
