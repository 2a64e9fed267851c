"""McICA cloud overlap: stochastic subcolumn sampling of partial cloudiness
(canonical: the mcica_subcol_gen_lw/sw modules feeding rtrnmc / spcvmc in
phys/module_ra_rrtmg_{lw,sw}.F; SURVEY.md §2.2 'McICA cloud overlap').

The Monte-Carlo Independent Column Approximation assigns each spectral
g-point its own binary cloud subcolumn drawn from the layer cloud-fraction
profile with **maximum-random overlap** (Raisanen et al. 2004 generator):
vertically contiguous cloudy layers overlap maximally (they share the same
deviate), layers separated by clear air overlap randomly.  Averaging the
per-g-point RT over the spectrum then converges to the ICA flux with zero
bias and O(1/ngpt) sampling noise.

TPU-native choices (vs the reference's per-column kissvec PRNG):

- Random deviates come from a **stateless integer hash** of
  (g-point, layer, seed) — pure `uint32` VPU ops, no PRNG state threading
  through jit, bit-reproducible across runs.
- Deviates are deliberately **column-independent** (hash inputs exclude the
  horizontal position).  The carry of the overlap scan still mixes them with
  the column-dependent cloud fraction, so subcolumns differ between columns
  wherever profiles differ; but the sampling pattern is identical no matter
  how the horizontal domain is sharded — preserving THE decomposition-
  invariance contract (SURVEY.md §4) that a per-column seed would break.
- The overlap recursion is one `lax.scan` over z with the full
  (g-point x column) plane in the carry — the standard execution shape of
  every z recursion in this framework.

Also provides the Xu & Randall (1996) diagnostic cloud fraction used when
`icloud=1` (the reference radiation driver's partial-cloudiness option).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.utils import constants as c

# minimum in-cloud fraction when normalising condensate to in-cloud values
CF_MIN = 0.02


def _hash_u32(x: jax.Array) -> jax.Array:
    """xorshift-multiply finalizer (splitmix-style avalanche), uint32."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def uniform_gk(ngpt: int, nz: int, seed) -> jax.Array:
    """(nz, ngpt) uniforms in [0,1) from a stateless hash of (layer, g, seed)."""
    g = jnp.arange(ngpt, dtype=jnp.uint32)[None, :]
    k = jnp.arange(nz, dtype=jnp.uint32)[:, None]
    h = _hash_u32(g * jnp.uint32(0x9E3779B1)
                  + k * jnp.uint32(0x85EBCA77)
                  + jnp.asarray(seed, jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def mcica_mask(cldfra: jax.Array, ngpt: int, seed=0) -> jax.Array:
    """Binary cloud mask per g-point subcolumn, maximum-random overlap.

    cldfra: (nz, ncol) layer cloud fraction in [0,1], level 0 = surface.
    Returns float mask (ngpt, nz, ncol): 1 where that subcolumn is cloudy.
    """
    nz, ncol = cldfra.shape
    r = uniform_gk(ngpt, nz, seed)                      # (nz, ngpt)
    cf_top_down = cldfra[::-1]                          # scan from model top
    r_top_down = r[::-1]

    def step(carry, inp):
        x_above, cf_above = carry                       # (ngpt, ncol), (ncol,)
        r_k, cf_k = inp                                 # (ngpt,), (ncol,)
        # max-random: a subcolumn cloudy in the layer above keeps its
        # deviate (maximum overlap); otherwise draw fresh, compressed into
        # the clear part of the layer above (random overlap across gaps).
        fresh = r_k[:, None] * (1.0 - cf_above)[None, :]
        x = jnp.where(x_above > (1.0 - cf_above)[None, :], x_above, fresh)
        cloudy = (x > (1.0 - cf_k)[None, :]).astype(cldfra.dtype)
        return (x, cf_k), cloudy

    # derive the init carry from cldfra so its varying-manual-axes type under
    # shard_map matches the (mesh-varying) carry the body produces
    zcol = jnp.zeros_like(cldfra[0])                    # (ncol,)
    init = (jnp.zeros((ngpt, 1), cldfra.dtype) + zcol[None, :], zcol)
    _, mask_td = jax.lax.scan(step, init, (r_top_down, cf_top_down))
    return jnp.moveaxis(mask_td[::-1], 0, 1)            # (ngpt, nz, ncol)


def _qsat(p, t):
    """Saturation mixing ratio over liquid (Tetens)."""
    es = 610.78 * jnp.exp(17.27 * (t - c.SVPT0) / jnp.maximum(t - 35.86, 1.0))
    es = jnp.minimum(es, 0.5 * p)
    return 0.622 * es / (p - es)


def xu_randall_cldfra(p_lay, t_lay, qv, qcond) -> jax.Array:
    """Xu & Randall (1996) semi-empirical cloud fraction (icloud=1 analog):
    CF = RH^0.25 * (1 - exp(-alpha0 * qc / ((1-RH) qs)^gamma)), alpha0=100,
    gamma=0.49.  qcond = total cloud condensate (liquid + ice) [kg/kg]."""
    qs = _qsat(p_lay, t_lay)
    rh = jnp.clip(qv / jnp.maximum(qs, 1e-10), 0.0, 1.0)
    sub = jnp.maximum((1.0 - rh) * qs, 1e-10) ** 0.49
    cf = rh ** 0.25 * (1.0 - jnp.exp(-100.0 * qcond / sub))
    cf = jnp.where(qcond > 1e-9, jnp.clip(cf, 0.0, 1.0), 0.0)
    # saturated cells with condensate are overcast
    return jnp.where((rh >= 0.999) & (qcond > 1e-7), 1.0, cf)
