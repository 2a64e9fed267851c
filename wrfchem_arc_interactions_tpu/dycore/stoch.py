"""Stochastic physics: SPPT + SKEBS-style perturbations (canonical:
dyn_em/module_stoch.F behind sppt_on/skebs stoch_opt; SURVEY.md §2.1
'Stochastic physics').

- **SPPT** (stochastically perturbed physics tendencies): the total physics
  tendency of theta/qv/u/v is multiplied by (1 + r) with r a smooth,
  AR(1)-in-time random pattern, clipped for positivity safety.
- **SKEBS** (kinetic-energy backscatter): a second independent pattern acts
  as a streamfunction; its rotational wind increments (u' = -dpsi/dy,
  v' = +dpsi/dx) are added to the momentum tendencies.

TPU-native pattern generator (vs the reference's global spherical-harmonic
FFT): white noise from a stateless integer hash of the GLOBAL (j, i) cell
index + the step counter — bit-reproducible and decomposition-invariant by
construction (same design as the McICA generator) — smoothed into a
correlated field by L five-point diffusion passes whose halos ride the
normal exchange machinery.  The pattern state lives in the model state
(restart-exact like everything else).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps
from wrfchem_arc_interactions_tpu.parallel.mesh import AXIS_X, AXIS_Y
from wrfchem_arc_interactions_tpu.physics.radiation.mcica import _hash_u32

N_SMOOTH = 8          # five-point diffusion passes (sets the length scale)
AR1_TAU_S = 6.0 * 3600.0   # pattern decorrelation time [s]
CLIP = 0.8            # |r| clip for SPPT multiplicative safety


def white_noise(shape: Tuple[int, int], hx: HaloOps, step, seed: int = 0):
    """(ny, nx) unit-variance noise from a hash of the GLOBAL cell index;
    identical no matter how the domain is decomposed."""
    ny, nx = shape
    jy = jnp.arange(ny, dtype=jnp.uint32)[:, None]
    ix = jnp.arange(nx, dtype=jnp.uint32)[None, :]
    if hx.sharded and hx.mesh_y > 1:
        jy = jy + jnp.uint32(ny) * lax.axis_index(AXIS_Y).astype(jnp.uint32)
    if hx.sharded and hx.mesh_x > 1:
        ix = ix + jnp.uint32(nx) * lax.axis_index(AXIS_X).astype(jnp.uint32)
    h = _hash_u32(jy * jnp.uint32(0x9E3779B1)
                  + ix * jnp.uint32(0x85EBCA77)
                  + jnp.asarray(step, jnp.uint32) * jnp.uint32(0xC2B2AE3D)
                  + jnp.uint32(seed) * jnp.uint32(0x27D4EB2F))
    u = h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    return (u - 0.5) * jnp.sqrt(12.0)            # unit variance


def _filter_variance(n: int, a: float = 0.2) -> float:
    """Exact variance of the n-fold 5-point filter applied to unit iid noise
    = sum of squares of the n-fold-convolved kernel (computed statically)."""
    import numpy as np
    k = np.zeros((2 * n + 1, 2 * n + 1))
    k[n, n] = 1.0
    one = np.array([[0, a, 0], [a, 1 - 4 * a, a], [0, a, 0]])
    for _ in range(n):
        out = np.zeros_like(k)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w = one[dy + 1, dx + 1]
                if w:
                    out += w * np.roll(np.roll(k, dy, 0), dx, 1)
        k = out
    return float((k ** 2).sum())


def smooth(r: jax.Array, hx: HaloOps, n: int = N_SMOOTH) -> jax.Array:
    """n passes of the 5-point diffusion filter (plus-shaped: halo corners
    unused), renormalised to unit variance with the exact n-fold kernel
    variance (static constant, so the field stays decomposition-invariant
    — no global reductions)."""
    a = 0.2
    for _ in range(n):
        rp = hx.pad(r, 1)
        r = ((1.0 - 4.0 * a) * r
             + a * (rp[..., 1:-1, 2:] + rp[..., 1:-1, :-2]
                    + rp[..., 2:, 1:-1] + rp[..., :-2, 1:-1]))
    return r / jnp.sqrt(_filter_variance(n, a))


def evolve_pattern(pattern: jax.Array, hx: HaloOps, dt: float, step,
                   seed: int = 0) -> jax.Array:
    """AR(1) update toward a fresh smoothed noise field."""
    phi = jnp.exp(-dt / AR1_TAU_S)
    fresh = smooth(white_noise(pattern.shape[-2:], hx, step, seed), hx)
    return phi * pattern + jnp.sqrt(jnp.maximum(1.0 - phi * phi, 1e-12)) * fresh


def apply_sppt(tend: Dict[str, jax.Array], pattern: jax.Array,
               amplitude: float) -> Dict[str, jax.Array]:
    """Multiply the physics tendencies by (1 + r), r clipped."""
    r = jnp.clip(amplitude * pattern, -CLIP, CLIP)
    out = dict(tend)
    for name in ("th", "qv", "u", "v"):
        if name in out:
            out[name] = out[name] * (1.0 + r)[None]
    return out


def skebs_increments(psi_pattern: jax.Array, hx: HaloOps, amplitude: float,
                     dx: float, dy: float) -> Tuple[jax.Array, jax.Array]:
    """Rotational wind tendencies from the streamfunction pattern:
    du/dt = -dpsi/dy, dv/dt = +dpsi/dx (barotropic; the reference's
    vertical modulation is a documented simplification)."""
    psi = amplitude * dx * psi_pattern           # [m2/s2]-ish scaling
    pp = hx.pad(psi, 1)
    du = -(pp[..., 2:, 1:-1] - pp[..., :-2, 1:-1]) / (2.0 * dy)
    dv = (pp[..., 1:-1, 2:] - pp[..., 1:-1, :-2]) / (2.0 * dx)
    return du, dv
