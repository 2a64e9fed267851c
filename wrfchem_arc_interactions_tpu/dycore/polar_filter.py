"""Polar Fourier filtering for global lat-lon domains (canonical:
dyn_em/module_polar_fft.F, driven from solve_em.F's pxft calls).

On a latitude-longitude grid the zonal spacing dx*cos(lat) collapses toward
the poles, so the poleward rows would otherwise set the advective/acoustic
CFL for the whole domain.  The canonical fix filters each poleward row in
zonal wavenumber space: modes whose zonal resolution exceeds what the
mid-latitude timestep supports are truncated, so the timestep is governed
by the latitude `fft_filter_lat` instead of the pole.

TPU-native design
-----------------
The reference decomposes the domain, transposes so full zonal rows live on
one rank, runs serial FFTs, and transposes back (module_polar_fft.F's
ALLTOALLV machinery).  Here the whole (nz, ny, nx) field is filtered in one
batched `jnp.fft.rfft -> mask -> irfft` — XLA lowers the batch of ny*nz
row-FFTs onto the chip directly, and the per-latitude mask is a precomputed
(ny, nx/2+1) array broadcast over z, so the filter is two fused
memory-bound passes with no host traffic and no transpose.  Under a device
mesh the x axis must be unsharded for the row FFT (mesh=(my,1)); that is
the natural layout for lat-lon runs since all communication-heavy physics
is columnar.

The filter response follows the canonical choice: sharp truncation of
modes with k > k_max(lat), with k_max(lat) = (nx/2) * cos(lat)/cos(lat_f)
— i.e. the retained zonal resolution is what dx at `fft_filter_lat`
provides — optionally tapered with the squared-cosine rolloff the
reference applies to scalar fields to limit Gibbs ringing on positive-
definite tracers.
"""

from __future__ import annotations

import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.grid import Grid


def filter_mask(xlat_rows: jnp.ndarray, nx: int, filter_lat_deg: float,
                taper: bool = False) -> jnp.ndarray:
    """(ny, nx//2+1) zonal-wavenumber amplitude mask for the given row
    latitudes [deg].  Rows equatorward of `filter_lat_deg` are all-ones
    (identity); poleward rows keep k <= k_max(lat) and drop the rest.

    With `taper`, modes in (k_max/2, k_max] are rolled off with cos^2 —
    the gentler response the canonical scalar filter uses so monotone
    fields don't ring at the truncation wavenumber.
    """
    nk = nx // 2 + 1
    k = jnp.arange(nk, dtype=jnp.float32)[None, :]            # (1, nk)
    lat = jnp.abs(jnp.asarray(xlat_rows, jnp.float32))[:, None]
    lat = jnp.minimum(lat, 89.9999)                           # cos > 0
    clat_f = jnp.cos(jnp.deg2rad(jnp.float32(filter_lat_deg)))
    k_max = (nx / 2.0) * jnp.cos(jnp.deg2rad(lat)) / clat_f   # (ny, 1)
    if taper:
        # 1 up to k_max/2, cos^2 rolloff to 0 at k_max
        x = jnp.clip((k - 0.5 * k_max) / jnp.maximum(0.5 * k_max, 1e-6),
                     0.0, 1.0)
        amp = jnp.cos(0.5 * jnp.pi * x) ** 2
    else:
        amp = (k <= k_max).astype(jnp.float32)
    # mode 0 (zonal mean) always passes; equatorward rows untouched
    amp = amp.at[:, 0].set(1.0)
    return jnp.where(lat < filter_lat_deg, jnp.ones_like(amp), amp)


def apply_filter(field: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Filter along the last (zonal) axis with the (ny, nk) row mask.
    Accepts (ny, nx), (nz, ny, nx) or (nz+1, ny, nx); dtype preserved."""
    spec = jnp.fft.rfft(field.astype(jnp.float32), axis=-1)
    out = jnp.fft.irfft(spec * mask, n=field.shape[-1], axis=-1)
    return out.astype(field.dtype)


class PolarFilter:
    """Precomputed masks for mass/u/v rows of a grid (v sits on y faces, so
    its rows use the face latitude — the average of the adjacent mass-row
    latitudes, poleward face clamped)."""

    def __init__(self, grid: Grid, filter_lat_deg: float, nx: int):
        lat_m = grid.xlat[:, 0]
        lat_v = 0.5 * (lat_m + jnp.roll(lat_m, 1))
        lat_v = lat_v.at[0].set(lat_m[0])
        self.mask_m = filter_mask(lat_m, nx, filter_lat_deg)
        self.mask_m_taper = filter_mask(lat_m, nx, filter_lat_deg, taper=True)
        self.mask_v = filter_mask(lat_v, nx, filter_lat_deg)

    def momentum(self, state):
        """Filter the dynamical fields in place of the reference's pxft
        calls after the acoustic update (u, v, w, theta, geopotential, mu)."""
        out = dict(state)
        for q, mask in (("u", self.mask_m), ("v", self.mask_v),
                        ("w", self.mask_m), ("t", self.mask_m),
                        ("ph", self.mask_m)):
            if q in out:
                out[q] = apply_filter(out[q], mask)
        if "mu" in out:
            out["mu"] = apply_filter(out["mu"], self.mask_m)
        return out

    def scalar(self, q: jnp.ndarray) -> jnp.ndarray:
        """Tapered filter + clip for positive-definite tracers (the
        canonical scalar path's ringing guard)."""
        return jnp.maximum(apply_filter(q, self.mask_m_taper), 0.0)
