"""Gas optical depths from the k-distribution tables — the setcoef/taumol
equivalent (canonical: rrtmg setcoef + taumol/taumol_sw;
SURVEY.md §2.2, §3.2).

Batched dense formulation for TPU: every (g-point, layer, column) gets its
tau via a bilinear (ln p, T) interpolation of the reference tables — the
gathers are indexed loads from small device-resident tables (SURVEY.md
§7.3-7 notes the dense one-hot-matmul fallback if profiling shows a cliff).

Shapes: layer fields (nz, ncol); spectral outputs (ngpt, nz, ncol).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.physics.radiation import ktables
from wrfchem_arc_interactions_tpu.utils import constants as c

# well-mixed greenhouse gas volume mixing ratios (namelist-overridable later)
CO2_VMR = 400e-6
CH4_VMR = 1.8e-6
N2O_VMR = 0.32e-6
O2_VMR = 0.209

_M_AIR = 28.966
_MW = {"h2o": 18.015, "co2": 44.01, "o3": 48.0, "ch4": 16.04,
       "n2o": 44.013, "o2": 32.0}


def o3_mass_mixing_ratio(p: jax.Array) -> jax.Array:
    """Simple standard-atmosphere ozone profile: mass mixing ratio peaking
    ~1.6e-5 kg/kg near 10 hPa (synthetic climatology)."""
    lp = jnp.log(jnp.maximum(p, 1.0) / 1000.0)   # log(p/10hPa)
    return 1.6e-5 * jnp.exp(-0.5 * (lp / 1.2) ** 2) + 3e-8


def species_mass_mix(qv: jax.Array, p: jax.Array) -> Dict[str, jax.Array]:
    """Mass mixing ratios [kg/kg dry-ish air] for the table species."""
    to_mass = lambda vmr, mw: vmr * mw / _M_AIR
    ones = jnp.ones_like(p)
    return {
        "h2o": qv,
        "co2": to_mass(CO2_VMR, _MW["co2"]) * ones,
        "o3": o3_mass_mixing_ratio(p),
        "ch4": to_mass(CH4_VMR, _MW["ch4"]) * ones,
        "n2o": to_mass(N2O_VMR, _MW["n2o"]) * ones,
        "o2": to_mass(O2_VMR, _MW["o2"]) * ones,
    }


def _interp_weights(p: jax.Array, t: jax.Array):
    """Bilinear (ln p, T) interpolation indices/weights into the reference
    grid (uniform in both axes -> arithmetic, no searchsorted)."""
    lnp = jnp.log(jnp.clip(p, ktables.P_REF_MIN, ktables.P_REF_MAX))
    dp = (ktables.LNP_REF[1] - ktables.LNP_REF[0])
    fp = (lnp - ktables.LNP_REF[0]) / dp
    jp = jnp.clip(jnp.floor(fp).astype(jnp.int32), 0, ktables.N_PREF - 2)
    wp = jnp.clip(fp - jp, 0.0, 1.0)

    dt_ = ktables.T_REF[1] - ktables.T_REF[0]
    ft = (jnp.clip(t, ktables.T_REF[0], ktables.T_REF[-1]) - ktables.T_REF[0]) / dt_
    jt = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, ktables.N_TREF - 2)
    wt = jnp.clip(ft - jt, 0.0, 1.0)
    return jp, wp, jt, wt


def _interp_table(ktab: jax.Array, jp, wp, jt, wt) -> jax.Array:
    """ktab (ngpt, n_tref, n_pref); jp/wp/jt/wt (nz, ncol) ->
    (ngpt, nz, ncol)."""
    k00 = ktab[:, jt, jp]
    k01 = ktab[:, jt, jp + 1]
    k10 = ktab[:, jt + 1, jp]
    k11 = ktab[:, jt + 1, jp + 1]
    return ((1 - wt) * ((1 - wp) * k00 + wp * k01)
            + wt * ((1 - wp) * k10 + wp * k11))


def gas_tau(kind: str, p_lay: jax.Array, t_lay: jax.Array,
            dp_lay: jax.Array, qv: jax.Array) -> jax.Array:
    """Gas absorption optical depth per g-point.

    kind: 'lw' or 'sw'. p_lay/t_lay/dp_lay/qv: (nz, ncol); dp_lay is the
    layer pressure thickness [Pa] (positive). Returns (ngpt, nz, ncol).
    """
    tabs = ktables.load_tables()
    kmajor = tabs.kmajor_lw if kind == "lw" else tabs.kmajor_sw
    jp, wp, jt, wt = _interp_weights(p_lay, t_lay)
    air_path = dp_lay / c.G                      # kg air / m2
    mmr = species_mass_mix(qv, p_lay)
    tau = None
    for sp, ktab in kmajor.items():
        k = _interp_table(jnp.asarray(ktab, p_lay.dtype), jp, wp, jt, wt)
        contrib = k * (mmr[sp] * air_path)[None]
        tau = contrib if tau is None else tau + contrib
    return tau


def rayleigh_tau(dp_lay: jax.Array, dtype) -> jax.Array:
    """(ngpt_sw, nz, ncol) Rayleigh scattering optical depth."""
    tabs = ktables.load_tables()
    ray = jnp.asarray(tabs.rayleigh_sw, dtype).reshape(-1, 1, 1)
    return ray * (dp_lay / c.G)[None]
