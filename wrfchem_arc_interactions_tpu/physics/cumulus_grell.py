"""Grell-style ensemble mass-flux cumulus (cu_physics=grell; canonical:
phys/module_cu_g3.F / module_cu_gd.F, Grell & Devenyi 2002; SURVEY.md §2.2
'Cumulus (Grell-3/GD, KF)').

The GD idea: instead of committing to one updraft model and one closure,
run an ENSEMBLE over the main uncertainty axes and use the ensemble-mean
tendency.  Here the member space is

- entrainment rate (updraft radius proxy): {3e-5, 5e-5, 8e-5} 1/m,
- closure timescale (CAPE-removal rate): {1800, 3600} s,

i.e. 6 members of the SAME fixed-work entraining plume that powers the KF
scheme (cumulus_kf.kf_mass_flux with member parameters traced), evaluated
in ONE jax.vmap over the member axis — the TPU-native restatement of the
reference's 144-member loop (members differ only in scalar parameters, so
the batch compiles to a single widened kernel; no per-member dispatch).

The reference's precipitation-efficiency and moisture-convergence closure
axes collapse into these two (documented simplification); the ensemble
mean is unweighted, like the default GD configuration.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.physics.cumulus_kf import kf_mass_flux

EPS_MEMBERS = (3.0e-5, 5.0e-5, 8.0e-5)
TAU_MEMBERS = (1800.0, 3600.0)


def grell_ensemble(theta: jax.Array, qv: jax.Array, p: jax.Array,
                   rho: jax.Array, dz: jax.Array, dt: float
                   ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Ensemble-mean ({"th", "qv"} tendencies, precip rate)."""
    eps_g, tau_g = jnp.meshgrid(jnp.asarray(EPS_MEMBERS),
                                jnp.asarray(TAU_MEMBERS), indexing="ij")
    params = jnp.stack([eps_g.ravel(), tau_g.ravel()], axis=1)  # (6, 2)

    def member(pr):
        tend, rain = kf_mass_flux(theta, qv, p, rho, dz, dt,
                                  eps_ent=pr[0], tau_cape=pr[1])
        return tend["th"], tend["qv"], rain

    dth, dqv, rain = jax.vmap(member)(params)
    return ({"th": jnp.mean(dth, axis=0), "qv": jnp.mean(dqv, axis=0)},
            jnp.mean(rain, axis=0))
