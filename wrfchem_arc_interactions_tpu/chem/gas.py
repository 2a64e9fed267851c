"""Gas-phase chemistry: CBMZ-lite mechanism as data + a generic vectorized
Rosenbrock solver (canonical: chem/module_cbmz.F + the KPP-generated
Rosenbrock mechanisms of chem/KPP/; SURVEY.md §2.3, §2.6-3).

The reference generates mechanism-specific Fortran with a C lex/yacc code
generator (KPP).  Here the mechanism is *data* — species list, reaction
table with Arrhenius/photolysis rates, sparse stoichiometry — consumed by
one generic solver: every grid cell is an independent stiff ODE
(SURVEY.md §3.3 'fully independent per grid cell'), so the TPU formulation
batches cells into dense (ns x ns) linearised solves (2-stage Rosenbrock
ROS2) that XLA maps onto the MXU as batched matmul/LU work.

Mechanism scope: a CBM-Z core (O3/NOx/HOx photochemistry, CO/CH4/HCHO
oxidation, SO2 -> H2SO4, lumped VOC, PAN, isoprene) — ~24 species /
~45 reactions; enough for the ARC precursor chain (SO2/H2SO4, NH3, HNO3)
while the full CBMZ table can be swapped in by editing REACTIONS only.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Transported gas species (ppmv in chem arrays). Order defines state layout.
GAS_SPECIES: Tuple[str, ...] = (
    "o3", "no", "no2", "no3", "n2o5", "hno3", "hono", "h2o2", "co", "so2",
    "h2so4", "nh3", "hcl", "hcho", "ald2", "par", "ole", "isop", "pan",
    "c2o3", "xo2", "oh", "ho2", "ch3o2",
)
NS = len(GAS_SPECIES)
IDX = {s: i for i, s in enumerate(GAS_SPECIES)}

# Reaction table: (reactants, products-with-stoich, rate spec)
# rate spec: ("arr", A, n, E/R) -> k = A*(T/300)^n*exp(-E_R/T)  [cm3/molec/s]
#            ("phot", name, scale) -> k = scale * J_name
#            ("tb", A, n, E_R)    -> termolecular-ish with [M] folded in
R = lambda *a: a
REACTIONS: List[tuple] = [
    # NOx-O3 core
    R(("no2",), (("no", 1.0), ("o3", 1.0)), ("phot", "no2", 1.0)),
    R(("no", "o3"), (("no2", 1.0),), ("arr", 3.0e-12, 0.0, 1500.0)),
    R(("o3",), (("oh", 2.0 * 0.2),), ("phot", "o3_o1d", 1.0)),  # O1D+H2O->2OH (20% yield folded)
    R(("no2", "o3"), (("no3", 1.0),), ("arr", 1.2e-13, 0.0, 2450.0)),
    R(("no3",), (("no2", 1.0),), ("phot", "no3", 1.0)),
    R(("no3", "no"), (("no2", 2.0),), ("arr", 1.5e-11, 0.0, -170.0)),
    R(("no3", "no2"), (("n2o5", 1.0),), ("arr", 2.0e-12, 0.2, -700.0)),
    R(("n2o5",), (("no3", 1.0), ("no2", 1.0)), ("arr", 6.0e-2, 0.0, 10840.0)),
    R(("n2o5",), (("hno3", 2.0),), ("arr", 2.5e-22, 0.0, 0.0)),  # het. hydrolysis (pseudo-1st w/ H2O)
    # HOx
    R(("o3", "ho2"), (("oh", 1.0),), ("arr", 1.0e-14, 0.0, 490.0)),
    R(("o3", "oh"), (("ho2", 1.0),), ("arr", 1.7e-12, 0.0, 940.0)),
    R(("oh", "no2"), (("hno3", 1.0),), ("arr", 1.1e-11, -0.6, 0.0)),
    R(("oh", "no"), (("hono", 1.0),), ("arr", 7.0e-12, 0.0, -250.0)),
    R(("hono",), (("oh", 1.0), ("no", 1.0)), ("phot", "hono", 1.0)),
    R(("ho2", "no"), (("oh", 1.0), ("no2", 1.0)), ("arr", 3.5e-12, 0.0, -250.0)),
    R(("ho2", "ho2"), (("h2o2", 1.0),), ("arr", 2.9e-12, 0.0, -160.0)),
    R(("h2o2",), (("oh", 2.0),), ("phot", "h2o2", 1.0)),
    R(("h2o2", "oh"), (("ho2", 1.0),), ("arr", 1.8e-12, 0.0, 0.0)),
    R(("oh", "ho2"), ((), ), ("arr", 4.8e-11, 0.0, -250.0)),
    # CO / CH4 / HCHO
    R(("co", "oh"), (("ho2", 1.0),), ("arr", 2.4e-13, 0.0, 0.0)),
    R(("oh",), (("ch3o2", 1.0),), ("arr", 6.4e-15, 0.0, 0.0)),  # +CH4 (1.8ppm folded into A via [CH4])
    R(("ch3o2", "no"), (("hcho", 1.0), ("ho2", 1.0), ("no2", 1.0)),
      ("arr", 2.8e-12, 0.0, -300.0)),
    R(("hcho",), (("co", 1.0), ("ho2", 2.0)), ("phot", "hcho_r", 1.0)),
    R(("hcho",), (("co", 1.0),), ("phot", "hcho_m", 1.0)),
    R(("hcho", "oh"), (("co", 1.0), ("ho2", 1.0)), ("arr", 5.5e-12, 0.0, -125.0)),
    # SO2 oxidation -> sulfuric acid (the ARC precursor path)
    R(("so2", "oh"), (("h2so4", 1.0), ("ho2", 1.0)), ("arr", 1.6e-12, 0.0, 0.0)),
    # lumped organics (CBM-like)
    R(("par", "oh"), (("xo2", 0.87), ("ho2", 0.11), ("ald2", 0.11)),
      ("arr", 8.1e-13, 0.0, 0.0)),
    R(("ole", "oh"), (("hcho", 1.0), ("ald2", 1.0), ("xo2", 1.0), ("ho2", 1.0)),
      ("arr", 5.2e-12, 0.0, -504.0)),
    R(("ole", "o3"), (("hcho", 0.5), ("ald2", 0.5), ("co", 0.3)),
      ("arr", 1.4e-14, 0.0, 2105.0)),
    R(("ald2", "oh"), (("c2o3", 1.0),), ("arr", 7.0e-12, 0.0, -250.0)),
    R(("ald2",), (("co", 1.0), ("ho2", 2.0), ("hcho", 1.0)), ("phot", "ald", 1.0)),
    R(("c2o3", "no"), (("no2", 1.0), ("ch3o2", 1.0), ("co", 1.0)),
      ("arr", 5.4e-12, 0.0, -250.0)),
    R(("c2o3", "no2"), (("pan", 1.0),), ("arr", 8.0e-12, 0.0, 0.0)),
    R(("pan",), (("c2o3", 1.0), ("no2", 1.0)), ("arr", 9.4e16, 0.0, 14000.0)),
    R(("isop", "oh"), (("xo2", 0.99), ("hcho", 0.63), ("ho2", 0.91)),
      ("arr", 2.5e-11, 0.0, -408.0)),
    R(("isop", "o3"), (("hcho", 0.6), ("ald2", 0.39), ("co", 0.36)),
      ("arr", 1.2e-14, 0.0, 2013.0)),
    R(("xo2", "no"), (("no2", 1.0),), ("arr", 2.8e-12, 0.0, -300.0)),
    R(("xo2", "ho2"), ((),), ("arr", 7.5e-12, 0.0, -700.0)),
]
NR_RXN = len(REACTIONS)

# default clear-sky overhead-sun photolysis frequencies [1/s]
J_CLEAR = {
    "no2": 8.9e-3, "o3_o1d": 3.5e-5, "no3": 0.18, "hono": 1.7e-3,
    "h2o2": 7.0e-6, "hcho_r": 3.1e-5, "hcho_m": 4.5e-5, "ald": 5.0e-6,
}
PHOT_NAMES = tuple(J_CLEAR.keys())


def _build_tables():
    """Dense stoichiometry matrices: loss L (ns, nrxn) reactant orders and
    net production P (ns, nrxn)."""
    order = np.zeros((NS, NR_RXN))
    net = np.zeros((NS, NR_RXN))
    rate_kind = []
    rate_params = []
    for j, (reacts, prods, spec) in enumerate(REACTIONS):
        for s in reacts:
            order[IDX[s], j] += 1.0
            net[IDX[s], j] -= 1.0
        for prod in prods:
            if not prod:
                continue   # pure-loss reaction, e.g. OH + HO2 -> H2O
            s, st = prod
            net[IDX[s], j] += st
        rate_kind.append(spec[0])
        rate_params.append(spec[1:])
    return order, net, rate_kind, rate_params


_ORDER, _NET, _RKIND, _RPARAMS = _build_tables()


def rate_constants(t_air: jax.Array, m_air: jax.Array,
                   j_scale: jax.Array) -> jax.Array:
    """(nrxn, ...) rate constants. t_air [K]; m_air [molec/cm3] (unused for
    the folded-in pseudo-1st-order reactions); j_scale: photolysis scaling
    (cos-zenith x cloud factor), broadcastable to t_air."""
    ks = []
    for kind, params in zip(_RKIND, _RPARAMS):
        if kind == "arr":
            a, n, e_r = params
            k = a * (t_air / 300.0) ** n * jnp.exp(-e_r / t_air)
        elif kind == "phot":
            name, scale = params
            k = J_CLEAR[name] * scale * j_scale * jnp.ones_like(t_air)
        else:
            raise ValueError(kind)
        ks.append(k)
    return jnp.stack(ks)


def _prod_loss(conc: jax.Array, k: jax.Array):
    """conc (ns, ...), k (nrxn, ...) -> dc/dt (ns, ...) in molec/cm3/s."""
    order = jnp.asarray(_ORDER, conc.dtype)
    net = jnp.asarray(_NET, conc.dtype)
    logc = jnp.log(jnp.maximum(conc, 1e-10))
    # reaction velocity v_j = k_j * prod_i c_i^order_ij  (dense log-matmul)
    logv = jnp.einsum("ij,i...->j...", order, logc)
    v = k * jnp.exp(logv)
    dcdt = jnp.einsum("ij,j...->i...", net, v)
    return dcdt, v


def _jacobian(conc, k, v):
    """J[i,l] = d(dc_i/dt)/dc_l, dense (ns, ns, ...)."""
    order = jnp.asarray(_ORDER, conc.dtype)
    net = jnp.asarray(_NET, conc.dtype)
    cinv = 1.0 / jnp.maximum(conc, 1e-10)
    # dv_j/dc_l = v_j * order_lj / c_l
    dvdc = jnp.einsum("j...,lj->lj...", v, order) * cinv[:, None]
    jac = jnp.einsum("ij,lj...->il...", net, dvdc)
    return jac


def step_ros2(conc: jax.Array, k: jax.Array, dt: float) -> jax.Array:
    """One 2-stage Rosenbrock (ROS2) step, batched over trailing dims.

    conc (ns, ncell): molec/cm3. Dense (ns x ns) linear solves batched over
    cells — MXU-shaped work replacing KPP's generated sparse solves.
    """
    gamma = 1.0 + 1.0 / np.sqrt(2.0)
    f0, v0 = _prod_loss(conc, k)
    jac = _jacobian(conc, k, v0)                      # (ns, ns, ncell)
    ncell = conc.shape[-1]
    eye = jnp.eye(NS, dtype=conc.dtype)[..., None]
    a_mat = eye - gamma * dt * jac                    # (ns, ns, ncell)
    a_b = jnp.moveaxis(a_mat, -1, 0)                  # (ncell, ns, ns)

    k1 = jnp.linalg.solve(a_b, jnp.moveaxis(f0, -1, 0)[..., None])[..., 0]
    k1 = jnp.moveaxis(k1, 0, -1)                      # (ns, ncell)
    c1 = jnp.maximum(conc + dt * k1, 0.0)
    f1, _ = _prod_loss(c1, k)
    rhs2 = f1 - 2.0 * k1
    k2 = jnp.linalg.solve(a_b, jnp.moveaxis(rhs2, -1, 0)[..., None])[..., 0]
    k2 = jnp.moveaxis(k2, 0, -1)
    out = conc + 1.5 * dt * k1 + 0.5 * dt * k2
    return jnp.maximum(out, 0.0)


def integrate(conc: jax.Array, k: jax.Array, dt_total: float,
              n_sub: int = 4) -> jax.Array:
    """Integrate the mechanism over dt_total with fixed ROS2 substeps
    (fixed iteration count: the TPU-friendly replacement for adaptive KPP
    stepping; SURVEY.md §7.3-5 accuracy-vs-iterations tradeoff)."""
    dt = dt_total / n_sub
    for _ in range(n_sub):
        conc = step_ros2(conc, k, dt)
    return conc
