"""Pallas TPU kernel for the sparse-LU ROS2 gas-chemistry step.

Why a kernel: the XLA formulation of the KPP-style sparse solve keeps the
LU values in an (nnz, ncell) HBM array and performs the per-pivot
elimination as gather -> outer-product -> scatter; measured on hardware,
XLA lowers those row scatters so poorly that a 5e5-cell chem call spent
6-13 s on what is ~2 GB of essential traffic (see chem/gas.py history and
the round-4 perf evidence).  Here the WHOLE Rosenbrock stage runs on-chip
per 1024-cell tile:

- cells tile as (8, 128) — one native f32 vector register per matrix row,
  so every one of the ~850 elimination updates is a single full-width VPU
  op (no gathers, no scatters, no HBM round-trips between them);
- the only HBM traffic is the tile load/store of conc and k:
  (55 + 110 + 55) x 4 B per cell per substep — the speed-of-light minimum
  for this operator;
- every index comes from the symbolic factorization precomputed in
  chem/gas.py (`_SparseKinetics`), unrolled as straight-line SSA code
  (the ~470 live rows spill from vector registers to VMEM, which is
  exactly where they belong).

The kernel is generated from the mechanism's symbolic structure, so user
mechanisms compiled by tools/mechc get the same fast path.  Equivalence
with the XLA path is pinned by tests/test_gas_mech.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = SUBLANES * LANES          # cells per kernel instance


def _symbolic_lists(kin):
    """Plain-python copies of the symbolic structure (ints/floats only)."""
    ns, nr = kin.ns, kin.nr
    scratch = int(kin.nnz)
    f_terms = [[] for _ in range(ns)]
    for tgt, rxn, coef in zip(kin.f_tgt, kin.f_rxn, kin.f_coef):
        f_terms[int(tgt)].append((int(rxn), float(coef)))
    jac_terms = [[] for _ in range(kin.njac)]
    for tgt, pair, coef in zip(kin.jc_tgt, kin.jc_pair, kin.jc_coef):
        jac_terms[int(tgt)].append((int(pair), float(coef)))
    stages = []
    for kk in range(ns):
        ik = [int(x) for x in kin.ikm[kk] if int(x) != scratch]
        kj = [int(x) for x in kin.kjm[kk] if int(x) != scratch]
        upd = [[int(kin.updm[kk][a * kin.maxr + b]) for b in range(len(kj))]
               for a in range(len(ik))]
        stages.append((int(kin.pkk[kk]), ik, kj, upd))
    fw_rows = [[] for _ in range(ns)]
    for li in range(kin.fw_ep.shape[0]):
        for ep, ec, er in zip(kin.fw_ep[li], kin.fw_ec[li], kin.fw_er[li]):
            if int(er) != ns:
                fw_rows[int(er)].append((int(ep), int(ec)))
    bw_rows = [[] for _ in range(ns)]
    for li in range(kin.bw_ep.shape[0]):
        for ep, ec, er in zip(kin.bw_ep[li], kin.bw_ec[li], kin.bw_er[li]):
            if int(er) != ns:
                bw_rows[int(er)].append((int(ep), int(ec)))
    return dict(
        ns=ns, nr=nr, nnz=int(kin.nnz),
        r1=[int(x) for x in kin.r1], r2=[int(x) for x in kin.r2],
        f_terms=f_terms,
        p_rxn=[int(x) for x in kin.p_rxn],
        p_oth=[int(x) for x in kin.p_oth],
        p_coef=[float(x) for x in kin.p_coef],
        jac_terms=jac_terms,
        jac_pos=[int(x) for x in kin.jac_pos],
        diag_pos=set(int(x) for x in kin.diag_pos),
        stages=stages, fw_rows=fw_rows, bw_rows=bw_rows,
        perm=[int(x) for x in kin.perm], iperm=[int(x) for x in kin.iperm],
    )


def _make_step_kernel(sym, dts: float):
    """One ROS2 substep kernel over a (ns|nr, 1, 8, 128) cell tile."""
    ns, nr = sym["ns"], sym["nr"]
    gamma = 1.0 + 1.0 / np.sqrt(2.0)
    gdt = np.float32(gamma * dts)
    dtf = np.float32(dts)

    def kernel(conc_ref, k_ref, out_ref):
        c = [conc_ref[i, 0] for i in range(ns)]
        kr = [k_ref[j, 0] for j in range(nr)]

        def prod_rates(cc):
            v = []
            for j in range(nr):
                vj = kr[j]
                if sym["r1"][j] != ns:
                    vj = vj * cc[sym["r1"][j]]
                if sym["r2"][j] != ns:
                    vj = vj * cc[sym["r2"][j]]
                v.append(vj)
            f = []
            for i in range(ns):
                acc = None
                for (j, coef) in sym["f_terms"][i]:
                    t = v[j] if coef == 1.0 else coef * v[j]
                    acc = t if acc is None else acc + t
                f.append(acc if acc is not None
                         else jnp.zeros((SUBLANES, LANES), jnp.float32))
            return f

        f0 = prod_rates(c)
        # dv_j/dc_l pairs and the Jacobian entries they sum into
        dv = []
        for pid in range(len(sym["p_rxn"])):
            d = kr[sym["p_rxn"][pid]]
            if sym["p_coef"][pid] != 1.0:
                d = sym["p_coef"][pid] * d
            if sym["p_oth"][pid] != ns:
                d = d * c[sym["p_oth"][pid]]
            dv.append(d)

        # assemble A = I - gamma dt J on the LU pattern (SSA rows; fill
        # positions start at 0, untouched diagonals at 1)
        vals = [None] * sym["nnz"]
        for e, terms in enumerate(sym["jac_terms"]):
            acc = None
            for (pid, coef) in terms:
                t = dv[pid] if coef == 1.0 else coef * dv[pid]
                acc = t if acc is None else acc + t
            p = sym["jac_pos"][e]
            vals[p] = (1.0 - gdt * acc) if p in sym["diag_pos"] \
                else (-gdt * acc)
        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
        one = jnp.ones((SUBLANES, LANES), jnp.float32)
        for p in range(sym["nnz"]):
            if vals[p] is None:
                vals[p] = one if p in sym["diag_pos"] else zero

        # sparse LU with diagonal pivots (static unrolled fill schedule)
        invd = [None] * ns
        for kk, (pkk, ik, kj, upd) in enumerate(sym["stages"]):
            idk = 1.0 / vals[pkk]
            invd[kk] = idk
            for a, pik in enumerate(ik):
                lik = vals[pik] * idk
                vals[pik] = lik
                for b, pkj in enumerate(kj):
                    pu = upd[a][b]
                    vals[pu] = vals[pu] - lik * vals[pkj]

        def solve(b):
            y = [None] * ns
            for q in range(ns):
                acc = b[sym["perm"][q]]
                for (ep, ec) in sym["fw_rows"][q]:
                    acc = acc - vals[ep] * y[ec]
                y[q] = acc
            # x[ec] here is the FINAL solution value (already scaled by
            # invd[ec]) — unlike the scan path's running z which scales
            # at read time
            x = [None] * ns
            for q in range(ns - 1, -1, -1):
                acc = y[q]
                for (ep, ec) in sym["bw_rows"][q]:
                    acc = acc - vals[ep] * x[ec]
                x[q] = acc * invd[q]
            out = [None] * ns
            for q in range(ns):
                out[sym["perm"][q]] = x[q]
            return out

        k1 = solve(f0)
        c1 = [jnp.maximum(c[i] + dtf * k1[i], 0.0) for i in range(ns)]
        f1 = prod_rates(c1)
        k2 = solve([f1[i] - 2.0 * k1[i] for i in range(ns)])
        for i in range(ns):
            out_ref[i, 0] = jnp.maximum(
                c[i] + 1.5 * dtf * k1[i] + 0.5 * dtf * k2[i], 0.0)

    return kernel


@functools.lru_cache(maxsize=8)
def _step_fn(kin_key, dts: float, interpret: bool):
    from wrfchem_arc_interactions_tpu.chem import gas
    kin = gas._KIN_CACHE[kin_key]
    sym = _symbolic_lists(kin)
    kernel = _make_step_kernel(sym, dts)
    ns, nr = sym["ns"], sym["nr"]

    def step(conc_t, k_t):
        nt = conc_t.shape[1]
        # Under shard_map (the production multi-chip chem path:
        # models/driver.py jits chem_driver over the mesh) pallas_call's
        # out_shape must carry the varying-manual-axes type of its inputs,
        # or the trace fails the vma check.  Outside shard_map `vma` is
        # empty and this is the same plain ShapeDtypeStruct as before.
        try:
            vma = frozenset(jax.typeof(conc_t).vma) | frozenset(
                jax.typeof(k_t).vma)
        except Exception:               # pragma: no cover
            vma = frozenset()
        out_shape = (jax.ShapeDtypeStruct(conc_t.shape, jnp.float32, vma=vma)
                     if vma else
                     jax.ShapeDtypeStruct(conc_t.shape, jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((ns, 1, SUBLANES, LANES),
                             lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nr, 1, SUBLANES, LANES),
                             lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ns, 1, SUBLANES, LANES),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(conc_t, k_t)

    return step


def integrate_pallas(conc: jax.Array, k: jax.Array, dt_total: float,
                     n_sub: int, interpret: bool = False) -> jax.Array:
    """Drop-in replacement for the chunked XLA integrate: (ns, ncell) +
    (nr, ncell) -> (ns, ncell), n_sub ROS2 substeps, each one kernel
    launch over 1024-cell tiles."""
    from wrfchem_arc_interactions_tpu.chem import gas
    kin = gas._kinetics()
    kin_key = next(kk for kk, vv in gas._KIN_CACHE.items() if vv is kin)
    ns, ncell = conc.shape
    nr = k.shape[0]
    nt = -(-ncell // TILE)
    pad = nt * TILE - ncell
    conc_p = jnp.pad(conc.astype(jnp.float32), ((0, 0), (0, pad)),
                     mode="edge")
    k_p = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, pad)), mode="edge")
    conc_t = conc_p.reshape(ns, nt, SUBLANES, LANES)
    k_t = k_p.reshape(nr, nt, SUBLANES, LANES)
    step = _step_fn(kin_key, float(dt_total) / n_sub, interpret)
    for _ in range(n_sub):
        conc_t = step(conc_t, k_t)
    out = conc_t.reshape(ns, nt * TILE)[:, :ncell]
    # the kernel computes in f32; match the XLA path's dtype contract
    # (preserve the caller's dtype) — static check, so f32 inputs trace
    # byte-identically to before
    if out.dtype != conc.dtype:
        out = out.astype(conc.dtype)
    return out
