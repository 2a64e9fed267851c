"""Aerosol optical properties: MOSAIC bins -> (tau, ssa, g) per radiation
band (canonical: chem/module_optical_driver.F + module_optical_averaging.F
optical_averaging/mieaer; SURVEY.md §2.3, §3.3).

Per (cell, bin, band): volume-average the complex refractive index over the
species mix including water (aer_op_opt=1 volume mixing; Maxwell-Garnett /
core-shell are later-round options), get the wet size parameter, evaluate
the Chebyshev-fit Mie efficiencies with bilinear (n_r, log n_i)
interpolation.

XLA-compile-friendly structure (the naive unrolled bins x bands x
Chebyshev-order graph took ~7 minutes to compile): the SW and LW band axes
are fused into one 30-band axis, bins are a `lax.scan`, and the Clenshaw
recurrence is a `lax.fori_loop` whose body does the (n_r, n_i) bilinear
table gather for one coefficient — peak temporaries are two
(nband, nz, ny, nx) buffers and the graph is tiny.

Writes the tau_aer_sw/ssa_aer_sw/asy_aer_sw/tau_aer_lw state arrays read by
the radiation driver at the next radt alarm — the ARC direct-effect bridge
("Mie optics recomputed each radiation call", BASELINE config 4, is
achieved by calling this from chem_driver every chemdt <= radt).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wrfchem_arc_interactions_tpu.chem import mie
from wrfchem_arc_interactions_tpu.chem.mosaic import bins as mbins
from wrfchem_arc_interactions_tpu.physics.radiation import bands as rbands

UG_TO_KG = 1.0e-9


def _interp_weights(nr, ni):
    """Bilinear index/weight sets into the (NR_GRID, log10 NI_GRID) tables."""
    nrg = mie.NR_GRID
    fr = (jnp.clip(nr, nrg[0], nrg[-1]) - nrg[0]) / (nrg[1] - nrg[0])
    jr = jnp.clip(jnp.floor(fr).astype(jnp.int32), 0, len(nrg) - 2)
    wr = fr - jr
    lni = jnp.log10(jnp.clip(ni, 1e-9, 1.0))
    fi = (lni - (-9.0)) / 1.0
    ji = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, len(mie.NI_GRID) - 2)
    wi = fi - ji
    return jr, wr, ji, wi


def _poly_cheb_eval(C: "np.ndarray", nr_n, u, t):
    """Evaluate the gather-free tensor-polynomial Mie fit: Clenshaw in t
    with each coefficient c_k(nr, ni) evaluated by nested Horner with
    *scalar* (compile-time constant) coefficients — pure fused VPU FMA
    chains, no gathers, no dynamic control flow."""
    b0 = 0.0 * t
    b1 = b0
    c0 = None
    for k in range(mie.NCHEB - 1, -1, -1):
        ck = None
        for a in range(mie.DEG_NR - 1, -1, -1):
            racc = None
            for b in range(mie.DEG_NI - 1, -1, -1):
                cf = float(C[k, a, b])
                racc = cf + (0.0 * u if racc is None else racc * u)
            ck = racc + (0.0 if ck is None else ck * nr_n)
        b0, b1 = 2.0 * t * b0 - b1 + ck, b0
        if k == 0:
            c0 = ck
    return b0 - t * b1 - 0.5 * c0


def _hat_weights(nr_n, u):
    """The 80 bilinear hat weights over the (8, 10) refractive-index grid:
    w_{a,b} = tri(nr_n*7 - a) * tri(u*9 - b) with tri(s) = max(0, 1-|s|).
    Rows sum to 1 for inputs in [0, 1]; exact node interpolation."""
    n_nr = len(mie.NR_GRID)
    n_ni = len(mie.NI_GRID)
    fr = nr_n * (n_nr - 1)
    fi = u * (n_ni - 1)
    wa = [jnp.maximum(0.0, 1.0 - jnp.abs(fr - a)) for a in range(n_nr)]
    wb = [jnp.maximum(0.0, 1.0 - jnp.abs(fi - b)) for b in range(n_ni)]
    return [a * b for a in wa for b in wb]


def _cheb_eval_bands(G, nr_n, u, t):
    """Production evaluator (XLA path): lax.scan over the band axis; the
    body builds the 80 hat weights, contracts ALL 3*NCHEB Chebyshev
    coefficients as ONE (90, 80) x (80, ncell) matmul — EXACT bilinear
    interpolation of the grid tables (mie.build_grid_matrix; the
    tensor-poly refit this replaced was ill-conditioned, see that
    docstring) — and runs Clenshaw unrolled.

    nr_n, u, t: (nband, *shp) normalised inputs.
    Returns (ln_qext, ln_qsca, g), each (nband, *shp)."""
    nch = mie.NCHEB
    dtype = t.dtype
    C = jnp.asarray(G, dtype)
    shp = t.shape[1:]

    def band_body(_, xs):
        nr_b, u_b, t_b = (x.reshape(-1) for x in xs)         # (N,)
        W = jnp.stack(_hat_weights(nr_b, u_b))               # (80, N)
        cks = C @ W                                          # (3*nch, N)
        t2 = 2.0 * t_b

        def clenshaw(ck):
            b0 = b1 = jnp.zeros_like(t_b)
            for k in range(nch - 1, -1, -1):
                b0, b1 = t2 * b0 - b1 + ck[k], b0
            return (b0 - t_b * b1 - 0.5 * ck[0]).reshape(shp)

        return None, tuple(clenshaw(cks[i * nch:(i + 1) * nch])
                           for i in range(3))

    _, (qe, qs, g) = lax.scan(band_body, None, (nr_n, u, t))
    return qe, qs, g


def _poly_cheb_eval_bands(ptabs, nr_n, u, t):
    """All three tensor-polynomial tables evaluated for every band with a
    compile-size-bounded graph: a `lax.scan` over the band axis whose body
    builds the 35 monomials nr^a*u^b once, evaluates ALL 3*NCHEB Chebyshev
    coefficients as ONE (90, 35) x (35, ncell) matmul (MXU work), and runs
    the Clenshaw recurrence as a `fori_loop`.

    Numerically equivalent to `_poly_cheb_eval` per table/band (same
    recurrence, coefficients contracted by matmul instead of scalar
    Horner).  The unrolled scalar-Horner form emits ~6300 elementwise ops
    in a single fusion — XLA's TPU fusion passes go superlinear on that
    chain and the remote compile of the optics program ran >15 min (it was
    the dominant piece of the chem executable and the real culprit behind
    the 'large-shard cold compile exceeds the service timeout' defect);
    this form lowers to ~60 ops + two loops and compiles in seconds.

    nr_n, u, t: (nband, *shp) normalised inputs.
    Returns (ln_qext, ln_qsca, g), each (nband, *shp)."""
    nch = mie.NCHEB
    C_all = np.concatenate([ptabs.C_qext.reshape(nch, -1),
                            ptabs.C_qsca.reshape(nch, -1),
                            ptabs.C_g.reshape(nch, -1)])     # (3*nch, 35)
    dtype = t.dtype
    C = jnp.asarray(C_all, dtype)
    shp = t.shape[1:]

    def band_body(_, xs):
        nr_b, u_b, t_b = (x.reshape(-1) for x in xs)         # (N,)
        pr = [jnp.ones_like(nr_b)]
        for _ in range(mie.DEG_NR - 1):
            pr.append(pr[-1] * nr_b)
        pu = [jnp.ones_like(u_b)]
        for _ in range(mie.DEG_NI - 1):
            pu.append(pu[-1] * u_b)
        M = jnp.stack([a * b for a in pr for b in pu])       # (35, N)
        cks = C @ M                                          # (3*nch, N)

        t2 = 2.0 * t_b

        def clenshaw(ck):
            # unrolled: ~3 ops per order on (N,) buffers — with the
            # coefficients already contracted by the matmul this is only
            # ~90 ops/table, well under the fusion-pass blowup threshold
            b0 = b1 = jnp.zeros_like(t_b)
            for k in range(nch - 1, -1, -1):
                b0, b1 = t2 * b0 - b1 + ck[k], b0
            return (b0 - t_b * b1 - 0.5 * ck[0]).reshape(shp)

        return None, tuple(clenshaw(cks[i * nch:(i + 1) * nch])
                           for i in range(3))

    _, (qe, qs, g) = lax.scan(band_body, None, (nr_n, u, t))
    return qe, qs, g


def _interp_coefs(tabs: mie.MieTables, nr, ni, dtype):
    """Full (NCHEB, ...) interpolated coefficient arrays (test helper)."""
    jr, wr, ji, wi = _interp_weights(nr, ni)

    def interp(table):
        tb = jnp.asarray(table, dtype)
        c = ((1 - wr)[..., None] * ((1 - wi)[..., None] * tb[jr, ji]
                                    + wi[..., None] * tb[jr, ji + 1])
             + wr[..., None] * ((1 - wi)[..., None] * tb[jr + 1, ji]
                                + wi[..., None] * tb[jr + 1, ji + 1]))
        return jnp.moveaxis(c, -1, 0)

    return interp(tabs.coef_qext), interp(tabs.coef_qsca), interp(tabs.coef_g)


def _use_pallas() -> bool:
    """Production Mie-evaluator backend: the VMEM kernel on TPU (it holds
    the whole contraction on-chip — ops/pallas_mie.py; the XLA band-scan
    measured 487 ms/call at config-4 shapes vs ~10 ms essential), the XLA
    band-scan elsewhere.  Override with WRFCHEM_OPTICS_BACKEND=xla|pallas."""
    import os
    forced = os.environ.get("WRFCHEM_OPTICS_BACKEND")
    if forced:
        return forced == "pallas"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:               # pragma: no cover
        return False


def bin_optics(d_wet, n_air, nr_eff, ni_eff, wavelengths_um, tabs: mie.MieTables):
    """Mie optics for one bin over a band axis.

    d_wet: (...,) wet diameter [m]; n_air: (...,) number per m3;
    nr_eff/ni_eff: (nband, ...); wavelengths_um: (nband,).
    Returns (ext, sca, g_as): ext/sca in [1/m].
    """
    dtype = d_wet.dtype
    lam = jnp.asarray(np.asarray(wavelengths_um) * 1e-6, dtype).reshape(
        (-1,) + (1,) * d_wet.ndim)
    x = jnp.pi * d_wet[None] / lam
    lnx = jnp.log(jnp.maximum(x, 1e-6))
    t = jnp.clip(2.0 * (lnx - tabs.lnx_min) / (tabs.lnx_max - tabs.lnx_min) - 1.0,
                 -1.0, 1.0)
    nrg = mie.NR_GRID
    nr_n = (jnp.clip(nr_eff, nrg[0], nrg[-1]) - nrg[0]) / (nrg[-1] - nrg[0])
    u = (jnp.log10(jnp.clip(ni_eff, 1e-9, 1.0)) + 9.0) / 9.0
    t = jnp.broadcast_to(t, nr_n.shape)
    if _use_pallas():
        from wrfchem_arc_interactions_tpu.ops.pallas_mie import (
            cheb_eval_pallas,
        )
        ln_qe, ln_qs, gg = cheb_eval_pallas(nr_n, u, t)
    else:
        ln_qe, ln_qs, gg = _cheb_eval_bands(mie.build_grid_matrix(),
                                            nr_n, u, t)
    qe = jnp.exp(jnp.clip(ln_qe, -60.0, 3.0))
    qs = jnp.exp(jnp.clip(ln_qs, -60.0, 3.0))
    qs = jnp.minimum(qs, qe)
    gg = jnp.clip(gg, 0.0, 1.0)
    area = 0.25 * jnp.pi * d_wet ** 2 * n_air
    return qe * area[None], qs * area[None], gg


def aerosol_optics(chem_fields: Dict[str, jax.Array], rho_air, dz,
                   nbin: int) -> Dict[str, jax.Array]:
    """(tau, ssa, asy) per SW band + absorption tau per LW band.

    chem_fields: state chem arrays (ug/kg masses, #/kg numbers), each
    (nz, ny, nx); rho_air, dz same shape.
    """
    dtype = rho_air.dtype
    tabs = mie.build_cheb_tables()
    sw_um = rbands.band_centers_sw_um()
    lw_um = rbands.band_centers_lw_um()
    all_um = np.concatenate([sw_um, lw_um])
    nb_sw = rbands.NBND_SW
    nb_all = len(all_um)
    sp = mbins.species_arrays(all_um)
    names = list(mbins.AER_SPECIES) + ["water"]
    nsp = len(names)
    shp = rho_air.shape
    ndim = len(shp)

    # stacked per-bin inputs: (nbin, nsp, *shp) volumes and (nbin, *shp) num
    vols = jnp.stack([
        jnp.stack([chem_fields[f"chem_{s}_a{b:02d}"] * (UG_TO_KG / mbins.DENSITY[s])
                   for s in names])
        for b in range(1, nbin + 1)])
    nums = jnp.stack([jnp.maximum(chem_fields[f"chem_num_a{b:02d}"], 1.0)
                      for b in range(1, nbin + 1)])

    nr_sp = jnp.asarray(sp["nr"], dtype)        # (nsp, nband)
    ni_sp = jnp.asarray(sp["ni"], dtype)
    bshape = (nb_all,) + (1,) * ndim

    def one_bin(carry, xs):
        ext_a, sca_a, gsca_a = carry
        v_sp, num = xs                           # (nsp, *shp), (*shp)
        vol = jnp.maximum(jnp.sum(v_sp, axis=0), 1e-30)
        frac = v_sp / vol                        # (nsp, *shp)
        d_wet = jnp.clip((6.0 * vol / (jnp.pi * num)) ** (1.0 / 3.0),
                         1e-9, 50e-6)
        n_air = num * rho_air
        # volume-mixed refractive index per band: (nband, *shp)
        nr_eff = jnp.einsum("sb,s...->b...", nr_sp, frac)
        ni_eff = jnp.einsum("sb,s...->b...", ni_sp, frac)
        ext, sca, gg = bin_optics(d_wet, n_air, nr_eff, ni_eff, all_um, tabs)
        return (ext_a + ext * dz[None], sca_a + sca * dz[None],
                gsca_a + gg * sca * dz[None]), None

    from wrfchem_arc_interactions_tpu.utils.vma import tie_vma
    # carry must be mesh-varying like the body output under shard_map
    zero = tie_vma(jnp.zeros((nb_all,) + shp, dtype), vols)
    (ext_t, sca_t, gsca_t), _ = lax.scan(one_bin, (zero, zero, zero),
                                         (vols, nums))

    tau_sw = ext_t[:nb_sw]
    sca_sw = sca_t[:nb_sw]
    gsca_sw = gsca_t[:nb_sw]
    tau_lw_abs = ext_t[nb_sw:] - sca_t[nb_sw:]
    ssa = jnp.where(tau_sw > 0, sca_sw / jnp.maximum(tau_sw, 1e-30), 1.0)
    asy = jnp.where(sca_sw > 0, gsca_sw / jnp.maximum(sca_sw, 1e-30), 0.0)
    return {"tau_aer_sw": tau_sw, "ssa_aer_sw": jnp.clip(ssa, 0.0, 1.0),
            "asy_aer_sw": jnp.clip(asy, 0.0, 1.0),
            "tau_aer_lw": jnp.maximum(tau_lw_abs, 0.0)}
