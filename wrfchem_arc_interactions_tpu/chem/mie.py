"""Exact Mie scattering (Bohren & Huffman series) + Chebyshev fast-path
table generation (canonical: the Ghan et al. Chebyshev-expansion fast Mie of
chem/module_optical_averaging.F `mieaer`/`binterp`; SURVEY.md §2.3
'Aerosol optical properties (Mie)').

Two layers, mirroring the reference design:

- `bhmie`: the exact series in host numpy/f64 — the correctness oracle
  (SURVEY.md §4.5: "Mie optics vs exact Mie series") and the generator of
  the fast-path tables.
- `build_cheb_tables`: per (band-wavelength, refractive-index grid point),
  Chebyshev coefficients of Q_ext, Q_sca, g as functions of ln(size
  parameter), evaluated at runtime by `chem.optics` with bilinear (n_r,
  n_i) interpolation — dense, gather-light TPU work.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

# Chebyshev fit configuration (Ghan et al. use order ~30 over the bin range)
NCHEB = 30
X_MIN, X_MAX = 1e-3, 60.0          # size-parameter range covered by the fit
NR_GRID = np.linspace(1.25, 2.1, 8)          # uniform -> arithmetic indexing
NI_GRID = np.logspace(-9.0, 0.0, 10)         # uniform in log10, 1 decade steps


def bhmie(x: float, m: complex):
    """Mie efficiencies for size parameter x and refractive index m.

    Returns (q_ext, q_sca, g). Bohren & Huffman downward-recurrence
    formulation, numpy float64/complex128 (host-side oracle only).
    """
    x = float(x)
    if x <= 0:
        return 0.0, 0.0, 0.0
    nstop = int(x + 4.0 * x ** (1.0 / 3.0) + 2.0)
    nmx = int(max(nstop, abs(m * x)) + 16)
    y = m * x
    # logarithmic derivative D by downward recurrence
    d = np.zeros(nmx + 1, dtype=complex)
    for n in range(nmx, 0, -1):
        d[n - 1] = n / y - 1.0 / (d[n] + n / y)
    # Riccati-Bessel by upward recurrence
    psi0, psi1 = np.cos(x), np.sin(x)
    chi0, chi1 = -np.sin(x), np.cos(x)
    xi1 = complex(psi1, -chi1)
    qsca = 0.0
    qext = 0.0
    gsum = 0.0
    an_prev = bn_prev = 0j
    for n in range(1, nstop + 1):
        fn = (2.0 * n + 1.0) / (n * (n + 1.0))
        psi = (2.0 * n - 1.0) * psi1 / x - psi0
        chi = (2.0 * n - 1.0) * chi1 / x - chi0
        xi = complex(psi, -chi)
        dn = d[n]
        an = ((dn / m + n / x) * psi - psi1) / ((dn / m + n / x) * xi - xi1)
        bn = ((dn * m + n / x) * psi - psi1) / ((dn * m + n / x) * xi - xi1)
        qsca += (2.0 * n + 1.0) * (abs(an) ** 2 + abs(bn) ** 2)
        qext += (2.0 * n + 1.0) * (an + bn).real
        if n > 1:
            nm1 = n - 1
            gsum += (nm1 * (nm1 + 2.0) / n) * (an_prev * np.conj(an)
                                               + bn_prev * np.conj(bn)).real
            gsum += ((2.0 * nm1 + 1.0) / (nm1 * (nm1 + 1.0))) * (
                an_prev * np.conj(bn_prev)).real
        an_prev, bn_prev = an, bn
        psi0, psi1 = psi1, psi
        chi0, chi1 = chi1, chi
        xi1 = xi
    qsca *= 2.0 / (x * x)
    qext *= 2.0 / (x * x)
    g = 4.0 / (x * x * max(qsca, 1e-12)) * gsum
    return qext, qsca, float(np.clip(g, -1.0, 1.0))


def _cheb_nodes(n: int):
    return np.cos(np.pi * (np.arange(n) + 0.5) / n)


def _cheb_fit(f_vals: np.ndarray, n: int) -> np.ndarray:
    """Chebyshev coefficients from values at the n Chebyshev nodes."""
    k = np.arange(n)
    theta = np.pi * (k + 0.5) / n
    T = np.cos(np.outer(np.arange(n), theta))     # (ncoef, nnodes)
    return (2.0 / n) * T @ f_vals


def cheb_eval(coef, t):
    """Evaluate a Chebyshev series (c0-halved convention) at t in [-1, 1]
    by Clenshaw recurrence. coef indexable along the leading (order) axis;
    numpy or jax."""
    b0 = 0.0 * t
    b1 = 0.0 * t
    n = coef.shape[0] if hasattr(coef, "shape") else len(coef)
    for k in range(n - 1, -1, -1):
        b0, b1 = 2.0 * t * b0 - b1 + coef[k], b0
    # f = b_0 - t*b_1 - c0/2
    return b0 - t * b1 - 0.5 * coef[0]


@dataclasses.dataclass(frozen=True)
class MieTables:
    """Chebyshev coefficient tables over the (nr, ni) refractive-index grid.

    Mie efficiencies depend only on (x, m), so one table serves every band:
    the band dependence enters at the call site through x = pi D / lambda_b.
    Q_ext and Q_sca are fitted in LOG space (ln Q is a smooth, nearly
    piecewise-linear function of ln x across the x^4 Rayleigh rise, which a
    raw-Q polynomial cannot track over 12 decades); g is fitted raw.
    """
    coef_qext: np.ndarray                 # (n_nr, n_ni, NCHEB) of ln(Q_ext)
    coef_qsca: np.ndarray                 # ln(Q_sca)
    coef_g: np.ndarray                    # raw g
    lnx_min: float
    lnx_max: float

    def t_of_lnx(self, lnx):
        return np.clip(2.0 * (lnx - self.lnx_min)
                       / (self.lnx_max - self.lnx_min) - 1.0, -1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class PolyMieTables:
    """Gather-free fast path: each Chebyshev coefficient c_k's dependence on
    (n_r, log10 n_i) is itself fitted by a tensor polynomial, so runtime
    evaluation is pure fused elementwise Horner arithmetic — zero table
    gathers (the axon TPU backend faults/hangs on gather-heavy kernels, and
    the VPU prefers straight-line FMA work anyway).

    C_* have shape (NCHEB, DEG_NR, DEG_NI): coefficient k of ln(Q) as
    sum_{a,b} C[k,a,b] * nr_n^a * u^b, with nr_n = (nr-1.25)/0.85 and
    u = (log10(ni)+9)/9, both in [0,1].
    """
    C_qext: np.ndarray
    C_qsca: np.ndarray
    C_g: np.ndarray
    lnx_min: float
    lnx_max: float


DEG_NR = 5      # polynomial terms in normalised nr
DEG_NI = 7      # polynomial terms in normalised log10 ni


@functools.lru_cache(maxsize=1)
def build_poly_tables() -> PolyMieTables:
    """Least-squares tensor-polynomial refit of the Chebyshev grid tables."""
    tabs = build_cheb_tables()
    nr_n = (NR_GRID - NR_GRID[0]) / (NR_GRID[-1] - NR_GRID[0])
    u = (np.log10(NI_GRID) + 9.0) / 9.0
    # design matrix over the (8 x 10) grid
    basis = np.stack([
        np.outer(nr_n ** a, u ** b).ravel()
        for a in range(DEG_NR) for b in range(DEG_NI)
    ], axis=1)                                   # (80, DEG_NR*DEG_NI)

    def fit(grid_coefs):                         # (8, 10, NCHEB)
        flat = grid_coefs.reshape(-1, NCHEB)     # (80, NCHEB)
        sol, *_ = np.linalg.lstsq(basis, flat, rcond=None)
        return sol.T.reshape(NCHEB, DEG_NR, DEG_NI)

    return PolyMieTables(
        C_qext=fit(tabs.coef_qext), C_qsca=fit(tabs.coef_qsca),
        C_g=fit(tabs.coef_g), lnx_min=tabs.lnx_min, lnx_max=tabs.lnx_max)


@functools.lru_cache(maxsize=1)
def build_grid_matrix() -> np.ndarray:
    """(3*NCHEB, n_nr*n_ni) stacked grid tables for hat-weight evaluation.

    The round-5 production evaluator: runtime computes the 80 bilinear hat
    weights w_g(nr_n, u) (tensor product of per-axis triangle functions on
    the uniform grids) and contracts them with this matrix in ONE matmul —
    EXACT bilinear interpolation of the Bohren-Huffman-derived Chebyshev
    tables, the same interpolation the canonical `binterp` performs with
    scalar gathers [chem/module_optical_averaging.F].

    This replaced the unregularized degree-(5,7) tensor-polynomial refit
    (`build_poly_tables`): that fit is near-interpolatory on the 8x10 grid
    and catastrophically ill-conditioned — measured on hardware, one-ulp
    differences in the fused prep of (nr_n, u, t) moved ln Q by O(1)
    (≈86% in Q), so two XLA programs computing the same physics disagreed
    by 2x at specific refractive indices.  Hat weights are piecewise
    linear (|∂w/∂u| ≤ 9), so the same ulp noise moves ln Q by ~1e-5."""
    tabs = build_cheb_tables()

    def flat(c):                              # (8, 10, NCHEB) -> (NCHEB, 80)
        return c.reshape(-1, NCHEB).T
    return np.concatenate([flat(tabs.coef_qext), flat(tabs.coef_qsca),
                           flat(tabs.coef_g)]).astype(np.float32)


@functools.lru_cache(maxsize=1)
def build_cheb_tables() -> MieTables:
    lnx_min, lnx_max = np.log(X_MIN), np.log(X_MAX)
    nodes_t = _cheb_nodes(NCHEB)
    lnx_nodes = 0.5 * (nodes_t + 1.0) * (lnx_max - lnx_min) + lnx_min
    x_nodes = np.exp(lnx_nodes)
    shape = (len(NR_GRID), len(NI_GRID), NCHEB)
    cq = np.zeros(shape)
    cs = np.zeros(shape)
    cg = np.zeros(shape)
    for inr, nr in enumerate(NR_GRID):
        for ini, ni in enumerate(NI_GRID):
            m = complex(nr, ni)
            qe = np.zeros(NCHEB)
            qs = np.zeros(NCHEB)
            gg = np.zeros(NCHEB)
            for j, x in enumerate(x_nodes):
                qe[j], qs[j], gg[j] = bhmie(x, m)
            cq[inr, ini] = _cheb_fit(np.log(np.maximum(qe, 1e-30)), NCHEB)
            cs[inr, ini] = _cheb_fit(np.log(np.maximum(qs, 1e-30)), NCHEB)
            cg[inr, ini] = _cheb_fit(gg, NCHEB)
    return MieTables(coef_qext=cq, coef_qsca=cs, coef_g=cg,
                     lnx_min=lnx_min, lnx_max=lnx_max)
