"""Batched tridiagonal (Thomas) solve along the leading (z) axis.

The vertically implicit w-phi acoustic solve needs one tridiagonal solve per
column per substep (canonical: the k-loops of dyn_em/module_small_step_em.F
advance_w; SURVEY.md §2.1 'Acoustic (small) steps', §7.3-3).  The scan runs
over z (leading axis, length ~nz) with (ny, nx) planes as the carry, so the
VPU vectorises each elimination step over the whole horizontal tile while
the serial dependency stays in the short vertical direction — the TPU
expression of "columns are rank-local, z never sharded".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def thomas(a: jax.Array, b: jax.Array, cc: jax.Array, d: jax.Array) -> jax.Array:
    """Solve a[k] x[k-1] + b[k] x[k] + cc[k] x[k+1] = d[k], k = 0..n-1.

    All inputs are (n, ...) with arbitrary (batched) trailing dims; a[0] and
    cc[n-1] are ignored.  Standard Thomas forward elimination + back
    substitution, both as `lax.scan` over the leading axis.
    """

    def fwd(carry, abcd):
        cp_km1, dp_km1 = carry
        ak, bk, ck, dk = abcd
        denom = bk - ak * cp_km1
        inv = 1.0 / denom
        cp = ck * inv
        dp = (dk - ak * dp_km1) * inv
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cp, dp) = lax.scan(fwd, (zeros, zeros), (a, b, cc, d))

    def bwd(x_kp1, cpdp):
        cpk, dpk = cpdp
        xk = dpk - cpk * x_kp1
        return xk, xk

    _, x_rev = lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return x_rev


def thomas_dense_reference(a, b, cc, d):
    """O(n^2) dense solve for testing (numpy-style, small n only)."""
    import numpy as np
    a, b, cc, d = (np.asarray(v, np.float64) for v in (a, b, cc, d))
    n = a.shape[0]
    flatten = d.reshape(n, -1)
    out = np.empty_like(flatten)
    for col in range(flatten.shape[1]):
        m = np.zeros((n, n))
        for k in range(n):
            m[k, k] = b.reshape(n, -1)[k, col % b.reshape(n, -1).shape[1]] if b.ndim > 1 else b[k]
            if k > 0:
                m[k, k - 1] = a.reshape(n, -1)[k, col % a.reshape(n, -1).shape[1]] if a.ndim > 1 else a[k]
            if k < n - 1:
                m[k, k + 1] = cc.reshape(n, -1)[k, col % cc.reshape(n, -1).shape[1]] if cc.ndim > 1 else cc[k]
        out[:, col] = np.linalg.solve(m, flatten[:, col])
    return out.reshape(d.shape)
