"""Varying-manual-axes (VMA) helper for `lax.scan` under `shard_map`.

Under `jax.shard_map`, arrays carry a varying-manual-axes type: values built
only from replicated inputs (e.g. `jnp.zeros`, solar constants) are
*replicated*, values touching sharded fields are *varying over the mesh*.
A `lax.scan` whose carry starts replicated but whose body mixes in varying
data fails the carry typecheck ("varying manual axes do not match").  The
fix is to upgrade the initial carry to varying up front — numerically a
no-op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tie_vma(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Return `x` unchanged numerically, but with (at least) the varying
    manual axes of `ref` — add a zero scalar derived from `ref`."""
    z = (ref.ravel()[0] * 0).astype(x.dtype)
    return x + z
