"""TPU-native limited-area atmosphere solver with ARC (aerosol-radiation-cloud) physics.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of WRF-Chem as
driven by the `douglowe/WRFChem-ARC-Interactions` scenario repo (see SURVEY.md):

- ARW split-explicit Runge-Kutta dynamical core (5th-order finite-volume
  advection, acoustic substeps, vertically implicit w-phi solve) on an
  Arakawa-C / terrain-following dry-mass (eta) grid.
- Column physics (RRTMG SW/LW correlated-k radiation, microphysics, PBL,
  surface) as dense vmapped kernels batched over shard-local columns.
- MOSAIC-style sectional aerosol with Mie optical properties feeding the
  radiation (direct effect) and droplet activation (indirect effect).
- 2D horizontal domain decomposition over a `jax.sharding.Mesh` with
  ppermute-based halo exchange; the vertical stays on-device (SURVEY.md §5.7).

Layout convention: 3D fields are (nz, ny, nx) with z leading (so the
per-column tridiagonal solve scans the leading axis while XLA vectorizes the
(ny, nx) trailing tile onto the VPU) and x minor-most (128-lane axis).
"""

__version__ = "0.1.0"

from wrfchem_arc_interactions_tpu.config import (  # noqa: F401
    ChemConfig,
    Config,
    DomainConfig,
    DynamicsConfig,
    PhysicsConfig,
    TimeControl,
)
