from wrfchem_arc_interactions_tpu.grid.grid import (  # noqa: F401
    Grid,
    make_eta_levels,
    make_grid,
)
