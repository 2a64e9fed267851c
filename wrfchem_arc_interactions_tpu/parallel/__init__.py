from wrfchem_arc_interactions_tpu.parallel.halo import HaloOps  # noqa: F401
from wrfchem_arc_interactions_tpu.parallel.mesh import make_mesh  # noqa: F401
