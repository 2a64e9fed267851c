"""Declarative field-spec table — the WRF Registry equivalent.

The reference generates state allocation, halo schedules, I/O lists, and
dummy-argument lists at build time from a Registry DSL compiled by a C program
(canonical: `Registry/Registry.EM_CHEM` + `tools/*.c`; SURVEY.md §2.4, §2.6-2).
Here the same single-source-of-truth role is a plain Python table of
:class:`FieldSpec`; from it we *derive* at trace time:

- the state pytree (a plain ``dict[str, jax.Array]``) with correct
  staggered shapes (:func:`wrfchem_arc_interactions_tpu.registry.state.build_state`),
- `jax.sharding.PartitionSpec`s (y, x sharded over the mesh; z on-device),
- halo-exchange membership and widths (consumed by `parallel.halo`),
- checkpoint/restart and history field lists (the `r`/`h` Registry flags).

No codegen step exists or is needed: JAX pytrees make the "generated
allocation + argument list" machinery a dict comprehension.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from wrfchem_arc_interactions_tpu.config import ChemConfig, Config, PhysicsConfig
from wrfchem_arc_interactions_tpu.config.namelist import ChemOpt, MPScheme, RAScheme

# Dimension/staggering codes. 3D fields are (z, y, x); "ZS" means staggered
# vertical axis of length nz+1 (w-levels). Horizontal staggering does NOT
# change array sizes here (deliberate deviation from WRF's (nx+1)-point
# staggered arrays): u[k,j,i] lives at the x-face i-1/2 (west face of mass
# cell i), v[k,j,i] at y-face j-1/2, so every horizontal axis has exactly
# nx (ny) points and shards uniformly over the device mesh. The "extra"
# boundary face of non-periodic domains is materialised by the halo/pad
# machinery instead of by a +1-sized array.
DIMS_ZYX = ("z", "y", "x")
DIMS_ZSYX = ("zs", "y", "x")
DIMS_YX = ("y", "x")
DIMS_Z = ("z",)

STAG_NONE = ""
STAG_X = "x"    # x-face point (u)
STAG_Y = "y"    # y-face point (v)
STAG_Z = "z"    # w-level point (w, ph)


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    name: str
    dims: Tuple[str, ...]
    stagger: str = STAG_NONE
    units: str = ""
    description: str = ""
    halo: int = 0            # halo width this field needs (max over exchanges)
    restart: bool = False    # Registry `r` flag: in the exact-restart set
    history: bool = False    # Registry `h` flag: written to history stream
    advected: bool = False   # member of the scalar-advection set
    positive: bool = False   # PD/monotonic limiter applies
    extra: Tuple[Tuple[str, int], ...] = ()  # extra leading dims, e.g. (("band", 14),)

    def shape(self, nz: int, ny: int, nx: int) -> Tuple[int, ...]:
        out = []
        for d, n in self.extra:
            out.append(n)
        for d in self.dims:
            if d == "z":
                out.append(nz)
            elif d == "zs":
                out.append(nz + 1)
            elif d == "y":
                out.append(ny)
            elif d == "x":
                out.append(nx)
            else:
                raise ValueError(d)
        return tuple(out)


def _dyn_fields() -> Tuple[FieldSpec, ...]:
    """Prognostic dynamical core state (canonical: Registry.EM_COMMON state
    entries for u,v,w,ph,t,mu; SURVEY.md §2.1)."""
    return (
        FieldSpec("u", DIMS_ZYX, STAG_X, "m s-1", "x-wind at west faces",
                  halo=3, restart=True, history=True),
        FieldSpec("v", DIMS_ZYX, STAG_Y, "m s-1", "y-wind at south faces",
                  halo=3, restart=True, history=True),
        FieldSpec("w", DIMS_ZSYX, STAG_Z, "m s-1", "z-wind at w-levels",
                  halo=2, restart=True, history=True),
        FieldSpec("ph", DIMS_ZSYX, STAG_Z, "m2 s-2",
                  "perturbation geopotential at w-levels",
                  halo=2, restart=True, history=True),
        FieldSpec("t", DIMS_ZYX, STAG_NONE, "K",
                  "perturbation potential temperature (theta - T0)",
                  halo=3, restart=True, history=True),
        FieldSpec("mu", DIMS_YX, STAG_NONE, "Pa",
                  "perturbation dry-air column mass",
                  halo=3, restart=True, history=True),
    )


def _moist_fields(cfg: Config) -> Tuple[FieldSpec, ...]:
    return tuple(
        FieldSpec(q, DIMS_ZYX, STAG_NONE,
                  "kg kg-1" if q.startswith("q") else "kg-1",
                  f"moist scalar {q} (mixing ratio / specific number)",
                  halo=3, restart=True, history=True, advected=True, positive=True)
        for q in cfg.moist_species()
    )


def chem_species(chem: ChemConfig) -> Tuple[str, ...]:
    """Advected chemistry tracer names for the active package.

    MOSAIC sectional aerosol (SURVEY.md §2.3): per size bin, mass mixing
    ratios for so4/no3/nh4/cl/na/oin/bc/oc + aerosol water + number.  Gas
    packages add the CBMZ-lite gas species (chem.gas defines the mechanism).
    """
    if chem.chem_opt == ChemOpt.NONE:
        return ()
    nbin = 8 if "8bin" in chem.chem_opt.value else 4
    aer_species = ("so4", "no3", "nh4", "cl", "na", "oin", "bc", "oc")
    names = []
    for b in range(1, nbin + 1):
        for s in aer_species:
            names.append(f"{s}_a{b:02d}")
        names.append(f"water_a{b:02d}")
        names.append(f"num_a{b:02d}")
    if chem.cldchem_onoff:
        # cloud-borne aerosol phase (canonical: the _cw species of
        # registry.chem gated on the *_aq MOSAIC packages, handled by
        # module_mosaic_cloudchem.F / module_mixactivate.F): per-bin
        # activated mass + number living inside cloud droplets.  Advected
        # like any tracer; activation moves interstitial -> _cw, droplet
        # evaporation resuspends, aqueous S(IV)->S(VI) deposits here, and
        # precipitation drains it (chem/aux.py cw_exchange /
        # cloud_chemistry / wet_scavenging).
        for b in range(1, nbin + 1):
            for s in aer_species:
                names.append(f"{s}_cw{b:02d}")
            names.append(f"num_cw{b:02d}")
    if chem.chem_opt in (ChemOpt.CBMZ_MOSAIC_4BIN, ChemOpt.CBMZ_MOSAIC_8BIN):
        from wrfchem_arc_interactions_tpu.chem.gas import GAS_SPECIES
        names.extend(GAS_SPECIES)
    else:
        # aerosol-only packages still carry the condensable precursor gases
        names.extend(("h2so4", "hno3", "nh3", "hcl"))
    return tuple(names)


def _chem_fields(cfg: Config) -> Tuple[FieldSpec, ...]:
    specs = [
        FieldSpec(f"chem_{name}", DIMS_ZYX, STAG_NONE,
                  "ug kg-1" if not name.startswith("num") else "kg-1",
                  f"chem tracer {name}",
                  halo=3, restart=True, history=True, advected=True, positive=True)
        for name in chem_species(cfg.chem)
    ]
    if cfg.chem.chem_opt != ChemOpt.NONE:
        # Aerosol optical property arrays bridging chem -> radiation (the ARC
        # direct-effect coupling surface; canonical grid%tauaer1..4 / waer /
        # gaer / extaerlw filled by chem/module_optical_averaging.F and read
        # by phys/module_radiation_driver.F; SURVEY.md §2.3, §3.3).
        from wrfchem_arc_interactions_tpu.physics.radiation.bands import NBND_LW, NBND_SW
        specs += [
            FieldSpec("tau_aer_sw", DIMS_ZYX, STAG_NONE, "1",
                      "aerosol optical depth per SW band", extra=(("band", NBND_SW),),
                      restart=True),
            FieldSpec("ssa_aer_sw", DIMS_ZYX, STAG_NONE, "1",
                      "aerosol single-scatter albedo per SW band", extra=(("band", NBND_SW),),
                      restart=True),
            FieldSpec("asy_aer_sw", DIMS_ZYX, STAG_NONE, "1",
                      "aerosol asymmetry parameter per SW band", extra=(("band", NBND_SW),),
                      restart=True),
            FieldSpec("tau_aer_lw", DIMS_ZYX, STAG_NONE, "1",
                      "aerosol absorption optical depth per LW band", extra=(("band", NBND_LW),),
                      restart=True),
        ]
    return tuple(specs)


def _phys_fields(cfg: Config) -> Tuple[FieldSpec, ...]:
    phys: PhysicsConfig = cfg.physics
    specs = [
        FieldSpec("tsk", DIMS_YX, STAG_NONE, "K", "surface skin temperature",
                  restart=True, history=True),
        FieldSpec("rainnc", DIMS_YX, STAG_NONE, "mm",
                  "accumulated grid-scale precipitation", restart=True, history=True),
    ]
    if phys.cu_physics.value != "none":
        specs.append(
            FieldSpec("rainc", DIMS_YX, STAG_NONE, "mm",
                      "accumulated convective precipitation",
                      restart=True, history=True))
    if phys.ra_sw_physics != RAScheme.NONE or phys.ra_lw_physics != RAScheme.NONE:
        # Radiative theta-tendencies are held fixed between radiation calls
        # (radt cadence) exactly like grid%rthraten in the reference.
        specs += [
            FieldSpec("rthraten_sw", DIMS_ZYX, STAG_NONE, "K s-1",
                      "SW radiative heating (theta tendency)", restart=True),
            FieldSpec("rthraten_lw", DIMS_ZYX, STAG_NONE, "K s-1",
                      "LW radiative heating (theta tendency)", restart=True),
            FieldSpec("swdown", DIMS_YX, STAG_NONE, "W m-2",
                      "downward SW at surface", restart=True, history=True),
            FieldSpec("glw", DIMS_YX, STAG_NONE, "W m-2",
                      "downward LW at surface", restart=True, history=True),
            FieldSpec("olr", DIMS_YX, STAG_NONE, "W m-2",
                      "outgoing LW at TOA", restart=True, history=True),
            FieldSpec("swupt", DIMS_YX, STAG_NONE, "W m-2",
                      "upward SW at TOA", restart=True, history=True),
            FieldSpec("cldfra", DIMS_ZYX, STAG_NONE, "1",
                      "diagnosed cloud fraction (icloud option)",
                      restart=True, history=True),
        ]
    if phys.bl_pbl_physics.value != "none" or phys.sf_sfclay_physics.value != "none":
        specs += [
            FieldSpec("hfx", DIMS_YX, STAG_NONE, "W m-2", "surface sensible heat flux",
                      restart=True, history=True),
            FieldSpec("qfx", DIMS_YX, STAG_NONE, "kg m-2 s-1", "surface moisture flux",
                      restart=True, history=True),
            FieldSpec("ust", DIMS_YX, STAG_NONE, "m s-1", "friction velocity",
                      restart=True),
            FieldSpec("pblh", DIMS_YX, STAG_NONE, "m", "PBL height",
                      restart=True, history=True),
            FieldSpec("tmn", DIMS_YX, STAG_NONE, "K", "deep soil temperature",
                      restart=True),
        ]
    from wrfchem_arc_interactions_tpu.config.namelist import SFSurface
    if phys.sf_surface_physics == SFSurface.NOAH:
        # Noah-class 4-layer soil state (canonical: TSLB/SMOIS of
        # module_sf_noahdrv.F; num_soil_layers=4)
        specs += [
            FieldSpec("tslb", DIMS_YX, STAG_NONE, "K",
                      "soil temperature per layer", extra=(("soil", 4),),
                      restart=True, history=True),
            FieldSpec("smois", DIMS_YX, STAG_NONE, "m3 m-3",
                      "soil moisture per layer", extra=(("soil", 4),),
                      restart=True, history=True),
            FieldSpec("rain_prev", DIMS_YX, STAG_NONE, "mm",
                      "accumulated precip at the previous LSM call "
                      "(for the infiltration rate)", restart=True),
            FieldSpec("snow", DIMS_YX, STAG_NONE, "kg m-2",
                      "snow water equivalent (canonical SNOW of "
                      "module_sf_noahlsm.F)", restart=True, history=True),
            FieldSpec("ivgtyp", DIMS_YX, STAG_NONE, "1",
                      "vegetation class index into lsm.VEG_TABLE "
                      "(canonical IVGTYP/VEGPARM.TBL)", restart=True),
        ]
    if cfg.dynamics.sppt_amp > 0.0 or cfg.dynamics.skebs_amp > 0.0:
        # stochastic-physics pattern state (canonical: module_stoch.F
        # spectral coefficient state; here the physical-space AR(1) pattern)
        specs += [
            FieldSpec("sppt_pattern", DIMS_YX, STAG_NONE, "1",
                      "SPPT random pattern (AR1)", restart=True),
            FieldSpec("skebs_psi", DIMS_YX, STAG_NONE, "1",
                      "SKEBS streamfunction pattern (AR1)", restart=True),
        ]
    if cfg.dynamics.km_opt.value == "tke":
        specs.append(
            FieldSpec("tke", DIMS_ZYX, STAG_NONE, "m2 s-2",
                      "subgrid turbulent kinetic energy", halo=2, restart=True,
                      advected=True, positive=True))
    if phys.bl_pbl_physics.value == "mynn":
        # MYNN level-2.5 prognostic QKE = 2*TKE (canonical: the QKE state
        # variable of module_bl_mynn.F, advected as bl_mynn_tkeadvect=1)
        specs.append(
            FieldSpec("qke", DIMS_ZYX, STAG_NONE, "m2 s-2",
                      "MYNN QKE (2x turbulent kinetic energy)", halo=3,
                      restart=True, advected=True, positive=True))
    return tuple(specs)


def field_table(cfg: Config) -> Tuple[FieldSpec, ...]:
    """The full state table for this configuration (package-gated, like the
    Registry's chem_opt-keyed package entries)."""
    return _dyn_fields() + _moist_fields(cfg) + _phys_fields(cfg) + _chem_fields(cfg)


def moist_names(cfg: Config) -> Tuple[str, ...]:
    return cfg.moist_species()


def chem_names(cfg: Config) -> Tuple[str, ...]:
    return tuple(f"chem_{n}" for n in chem_species(cfg.chem))
