"""Radiation driver (canonical: phys/module_radiation_driver.F;
SURVEY.md §2.2, §3.2): prepares column inputs, computes the solar zenith
angle, calls the RRTMG SW/LW solvers on the radt alarm, converts flux
divergence to held theta tendencies (grid%rthraten pattern), and wires in
the aerosol optical properties from chem when aer_ra_feedback is on — THE
aerosol-radiation (ARC direct effect) coupling point.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from wrfchem_arc_interactions_tpu.config import Config
from wrfchem_arc_interactions_tpu.config.namelist import RAScheme
from wrfchem_arc_interactions_tpu.dycore.diagnostics import diagnose
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_lw import lw_fluxes
from wrfchem_arc_interactions_tpu.physics.radiation.rrtmg_sw import sw_fluxes
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

ALBEDO = 0.2
JULIAN_DAY = 172.0   # near-solstice default for ideal runs
DECL = 23.45 * c.DEG2RAD
# columns per spectral-solver call: bounds the live (ngpt, nz, chunk)
# temporaries to ~HBM-friendly sizes (the reference amortises the same cost
# over radt; here we also bound peak memory). 2048 cols x 140 gpt x 60 lev
# x 4 B ~ 70 MB per temp.
COL_CHUNK = 2048


def _map_col_chunks(fn, ncol: int, *args):
    """Apply fn over column chunks (last axis) with zero-padding to a
    multiple of COL_CHUNK; returns outputs with the padding stripped."""
    if ncol <= COL_CHUNK:
        return fn(*args)
    import math
    nchunk = math.ceil(ncol / COL_CHUNK)
    pad_n = nchunk * COL_CHUNK - ncol

    def pad_arg(a):
        if a.shape[-1] != ncol:
            return a
        pw = [(0, 0)] * (a.ndim - 1) + [(0, pad_n)]
        a = jnp.pad(a, pw, mode="edge")
        return jnp.moveaxis(
            a.reshape(a.shape[:-1] + (nchunk, COL_CHUNK)), -2, 0)

    args_c = jax.tree.map(pad_arg, args)
    out = jax.lax.map(lambda xs: fn(*xs), args_c)

    def unpad(a):
        a = jnp.moveaxis(a, 0, -2)
        a = a.reshape(a.shape[:-2] + (nchunk * COL_CHUNK,))
        return a[..., :ncol]

    return jax.tree.map(unpad, out)


def cos_zenith(time_s, xlat, xlong, julian_day: float = JULIAN_DAY):
    """Cosine of the solar zenith angle (simple ephemeris: fixed declination
    by julian day, hour angle from UTC time + longitude)."""
    decl = -23.45 * c.DEG2RAD * jnp.cos(2.0 * jnp.pi * (julian_day + 10.0) / 365.0)
    hour = (time_s / 3600.0) % 24.0
    ha = (hour - 12.0) * 15.0 * c.DEG2RAD + xlong * c.DEG2RAD
    lat = xlat * c.DEG2RAD
    mu = jnp.sin(lat) * jnp.sin(decl) + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(ha)
    return jnp.maximum(mu, 0.0)


def _columns(state: State, grid: Grid, cfg: Config):
    """Flatten (nz, ny, nx) state to radiation columns (nz, ncol)."""
    moist = cfg.moist_species()
    diag = diagnose(state, grid, moist)
    nz, ny, nx = diag.theta.shape
    ncol = ny * nx
    flat = lambda a: a.reshape(a.shape[:-2] + (ncol,))
    p_lay = flat(diag.p_full)
    exner = (p_lay / c.P0) ** c.RCP
    t_lay = flat(diag.theta) * exner
    qtot_fac = 1.0 / flat(diag.eps_ratio)
    dp_lay = flat(diag.mu_full)[None] * (-grid.dnw.reshape(-1, 1)) * qtot_fac
    qv = flat(state["qv"]) if "qv" in state else jnp.zeros_like(p_lay)
    qc = flat(state.get("qc", jnp.zeros_like(diag.theta)))
    qcond = qc
    if "qi" in state:
        qcond = qcond + flat(state["qi"])
    if "qs" in state:
        qcond = qcond + 0.5 * flat(state["qs"])   # snow is partly radiatively active
    lwp = qcond * dp_lay / c.G
    t_sfc = flat(state["tsk"].reshape(1, ny, nx))[0]
    return p_lay, t_lay, dp_lay, qv, lwp, qcond, t_sfc, exner, (nz, ny, nx)


def radiation_driver(state: State, grid: Grid, cfg: Config, time_s,
                     julian_day: float = JULIAN_DAY) -> State:
    phys = cfg.physics
    p_lay, t_lay, dp_lay, qv, lwp, qcond, t_sfc, exner, (nz, ny, nx) = \
        _columns(state, grid, cfg)
    ncol = ny * nx
    unflat = lambda a: a.reshape(a.shape[:-1] + (ny, nx))

    aer_sw = aer_lw = None
    if cfg.chem.aer_ra_feedback and "tau_aer_sw" in state:
        flatb = lambda a: a.reshape(a.shape[0], nz, ncol)
        aer_sw = (flatb(state["tau_aer_sw"]), flatb(state["ssa_aer_sw"]),
                  flatb(state["asy_aer_sw"]))
        aer_lw = flatb(state["tau_aer_lw"])

    # partial cloudiness (icloud=1): Xu-Randall fraction + McICA sampling,
    # seeded by the radiation-call time so subcolumn noise decorrelates
    # between radt calls (the reference permutes its kissvec seed per call)
    cf = None
    seed = None
    if phys.icloud == 1:
        from wrfchem_arc_interactions_tpu.physics.radiation import mcica
        cf = mcica.xu_randall_cldfra(p_lay, t_lay, qv, qcond)
        seed = jnp.full((ncol,), jnp.asarray(time_s, jnp.float32).astype(jnp.uint32))

    out = dict(state)
    if cf is not None and "cldfra" in state:
        out["cldfra"] = unflat(cf)
    if phys.ra_lw_physics == RAScheme.SIMPLE:
        from wrfchem_arc_interactions_tpu.physics.radiation.simple import lw_simple
        lw = lw_simple(p_lay, t_lay, dp_lay, qv, lwp, t_sfc)
        out["rthraten_lw"] = unflat(lw["heating"] / exner)
        out["glw"] = unflat(lw["glw"])
        out["olr"] = unflat(lw["olr"])
    elif phys.ra_lw_physics != RAScheme.NONE:
        args = [p_lay, t_lay, dp_lay, qv, lwp, t_sfc]
        has_aer, has_cf = aer_lw is not None, cf is not None
        if has_aer:
            args.append(aer_lw)
        if has_cf:
            args += [cf, seed]

        def lw_fn(*a, _na=has_aer, _nc=has_cf):
            kw, i = {}, 6
            if _na:
                kw["tau_aer_lw"] = a[i]; i += 1
            if _nc:
                kw["cldfra"] = a[i]; kw["mcica_seed"] = a[i + 1][0]
            return lw_fluxes(*a[:6], **kw)

        lw = _map_col_chunks(lw_fn, ncol, *args)
        out["rthraten_lw"] = unflat(lw["heating"] / exner)
        out["glw"] = unflat(lw["glw"])
        out["olr"] = unflat(lw["olr"])
    if phys.ra_sw_physics == RAScheme.SIMPLE:
        from wrfchem_arc_interactions_tpu.physics.radiation.simple import sw_simple
        mu0 = cos_zenith(time_s, grid.xlat, grid.xlong,
                         julian_day=julian_day).reshape(ncol)
        albedo = jnp.full((ncol,), ALBEDO, p_lay.dtype)
        sw = sw_simple(p_lay, t_lay, dp_lay, qv, lwp, mu0, albedo)
        out["rthraten_sw"] = unflat(sw["heating"] / exner)
        out["swdown"] = unflat(sw["swdown"])
        out["swupt"] = unflat(sw["swup_toa"])
    elif phys.ra_sw_physics != RAScheme.NONE:
        mu0 = cos_zenith(time_s, grid.xlat, grid.xlong,
                         julian_day=julian_day).reshape(ncol)
        albedo = jnp.full((ncol,), ALBEDO, p_lay.dtype)
        args = [p_lay, t_lay, dp_lay, qv, lwp, mu0, albedo]
        # Twomey / first-indirect pathway: prognostic droplet number sets
        # the cloud effective radius  re = k_disp (3 qc / (4 pi rho_w
        # Nc))^(1/3)  (qc and Nc both per kg air, so the air density
        # cancels), clipped to the 2.5-50 um validity range of the
        # geometric-optics cloud tau (canonical: effradius in
        # module_mp_morr_two_moment.F -> cldprop_sw).
        re_flat = None
        if phys.progn and "nc" in state and "qc" in state:
            flat = lambda a: a.reshape(a.shape[:-2] + (ncol,))
            qc_f = flat(state["qc"])
            nc_f = jnp.maximum(flat(state["nc"]), 1.0e3)
            rvol = (3.0 * jnp.maximum(qc_f, 0.0)
                    / (4.0 * jnp.pi * 1000.0 * nc_f)) ** (1.0 / 3.0)
            re_flat = jnp.clip(1.1 * rvol, 2.5e-6, 50.0e-6)
        has_aer, has_cf = aer_sw is not None, cf is not None
        has_re = re_flat is not None
        if has_aer:
            args += [aer_sw[0], aer_sw[1], aer_sw[2]]
        if has_cf:
            args += [cf, seed]
        if has_re:
            args += [re_flat]

        def sw_fn(*a, _na=has_aer, _nc=has_cf, _nr=has_re):
            kw, i = {}, 7
            if _na:
                kw["tau_aer_sw"], kw["ssa_aer_sw"], kw["asy_aer_sw"] = \
                    a[i], a[i + 1], a[i + 2]
                i += 3
            if _nc:
                kw["cldfra"] = a[i]; kw["mcica_seed"] = a[i + 1][0]
                i += 2
            if _nr:
                kw["re_liq"] = a[i]
            return sw_fluxes(*a[:7], **kw)

        sw = _map_col_chunks(sw_fn, ncol, *args)
        out["rthraten_sw"] = unflat(sw["heating"] / exner)
        out["swdown"] = unflat(sw["swdown"])
        out["swupt"] = unflat(sw["swup_toa"])
    return out
