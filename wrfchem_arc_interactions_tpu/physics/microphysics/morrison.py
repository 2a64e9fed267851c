"""Morrison-style 2-moment bulk microphysics (canonical:
phys/module_mp_morr_two_moment.F; SURVEY.md §2.2 'for ARC studies typically
Morrison 2-moment (prognostic number conc. — needed for aerosol-cloud
coupling)').

Prognostic mass/number for cloud, rain, ice, snow, graupel with gamma (mu=0
/ Marshall-Palmer) size distributions.  The ARC-critical pathway is fully
represented: activated droplet number from `physics.mixactivate` sources
prognostic Nc, the Khairoutdinov-Kogan autoconversion's strong
Nc^-1.79 dependence carries the second indirect effect (more aerosol ->
more, smaller droplets -> suppressed rain), and on the progn=1 path
condensation/evaporation is SUB-STEPPED ON PREDICTED SUPERSATURATION
(_supersat_condense): the phase-relaxation time 1/(4 pi D N r) depends on
the activated droplet number, so S_max and the condensation partitioning
respond to aerosol — the reference's non-equilibrium pathway (canonical:
the supersaturation sub-stepping of module_mp_morr_two_moment.F).  With
progn=0 the classic saturation adjustment applies.  Includes
Hallett-Mossop rime splintering (secondary ice) and Bigg heterogeneous
rain freezing.  The cloud-droplet spectral width follows the reference's
diagnosed pgam(Nc) gamma-shape relation and modulates autoconversion (the
spectral part of the second indirect effect).  Remaining documented
simplification vs the reference: precipitation species stay mu=0
(Marshall-Palmer), bulk rime density.

All process rates are fused elementwise VPU work; sedimentation is the
same CFL-substepped upwind column pass as Kessler.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wrfchem_arc_interactions_tpu.dycore.diagnostics import Diag
from wrfchem_arc_interactions_tpu.grid import Grid
from wrfchem_arc_interactions_tpu.physics.microphysics.kessler import (
    _qvs, saturation_adjust,
)
from wrfchem_arc_interactions_tpu.registry.state import State
from wrfchem_arc_interactions_tpu.utils import constants as c

GAMMA4 = 6.0
# fall-speed power laws V = a D^b [SI], Morrison constants
FALL = {"r": (841.99667, 0.8), "s": (11.72, 0.41), "g": (19.3, 0.37),
        "i": (700.0, 1.0)}
RHO_X = {"r": 997.0, "s": 100.0, "g": 400.0, "i": 500.0}
NC_DEFAULT = 250.0e6      # [#/kg] when chem/activation absent (progn=0)
T0C = 273.15


def _gamma(x):
    from math import gamma
    return gamma(x)


def _lambda(q, n, rho_x):
    """Slope of the mu=0 gamma distribution; q [kg/kg], n [#/kg]."""
    lam = (np.pi * rho_x * jnp.maximum(n, 1e-3)
           / jnp.maximum(q, 1e-14)) ** (1.0 / 3.0)
    return jnp.clip(lam, 1e3, 1e7)


def _fallspeeds(q, n, kind, rho, rho_x=None):
    """Mean-mass/number fall speeds; `rho_x` overrides the fixed particle
    density (the variable-rime-density graupel path: denser graupel is
    smaller at equal mass AND faster per Heymsfield-type a ~ sqrt(rho))."""
    a, b = FALL[kind]
    if rho_x is None:
        rho_x = RHO_X[kind]
    else:
        a = a * jnp.sqrt(rho_x / RHO_X[kind])
    lam = _lambda(q, n, rho_x)
    rho_fac = (1.2 / jnp.maximum(rho, 0.1)) ** 0.54
    v_q = a * _gamma(4.0 + b) / GAMMA4 / lam ** b * rho_fac
    v_n = a * _gamma(1.0 + b) / lam ** b * rho_fac
    cap = 25.0 if kind in ("r", "g") else 3.0
    return jnp.minimum(v_q, cap), jnp.minimum(v_n, cap)


def _sediment_pair(q, n, kind, rho, dz, dt, nfall, extra=None, rho_x=None):
    """Sediment a (mass, number) pair; `extra` (e.g. graupel volume) falls
    with the mass-weighted speed; `rho_x` feeds the variable-density
    graupel fall speed (recomputed each sub-step from q/extra)."""
    dtf = dt / nfall
    rain_acc = jnp.zeros_like(q[0])
    for _ in range(nfall):
        rx = rho_x
        if extra is not None and rho_x is not None:
            rx = _rho_g(q, extra)
        v_q, v_n = _fallspeeds(q, n, kind, rho, rho_x=rx)
        fq = rho * v_q * q
        fn = rho * v_n * n
        inq = jnp.concatenate([fq[1:], jnp.zeros_like(fq[:1])], axis=0)
        inn = jnp.concatenate([fn[1:], jnp.zeros_like(fn[:1])], axis=0)
        q = jnp.maximum(q + dtf * (inq - fq) / (rho * dz), 0.0)
        n = jnp.maximum(n + dtf * (inn - fn) / (rho * dz), 0.0)
        if extra is not None:
            fe = rho * v_q * extra
            ine = jnp.concatenate([fe[1:], jnp.zeros_like(fe[:1])], axis=0)
            extra = jnp.maximum(extra + dtf * (ine - fe) / (rho * dz), 0.0)
        rain_acc = rain_acc + dtf * fq[0]
    if extra is not None:
        return q, n, rain_acc, extra
    return q, n, rain_acc


def _rho_g(qg, qgv):
    """Bulk graupel density from the prognostic rime volume [kg/m3]."""
    return jnp.clip(qg / jnp.maximum(qgv, 1e-18), 50.0, 900.0)


def _macklin_rime_density(r_drop_um, v_imp, t_c):
    """Macklin (1962) rime density [kg/m3]: rho = 110 (r V / |T_s|)^0.76,
    r the median droplet radius [um], V the impact speed [m/s], T_s the
    surface temperature [C] (canonical: the rime-density parameterisation
    of module_mp_morr_two_moment.F's graupel/hail treatment)."""
    x = r_drop_um * v_imp / jnp.maximum(-t_c, 0.5)
    return jnp.clip(110.0 * x ** 0.76, 100.0, 900.0)


# fixed sub-step count for the predicted-supersaturation integration (the
# reference adapts; 10 sub-steps resolve the ~1 s phase-relaxation time of
# continental Nc at typical dt without data-dependent control flow)
NSUB_SS = 10
D_VAP = 2.5e-5            # vapor diffusivity [m2/s]
K_AIR = 2.5e-2            # thermal conductivity [W/m/K]
RV = 461.5


def _supersat_condense(theta, qv, qc, nc, p, pii, rho, dt: float):
    """Sub-stepped condensation/evaporation on PREDICTED supersaturation.

    Per sub-step the vapor excess (qv - qvs) relaxes with the droplet
    phase-relaxation time tau_c = 1/(4 pi G N r_bar) — G the standard
    diffusional growth coefficient, r_bar the mean droplet radius from
    (qc, nc) — damped by the psychrometric factor Gamma = 1 + (L/cp)
    dqvs/dT (latent heating raises qvs as condensation proceeds).  As
    tau_c -> 0 (many droplets) this limits to saturation adjustment; for
    few droplets supersaturation persists — the Nc-dependent S_max the
    second indirect effect rides on (tests/test_morrison_arc.py parcel
    test).  Returns (theta, qv, qc, s_max_seen).
    """
    dts = dt / NSUB_SS
    lv = c.XLV
    s_max = jnp.zeros_like(qv)
    for _ in range(NSUB_SS):
        t_air = theta * pii
        qvs = _qvs(p, t_air)
        # psychrometric factor (Clausius-Clapeyron slope of qvs)
        gam = 1.0 + (lv / c.CP) * qvs * lv / (RV * t_air ** 2)
        # diffusional growth coefficient [m2/s]
        g_coef = 1.0 / (997.0 * RV * t_air / (_es(t_air) * D_VAP)
                        + lv * 997.0 / (K_AIR * t_air)
                        * (lv / (RV * t_air) - 1.0))
        r_bar = (3.0 * jnp.maximum(qc, 1e-12)
                 / (4.0 * jnp.pi * 997.0 * jnp.maximum(nc, 1e3))) ** (1.0 / 3.0)
        r_bar = jnp.clip(r_bar, 1e-6, 50e-6)      # floor: freshly activated
        # excess relaxation rate [1/s]: dqc/dt = 4 pi N r rho_w G S with
        # S = excess/qvs  ->  k = 4 pi N r rho_w G / qvs
        inv_tau = (4.0 * jnp.pi * jnp.maximum(nc, 0.0) * r_bar * 997.0
                   * g_coef / jnp.maximum(qvs, 1e-8))
        # analytic relaxation of the excess over the sub-step
        excess = qv - qvs
        relax = 1.0 - jnp.exp(-inv_tau * gam * dts)
        dq = excess / gam * relax
        # evaporation bounded by available cloud water
        dq = jnp.maximum(dq, -qc)
        qv = qv - dq
        qc = qc + dq
        theta = theta + (lv / (c.CP * pii)) * dq
        s_max = jnp.maximum(s_max, excess / jnp.maximum(qvs, 1e-8))
    return theta, qv, qc, s_max


def _es(t_air):
    return 611.2 * jnp.exp(c.SVP2 * (t_air - c.SVPT0) / (t_air - c.SVP3))


def morrison(state: State, diag: Diag, grid: Grid, cfg, dt: float,
             n_act: Optional[jax.Array] = None) -> State:
    theta = diag.theta
    p = diag.p_full
    pii = (p / c.P0) ** c.RCP
    t_air = theta * pii
    rho = 1.0 / (diag.alpha_d * diag.eps_ratio)
    ph_full = grid.phb + state["ph"]
    dz = (ph_full[1:] - ph_full[:-1]) / c.G

    qv, qc, qr = state["qv"], state["qc"], state["qr"]
    qi, qs, qg = state["qi"], state["qs"], state["qg"]
    nc, nr = state["nc"], state["nr"]
    ni, ns_, ng = state["ni"], state["ns"], state["ng"]

    # --- 1. droplet activation (ARC indirect effect source of Nc) -------
    qvs = _qvs(p, t_air)
    supersat = qv > qvs
    if n_act is not None and cfg.physics.progn:
        newly = jnp.maximum(n_act - nc, 0.0)
        nc = nc + jnp.where(supersat, newly, 0.0)
    else:
        nc = jnp.where(supersat & (nc < 1.0), NC_DEFAULT, nc)

    # --- 2. condensation / evaporation ----------------------------------
    if n_act is not None and cfg.physics.progn:
        # predicted supersaturation, sub-stepped: the Nc-dependent phase
        # relaxation makes S_max and droplet growth respond to aerosol
        theta, qv, qc, _ = _supersat_condense(theta, qv, qc, nc, p, pii,
                                              rho, dt)
    else:
        theta, qv, qc = saturation_adjust(theta, qv, qc, p, pii)
    t_air = theta * pii
    # full evaporation removes droplets; partial keeps number
    nc = jnp.where(qc <= 1e-12, 0.0, nc)

    # --- 3. warm-rain collision-coalescence (KK2000) --------------------
    nc_cm3 = jnp.maximum(nc * rho * 1e-6, 1.0)          # [#/cm3]
    # cloud-droplet gamma spectral width mu_c(Nc) — the reference's
    # diagnosed pgam relation (canonical module_mp_morr_two_moment.F:
    # pgam = 0.0005714 Nc[cm-3] + 0.2714, mu = 1/pgam^2 - 1, clipped
    # 2..10): polluted (high-Nc) clouds are spectrally narrower, which
    # SUPPRESSES autoconversion beyond the raw Nc^-1.79 — the spectral
    # part of the second indirect effect.  KK2000 was fitted at an
    # implicit moderate width (mu ~ 5ish); scale its rate by the relative
    # broadness factor [(mu+2)/(mu+5)]^? collapsed to a linear dampening
    # around the fit point, bounded to ±30%.
    pgam = 0.0005714 * nc_cm3 + 0.2714
    mu_c = jnp.clip(1.0 / (pgam * pgam) - 1.0, 2.0, 10.0)
    spec_fac = jnp.clip(1.0 + 0.06 * (5.0 - mu_c), 0.7, 1.3)
    auto_q = (1350.0 * jnp.maximum(qc, 0.0) ** 2.47 * nc_cm3 ** (-1.79)
              * spec_fac)
    accr_q = 67.0 * jnp.maximum(qc * qr, 0.0) ** 1.15
    dq_auto = jnp.minimum(auto_q * dt, qc)
    dq_accr = jnp.minimum(accr_q * dt, qc - dq_auto)
    m_r0 = 4.0 / 3.0 * np.pi * 997.0 * (25e-6) ** 3      # embryo drop mass
    dn_auto = dq_auto / m_r0
    mean_mc = jnp.maximum(qc, 1e-14) / jnp.maximum(nc, 1e-3)
    dn_c = (dq_auto + dq_accr) / jnp.maximum(mean_mc, 1e-15)
    qc = qc - dq_auto - dq_accr
    qr = qr + dq_auto + dq_accr
    nr = nr + dn_auto
    nc = jnp.maximum(nc - dn_c, 0.0)

    # --- 4. rain evaporation -------------------------------------------
    deficit = jnp.maximum(qvs - qv, 0.0)
    lam_r = _lambda(qr, nr, RHO_X["r"])
    vent = 0.78 + 0.2 * (rho * 841.0 / (1.8e-5 * lam_r)) ** 0.5
    evap_rate = 2.0 * np.pi * nr * rho * vent / lam_r ** 2 * 2.2e-5 \
        * deficit / jnp.maximum(qvs, 1e-8)
    d_ev = jnp.minimum(jnp.minimum(evap_rate * dt, qr), deficit)
    qr = qr - d_ev
    qv = qv + d_ev
    theta = theta - (c.XLV / (c.CP * pii)) * d_ev
    nr = nr * jnp.where(qr > 1e-12, 1.0, 0.0)
    t_air = theta * pii

    # --- 5. ice processes (simplified Morrison set) ---------------------
    cold = t_air < T0C
    # Cooper (1986) primary nucleation
    ni_cooper = jnp.where(t_air < T0C - 8.0,
                          5.0e-3 * jnp.exp(0.304 * (T0C - t_air)) * 1e3 / rho,
                          0.0)
    ni_cooper = jnp.minimum(ni_cooper, 5.0e5 / rho * 1e3)
    freeze_seed = jnp.where(cold & (qv > 0.95 * qvs) | (qc > 1e-8),
                            jnp.maximum(ni_cooper - ni, 0.0), 0.0)
    ni = ni + freeze_seed
    # vapor deposition onto ice (capacitance, ventilation ~ 1)
    esi = 611.2 * jnp.exp(21.87 * (t_air - T0C) / (t_air - 7.66))
    qvsi = c.EP_2 * esi / jnp.maximum(p - esi, 1.0)
    lam_i = _lambda(qi, ni, RHO_X["i"])
    dep_rate = jnp.where(cold,
                         4.0 * np.pi * 2.2e-5 * ni * rho / lam_i ** 2
                         * (qv - qvsi) / jnp.maximum(qvsi, 1e-8), 0.0)
    d_dep = jnp.clip(dep_rate * dt, -qi, jnp.maximum(qv - qvsi, 0.0))
    qi = qi + d_dep
    qv = qv - d_dep
    theta = theta + (c.XLS / (c.CP * pii)) * d_dep
    # homogeneous/instant freezing of cloud water below -40C
    frz = jnp.where(t_air < T0C - 40.0, qc, 0.0)
    qi = qi + frz
    ni = ni + jnp.where(frz > 0, nc, 0.0)
    qc = qc - frz
    nc = nc - jnp.where(frz > 0, nc, 0.0)
    # ice -> snow autoconversion above a size threshold
    d_i_mean = (6.0 * jnp.maximum(qi, 1e-14)
                / (np.pi * RHO_X["i"] * jnp.maximum(ni, 1e-3))) ** (1.0 / 3.0)
    dqs = jnp.minimum(0.05 * dt * jnp.where(d_i_mean > 150e-6, qi, 0.0), qi)
    qs = qs + dqs
    qi = qi - dqs
    dns = dqs / jnp.maximum(qi + dqs, 1e-14) * ni
    ns_ = ns_ + dns
    ni = jnp.maximum(ni - dns, 0.0)
    # riming: snow collects cloud water -> snow (light) / graupel (heavy)
    lam_s = _lambda(qs, ns_, RHO_X["s"])
    rime = jnp.where(cold, np.pi / 4.0 * 11.72 * _gamma(3.41)
                     * ns_ * rho / lam_s ** 3.41 * qc, 0.0)
    d_rime = jnp.minimum(rime * dt, qc)
    heavy = d_rime > 2.0 * dqs + 1e-10
    d_rime_g = jnp.where(heavy, d_rime, 0.0)
    qgv = state.get("qgv")
    t_c = t_air - T0C
    if qgv is not None:
        # -- variable bulk rime density (canonical: rime density / wet
        # growth of module_mp_morr_two_moment.F; P3-style bulk volume) --
        # Macklin density of the freshly accreted rime from the droplet
        # size, the collector fall speed, and the supercooling
        r_um = 0.5e6 * (6.0 * jnp.maximum(qc, 1e-12)
                        / (np.pi * 997.0 * jnp.maximum(nc, 1e4))) ** (1.0 / 3.0)
        v_s = (11.72 * _gamma(4.41) / GAMMA4 / lam_s ** 0.41
               * (1.2 / jnp.maximum(rho, 0.1)) ** 0.54)
        rho_rime = _macklin_rime_density(jnp.clip(r_um, 2.0, 30.0),
                                         jnp.maximum(v_s, 0.3), t_c)
        # wet growth (Musil): near 0 C the latent heat of the collected
        # water cannot all be shed, the unfrozen excess soaks the rime ->
        # high-density (water-filled) growth.  Freezing capacity ~ the
        # ventilated heat sink, linear in supercooling.
        wg_cap = 6.0e-4 * jnp.maximum(-t_c, 0.0) * dt       # kg/kg per step
        wet = d_rime_g > wg_cap
        rho_dep = jnp.where(wet, 900.0, rho_rime)
        qgv = qgv + d_rime_g / rho_dep
    qs = qs + jnp.where(~heavy, d_rime, 0.0)
    qg = qg + d_rime_g
    ng = ng + jnp.where(heavy, d_rime / jnp.maximum(
        np.pi / 6.0 * RHO_X["g"] * (500e-6) ** 3, 1e-12), 0.0)
    qc = qc - d_rime
    nc = jnp.maximum(nc - d_rime / jnp.maximum(mean_mc, 1e-15), 0.0)
    # Hallett-Mossop rime splintering (canonical HM process in
    # module_mp_morr_two_moment.F): secondary ice production of
    # 3.5e8 splinters per kg rimed, active only in the -8..-3 C window
    # with a triangular efficiency peaking at -5 C
    hm_eff = jnp.clip(jnp.where(t_c > -5.0, (t_c + 3.0) / (-2.0),
                                (t_c + 8.0) / 3.0), 0.0, 1.0)
    n_spl = 3.5e8 * d_rime * hm_eff                 # [#/kg air]
    m_spl = np.pi / 6.0 * RHO_X["i"] * (10e-6) ** 3  # 10-um splinter mass
    dq_spl = jnp.minimum(n_spl * m_spl, qs + 1e-30)  # mass robbed from snow
    # keep splinter number consistent with the (possibly snow-limited) mass
    # transfer so ice number never appears without corresponding mass
    n_spl = dq_spl / m_spl
    ni = ni + n_spl
    qi = qi + dq_spl
    qs = jnp.maximum(qs - dq_spl, 0.0)
    # Bigg (1953) heterogeneous rain freezing -> graupel below -4 C
    # (exponential in supercooling; effectively instant below ~ -25 C)
    ts = jnp.maximum(-(t_c + 4.0), 0.0)
    frz_frac = 1.0 - jnp.exp(-dt * 1.0e-5 * (jnp.exp(0.66 * ts) - 1.0))
    dq_frz = qr * frz_frac
    dn_frz = nr * frz_frac
    qg = qg + dq_frz
    ng = ng + dn_frz
    if qgv is not None:
        qgv = qgv + dq_frz / 900.0      # frozen drops: solid-ice density
    qr = qr - dq_frz
    nr = jnp.maximum(nr - dn_frz, 0.0)
    theta = theta + (c.XLF / (c.CP * pii)) * dq_frz
    # melting of snow/graupel/ice above 0C
    warm = t_air > T0C
    melt_fac = jnp.where(warm, jnp.minimum((t_air - T0C) * 0.1 * dt, 1.0), 0.0)
    dqm_s = qs * melt_fac
    dqm_g = qg * melt_fac
    dqm_i = qi * melt_fac
    qr = qr + dqm_s + dqm_g + dqm_i
    nr = nr + ns_ * melt_fac + ng * melt_fac + ni * melt_fac
    qs = qs - dqm_s
    qg = qg - dqm_g
    qi = qi - dqm_i
    ns_ = ns_ * (1 - melt_fac)
    ng = ng * (1 - melt_fac)
    ni = ni * (1 - melt_fac)
    if qgv is not None:
        qgv = qgv * (1 - melt_fac)
    theta = theta - (c.XLF / (c.CP * pii)) * (dqm_s + dqm_g + dqm_i)

    # --- 6. sedimentation ----------------------------------------------
    nfall = max(1, int(-(-dt * 20.0 // 150.0)))
    rain_sfc = jnp.zeros_like(qr[0])
    qr, nr, acc = _sediment_pair(qr, nr, "r", rho, dz, dt, nfall)
    rain_sfc = rain_sfc + acc
    qs, ns_, acc = _sediment_pair(qs, ns_, "s", rho, dz, dt, nfall)
    rain_sfc = rain_sfc + acc
    if qgv is not None:
        qg, ng, acc, qgv = _sediment_pair(qg, ng, "g", rho, dz, dt, nfall,
                                          extra=qgv, rho_x=RHO_X["g"])
    else:
        qg, ng, acc = _sediment_pair(qg, ng, "g", rho, dz, dt, nfall)
    rain_sfc = rain_sfc + acc
    qi, ni, acc = _sediment_pair(qi, ni, "i", rho, dz, dt, max(1, nfall // 2))
    rain_sfc = rain_sfc + acc

    out = dict(state)
    out["t"] = theta - c.T0
    floor = lambda a: jnp.maximum(a, 0.0)
    out.update({"qv": floor(qv), "qc": floor(qc), "qr": floor(qr),
                "qi": floor(qi), "qs": floor(qs), "qg": floor(qg),
                "nc": floor(nc), "nr": floor(nr), "ni": floor(ni),
                "ns": floor(ns_), "ng": floor(ng)})
    if qgv is not None:
        # (bulk rime density diagnosable downstream as _rho_g(qg, qgv))
        out["qgv"] = floor(qgv)
    out["rainnc"] = state["rainnc"] + rain_sfc
    return out
