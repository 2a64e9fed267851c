"""Offline linear-stability analysis of the column (w, phi) subsystem of the
RK3 split-explicit scheme, mirroring dycore.solve/small_step discretisation.

Builds the exact one-step amplification matrix for the dry, resting,
horizontally-uniform column (u = v = mu'' = Theta'' = 0 identically) and
reports the spectral radius. Debugging tool for the vertical-acoustic-mode
instability; not part of the package.
"""

import numpy as np

G = 9.81
R_D = 287.0
CP = 3.5 * R_D
CV = CP - R_D
GAMMA = CP / CV
P0 = 1.0e5


def build_column(nz=16, ztop=16000.0, p_top=10000.0, theta0=300.0, n2=1e-4):
    # uniform eta
    znw = np.linspace(1.0, 0.0, nz + 1)
    znu = 0.5 * (znw[:-1] + znw[1:])
    dnw = np.diff(znw)
    rdnw = 1.0 / dnw
    dn = np.zeros(nz)
    dn[1:] = znu[1:] - znu[:-1]
    rdn = np.zeros(nz)
    rdn[1:] = 1.0 / dn[1:]
    mu = P0 - p_top
    p = znu * mu + p_top
    theta = theta0 * (p / P0) ** 0  # irrelevant for stability; use EOS-consistent
    # hydrostatic theta profile consistent with p: alpha from hydrostatic d phi
    # choose isothermal-ish: alpha = R_d*T/p with T=250
    T = 250.0
    alpha = R_D * T / p
    return dict(nz=nz, znw=znw, znu=znu, dnw=dnw, rdnw=rdnw, dn=dn, rdn=rdn,
                mu=mu, p=p, alpha=alpha)


def step_matrix(col, dt, ns_total=4, beta=0.1, smdiv=0.1, version="current"):
    nz = col["nz"]
    mu, p, alpha = col["mu"], col["p"], col["alpha"]
    rdnw, rdn, znu = col["rdnw"], col["rdn"], col["znu"]
    s = GAMMA * p * rdnw / (alpha * mu)               # (nz,)
    rdn_w = np.concatenate([[1.0], rdn[1:], [-1.0 / znu[-1]]])  # (nz+1,)
    bp, bm = 0.5 * (1 + beta), 0.5 * (1 - beta)

    # state: x = [W(1..nz) coupled, phi'(1..nz)] ; surface entries fixed at 0
    n = 2 * nz

    def p_of_phi(phi_full):  # phi_full: (nz+1,) with phi[0]=0
        return s * (phi_full[1:] - phi_full[:-1])

    def dpdn_w(pcol):  # (nz+1,) faces; face0 unused
        out = np.zeros(nz + 1)
        out[1:nz] = (pcol[1:] - pcol[:-1]) * rdn[1:]
        out[nz] = (0.0 - pcol[-1]) * rdn_w[nz]
        return out

    def acoustic(ppW, ppPhi, RW, RPhi, nsub, dtau):
        """ppW, ppPhi: (nz,) perturbations at levels 1..nz. Returns final."""
        W = np.concatenate([[0.0], ppW])
        Phi = np.concatenate([[0.0], ppPhi])
        p_prev = p_of_phi(Phi)
        for _ in range(nsub):
            p_now = p_of_phi(Phi)
            p_d = p_now + smdiv * (p_now - p_prev)
            p_prev = p_now
            a_w = dtau * G * bp / mu
            phi_exp = Phi.copy()
            phi_exp[1:] = Phi[1:] + dtau * (RPhi + (G / mu) * bm * W[1:])
            p_exp = p_of_phi(phi_exp)
            dpdn_exp = dpdn_w(p_exp)
            dpdn_old = dpdn_w(p_now)
            s_up = np.concatenate([s, [0.0]])
            s_dn = np.concatenate([[0.0], s])
            K = dtau * G * bp * rdn_w * a_w
            A = -K * s_dn
            C = -K * s_up
            B = 1.0 + K * (s_up + s_dn)
            D = W + dtau * (np.concatenate([[0.0], RW])
                            + G * (bp * dpdn_exp + bm * dpdn_old))
            A[0], B[0], C[0], D[0] = 0.0, 1.0, 0.0, 0.0
            # thomas
            cp_ = np.zeros(nz + 1)
            dp_ = np.zeros(nz + 1)
            cp_[0] = C[0] / B[0]
            dp_[0] = D[0] / B[0]
            for k in range(1, nz + 1):
                m = B[k] - A[k] * cp_[k - 1]
                cp_[k] = C[k] / m
                dp_[k] = (D[k] - A[k] * dp_[k - 1]) / m
            Wn = np.zeros(nz + 1)
            Wn[nz] = dp_[nz]
            for k in range(nz - 1, -1, -1):
                Wn[k] = dp_[k] - cp_[k] * Wn[k + 1]
            W = Wn
            Phi = phi_exp + a_w * W
            Phi[0] = 0.0
        return W[1:], Phi[1:]

    def rk3_step(x0):
        W0, Phi0 = x0[:nz], x0[nz:]
        Ws, Phis = W0, Phi0  # stage state
        stages = [(dt / 3, 1), (dt / 2, max(ns_total // 2, 1)), (dt, ns_total)]
        for dts, nsub in stages:
            dtau = dts / nsub
            # large-step R at stage state
            pcol = p_of_phi(np.concatenate([[0.0], Phis]))
            RW = G * dpdn_w(pcol)[1:]
            RPhi = (G / mu) * Ws
            ppW = W0 - Ws
            ppPhi = Phi0 - Phis
            fW, fPhi = acoustic(ppW, ppPhi, RW, RPhi, nsub, dtau)
            Ws = Ws + fW
            Phis = Phis + fPhi
        return np.concatenate([Ws, Phis])

    M = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        M[:, j] = rk3_step(e)
    return M


if __name__ == "__main__":
    col = build_column()
    for dt in (1.0, 5.0, 10.0):
        for beta in (0.1, 0.3):
            M = step_matrix(col, dt, ns_total=4, beta=beta)
            ev = np.linalg.eigvals(M)
            print(f"dt={dt:5.1f} beta={beta}: spectral radius {np.abs(ev).max():.6f}")
