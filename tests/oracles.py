"""Independent NumPy oracles for the BlueROV2 dynamics tests.

These implement the *published equations* (von Benzon et al. 2022 heavy
config, with the Fossen Eq. 3.60 Coriolis correction the reference applies)
in straightforward dense-matrix NumPy, deliberately structured differently
from both the library (closed-form elementwise) and the reference
(per-element matrix assembly): the oracle builds C/D as dense matrices via
outer-product/skew helpers and uses scipy for reference discretisation.
"""

from __future__ import annotations

import numpy as np

# von Benzon Table A1 heavy-config constants
G = 9.82
M = 13.5
VOL = 0.0134
RHO = 1000.0
WEIGHT = M * G
BUOY = RHO * G * VOL
CB = np.array([0.0, 0.0, -0.01])
INERTIA = np.array([0.26, 0.23, 0.37])
ADDED = np.array([-6.36, -7.12, -18.68, -0.189, -0.135, -0.222])
DLIN = np.array([-13.7, -0.0, -33.0, -0.0, -0.8, -0.0])
DQUAD = np.array([-141.0, -217.0, -190.0, -1.19, -0.47, -1.5])


def skew(a):
    return np.array(
        [[0.0, -a[2], a[1]], [a[2], 0.0, -a[0]], [-a[1], a[0], 0.0]]
    )


def rot_zyx(phi, theta, psi):
    c, s = np.cos, np.sin
    Rz = np.array([[c(psi), -s(psi), 0], [s(psi), c(psi), 0], [0, 0, 1]])
    Ry = np.array([[c(theta), 0, s(theta)], [0, 1, 0], [-s(theta), 0, c(theta)]])
    Rx = np.array([[1, 0, 0], [0, c(phi), -s(phi)], [0, s(phi), c(phi)]])
    return Rz @ Ry @ Rx


def j2_matrix(phi, theta, eps=1e-7):
    cth = np.cos(theta)
    if abs(cth) < eps:
        cth = eps * (1.0 if cth >= 0 else -1.0)
    sth, sphi, cphi = np.sin(theta), np.sin(phi), np.cos(phi)
    t = sth / cth
    return np.array(
        [[1.0, sphi * t, cphi * t], [0.0, cphi, -sphi], [0.0, sphi / cth, cphi / cth]]
    )


def mass_matrix():
    mrb = np.diag([M, M, M, *INERTIA])
    ma = -np.diag(ADDED)
    return mrb + ma


def coriolis_matrix(nu):
    """C = CRB + CA via the skew-form Fossen construction (Eq. 3.60-style)."""
    u, v, w, p, q, r = nu
    v1 = np.array([u, v, w])
    v2 = np.array([p, q, r])
    C = np.zeros((6, 6))
    # Rigid body, CG at origin: C12 = C21 = -m S(v1)... use the same sparse
    # structure the paper's corrected table produces.
    C[0:3, 3:6] = -M * skew(v1)
    C[3:6, 0:3] = -M * skew(v1)
    C[3:6, 3:6] = -skew(INERTIA * v2)
    # Added mass: CA from diagonal MA (Fossen Eq. 6.43 pattern)
    Av1 = ADDED[:3] * v1  # [Xud*u, Yvd*v, Zwd*w]
    Av2 = ADDED[3:] * v2
    C[0:3, 3:6] += skew(Av1)
    C[3:6, 0:3] += skew(Av1)
    C[3:6, 3:6] += skew(Av2)
    return C


def damping_matrix(nu_r):
    return np.diag(-DLIN - DQUAD * np.abs(nu_r))


def restoring_vec(phi, theta):
    sphi, cphi = np.sin(phi), np.cos(phi)
    sth, cth = np.sin(theta), np.cos(theta)
    WB = WEIGHT - BUOY
    xb, yb, zb = CB
    return np.array(
        [
            WB * sth,
            -WB * cth * sphi,
            -WB * cth * cphi,
            yb * BUOY * cth * cphi - zb * BUOY * cth * sphi,
            -zb * BUOY * sth - xb * BUOY * cth * cphi,
            xb * BUOY * cth * sphi + yb * BUOY * sth,
        ]
    )


def wrench_rhs_euler12(x, tau, current=np.zeros(3)):
    """Dense-matrix oracle for the euler12 wrench-input RHS."""
    eta, nu = x[:6], x[6:]
    phi, theta, psi = eta[3:]
    R = rot_zyx(phi, theta, psi)
    nu_r = nu.copy()
    nu_r[:3] -= R.T @ current
    Minv = np.linalg.inv(mass_matrix())
    nudot = Minv @ (
        tau - coriolis_matrix(nu) @ nu - damping_matrix(nu_r) @ nu_r - restoring_vec(phi, theta)
    )
    etadot = np.concatenate([R @ nu[:3], j2_matrix(phi, theta) @ nu[3:]])
    return np.concatenate([etadot, nudot])


def quat_to_R(q):
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def wrench_rhs_quat13(x, tau, current=np.zeros(3)):
    """Dense-matrix oracle for the quat13 wrench-input RHS."""
    q = x[3:7] / np.linalg.norm(x[3:7])
    nu = x[7:]
    R = quat_to_R(q)
    nu_r = nu.copy()
    nu_r[:3] -= R.T @ current
    sth = -R[2, 0]
    cth_sphi = R[2, 1]
    cth_cphi = R[2, 2]
    WB = WEIGHT - BUOY
    xb, yb, zb = CB
    gvec = np.array(
        [
            WB * sth,
            -WB * cth_sphi,
            -WB * cth_cphi,
            yb * BUOY * cth_cphi - zb * BUOY * cth_sphi,
            -zb * BUOY * sth - xb * BUOY * cth_cphi,
            xb * BUOY * cth_sphi + yb * BUOY * sth,
        ]
    )
    Minv = np.linalg.inv(mass_matrix())
    nudot = Minv @ (tau - coriolis_matrix(nu) @ nu - damping_matrix(nu_r) @ nu_r - gvec)
    pdot = R @ nu[:3]
    w, xq, yq, zq = q
    p, qq, r = nu[3:]
    qdot = 0.5 * np.array(
        [
            -xq * p - yq * qq - zq * r,
            w * p + yq * r - zq * qq,
            w * qq - xq * r + zq * p,
            w * r + xq * qq - yq * p,
        ]
    )
    return np.concatenate([pdot, qdot, nudot])


def t200_static(V):
    return -140.3 * V**9 + 389.9 * V**7 - 404.1 * V**5 + 176.0 * V**3 + 8.9 * V


def thruster_table():
    """Geometry oracle: positions/directions built from the paper's tables."""
    import math

    def rz(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    r_h = np.array([0.156, 0.111, 0.085])
    r_v = np.array([0.12, 0.218, 0.0])
    e_h = np.array([1, -1, 0]) / np.sqrt(2)
    pos = [rz(a) @ r_h for a in (0.0, 5.05, 1.91, math.pi)]
    pos += [rz(a) @ r_v for a in (0.0, 4.15, 1.01, math.pi)]
    dirs = [rz(a) @ e_h for a in (0.0, math.pi / 2, 3 * math.pi / 2, math.pi)]
    dirs += [np.array([0.0, 0.0, -1.0])] * 4
    return np.stack(pos), np.stack(dirs)


def thruster_wrench_oracle(F):
    pos, dirs = thruster_table()
    tau = np.zeros(6)
    for i in range(8):
        f = F[i] * dirs[i]
        tau[:3] += f
        tau[3:] += np.cross(pos[i], f)
    return tau


def reduced_rhs_oracle(x9, u4):
    """Oracle for the reduced 9-state RHS, m=11.4 parameter set."""
    m, g = 11.4, 9.82
    F_buoy = 1026 * 0.0115 * g
    X_ud, Y_vd, Z_wd, N_rd = -2.6, -18.5, -13.3, -0.28
    I_zz = 0.245
    X_u, Y_v, Z_w, N_r = -0.09, -0.26, -0.19, -4.64
    X_uc, Y_vc, Z_wc, N_rc = -34.96, -103.25, -74.23, -0.43
    x, y, z, cpsi, spsi, u, v, w, r = x9
    X, Y, Z, Mz = u4
    out = np.empty(9)
    out[0] = cpsi * u - spsi * v
    out[1] = spsi * u + cpsi * v
    out[2] = w
    out[3] = -spsi * r
    out[4] = cpsi * r
    out[5] = (X + (m - Y_vd) * v * r + (X_u + X_uc * abs(u)) * u) / (m - X_ud)
    out[6] = (Y - (m - X_ud) * u * r + (Y_v + Y_vc * abs(v)) * v) / (m - Y_vd)
    out[7] = (Z + (Z_w + Z_wc * abs(w)) * w + m * g - F_buoy) / (m - Z_wd)
    out[8] = (Mz - (X_ud - Y_vd) * u * v + (N_r + N_rc * abs(r)) * r) / (I_zz - N_rd)
    return out


def wrench_rhs_euler12_params(x, tau, params, current=np.zeros(3)):
    """Dense-matrix oracle with an arbitrary coefficient set.

    ``params``: dict with m, g, rho, volume, cb(3), inertia(3), added(6),
    dlin(6, negative convention), dquad(6, negative convention).
    """
    m = params["m"]
    inertia = np.asarray(params["inertia"], float)
    added = np.asarray(params["added"], float)
    dlin = np.asarray(params["dlin"], float)
    dquad = np.asarray(params["dquad"], float)
    cb = np.asarray(params["cb"], float)
    weight = m * params["g"]
    buoy = params["rho"] * params["g"] * params["volume"]

    eta, nu = x[:6], x[6:]
    phi, theta, psi = eta[3:]
    R = rot_zyx(phi, theta, psi)
    nu_r = nu.copy()
    nu_r[:3] -= R.T @ current

    M = np.diag([m, m, m, *inertia]) - np.diag(added)
    u, v, w, p, q, r = nu
    v1, v2 = np.array([u, v, w]), np.array([p, q, r])
    C = np.zeros((6, 6))
    C[0:3, 3:6] = -m * skew(v1) + skew(added[:3] * v1)
    C[3:6, 0:3] = -m * skew(v1) + skew(added[:3] * v1)
    C[3:6, 3:6] = -skew(inertia * v2) + skew(added[3:] * v2)
    D = np.diag(-dlin - dquad * np.abs(nu_r))

    sphi, cphi = np.sin(phi), np.cos(phi)
    sth, cth = np.sin(theta), np.cos(theta)
    WB = weight - buoy
    xb, yb, zb = cb
    g_vec = np.array([
        WB * sth,
        -WB * cth * sphi,
        -WB * cth * cphi,
        yb * buoy * cth * cphi - zb * buoy * cth * sphi,
        -zb * buoy * sth - xb * buoy * cth * cphi,
        xb * buoy * cth * sphi + yb * buoy * sth,
    ])
    nudot = np.linalg.inv(M) @ (tau - C @ nu - D @ nu_r - g_vec)
    etadot = np.concatenate([R @ nu[:3], j2_matrix(phi, theta) @ nu[3:]])
    return np.concatenate([etadot, nudot])
