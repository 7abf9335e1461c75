"""Batch-last ("structure-of-arrays") fast path for the Fossen step.

The canonical API keeps states batch-first ``(B, 12)``; on TPU that layout
pads the 12-wide trailing dimension to the 128-lane vector width, wasting
~10x HBM bandwidth on the scan carry (and ~40x on the ``(B, 8, 3)`` lag
state).  This module provides the same step with the batch in the LAST
dimension — state ``(12, B)``, lag ``(8, 3, B)`` — so every array is lane-
aligned on ``B`` and the carry traffic is minimal.  Numerics are identical
to :mod:`bluerov2_dynamics_tpu.models.fossen` (same closed-form terms,
verified in tests/test_fossen_soa.py); use this layout for throughput-
critical rollouts (see bench.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from bluerov2_dynamics_tpu.models.params import FossenParams, LagParams, ThrusterConfig


def _rhs_soa(p: FossenParams, x, tau):
    """xdot for euler12 state in ``(12, B)`` layout; ``tau`` is ``(6, B)``.

    Same math as ``fossen.wrench_rhs_euler`` with all component arrays of
    shape ``(B,)`` (lane-aligned).
    """
    xN, yN, zN, phi, theta, psi, u, v, w, pp, q, r = (x[i] for i in range(12))

    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

    # rotation matrix entries (Z-Y-X)
    r00 = cpsi * cth
    r01 = -spsi * cphi + cpsi * sth * sphi
    r02 = spsi * sphi + cpsi * cphi * sth
    r10 = spsi * cth
    r11 = cpsi * cphi + sphi * sth * spsi
    r12 = -cpsi * sphi + sth * spsi * cphi
    r20 = -sth
    r21 = cth * sphi
    r22 = cth * cphi

    # relative velocity (current rotated to body: R^T c)
    cx, cy, cz = p.current[0], p.current[1], p.current[2]
    u_r = u - (r00 * cx + r10 * cy + r20 * cz)
    v_r = v - (r01 * cx + r11 * cy + r21 * cz)
    w_r = w - (r02 * cx + r12 * cy + r22 * cz)

    # C(nu) nu — closed form (see fossen.coriolis_nu)
    mx, my, mz = p.mdiag[0], p.mdiag[1], p.mdiag[2]
    Xud, Yvd, Zwd = p.added[0], p.added[1], p.added[2]
    c0 = mz * w * q - my * v * r
    c1 = -mz * w * pp + mx * u * r
    c2 = my * v * pp - mx * u * q
    c3 = p.gyro[0] * q * r + (Yvd - Zwd) * v * w
    c4 = p.gyro[1] * pp * r + (Zwd - Xud) * u * w
    c5 = p.gyro[2] * pp * q + (Xud - Yvd) * u * v

    # D(nu_r) nu_r
    d0 = (p.d_lin[0] + p.d_quad[0] * jnp.abs(u_r)) * u_r
    d1 = (p.d_lin[1] + p.d_quad[1] * jnp.abs(v_r)) * v_r
    d2 = (p.d_lin[2] + p.d_quad[2] * jnp.abs(w_r)) * w_r
    d3 = (p.d_lin[3] + p.d_quad[3] * jnp.abs(pp)) * pp
    d4 = (p.d_lin[4] + p.d_quad[4] * jnp.abs(q)) * q
    d5 = (p.d_lin[5] + p.d_quad[5] * jnp.abs(r)) * r

    # g(eta)
    WB = p.W - p.B
    xbB, ybB, zbB = p.cb[0] * p.B, p.cb[1] * p.B, p.cb[2] * p.B
    g0 = WB * sth
    g1 = -WB * r21
    g2 = -WB * r22
    g3 = ybB * r22 - zbB * r21
    g4 = -zbB * sth - xbB * r22
    g5 = xbB * r21 + ybB * sth

    nu_dot = (
        (tau[0] - c0 - d0 - g0) * p.minv[0],
        (tau[1] - c1 - d1 - g1) * p.minv[1],
        (tau[2] - c2 - d2 - g2) * p.minv[2],
        (tau[3] - c3 - d3 - g3) * p.minv[3],
        (tau[4] - c4 - d4 - g4) * p.minv[4],
        (tau[5] - c5 - d5 - g5) * p.minv[5],
    )

    # kinematics
    px_dot = r00 * u + r01 * v + r02 * w
    py_dot = r10 * u + r11 * v + r12 * w
    pz_dot = r20 * u + r21 * v + r22 * w
    eps = 1e-7
    sign = jnp.where(cth < 0.0, -1.0, 1.0)
    cth_c = jnp.where(jnp.abs(cth) < eps, eps * sign, cth)
    tth = sth / cth_c
    phidot = pp + sphi * tth * q + cphi * tth * r
    thetadot = cphi * q - sphi * r
    psidot = (sphi * q + cphi * r) / cth_c

    return jnp.stack(
        [px_dot, py_dot, pz_dot, phidot, thetadot, psidot, *nu_dot]
    )


def make_thruster_step_soa(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    method: str = "rk4",
    use_lag: bool = True,
):
    """Batch-last step: ``step((x (12,B), lag (8,3,B)), u8) -> ...``.

    ``u8`` may be ``(8,)`` (shared commands) or ``(8, B)``.
    """
    c1, c3, c5, c7, c9 = (cfg.curve[i] for i in range(5))
    WmapT = cfg.wrench_map.T  # (6, 8)

    def wrench(lag_state, u8):
        V = u8 if u8.ndim == 2 else u8[:, None]
        V2 = V * V
        F_cmd = V * (c1 + V2 * (c3 + V2 * (c5 + V2 * (c7 + V2 * c9))))  # (8, B?)
        if use_lag:
            # lag_state (8, 3, B): x' = Ad x + Bd u, F = c . x'
            new_state = (
                jnp.einsum("ij,kjb->kib", lag.Ad, lag_state)
                + lag.Bd[None, :, None] * F_cmd[:, None, :]
            )
            F_dyn = jnp.einsum("j,kjb->kb", lag.c, new_state)  # (8, B)
        else:
            new_state = lag_state
            F_dyn = jnp.broadcast_to(F_cmd, (8, lag_state.shape[-1]))
        tau = WmapT @ F_dyn  # (6, B)
        return new_state, tau

    def step(carry, u8):
        x, lag_state = carry
        lag_state, tau = wrench(lag_state, u8)
        if method == "euler":
            x = x + dt * _rhs_soa(p, x, tau)
        elif method == "rk4":
            k1 = _rhs_soa(p, x, tau)
            k2 = _rhs_soa(p, x + 0.5 * dt * k1, tau)
            k3 = _rhs_soa(p, x + 0.5 * dt * k2, tau)
            k4 = _rhs_soa(p, x + dt * k3, tau)
            x = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        else:
            raise ValueError(method)
        return (x, lag_state)

    return step
