"""Fossen 6-DOF BlueROV2 dynamics — pure, natively batched RHS functions.

Three state conventions, mirroring the reference model family:

* **euler12, thruster input** — ``x = [x,y,z,phi,theta,psi,u,v,w,p,q,r]``,
  input = 8 normalized thruster commands (``fossen/BlueROV2.py:357-400``).
* **euler12, wrench input** — same state, input = 6D body wrench
  (``fossen/BlueROV2_thrust.py:235-282``).
* **quat13, wrench input** — ``x = [x,y,z,qw,qx,qy,qz,u,v,w,p,q,r]``
  (``fossen/BlueROV2_wrench.py:322-367``).

Plus the reduced 9-state RHS used by the PINc physics loss
(``fossen/bluerov_torch.py:20-67``).

TPU-first structure: the mass matrix is diagonal and the Coriolis/damping
matrices are sparse, so ``nu_dot`` is written in closed form — roughly 60
fused multiply-adds per state, zero 6x6 matrices, zero linear solves.  All
functions broadcast over arbitrary leading batch dimensions; a million
states step in one XLA kernel.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from bluerov2_dynamics_tpu.models.params import (
    FossenParams,
    LagParams,
    ReducedParams,
    ThrusterConfig,
)
from bluerov2_dynamics_tpu.models.thrusters import (
    thruster_wrench,
    thruster_wrench_nolag,
)
from bluerov2_dynamics_tpu.ops.integrators import euler_step, rk4_step, rollout
from bluerov2_dynamics_tpu.ops.quaternion import (
    quat_derivative,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
)
from bluerov2_dynamics_tpu.ops.rotations import euler_rates, rotate_b2n, rotate_n2b


# ---------------------------------------------------------------------------
# Hydrodynamic terms (closed-form products, no matrices)
# ---------------------------------------------------------------------------

def coriolis_nu(p: FossenParams, nu):
    """``C(nu) @ nu`` with ``C = CRB + CA`` in closed form.

    Derived by expanding the sparse matrices at
    ``fossen/BlueROV2.py:280-325`` (including the two Fossen Eq. 3.60
    corrections noted there); the rigid-body ``m`` terms in the moment rows
    cancel exactly, leaving the gyroscopic combinations precomputed in
    ``FossenParams.gyro``.
    """
    u, v, w = nu[..., 0], nu[..., 1], nu[..., 2]
    pp, q, r = nu[..., 3], nu[..., 4], nu[..., 5]
    mx, my, mz = p.mdiag[0], p.mdiag[1], p.mdiag[2]  # m - Xud, m - Yvd, m - Zwd
    Xud, Yvd, Zwd = p.added[0], p.added[1], p.added[2]
    return jnp.stack(
        [
            mz * w * q - my * v * r,
            -mz * w * pp + mx * u * r,
            my * v * pp - mx * u * q,
            p.gyro[0] * q * r + (Yvd - Zwd) * v * w,
            p.gyro[1] * pp * r + (Zwd - Xud) * u * w,
            p.gyro[2] * pp * q + (Xud - Yvd) * u * v,
        ],
        axis=-1,
    )


def damping_nu(p: FossenParams, nu_r):
    """``D(nu_r) @ nu_r`` — diagonal linear+quadratic damping
    (``fossen/BlueROV2.py:327-338``)."""
    return (p.d_lin + p.d_quad * jnp.abs(nu_r)) * nu_r


def restoring_terms(p: FossenParams, sth, cth_sphi, cth_cphi):
    """Restoring wrench ``g(eta)`` from attitude combinations.

    The three inputs are exactly the third row of R_{b->n} (negated first
    entry), so this one kernel serves both the Euler-angle form
    (``fossen/BlueROV2.py:340-355``) and the rotation-row form
    (``fossen/BlueROV2_wrench.py:293-319``).
    """
    WB = p.W - p.B
    xbB = p.cb[0] * p.B
    ybB = p.cb[1] * p.B
    zbB = p.cb[2] * p.B
    return jnp.stack(
        [
            WB * sth,
            -WB * cth_sphi,
            -WB * cth_cphi,
            ybB * cth_cphi - zbB * cth_sphi,
            -zbB * sth - xbB * cth_cphi,
            xbB * cth_sphi + ybB * sth,
        ],
        axis=-1,
    )


def restoring_euler(p: FossenParams, phi, theta):
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    return restoring_terms(p, sth, cth * sphi, cth * cphi)


def _nu_dot(p: FossenParams, nu, nu_r, tau, gvec):
    """``nu_dot = M^-1 (tau - C nu - D nu_r - g)`` — elementwise, M diagonal."""
    return (tau - coriolis_nu(p, nu) - damping_nu(p, nu_r) - gvec) * p.minv


def _relative_velocity(nu, v_current_body):
    """Subtract body-frame current from the linear DOFs only
    (``fossen/BlueROV2.py:376-378``)."""
    return jnp.concatenate(
        [nu[..., 0:3] - v_current_body, nu[..., 3:6]], axis=-1
    )


# ---------------------------------------------------------------------------
# Wrench-input RHS, Euler-angle state (reference BlueROV2_thrust.py)
# ---------------------------------------------------------------------------

def wrench_rhs_euler(p: FossenParams, x, tau):
    """xdot for the 12-state Euler-angle model under a body wrench ``tau``.

    ``x``: ``(..., 12)``; ``tau``: ``(..., 6)`` (broadcastable).
    Reference: ``fossen/BlueROV2_thrust.py:235-282`` (same hydrodynamics as
    the thruster model, direct wrench input).
    """
    phi, theta, psi = x[..., 3], x[..., 4], x[..., 5]
    nu = x[..., 6:12]
    current = jnp.broadcast_to(p.current, x[..., 0:3].shape)
    v_c_b = rotate_n2b(phi, theta, psi, current)
    nu_r = _relative_velocity(nu, v_c_b)
    gvec = restoring_euler(p, phi, theta)
    nu_dot = _nu_dot(p, nu, nu_r, tau, gvec)
    p_dot = rotate_b2n(phi, theta, psi, nu[..., 0:3])
    eul_dot = euler_rates(phi, theta, nu[..., 3:6])
    return jnp.concatenate([p_dot, eul_dot, nu_dot], axis=-1)


# ---------------------------------------------------------------------------
# Wrench-input RHS, quaternion state (reference BlueROV2_wrench.py)
# ---------------------------------------------------------------------------

def wrench_rhs_quat(p: FossenParams, x, tau):
    """xdot for the 13-state quaternion model under a body wrench ``tau``.

    ``x = [x, y, z, qw, qx, qy, qz, u, v, w, p, q, r]``; the quaternion is
    normalized on entry, as the reference does
    (``fossen/BlueROV2_wrench.py:322-367``).  The restoring wrench is
    computed from the third DCM row, never from Euler angles
    (``fossen/BlueROV2_wrench.py:293-319``).
    """
    q = quat_normalize(x[..., 3:7])
    nu = x[..., 7:13]
    current = jnp.broadcast_to(p.current, x[..., 0:3].shape)
    v_c_b = quat_rotate_inv(q, current)
    nu_r = _relative_velocity(nu, v_c_b)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Third row of R_{b->n}: [-sth, cth*sphi, cth*cphi]
    sth = -2.0 * (qx * qz - qy * qw)
    cth_sphi = 2.0 * (qy * qz + qx * qw)
    cth_cphi = 1.0 - 2.0 * (qx * qx + qy * qy)
    gvec = restoring_terms(p, sth, cth_sphi, cth_cphi)
    nu_dot = _nu_dot(p, nu, nu_r, tau, gvec)
    p_dot = quat_rotate(q, nu[..., 0:3])
    q_dot = quat_derivative(q, nu[..., 3:6])
    return jnp.concatenate([p_dot, q_dot, nu_dot], axis=-1)


def renormalize_quat13(x):
    """Post-step hook normalizing the quaternion block of a quat13 state,
    mirroring ``train_tank_brov2_wrench_quat.py:262-265``."""
    q = quat_normalize(x[..., 3:7])
    return jnp.concatenate([x[..., 0:3], q, x[..., 7:13]], axis=-1)


# ---------------------------------------------------------------------------
# Thruster-input model (reference BlueROV2.py) — step with explicit lag state
# ---------------------------------------------------------------------------

def thruster_dynamics(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    lag_state,
    x,
    u8,
    use_lag: bool = True,
):
    """One RHS evaluation of the full thruster-input model.

    Returns ``(new_lag_state, xdot)`` — the functional equivalent of the
    reference ``BlueROV2.dynamics`` (``fossen/BlueROV2.py:357-400``) whose
    lag update is a hidden side effect.
    """
    if use_lag:
        lag_state, tau = thruster_wrench(cfg, lag, lag_state, u8)
    else:
        tau = thruster_wrench_nolag(cfg, u8)
    return lag_state, wrench_rhs_euler(p, x, tau)


_STEPPERS = {"euler": euler_step, "rk4": rk4_step}


def make_thruster_step(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    method: str = "euler",
    use_lag: bool = True,
) -> Callable:
    """Discrete step for the thruster-input model with explicit lag carry.

    ``step((x, lag_state), u8) -> (x', lag_state')``.  The lag filter
    advances once per outer step; its output wrench is held constant across
    RK4 stages (see module docstring of
    :mod:`bluerov2_dynamics_tpu.models.thrusters` for the semantics
    rationale vs. ``fossen/BlueROV2.py:503-510``).
    """
    stepper = _STEPPERS[method]

    def step(carry, u8):
        x, lag_state = carry
        if use_lag:
            lag_state, tau = thruster_wrench(cfg, lag, lag_state, u8)
        else:
            tau = thruster_wrench_nolag(cfg, u8)
        x = stepper(lambda xx, tt: wrench_rhs_euler(p, xx, tt), x, tau, dt)
        return (x, lag_state)

    return step


def make_wrench_step(
    p: FossenParams,
    dt: float,
    method: str = "euler",
    state: str = "euler12",
    renormalize: bool = True,
) -> Callable:
    """Discrete step ``step(x, tau) -> x'`` for the wrench-input models.

    ``state='euler12'`` or ``'quat13'``; for quat13 the quaternion is
    renormalized after each step when ``renormalize=True``.
    """
    stepper = _STEPPERS[method]
    if state == "euler12":
        rhs = wrench_rhs_euler
        post = None
    elif state == "quat13":
        rhs = wrench_rhs_quat
        post = renormalize_quat13 if renormalize else None
    else:
        raise ValueError(f"unknown state convention {state!r}")

    def step(x, tau):
        x = stepper(lambda xx, tt: rhs(p, xx, tt), x, tau, dt)
        if post is not None:
            x = post(x)
        return x

    return step


def simulate_thruster(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    x0,
    U,
    dt: float,
    method: str = "euler",
    use_lag: bool = True,
    lag_state0=None,
):
    """Open-loop rollout of the thruster-input model.

    ``x0``: ``(..., 12)``, ``U``: ``(T, ..., 8)`` (time leading).  Returns
    trajectory ``(T+1, ..., 12)`` with x0 in row 0, matching
    ``simulate_physics`` (``train_tank_brov2_full_comparison.py:453-466``).
    """
    if lag_state0 is None:
        lag_state0 = jnp.zeros((*x0.shape[:-1], 8, 3), x0.dtype)
    step = make_thruster_step(p, cfg, lag, dt, method, use_lag)
    (_, _), (traj, _) = rollout(step, (x0, lag_state0), U, include_initial=True)
    return traj


def simulate_wrench(
    p: FossenParams,
    x0,
    TAU,
    dt: float,
    method: str = "euler",
    state: str = "euler12",
    renormalize: bool = True,
):
    """Open-loop rollout of a wrench-input model (euler12 or quat13).

    ``TAU``: ``(T, ..., 6)``.  Returns ``(T+1, ..., n)`` with x0 in row 0.
    """
    step = make_wrench_step(p, dt, method, state, renormalize)
    _, traj = rollout(step, x0, TAU, include_initial=True)
    return traj


# ---------------------------------------------------------------------------
# Reduced 9-state RHS (reference bluerov_torch.py) — used by PINc physics loss
# ---------------------------------------------------------------------------

def reduced_rhs(rp: ReducedParams, x9, u4):
    """xdot for the reduced state ``[x,y,z,cos(psi),sin(psi),u,v,w,r]``
    with input ``[X, Y, Z, Mz]``.

    Faithfully reproduces ``fossen/bluerov_torch.py:20-67`` including the
    two documented sign quirks kept there to match the original experiments
    (comments at ``bluerov_torch.py:57-58``).
    """
    cpsi, spsi = x9[..., 3], x9[..., 4]
    u, v, w, r = x9[..., 5], x9[..., 6], x9[..., 7], x9[..., 8]
    X, Y, Z, Mz = u4[..., 0], u4[..., 1], u4[..., 2], u4[..., 3]

    x_d = cpsi * u - spsi * v
    y_d = spsi * u + cpsi * v
    z_d = w
    cpsi_d = -spsi * r
    spsi_d = cpsi * r

    u_d = (X + (rp.m - rp.Y_vd) * v * r + (rp.X_u + rp.X_uc * jnp.abs(u)) * u) / (rp.m - rp.X_ud)
    v_d = (Y - (rp.m - rp.X_ud) * u * r + (rp.Y_v + rp.Y_vc * jnp.abs(v)) * v) / (rp.m - rp.Y_vd)
    w_d = (Z + (rp.Z_w + rp.Z_wc * jnp.abs(w)) * w + rp.m * rp.g - rp.F_buoy) / (rp.m - rp.Z_wd)
    r_d = (Mz - (rp.X_ud - rp.Y_vd) * u * v + (rp.N_r + rp.N_rc * jnp.abs(r)) * r) / (rp.I_zz - rp.N_rd)

    return jnp.stack([x_d, y_d, z_d, cpsi_d, spsi_d, u_d, v_d, w_d, r_d], axis=-1)
