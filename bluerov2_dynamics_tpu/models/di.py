"""Learned linear "double integrator" (DI) baseline model.

TPU-native rebuild of the per-script DI code in the reference training
pipeline — all three variants:

* **discrete euler12** — ``train_tank_brov2_full_comparison.py:510-595``:
  body-frame velocity integration, small-angle attitude update,
  position via R_b2n;
* **continuous euler12 (RK4)** — ``train_tank_brov2_rk4.py:420-547``:
  the same model expressed as a continuous RHS integrated with RK4;
* **discrete quat13** — ``train_tank_brov2_wrench_quat.py:300-394``:
  quaternion attitude with per-step renormalization.

Gains are ridge solves over finite-differenced velocities; input dimension
is generic (8 thruster commands or 6 wrench components).  All steps are
natively batched; the endpoint evaluator runs through
:func:`bluerov2_dynamics_tpu.eval.metrics.endpoint_rmse`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.ops.quaternion import (
    quat_derivative,
    quat_normalize,
    quat_rotate,
)
from bluerov2_dynamics_tpu.ops.rotations import rotate_b2n


class DIGains(NamedTuple):
    K_lin: jnp.ndarray  # (r, 3) input -> body linear acceleration
    K_ang: jnp.ndarray  # (r, 3) input -> body angular acceleration


@jax.jit
def estimate_gains(X_train, U_train, dt, ridge: float = 1e-3) -> DIGains:
    """Ridge-solve the input->acceleration maps from forward differences.

    Works for both state conventions: velocities are taken from the last
    six state columns (euler12 cols 6:12, quat13 cols 7:13), exactly the
    slices the reference uses (``train_tank_brov2_full_comparison.py:510-528``,
    ``train_tank_brov2_wrench_quat.py:300-323``).
    """
    vel = X_train[:, -6:]
    dvel = (vel[1:] - vel[:-1]) / jnp.maximum(dt, 1e-9)
    G = U_train[:-1]
    with jax.default_matmul_precision("highest"):
        gram = G.T @ G
        rhs_lin = G.T @ dvel[:, 0:3]
        rhs_ang = G.T @ dvel[:, 3:6]
    gram = gram + ridge * jnp.eye(gram.shape[0], dtype=gram.dtype)
    K_lin = jax.scipy.linalg.solve(gram, rhs_lin, assume_a="pos")
    K_ang = jax.scipy.linalg.solve(gram, rhs_ang, assume_a="pos")
    return DIGains(K_lin=K_lin, K_ang=K_ang)


def di_rhs_euler12(gains: DIGains, x, u):
    """Continuous-time DI RHS on the euler12 state
    (``train_tank_brov2_rk4.py:462-495``): dpos = R v, dang = omega,
    dv = u @ K_lin, domega = u @ K_ang."""
    phi, theta, psi = x[..., 3], x[..., 4], x[..., 5]
    v = x[..., 6:9]
    w = x[..., 9:12]
    dpos = rotate_b2n(phi, theta, psi, v)
    return jnp.concatenate([dpos, w, u @ gains.K_lin, u @ gains.K_ang], axis=-1)


def make_step_euler12(gains: DIGains, dt: float):
    """Discrete DI step (semi-explicit, small-angle attitude), matching
    ``simulate_double_integrator`` at
    ``train_tank_brov2_full_comparison.py:531-573``: position/attitude
    advance with the *current* velocities, then velocities update."""

    def step(x, u):
        phi, theta, psi = x[..., 3], x[..., 4], x[..., 5]
        v = x[..., 6:9]
        w = x[..., 9:12]
        pos_next = x[..., 0:3] + dt * rotate_b2n(phi, theta, psi, v)
        ang_next = x[..., 3:6] + dt * w
        v_next = v + dt * (u @ gains.K_lin)
        w_next = w + dt * (u @ gains.K_ang)
        return jnp.concatenate([pos_next, ang_next, v_next, w_next], axis=-1)

    return step


def make_step_euler12_rk4(gains: DIGains, dt: float):
    """RK4 step of the continuous DI RHS (``train_tank_brov2_rk4.py:497-525``)."""
    from bluerov2_dynamics_tpu.ops.integrators import rk4_step

    def step(x, u):
        return rk4_step(lambda xx, uu: di_rhs_euler12(gains, xx, uu), x, u, dt)

    return step


def make_step_quat13(gains: DIGains, dt: float):
    """Discrete DI step on the quat13 state with per-step quaternion
    renormalization (``train_tank_brov2_wrench_quat.py:324-373``)."""

    def step(x, u):
        q = quat_normalize(x[..., 3:7])
        v = x[..., 7:10]
        w = x[..., 10:13]
        pos_next = x[..., 0:3] + dt * quat_rotate(q, v)
        q_next = quat_normalize(q + dt * quat_derivative(q, w))
        v_next = v + dt * (u @ gains.K_lin)
        w_next = w + dt * (u @ gains.K_ang)
        return jnp.concatenate([pos_next, q_next, v_next, w_next], axis=-1)

    return step


def simulate(gains: DIGains, x0, U_seq, dt: float, variant: str = "euler12"):
    """Open-loop DI rollout; returns ``(T+1, n)`` with x0 in row 0."""
    from bluerov2_dynamics_tpu.ops.integrators import rollout

    step = {
        "euler12": make_step_euler12,
        "euler12_rk4": make_step_euler12_rk4,
        "quat13": make_step_quat13,
    }[variant](gains, dt)
    _, traj = rollout(step, x0, U_seq, include_initial=True)
    return traj
