"""Thruster actuation: T200 static curve, wrench map, third-order lag.

Replaces the reference's per-thruster Python loop + stateful filter objects
(``/root/reference/fossen/BlueROV2.py:234-278, 464-510``) with batched
array kernels and **explicit** lag state of shape ``(..., 8, 3)`` threaded
through the rollout carry.

Design note on lag semantics: the reference advances the lag filters as a
side effect of *every* RHS evaluation, so RK4 advances them four times per
step and the state leaks across rollout starts
(SURVEY.md §3.3).  Here the lag advances exactly once per outer integrator
step and the resulting dynamic thrust is zero-order-held across RK4 stages
— a principled, pure-function semantic.  For explicit-Euler integration
(one RHS call per step) this matches the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models.params import LagParams, ThrusterConfig


def static_thrust(cfg: ThrusterConfig, V):
    """T200 static thrust curve F(V) for normalized commands V in [-1, 1].

    ``F = 8.9 V + 176 V^3 - 404.1 V^5 + 389.9 V^7 - 140.3 V^9``
    (``fossen/BlueROV2.py:234-243``), evaluated in Horner form on V^2.
    Natively batched over any shape.

    This is also the reference's legacy lag-free curve
    ``_old_thruster_force_from_input`` (``fossen/BlueROV2.py:234-246``,
    dead code there): the polynomial is identical; the production path
    merely feeds it through the lag filter.  Parity pinned in
    ``tests/test_reference_parity.py::test_legacy_static_thrust_curve_parity``.
    """
    c1, c3, c5, c7, c9 = (cfg.curve[i] for i in range(5))
    V2 = V * V
    return V * (c1 + V2 * (c3 + V2 * (c5 + V2 * (c7 + V2 * c9))))


def wrench_from_thrust(cfg: ThrusterConfig, F):
    """Body wrench tau (..., 6) from per-thruster forces F (..., 8).

    ``tau = sum_i F_i [d_i ; r_i x d_i] = F @ wrench_map``
    (``fossen/BlueROV2.py:265-278``), a single small GEMM over the batch.
    """
    return F @ cfg.wrench_map


def lag_step(lag: LagParams, state, F_cmd):
    """Advance all lag filters one sample.

    Parameters
    ----------
    state : ``(..., 8, 3)`` filter states (zeros = at-rest filters).
    F_cmd : ``(..., 8)`` commanded static thrusts.

    Returns ``(new_state, F_dyn)`` with ``F_dyn`` of shape ``(..., 8)``.
    Discrete update ``x' = Ad x + Bd u``, output ``F = c . x'`` — matching
    ``ThrusterLag.step`` (``fossen/BlueROV2.py:503-510``) where the output
    is read *after* the state update.
    """
    new_state = state @ lag.Ad.T + F_cmd[..., None] * lag.Bd
    F_dyn = new_state @ lag.c
    return new_state, F_dyn


def init_lag_state(batch_shape=(), dtype=jnp.float32):
    """Zero (at-rest) lag state of shape ``batch_shape + (8, 3)``."""
    return jnp.zeros((*batch_shape, 8, 3), dtype)


def thruster_wrench(cfg: ThrusterConfig, lag: LagParams, lag_state, u8):
    """Full actuation path: commands -> static curve -> lag -> body wrench.

    Returns ``(new_lag_state, tau)``; equivalent to
    ``compute_thruster_forces`` (``fossen/BlueROV2.py:265-278``) for one
    sample step, but batched and pure.
    """
    F_cmd = static_thrust(cfg, u8)
    new_state, F_dyn = lag_step(lag, lag_state, F_cmd)
    return new_state, wrench_from_thrust(cfg, F_dyn)


def thruster_wrench_nolag(cfg: ThrusterConfig, u8):
    """Static-curve-only wrench (lag disabled), cf. the commented-out path
    at ``fossen/BlueROV2.py:260-261``."""
    return wrench_from_thrust(cfg, static_thrust(cfg, u8))


def effective_wrench_history(cfg: ThrusterConfig, lag: LagParams, U,
                             lag_state0=None, use_lag: bool = True):
    """Per-step applied body wrench ``(N, 6)`` over a recorded command
    sequence ``U`` ``(N, 8)``.

    Entry ``k`` is the wrench the vehicle experienced during the step that
    consumed ``U[k]``, with the third-order lag advanced exactly as
    ``fossen.make_thruster_step`` does (once per outer step, from at-rest
    filters unless ``lag_state0`` is given).  The lag dynamics depend only
    on the commands — never on the vehicle state — so the entire history
    is one linear ``lax.scan``.  This converts a thruster-contract
    recording into the wrench-input contract *exactly*
    (``simulate_thruster(...) == simulate_wrench(..., history)``, pinned
    by ``tests/test_fossen.py``), which is what lets a 12-state EKF run on
    a thruster dataset without augmenting its state with the 24 lag
    coordinates (``apps/estimate.py``).
    """
    U = jnp.asarray(U)
    F_cmd = static_thrust(cfg, U)
    if not use_lag:
        return wrench_from_thrust(cfg, F_cmd)
    if lag_state0 is None:
        lag_state0 = init_lag_state(dtype=F_cmd.dtype)

    def body(L, f):
        new_L, F_dyn = lag_step(lag, L, f)
        return new_L, F_dyn

    _, F_hist = jax.lax.scan(body, lag_state0, F_cmd)
    return wrench_from_thrust(cfg, F_hist)


def tf_to_ss(num, den):
    """Transfer function -> controllable-canonical state space (host-side).

    The reference derives its thruster-lag (A, B, C) realization from the
    third-order transfer function in a MATLAB scratch file
    (``fossen/thrust_dynamics.m``); this utility provides the same
    capability in-repo.  ``num``/``den`` are descending-power coefficient
    sequences; returns ``(A, B, C, D)`` NumPy arrays.
    """
    import numpy as np

    num = np.atleast_1d(np.asarray(num, np.float64))
    den = np.atleast_1d(np.asarray(den, np.float64))
    den = den / den[0]
    n = len(den) - 1
    num = np.concatenate([np.zeros(n + 1 - len(num)), num / 1.0])
    d0 = num[0]
    # strictly-proper part coefficients: b_i - a_i * d0
    b = num[1:] - den[1:] * d0
    A = np.zeros((n, n))
    A[0, :] = -den[1:]
    A[1:, :-1] = np.eye(n - 1)
    B = np.zeros((n, 1))
    B[0, 0] = 1.0
    C = b[None, :]
    D = np.array([[d0]])
    return A, B, C, D
