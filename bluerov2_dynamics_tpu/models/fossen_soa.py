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
from bluerov2_dynamics_tpu.ops.pallas_rollout import _make_rhs_rows


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
    # ONE copy of the physics: the same rows RHS the Pallas kernels use
    # (ops/pallas_rollout._make_rhs_rows -> _make_hydro_rows), applied to
    # the (12, B) tile's rows and restacked.  The previous private
    # _rhs_soa duplicated every hydro term by hand (and computed the
    # current rotation even for zero current).
    rhs_rows = _make_rhs_rows(p)

    def rhs(x, tau):
        out = rhs_rows(tuple(x[i] for i in range(12)),
                       tuple(tau[i] for i in range(6)))
        return jnp.stack(out)

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
            x = x + dt * rhs(x, tau)
        elif method == "rk4":
            k1 = rhs(x, tau)
            k2 = rhs(x + 0.5 * dt * k1, tau)
            k3 = rhs(x + 0.5 * dt * k2, tau)
            k4 = rhs(x + dt * k3, tau)
            x = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        else:
            raise ValueError(method)
        return (x, lag_state)

    return step
