"""Synthetic dataset generation — fully on device.

Rebuild of the simulation workload's data generator
(``/root/reference/training/train_sim_brov2_koopmanEDMDc.py:150-197``):
AR(1)-smoothed random thruster commands drive the full Fossen model with
explicit Euler at dt=0.05; per-channel Gaussian sensor noise is added to
the recorded states.  The reference loops 240k steps in Python; here input
generation, simulation and noising are one jitted ``lax.scan`` +
vectorized noise draw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models.fossen import make_thruster_step
from bluerov2_dynamics_tpu.models.params import (
    FossenParams,
    LagParams,
    ThrusterConfig,
    fossen_params,
    lag_params,
    thruster_config,
)


class SimDataset(NamedTuple):
    X: jnp.ndarray        # (N, 12) noisy "measured" states
    X_true: jnp.ndarray   # (N, 12) noiseless states
    U: jnp.ndarray        # (N, 8) applied inputs
    dt: float


def ar1_commands(key, n_steps: int, n_inputs: int = 8, alpha: float = 0.98,
                 noise: float = 0.02, clip: float = 1.0, dtype=jnp.float32):
    """Smooth random commands u_{k+1} = clip(alpha u_k + noise * N(0,1))
    (``train_sim_brov2_koopmanEDMDc.py:161-164``)."""
    keys = jax.random.split(key, n_steps)

    def body(u, k):
        u = jnp.clip(alpha * u + noise * jax.random.normal(k, (n_inputs,), dtype),
                     -clip, clip)
        return u, u

    _, U = jax.lax.scan(body, jnp.zeros((n_inputs,), dtype), keys)
    return U


def generate_sim_dataset(
    key,
    n_steps: int = 240_000,
    dt: float = 0.05,
    p: FossenParams | None = None,
    cfg: ThrusterConfig | None = None,
    lag: LagParams | None = None,
    method: str = "euler",
    pos_noise: float = 5e-4,
    ang_noise: float = 1e-3,
    vel_noise: float = 5e-4,
    angvel_noise: float = 1e-3,
    x0=None,
    dtype=jnp.float32,
) -> SimDataset:
    """Generate the simulation-workload dataset (states AFTER each step, as
    the reference records them)."""
    p = p if p is not None else fossen_params(dtype=dtype)
    cfg = cfg if cfg is not None else thruster_config(dtype=dtype)
    lag = lag if lag is not None else lag_params(dt, dtype=dtype)
    k_u, k_n = jax.random.split(key)
    U = ar1_commands(k_u, n_steps, dtype=dtype)
    step = make_thruster_step(p, cfg, lag, dt, method=method)

    if x0 is None:
        x0 = jnp.zeros(12, dtype)

    @jax.jit
    def run(x0, U):
        def body(carry, u):
            carry = step(carry, u)
            return carry, carry[0]

        _, X_true = jax.lax.scan(body, (x0, jnp.zeros((8, 3), dtype)), U)
        return X_true

    X_true = run(x0, U)
    sigma = jnp.concatenate(
        [
            jnp.full(3, pos_noise, dtype),
            jnp.full(3, ang_noise, dtype),
            jnp.full(3, vel_noise, dtype),
            jnp.full(3, angvel_noise, dtype),
        ]
    )
    X = X_true + sigma * jax.random.normal(k_n, X_true.shape, dtype)
    return SimDataset(X=X, X_true=X_true, U=U, dt=dt)
