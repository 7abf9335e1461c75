"""Parity of the Pallas VMEM-resident rollout with the canonical scan path
(interpret mode on CPU; the same kernel compiles on TPU — see bench.py)."""

import numpy as np
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config
from bluerov2_dynamics_tpu.ops.integrators import rollout
from bluerov2_dynamics_tpu.ops.pallas_rollout import (
    rollout_final_pallas,
    shared_tau_sequence,
)


def _setup(dt=0.02):
    return (
        fossen_params(dtype=jnp.float32),
        thruster_config(dtype=jnp.float32),
        lag_params(dt, dtype=jnp.float32),
    )


def test_shared_tau_sequence_matches_step_path(rng):
    dt = 0.02
    p, cfg, lag = _setup(dt)
    U = jnp.asarray(np.clip(rng.normal(size=(20, 8)), -1, 1), jnp.float32)
    tau = np.asarray(shared_tau_sequence(cfg, lag, U))
    from bluerov2_dynamics_tpu.models.thrusters import thruster_wrench

    state = jnp.zeros((8, 3), jnp.float32)
    for t in range(20):
        state, tau_t = thruster_wrench(cfg, lag, state, U[t])
        np.testing.assert_allclose(tau[t], np.asarray(tau_t), rtol=1e-5, atol=1e-5)


def test_pallas_rollout_matches_scan(rng):
    dt = 0.02
    p, cfg, lag = _setup(dt)
    B, T = 16, 50
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.3, jnp.float32)
    U = jnp.asarray(np.clip(rng.normal(size=(T, 8)) * 0.5, -1, 1), jnp.float32)

    for method in ("euler", "rk4"):
        got = rollout_final_pallas(
            p, cfg, lag, x0, U, dt, method=method, block_b=8, interpret=True
        )
        step = fossen.make_thruster_step(p, cfg, lag, dt, method=method)
        (want, _), _ = rollout(step, (x0, jnp.zeros((B, 8, 3), jnp.float32)), U)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_rollout_nolag(rng):
    dt = 0.05
    p, cfg, lag = _setup(dt)
    B, T = 8, 30
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.2, jnp.float32)
    U = jnp.asarray(np.clip(rng.normal(size=(T, 8)), -1, 1), jnp.float32)
    got = rollout_final_pallas(
        p, cfg, lag, x0, U, dt, method="rk4", block_b=8, interpret=True, use_lag=False
    )
    step = fossen.make_thruster_step(p, cfg, lag, dt, method="rk4", use_lag=False)
    (want, _), _ = rollout(step, (x0, jnp.zeros((B, 8, 3), jnp.float32)), U)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
