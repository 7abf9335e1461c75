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


def test_pallas_rollout_with_ocean_current(rng):
    """Nonzero NED current folds into the kernel correctly (closes the
    round-2 silent-zero-current hazard): parity vs the canonical step,
    and the current demonstrably changes the trajectory."""
    dt = 0.02
    _, cfg, lag = _setup(dt)
    p = fossen_params(current=(0.3, -0.2, 0.1), dtype=jnp.float32)
    B, T = 8, 40
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.3, jnp.float32)
    U = jnp.asarray(np.clip(rng.normal(size=(T, 8)) * 0.5, -1, 1), jnp.float32)

    for method in ("euler", "rk4"):
        got = rollout_final_pallas(
            p, cfg, lag, x0, U, dt, method=method, block_b=8, interpret=True
        )
        step = fossen.make_thruster_step(p, cfg, lag, dt, method=method)
        (want, _), _ = rollout(step, (x0, jnp.zeros((B, 8, 3), jnp.float32)), U)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    p0 = fossen_params(dtype=jnp.float32)
    no_cur = rollout_final_pallas(
        p0, cfg, lag, x0, U, dt, method="rk4", block_b=8, interpret=True
    )
    with_cur = rollout_final_pallas(
        p, cfg, lag, x0, U, dt, method="rk4", block_b=8, interpret=True
    )
    assert np.abs(np.asarray(no_cur) - np.asarray(with_cur)).max() > 1e-3


def test_pallas_endpoint_eval_with_ocean_current(rng):
    """The sliding-window evaluator kernel inherits the current fix."""
    from bluerov2_dynamics_tpu.ops.pallas_eval import make_endpoint_final_pallas

    dt = 0.02
    _, cfg, lag = _setup(dt)
    p = fossen_params(current=(0.25, 0.15, -0.05), dtype=jnp.float32)
    N, H = 80, 10
    U = jnp.asarray(np.clip(rng.normal(size=(N, 8)) * 0.4, -1, 1), jnp.float32)
    step = fossen.make_thruster_step(p, cfg, lag, dt, method="rk4")
    x0 = jnp.asarray(rng.normal(size=12) * 0.2, jnp.float32)
    X = fossen.simulate_thruster(p, cfg, lag, x0, U, dt, method="rk4")[:-1]

    fe = make_endpoint_final_pallas(p, cfg, lag, dt, H, method="rk4",
                                    block_b=8, interpret=True)
    final = fe(X, U)

    # canonical evaluator: fresh lag per start, same semantics
    n_start = N - H
    carry = (X[:n_start], jnp.zeros((n_start, 8, 3), jnp.float32))
    import jax as _jax

    def body(carry, t):
        u_t = _jax.lax.dynamic_slice_in_dim(U, t, n_start, axis=0)
        return step(carry, u_t), None

    (want, _), _ = _jax.lax.scan(body, carry, jnp.arange(H))
    np.testing.assert_allclose(np.asarray(final), np.asarray(want), atol=2e-5)
