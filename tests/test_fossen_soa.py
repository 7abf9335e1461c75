"""Parity of the batch-last (SoA) fast path with the canonical step."""

import numpy as np
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.fossen_soa import make_thruster_step_soa
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config


def _setup(dt=0.02):
    p = fossen_params(dtype=jnp.float64)
    cfg = thruster_config(dtype=jnp.float64)
    lag = lag_params(dt, dtype=jnp.float64)
    return p, cfg, lag


def test_soa_step_matches_canonical(rng):
    dt = 0.02
    p, cfg, lag = _setup(dt)
    B, T = 16, 30
    X = rng.normal(size=(B, 12)) * 0.5
    U = np.clip(rng.normal(size=(T, 8)) * 0.5, -1, 1)

    for method in ("euler", "rk4"):
        step_aos = fossen.make_thruster_step(p, cfg, lag, dt, method=method)
        step_soa = make_thruster_step_soa(p, cfg, lag, dt, method=method)

        xa = jnp.asarray(X)
        la = jnp.zeros((B, 8, 3), jnp.float64)
        xs = jnp.asarray(X.T)
        ls = jnp.zeros((8, 3, B), jnp.float64)
        for t in range(T):
            u = jnp.asarray(U[t])
            xa, la = step_aos((xa, la), u)
            xs, ls = step_soa((xs, ls), u)
        np.testing.assert_allclose(np.asarray(xs.T), np.asarray(xa), atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(ls, -1, 0)), np.asarray(la), atol=1e-11
        )


def test_soa_per_trajectory_inputs(rng):
    dt = 0.02
    p, cfg, lag = _setup(dt)
    B = 8
    X = rng.normal(size=(B, 12)) * 0.3
    U = np.clip(rng.normal(size=(B, 8)), -1, 1)

    step_aos = fossen.make_thruster_step(p, cfg, lag, dt, method="rk4")
    step_soa = make_thruster_step_soa(p, cfg, lag, dt, method="rk4")
    xa, la = step_aos((jnp.asarray(X), jnp.zeros((B, 8, 3), jnp.float64)), jnp.asarray(U))
    xs, ls = step_soa((jnp.asarray(X.T), jnp.zeros((8, 3, B), jnp.float64)), jnp.asarray(U.T))
    np.testing.assert_allclose(np.asarray(xs.T), np.asarray(xa), atol=1e-12)
