"""Sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.models import di, fossen
from bluerov2_dynamics_tpu.models.params import fossen_params
from bluerov2_dynamics_tpu.parallel import (
    make_mesh,
    shard_along,
    sharded_endpoint_rmse,
    sharded_rollout_final,
    shardmap_endpoint_rmse,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh(axis_names=("data",))


def _linear_step(rng):
    A = jnp.asarray(np.eye(3) + 0.01 * rng.normal(size=(3, 3)))
    B = jnp.asarray(0.1 * rng.normal(size=(2, 3)))
    return lambda x, u: x @ A + u @ B


def test_sharded_endpoint_rmse_matches_single_device(rng, mesh):
    step = _linear_step(rng)
    X = jnp.asarray(rng.normal(size=(120, 3)))
    U = jnp.asarray(rng.normal(size=(120, 2)))
    for H in (4, 9):
        want = float(metrics.endpoint_rmse(step, X, U, H))
        got = float(sharded_endpoint_rmse(mesh, step, X, U, H))
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_shardmap_endpoint_rmse_matches_single_device(rng, mesh):
    step = _linear_step(rng)
    # n_start = 104 - 8 = 96 divisible by 8
    X = jnp.asarray(rng.normal(size=(104, 3)))
    U = jnp.asarray(rng.normal(size=(104, 2)))
    want = float(metrics.endpoint_rmse(step, X, U, 8))
    got = float(shardmap_endpoint_rmse(mesh, step, X, U, 8))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sharded_fossen_rollout_matches_local(rng, mesh):
    p = fossen_params(dtype=jnp.float64)
    dt = 0.02
    step = fossen.make_wrench_step(p, dt, method="rk4")
    B, T = 64, 25
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.2)
    TAU = jnp.asarray(rng.normal(size=(T, 6)))
    got = sharded_rollout_final(mesh, step, x0, TAU, T)
    # check output sharding really spans the mesh
    assert len(got.sharding.device_set) == 8
    # local reference
    x = x0
    for t in range(T):
        x = step(x, TAU[t])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-10)


def test_shard_along_places_batch(rng, mesh):
    x = shard_along(mesh, jnp.zeros((32, 12)))
    assert len(x.sharding.device_set) == 8


def test_dp_gradient_allreduce(rng, mesh):
    """DP training-step pattern: batch sharded, params replicated, grads
    match the single-device computation (XLA inserts the all-reduce)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    W = jnp.asarray(rng.normal(size=(12, 3)))
    X = jnp.asarray(rng.normal(size=(64, 12)))
    Y = jnp.asarray(rng.normal(size=(64, 3)))

    def loss(W, X, Y):
        return jnp.mean((X @ W - Y) ** 2)

    g_local = jax.grad(loss)(W, X, Y)
    bs = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    g_sharded = jax.jit(
        jax.grad(loss), in_shardings=(repl, bs, bs), out_shardings=repl
    )(W, X, Y)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), atol=1e-12)


def test_sharded_koopman_fit_matches_single_device(rng, mesh):
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.parallel.sharded import sharded_koopman_fit

    # simple stable linear system data
    A = np.eye(4) * 0.95 + 0.01 * rng.normal(size=(4, 4))
    Bm = 0.05 * rng.normal(size=(2, 4))
    X = np.zeros((321, 4))
    U = rng.normal(size=(321, 2))
    x = rng.normal(size=4)
    for k in range(321):
        X[k] = x
        x = x @ A + U[k] @ Bm
    X, U = jnp.asarray(X), jnp.asarray(U)

    single = koopman.fit(jax.random.PRNGKey(0), X, U, n_rbfs=12, gamma=1.0,
                         ridge=1e-6)
    shard = sharded_koopman_fit(mesh, jax.random.PRNGKey(0), X, U,
                                n_rbfs=12, gamma=1.0, ridge=1e-6)
    np.testing.assert_allclose(np.asarray(shard.centers),
                               np.asarray(single.centers), atol=1e-9)
    np.testing.assert_allclose(np.asarray(shard.A), np.asarray(single.A),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(shard.B), np.asarray(single.B),
                               atol=1e-7)
    # and the fitted model predicts
    err = float(koopman.evaluate(shard, X, U))
    assert err < 1e-4
