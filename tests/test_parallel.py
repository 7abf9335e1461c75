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


# ---------------------------------------------------------------------------
# Workload-shape tests: the real tank configuration sizes
# (d = 512 lift = 500 RBFs + 12 state, N ~ 45k starts, H = 100, 36k-row fit;
#  cf. Koopman/koopmanEDMDc.py:172-200 scale, best_results.txt:798-801)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh(shape=(4, 2), axis_names=("data", "model"))


def test_workload_koopman_tp_multistep_d512_matches_single_device(rng, mesh2d):
    """d=512 Koopman operator TP-sharded over 'model', 2048 starts over
    'data', H=100 — must agree with the single-device evaluator to 1e-6."""
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.models.koopman import KoopmanModel
    from bluerov2_dynamics_tpu.parallel.sharded import (
        sharded_koopman_multistep_rmse,
    )

    n_state, k_rbfs, r, H = 12, 500, 8, 100
    d = n_state + k_rbfs
    N = 2048 + H
    model = KoopmanModel(
        centers=jnp.asarray(rng.normal(size=(k_rbfs, n_state))),
        gamma=jnp.asarray(3.0),
        A=jnp.asarray(0.99 * np.eye(d) + 0.001 * rng.normal(size=(d, d))),
        B=jnp.asarray(0.01 * rng.normal(size=(d, r))),
    )
    X = jnp.asarray(rng.normal(size=(N, n_state)))
    U = jnp.asarray(rng.normal(size=(N, r)))
    want = float(koopman.multistep_rmse(model, X, U, H))
    got = float(sharded_koopman_multistep_rmse(mesh2d, model, X, U, H))
    assert np.isfinite(want)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # the conv endpoint under the same TP+DP layout matches its own
    # single-device twin
    want_c = float(koopman.multistep_rmse(model, X, U, H, method="conv"))
    got_c = float(sharded_koopman_multistep_rmse(mesh2d, model, X, U, H,
                                                 method="conv"))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-6)
    np.testing.assert_allclose(got_c, want, rtol=1e-3)
    with pytest.raises(ValueError):  # same method contract as the twin
        sharded_koopman_multistep_rmse(mesh2d, model, X, U, H, method="Conv")


def test_workload_physics_endpoint_45k_starts_h100(rng, mesh):
    """shard_map endpoint evaluator at the tank-recording scale: 44.8k
    start indices, H=100 RK4 steps — vs the single-device evaluator."""
    p = fossen_params(dtype=jnp.float64)
    step = fossen.make_wrench_step(p, 0.02, method="rk4")
    H = 100
    N = 44_800 + H  # n_start = 44,800 divisible by the 8-device axis
    X = jnp.asarray(rng.normal(size=(N, 12)) * 0.1)
    TAU = jnp.asarray(rng.normal(size=(N, 6)))
    want = float(metrics.endpoint_rmse(step, X, TAU, H))
    got = float(shardmap_endpoint_rmse(mesh, step, X, TAU, H))
    assert np.isfinite(want)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_workload_sharded_fit_36k_rows_500_rbfs(rng, mesh):
    """Row-sharded Koopman fit at the tank scale (36k snapshot rows,
    500 RBFs, gamma=3, ridge=1e-1 — train_tank_brov2_koopmanEDMDc.py:26-28)
    must reproduce the single-device fit."""
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.parallel.sharded import sharded_koopman_fit

    n_rows = 36_000
    X = jnp.asarray(0.5 * rng.normal(size=(n_rows, 12)))
    U = jnp.asarray(rng.normal(size=(n_rows, 8)))
    key = jax.random.PRNGKey(0)
    single = koopman.fit(key, X, U, n_rbfs=500, gamma=3.0, ridge=1e-1)
    shard = sharded_koopman_fit(mesh, key, X, U, n_rbfs=500, gamma=3.0,
                                ridge=1e-1)
    np.testing.assert_allclose(np.asarray(shard.centers),
                               np.asarray(single.centers), atol=1e-9)
    np.testing.assert_allclose(np.asarray(shard.A), np.asarray(single.A),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard.B), np.asarray(single.B),
                               atol=1e-6)


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


def test_sharded_koopman_fit_position_invariant_and_decoder(rng, mesh):
    """The sharded fit supports the PI dictionary + learned decoder
    (round-2 gap: the framework's best-accuracy configuration silently
    degraded to the full-state lift when fitted sharded)."""
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.parallel.sharded import sharded_koopman_fit

    # drifting positions so PI actually changes the fit
    X = np.cumsum(0.1 * rng.normal(size=(801, 12)), axis=0)
    U = rng.normal(size=(801, 8))
    X, U = jnp.asarray(X), jnp.asarray(U)
    key = jax.random.PRNGKey(0)

    single = koopman.fit(key, X, U, n_rbfs=16, gamma=1.0, ridge=1e-4,
                         position_invariant=True)
    single = koopman.fit_decoder(single, X, ridge=1e-6)
    shard = sharded_koopman_fit(mesh, key, X, U, n_rbfs=16, gamma=1.0,
                                ridge=1e-4, position_invariant=True,
                                fit_decoder=True, decoder_ridge=1e-6)

    assert shard.rbf_weights is not None
    np.testing.assert_allclose(np.asarray(shard.rbf_weights),
                               np.asarray(single.rbf_weights), atol=0)
    np.testing.assert_allclose(np.asarray(shard.centers),
                               np.asarray(single.centers), atol=1e-9)
    np.testing.assert_allclose(np.asarray(shard.A), np.asarray(single.A),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard.B), np.asarray(single.B),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard.decoder),
                               np.asarray(single.decoder), atol=1e-6)
    # the PI model is invariant to a rigid translation of the positions
    X_shift = X.at[:, :3].add(jnp.asarray([5.0, -3.0, 2.0]))
    z_a = koopman.lift(shard, X[:10])
    z_b = koopman.lift(shard, X_shift[:10])
    np.testing.assert_allclose(np.asarray(z_a[:, 12:]),
                               np.asarray(z_b[:, 12:]), atol=1e-6)


def test_shardmap_endpoint_rmse_pallas_matches_single_device(rng, mesh):
    """The Pallas VMEM evaluator composed with shard_map (interpret mode on
    the CPU mesh) matches the single-device kernel and the canonical scan
    evaluator — the fastest single-chip path demonstrated sharded."""
    from bluerov2_dynamics_tpu.models import fossen
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params, lag_params, thruster_config,
    )
    from bluerov2_dynamics_tpu.ops.pallas_eval import endpoint_rmse_pallas
    from bluerov2_dynamics_tpu.parallel.sharded import (
        shardmap_endpoint_rmse_pallas,
    )

    dt = 0.02
    H = 10
    p = fossen_params(dtype=jnp.float32)
    cfg = thruster_config(dtype=jnp.float32)
    lag = lag_params(dt, dtype=jnp.float32)
    n_dev = mesh.shape["data"]
    N = 48 * n_dev + H  # n_start divisible by the data axis
    U = jnp.asarray(np.clip(rng.normal(size=(N, 8)) * 0.4, -1, 1), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=12) * 0.2, jnp.float32)
    X = fossen.simulate_thruster(p, cfg, lag, x0, U, dt, method="rk4")[:-1]
    X = jnp.asarray(np.asarray(X), jnp.float32)

    got = float(shardmap_endpoint_rmse_pallas(
        mesh, p, cfg, lag, X, U, dt, H, block_b=16, interpret=True
    ))
    want = float(endpoint_rmse_pallas(
        p, cfg, lag, X, U, dt, H, block_b=16, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_shardmap_endpoint_rmse_pallas_wrench_matches_single_device(rng, mesh):
    """The wrench-euler12 sliding-window kernel (T3 physics baseline) under
    shard_map matches the single-device evaluator."""
    from bluerov2_dynamics_tpu.eval.metrics import rmse
    from bluerov2_dynamics_tpu.ops.pallas_eval import (
        make_endpoint_final_pallas_wrench,
    )
    from bluerov2_dynamics_tpu.parallel.sharded import (
        shardmap_endpoint_rmse_pallas_wrench,
    )

    dt, H = 0.02, 10
    p = fossen_params(dtype=jnp.float32)
    n_dev = mesh.shape["data"]
    N = 40 * n_dev + H
    TAU = jnp.asarray(rng.normal(size=(N, 6)) * 4.0, jnp.float32)
    X = [jnp.asarray(rng.normal(size=12) * 0.2, jnp.float32)]
    for t in range(N - 1):
        X.append(X[-1] + dt * fossen.wrench_rhs_euler(p, X[-1], TAU[t]))
    X = jnp.stack(X)

    got = float(shardmap_endpoint_rmse_pallas_wrench(
        mesh, p, X, TAU, dt, H, block_b=16, interpret=True
    ))
    fn = make_endpoint_final_pallas_wrench(p, dt, H, block_b=16,
                                           interpret=True)
    want = float(rmse(X[H:].astype(jnp.float32), fn(X, TAU)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_shardmap_endpoint_rmse_pallas_quat_matches_single_device(rng, mesh):
    """The quat13 sliding-window kernel (T4 physics baseline) under
    shard_map matches the single-device evaluator."""
    from bluerov2_dynamics_tpu.eval.metrics import rmse
    from bluerov2_dynamics_tpu.ops.pallas_quat import (
        make_endpoint_final_pallas_quat,
    )
    from bluerov2_dynamics_tpu.parallel.sharded import (
        shardmap_endpoint_rmse_pallas_quat,
    )
    from bluerov2_dynamics_tpu.ops import quaternion as quat

    dt, H = 0.02, 10
    p = fossen_params(dtype=jnp.float32)
    n_dev = mesh.shape["data"]
    N = 40 * n_dev + H
    TAU = jnp.asarray(rng.normal(size=(N, 6)) * 4.0, jnp.float32)
    x = jnp.zeros(13, jnp.float32).at[3].set(1.0)
    X = [x]
    for t in range(N - 1):
        x = x + dt * fossen.wrench_rhs_quat(p, x, TAU[t])
        x = x.at[3:7].set(quat.quat_normalize(x[3:7]))
        X.append(x)
    X = jnp.stack(X)

    got = float(shardmap_endpoint_rmse_pallas_quat(
        mesh, p, X, TAU, dt, H, block_b=16, interpret=True
    ))
    fn = make_endpoint_final_pallas_quat(p, dt, H, block_b=16,
                                         interpret=True)
    want = float(rmse(X[H:].astype(jnp.float32), fn(X, TAU)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_evaluators_nan_for_h_ge_n(mesh):
    """H >= N returns NaN like the single-device twins (koopman.py /
    metrics.py guards), instead of crashing on a negative slice size."""
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.models import fossen
    from bluerov2_dynamics_tpu.models.params import fossen_params

    from bluerov2_dynamics_tpu.parallel.sharded import (
        shardmap_endpoint_rmse,
        shardmap_endpoint_rmse_pallas_wrench,
    )

    p = fossen_params(dtype=jnp.float32)
    step = fossen.make_wrench_step(p, 0.02, method="euler")
    X = jnp.zeros((8, 12), jnp.float32)
    TAU = jnp.zeros((8, 6), jnp.float32)
    out = sharded_endpoint_rmse(mesh, step, X, TAU, H=8)
    assert np.isnan(float(out))
    out = shardmap_endpoint_rmse(mesh, step, X, TAU, H=20)
    assert np.isnan(float(out))
    out = shardmap_endpoint_rmse_pallas_wrench(
        mesh, p, X, TAU, 0.02, H=8, interpret=True)
    assert np.isnan(float(out))


def test_sharded_ekf_bank_matches_single_device(rng, mesh):
    from bluerov2_dynamics_tpu.models import estimation
    from bluerov2_dynamics_tpu.parallel import sharded_ekf_bank

    step = _linear_step(rng)
    h = lambda x: x[:2]
    n, m, r, T = 3, 2, 2, 30
    Q = jnp.eye(n) * 1e-4
    R = jnp.eye(m) * 1e-2
    P0 = jnp.eye(n) * 0.1
    for B in (16, 11):  # divisible and non-divisible by 8
        U = jnp.asarray(rng.normal(size=(B, T - 1, r)))
        Y = jnp.asarray(rng.normal(size=(B, T, m)))
        m0 = jnp.asarray(rng.normal(size=(B, n)))
        got = sharded_ekf_bank(mesh, step, h, Q, R, m0, P0, U, Y)
        for b in (0, B - 1):
            want = estimation.ekf(step, h, Q, R, m0[b], P0, U[b], Y[b])
            np.testing.assert_allclose(np.asarray(got.means[b]),
                                       np.asarray(want.means), rtol=1e-6,
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(got.covs[b]),
                                       np.asarray(want.covs), rtol=1e-5,
                                       atol=1e-10)
            np.testing.assert_allclose(float(got.loglik[b]),
                                       float(want.loglik), rtol=1e-8)
        with pytest.raises(ValueError):
            sharded_ekf_bank(mesh, step, h, Q, R, m0, P0, U[:, :-1], Y)


def test_sharded_pf_bank_matches_single_device(rng, mesh):
    """Per-trajectory fold_in keys make the sharded PF bank bit-comparable
    to the same vmapped bank on one device, for divisible and
    non-divisible batch sizes."""
    from bluerov2_dynamics_tpu.models import estimation
    from bluerov2_dynamics_tpu.parallel import sharded_pf_bank

    step = _linear_step(rng)
    h = lambda x: x[:2]
    n, m, r, T, NP = 3, 2, 2, 20, 64
    Q = jnp.eye(n) * 1e-4
    R = jnp.eye(m) * 1e-2
    P0 = jnp.eye(n) * 0.1
    key = jax.random.PRNGKey(4)
    for B in (16, 11):
        U = jnp.asarray(rng.normal(size=(B, T - 1, r)))
        Y = jnp.asarray(rng.normal(size=(B, T, m)))
        m0 = jnp.asarray(rng.normal(size=(B, n)))
        got = sharded_pf_bank(mesh, step, h, Q, R, m0, P0, U, Y, key,
                              n_particles=NP)
        for b in (0, B - 1):
            want = estimation.particle_filter(
                step, h, Q, R, m0[b], P0, U[b], Y[b], n_particles=NP,
                key=jax.random.fold_in(key, jnp.uint32(b)))
            np.testing.assert_allclose(np.asarray(got.means[b]),
                                       np.asarray(want.means), rtol=1e-5,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(got.ess[b]),
                                       np.asarray(want.ess), rtol=1e-5)
            np.testing.assert_allclose(float(got.loglik[b]),
                                       float(want.loglik), rtol=1e-6)
        with pytest.raises(ValueError):
            sharded_pf_bank(mesh, step, h, Q, R, m0, P0, U[:, :-1], Y, key,
                            n_particles=NP)


def test_sharded_streaming_stats_matches_sequential(rng, mesh):
    """The row-sharded streaming accumulator equals the sequential scan —
    boundary pairs via halos, forgetting via per-shard global-age decay —
    for lam=1 and lam<1, fresh and resumed."""
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.parallel import sharded_streaming_stats

    X = jnp.asarray(rng.normal(size=(160, 3)))
    U = jnp.asarray(rng.normal(size=(160, 2)))
    centers = jnp.asarray(rng.normal(size=(5, 3)))

    for lam in (1.0, 0.98):
        init = koopman.streaming_init(centers, 0.6, input_dim=2,
                                      dtype=X.dtype)
        want = koopman.streaming_scan(init, X, U, 16, forgetting=lam)
        got = sharded_streaming_stats(mesh, init, X, U, chunk=16,
                                      forgetting=lam)
        np.testing.assert_allclose(np.asarray(got.gram),
                                   np.asarray(want.gram), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(got.rhs),
                                   np.asarray(want.rhs), rtol=1e-9)
        np.testing.assert_allclose(float(got.weight_sum),
                                   float(want.weight_sum), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got.prev_z),
                                   np.asarray(want.prev_z), rtol=1e-12)
        assert float(got.prev_valid) == 1.0

        # resume: prior data in stats0 decays by lam^M and shard 0 picks
        # up the boundary pair against stats0's carried sample
        mid = 96
        s_seq = koopman.streaming_scan(init, X[:mid], U[:mid], 16,
                                       forgetting=lam)
        got2 = sharded_streaming_stats(mesh, s_seq, X[mid:], U[mid:],
                                       chunk=16, forgetting=lam)
        want2 = koopman.streaming_scan(init, X, U, 16, forgetting=lam)
        np.testing.assert_allclose(np.asarray(got2.gram),
                                   np.asarray(want2.gram), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(got2.rhs),
                                   np.asarray(want2.rhs), rtol=1e-9)
        np.testing.assert_allclose(float(got2.weight_sum),
                                   float(want2.weight_sum), rtol=1e-12)

    with pytest.raises(ValueError, match="divisible"):
        sharded_streaming_stats(mesh, init, X[:150], U[:150], chunk=16)


def test_sharded_mppi_matches_single_device(rng, mesh):
    """simulate_mppi(mesh=...) shards the sample axis (noise batch +
    parallel rollouts) and GSPMD inserts the softmax all-reduces; the
    draws are identical to the unsharded call (counter-based threefry),
    so the closed-loop trajectories agree up to reduction order."""
    from bluerov2_dynamics_tpu.models import control

    A = jnp.asarray(np.eye(3) * 0.9 + 0.02 * rng.normal(size=(3, 3)))
    B = jnp.asarray(0.2 * rng.normal(size=(3, 2)))

    def step(x, u):
        return x @ A.T + jnp.tanh(u) @ B.T

    x0 = jnp.asarray(rng.normal(size=3))
    kwargs = dict(
        sim_steps=15, horizon=8, n_samples=64, sigma=0.2,
        temperature=0.05, init_rounds=5, replan_rounds=2, u_dim=2,
        key=jax.random.PRNGKey(3), dtype=x0.dtype)
    X_ref, U_ref = control.simulate_mppi(step, x0, jnp.zeros(3), **kwargs)
    X_sh, U_sh = control.simulate_mppi(step, x0, jnp.zeros(3), mesh=mesh,
                                       **kwargs)
    np.testing.assert_allclose(np.asarray(X_sh), np.asarray(X_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(U_ref),
                               rtol=1e-9, atol=1e-12)
    # and it actually regulates (the sampled plan is doing work)
    assert float(jnp.linalg.norm(X_sh[-1])) < 0.3 * float(
        jnp.linalg.norm(x0))
