"""PINc tests: conversions, wrench mapping, network invariants, training."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import pinc
from bluerov2_dynamics_tpu.models.params import (
    fossen_params,
    lag_params,
    reduced_params,
    thruster_config,
)
from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.ops.integrators import rollout


def test_state_conversions_roundtrip(rng):
    X12 = rng.normal(size=(20, 12))
    X9 = pinc.state12_to_9(jnp.asarray(X12))
    assert X9.shape == (20, 9)
    np.testing.assert_allclose(np.asarray(X9[:, 3]), np.cos(X12[:, 5]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(X9[:, 4]), np.sin(X12[:, 5]), atol=1e-12)
    X12b = np.asarray(pinc.state9_to_12(X9))
    np.testing.assert_allclose(X12b[:, 0:3], X12[:, 0:3], atol=1e-12)
    # psi recovered mod 2pi
    dpsi = (X12b[:, 5] - X12[:, 5] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dpsi, 0.0, atol=1e-9)
    np.testing.assert_allclose(X12b[:, 6:9], X12[:, 6:9], atol=1e-12)
    np.testing.assert_allclose(X12b[:, 11], X12[:, 11], atol=1e-12)
    # zeroed channels
    np.testing.assert_allclose(X12b[:, 3:5], 0.0)
    np.testing.assert_allclose(X12b[:, 9:11], 0.0)


def test_wrench4_matches_sequential_loop(rng):
    """The scanned lag-filtered wrench map equals the stateful per-row loop."""
    from bluerov2_dynamics_tpu.models.thrusters import (
        lag_step,
        static_thrust,
        wrench_from_thrust,
    )

    dt = 0.02
    cfg = thruster_config(dtype=jnp.float64)
    lag = lag_params(dt, dtype=jnp.float64)
    U8 = jnp.asarray(np.clip(rng.normal(size=(40, 8)), -1, 1))
    got = np.asarray(pinc.wrench4_from_thrusters(cfg, lag, U8))
    state = jnp.zeros((8, 3), jnp.float64)
    for t in range(40):
        state, F = lag_step(lag, state, static_thrust(cfg, U8[t]))
        tau = np.asarray(wrench_from_thrust(cfg, F))
        np.testing.assert_allclose(got[t], tau[[0, 1, 2, 5]], atol=1e-12)


def test_pincnet_output_invariants(rng):
    net, params = pinc.init_params(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.normal(size=(16, 14)), jnp.float32)
    out = net.apply(params, z)
    assert out.shape == (16, 9)
    # cos/sin renormalized to the unit circle
    norms = np.linalg.norm(np.asarray(out[:, 3:5]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_pincnet_param_count_matches_architecture():
    net, params = pinc.init_params(jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Dense(14->64) + 3x Dense(64->64) + Dense(64->9) + 4 LayerNorm(2*64) + 4 beta
    expect = (14 * 64 + 64) + 3 * (64 * 64 + 64) + (64 * 9 + 9) + 4 * 128 + 4
    assert n == expect


def _synthetic_reduced_data(rng, N=800, dt=0.05):
    """Generate a trajectory of the reduced physics model under smooth inputs."""
    rp = reduced_params(dtype=jnp.float64)
    u4 = np.zeros((N, 4))
    u = np.zeros(4)
    for k in range(N):
        u = 0.95 * u + 0.4 * rng.normal(size=4)
        u4[k] = u
    x = jnp.asarray([0.0, 0, 0, 1.0, 0.0, 0, 0, 0, 0], jnp.float64)

    def step(x, u):
        return x + dt * fossen.reduced_rhs(rp, x, u)

    _, X9 = rollout(step, x, jnp.asarray(u4), include_initial=True)
    return np.asarray(X9[:-1]), u4


def test_pinc_training_learns_dynamics(rng):
    """A short training run must beat the identity (persistence) baseline."""
    X9, U4 = _synthetic_reduced_data(rng)
    dt = 0.05
    X9 = jnp.asarray(X9, jnp.float32)
    U4 = jnp.asarray(U4, jnp.float32)
    z = jnp.concatenate([X9[:-1], U4[:-1], jnp.full((len(X9) - 1, 1), dt)], axis=1)
    data = pinc.PINcData(z=z, y=X9[1:], u4=U4[:-1])
    # physics_weight=0 isolates supervised learning (the physics term
    # penalizes ||xdot|| at the prediction, biasing toward equilibria)
    tc = pinc.TrainConfig(epochs=60, batch=128, lr=3e-3, rollout_steps=5,
                          rollout_windows=8, physics_weight=0.0)
    net, params, hist = pinc.train(jax.random.PRNGKey(0), data, tc)
    # training converges by orders of magnitude and reaches the same scale
    # as the persistence baseline in this short run (the reference PINc run
    # diverged outright to RMSE ~8.7, best_results.txt:793)
    assert hist[-1] < 0.01 * hist[0]
    step = pinc.make_step(net, params, dt)
    pred = step(X9[:-1], U4[:-1])
    model_rmse = float(jnp.sqrt(jnp.mean((pred - X9[1:]) ** 2)))
    persist_rmse = float(jnp.sqrt(jnp.mean((X9[:-1] - X9[1:]) ** 2)))
    assert model_rmse < 2.0 * persist_rmse
    assert np.all(np.isfinite(np.asarray(pred)))


def test_pinc_endpoint_rmse_matches_naive(rng):
    net, params = pinc.init_params(jax.random.PRNGKey(3))
    dt = 0.05
    N, H = 30, 5
    X12 = jnp.asarray(rng.normal(size=(N, 12)), jnp.float32)
    U4 = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    got = float(pinc.endpoint_rmse(net, params, X12, U4, dt, H))
    # naive: per-start 9D rollouts
    step = pinc.make_step(net, params, dt)
    se = 0.0
    for k in range(N - H):
        x9 = pinc.state12_to_9(X12[k])
        for t in range(H):
            x9 = step(x9, U4[k + t])
        e = np.asarray(pinc.state9_to_12(x9)) - np.asarray(X12[k + H])
        se += float(e @ e)
    want = np.sqrt(se / ((N - H) * 12))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pinc_simulate_shapes():
    net, params = pinc.init_params(jax.random.PRNGKey(0))
    x0 = jnp.zeros(12)
    U4 = jnp.zeros((25, 4))
    traj = pinc.simulate(net, params, x0, U4, 0.05)
    assert traj.shape == (26, 12)
    np.testing.assert_allclose(np.asarray(traj[0]), 0.0)


def test_pinc_checkpoint_roundtrip(tmp_path):
    from bluerov2_dynamics_tpu.utils.checkpoint import load_pytree, save_pytree

    net, params = pinc.init_params(jax.random.PRNGKey(0))
    path = tmp_path / "pinc.msgpack"
    save_pytree(path, params)
    net2, params2 = pinc.init_params(jax.random.PRNGKey(42))
    restored = load_pytree(path, params2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_physics_loss_stop_gradient():
    """stop_gradient=True (reference semantics) must yield zero gradients."""
    rp = reduced_params(dtype=jnp.float32)
    x = jnp.ones((4, 9))
    u = jnp.ones((4, 4))

    g_free = jax.grad(lambda x: pinc.physics_loss(rp, x, u, False))(x)
    g_stop = jax.grad(lambda x: pinc.physics_loss(rp, x, u, True))(x)
    assert float(jnp.abs(g_free).sum()) > 0
    np.testing.assert_allclose(np.asarray(g_stop), 0.0)


def test_endpoint_rmse_psi_modes(rng):
    """'ssa' scoring removes 2*pi*k psi-wrap artifacts of the 9->12
    embedding (the reference metric's dominant error term on unwrapped
    datasets); 'raw' reproduces the reference semantics."""
    net, params = pinc.init_params(jax.random.PRNGKey(3))
    dt = 0.05
    N, H = 30, 5
    X12 = jnp.asarray(rng.normal(size=(N, 12)) * 0.1, jnp.float32)
    # unwrapped psi far outside [-pi, pi]
    X12 = X12.at[:, 5].add(4 * np.pi)
    U4 = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    raw = float(pinc.endpoint_rmse(net, params, X12, U4, dt, H, psi_error="raw"))
    fair = float(pinc.endpoint_rmse(net, params, X12, U4, dt, H, psi_error="ssa"))
    assert fair < raw
    # raw error is dominated by the ~4*pi wrap on the psi channel
    assert raw > 4 * np.pi / np.sqrt(12) * 0.8


def test_pinc_cosine_schedule_trains(rng):
    """lr_schedule='cosine' (warmup + decay) trains and converges; the
    final-epoch loss is at least as good as the constant-lr run's."""
    X9, U4 = _synthetic_reduced_data(rng)
    dt = 0.05
    X9 = jnp.asarray(X9, jnp.float32)
    U4 = jnp.asarray(U4, jnp.float32)
    z = jnp.concatenate([X9[:-1], U4[:-1], jnp.full((len(X9) - 1, 1), dt)], axis=1)
    data = pinc.PINcData(z=z, y=X9[1:], u4=U4[:-1])
    kwargs = dict(epochs=40, batch=128, lr=3e-3, rollout_steps=5,
                  rollout_windows=8, physics_weight=0.0)
    _, _, hist_const = pinc.train(
        jax.random.PRNGKey(0), data, pinc.TrainConfig(**kwargs))
    _, _, hist_cos = pinc.train(
        jax.random.PRNGKey(0), data,
        pinc.TrainConfig(lr_schedule="cosine", **kwargs))
    assert np.isfinite(hist_cos).all()
    assert hist_cos[-1] < 0.05 * hist_cos[0]          # converges
    assert hist_cos[-1] < 3.0 * hist_const[-1]        # competitive


def test_pinc_train_mesh_dp_matches_single_device(rng):
    """DP training over an 8-device mesh reproduces the single-device loss
    trajectory with the same key (params replicated, batch sharded; the
    only difference is f32 gradient reduction order)."""
    from jax.sharding import Mesh

    X9, U4 = _synthetic_reduced_data(rng)
    dt = 0.05
    X9 = jnp.asarray(X9, jnp.float32)
    U4 = jnp.asarray(U4, jnp.float32)
    z = jnp.concatenate([X9[:-1], U4[:-1], jnp.full((len(X9) - 1, 1), dt)], axis=1)
    data = pinc.PINcData(z=z, y=X9[1:], u4=U4[:-1])
    tc = pinc.TrainConfig(epochs=5, batch=128, lr=3e-3, rollout_steps=5,
                          rollout_windows=8, physics_weight=0.5)

    _, params_1, hist_1 = pinc.train(jax.random.PRNGKey(0), data, tc)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    net, params_8, hist_8 = pinc.train(jax.random.PRNGKey(0), data, tc,
                                       mesh=mesh)

    np.testing.assert_allclose(hist_8, hist_1, rtol=2e-4)
    for l1, l8 in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_8)):
        np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                                   rtol=5e-3, atol=2e-5)
    # the trained (sharded-run) params still work in plain inference
    step = pinc.make_step(net, params_8, dt)
    assert np.all(np.isfinite(np.asarray(step(X9[:-1], U4[:-1]))))


def test_pinc_train_mesh_rejects_indivisible_batch(rng):
    from jax.sharding import Mesh

    X9, U4 = _synthetic_reduced_data(rng)
    z = jnp.concatenate([X9[:-1], U4[:-1], jnp.full((len(X9) - 1, 1), 0.05)],
                        axis=1).astype(jnp.float32)
    data = pinc.PINcData(z=z, y=jnp.asarray(X9[1:], jnp.float32),
                         u4=jnp.asarray(U4[:-1], jnp.float32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError, match="mesh"):
        pinc.train(jax.random.PRNGKey(0), data,
                   pinc.TrainConfig(epochs=1, batch=100), mesh=mesh)


def test_pinc_train_dataset_smaller_than_batch(rng):
    """N < tc.batch clamps the effective batch instead of crashing inside
    the jitted epoch (reshape of a short permutation)."""
    X9, U4 = _synthetic_reduced_data(rng)
    X9, U4 = X9[:90], U4[:90]
    z = jnp.concatenate([X9[:-1], U4[:-1], jnp.full((len(X9) - 1, 1), 0.05)],
                        axis=1).astype(jnp.float32)
    data = pinc.PINcData(z=z, y=jnp.asarray(X9[1:], jnp.float32),
                         u4=jnp.asarray(U4[:-1], jnp.float32))
    tc = pinc.TrainConfig(epochs=2, batch=256, rollout_steps=5,
                          rollout_windows=4, physics_weight=0.0)
    _, params, hist = pinc.train(jax.random.PRNGKey(0), data, tc,
                                 hidden=(8, 8))
    assert len(hist) == 2 and np.all(np.isfinite(hist))


def test_load_torch_checkpoint_full_module_requires_opt_in(tmp_path):
    """A .pt that is not a weights-only state_dict is refused with a clear
    opt-in error; allow_full_unpickle=True gets past the refusal (and then
    fails on checkpoint structure, not on the safety gate)."""
    torch = pytest.importorskip("torch")

    path = tmp_path / "full.pt"
    torch.save({"payload": object()}, path)  # refused by weights_only=True

    with pytest.raises(ValueError, match="allow_full_unpickle"):
        pinc.load_torch_checkpoint(path)
    with pytest.raises(KeyError):  # unpickled fine, not a PINc state_dict
        pinc.load_torch_checkpoint(path, allow_full_unpickle=True)
