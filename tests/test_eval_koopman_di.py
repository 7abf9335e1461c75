"""Tests for the shared evaluator, the Koopman EDMDc stack, and the DI model."""

import numpy as np
import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.models import di, fossen, koopman
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config
from bluerov2_dynamics_tpu.ops.kmeans import kmeans


# ------------------------------ evaluator ------------------------------

def _naive_endpoint_rmse(step_np, X, U, H):
    """Per-start python-loop oracle mirroring the reference evaluator shape
    (rollout each start k for H steps, score the endpoint)."""
    N, n = X.shape
    n_start = N - H
    se = 0.0
    for k in range(n_start):
        x = X[k]
        for t in range(H):
            x = step_np(x, U[k + t])
        e = x - X[k + H]
        se += float(e @ e)
    return np.sqrt(se / (n_start * n))


def test_endpoint_rmse_matches_naive_loop(rng):
    A = np.eye(3) + 0.01 * rng.normal(size=(3, 3))
    Bm = 0.1 * rng.normal(size=(2, 3))
    X = rng.normal(size=(40, 3))
    U = rng.normal(size=(40, 2))

    step_np = lambda x, u: x @ A + u @ Bm
    Aj, Bj = jnp.asarray(A), jnp.asarray(Bm)
    step_jax = lambda x, u: x @ Aj + u @ Bj

    for H in (1, 5, 10):
        got = float(metrics.endpoint_rmse(step_jax, jnp.asarray(X), jnp.asarray(U), H))
        want = _naive_endpoint_rmse(step_np, X, U, H)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_one_step_rmse(rng):
    X = rng.normal(size=(30, 4))
    U = rng.normal(size=(30, 2))
    step = lambda x, u: x  # predicts no motion
    got = float(metrics.one_step_rmse(step, jnp.asarray(X), jnp.asarray(U)))
    want = np.sqrt(np.mean((X[1:] - X[:-1]) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_endpoint_rmse_carry_fossen_vs_per_start_rollouts(rng):
    """The sliding-window physics evaluator must equal per-start rollouts
    (each with fresh lag state)."""
    dt = 0.05
    p = fossen_params(dtype=jnp.float64)
    cfg = thruster_config(dtype=jnp.float64)
    lag = lag_params(dt, dtype=jnp.float64)
    # a short synthetic trajectory
    N, H = 30, 7
    U = jnp.asarray(np.clip(rng.normal(size=(N, 8)) * 0.3, -1, 1))
    x0 = jnp.zeros(12, dtype=jnp.float64).at[2].set(2.0)
    X = fossen.simulate_thruster(p, cfg, lag, x0, U, dt)[:-1]  # (N, 12)
    # add noise so the metric is non-trivial
    X = X + jnp.asarray(rng.normal(size=X.shape) * 1e-3)

    step = fossen.make_thruster_step(p, cfg, lag, dt, method="euler")
    got = float(
        metrics.endpoint_rmse_carry(
            lambda c, u: step(c, u),
            lambda x: jnp.zeros((*x.shape[:-1], 8, 3), x.dtype),
            X,
            U,
            H,
        )
    )
    # oracle: one rollout per start
    se = 0.0
    for k in range(N - H):
        traj = fossen.simulate_thruster(p, cfg, lag, X[k], U[k : k + H], dt)
        e = np.asarray(traj[-1]) - np.asarray(X[k + H])
        se += float(e @ e)
    want = np.sqrt(se / ((N - H) * 12))
    np.testing.assert_allclose(got, want, rtol=1e-9)


# ------------------------------ k-means ------------------------------

def test_kmeans_recovers_separated_clusters(rng):
    true_centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    X = np.concatenate(
        [tc + 0.1 * rng.normal(size=(200, 2)) for tc in true_centers]
    )
    centers, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(X), 4, iters=30)
    centers = np.asarray(centers)
    # each true center should have exactly one learned center within 0.1
    d = np.linalg.norm(true_centers[:, None] - centers[None], axis=-1)
    assert (d.min(axis=1) < 0.1).all()
    assert np.asarray(assign).shape == (800,)


def test_kmeans_deterministic(rng):
    X = jnp.asarray(rng.normal(size=(300, 5)))
    c1, _ = kmeans(jax.random.PRNGKey(7), X, 16)
    c2, _ = kmeans(jax.random.PRNGKey(7), X, 16)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


# ------------------------------ Koopman ------------------------------

def _make_linear_system_data(rng, N=600, n=4, r=2, dt=0.05, system=None, x0=None):
    if system is None:
        A = np.eye(n) + dt * 0.3 * rng.normal(size=(n, n))
        # ensure stability
        ev = np.max(np.abs(np.linalg.eigvals(A)))
        A /= max(1.0, ev * 1.01)
        Bm = dt * rng.normal(size=(r, n))
    else:
        A, Bm = system
    X = np.zeros((N, n))
    U = rng.normal(size=(N, r))
    x = rng.normal(size=n) if x0 is None else np.asarray(x0, float)
    for k in range(N):
        X[k] = x
        x = x @ A + U[k] @ Bm
    return X, U, (A, Bm)


def test_koopman_fits_linear_system(rng):
    X, U, _ = _make_linear_system_data(rng)
    model = koopman.fit(
        jax.random.PRNGKey(0),
        jnp.asarray(X),
        jnp.asarray(U),
        n_rbfs=20,
        gamma=0.5,
        ridge=1e-8,
    )
    err = float(koopman.evaluate(model, jnp.asarray(X), jnp.asarray(U)))
    assert err < 1e-5  # a linear system is exactly representable in the lift


def test_koopman_multistep_matches_manual_propagation(rng):
    X, U, _ = _make_linear_system_data(rng, N=200)
    model = koopman.fit(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(U), n_rbfs=10, gamma=1.0, ridge=1e-6
    )
    H = 8
    A = np.asarray(model.A)
    B = np.asarray(model.B)
    n_start = len(X) - H
    Z = np.asarray(koopman.lift(model, jnp.asarray(X[:n_start])))
    for t in range(H):
        Z = Z @ A.T + U[t : t + n_start] @ B.T
    want = np.sqrt(np.mean((X[H:] - Z[:, : X.shape[1]]) ** 2))
    got = float(koopman.multistep_rmse(model, jnp.asarray(X), jnp.asarray(U), H))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_koopman_multistep_conv_matches_scan(rng):
    """method="conv" (control-convolution endpoint) must equal the
    reference-faithful scan recurrence — same affine map, reassociated."""
    X, U, _ = _make_linear_system_data(rng, N=250, r=3)
    X, U = jnp.asarray(X), jnp.asarray(U)  # f64 under the test config
    model = koopman.fit(jax.random.PRNGKey(0), X, U,
                        n_rbfs=12, gamma=1.0, ridge=1e-6)
    for H in (0, 1, 2, 7, 64, 100):
        r_scan = float(koopman.multistep_rmse(model, X, U, H, method="scan"))
        r_conv = float(koopman.multistep_rmse(model, X, U, H, method="conv"))
        np.testing.assert_allclose(r_conv, r_scan, rtol=1e-9, atol=0,
                                   err_msg=f"H={H}")


def test_koopman_multistep_conv_f32_and_extras(rng):
    """conv/scan agreement holds at float32 (the production dtype) and
    composes with decoder + post_decode exactly like scan does."""
    X, U, _ = _make_linear_system_data(rng, N=200)
    X = jnp.asarray(X, jnp.float32)
    U = jnp.asarray(U, jnp.float32)
    model = koopman.fit(jax.random.PRNGKey(0), X, U,
                        n_rbfs=10, gamma=1.0, ridge=1e-6)
    model = koopman.fit_decoder(model, X, ridge=1e-6)
    post = lambda p: p * 2.0 + 1.0  # any jittable transform
    r_scan = float(koopman.multistep_rmse(model, X, U, 50,
                                          post_decode=post, method="scan"))
    r_conv = float(koopman.multistep_rmse(model, X, U, 50,
                                          post_decode=post, method="conv"))
    # f32 reassociation over 50 steps: the two orderings differ at a few
    # 1e-4 relative (the f64 test above pins the math identity at 1e-9)
    np.testing.assert_allclose(r_conv, r_scan, rtol=2e-3)


def test_koopman_multistep_bad_method_raises(rng):
    X, U, _ = _make_linear_system_data(rng, N=50)
    model = koopman.fit(jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(U),
                        n_rbfs=6, gamma=1.0, ridge=1e-6)
    try:
        koopman.multistep_rmse(model, jnp.asarray(X), jnp.asarray(U), 5,
                               method="magic")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_koopman_simulate_shapes_and_start(rng):
    X, U, _ = _make_linear_system_data(rng, N=100)
    model = koopman.fit(
        jax.random.PRNGKey(1), jnp.asarray(X), jnp.asarray(U), n_rbfs=8, gamma=1.0, ridge=1e-6
    )
    traj = koopman.simulate(model, jnp.asarray(X[0]), jnp.asarray(U[:20]))
    assert traj.shape == (21, 4)
    np.testing.assert_allclose(np.asarray(traj[0]), X[0])
    # short-horizon prediction should track a linear system well
    np.testing.assert_allclose(np.asarray(traj[1]), X[1], atol=1e-4)


def test_koopman_fit_multi_no_cross_bag(rng):
    """fit_multi on two bags of the same system should fit both; a
    discontinuity between bags must not corrupt the model."""
    X1, U1, sys_ab = _make_linear_system_data(rng, N=300)
    # second bag: same system, different rollout, starting far away so a
    # spurious cross-bag transition would be a huge outlier
    X2, U2, _ = _make_linear_system_data(rng, N=300, system=sys_ab, x0=X1[-1] + 3.0)
    model = koopman.fit_multi(
        jax.random.PRNGKey(0),
        [X1, X2],
        [U1, U2],
        n_rbfs=16,
        gamma=0.01,
        ridge=1e-8,
    )
    e1 = float(koopman.evaluate(model, jnp.asarray(X1), jnp.asarray(U1)))
    e2 = float(koopman.evaluate(model, jnp.asarray(X2), jnp.asarray(U2)))
    assert e1 < 1e-3 and e2 < 1e-3


def test_koopman_decoder_roundtrip(rng):
    X, U, _ = _make_linear_system_data(rng, N=150)
    model = koopman.fit(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(U), n_rbfs=8, gamma=1.0, ridge=1e-6
    )
    model_dec = koopman.fit_decoder(model, jnp.asarray(X), ridge=1e-8)
    Z = koopman.lift(model_dec, jnp.asarray(X))
    Xr = np.asarray(koopman.decode(model_dec, Z))
    assert np.sqrt(np.mean((Xr - X) ** 2)) < 1e-6


# ------------------------------ Double Integrator ------------------------------

def test_di_gains_recover_linear_map(rng):
    """Data generated with v_{k+1} = v + dt * U K must recover K."""
    dt = 0.02
    K_lin = rng.normal(size=(8, 3))
    K_ang = rng.normal(size=(8, 3))
    N = 500
    U = rng.normal(size=(N, 8))
    X = np.zeros((N, 12))
    v = np.zeros(3)
    w = np.zeros(3)
    for k in range(N):
        X[k, 6:9] = v
        X[k, 9:12] = w
        v = v + dt * U[k] @ K_lin
        w = w + dt * U[k] @ K_ang
    gains = di.estimate_gains(jnp.asarray(X), jnp.asarray(U), dt, ridge=1e-9)
    np.testing.assert_allclose(np.asarray(gains.K_lin), K_lin, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gains.K_ang), K_ang, atol=1e-5)


def test_di_discrete_step_matches_manual(rng):
    dt = 0.05
    gains = di.DIGains(
        K_lin=jnp.asarray(rng.normal(size=(8, 3))),
        K_ang=jnp.asarray(rng.normal(size=(8, 3))),
    )
    x0 = rng.normal(size=12)
    x0[3:5] *= 0.3
    u = rng.normal(size=8)
    got = np.asarray(di.make_step_euler12(gains, dt)(jnp.asarray(x0), jnp.asarray(u)))
    # manual reference semantics: pos/ang advance with current v/w
    import oracles

    R = oracles.rot_zyx(*x0[3:6])
    want = np.concatenate(
        [
            x0[0:3] + dt * (R @ x0[6:9]),
            x0[3:6] + dt * x0[9:12],
            x0[6:9] + dt * (u @ np.asarray(gains.K_lin)),
            x0[9:12] + dt * (u @ np.asarray(gains.K_ang)),
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_di_quat_step_preserves_norm(rng):
    dt = 0.05
    gains = di.DIGains(
        K_lin=jnp.asarray(rng.normal(size=(6, 3))),
        K_ang=jnp.asarray(rng.normal(size=(6, 3))),
    )
    x0 = np.zeros(13)
    x0[3] = 1.0
    x0[7:13] = rng.normal(size=6)
    traj = di.simulate(
        gains, jnp.asarray(x0), jnp.asarray(rng.normal(size=(50, 6))), dt, variant="quat13"
    )
    norms = np.linalg.norm(np.asarray(traj[:, 3:7]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)


def test_di_rk4_close_to_discrete_at_small_dt(rng):
    dt = 1e-3
    gains = di.DIGains(
        K_lin=jnp.asarray(0.1 * rng.normal(size=(8, 3))),
        K_ang=jnp.asarray(0.1 * rng.normal(size=(8, 3))),
    )
    x0 = jnp.zeros(12)
    U = jnp.asarray(rng.normal(size=(200, 8)))
    t1 = di.simulate(gains, x0, U, dt, variant="euler12")
    t2 = di.simulate(gains, x0, U, dt, variant="euler12_rk4")
    np.testing.assert_allclose(np.asarray(t1[-1]), np.asarray(t2[-1]), atol=1e-5)


def test_koopman_fit_sweep_and_select(rng):
    X, U, _ = _make_linear_system_data(rng, N=400)
    X, U = jnp.asarray(X), jnp.asarray(U)
    models, combos = koopman.fit_sweep(
        jax.random.PRNGKey(0), X[:300], U[:300],
        n_rbfs=10, gammas=(0.5, 1.0), ridges=(1e-8, 1e-2),
    )
    assert models.A.shape == (4, 14, 14)
    best, best_combo, rmses = koopman.select_best(models, combos, X[300:], U[300:], H=5)
    assert rmses.shape == (4,)
    assert best.A.shape == (14, 14)
    # the selected model scores best
    direct = float(koopman.multistep_rmse(best, X[300:], U[300:], 5))
    np.testing.assert_allclose(direct, float(jnp.min(rmses)), rtol=1e-6)
    # per-combo results match independent fits
    m0 = koopman.fit(jax.random.PRNGKey(0), X[:300], U[:300],
                     n_rbfs=10, gamma=0.5, ridge=1e-8)
    np.testing.assert_allclose(
        np.asarray(jax.tree.map(lambda a: a[0], models).A), np.asarray(m0.A),
        atol=1e-8,
    )
    # the conv scorer selects the same combo with matching scores
    best_c, combo_c, rmses_c = koopman.select_best(
        models, combos, X[300:], U[300:], H=5, method="conv")
    np.testing.assert_array_equal(np.asarray(combo_c), np.asarray(best_combo))
    np.testing.assert_allclose(np.asarray(rmses_c), np.asarray(rmses),
                               rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    from bluerov2_dynamics_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {"A": jnp.asarray(rng.normal(size=(4, 4))), "b": jnp.arange(3.0)}
    path = tmp_path / "ckpt"
    save_orbax(path, tree)
    restored = load_orbax(path, like=tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_koopman_multistep_with_decoder(rng):
    """multistep_rmse/evaluate route through the learned decoder when set."""
    X, U, _ = _make_linear_system_data(rng, N=200)
    X, U = jnp.asarray(X), jnp.asarray(U)
    model = koopman.fit(jax.random.PRNGKey(0), X, U, n_rbfs=8, gamma=1.0, ridge=1e-6)
    model_dec = koopman.fit_decoder(model, X, ridge=1e-8)
    r_plain = float(koopman.multistep_rmse(model, X, U, 5))
    r_dec = float(koopman.multistep_rmse(model_dec, X, U, 5))
    assert np.isfinite(r_dec)
    # a well-fit decoder should not be much worse than the slice readout
    assert r_dec < 10 * max(r_plain, 1e-9)


def test_koopman_simulate_batched(rng):
    """Batched x0 (B, n) with per-trajectory inputs (T, B, r)."""
    X, U, _ = _make_linear_system_data(rng, N=150)
    model = koopman.fit(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(U), n_rbfs=8,
        gamma=1.0, ridge=1e-6,
    )
    B, T = 4, 10
    x0 = jnp.asarray(X[:B])
    Useq = jnp.asarray(rng.normal(size=(T, B, 2)))
    traj = koopman.simulate(model, x0, Useq)
    assert traj.shape == (T + 1, B, 4)
    # batched result equals per-trajectory simulation
    for b in range(B):
        single = koopman.simulate(model, x0[b], Useq[:, b])
        np.testing.assert_allclose(np.asarray(traj[:, b]), np.asarray(single),
                                   atol=1e-9)


def test_koopman_position_invariant_fit(rng):
    """position_invariant=True masks x,y,z from the RBF distances: the
    model's predictions are invariant to rigid position offsets of the
    evaluation data, while the default full-state dictionary's are not."""
    from bluerov2_dynamics_tpu.data.synthetic import generate_sim_dataset

    ds = generate_sim_dataset(jax.random.PRNGKey(2), n_steps=1200, dt=0.02)
    X = jnp.asarray(np.asarray(ds.X), jnp.float32)
    U = jnp.asarray(np.asarray(ds.U), jnp.float32)
    m_pi = koopman.fit(jax.random.PRNGKey(0), X, U, n_rbfs=40,
                       position_invariant=True)
    assert m_pi.rbf_weights is not None
    np.testing.assert_array_equal(np.asarray(m_pi.rbf_weights[:3]), 0.0)
    np.testing.assert_array_equal(np.asarray(m_pi.rbf_weights[3:]), 1.0)
    # lifted features identical under a position shift
    shift = jnp.zeros(12).at[:3].set(5.0)
    Z0 = koopman.lift(m_pi, X[:50])
    Z1 = koopman.lift(m_pi, X[:50] + shift)
    np.testing.assert_allclose(np.asarray(Z1[:, 12:]), np.asarray(Z0[:, 12:]),
                               atol=1e-6)
    # the default dictionary is NOT shift-invariant
    m_full = koopman.fit(jax.random.PRNGKey(0), X, U, n_rbfs=40)
    assert m_full.rbf_weights is None
    F0 = koopman.lift(m_full, X[:50])[:, 12:]
    F1 = koopman.lift(m_full, X[:50] + shift)[:, 12:]
    assert float(jnp.abs(F1 - F0).max()) > 1e-3
    # and the PI model still predicts (finite, sane one-step error)
    err = float(koopman.evaluate(m_pi, X, U))
    assert np.isfinite(err) and err < 0.1


def test_select_best_nan_robust(rng):
    """A combo whose solve produced NaN must never win the selection."""
    from bluerov2_dynamics_tpu.models.koopman import KoopmanModel, select_best

    n, k, r = 3, 4, 2
    d = n + k
    good_A = jnp.eye(d) * 0.9
    bad_A = jnp.full((d, d), jnp.nan)
    models = KoopmanModel(
        centers=jnp.zeros((2, k, n)),
        gamma=jnp.ones(2),
        A=jnp.stack([bad_A, good_A]),      # combo 0 is NaN
        B=jnp.zeros((2, d, r)),
    )
    combos = jnp.asarray([[1.0, 1e-8], [1.0, 1e-1]])
    X = jnp.asarray(rng.normal(size=(40, n)) * 0.1)
    U = jnp.asarray(rng.normal(size=(40, r)))
    best, combo, rmses = select_best(models, combos, X, U, H=3)
    assert np.isnan(np.asarray(rmses)[0]) and np.isfinite(np.asarray(rmses)[1])
    assert float(combo[1]) == 1e-1          # the finite combo won
    assert np.all(np.isfinite(np.asarray(best.A)))


# ------------------------------ streaming fit ------------------------------

def _sim_linear(rng, M, Bm, x0, U):
    """Host oracle: x_{k+1} = x_k @ M.T + u_k @ Bm.T, returns (N, n)."""
    X = [x0]
    for u in U[:-1]:
        X.append(X[-1] @ M.T + u @ Bm.T)
    return np.stack(X)


def test_streaming_finalize_matches_batch_fit(rng):
    """lam=1 streaming over arbitrary chunks == the batch fit solve."""
    X = jnp.asarray(rng.normal(size=(120, 3)) * 0.5)
    U = jnp.asarray(rng.normal(size=(120, 2)))
    key = jax.random.PRNGKey(0)
    batch = koopman.fit(key, X, U, n_rbfs=6, gamma=0.7, ridge=1e-6)

    stats = koopman.streaming_init(batch.centers, batch.gamma, input_dim=2,
                                   dtype=X.dtype)
    for lo, hi in [(0, 17), (17, 18), (18, 63), (63, 120)]:
        stats = koopman.streaming_update(stats, X[lo:hi], U[lo:hi])
    model = koopman.streaming_finalize(stats, ridge=1e-6)
    np.testing.assert_allclose(np.asarray(model.A), np.asarray(batch.A),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(model.B), np.asarray(batch.B),
                               rtol=1e-7, atol=1e-10)
    assert float(stats.weight_sum) == 119.0  # N-1 pairs, all weight 1


def test_streaming_chunking_invariance(rng):
    """gram/rhs are invariant to the chunk split (boundary pairs carried),
    and streaming_scan equals manual equal-chunk updates for lam < 1."""
    X = jnp.asarray(rng.normal(size=(61, 3)))
    U = jnp.asarray(rng.normal(size=(61, 2)))
    centers = jnp.asarray(rng.normal(size=(5, 3)))
    lam = 0.95

    def run(splits):
        s = koopman.streaming_init(centers, 0.5, input_dim=2, dtype=X.dtype)
        lo = 0
        for hi in splits + [61]:
            s = koopman.streaming_update(s, X[lo:hi], U[lo:hi], lam)
            lo = hi
        return s

    a = run([9, 10, 40])
    b = run([30])
    np.testing.assert_allclose(np.asarray(a.gram), np.asarray(b.gram),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.rhs), np.asarray(b.rhs),
                               rtol=1e-10)
    np.testing.assert_allclose(float(a.weight_sum), float(b.weight_sum),
                               rtol=1e-12)

    s0 = koopman.streaming_init(centers, 0.5, input_dim=2, dtype=X.dtype)
    c = koopman.streaming_scan(s0, X, U, chunk=8, forgetting=lam)  # 7 chunks + tail 5
    np.testing.assert_allclose(np.asarray(c.gram), np.asarray(a.gram),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c.rhs), np.asarray(a.rhs),
                               rtol=1e-10)


def test_streaming_forgetting_weights_exact(rng):
    """Hand-computed exponentially-weighted gram on a tiny stream."""
    from bluerov2_dynamics_tpu.ops.lifting import rbf_lift

    X = jnp.asarray(rng.normal(size=(5, 2)))
    U = jnp.asarray(rng.normal(size=(5, 1)))
    centers = jnp.asarray(rng.normal(size=(3, 2)))
    gamma, lam = 0.8, 0.9

    s = koopman.streaming_init(centers, gamma, input_dim=1, dtype=X.dtype)
    s = koopman.streaming_update(s, X[:3], U[:3], lam)   # pairs (0,1),(1,2)
    s = koopman.streaming_update(s, X[3:], U[3:], lam)   # pairs (2,3),(3,4)

    Z = np.asarray(rbf_lift(X, centers, gamma))
    G = np.concatenate([Z[:-1], np.asarray(U[:-1])], axis=1)  # (4, d+r)
    Y = Z[1:]
    w = np.array([lam ** 3, lam ** 2, lam, 1.0])  # oldest pair decays most
    gram = (G * w[:, None]).T @ G
    rhs = (G * w[:, None]).T @ Y
    np.testing.assert_allclose(np.asarray(s.gram), gram, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s.rhs), rhs, rtol=1e-9)
    np.testing.assert_allclose(float(s.weight_sum), w.sum(), rtol=1e-12)


def test_streaming_forgetting_tracks_regime_change(rng):
    """After a plant change, an RLS-forgetting model beats the full-history
    fit on the new regime (the capability's reason to exist)."""
    n, r, N = 3, 2, 600

    def stable(raw):  # contractive regime matrix (spectral radius 0.9)
        return 0.9 * raw / np.abs(np.linalg.eigvals(raw)).max()

    M1 = stable(np.eye(n) + 0.3 * rng.normal(size=(n, n)))
    M2 = stable(np.eye(n) - 0.5 * rng.normal(size=(n, n)))
    Bm = 0.2 * rng.normal(size=(n, r))
    U = 0.5 * rng.normal(size=(N, r))
    X1 = _sim_linear(rng, M1, Bm, 0.1 * rng.normal(size=n), U[:300])
    X2 = _sim_linear(rng, M2, Bm, X1[-1] @ M2.T + U[299] @ Bm.T, U[300:])
    X = jnp.asarray(np.concatenate([X1, X2]))
    Uj = jnp.asarray(U)

    key = jax.random.PRNGKey(1)
    centers, _ = kmeans(key, X, 8, iters=10)
    init = koopman.streaming_init(centers, 0.5, input_dim=r, dtype=X.dtype)
    models = {}
    for lam in (1.0, 0.97):
        s = koopman.streaming_scan(init, X, Uj, chunk=50, forgetting=lam)
        models[lam] = koopman.streaming_finalize(s, ridge=1e-8)
    tail = slice(480, 600)
    err_full = float(koopman.evaluate(models[1.0], X[tail], Uj[tail]))
    err_rls = float(koopman.evaluate(models[0.97], X[tail], Uj[tail]))
    assert err_rls < 0.5 * err_full, (err_rls, err_full)


def test_streaming_edge_cases(rng):
    """Empty chunks are no-ops (live-source polls); non-positive chunk
    sizes are rejected instead of silently absorbing nothing."""
    import pytest

    centers = jnp.asarray(rng.normal(size=(3, 2)))
    s = koopman.streaming_init(centers, 0.5, input_dim=1, dtype=jnp.float64)
    X = jnp.asarray(rng.normal(size=(4, 2)))
    U = jnp.asarray(rng.normal(size=(4, 1)))
    s1 = koopman.streaming_update(s, X, U)
    s2 = koopman.streaming_update(s1, X[:0], U[:0])  # empty poll
    np.testing.assert_array_equal(np.asarray(s2.gram), np.asarray(s1.gram))
    np.testing.assert_array_equal(np.asarray(s2.prev_z),
                                  np.asarray(s1.prev_z))
    for bad in (0, -5):
        with pytest.raises(ValueError, match="chunk"):
            koopman.streaming_scan(s, X, U, bad)


def test_fit_streaming_equals_batch_fit(rng):
    """fit_streaming at forgetting=1 reproduces fit (same k-means, same
    pairs; Gram accumulated chunkwise instead of one GEMM)."""
    X = jnp.asarray(rng.normal(size=(300, 3)) * 0.5)
    U = jnp.asarray(rng.normal(size=(300, 2)))
    key = jax.random.PRNGKey(3)
    batch = koopman.fit(key, X, U, n_rbfs=6, gamma=0.7, ridge=1e-5)
    stream = koopman.fit_streaming(key, X, U, n_rbfs=6, gamma=0.7,
                                   ridge=1e-5, chunk=64)
    np.testing.assert_allclose(np.asarray(stream.A), np.asarray(batch.A),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(stream.B), np.asarray(batch.B),
                               rtol=1e-7, atol=1e-10)
    # position-invariant path carries the mask through the accumulator
    pi = koopman.fit_streaming(key, X, U, n_rbfs=6, gamma=0.7, ridge=1e-5,
                               chunk=64, position_invariant=True)
    assert pi.rbf_weights is not None
    err = float(koopman.evaluate(pi, X, U))
    assert np.isfinite(err)


def test_streaming_episode_update_semantics(rng):
    """Episode updates are self-contained in both directions, and
    segmenting a contiguous trajectory into overlapping-endpoint episodes
    reproduces the whole-trajectory pair set exactly (the invariant
    control.simulate_adaptive_koopman_lqr relies on)."""
    import pytest

    centers = jnp.asarray(rng.normal(size=(4, 3)))
    X = jnp.asarray(rng.normal(size=(41, 3)))
    U = jnp.asarray(rng.normal(size=(40, 2)))

    def init():
        return koopman.streaming_init(centers, 0.6, input_dim=2,
                                      dtype=X.dtype)

    for lam in (1.0, 0.95):
        # whole trajectory as ONE update (pad U: last row only feeds the
        # boundary carry, which the reference path never uses)
        ref = koopman.streaming_update(
            init(), X, jnp.concatenate([U, jnp.zeros((1, 2), X.dtype)]),
            lam)
        # segmented: each episode re-includes the shared endpoint state,
        # so the cross-segment pair is the next episode's first pair
        seg = init()
        for lo, hi in [(0, 10), (10, 25), (25, 40)]:
            seg = koopman.streaming_update_episode(
                seg, X[lo:hi + 1], U[lo:hi], lam)
        np.testing.assert_allclose(np.asarray(seg.gram),
                                   np.asarray(ref.gram), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(seg.rhs),
                                   np.asarray(ref.rhs), rtol=1e-10)
        np.testing.assert_allclose(float(seg.weight_sum),
                                   float(ref.weight_sum), rtol=1e-12)
        assert float(seg.prev_valid) == 0.0

    # a stale boundary carried in from a prior streaming_update is
    # ignored: episode(stats_with_prev) == episode(stats_without_prev)
    lam = 0.9
    Y = jnp.asarray(rng.normal(size=(6, 3)))
    V = jnp.asarray(rng.normal(size=(5, 2)))
    s_open = koopman.streaming_update(init(), X[:5], U[:5], lam)
    assert float(s_open.prev_valid) == 1.0
    a = koopman.streaming_update_episode(s_open, Y, V, lam)
    b = koopman.streaming_update_episode(
        s_open._replace(prev_valid=jnp.zeros((), X.dtype)), Y, V, lam)
    np.testing.assert_array_equal(np.asarray(a.gram), np.asarray(b.gram))
    np.testing.assert_array_equal(np.asarray(a.rhs), np.asarray(b.rhs))

    with pytest.raises(ValueError, match="episode"):
        koopman.streaming_update_episode(init(), X[:5], U[:5])
