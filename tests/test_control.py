"""Tests for model-based control (models/control).

The reference stops at modeling (no controller in its tree — README
"modeling, training, and evaluating"); this is a TPU-native extension, so
the oracles are textbook control theory (scipy DARE) and closed-loop
behavior against the framework's own full nonlinear thruster-lag plant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bluerov2_dynamics_tpu.models import control, fossen, koopman
from bluerov2_dynamics_tpu.models.params import (
    fossen_params,
    lag_params,
    thruster_config,
)

DT = 0.02


@pytest.fixture(scope="module")
def plant():
    """Full nonlinear thruster plant WITH the third-order lag."""
    p = fossen_params()
    cfg = thruster_config()
    return p, cfg, fossen.make_thruster_step(p, cfg, lag_params(DT), DT,
                                             "euler")


@pytest.fixture(scope="module")
def trim_eq(plant):
    p, cfg, _ = plant
    return control.trim(p, cfg)


def _lag0():
    return jnp.zeros((8, 3))


def test_dlqr_matches_scipy_dare():
    """The scanned Riccati fixed point reproduces scipy's DARE solution."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(0)
    n, m = 6, 3
    A = np.asarray(0.95 * np.eye(n) + 0.08 * rng.normal(size=(n, n)))
    B = np.asarray(rng.normal(size=(n, m)))
    Q = np.eye(n)
    R = 0.5 * np.eye(m)
    K, P = control.dlqr(jnp.asarray(A, jnp.float64), jnp.asarray(B, jnp.float64),
                        Q, R, iters=2000)
    P_ref = scipy_linalg.solve_discrete_are(A, B, Q, R)
    K_ref = np.linalg.solve(R + B.T @ P_ref @ B, B.T @ P_ref @ A)
    np.testing.assert_allclose(np.asarray(P), P_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-8, atol=1e-10)


def test_linearize_exact_on_linear_step():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(5, 5)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(5, 2)), jnp.float32)
    A_got, B_got = control.linearize(
        lambda x, u: x @ A.T + u @ B.T, jnp.zeros(5), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(A_got), np.asarray(A), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B_got), np.asarray(B), rtol=1e-6)


def test_trim_finds_hover(plant, trim_eq):
    """Trim zeroes the state derivative; the lag filter's unity DC gain
    makes the same static command hold the LAG plant stationary."""
    _, _, step = plant
    u_eq, resid = trim_eq
    assert float(resid) < 1e-2
    # the BlueROV2 is slightly negatively buoyant: vertical thrusters
    # (5-8) must push, the vectored horizontal ones (1-4) stay ~0
    u = np.asarray(u_eq)
    assert np.all(np.abs(u[:4]) < 1e-3)
    assert np.all(u[4:] > 1e-3)
    X, _ = control.simulate_closed_loop(
        step, lambda x: u_eq, (jnp.zeros(12), _lag0()), 500,
        get_state=lambda c: c[0])
    assert float(jnp.max(jnp.linalg.norm(X, axis=1))) < 0.02


def test_fossen_lqr_stabilizes_lag_plant(plant):
    """LQR designed on the lag-free linearization stabilizes the full
    nonlinear lag plant from a large pose perturbation (robustness to the
    unmodeled actuator dynamics)."""
    p, cfg, step = plant
    pol = control.fossen_lqr(p, cfg, DT)
    x0 = (jnp.zeros(12).at[0].set(0.5).at[1].set(-0.4).at[2].set(0.3)
          .at[5].set(0.6).at[3].set(0.1))
    X, U = control.simulate_closed_loop(
        step, pol, (x0, _lag0()), 600, get_state=lambda c: c[0])
    assert X.shape == (601, 12) and U.shape == (600, 8)
    assert float(jnp.max(jnp.abs(U))) <= 1.0 + 1e-6
    # measured: |x| 0.93 -> 1.1e-4 in 12 s
    assert float(jnp.linalg.norm(X[-1])) < 1e-2
    # open loop (hover trim only) keeps the pose offset
    u_eq = pol.u_eq
    Xo, _ = control.simulate_closed_loop(
        step, lambda x: u_eq, (x0, _lag0()), 600, get_state=lambda c: c[0])
    assert float(jnp.linalg.norm(Xo[-1])) > 0.5


def test_koopman_lqr_data_driven(plant, trim_eq):
    """LQR on the lifted (A, B) of an EDMDc model fitted to plant data
    near hover regulates the TRUE nonlinear plant — data-driven control
    with no physics linearization anywhere."""
    _, _, step = plant
    u_eq, _ = trim_eq
    # episodic excitation near hover (resetting keeps the data local to
    # the operating point — a free-drifting trajectory wanders meters away
    # and dilutes the lifted model where the controller needs it; measured
    # closed-loop 0.40 final error drifting vs 1.5e-4 episodic)
    n_ep, T = 60, 100
    kU, kX = jax.random.split(jax.random.PRNGKey(0))
    U = jnp.clip(u_eq + 0.3 * jax.random.normal(kU, (n_ep, T, 8)), -1, 1)
    x0s = 0.3 * jax.random.normal(kX, (n_ep, 12))

    @jax.jit
    def gen(x0, U):
        def body(c, u):
            c = step(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, (x0, jnp.zeros((8, 3))), U)
        return X

    Xs = jax.vmap(gen)(x0s, U)
    model = koopman.fit_multi(jax.random.PRNGKey(1), list(Xs), list(U),
                              n_rbfs=100, gamma=1.0, ridge=1e-6)
    pol = control.koopman_dlqr(model, jnp.zeros(12), u_eq=u_eq)
    x0 = jnp.zeros(12).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)
    Xc, _ = control.simulate_closed_loop(
        step, pol, (x0, _lag0()), 600, get_state=lambda c: c[0])
    e0 = float(jnp.linalg.norm(x0))
    ef = float(jnp.linalg.norm(Xc[-1]))
    # measured: 0.62 -> 1.5e-4; assert with margin + bounded trajectory
    assert ef < 0.05 * e0, (e0, ef)
    assert float(jnp.max(jnp.abs(Xc[:, :3]))) < 2 * float(jnp.max(jnp.abs(x0)))


def test_trajopt_reaches_waypoint(plant):
    """Direct trajectory optimization through the lag plant's rollout
    scan reaches a 1.2 m waypoint in 5 s with ~1e-5 terminal error."""
    _, _, step = plant
    target = jnp.zeros(12).at[0].set(1.0).at[1].set(0.5).at[2].set(-0.3)
    res = control.trajopt(
        step, jnp.zeros(12), target, horizon=250, steps=250, lr=0.05,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0],
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < 1e-3 * losses[0]
    assert float(jnp.linalg.norm(res.X[-1, :3] - target[:3])) < 0.05
    assert float(jnp.max(jnp.abs(res.U))) <= 1.0
    assert res.X.shape == (251, 12) and res.U.shape == (250, 8)


def test_sysid_in_the_loop_current_compensation():
    """Full-circle integration of sysid + control: under an unknown
    ambient current, the naively-designed LQR holds a steady-state
    position offset; identifying the model (coefficients + current) from
    a short recording and re-running trim/linearize/LQR removes most of
    it.  The adaptive-control story the differentiable stack enables."""
    from bluerov2_dynamics_tpu.data.synthetic import generate_tank_recording
    from bluerov2_dynamics_tpu.models import sysid

    true_current = (0.15, -0.1, 0.0)
    p_true = fossen_params(current=true_current)   # the real ocean
    p_nom = fossen_params()                         # the designer's belief
    cfg = thruster_config()
    plant = fossen.make_thruster_step(p_true, cfg, lag_params(DT), DT,
                                      "euler")
    x0 = jnp.zeros(12)

    def ss_offset(pol):
        X, _ = control.simulate_closed_loop(
            plant, pol, (x0, _lag0()), 1500, get_state=lambda c: c[0])
        return float(jnp.linalg.norm(X[-1, :3]))

    off_naive = ss_offset(control.fossen_lqr(p_nom, cfg, DT))
    assert off_naive > 0.08, off_naive  # the current visibly displaces it

    ds = generate_tank_recording(jax.random.PRNGKey(0), n_steps=2000, dt=DT,
                                 jitter=0.0, current=true_current)
    res = sysid.fit_thruster(ds.X_true, ds.U, DT, horizon=4, steps=250,
                             lr=0.05, input_delay=1, fit_current=True)
    np.testing.assert_allclose(np.asarray(res.current),
                               np.asarray(true_current), atol=0.01)
    off_ident = ss_offset(control.fossen_lqr(res.params, res.cfg, DT))
    # measured: 0.110 -> 0.0087 (12.7x)
    assert off_ident < 0.25 * off_naive, (off_naive, off_ident)


def test_mpc_monotone_approach_vs_lqr_overshoot(plant):
    """Receding-horizon MPC (nested jitted scans: plant loop x replanning
    Adam x horizon rollout) from a near-reversed heading: the full
    nonlinear plan takes the direct path (position error never exceeds
    the initial distance), while the psi=0-linearized LQR first swings
    wide (~27% overshoot) before converging.  Both must make substantial
    progress — the MPC claim is the CONSTRAINT-AWARE PATH, not faster
    asymptotics (this heavily-damped plant is kind to LQR)."""
    p, cfg, step = plant
    x0 = jnp.zeros(12).at[0].set(1.5).at[1].set(0.5).at[5].set(3.0)
    init = float(jnp.linalg.norm(x0[:3]))

    pol = control.fossen_lqr(p, cfg, DT)
    Xl, _ = control.simulate_closed_loop(
        step, pol, (x0, _lag0()), 300, get_state=lambda c: c[0])
    pl = jnp.linalg.norm(Xl[:, :3], axis=1)

    X, U = control.simulate_mpc(
        step, x0, jnp.zeros(12), sim_steps=300, horizon=60,
        replan_iters=20, init_iters=150, lr=0.1,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0])
    pm = jnp.linalg.norm(X[:, :3], axis=1)

    assert X.shape == (301, 12) and U.shape == (300, 8)
    assert float(jnp.max(jnp.abs(U))) <= 1.0
    # both converge substantially within 6 s (measured 0.27 / 0.39)
    assert float(pl[-1]) < 0.35 * init
    assert float(pm[-1]) < 0.35 * init
    # the path claim (measured: MPC max 1.581 == init, LQR max 2.009)
    assert float(jnp.max(pm)) <= 1.02 * init, float(jnp.max(pm))
    assert float(jnp.max(pl)) >= 1.20 * init, float(jnp.max(pl))


def test_mppi_hover_recovery(plant):
    """Sampling-based MPPI regulates the full nonlinear lag plant from a
    pose perturbation — no gradients anywhere in the controller; every
    replan is one batched rollout over the sample axis (the repo's
    leading-dim batching rule)."""
    _, _, step = plant
    x0 = jnp.zeros(12).at[0].set(0.5).at[1].set(-0.4).at[5].set(0.6)
    e0 = float(jnp.linalg.norm(x0))
    X, U = control.simulate_mppi(
        step, x0, jnp.zeros(12), sim_steps=300, horizon=60,
        n_samples=256, sigma=0.08, temperature=0.005, init_rounds=15,
        effort_weight=1e-2, replan_rounds=4,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0],
        key=jax.random.PRNGKey(0))
    assert X.shape == (301, 12) and U.shape == (300, 8)
    assert float(jnp.max(jnp.abs(U))) <= 1.0
    ef = float(jnp.linalg.norm(X[-1]))
    # measured 0.072 (8% of e0); margin 2x
    assert ef < 0.16 * e0, (e0, ef)


def test_mppi_deterministic(plant):
    """Same PRNG key -> bit-identical closed loop (the controller's only
    randomness is the explicit key)."""
    _, _, step = plant
    x0 = jnp.zeros(12).at[0].set(0.3)
    kw = dict(sim_steps=40, horizon=15, n_samples=64, init_rounds=5,
              replan_rounds=2,
              carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
              get_state=lambda c: c[0],
              key=jax.random.PRNGKey(7))
    X1, U1 = control.simulate_mppi(step, x0, jnp.zeros(12), **kw)
    # explicit model_step == plant_step must be the identical program
    X2, U2 = control.simulate_mppi(step, x0, jnp.zeros(12),
                                   model_step=step, **kw)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))


def test_mpc_plans_on_model_executes_on_plant(plant):
    """The realistic MPC setting: the horizon rollouts differentiate
    through a PLANNING MODEL (here the lag-free step — unmodeled
    third-order actuator dynamics) while the true lag plant is only ever
    executed.  The model/plant gap must not break convergence."""
    p, cfg, step = plant
    nolag = fossen.make_thruster_step(p, cfg, lag_params(DT), DT, "euler",
                                      use_lag=False)
    x0 = jnp.zeros(12).at[0].set(1.0).at[1].set(0.5)
    e0 = float(jnp.linalg.norm(x0[:3]))
    X, U = control.simulate_mpc(
        step, x0, jnp.zeros(12), sim_steps=300, horizon=60,
        replan_iters=10, init_iters=150, lr=0.1,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0], model_step=nolag)
    assert X.shape == (301, 12) and U.shape == (300, 8)
    e = jnp.linalg.norm(X[:, :3], axis=1)
    # steady monotone convergence despite the model/plant gap (measured
    # 1.118 -> 0.40 at 6 s, same rate as the gap-free MPC test above)
    assert float(e[-1]) < 0.45 * e0, (e0, float(e[-1]))
    coarse = np.asarray(e[::50])
    assert np.all(np.diff(coarse) < 0.0), coarse
    assert float(jnp.max(e)) <= 1.02 * e0


def test_koopman_mppi_data_driven(plant, trim_eq):
    """Koopman-MPPI: gradient-free receding-horizon planning on a purely
    DATA-DRIVEN lifted model (EDMDc fitted to episodic plant data),
    executed on the true nonlinear lag plant.  The sampled rollouts run
    entirely in the lifted linear space (one GEMM per step over the
    sample batch); each replan re-lifts the fresh plant state."""
    _, _, step = plant
    u_eq, _ = trim_eq
    n_ep, T = 60, 100
    kU, kX = jax.random.split(jax.random.PRNGKey(0))
    U = jnp.clip(u_eq + 0.3 * jax.random.normal(kU, (n_ep, T, 8)), -1, 1)
    x0s = 0.3 * jax.random.normal(kX, (n_ep, 12))

    @jax.jit
    def gen(x0, U):
        def body(c, u):
            c = step(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, (x0, jnp.zeros((8, 3))), U)
        return X

    Xs = jax.vmap(gen)(x0s, U)
    model = koopman.fit_multi(jax.random.PRNGKey(1), list(Xs), list(U),
                              n_rbfs=100, gamma=1.0, ridge=1e-6)
    A, B = model.A, model.B

    x0 = jnp.zeros(12).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)
    e0 = float(jnp.linalg.norm(x0))
    # horizon 50 beats 30 here DESPITE the lifted model's open-loop
    # drift (~0.12 over 30 steps): the drift is small against the cost
    # landscape's slope, and the myopia penalty dominates (measured:
    # H=30 stalls at 0.54, H=50 settles at 0.16)
    X, Uc = control.simulate_mppi(
        step, x0, jnp.zeros(12), sim_steps=400, horizon=50,
        n_samples=128, sigma=0.15, temperature=0.005, init_rounds=10,
        effort_weight=1e-2, replan_rounds=4,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0],
        model_step=lambda z, u: z @ A.T + u @ B.T,
        model_carry=lambda c: koopman.lift(model, c[0]),
        model_get_state=lambda z: z[..., :12],
        key=jax.random.PRNGKey(2))
    assert float(jnp.max(jnp.abs(Uc))) <= 1.0
    ef = float(jnp.linalg.norm(X[-1]))
    # measured 0.161 (26% of e0); sampling-noise + model-bias floor
    assert ef < 0.35 * e0, (e0, ef)
    assert float(jnp.max(jnp.abs(X[:, :3]))) < 2 * float(jnp.max(jnp.abs(x0)))


def test_ilqr_exact_on_lq_problem():
    """One unregularized iLQR sweep on an exactly linear-quadratic problem
    IS the optimum: the control sequence and total cost match a numpy
    finite-horizon Riccati oracle to f64 precision."""
    rng = np.random.default_rng(3)
    n, r, H = 6, 3, 30
    A = np.asarray(0.9 * np.eye(n) + 0.1 * rng.normal(size=(n, n)))
    B = np.asarray(rng.normal(size=(n, r)))
    w = rng.uniform(0.5, 2.0, size=n)
    wf = rng.uniform(5.0, 20.0, size=n)
    effort = 0.1
    x0 = rng.normal(size=n)

    res = control.ilqr(
        lambda x, u: x @ jnp.asarray(A).T + u @ jnp.asarray(B).T,
        x0, np.zeros(n), horizon=H, iters=1, u_limit=None,
        effort_weight=effort, state_weight=w, terminal_weight=wf,
        mu0=0.0, u_dim=r, dtype=jnp.float64)

    # finite-horizon Riccati oracle (cost convention: x'Qx + u'Ru, no 1/2)
    Q, R, P = np.diag(w), effort * np.eye(r), np.diag(wf)
    Ks = []
    for _ in range(H):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    x, U_ref, cost_ref = x0.copy(), [], 0.0
    for t in range(H):
        u = -Ks[t] @ x
        U_ref.append(u)
        cost_ref += x @ Q @ x + u @ R @ u
        x = A @ x + B @ u
    cost_ref += x @ np.diag(wf) @ x

    np.testing.assert_allclose(np.asarray(res.U), np.asarray(U_ref),
                               rtol=1e-8, atol=1e-10)
    assert res.costs.shape == (2,)  # cost before the sweep + after it
    np.testing.assert_allclose(float(res.costs[-1]), cost_ref, rtol=1e-10)
    # gains shape: feedback on the (here unflattened) n-dim state
    assert res.K.shape == (H, r, n)


def test_ilqr_gains_survive_post_convergence_sweeps(rng):
    """Sweeps past convergence are rejections that inflate the Levenberg
    mu 10x each; the FINAL gains must be recomputed at the last ACCEPTED
    mu, not the inflated one (which would collapse K toward zero and turn
    simulate_tvlqr into open-loop replay)."""
    n, r, H = 3, 2, 12
    A = np.eye(n) + 0.05 * rng.normal(size=(n, n))
    B = 0.3 * rng.normal(size=(n, r))
    step = lambda x, u: x @ jnp.asarray(A).T + u @ jnp.asarray(B).T
    x0 = rng.normal(size=n)
    effort = 0.1
    many = control.ilqr(step, x0, np.zeros(n), horizon=H, iters=25,
                        u_limit=None, effort_weight=effort, mu0=1.0,
                        u_dim=r, dtype=jnp.float64)
    # LQ problem: improvements shrink below the 1e-12 acceptance margin
    # well before sweep 25, so the tail sweeps are all rejections and mu
    # inflates 10x each (the broken code recomputed the final gains with
    # that inflated mu -> |K| ~ 1e-5).  The fixed gains must match the
    # unregularized finite-horizon Riccati oracle.
    Q, R, P = np.eye(n), effort * np.eye(r), 100.0 * np.eye(n)
    Ks = []
    for _ in range(H):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    oracle = -np.stack(Ks[::-1])
    rel = (np.abs(np.asarray(many.K) - oracle).max()
           / np.abs(oracle).max())
    assert rel < 0.05, rel  # broken code: rel ~ 1.0 (K collapsed to ~0)


def test_ilqr_waypoint_on_lag_plant(plant):
    """iLQR through the full nonlinear thruster-lag plant reaches the same
    1.2 m waypoint as trajopt in ~10 second-order sweeps (vs 250 Adam
    iterations), with the alpha=0 line-search safeguard making the cost
    sequence monotone non-increasing."""
    _, _, step = plant
    target = jnp.zeros(12).at[0].set(1.0).at[1].set(0.5).at[2].set(-0.3)
    res = control.ilqr(
        step, jnp.zeros(12), target, horizon=250, iters=10,
        effort_weight=1e-3,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0])
    costs = np.asarray(res.costs)
    assert np.isfinite(costs).all()
    # the alpha=0 candidate guarantees sweeps never increase the cost
    assert np.all(np.diff(costs) <= 1e-6), costs
    # most of the cost is the irreducible transit (state penalty along the
    # whole 5 s trajectory); the convergence claim is the RATE: 10 sweeps
    # settle the total to <1e-4 relative (measured 105.9 -> 78.153,
    # last-sweep change 2.8e-6 relative)
    assert costs[-1] < 0.8 * costs[0], costs
    assert abs(costs[-1] - costs[-2]) < 1e-4 * costs[-1], costs
    assert float(jnp.linalg.norm(res.X[-1, :3] - target[:3])) < 0.05
    assert float(jnp.max(jnp.abs(res.U))) <= 1.0
    assert res.X.shape == (251, 12) and res.U.shape == (250, 8)
    # gains feed back on the FULL flattened carry (12 state + 24 lag)
    assert res.K.shape == (250, 8, 36) and res.S.shape == (251, 36)


def test_tvlqr_rejects_unseen_current(plant):
    """The iLQR byproduct open-loop planners don't have: executing the
    plan with its time-varying feedback gains absorbs an ocean current the
    planner never saw, while open-loop replay of the same controls (the
    gains zeroed) is blown off course."""
    p, cfg, step = plant
    true_plant = fossen.make_thruster_step(
        fossen_params(current=(0.12, -0.08, 0.0)), cfg, lag_params(DT), DT,
        "euler")
    target = jnp.zeros(12).at[0].set(1.0).at[1].set(0.5).at[2].set(-0.3)
    res = control.ilqr(
        step, jnp.zeros(12), target, horizon=250, iters=10,
        effort_weight=1e-3,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0])
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))

    Xo, _ = control.simulate_tvlqr(
        true_plant, res._replace(K=jnp.zeros_like(res.K)), carry0,
        get_state=lambda c: c[0])
    err_open = float(jnp.linalg.norm(Xo[-1, :3] - target[:3]))

    Xc, Uc = control.simulate_tvlqr(true_plant, res, carry0,
                                    get_state=lambda c: c[0])
    err_fb = float(jnp.linalg.norm(Xc[-1, :3] - target[:3]))
    assert float(jnp.max(jnp.abs(Uc))) <= 1.0 + 1e-6
    assert err_open > 0.05, err_open     # the current visibly displaces it
    assert err_fb < 0.4 * err_open, (err_open, err_fb)


def test_mppi_obstacle_indicator_cost(plant):
    """The capability gradient MPC cannot have: a DISCONTINUOUS
    inside-the-cylinder indicator penalty (zero gradient a.e. — Adam
    through the rollout would never see it).  MPPI's sampled rollouts
    price it directly: the path detours around the cylinder sitting on
    the straight line to the target, while the obstacle-blind LQR drives
    straight through it."""
    p, cfg, step = plant
    x0 = jnp.zeros(12).at[0].set(1.5)
    center = jnp.asarray([0.75, 0.0])
    radius = 0.3

    def obstacle(x, u):
        d = jnp.linalg.norm(x[..., :2] - center, axis=-1)
        return 200.0 * (d < radius)          # indicator, not differentiable

    pol = control.fossen_lqr(p, cfg, DT)
    Xl, _ = control.simulate_closed_loop(
        step, pol, (x0, _lag0()), 400, get_state=lambda c: c[0])
    dl = jnp.linalg.norm(Xl[:, :2] - center, axis=1)
    assert float(jnp.min(dl)) < 0.15 * radius  # LQR cuts through the middle

    X, _ = control.simulate_mppi(
        step, x0, jnp.zeros(12), sim_steps=400, horizon=60,
        n_samples=256, sigma=0.15, temperature=0.01, init_rounds=20,
        effort_weight=1e-2, replan_rounds=4, extra_cost=obstacle,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0],
        key=jax.random.PRNGKey(1))
    dm = jnp.linalg.norm(X[:, :2] - center, axis=1)
    # measured min distance 0.303 (fully outside the disk)
    assert float(jnp.min(dm)) > 0.9 * radius, float(jnp.min(dm))
    # and it still reaches the target (measured 0.042)
    assert float(jnp.linalg.norm(X[-1, :3])) < 0.15


# ------------------------- output feedback (LQG) ---------------------------

def test_lqg_inloop_filter_matches_offline_kf():
    """On a linear plant the in-loop EKF is the exact Kalman filter:
    feeding the recorded (U, Y) to the OFFLINE estimation.kalman_filter
    reproduces X_est exactly (same update-first convention)."""
    from bluerov2_dynamics_tpu.models import estimation

    rng = np.random.default_rng(7)
    n, r, m = 4, 2, 2
    A = jnp.asarray(0.9 * np.eye(n) + 0.05 * rng.normal(size=(n, n)))
    B = jnp.asarray(0.3 * rng.normal(size=(n, r)))
    H = jnp.eye(m, n)                         # observe the first 2 states
    Q = 1e-4 * jnp.eye(n)
    R = 1e-2 * jnp.eye(m)
    K, _ = control.dlqr(A, B, jnp.eye(n), 0.5 * jnp.eye(r), iters=800)
    pol = control.LQRPolicy(K=K, z_ref=jnp.zeros(n), u_eq=jnp.zeros(r),
                            u_lo=-2.0, u_hi=2.0)
    x0 = jnp.asarray(rng.normal(size=n))
    res = control.simulate_lqg(
        lambda x, u: A @ x + B @ u, pol, lambda x: x[:m], Q, R, x0,
        steps=60, key=jax.random.PRNGKey(1))
    off = estimation.kalman_filter(A, B, H, Q, R, x0,
                                   1e-2 * jnp.eye(n), res.U, res.Y)
    np.testing.assert_allclose(np.asarray(res.X_est), np.asarray(off.means),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(res.loglik), float(off.loglik),
                               rtol=1e-9)
    # the estimate-feedback loop regulates (separation principle at work)
    assert float(jnp.linalg.norm(res.X[-1])) < 0.2 * float(
        jnp.linalg.norm(x0))


def test_lqg_pose_only_regulates_lag_plant(plant, trim_eq):
    """Pose-only mocap (velocities and the 24 lag states NEVER measured):
    the EKF reconstructs them through the dynamics and the LQG loop
    recovers the perturbation close to the full-state-feedback oracle,
    while feeding the policy the raw noisy pose with zeroed velocities
    leaves a much larger noise-driven error floor."""
    p, cfg, step = plant
    pol = control.fossen_lqr(p, cfg, DT)
    x0 = jnp.zeros(12).at[0].set(0.5).at[2].set(0.3).at[5].set(0.5)
    carry0 = (x0, _lag0())
    sig = 5e-3                                 # mocap-scale pose noise
    res = control.simulate_lqg(
        step, pol, lambda x: x[:6], 1e-8, sig ** 2, carry0, steps=600,
        key=jax.random.PRNGKey(0), get_state=lambda c: c[0])
    # true state regulated to the noise floor; estimate tracks the truth
    tail_true = float(jnp.sqrt(jnp.mean(jnp.sum(res.X[-150:] ** 2, axis=1))))
    est_err = float(jnp.sqrt(jnp.mean(
        jnp.sum((res.X_est[-150:] - res.X[-150:]) ** 2, axis=1))))
    # full-state-feedback oracle on the same plant (no noise anywhere)
    Xo, _ = control.simulate_closed_loop(step, pol, carry0, 600,
                                         get_state=lambda c: c[0])
    tail_oracle = float(jnp.sqrt(jnp.mean(jnp.sum(Xo[-150:] ** 2, axis=1))))
    # naive output feedback: raw noisy pose, velocities zeroed
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_naive(carry0, key):
        def body(c, k):
            y = c[0][:6] + sig * jax.random.normal(k, (6,))
            u = pol(jnp.concatenate([y, jnp.zeros(6)]))
            c = step(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, carry0, jax.random.split(key, 600))
        return X

    Xn = run_naive(carry0, key)
    tail_naive = float(jnp.sqrt(jnp.mean(jnp.sum(Xn[-150:] ** 2, axis=1))))
    # measured (f64): oracle 2.1e-4, LQG 2.0e-3, naive 3.5e-1 (the
    # zeroed-velocity feedback removes the damping the gains rely on),
    # est_err 1.7e-3, mean NIS 6.11 vs the chi^2(6) expectation 6
    assert tail_true < 5e-3, tail_true
    assert est_err < 5e-3, est_err
    assert tail_naive > 3 * tail_true, (tail_naive, tail_true)
    assert tail_true < 0.05 * float(jnp.linalg.norm(x0))
    # NIS consistency: chi^2(6) mean is 6 (generous band for 601 samples)
    mean_nis = float(jnp.mean(res.nis))
    assert 3.0 < mean_nis < 12.0, mean_nis
    assert tail_oracle < tail_true  # noise costs something, sanity


def test_koopman_lqg_data_driven_output_feedback(plant, adaptive_seed):
    """Fully data-driven output feedback: lifted KF (the EDMDc system is
    linear, so the belief propagates exactly) + lifted LQR, pose-only
    noisy measurements — NO physics and NO velocity measurement anywhere
    in the controller.  The in-loop filter on the model's own belief
    space matches the offline generic EKF on the recorded (U, Y)."""
    from bluerov2_dynamics_tpu.models import estimation

    _, _, step = plant
    stats0, u_eq = adaptive_seed
    model = koopman.streaming_finalize(stats0, 1e-6)
    pol = control.koopman_dlqr(model, jnp.zeros(12), u_eq=u_eq)
    d = model.lift_dim

    def lifted_step(z, u):
        with jax.default_matmul_precision("highest"):
            return z @ model.A.T + u @ model.B.T

    x0 = jnp.zeros(12).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)
    sig, q = 5e-3, 1e-6
    res = control.simulate_lqg(
        step, pol, lambda x: x[:6], q, sig ** 2, (x0, _lag0()), steps=600,
        key=jax.random.PRNGKey(4), get_state=lambda c: c[0],
        model_step=lifted_step, m0=koopman.lift(model, x0),
        model_state=lambda z: z[:12], model_h=lambda z: z[:6])
    # measured: tail 0.023, est_err 0.026 — the data-driven loop
    # regulates |x0|=0.62 to a ~2 cm floor from noisy pose alone.  The
    # floor is MODEL bias, not filter tuning (q swept 1e-6..1e-3: tail
    # 0.0220-0.0229): the velocity estimates come through the biased
    # lifted dynamics, where full-state feedback on the same frozen
    # model reads 1e-4 and the physics EKF-LQG 2e-3.
    tail = float(jnp.sqrt(jnp.mean(jnp.sum(res.X[-150:] ** 2, axis=1))))
    assert tail < 5e-2, tail
    est_err = float(jnp.sqrt(jnp.mean(
        jnp.sum((res.X_est[-150:] - res.X[-150:]) ** 2, axis=1))))
    assert est_err < 5e-2, est_err
    assert tail < 0.1 * float(jnp.linalg.norm(x0))  # 27x measured
    # in-loop lifted KF == offline generic EKF on the same record
    off = estimation.ekf(lifted_step, lambda z: z[:6],
                         q * jnp.eye(d), sig ** 2 * jnp.eye(6),
                         koopman.lift(model, x0), 1e-2 * jnp.eye(d),
                         res.U, res.Y)
    np.testing.assert_allclose(np.asarray(res.X_est),
                               np.asarray(off.means[:, :12]),
                               rtol=1e-7, atol=1e-10)


def test_lqg_requires_m0_with_model_step():
    with pytest.raises(ValueError, match="m0"):
        control.simulate_lqg(
            lambda x, u: x, lambda x: jnp.zeros(1), lambda x: x[:1],
            1e-6, 1e-4, jnp.zeros(3), steps=5,
            model_step=lambda m, u: m)


def test_control_demo_lqg_full_scale_f32():
    """f32 full-scale regression for the LQG app path (the rule from the
    adaptive-LQR f32 incident: every full-scale f32 claim needs an
    explicit-f32 test — the x64 conftest masks f32 conditioning).  The
    36-dim covariance recursion runs Joseph-form in f32 here."""
    from bluerov2_dynamics_tpu.apps import control_demo

    out = control_demo.run_lqg()
    assert out["X"].dtype == np.float32
    assert out["tail_rms"] < 5e-3, out["tail_rms"]
    assert out["est_err"] < 5e-3, out["est_err"]
    assert out["naive_tail_rms"] > 3 * out["tail_rms"]
    # filter consistency survives f32
    assert 3.0 < out["mean_nis"] < 12.0, out["mean_nis"]


# --------------------------- adaptive Koopman-LQR ---------------------------

@pytest.fixture(scope="module")
def adaptive_seed(plant, trim_eq):
    """Streaming stats seeded from episodic near-hover excitation —
    the koopman_dlqr recipe fed through streaming_update_episode."""
    _, _, step = plant
    u_eq, _ = trim_eq
    n_ep, T, n_rbfs = 40, 80, 60
    kU, kX = jax.random.split(jax.random.PRNGKey(0))
    # NOTE: no explicit f32 — under the x64 conftest the plant step
    # promotes to f64, and the scan carries must match (CLAUDE.md gotcha)
    U_ep = jnp.clip(u_eq + 0.3 * jax.random.normal(kU, (n_ep, T, 8)), -1, 1)
    x0s = 0.3 * jax.random.normal(kX, (n_ep, 12))

    @jax.jit
    def gen(x0, U):
        def body(c, u):
            c = step(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, (x0, _lag0()), U)
        return X

    Xs = jax.vmap(gen)(x0s, U_ep)
    Xfull = jnp.concatenate([x0s[:, None, :], Xs], axis=1)  # (n_ep, T+1, 12)
    from bluerov2_dynamics_tpu.ops.kmeans import kmeans
    centers, _ = kmeans(jax.random.PRNGKey(1), Xfull.reshape(-1, 12),
                        n_rbfs, iters=25)
    stats = koopman.streaming_init(centers, 1.0, input_dim=8,
                                   dtype=Xfull.dtype)

    @jax.jit
    def absorb(stats, Xe, Ue):
        def body(s, xu):
            return koopman.streaming_update_episode(s, xu[0], xu[1]), None

        s, _ = jax.lax.scan(body, stats, (Xe, Ue))
        return s

    stats = absorb(stats, Xfull, U_ep)
    assert float(stats.weight_sum) == n_ep * T  # every pair, weight 1
    return stats, u_eq


def test_adaptive_koopman_lqr_healthy_plant_regulates(plant, adaptive_seed):
    """On the UNCHANGED plant the adaptive loop behaves like the frozen
    lifted LQR: regulation succeeds and the re-solved gains are stable
    (no churn when the data keeps confirming the model)."""
    _, _, step = plant
    stats0, u_eq = adaptive_seed
    x0 = jnp.zeros(12).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)
    res = control.simulate_adaptive_koopman_lqr(
        step, (x0, _lag0()), stats0, jnp.zeros(12), u_eq,
        steps=600, segment=100, forgetting=1.0, dither=0.0,
        get_state=lambda c: c[0])
    assert res.X.shape == (601, 12) and res.U.shape == (600, 8)
    # measured: final |x| 2.4e-2 (the state-row re-trim carries a small
    # model-bias offset the frozen policy's externally-supplied u_eq
    # does not), gain deltas <= 0.041
    assert float(jnp.linalg.norm(res.X[-1])) < 0.08
    assert float(jnp.max(res.gain_deltas)) < 0.15
    # resume contract: stats/u_eq feed back in and keep regulating
    res2 = control.simulate_adaptive_koopman_lqr(
        step, (res.X[-1], _lag0()), res.stats, jnp.zeros(12), res.u_eq,
        steps=200, segment=100, forgetting=1.0, dither=0.0,
        get_state=lambda c: c[0])
    assert float(jnp.linalg.norm(res2.X[-1])) < 0.08


def test_adaptive_koopman_lqr_recovers_thruster_damage(plant, adaptive_seed):
    """A mid-life plant change (vertical thruster 6 REVERSED at half
    strength) leaves the frozen lifted LQR with a large permanent offset;
    the adaptive loop re-fits (A, B) from the closed-loop data, re-trims
    the hover command, re-solves the gains, and recovers to the dither
    noise floor — the case online adaptation exists for."""
    _, _, step = plant
    stats0, u_eq = adaptive_seed
    gains = jnp.asarray([1, 1, 1, 1, 1, -0.5, 1, 1])

    def step_dam(c, u):
        return step(c, u * gains)

    x0 = jnp.zeros(12).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)

    pol_frozen = control.koopman_dlqr(
        koopman.streaming_finalize(stats0, 1e-6), jnp.zeros(12), u_eq=u_eq)
    Xf, _ = control.simulate_closed_loop(
        step_dam, pol_frozen, (x0, _lag0()), 1200, get_state=lambda c: c[0])
    tail_frozen = float(jnp.sqrt(jnp.mean(jnp.sum(Xf[-300:] ** 2, axis=1))))

    res = control.simulate_adaptive_koopman_lqr(
        step_dam, (x0, _lag0()), stats0, jnp.zeros(12), u_eq,
        steps=1200, segment=100, forgetting=0.99, dither=0.05,
        key=jax.random.PRNGKey(2), get_state=lambda c: c[0])
    tail_ad = float(jnp.sqrt(jnp.mean(jnp.sum(res.X[-300:] ** 2, axis=1))))

    # measured: frozen 1.69, adaptive 0.029 (58x).  The recovery horizon
    # is set by how fast the RLS decays the 3200-pair healthy-data seed:
    # lam=0.99 converges by segment 8; 0.995 needs ~16 segments; 0.998
    # has not turned over by segment 12 (swept on this exact scenario).
    assert tail_frozen > 0.8, tail_frozen
    assert tail_ad < 0.15, tail_ad
    assert tail_ad < 0.1 * tail_frozen
    assert float(jnp.max(jnp.linalg.norm(res.X, axis=1))) < 2.0
    assert float(jnp.max(jnp.abs(res.U))) <= 1.0 + 1e-6
    # the re-trim found the damaged-plant hover structure: horizontal
    # thrusters stay ~0, the vertical group re-balances (measured
    # horiz max 0.011, vertical command on the reversed thruster 0.13)
    assert float(jnp.max(jnp.abs(res.u_eq[:4]))) < 0.05


def test_adaptive_koopman_lqr_f32_full_scale():
    """f32 REGRESSION (the x64 conftest masks this class): the first TPU
    run of the adaptive damage scenario failed to recover (tail 1.15 vs
    frozen 1.55) because the forgetting-decayed Gram's f32 Cholesky went
    to garbage under the original ABSOLUTE ridge 1e-6 — the decayed-Gram
    scale drops ~30x over the run, so no absolute value sits right at
    both ends.  The fix is the RELATIVE ridge (x mean Gram diagonal,
    default 1e-5 ~ 80x f32 eps).  This drives the app's full-scale
    explicit-f32 path — the exact configuration that failed."""
    from bluerov2_dynamics_tpu.apps import control_demo

    out = control_demo.run_adaptive()
    assert out["X"].dtype == np.float32
    # measured f32: adaptive tail 0.059, frozen 1.69 (ridge sweep in the
    # solve-body comment); thresholds match the f64 library test
    assert out["frozen_tail_rms"] > 0.8, out["frozen_tail_rms"]
    assert out["tail_rms"] < 0.15, out["tail_rms"]
    assert out["tail_rms"] < 0.1 * out["frozen_tail_rms"]


def test_adaptive_koopman_lqr_validates_args(plant, adaptive_seed):
    _, _, step = plant
    stats0, u_eq = adaptive_seed
    with pytest.raises(ValueError, match="multiple"):
        control.simulate_adaptive_koopman_lqr(
            step, (jnp.zeros(12), _lag0()), stats0, jnp.zeros(12), u_eq,
            steps=250, segment=100, get_state=lambda c: c[0])
    with pytest.raises(ValueError, match="multiple"):
        control.simulate_adaptive_koopman_lqr(
            step, (jnp.zeros(12), _lag0()), stats0, jnp.zeros(12), u_eq,
            steps=250, segment=0, get_state=lambda c: c[0])
