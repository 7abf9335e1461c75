"""Implicit integrator tests: order, stiff stability, tether application."""

import numpy as np
import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import tether
from bluerov2_dynamics_tpu.models.params import fossen_params, thruster_config
from bluerov2_dynamics_tpu.models.thrusters import thruster_wrench_nolag
from bluerov2_dynamics_tpu.ops import implicit
from bluerov2_dynamics_tpu.ops.integrators import rk4_step, rollout


def test_trapezoidal_convergence_order():
    rhs = lambda x, u: -x
    errs = []
    for dt in (0.1, 0.05):
        step = implicit.make_implicit_step(rhs, dt, "trapezoidal", newton_iters=10)
        x = jnp.array([1.0])
        for _ in range(int(round(1.0 / dt))):
            x = step(x, None)
        errs.append(abs(float(x[0]) - np.exp(-1.0)))
    order = np.log2(errs[0] / errs[1])
    assert 1.8 < order < 2.2


def test_backward_euler_l_stability_stiff():
    """lambda = -1e4 with dt = 0.1 (lambda*dt = -1000): explicit blows up,
    backward Euler decays monotonically."""
    lam = -1e4
    rhs = lambda x, u: lam * x
    dt = 0.1
    x_exp = rk4_step(rhs, jnp.array([1.0]), None, dt)
    assert abs(float(x_exp[0])) > 1.0  # explicit RK4 is unstable here
    step = implicit.make_implicit_step(rhs, dt, "backward_euler", newton_iters=4)
    x = jnp.array([1.0])
    for _ in range(5):
        x = step(x, None)
        assert abs(float(x[0])) < 1.0
    assert abs(float(x[0])) < 1e-10


def test_trapezoidal_nonlinear_matches_fine_rk4():
    rhs = lambda x, u: jnp.sin(x) - 0.5 * x + u
    u = jnp.array([0.3, -0.2])
    step = implicit.make_implicit_step(rhs, 0.05, "trapezoidal", newton_iters=8)
    x = jnp.array([0.5, -1.0])
    for _ in range(40):
        x = step(x, u)
    # fine-grained explicit reference
    y = jnp.array([0.5, -1.0])
    for _ in range(4000):
        y = rk4_step(rhs, y, u, 0.0005)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_implicit_tether_stable_at_coarse_dt(rng):
    """The coupled ROV+tether system at dt=0.01 with NO substepping:
    explicit RK4 diverges (see tether substeps default), the L-stable
    backward-Euler step stays bounded and tracks the substepped solution
    (trapezoidal is only A-stable and rings on the undamped axial modes)."""
    dt = 0.01
    p = fossen_params(dtype=jnp.float64)
    thr = thruster_config(dtype=jnp.float64)
    cfg = tether.TetherConfig(n_segments=3, length=20.0)
    anchor = jnp.zeros(3)
    x0 = np.zeros(12)
    x0[2] = 5.0
    x_teth = np.asarray(tether.init_nodes_line(cfg, np.zeros(3), x0[:3], dtype=jnp.float64))
    x_ext0 = jnp.asarray(np.concatenate([x0, x_teth]))
    u = jnp.asarray([0.1, 0.1, 0.1, 0.0, 0.5, 0.5, 0.5, 0.5], dtype=jnp.float64)
    tau = thruster_wrench_nolag(thr, u)
    rhs = lambda x, t: tether.coupled_rhs(p, cfg, x, t, anchor)

    # explicit RK4 at the full dt diverges within 50 steps
    x = x_ext0
    for _ in range(50):
        x = rk4_step(rhs, x, tau, dt)
    assert not np.all(np.isfinite(np.asarray(x)))

    # implicit backward Euler at the same dt is stable and accurate
    step = jax.jit(implicit.make_implicit_step(rhs, dt, "backward_euler", newton_iters=8))
    T = 50
    x = x_ext0
    for _ in range(T):
        x = step(x, tau)
    x_imp = np.asarray(x)
    assert np.all(np.isfinite(x_imp))

    # and agrees with the substepped explicit path on the ROV state
    from bluerov2_dynamics_tpu.models.params import lag_params

    lag = lag_params(dt, dtype=jnp.float64)
    U = jnp.broadcast_to(u, (T, 8))
    traj = tether.simulate_with_tether(
        p, thr, lag, cfg, anchor, x_ext0, U, dt,
        method="rk4", substeps=40, use_lag=False,
    )
    np.testing.assert_allclose(x_imp[:12], np.asarray(traj[-1, :12]), atol=3e-3)
