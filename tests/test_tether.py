"""Tether model tests: loop oracle, slack behavior, coupled-sim consistency."""

import numpy as np
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import tether
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config

CFG = tether.TetherConfig(n_segments=5, length=10.0)


def _tether_oracle(cfg, x_teth, anchor, rov_pos, rov_vel, current):
    """Per-segment / per-node Python-loop oracle (independent structure)."""
    n = cfg.n_segments
    n_i = n - 1
    p = x_teth[: 3 * n_i].reshape(n_i, 3)
    v = x_teth[3 * n_i :].reshape(n_i, 3)
    pos = np.vstack([anchor, p, rov_pos])
    vel = np.vstack([np.zeros(3), v, rov_vel])
    T, P, F = [], [], []
    for k in range(n):
        r = pos[k + 1] - pos[k]
        L = np.linalg.norm(r) + 1e-12
        rh = r / L
        stretch = L - cfg.l0
        T.append((cfg.e_modulus * cfg.cross_area / cfg.l0) * stretch * rh if stretch > 0 else np.zeros(3))
        P.append(cfg.c_internal * np.dot(vel[k + 1] - vel[k], rh) * rh)
        vf = current - vel[k]
        va = np.dot(vf, rh) * rh
        vo = vf - va
        F.append(
            0.5 * cfg.rho * cfg.diameter * cfg.drag_normal * L * np.linalg.norm(va) * va
            + 0.5 * cfg.rho * cfg.diameter * cfg.drag_tangent * L * np.linalg.norm(vo) * vo
        )
    dp, dv = [], []
    for i in range(1, n):
        fn = T[i] - T[i - 1] + P[i - 1] - P[i] + F[i]
        dp.append(vel[i])
        dv.append(fn / cfg.node_mass)
    return np.concatenate([np.ravel(dp), np.ravel(dv)]), T[-1]


def test_tether_dynamics_matches_oracle(rng):
    anchor = np.zeros(3)
    rov_pos = np.array([6.0, 3.0, 8.0])
    rov_vel = rng.normal(size=3) * 0.5
    current = np.array([0.2, -0.1, 0.0])
    x = np.asarray(
        tether.init_nodes_line(CFG, anchor, rov_pos, dtype=jnp.float64)
    )
    # perturb so segments have varied stretch/slack
    x = x + rng.normal(size=x.shape) * 0.3
    got_dx, got_F = tether.tether_dynamics(
        CFG, jnp.asarray(x), jnp.asarray(anchor), jnp.asarray(rov_pos),
        jnp.asarray(rov_vel), jnp.asarray(current),
    )
    want_dx, want_F = _tether_oracle(CFG, x, anchor, rov_pos, rov_vel, current)
    np.testing.assert_allclose(np.asarray(got_dx), want_dx, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_F), want_F, atol=1e-9)


def test_tether_slack_no_tension():
    """Straight line exactly at natural length (or shorter): zero tension."""
    cfg = tether.TetherConfig(n_segments=4, length=40.0)  # l0 = 10
    anchor = np.zeros(3)
    rov_pos = np.array([0.0, 0.0, 20.0])  # 20 m apart over 40 m cable: slack
    x = tether.init_nodes_line(cfg, anchor, rov_pos, dtype=jnp.float64)
    _, F = tether.tether_dynamics(
        cfg, x, jnp.asarray(anchor), jnp.asarray(rov_pos), jnp.zeros(3), jnp.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(F), 0.0)


def test_tether_taut_pulls_back():
    """Stretched cable pulls the ROV toward the anchor."""
    cfg = tether.TetherConfig(n_segments=4, length=10.0)
    anchor = np.zeros(3)
    rov_pos = np.array([0.0, 0.0, 12.0])  # stretched by 2 m
    x = tether.init_nodes_line(cfg, anchor, rov_pos, dtype=jnp.float64)
    _, F = tether.tether_dynamics(
        cfg, x, jnp.asarray(anchor), jnp.asarray(rov_pos), jnp.zeros(3), jnp.zeros(3)
    )
    F = np.asarray(F)
    # T_{n-1} points from node n-1 toward the ROV (+z); the reference adds
    # +T to the external wrench which acts to... verify direction/magnitude
    assert F[2] > 0
    np.testing.assert_allclose(F[0:2], 0.0, atol=1e-12)


def test_coupled_rollout_matches_bdf():
    """Explicit substepped RK4 must agree with scipy's implicit BDF on the
    coupled stiff system (the reference's own consistency check,
    fossen/README.md:31)."""
    from scipy.integrate import solve_ivp

    dt = 0.01
    p = fossen_params(dtype=jnp.float64)
    thr_cfg = thruster_config(dtype=jnp.float64)
    lag = lag_params(dt, dtype=jnp.float64)
    cfg = tether.TetherConfig(n_segments=3, length=20.0)
    anchor = np.zeros(3)
    x0 = np.zeros(12)
    x0[2] = 5.0
    x_teth0 = np.asarray(tether.init_nodes_line(cfg, anchor, x0[:3], dtype=jnp.float64))
    x_ext0 = jnp.asarray(np.concatenate([x0, x_teth0]))
    u = jnp.asarray([0.1, 0.1, 0.1, 0.0, 0.5, 0.5, 0.5, 0.5], dtype=jnp.float64)

    T_end = 0.5
    n_steps = int(T_end / dt)
    U = jnp.broadcast_to(u, (n_steps, 8))

    # our explicit path (no lag for a pure-RHS comparison)
    traj = tether.simulate_with_tether(
        p, thr_cfg, lag, cfg, anchor, x_ext0, U, dt,
        method="rk4", substeps=40, use_lag=False,
    )
    # scipy BDF on the same RHS (constant wrench from the static curve)
    import jax
    from bluerov2_dynamics_tpu.models.thrusters import thruster_wrench_nolag

    tau = thruster_wrench_nolag(thr_cfg, u)
    rhs_jit = jax.jit(lambda x: tether.coupled_rhs(p, cfg, x, tau, jnp.zeros(3)))
    f = lambda t, x: np.asarray(rhs_jit(jnp.asarray(x)))
    sol = solve_ivp(f, (0, T_end), np.asarray(x_ext0), method="BDF",
                    rtol=1e-7, atol=1e-9)
    assert sol.success
    np.testing.assert_allclose(
        np.asarray(traj[-1, :12]), sol.y[:12, -1], atol=2e-4
    )


def test_tether_batched_equals_single(rng):
    anchor = jnp.zeros(3)
    X = rng.normal(size=(5, CFG.n_states)) * 2.0
    rp = rng.normal(size=(5, 3)) + np.array([3, 3, 3])
    rv = rng.normal(size=(5, 3))
    cur = jnp.zeros(3)
    bdx, bF = tether.tether_dynamics(
        CFG, jnp.asarray(X), anchor, jnp.asarray(rp), jnp.asarray(rv), cur
    )
    for i in range(5):
        dx, F = tether.tether_dynamics(
            CFG, jnp.asarray(X[i]), anchor, jnp.asarray(rp[i]), jnp.asarray(rv[i]), cur
        )
        np.testing.assert_allclose(np.asarray(bdx[i]), np.asarray(dx), atol=1e-12)
        np.testing.assert_allclose(np.asarray(bF[i]), np.asarray(F), atol=1e-12)
