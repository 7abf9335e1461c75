"""Unit tests for rotation/quaternion/integrator kernels vs NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bluerov2_dynamics_tpu import ops
import oracles


def test_rotation_matrix_matches_oracle(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(50, 3))
    R = ops.rotation_matrix(angles[:, 0], angles[:, 1], angles[:, 2])
    for i in range(50):
        np.testing.assert_allclose(
            np.asarray(R[i]), oracles.rot_zyx(*angles[i]), atol=1e-12
        )


def test_rotation_orthonormal(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(20, 3))
    R = np.asarray(ops.rotation_matrix(angles[:, 0], angles[:, 1], angles[:, 2]))
    eye = np.broadcast_to(np.eye(3), (20, 3, 3))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(20), atol=1e-12)


def test_rotate_b2n_n2b_fused_match_matrix(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(30, 3))
    v = rng.normal(size=(30, 3))
    phi, theta, psi = angles.T
    R = np.asarray(ops.rotation_matrix(phi, theta, psi))
    got_fwd = np.asarray(ops.rotate_b2n(phi, theta, psi, v))
    got_inv = np.asarray(ops.rotate_n2b(phi, theta, psi, v))
    np.testing.assert_allclose(got_fwd, np.einsum("bij,bj->bi", R, v), atol=1e-12)
    np.testing.assert_allclose(
        got_inv, np.einsum("bji,bj->bi", R, v), atol=1e-12
    )


def test_euler_kinematics_matches_oracle(rng):
    angles = rng.uniform(-1.4, 1.4, size=(40, 2))
    omega = rng.normal(size=(40, 3))
    J = np.asarray(ops.euler_kinematics_matrix(angles[:, 0], angles[:, 1]))
    rates = np.asarray(ops.euler_rates(angles[:, 0], angles[:, 1], omega))
    for i in range(40):
        J_np = oracles.j2_matrix(angles[i, 0], angles[i, 1])
        np.testing.assert_allclose(J[i], J_np, atol=1e-12)
        np.testing.assert_allclose(rates[i], J_np @ omega[i], atol=1e-12)


def test_euler_kinematics_gimbal_guard():
    # at theta = pi/2 the clamp must keep everything finite
    J = ops.euler_kinematics_matrix(jnp.array(0.3), jnp.array(np.pi / 2))
    assert np.all(np.isfinite(np.asarray(J)))
    r = ops.euler_rates(jnp.array(0.3), jnp.array(np.pi / 2), jnp.ones(3))
    assert np.all(np.isfinite(np.asarray(r)))


def test_ssa():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.5])
    got = np.asarray(ops.ssa(a))
    np.testing.assert_allclose(got, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.5], atol=1e-12)


# ------------------------------ quaternions ------------------------------

def _random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_rotation_matches_oracle(rng):
    qs = _random_quats(rng, 30)
    R = np.asarray(ops.quat_to_rotation_matrix(jnp.asarray(qs)))
    for i, q in enumerate(qs):
        np.testing.assert_allclose(R[i], oracles.quat_to_R(q), atol=1e-12)


def test_quat_rotate_consistency(rng):
    qs = jnp.asarray(_random_quats(rng, 25))
    v = jnp.asarray(rng.normal(size=(25, 3)))
    R = np.asarray(ops.quat_to_rotation_matrix(qs))
    np.testing.assert_allclose(
        np.asarray(ops.quat_rotate(qs, v)), np.einsum("bij,bj->bi", R, np.asarray(v)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.quat_rotate_inv(qs, v)),
        np.einsum("bji,bj->bi", R, np.asarray(v)),
        atol=1e-12,
    )


def test_quat_multiply_identity_and_inverse(rng):
    qs = jnp.asarray(_random_quats(rng, 10))
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(ops.quat_multiply(qs, jnp.broadcast_to(ident, qs.shape))),
        np.asarray(qs),
        atol=1e-12,
    )
    conj = qs * jnp.array([1.0, -1.0, -1.0, -1.0])
    prod = np.asarray(ops.quat_multiply(qs, conj))
    expect = np.zeros((10, 4))
    expect[:, 0] = 1.0
    np.testing.assert_allclose(prod, expect, atol=1e-12)


def test_euler_quat_roundtrip(rng):
    angles = rng.uniform(-1.2, 1.2, size=(40, 3))
    q = ops.euler_to_quat(angles[:, 0], angles[:, 1], angles[:, 2])
    phi, theta, psi = ops.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(phi), angles[:, 0], atol=1e-10)
    np.testing.assert_allclose(np.asarray(theta), angles[:, 1], atol=1e-10)
    np.testing.assert_allclose(np.asarray(psi), angles[:, 2], atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ops.quat_to_yaw(q)), angles[:, 2], atol=1e-10
    )


def test_euler_quat_rotation_equivalence(rng):
    angles = rng.uniform(-1.2, 1.2, size=(15, 3))
    q = ops.euler_to_quat(angles[:, 0], angles[:, 1], angles[:, 2])
    R_euler = np.asarray(ops.rotation_matrix(angles[:, 0], angles[:, 1], angles[:, 2]))
    R_quat = np.asarray(ops.quat_to_rotation_matrix(q))
    np.testing.assert_allclose(R_quat, R_euler, atol=1e-12)


def test_quat_derivative_preserves_norm(rng):
    # d/dt |q|^2 = 2 q . qdot = 0 for the kinematic equation
    qs = jnp.asarray(_random_quats(rng, 20))
    om = jnp.asarray(rng.normal(size=(20, 3)))
    qdot = np.asarray(ops.quat_derivative(qs, om))
    np.testing.assert_allclose(np.sum(np.asarray(qs) * qdot, axis=1), 0.0, atol=1e-12)


def test_quat_normalize_degenerate():
    q = jnp.zeros((3, 4))
    out = np.asarray(ops.quat_normalize(q))
    np.testing.assert_allclose(out, np.tile([1.0, 0, 0, 0], (3, 1)))


# ------------------------------ integrators ------------------------------

def test_rk4_convergence_order():
    # dx/dt = -x, exact solution exp(-t)
    rhs = lambda x, u: -x
    x0 = jnp.array([1.0])
    errs = []
    for dt in (0.1, 0.05):
        n = int(round(1.0 / dt))
        step = ops.rollout_stepper(rhs, dt, method="rk4")
        _, traj = ops.rollout(step, x0, jnp.zeros((n, 1)))
        errs.append(abs(float(traj[-1, 0]) - np.exp(-1.0)))
    order = np.log2(errs[0] / errs[1])
    assert order > 3.8


def test_euler_convergence_order():
    rhs = lambda x, u: -x
    x0 = jnp.array([1.0])
    errs = []
    for dt in (0.1, 0.05):
        n = int(round(1.0 / dt))
        step = ops.rollout_stepper(rhs, dt, method="euler")
        _, traj = ops.rollout(step, x0, jnp.zeros((n, 1)))
        errs.append(abs(float(traj[-1, 0]) - np.exp(-1.0)))
    order = np.log2(errs[0] / errs[1])
    assert 0.8 < order < 1.2


def test_rollout_include_initial_and_substeps():
    rhs = lambda x, u: u - x
    us = jnp.ones((5, 1))
    step = ops.rollout_stepper(rhs, 0.1, method="rk4", substeps=4)
    final, traj = ops.rollout(step, jnp.zeros(1), us, include_initial=True)
    assert traj.shape == (6, 1)
    np.testing.assert_allclose(np.asarray(traj[0]), 0.0)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))
    # substepped RK4 at dt=0.1/4 should be extremely close to exact
    exact = 1.0 - np.exp(-0.5)
    np.testing.assert_allclose(float(final[0]), exact, atol=1e-9)


def test_rollout_batched_matches_loop(rng):
    rhs = lambda x, u: jnp.sin(x) + u
    x0 = jnp.asarray(rng.normal(size=(7, 2)))
    us = jnp.asarray(rng.normal(size=(10, 7, 2)))
    step = ops.rollout_stepper(rhs, 0.05, method="rk4")
    _, traj = ops.rollout(step, x0, us)
    # per-trajectory python loop
    for b in range(7):
        x = x0[b]
        for t in range(10):
            x = ops.rk4_step(rhs, x, us[t, b], 0.05)
        np.testing.assert_allclose(np.asarray(traj[-1, b]), np.asarray(x), atol=1e-12)


def test_rbf_features_oracle_and_bounds(rng):
    """RBF lift vs the naive per-pair distance oracle; values stay in
    (0, 1] even for states far from the origin (regression guard for the
    TPU bf16 Gram-expansion cancellation fixed in ops/lifting.py — on
    CPU this pins the clamp + exactness contract)."""
    from bluerov2_dynamics_tpu.ops.lifting import rbf_features, rbf_lift

    X = jnp.asarray(rng.normal(size=(40, 12)) * 20.0)   # far from origin
    X = X.at[:, 5].add(60.0)                            # wound psi regime
    C = jnp.asarray(rng.normal(size=(7, 12)) * 20.0)
    got = np.asarray(rbf_features(X, C, 3.0))
    want = np.exp(-3.0 * ((np.asarray(X)[:, None, :] - np.asarray(C)[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)
    assert got.max() <= 1.0 and got.min() >= 0.0
    # exact 1 at a center
    at_c = np.asarray(rbf_features(C, C, 3.0))
    np.testing.assert_allclose(np.diag(at_c), 1.0, atol=0)
    # full lift layout [x, rbf]
    Z = np.asarray(rbf_lift(X, C, 3.0))
    np.testing.assert_allclose(Z[:, :12], np.asarray(X), atol=0)
    np.testing.assert_allclose(Z[:, 12:], got, atol=0)
