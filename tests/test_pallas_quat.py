"""Parity of the quat13 wrench-input Pallas kernels with the canonical
scan path (interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.params import fossen_params
from bluerov2_dynamics_tpu.ops.integrators import rollout
from bluerov2_dynamics_tpu.ops.pallas_quat import (
    make_endpoint_final_pallas_quat,
    make_rollout_final_pallas_quat,
)
from bluerov2_dynamics_tpu.ops.quaternion import euler_to_quat


def _quat_state(rng, n=1):
    """Random normalized quat13 states."""
    x = rng.normal(size=(n, 13)) * 0.3
    eul = rng.normal(size=(n, 3)) * 0.4
    x[:, 3:7] = np.asarray(
        euler_to_quat(jnp.asarray(eul[:, 0]), jnp.asarray(eul[:, 1]),
                      jnp.asarray(eul[:, 2]))
    )
    return jnp.asarray(x, jnp.float32)


def test_quat_rollout_matches_scan(rng):
    dt = 0.02
    B, T = 16, 50
    x0 = _quat_state(rng, B)
    TAU = jnp.asarray(rng.normal(size=(T, 6)) * 3.0, jnp.float32)

    for current in ((0.0, 0.0, 0.0), (0.2, -0.1, 0.05)):
        p = fossen_params(current=current, dtype=jnp.float32)
        for method in ("euler", "rk4"):
            got = make_rollout_final_pallas_quat(
                p, dt, method=method, block_b=8, interpret=True
            )(x0, TAU)
            step = fossen.make_wrench_step(p, dt, method=method,
                                           state="quat13")
            # shared wrench across the batch
            want, _ = rollout(step, x0, jnp.broadcast_to(
                TAU[:, None, :], (T, B, 6)))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)
            norms = np.linalg.norm(np.asarray(got)[:, 3:7], axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_quat_endpoint_eval_matches_scan(rng):
    from bluerov2_dynamics_tpu.eval import metrics

    dt, H, N = 0.02, 10, 70
    p = fossen_params(current=(0.1, 0.05, -0.02), dtype=jnp.float32)
    TAU = jnp.asarray(rng.normal(size=(N, 6)) * 3.0, jnp.float32)
    step = fossen.make_wrench_step(p, dt, method="euler", state="quat13")
    x0 = _quat_state(rng, 1)[0]
    _, X = rollout(step, x0, TAU)
    X = X[:-1]

    for method in ("euler", "rk4"):
        fe = make_endpoint_final_pallas_quat(
            p, dt, H, method=method, block_b=16, interpret=True
        )
        got = float(metrics.rmse(X[H:], fe(X, TAU)))
        step_m = fossen.make_wrench_step(p, dt, method=method,
                                         state="quat13")
        want = float(metrics.endpoint_rmse(step_m, X, TAU, H))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_normalize_rows_fallback_and_parity(rng):
    """The kernel's rsqrt-form normalize (round 5) matches the library's
    sqrt/div ``quat_normalize`` to f32 rounding and keeps its exact
    identity fallback for sub-eps norms."""
    from bluerov2_dynamics_tpu.ops.pallas_quat import _normalize_q_rows
    from bluerov2_dynamics_tpu.ops.quaternion import quat_normalize

    q = jnp.asarray(rng.normal(size=(64, 4)) * 2.0, jnp.float32)
    got = jnp.stack(_normalize_q_rows(q[:, 0], q[:, 1], q[:, 2], q[:, 3]), 1)
    want = quat_normalize(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-7)

    tiny = jnp.zeros((3, 4), jnp.float32).at[1].set(1e-20).at[2, 0].set(1.0)
    got = jnp.stack(
        _normalize_q_rows(tiny[:, 0], tiny[:, 1], tiny[:, 2], tiny[:, 3]), 1)
    # zero and sub-eps norms -> identity quaternion; unit stays unit
    np.testing.assert_array_equal(
        np.asarray(got),
        np.array([[1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]], np.float32))


def test_quat_mix_peak_audit_matches_kernel_budget():
    """The bench mix-peak microbenchmark emits EXACTLY the quat13 kernel
    step's audited slots/div/sqrt/cheap budget (the assertion inside
    measure_quat_mix_peak), and runs in interpret mode."""
    import sys
    sys.path.insert(0, "/root/repo")
    import bench

    oc = bench.quat_step_op_counts()
    sps, emitted = bench.measure_quat_mix_peak(
        oc, rows=8, iters=2, calls=1, interpret=True)
    for key in ("slots", "div", "sqrt", "cheap"):
        assert emitted[key] == oc[key]
    assert np.isfinite(sps) and sps > 0


def test_quat_no_renormalize_matches_scan(rng):
    """renormalize=False parity (the canonical step's compat flag)."""
    dt = 0.02
    B, T = 8, 30
    p = fossen_params(dtype=jnp.float32)
    x0 = _quat_state(rng, B)
    TAU = jnp.asarray(rng.normal(size=(T, 6)) * 2.0, jnp.float32)
    got = make_rollout_final_pallas_quat(
        p, dt, method="rk4", block_b=8, interpret=True, renormalize=False
    )(x0, TAU)
    step = fossen.make_wrench_step(p, dt, method="rk4", state="quat13",
                                   renormalize=False)
    want, _ = rollout(step, x0, jnp.broadcast_to(TAU[:, None, :], (T, B, 6)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
