"""Parity of the Pallas sliding-window evaluator with the scan evaluator."""

import numpy as np
import jax.numpy as jnp

from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config
from bluerov2_dynamics_tpu.ops.pallas_eval import make_endpoint_final_pallas


def _data(rng, N=60, dt=0.02):
    p = fossen_params(dtype=jnp.float32)
    cfg = thruster_config(dtype=jnp.float32)
    lag = lag_params(dt, dtype=jnp.float32)
    U = jnp.asarray(np.clip(rng.normal(size=(N, 8)) * 0.4, -1, 1), jnp.float32)
    x0 = jnp.zeros(12, jnp.float32).at[2].set(1.0)
    X = fossen.simulate_thruster(p, cfg, lag, x0, U, dt)[:-1]
    X = X + jnp.asarray(rng.normal(size=X.shape) * 1e-3, jnp.float32)
    return p, cfg, lag, X, U, dt


def test_pallas_eval_matches_scan(rng):
    p, cfg, lag, X, U, dt = _data(rng)
    for H, method in ((7, "euler"), (11, "rk4")):
        fn = make_endpoint_final_pallas(
            p, cfg, lag, dt, H, method=method, block_b=8, interpret=True
        )
        final = np.asarray(fn(X, U))
        # scan-evaluator endpoint states via per-start simulation
        step = fossen.make_thruster_step(p, cfg, lag, dt, method=method)
        want = []
        for k in range(X.shape[0] - H):
            traj = fossen.simulate_thruster(
                p, cfg, lag, X[k], U[k : k + H], dt, method=method
            )
            want.append(np.asarray(traj[-1]))
        np.testing.assert_allclose(final, np.stack(want), rtol=2e-4, atol=2e-5)


def test_pallas_eval_rmse_matches_metric(rng):
    p, cfg, lag, X, U, dt = _data(rng)
    H = 9
    fn = make_endpoint_final_pallas(
        p, cfg, lag, dt, H, method="euler", block_b=8, interpret=True
    )
    got = float(metrics.rmse(X[H:], fn(X, U)))
    step = fossen.make_thruster_step(p, cfg, lag, dt, method="euler")
    want = float(
        metrics.endpoint_rmse_carry(
            step, lambda x: jnp.zeros((*x.shape[:-1], 8, 3), x.dtype), X, U, H
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_eval_padding(rng):
    """n_start not divisible by block_b exercises the pad/slice path."""
    p, cfg, lag, X, U, dt = _data(rng, N=45)
    H = 5
    fn = make_endpoint_final_pallas(
        p, cfg, lag, dt, H, method="euler", block_b=16, interpret=True
    )
    final = np.asarray(fn(X, U))
    assert final.shape == (40, 12)
    assert np.all(np.isfinite(final))


def test_batched_rollout_per_traj_inputs(rng):
    """Per-trajectory-input VMEM rollout matches the canonical scan."""
    from bluerov2_dynamics_tpu.ops.pallas_eval import make_batched_rollout_pallas
    from bluerov2_dynamics_tpu.ops.integrators import rollout

    dt = 0.02
    p = fossen_params(dtype=jnp.float32)
    cfg = thruster_config(dtype=jnp.float32)
    lag = lag_params(dt, dtype=jnp.float32)
    B, T = 12, 25
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.3, jnp.float32)
    U = jnp.asarray(np.clip(rng.normal(size=(T, B, 8)) * 0.5, -1, 1), jnp.float32)

    fn = make_batched_rollout_pallas(p, cfg, lag, dt, method="rk4",
                                     block_b=8, interpret=True)
    got = np.asarray(fn(x0, U))
    step = fossen.make_thruster_step(p, cfg, lag, dt, method="rk4")
    (want, _), _ = rollout(step, (x0, jnp.zeros((B, 8, 3), jnp.float32)), U)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_endpoint_pallas_wrench_matches_scan(rng):
    """Wrench-input VMEM evaluator (T3 physics baseline) matches the scan
    evaluator, including with a nonzero ocean current."""
    from bluerov2_dynamics_tpu.eval import metrics
    from bluerov2_dynamics_tpu.ops.pallas_eval import (
        make_endpoint_final_pallas_wrench,
    )

    dt, H, N = 0.02, 10, 70
    for current in ((0.0, 0.0, 0.0), (0.2, -0.15, 0.05)):
        p = fossen_params(current=current, dtype=jnp.float32)
        TAU = jnp.asarray(rng.normal(size=(N, 6)) * 3.0, jnp.float32)
        step = fossen.make_wrench_step(p, dt, method="euler", state="euler12")
        x0 = jnp.asarray(rng.normal(size=12) * 0.2, jnp.float32)
        from bluerov2_dynamics_tpu.ops.integrators import rollout

        _, X = rollout(step, x0, TAU)
        X = X[:-1]

        for method in ("euler", "rk4"):
            fe = make_endpoint_final_pallas_wrench(
                p, dt, H, method=method, block_b=16, interpret=True
            )
            got = float(metrics.rmse(X[H:], fe(X, TAU)))
            step_m = fossen.make_wrench_step(p, dt, method=method,
                                             state="euler12")
            want = float(metrics.endpoint_rmse(step_m, X, TAU, H))
            np.testing.assert_allclose(got, want, rtol=1e-4)


def test_window_eval_rejects_mis_shaped_inputs(rng):
    """The window driver must ERROR on wrong-width X/U instead of letting
    the BlockSpecs silently truncate columns (an (N, 8) thruster-command
    array fed to the 6-wrench evaluator would otherwise be read as the
    first 6 wrench columns) or zero-pad a short U."""
    import pytest

    from bluerov2_dynamics_tpu.ops.pallas_eval import (
        make_endpoint_final_pallas_wrench,
    )

    p = fossen_params(dtype=jnp.float32)
    fe = make_endpoint_final_pallas_wrench(p, 0.02, 10, method="euler",
                                           block_b=16, interpret=True)
    X = jnp.zeros((40, 12), jnp.float32)
    with pytest.raises(Exception, match="U must be"):
        fe(X, jnp.zeros((40, 8), jnp.float32))  # thruster cmds, not wrench
    with pytest.raises(Exception, match="rows"):
        fe(X, jnp.zeros((20, 6), jnp.float32))  # too short
    with pytest.raises(Exception, match="X must be"):
        fe(jnp.zeros((40, 13), jnp.float32), jnp.zeros((40, 6), jnp.float32))


def test_rows_stepper_rejects_unknown_method():
    """A method typo must raise like fossen._STEPPERS[method] does, not
    silently integrate with RK4 (would change blessed numbers)."""
    import pytest

    from bluerov2_dynamics_tpu.ops.pallas_quat import (
        make_endpoint_final_pallas_quat,
    )
    from bluerov2_dynamics_tpu.ops.pallas_rollout import _rk4_rows

    with pytest.raises(ValueError, match="unknown method"):
        _rk4_rows(lambda xs, tau: xs, (jnp.zeros(8),), (0.0,), 0.02, "Euler")
    p = fossen_params(dtype=jnp.float32)
    fe = make_endpoint_final_pallas_quat(p, 0.02, 10, method="rk2",
                                         block_b=16, interpret=True)
    with pytest.raises(ValueError, match="unknown method"):
        fe(jnp.zeros((40, 13), jnp.float32), jnp.zeros((40, 6), jnp.float32))


def test_tuned_block_defaults_pinned():
    """Pin the measured block_b defaults (RESULTS.md S8 window-block sweep +
    the rollout sweeps): every window evaluator 2048 (the thruster default
    moved 1024 -> 2048 when the sweep was re-run with the euler step the
    apps actually use — the 1024 was tuned on the rk4 factory default),
    rollout kernels 2048 (euler12 + quat13), batched-rollout 1024.
    A silent default drift would invalidate every blessed timing row, so a
    deliberate retune must update this test alongside RESULTS.md."""
    import inspect

    from bluerov2_dynamics_tpu.ops import pallas_eval, pallas_quat, pallas_rollout
    from bluerov2_dynamics_tpu.parallel import sharded

    def default(fn):
        return inspect.signature(fn).parameters["block_b"].default

    assert default(pallas_eval.make_endpoint_final_pallas) == 2048
    assert default(pallas_eval.make_endpoint_final_pallas_wrench) == 2048
    assert default(pallas_eval.make_batched_rollout_pallas) == 1024
    assert default(pallas_quat.make_endpoint_final_pallas_quat) == 2048
    assert default(pallas_quat.make_rollout_final_pallas_quat) == 2048
    assert default(pallas_rollout.make_rollout_final_pallas) == 2048
    assert default(pallas_rollout.rollout_final_pallas) == 2048
    # sharded wrappers must agree with their single-device kernels
    assert default(sharded.shardmap_endpoint_rmse_pallas) == 2048
    assert default(sharded.shardmap_endpoint_rmse_pallas_wrench) == 2048
    assert default(sharded.shardmap_endpoint_rmse_pallas_quat) == 2048
