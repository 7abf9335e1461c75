"""Differentiable Fossen parameter identification (TPU-native extension).

The reference hard-codes its physical coefficients (von Benzon Table A1,
``/root/reference/fossen/BlueROV2.py:79-140``) and has no way to calibrate
them against a recording — on the real tank data its physics model loses to
the data-driven models precisely because of vehicle/model mismatch
(``training/best_results.txt:790-791``).  This module closes that loop the
JAX way: the multi-step prediction error of the full nonlinear model is
differentiated **end-to-end through the integrator** (``jax.grad`` through
the ``lax.scan`` rollout, including the thruster map and the ZOH lag
filter) and minimized with Adam.

Structure mirrors the endpoint evaluator (``eval/metrics.py``): all N-H
window starts advance simultaneously as one batch, each inner step consumes
the contiguous input slice ``U[t : t+n_start]`` and scores against
``X[t+1 : t+1+n_start]`` — a dense multi-horizon teacher-forced loss with
no gathers.  The whole optimization (value_and_grad + Adam update, scanned
over iterations) compiles to ONE XLA program; a 300-iteration fit on the
full 36k-sample recording is a single device call.

Parameterization: 23 log-scale factors on the Table A1 coefficients
(mass, displaced volume, inertia diag, 6 added-mass, 6 linear-damping,
6 quadratic-damping) — the exact set the pseudo-recording generator
perturbs (``data/synthetic.py::perturbed_fossen_params``), in the same
layout.  Multiplicative log-space keeps every coefficient's physical sign
and keeps zero-valued nominals (the three zero linear-damping entries)
exactly zero.  Optionally 8 per-thruster log-gains capture structural
actuator asymmetry the nominal model cannot express.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.params import (
    FossenParams,
    LagParams,
    ThrusterConfig,
    lag_params,
    thruster_config,
)
from bluerov2_dynamics_tpu.models.thrusters import lag_step, static_thrust

# Nominal Table A1 coefficient vector in the generator's perturbation
# layout (``data/synthetic.py::perturbed_fossen_params``):
# [m, volume, Ix, Iy, Iz, added(6), damping_lin(6), damping_quad(6)].
# Values are the defaults of ``models.params.fossen_params``; the
# consistency test (tests/test_sysid.py) pins the two lists to each other.
NOMINAL_COEFFS = (
    13.5, 0.0134,
    0.26, 0.23, 0.37,
    -6.36, -7.12, -18.68, -0.189, -0.135, -0.222,
    -13.7, -0.0, -33.0, -0.0, -0.8, -0.0,
    -141.0, -217.0, -190.0, -1.19, -0.47, -1.5,
)

# SNAME-notation labels for the 23 coefficients, same order (the reference
# uses these symbols in its Table A1 block, fossen/BlueROV2.py:79-140).
COEFF_NAMES = (
    "m", "V",
    "Ix", "Iy", "Iz",
    "Xud", "Yvd", "Zwd", "Kpd", "Mqd", "Nrd",
    "Xu", "Yv", "Zw", "Kp", "Mq", "Nr",
    "Xuu", "Yvv", "Zww", "Kpp", "Mqq", "Nrr",
)


def params_from_scales(
    scales,
    rho: float = 1000.0,
    g: float = 9.82,
    cb=(0.0, 0.0, -0.01),
    current=(0.0, 0.0, 0.0),
    dtype=jnp.float32,
) -> FossenParams:
    """Traceable :class:`FossenParams` builder from 23 coefficient scales.

    ``params_from_scales(jnp.ones(23))`` equals ``fossen_params()`` (the
    jnp re-derivation of the derived fields — mdiag/minv/gyro/W/B — is
    tested against the host-side constructor).  Unlike
    ``models.params.fossen_params`` this runs under ``jit``/``grad``:
    gradients flow from the rollout loss back into the scales.
    """
    s = jnp.asarray(scales, dtype)
    if s.shape != (23,):
        raise ValueError(f"scales must have shape (23,), got {s.shape}")
    c = jnp.asarray(NOMINAL_COEFFS, dtype) * s
    m = c[0]
    volume = c[1]
    inertia = c[2:5]
    added = c[5:11]
    d_lin = -c[11:17]
    d_quad = -c[17:23]
    mdiag = jnp.concatenate([m - added[0:3], inertia - added[3:6]])
    gyro = jnp.stack(
        [
            inertia[2] - inertia[1] + added[4] - added[5],
            inertia[0] - inertia[2] + added[5] - added[3],
            inertia[1] - inertia[0] + added[3] - added[4],
        ]
    )
    return FossenParams(
        m=m,
        W=m * g,
        B=rho * g * volume,
        cb=jnp.asarray(cb, dtype),
        inertia=inertia,
        added=added,
        d_lin=d_lin,
        d_quad=d_quad,
        mdiag=mdiag,
        minv=1.0 / mdiag,
        gyro=gyro,
        current=jnp.asarray(current, dtype),
    )


class SysidResult(NamedTuple):
    """Result of a differentiable parameter fit."""

    params: FossenParams          # fitted coefficient pytree (concrete)
    cfg: Optional[ThrusterConfig]  # thruster config incl. fitted gains (thruster fits)
    log_scales: jnp.ndarray        # (23,) fitted log-scale factors
    log_gains: Optional[jnp.ndarray]  # (8,) fitted per-thruster log-gains or None
    losses: jnp.ndarray            # (steps,) training-loss history
    current: Optional[jnp.ndarray] = None  # (3,) fitted NED current [m/s] or None
    stderr: Optional[dict] = None  # per-parameter Laplace stderr (keys of theta)


def _window_loss(step, carry0, get_state, X, U, horizon: int, n_start: int,
                 input_delay: int = 0):
    """Mean squared multi-step prediction error over all window starts.

    At inner step t every start k has advanced t+1 steps from X[k]; its
    prediction is scored against X[k+t+1] — the contiguous slice
    ``X[t+1 : t+1+n_start]`` (same sliding-window trick as
    ``eval/metrics.py::_scan_all_starts``).  ``input_delay`` shifts which
    input drives the step from X[k+t] to X[k+t+1]: 0 is the evaluator
    convention U[k+t] (``eval/metrics.py::endpoint_rmse``), 1 pairs the
    step with U[k+t+1] instead (see the note in :func:`fit_thruster`).
    """

    def body(carry, t):
        u_t = jax.lax.dynamic_slice_in_dim(U, t + input_delay, n_start, axis=0)
        carry = step(carry, u_t)
        d = get_state(carry) - jax.lax.dynamic_slice_in_dim(
            X, t + 1, n_start, axis=0
        )
        return carry, jnp.mean(d * d)

    _, errs = jax.lax.scan(body, carry0, jnp.arange(horizon))
    return jnp.mean(errs)


def _run_adam(loss_fn, theta0, steps: int, lr: float):
    """Scanned full-batch Adam: the entire fit is one compiled call."""
    opt = optax.adam(lr)

    @jax.jit
    def run(theta0):
        def body(carry, _):
            theta, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(theta)
            updates, opt_state = opt.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), loss

        (theta, _), losses = jax.lax.scan(
            body, (theta0, opt.init(theta0)), None, length=steps
        )
        return theta, losses

    return run(theta0)


def _laplace_stderr(loss_fn, theta, n_resid: int) -> dict:
    """Gauss-Newton / Laplace standard errors at the fitted optimum.

    ``jax.hessian`` of the mean-squared window loss THROUGH the rollout
    scan (forward-over-reverse; a capability the reference's hard-coded
    model cannot offer), then the asymptotic least-squares covariance
    ``cov = sigma^2 (J^T J)^{-1} = (2 L* / N) H^{-1}`` with the residual
    MSE ``L*`` as the noise-variance estimate.  Directions with (near-)
    zero curvature — e.g. the scales on zero-valued nominal coefficients,
    whose gradients vanish identically — are reported as ``inf``
    (unidentifiable), not silently pseudo-inverted to 0.

    HONEST CAVEAT: the teacher-forced windows overlap, so the residuals
    are correlated and the i.i.d. count ``N = horizon * n_start * n_state``
    overstates the information — these stderrs are optimistic in absolute
    terms.  Their *relative* ordering is the useful output: a per-
    coefficient identifiability diagnostic (which Table A1 entries the
    recording actually constrains).
    """
    import numpy as np
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(theta)
    H = jax.jit(jax.hessian(lambda v: loss_fn(unravel(v))))(flat)
    L = float(loss_fn(theta))
    H = np.asarray(H, np.float64)
    H = (H + H.T) / 2.0
    diag = np.diag(H).copy()
    w, V = np.linalg.eigh(H)
    tol = max(float(w.max()), 0.0) * 1e-9
    inv_w = np.where(w > tol, 1.0 / np.where(w > tol, w, 1.0), 0.0)
    cov = (V * inv_w) @ V.T * (2.0 * max(L, 0.0) / max(n_resid, 1))
    se = np.sqrt(np.maximum(np.diag(cov), 0.0))
    dead = diag <= max(float(diag.max()), 0.0) * 1e-12
    se = np.where(dead, np.inf, se)
    return unravel(jnp.asarray(se, jnp.float32))


def lag_history(cfg: ThrusterConfig, lag: LagParams, U):
    """Per-sample lag-filter states ``(N, 8, 3)`` over a recording.

    Entry ``k`` is the filter state *before* consuming ``U[k]``, assuming
    at-rest filters at the start of the recording — the state the vehicle's
    thrusters actually carried when command ``U[k]`` was issued.  The
    filter input (static-curve thrust of the command) is independent of the
    vehicle state and of every fitted coefficient, so the whole history is
    one linear scan, computed once per fit.

    Why it matters for fitting: a multi-step prediction window that
    zero-inits its lag state (the evaluator semantics,
    ``eval/metrics.py::endpoint_rmse_carry``) carries a systematic thrust
    error for the filter's ~0.3 s settling time.  Metrics share that error
    across all compared models, but a *gradient-based fit* would bend the
    physical coefficients to compensate it — measured on noiseless
    synthetic data, zero-init windows plateau three orders of magnitude
    above the warm-started loss and drag coefficients away from truth.
    """
    F_cmd = static_thrust(cfg, jnp.asarray(U))

    def body(L, f):
        new_L, _ = lag_step(lag, L, f)
        return new_L, L

    _, hist = jax.lax.scan(body, jnp.zeros((8, 3), F_cmd.dtype), F_cmd)
    return hist


def _constrain(x0, mesh):
    if mesh is None:
        return x0
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x0, NamedSharding(mesh, P(mesh.axis_names[0]))
    )


def fit_thruster(
    X,
    U,
    dt: float,
    horizon: int = 10,
    steps: int = 300,
    lr: float = 0.02,
    *,
    method: str = "euler",
    use_lag: bool = True,
    lag_warmup: bool = True,
    fit_gains: bool = False,
    fit_current: bool = False,
    compute_stderr: bool = False,
    input_delay: int = 0,
    cfg: Optional[ThrusterConfig] = None,
    lag: Optional[LagParams] = None,
    mesh=None,
    dtype=jnp.float32,
) -> SysidResult:
    """Fit the 23 Table A1 coefficients of the thruster-input model.

    ``X``: ``(N, 12)`` recorded euler12 states, ``U``: ``(N, 8)`` thruster
    commands (the T2/T5/T6 dataset contract).  ``fit_gains=True``
    additionally learns 8 per-thruster gain factors (scaling the wrench-map
    rows) — actuator asymmetry that no coefficient of the nominal model can
    express.  ``fit_current=True`` additionally estimates a constant
    ambient NED current (3 additive parameters in m/s — additive because
    the nominal is zero; the generator's ``current`` kwarg is the test
    oracle).  ``mesh`` (optional, first axis used) shards the window-start
    batch data-parallel; results are mesh-invariant (tested).

    Gradients flow through the ZOH lag filter exactly as the evaluator
    semantics run it (fresh per-start filter state, advanced once per
    step — see ``eval/metrics.py::endpoint_rmse_carry``), except warm-started
    per window (``lag_warmup``, see :func:`lag_history`).

    ``input_delay``: which command drives the step from X[k] — 0 pairs it
    with U[k] (the evaluator/reference convention, correct for real 50 Hz
    recordings where U[k] is the command active over [t_k, t_{k+1})); 1
    pairs it with U[k+1].  The pseudo tank recording
    (``data/synthetic.py::generate_tank_recording``) records each command
    next to the state it *produced*, so on that generator's pairs the
    one-step truth is ``X[k+1] = step(X[k], U[k+1])`` and ``input_delay=1``
    makes the model class contain the exact generator (measured: the
    multi-step loss at the true coefficients is 6e-17 with delay 1 vs
    4e-5 with delay 0 on noiseless data).
    """
    cfg = cfg if cfg is not None else thruster_config(dtype=dtype)
    lag = lag if lag is not None else lag_params(dt, dtype=dtype)
    X = jnp.asarray(X, dtype)
    U = jnp.asarray(U, dtype)
    if X.ndim != 2 or X.shape[1] != 12:
        raise ValueError(f"X must be (N, 12), got {X.shape}")
    if U.shape[0] != X.shape[0] or U.ndim != 2 or U.shape[1] != 8:
        raise ValueError(f"U must be ({X.shape[0]}, 8), got {U.shape}")
    if input_delay not in (0, 1):
        raise ValueError(f"input_delay must be 0 or 1, got {input_delay}")
    n_start = X.shape[0] - horizon - input_delay
    if n_start <= 0:
        raise ValueError(f"horizon {horizon} >= dataset length {X.shape[0]}")

    theta0 = {"s": jnp.zeros(23, dtype)}
    if fit_gains:
        theta0["g"] = jnp.zeros(8, dtype)
    if fit_current:
        theta0["c"] = jnp.zeros(3, dtype)
    x0 = _constrain(X[:n_start], mesh)
    if use_lag and lag_warmup:
        hist = lag_history(cfg, lag, U)
        lag0 = _constrain(hist[input_delay:input_delay + n_start], mesh)
    else:
        lag0 = jnp.zeros((n_start, 8, 3), dtype)

    def loss_fn(theta):
        p = params_from_scales(
            jnp.exp(theta["s"]), current=theta.get("c", (0.0, 0.0, 0.0)),
            dtype=dtype,
        )
        c = cfg
        if fit_gains:
            c = cfg._replace(
                wrench_map=cfg.wrench_map * jnp.exp(theta["g"])[:, None]
            )
        step = fossen.make_thruster_step(p, c, lag, dt, method, use_lag)
        return _window_loss(
            step, (x0, lag0), lambda carry: carry[0], X, U, horizon, n_start,
            input_delay,
        )

    theta, losses = _run_adam(loss_fn, theta0, steps, lr)
    fitted = params_from_scales(
        jnp.exp(theta["s"]), current=theta.get("c", (0.0, 0.0, 0.0)),
        dtype=dtype,
    )
    log_gains = theta.get("g")
    fitted_cfg = cfg
    if fit_gains:
        fitted_cfg = cfg._replace(
            wrench_map=cfg.wrench_map * jnp.exp(log_gains)[:, None]
        )
    stderr = None
    if compute_stderr:
        stderr = _laplace_stderr(
            loss_fn, theta, horizon * n_start * X.shape[1])
    return SysidResult(
        params=fitted,
        cfg=fitted_cfg,
        log_scales=theta["s"],
        log_gains=log_gains,
        losses=losses,
        current=theta.get("c"),
        stderr=stderr,
    )


def fit_wrench(
    X,
    TAU,
    dt: float,
    horizon: int = 10,
    steps: int = 300,
    lr: float = 0.02,
    *,
    method: str = "euler",
    state: str = "euler12",
    fit_current: bool = False,
    compute_stderr: bool = False,
    input_delay: int = 0,
    mesh=None,
    dtype=jnp.float32,
) -> SysidResult:
    """Fit the 23 coefficients of a wrench-input model (euler12 or quat13).

    ``X``: ``(N, 12)`` or ``(N, 13)`` states matching ``state``; ``TAU``:
    ``(N, 6)`` recorded body wrenches (the T3/T4 dataset contract).  The
    quat13 step renormalizes the quaternion after every step, matching the
    apps' evaluator semantics.  ``fit_current`` / ``input_delay`` as in
    :func:`fit_thruster` (the synthetic wrench datasets are the thruster
    generator's recordings with commands mapped through the effectiveness
    matrix, so they inherit its command-next-to-produced-state pairing).
    """
    n_state = {"euler12": 12, "quat13": 13}.get(state)
    if n_state is None:
        raise ValueError(f"unknown state convention {state!r}")
    X = jnp.asarray(X, dtype)
    TAU = jnp.asarray(TAU, dtype)
    if X.ndim != 2 or X.shape[1] != n_state:
        raise ValueError(f"X must be (N, {n_state}) for {state}, got {X.shape}")
    if TAU.shape[0] != X.shape[0] or TAU.ndim != 2 or TAU.shape[1] != 6:
        raise ValueError(f"TAU must be ({X.shape[0]}, 6), got {TAU.shape}")
    if input_delay not in (0, 1):
        raise ValueError(f"input_delay must be 0 or 1, got {input_delay}")
    n_start = X.shape[0] - horizon - input_delay
    if n_start <= 0:
        raise ValueError(f"horizon {horizon} >= dataset length {X.shape[0]}")

    x0 = _constrain(X[:n_start], mesh)
    theta0 = {"s": jnp.zeros(23, dtype)}
    if fit_current:
        theta0["c"] = jnp.zeros(3, dtype)

    def loss_fn(theta):
        p = params_from_scales(
            jnp.exp(theta["s"]), current=theta.get("c", (0.0, 0.0, 0.0)),
            dtype=dtype,
        )
        step = fossen.make_wrench_step(p, dt, method, state)
        return _window_loss(
            step, x0, lambda carry: carry, X, TAU, horizon, n_start,
            input_delay,
        )

    theta, losses = _run_adam(loss_fn, theta0, steps, lr)
    stderr = None
    if compute_stderr:
        stderr = _laplace_stderr(
            loss_fn, theta, horizon * n_start * X.shape[1])
    return SysidResult(
        params=params_from_scales(
            jnp.exp(theta["s"]), current=theta.get("c", (0.0, 0.0, 0.0)),
            dtype=dtype,
        ),
        cfg=None,
        log_scales=theta["s"],
        log_gains=None,
        losses=losses,
        current=theta.get("c"),
        stderr=stderr,
    )
