"""Sharded rollouts and metrics over a device mesh.

Two styles are provided:

* **GSPMD** (:func:`sharded_endpoint_rmse`, :func:`sharded_rollout_final`):
  annotate the start-index batch as sharded over the 'data' axis, keep the
  input trajectory replicated, and let XLA partition the scan body and
  insert the final psum for the RMSE reduction.  Handles non-divisible
  batch sizes.

* **Explicit SPMD** (:func:`shardmap_endpoint_rmse`): ``shard_map`` over
  the 'data' axis with hand-written per-shard input slicing and an explicit
  ``psum`` of squared-error partial sums — the fully explicit collective
  path (useful as a cross-check and for custom communication later).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _sliding_scan(step: Callable, x0_batch, U, H: int, n_start: int, offset=0):
    def body(carry, t):
        u_t = jax.lax.dynamic_slice_in_dim(U, t + offset, n_start, axis=0)
        return step(carry, u_t), None

    carry, _ = jax.lax.scan(body, x0_batch, jnp.arange(H))
    return carry


def sharded_rollout_final(mesh: Mesh, step: Callable, x0_batch, U, T: int,
                          data_axis: str = "data"):
    """Advance a (B, n) batch T steps under shared inputs ``U`` (T, r),
    batch sharded over the mesh; returns the final (B, n) batch."""
    batch_sharding = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnums=(), in_shardings=(batch_sharding, repl),
             out_shardings=batch_sharding)
    def run(x0, U):
        def body(carry, u):
            return step(carry, u), None

        carry, _ = jax.lax.scan(body, x0, U)
        return carry

    return run(x0_batch, U)


def sharded_endpoint_rmse(mesh: Mesh, step: Callable, X, U, H: int,
                          data_axis: str = "data"):
    """Endpoint H-step RMSE with the start-index batch sharded over the mesh.

    Same semantics as :func:`bluerov2_dynamics_tpu.eval.metrics.endpoint_rmse`;
    X and U enter replicated, the in-flight (n_start, n) batch is sharded,
    and XLA inserts the cross-device reduction for the mean.
    """
    N = X.shape[0]
    n_start = N - H
    if n_start <= 0:  # same NaN contract as the single-device twin
        return jnp.asarray(jnp.nan, jnp.float32)
    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(data_axis))

    @partial(jax.jit, in_shardings=(repl, repl), out_shardings=repl)
    def run(X, U):
        x0 = jax.lax.with_sharding_constraint(X[:n_start], batch_sharding)
        final = _sliding_scan(step, x0, U, H, n_start)
        d = final - X[H:]
        return jnp.sqrt(jnp.mean(d * d))

    return run(X, U)


def shardmap_endpoint_rmse(mesh: Mesh, step: Callable, X, U, H: int,
                           data_axis: str = "data"):
    """Explicit shard_map + psum version of the endpoint evaluator.

    Requires ``(N - H) % mesh.shape[data_axis] == 0`` (explicit SPMD has
    per-shard static shapes); each shard rolls its contiguous block of
    starts using slices of the replicated input trajectory offset by its
    position on the mesh axis, then the squared-error sums are psum'd.
    """
    from jax import shard_map

    N, n = X.shape
    n_start = N - H
    if n_start <= 0:  # same NaN contract as the single-device twin
        return jnp.asarray(jnp.nan, jnp.float32)
    n_dev = mesh.shape[data_axis]
    if n_start % n_dev != 0:
        raise ValueError(f"n_start={n_start} not divisible by mesh axis {n_dev}")
    m = n_start // n_dev

    def per_shard(x0_local, target_local, U_full):
        offset = jax.lax.axis_index(data_axis) * m
        final = _sliding_scan(step, x0_local, U_full, H, m, offset=offset)
        d = final - target_local
        sq = jnp.sum(d * d)
        return jax.lax.psum(sq, data_axis)

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P()),
        out_specs=P(),
    )
    sq_total = fn(X[:n_start], X[H:], U)
    return jnp.sqrt(sq_total / (n_start * n))


def _shardmap_window_rmse(
    mesh: Mesh,
    kernel,
    n_state: int,
    n_in: int,
    scratch_shapes,
    X,
    U,
    H: int,
    block_b: int,
    interpret: bool,
    data_axis: str,
):
    """Shared shard_map composition for ALL sliding-window VMEM evaluator
    kernels (thruster-euler12, wrench-euler12, quat13 — the kernel body,
    state width, and scratch are the only differences, mirroring
    ``pallas_eval.make_window_eval_fn`` on the single-device side).

    Each device runs the kernel on its contiguous block of rollout starts,
    slicing its shifted input windows out of the replicated input
    trajectory at its mesh offset; squared-error partial sums are
    ``psum``'d over ICI.  Divisibility requirement
    ``(N - H) % mesh.shape[data_axis] == 0``.
    """
    from jax import shard_map

    from bluerov2_dynamics_tpu.ops.pallas_eval import window_pallas_call

    N, n = X.shape
    n_start = N - H
    if n_start <= 0:  # same NaN contract as the single-device twin
        return jnp.asarray(jnp.nan, jnp.float32)
    n_dev = mesh.shape[data_axis]
    if n_start % n_dev != 0:
        raise ValueError(f"n_start={n_start} not divisible by mesh axis {n_dev}")
    m = n_start // n_dev
    bb = min(block_b, m)
    m_pad = -(-m // bb) * bb

    x0 = X[:n_start].astype(jnp.float32)
    target = X[H:].astype(jnp.float32)
    ut = U.T.astype(jnp.float32)  # (n_in, N)
    # the last shard's widest input slice ends at (n_dev-1)*m + H-1 + m_pad
    need = (n_dev - 1) * m + H - 1 + m_pad
    if need > ut.shape[1]:
        ut = jnp.pad(ut, ((0, 0), (0, need - ut.shape[1])))

    def per_shard(x0_local, target_local, ut_full):
        offset = jax.lax.axis_index(data_axis).astype(jnp.int32) * m
        x0t = x0_local.T  # (n_state, m)
        if m_pad != m:
            x0t = jnp.pad(x0t, ((0, 0), (0, m_pad - m)))
        zero = jnp.int32(0)
        u_shift = jnp.stack([
            jax.lax.dynamic_slice(ut_full, (zero, offset + jnp.int32(t)),
                                  (n_in, m_pad))
            for t in range(H)
        ])  # (H, n_in, m_pad)
        out = window_pallas_call(kernel, n_state, n_in, bb, m_pad, H,
                                 scratch_shapes, interpret)(u_shift, x0t)
        final = out[:, :m].T
        d = final - target_local
        return jax.lax.psum(jnp.sum(d * d), data_axis)

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P()),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes metadata; skip the
        # vma check (the collective structure here is a single final psum)
        check_vma=False,
    )
    sq_total = fn(x0, target, ut)
    return jnp.sqrt(sq_total / (n_start * n))


def shardmap_endpoint_rmse_pallas(
    mesh: Mesh,
    p,
    cfg,
    lag,
    X,
    U,
    dt: float,
    H: int,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    use_lag: bool = True,
    data_axis: str = "data",
):
    """Endpoint H-step RMSE with the thruster-input Pallas VMEM evaluator
    as the per-shard body — the fastest single-chip path composed with
    ``shard_map``.  Same semantics as :func:`shardmap_endpoint_rmse`.

    ``interpret=True`` runs the kernel in Pallas interpret mode (CPU
    meshes / the driver dry run); on TPU hardware leave it False.
    """
    from jax.experimental.pallas import tpu as pltpu

    from bluerov2_dynamics_tpu.ops.pallas_eval import (
        _make_thruster_window_kernel,
    )

    kernel = _make_thruster_window_kernel(p, cfg, lag, dt, method, use_lag)
    return _shardmap_window_rmse(
        mesh, kernel, 12, 8,
        lambda b: [pltpu.VMEM((12, b), jnp.float32),
                   pltpu.VMEM((3, 8, b), jnp.float32)],
        X, U, H, block_b, interpret, data_axis,
    )


def shardmap_endpoint_rmse_pallas_wrench(
    mesh: Mesh,
    p,
    X,
    TAU,
    dt: float,
    H: int,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    data_axis: str = "data",
):
    """Sharded endpoint RMSE for the WRENCH-input euler12 model (the T3
    physics baseline, ``fossen/BlueROV2_thrust.py:235-282``): the
    ``make_endpoint_final_pallas_wrench`` kernel under ``shard_map``.
    ``X``: ``(N, 12)``; ``TAU``: ``(N, 6)`` recorded body wrenches.
    """
    from jax.experimental.pallas import tpu as pltpu

    from bluerov2_dynamics_tpu.ops.pallas_eval import _make_wrench_window_kernel

    kernel = _make_wrench_window_kernel(p, dt, method)
    return _shardmap_window_rmse(
        mesh, kernel, 12, 6,
        lambda b: [pltpu.VMEM((12, b), jnp.float32)],
        X, TAU, H, block_b, interpret, data_axis,
    )


def shardmap_endpoint_rmse_pallas_quat(
    mesh: Mesh,
    p,
    X,
    TAU,
    dt: float,
    H: int,
    method: str = "euler",
    block_b: int = 2048,
    interpret: bool = False,
    renormalize: bool = True,
    data_axis: str = "data",
):
    """Sharded endpoint RMSE for the QUATERNION-state wrench model (the T4
    physics baseline, ``fossen/BlueROV2_wrench.py:141-367``): the
    ``make_endpoint_final_pallas_quat`` kernel under ``shard_map``.
    ``X``: ``(N, 13)``; ``TAU``: ``(N, 6)`` recorded body wrenches.
    """
    from jax.experimental.pallas import tpu as pltpu

    from bluerov2_dynamics_tpu.ops.pallas_quat import _make_quat_window_kernel

    kernel = _make_quat_window_kernel(p, dt, method, renormalize)
    return _shardmap_window_rmse(
        mesh, kernel, 13, 6,
        lambda b: [pltpu.VMEM((13, b), jnp.float32)],
        X, TAU, H, block_b, interpret, data_axis,
    )


def sharded_koopman_multistep_rmse(
    mesh: Mesh,
    model,
    X,
    U,
    H: int,
    data_axis: str = "data",
    model_axis: str = "model",
    method: str = "scan",
):
    """TP+DP endpoint H-step Koopman RMSE over all N-H starts.

    Same semantics as :func:`bluerov2_dynamics_tpu.models.koopman.multistep_rmse`
    (reference ``Koopman/koopmanEDMDc.py:172-200``), laid out for a 2-D mesh:
    the (d, d) Koopman operator is sharded over ``model_axis`` (tensor
    parallelism over the lift dimension — d=512 for the tank config), the
    start-index batch over ``data_axis``; XLA inserts the contraction
    collectives from the annotations.  ``method`` as in the single-device
    twin ("conv" propagates via the batched control-convolution endpoint —
    one large GEMM instead of H serialized ones, so the per-step TP
    contraction collectives collapse to one as well).
    """
    from bluerov2_dynamics_tpu.eval.metrics import rmse
    from bluerov2_dynamics_tpu.models import koopman

    if method not in ("scan", "conv"):  # same contract as the twin
        raise ValueError(f"method must be 'scan' or 'conv', got {method!r}")
    n_start = X.shape[0] - H
    if n_start <= 0:  # same NaN contract as the single-device twin
        return jnp.asarray(jnp.nan, jnp.float32)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(data_axis))
    op_sharding = NamedSharding(mesh, P(model_axis, None))

    model_s = jax.tree.map(lambda a: jax.device_put(a, repl), model)
    model_s = model_s._replace(A=jax.device_put(model.A, op_sharding))
    X_r = jax.device_put(X, repl)
    U_r = jax.device_put(U, repl)

    @partial(jax.jit, static_argnums=(3, 4))
    def run(model, X, U, H, method):
        Z = jax.lax.with_sharding_constraint(
            koopman.lift(model, X[:n_start]), batch
        )
        A_T, B_T = model.A.T, model.B.T

        if H == 0:
            pass  # zero-length propagation (same contract as the twin)
        elif method == "conv":
            Z = koopman._endpoint_conv(Z, U, A_T, B_T, H, n_start, "highest")
        else:
            def body(Z, t):
                u_t = jax.lax.dynamic_slice_in_dim(U, t, n_start, axis=0)
                with jax.default_matmul_precision("highest"):
                    return Z @ A_T + u_t @ B_T, None

            Z, _ = jax.lax.scan(body, Z, jnp.arange(H))
        return rmse(X[H:], koopman.decode(model, Z))

    return run(model_s, X_r, U_r, H, method)


def sharded_koopman_fit(
    mesh: Mesh,
    key,
    X,
    U,
    n_rbfs: int = 200,
    gamma: float = 1.0,
    ridge: float = 1e-8,
    kmeans_iters: int = 25,
    data_axis: str = "data",
    position_invariant: bool = False,
    fit_decoder: bool = False,
    decoder_ridge: float = 1e-6,
):
    """Koopman EDMDc fit with the snapshot rows sharded over the mesh.

    The Gram matrix ``G^T G`` and cross term ``G^T Y`` are accumulated
    across devices (XLA inserts the reduce from the sharding annotations);
    the small (d+r)^2 solve is replicated.  Scales the reference's fit
    (``Koopman/koopmanEDMDc.py:72-103``) to datasets larger than one
    chip's HBM.

    ``position_invariant`` and ``fit_decoder`` match the single-device
    :func:`bluerov2_dynamics_tpu.models.koopman.fit` /
    :func:`~.models.koopman.fit_decoder` semantics, so the framework's
    best-accuracy configuration (the PI dictionary) is available sharded.
    The decoder solve reuses the row-sharded lift.
    """
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.models.koopman import KoopmanModel, _ridge_solve
    from bluerov2_dynamics_tpu.ops.kmeans import kmeans
    from bluerov2_dynamics_tpu.ops.lifting import rbf_lift

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(data_axis))

    @partial(jax.jit, static_argnums=(1,), in_shardings=(repl, repl, repl))
    def run(key, n_rbfs, X, U):
        weights = None
        if position_invariant:
            weights = jnp.ones(X.shape[1], X.dtype).at[:3].set(0.0)
            X_cl = X * weights
        else:
            X_cl = X
        centers, _ = kmeans(key, X_cl, n_rbfs, iters=kmeans_iters)
        Z = jax.lax.with_sharding_constraint(
            rbf_lift(X[:-1], centers, gamma, weights), rows
        )
        Zp = jax.lax.with_sharding_constraint(
            rbf_lift(X[1:], centers, gamma, weights), rows
        )
        G = jnp.concatenate([Z, U[:-1]], axis=1)
        M = _ridge_solve(G, Zp, ridge)
        d = Z.shape[1]
        decoder = None
        if fit_decoder:
            # x ~ W z on the row-sharded lift; relative ridge as in
            # koopman.fit_decoder (highly-correlated RBF features)
            Z_full = jnp.concatenate([Z, Zp[-1:]], axis=0)
            scale = jnp.mean(jnp.sum(Z_full * Z_full, axis=0))
            decoder = _ridge_solve(Z_full, X, decoder_ridge * scale).T
        return KoopmanModel(
            centers=centers,
            gamma=jnp.asarray(gamma, X.dtype),
            A=M[:d].T,
            B=M[d:].T,
            decoder=decoder,
            rbf_weights=weights,
        )

    return run(key, n_rbfs, X, U)


def sharded_streaming_stats(
    mesh: Mesh,
    stats0,
    X,
    U,
    chunk: int = 1024,
    forgetting: float = 1.0,
    data_axis: str = "data",
):
    """Accumulate Koopman streaming statistics with the recording
    row-sharded over the mesh (the multi-chip form of
    :func:`~.models.koopman.streaming_scan`).

    Each device runs the sequential chunk scan over its contiguous
    segment; shard-boundary snapshot pairs are preserved by seeding each
    shard's carry with a one-row halo (its left neighbour's last row), so
    the pair set is identical to the single-device scan.  With
    ``forgetting < 1`` every shard's local statistics are decayed by
    ``lam^(pairs downstream of it)`` before the ``psum`` merge — the
    exponential weighting is a function of global pair age only, so the
    merged result equals the sequential scan exactly (equality-tested;
    summation order differs by roundoff).

    ``stats0`` may carry prior data (its ``prev_*`` seeds shard 0 and its
    gram/rhs decay by ``lam^M``, M = pairs added here), so long-lived
    online accumulation composes with sharded catch-up over a backlog.
    Requires ``X.shape[0]`` divisible by the mesh axis size.
    """
    from jax import shard_map

    from bluerov2_dynamics_tpu.models.koopman import streaming_scan
    from bluerov2_dynamics_tpu.ops.lifting import rbf_lift

    N = X.shape[0]
    S = mesh.shape[data_axis]
    if N % S != 0:
        raise ValueError(f"N={N} not divisible by mesh axis {S}")
    m = N // S
    dtype = stats0.gram.dtype
    X = jnp.asarray(X, dtype)
    U = jnp.asarray(U, dtype)
    lam = jnp.asarray(forgetting, dtype)
    # One-row halos: X[i*m - 1] seeds shard i's boundary pair; shard 0's
    # halo slot carries stats0's own prev sample (resume semantics).
    halo_X = jnp.concatenate(
        [jnp.zeros((1, X.shape[1]), dtype), X[m - 1 :: m][: S - 1]])
    halo_U = jnp.concatenate(
        [stats0.prev_u[None], U[m - 1 :: m][: S - 1]])
    empty = stats0._replace(
        gram=jnp.zeros_like(stats0.gram),
        rhs=jnp.zeros_like(stats0.rhs),
        weight_sum=jnp.zeros_like(stats0.weight_sum),
    )

    def per_shard(X_loc, U_loc, hx, hu):
        idx = jax.lax.axis_index(data_axis)
        halo_z = rbf_lift(hx, stats0.centers, stats0.gamma,
                          stats0.rbf_weights)[0]
        first = idx == 0
        s = empty._replace(
            prev_z=jnp.where(first, stats0.prev_z, halo_z),
            prev_u=hu[0],
            prev_valid=jnp.where(first, stats0.prev_valid,
                                 jnp.ones((), dtype)),
        )
        s = streaming_scan(s, X_loc, U_loc, chunk, lam)
        # every shard downstream of this one adds m pairs
        decay = lam ** (((S - 1) - idx) * m).astype(dtype)
        return (
            jax.lax.psum(s.gram * decay, data_axis),
            jax.lax.psum(s.rhs * decay, data_axis),
            jax.lax.psum(s.weight_sum * decay, data_axis),
        )

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P()),
        # the scan carry mixes replicated constants (fresh accumulator
        # zeros, streaming_update's constant prev_valid) with
        # shard-varying data; the collective structure is the three
        # final psums, so skip the varying-axes check
        check_vma=False,
    )
    gram, rhs, wsum = jax.jit(fn)(X, U, halo_X, halo_U)
    n_new = (N - 1) + stats0.prev_valid  # pairs added by this call
    carry_decay = lam ** n_new
    prev_z = rbf_lift(X[-1:], stats0.centers, stats0.gamma,
                      stats0.rbf_weights)[0]
    return stats0._replace(
        gram=carry_decay * stats0.gram + gram,
        rhs=carry_decay * stats0.rhs + rhs,
        weight_sum=carry_decay * stats0.weight_sum + wsum,
        prev_z=prev_z,
        prev_u=U[-1],
        prev_valid=jnp.ones((), dtype),
    )


def sharded_ekf_bank(
    mesh: Mesh,
    step: Callable,
    h: Callable,
    Q,
    R,
    m0,
    P0,
    U,
    Y,
    data_axis: str = "data",
    residual: Callable | None = None,
):
    """Bank of independent EKFs, one per trajectory, sharded over the mesh.

    ``U`` is ``(B, T-1, r)``, ``Y`` is ``(B, T, m)``, ``m0`` is ``(B, n)``
    (per-trajectory prior mean); ``Q/R/P0`` are shared.  Each filter is the
    exact single-trajectory :func:`~bluerov2_dynamics_tpu.models.estimation.ekf`
    (vmapped), and the batch is GSPMD-sharded over ``data_axis`` — the
    filters are embarrassingly parallel, so XLA partitions the vmapped scan
    with no cross-device communication until the caller reduces.

    Equality vs the single-device filter is pinned by
    ``tests/test_parallel.py``; exercised by the driver dryrun.
    """
    from bluerov2_dynamics_tpu.models.estimation import ekf

    U = jnp.asarray(U)
    Y = jnp.asarray(Y)
    m0 = jnp.asarray(m0)
    if Y.shape[1] != U.shape[1] + 1:
        raise ValueError(
            f"U must have T-1={Y.shape[1] - 1} transition inputs per "
            f"trajectory, got {U.shape[1]}"
        )
    batch = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    # Inputs enter replicated and the batch is constrained inside the jit
    # (the module's standard non-divisible-batch pattern, cf.
    # sharded_endpoint_rmse); GSPMD pads uneven shards internally.
    @partial(jax.jit, in_shardings=(repl, repl, repl))
    def run(m0, U, Y):
        m0 = jax.lax.with_sharding_constraint(m0, batch)
        U = jax.lax.with_sharding_constraint(U, batch)
        Y = jax.lax.with_sharding_constraint(Y, batch)
        return jax.vmap(
            lambda m0_b, U_b, Y_b: ekf(step, h, Q, R, m0_b, P0, U_b, Y_b,
                                       residual=residual)
        )(m0, U, Y)

    return run(m0, U, Y)


def sharded_pf_bank(
    mesh: Mesh,
    step: Callable,
    h: Callable,
    Q,
    R,
    m0,
    P0,
    U,
    Y,
    key,
    n_particles: int = 1024,
    data_axis: str = "data",
    ess_frac: float = 0.5,
    residual: Callable | None = None,
):
    """Bank of bootstrap particle filters, one per trajectory, sharded.

    Same contract as :func:`sharded_ekf_bank` plus ``key``/
    ``n_particles``: each trajectory runs the exact single-trajectory
    :func:`~bluerov2_dynamics_tpu.models.estimation.particle_filter`
    with its own ``fold_in(key, trajectory_index)`` stream, so the
    result is bit-comparable to the same vmapped bank on one device
    regardless of how the batch is sharded (pinned by
    ``tests/test_parallel.py``; exercised by the driver dryrun).  The
    compute is (B x N_particles)-parallel — two nested batch axes the
    partitioner splits freely over ``data_axis``.
    """
    from bluerov2_dynamics_tpu.models.estimation import particle_filter

    U = jnp.asarray(U)
    Y = jnp.asarray(Y)
    m0 = jnp.asarray(m0)
    if Y.shape[1] != U.shape[1] + 1:
        raise ValueError(
            f"U must have T-1={Y.shape[1] - 1} transition inputs per "
            f"trajectory, got {U.shape[1]}"
        )
    batch = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    idx = jnp.arange(m0.shape[0], dtype=jnp.uint32)

    @partial(jax.jit, in_shardings=(repl, repl, repl, repl))
    def run(m0, U, Y, idx):
        m0 = jax.lax.with_sharding_constraint(m0, batch)
        U = jax.lax.with_sharding_constraint(U, batch)
        Y = jax.lax.with_sharding_constraint(Y, batch)
        idx = jax.lax.with_sharding_constraint(idx, batch)
        return jax.vmap(
            lambda m0_b, U_b, Y_b, i: particle_filter(
                step, h, Q, R, m0_b, P0, U_b, Y_b,
                n_particles=n_particles, key=jax.random.fold_in(key, i),
                ess_frac=ess_frac, residual=residual)
        )(m0, U, Y, idx)

    return run(m0, U, Y, idx)
