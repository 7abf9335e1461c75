"""Pallas TPU kernel: sliding-window endpoint evaluation in VMEM.

The endpoint H-step metric advances all N-H rollout starts simultaneously;
the XLA scan version (:func:`..eval.metrics.endpoint_rmse_carry`) round-
trips the (n_start, 12) state batch plus the (n_start, 8, 3) lag batch
through HBM every one of the H steps.  This kernel keeps a block of starts
(state + lag filters) in **VMEM scratch that persists across the time
dimension of the grid**: the grid is (start_blocks, H), the per-step input
window arrives as an aligned pipelined block of a pre-shifted input tensor
``U_shift[t] = U[t : t+n_start]`` (built once by XLA; Mosaic cannot issue
lane-unaligned dynamic vector loads, so the sliding window is materialised
shifted instead of sliced in-kernel).

HBM traffic: start states in, endpoint states out, plus one streamed pass
over the (H, 8, n_start) shifted inputs.  Physical and lag constants are
baked at build time.  Parity with the scan evaluator is tested in
tests/test_pallas_eval.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bluerov2_dynamics_tpu.models.params import FossenParams, LagParams, ThrusterConfig
from bluerov2_dynamics_tpu.ops.pallas_rollout import (
    _make_rhs_rows,
    _rk4_rows,
    _scalar,
)


def _make_thruster_window_kernel(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    method: str = "rk4",
    use_lag: bool = True,
):
    """Shared kernel body: one grid step of the sliding-window thruster-
    input rollout (state + lag filters in VMEM scratch persisting over the
    time dimension of the grid).  Used by the single-device evaluator and
    the shard_map-sharded variant.

    Layout: the RK4 stages run on the 12-tuple row representation
    (:func:`.pallas_rollout._make_rhs_rows` — native vreg layout, no
    per-stage sublane relayouts); the lag filter stays on aligned
    (8, block) slabs (already relayout-free).  Rows are extracted from /
    written to the (12, block) scratch once per grid step.
    """
    rhs = _make_rhs_rows(p)
    # constants baked as (nested) Python floats — numpy f64 scalars would
    # promote the f32 kernel carry under jax_enable_x64
    c1, c3, c5, c7, c9 = (_scalar(cfg.curve[i]) for i in range(5))
    Wm = np.asarray(jax.device_get(cfg.wrench_map), np.float64).tolist()  # (8, 6)
    Ad = np.asarray(jax.device_get(lag.Ad), np.float64).tolist()
    Bd = np.asarray(jax.device_get(lag.Bd), np.float64).tolist()
    cl = np.asarray(jax.device_get(lag.c), np.float64).tolist()

    def kernel(u_ref, x_ref, out_ref, x_scr, l_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_scr[:] = x_ref[:]
            l_scr[:] = jnp.zeros_like(l_scr)

        u = u_ref[0]                     # (8, block_b)
        u2 = u * u
        F_cmd = u * (c1 + u2 * (c3 + u2 * (c5 + u2 * (c7 + u2 * c9))))
        if use_lag:
            L = l_scr[:]                 # (3, 8, block_b)
            N0 = Ad[0][0] * L[0] + Ad[0][1] * L[1] + Ad[0][2] * L[2] + Bd[0] * F_cmd
            N1 = Ad[1][0] * L[0] + Ad[1][1] * L[1] + Ad[1][2] * L[2] + Bd[1] * F_cmd
            N2 = Ad[2][0] * L[0] + Ad[2][1] * L[1] + Ad[2][2] * L[2] + Bd[2] * F_cmd
            F = cl[0] * N0 + cl[1] * N1 + cl[2] * N2
            l_scr[:] = jnp.stack([N0, N1, N2])
        else:
            F = F_cmd
        Frows = tuple(F[j] for j in range(8))
        tau = tuple(
            sum(Wm[j][i] * Frows[j] for j in range(8) if Wm[j][i] != 0.0)
            for i in range(6)
        )
        xs = tuple(x_scr[i] for i in range(12))
        xs = _rk4_rows(rhs, xs, tau, dt, method)
        for i in range(12):
            x_scr[i] = xs[i]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = x_scr[:]

    return kernel


def window_pallas_call(kernel, n_state: int, n_in: int, bb: int,
                       n_pad: int, H: int, scratch_shapes, interpret: bool):
    """The pallas_call of the sliding-window evaluator — ONE copy of the
    grid/BlockSpec layout shared by the single-device driver below and
    the shard_map composition in ``parallel/sharded.py`` (which differs
    only in how it slices its shifted inputs).  Takes ``u_shift``
    ``(H, n_in, n_pad)`` and ``x0`` ``(n_state, n_pad)``; returns the
    ``(n_state, n_pad)`` endpoint states."""
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_state, n_pad), jnp.float32),
        grid=(n_pad // bb, H),
        in_specs=[
            pl.BlockSpec((1, n_in, bb), lambda i, t: (t, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, bb), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_state, bb), lambda i, t: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes(bb),
        interpret=interpret,
    )


def make_window_eval_fn(kernel, n_state: int, n_in: int, H: int,
                        block_b: int, scratch_shapes, interpret: bool):
    """Shared sliding-window driver for the endpoint-evaluator kernels.

    One implementation of the padding / pre-shifted-input / pallas_call
    scaffolding for all state conventions (euler12 thruster, euler12
    wrench, quat13 wrench — the kernel body and the shapes are the only
    things that differ).  ``kernel`` has signature
    ``(in_ref, x_ref, out_ref, *scratch)``; ``scratch_shapes`` is a
    callable ``block_b -> [pltpu.VMEM shapes]``.

    Returns ``fn(X, U) -> (N-H, n_state)`` endpoint states.
    """

    @jax.jit
    def fn(X, U):
        N = X.shape[0]
        n_start = N - H
        assert n_start > 0, f"horizon H={H} >= dataset length {N}"
        # shape validation: the BlockSpecs below would otherwise silently
        # truncate a too-wide U/X (e.g. an (N, 8) thruster-command array
        # fed to the 6-wrench evaluator reads only its first 6 columns)
        # and zero-pad a too-short U (tail windows integrating zero input)
        assert X.ndim == 2 and X.shape[1] == n_state, (
            f"X must be (N, {n_state}), got {X.shape}")
        assert U.ndim == 2 and U.shape[1] == n_in, (
            f"U must be (N, {n_in}), got {U.shape}")
        assert U.shape[0] >= N, (
            f"U has {U.shape[0]} rows < X's {N}; every window start needs "
            f"H={H} inputs")
        n_pad = -(-n_start // block_b) * block_b
        x0 = X[:n_start].T.astype(jnp.float32)        # (n_state, n_start)
        if n_pad != n_start:
            x0 = jnp.pad(x0, ((0, 0), (0, n_pad - n_start)))
        ut = U.T.astype(jnp.float32)                   # (n_in, N)
        if n_pad + H > U.shape[0]:
            ut = jnp.pad(ut, ((0, 0), (0, n_pad + H - U.shape[0])))
        # shifted input windows: U_shift[t] = inputs for inner step t of all
        # starts — aligned blocks for the kernel's pipelined loads (Mosaic
        # cannot issue lane-unaligned dynamic vector loads in-kernel)
        u_shift = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(ut, t, n_pad, axis=1) for t in range(H)]
        )  # (H, n_in, n_pad)
        out = window_pallas_call(kernel, n_state, n_in, block_b, n_pad, H,
                                 scratch_shapes, interpret)(u_shift, x0)
        return out[:, :n_start].T

    return fn


def make_endpoint_final_pallas(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    H: int,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    use_lag: bool = True,
):
    """Build ``fn(X, U) -> final_states`` for the thruster-input model.

    ``X``: ``(N, 12)`` recorded states, ``U``: ``(N, 8)`` recorded inputs;
    returns the ``(N-H, 12)`` endpoint states of all sliding-window
    rollouts (fresh zero lag state per start).  Feed into
    ``rmse(X[H:], final)`` for the metric.

    ``block_b=2048`` from the round-5 chained on-chip sweep
    (``bench.py --section window_blocks``, H=100) at the REAL app
    shapes, so the padding to a block multiple is priced in (9,165
    starts — the test split's row count; the app itself runs rows-H =
    9,065 starts, an identical padding class — pad 34% dead rows at
    block 4096), with ``method="euler"`` — the step every app actually
    runs (an earlier sweep used this factory's rk4 default and tuned
    1024).  Two independent euler captures agree 2048 wins or ties both
    shapes: useful steps/s 5.8-8.8 e8 at 1024 vs **7.1-10.3 e8** at
    2048 on 9,165 starts, 6.7-14.8 e8 vs **10.6-15.4 e8** on 44,800
    (4096 flips run to run and pays the padding at 9,165).
    """
    kernel = _make_thruster_window_kernel(p, cfg, lag, dt, method, use_lag)
    return make_window_eval_fn(
        kernel, n_state=12, n_in=8, H=H, block_b=block_b,
        scratch_shapes=lambda b: [pltpu.VMEM((12, b), jnp.float32),
                                  pltpu.VMEM((3, 8, b), jnp.float32)],
        interpret=interpret,
    )


def make_endpoint_final_pallas_wrench(
    p: FossenParams,
    dt: float,
    H: int,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
):
    """Build ``fn(X, TAU) -> final_states`` for the WRENCH-input model.

    Same VMEM-resident sliding-window structure as
    :func:`make_endpoint_final_pallas`, but the recorded input is a direct
    6-D body wrench (the T3 workload's physics baseline,
    ``fossen/BlueROV2_thrust.py:235-282``): no thruster curve, no lag
    filter, no lag scratch.  ``X``: ``(N, 12)``; ``TAU``: ``(N, 6)``;
    returns the ``(N-H, 12)`` endpoint states.  RK4 stages run on the
    row representation (see :func:`_make_thruster_window_kernel`).

    ``block_b=2048`` from the round-5 chained on-chip sweep (H=100) at
    the REAL app shapes (padding priced in — an earlier sweep at
    block-multiple shapes hid it and picked 4096, which loses 14% at
    9,165 starts): useful steps/s 3.8/6.5/**9.0**/8.7/7.7 e8 at
    256/512/1024/2048/4096 on 9,165 starts; 4.2/7.2/11.2/12.1/**13.0**
    e8 on 44,800.  The per-shape optima differ (1024 small, 4096
    large); 2048 is the minimax-regret single default, within 3-7% of
    the best at both shapes.
    """
    kernel = _make_wrench_window_kernel(p, dt, method)
    return make_window_eval_fn(
        kernel, n_state=12, n_in=6, H=H, block_b=block_b,
        scratch_shapes=lambda b: [pltpu.VMEM((12, b), jnp.float32)],
        interpret=interpret,
    )


def _make_wrench_window_kernel(p: FossenParams, dt: float, method: str):
    """Sliding-window kernel body for the wrench-input euler12 model
    (shared by the single-device evaluator above and the shard_map
    composition in ``parallel/sharded.py``)."""
    rhs = _make_rhs_rows(p)

    def kernel(tau_ref, x_ref, out_ref, x_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_scr[:] = x_ref[:]

        tau = tuple(tau_ref[0, j] for j in range(6))
        xs = tuple(x_scr[i] for i in range(12))
        xs = _rk4_rows(rhs, xs, tau, dt, method)
        for i in range(12):
            x_scr[i] = xs[i]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = x_scr[:]

    return kernel


def endpoint_rmse_pallas(p, cfg, lag, X, U, dt, H, **kw):
    """Convenience: endpoint H-step RMSE via the VMEM kernel."""
    from bluerov2_dynamics_tpu.eval.metrics import rmse

    fn = make_endpoint_final_pallas(p, cfg, lag, dt, H, **kw)
    final = fn(X, U)
    return rmse(X[H:].astype(jnp.float32), final)


def make_batched_rollout_pallas(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    method: str = "rk4",
    block_b: int = 1024,
    interpret: bool = False,
    use_lag: bool = True,
):
    """Build ``fn(x0, U) -> xT`` for PER-TRAJECTORY input sequences.

    ``x0``: ``(B, 12)``; ``U``: ``(T, B, 8)`` — each trajectory has its own
    commands (unlike :func:`..ops.pallas_rollout.make_rollout_final_pallas`,
    which shares one sequence across the batch).  Same VMEM-resident
    structure as the endpoint evaluator: grid (blocks, T), state + lag in
    scratch persisting over the time dimension, inputs streamed as aligned
    pipelined blocks.
    """
    kernel = _make_thruster_window_kernel(p, cfg, lag, dt, method, use_lag)

    @jax.jit
    def fn(x0, U):
        B = x0.shape[0]
        T = U.shape[0]
        assert U.shape[1] == B and U.shape[2] == 8, "U must be (T, B, 8)"
        b_pad = -(-B // block_b) * block_b
        x0_t = x0.T.astype(jnp.float32)
        ut = jnp.swapaxes(U, 1, 2).astype(jnp.float32)  # (T, 8, B)
        if b_pad != B:
            x0_t = jnp.pad(x0_t, ((0, 0), (0, b_pad - B)))
            ut = jnp.pad(ut, ((0, 0), (0, 0), (0, b_pad - B)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((12, b_pad), jnp.float32),
            grid=(b_pad // block_b, T),
            in_specs=[
                pl.BlockSpec((1, 8, block_b), lambda i, t: (t, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((12, block_b), lambda i, t: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((12, block_b), lambda i, t: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((12, block_b), jnp.float32),
                pltpu.VMEM((3, 8, block_b), jnp.float32),
            ],
            interpret=interpret,
        )(ut, x0_t)
        return out[:, :B].T

    return fn
