"""Pallas TPU kernels for the QUATERNION-state wrench-input model.

Completes the VMEM kernel family across the three state conventions
(euler12 thruster-input: :mod:`pallas_rollout` / :mod:`pallas_eval`;
euler12 wrench-input: :mod:`pallas_eval`; quat13 wrench-input: here).
Reference semantics: ``fossen/BlueROV2_wrench.py:141-367`` — quaternion
normalized on every RHS entry, restoring wrench from the third DCM row,
post-step renormalization as in ``train_tank_brov2_wrench_quat.py:262-265``.

Same layout discipline as the euler kernels: the 13-state is carried as a
tuple of (B,) row vectors (native vreg layout — a stacked (13, B) tile
pays a sublane relayout per row extract/stack; see
``pallas_rollout._make_rhs_rows``).  The quaternion path is trig-free
(polynomial kinematics + one rsqrt-class op per normalize), so it is not
bounded by transcendental throughput like the Euler kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bluerov2_dynamics_tpu.models.params import FossenParams
from bluerov2_dynamics_tpu.ops.pallas_rollout import _make_hydro_rows

_NORM_EPS = 1e-12  # matches ops.quaternion._NORM_EPS


def _normalize_q_rows(qw, qx, qy, qz):
    """Row-wise quat normalize with the identity fallback of
    ``ops.quaternion.quat_normalize``.

    One ``rsqrt`` on the squared norm instead of ``sqrt`` + ``div``;
    the fallback is expressed as a masked inverse (0 for small norms, so
    qx*inv vanishes) plus an additive indicator on qw — 3 selects/
    compares instead of 6, same results as the sqrt/div form to f32
    rounding (kernel parity tests unchanged at atol 2e-5).  Audited
    step budget drops 872+5div+5sqrt+62cheap -> 877+5rsqrt+47cheap; an
    interleaved on-chip A/B of the two forms was NOT separable from the
    tunnel's run-to-run spread (medians 1.76 vs 1.84 e9, trials
    1.44-2.10 e9 both ways) — the form is kept for the smaller op
    budget and the measured-ceiling accounting, not a claimed speedup."""
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    small = n2 < _NORM_EPS * _NORM_EPS
    inv = jnp.where(small, 0.0, jax.lax.rsqrt(n2))
    one_if_small = jnp.where(small, 1.0, 0.0)
    return (
        qw * inv + one_if_small,
        qx * inv,
        qy * inv,
        qz * inv,
    )


def _make_rhs_quat_rows(p: FossenParams):
    """quat13 wrench-input RHS on the 13-tuple row state.

    Rows: ``(x, y, z, qw, qx, qy, qz, u, v, w, p, q, r)``; ``tau`` is a
    6-sequence of scalars or (B,) vectors.  Hydrodynamics shared with
    the euler12 rows RHS via ``pallas_rollout._make_hydro_rows`` (one
    copy of the Coriolis/damping/restoring/current terms); kinematics
    and restoring via the quaternion (``fossen.wrench_rhs_quat``).
    """
    hydro = _make_hydro_rows(p)

    def rhs(x, tau):
        qw, qx, qy, qz = _normalize_q_rows(x[3], x[4], x[5], x[6])
        nu = (x[7], x[8], x[9], x[10], x[11], x[12])
        pp, q, r = nu[3], nu[4], nu[5]

        # R_{b->n}(q) entries (reused for kinematics, restoring, current)
        R = (
            1.0 - 2.0 * (qy * qy + qz * qz),
            2.0 * (qx * qy - qz * qw),
            2.0 * (qx * qz + qy * qw),
            2.0 * (qx * qy + qz * qw),
            1.0 - 2.0 * (qx * qx + qz * qz),
            2.0 * (qy * qz - qx * qw),
            2.0 * (qx * qz - qy * qw),
            2.0 * (qy * qz + qx * qw),
            1.0 - 2.0 * (qx * qx + qy * qy),
        )
        (px, py, pz), nd = hydro(R, nu, tau)

        qdw = 0.5 * (-qx * pp - qy * q - qz * r)
        qdx = 0.5 * (qw * pp + qy * r - qz * q)
        qdy = 0.5 * (qw * q - qx * r + qz * pp)
        qdz = 0.5 * (qw * r + qx * q - qy * pp)

        return (px, py, pz, qdw, qdx, qdy, qdz) + nd

    return rhs


def _quat_step_rows(rhs, xs, tau, dt, method, renormalize):
    """One integrator step + optional post-step quat renorm on rows."""
    from bluerov2_dynamics_tpu.ops.pallas_rollout import _rk4_rows

    xs = _rk4_rows(rhs, xs, tau, dt, method)
    if renormalize:
        qw, qx, qy, qz = _normalize_q_rows(xs[3], xs[4], xs[5], xs[6])
        xs = xs[:3] + (qw, qx, qy, qz) + xs[7:]
    return xs


def make_endpoint_final_pallas_quat(
    p: FossenParams,
    dt: float,
    H: int,
    method: str = "euler",
    block_b: int = 2048,
    interpret: bool = False,
    renormalize: bool = True,
):
    """Build ``fn(X, TAU) -> final_states`` for the quat13 wrench model.

    ``X``: ``(N, 13)`` recorded states; ``TAU``: ``(N, 6)``; returns the
    ``(N-H, 13)`` endpoint states of all sliding-window rollouts.  Same
    VMEM structure as the euler evaluators (grid (blocks, H), state in
    scratch persisting over the time dimension, pre-shifted inputs).

    ``block_b=2048`` from the round-5 chained on-chip sweep (H=100) at
    the REAL app shapes (padding to a block multiple priced in — an
    earlier sweep at block-multiple shapes hid it and picked 4096,
    which loses 23% at 44,800 starts): useful steps/s
    6.1/10.0/10.3/13.4/**13.9** e8 at 256/512/1024/2048/4096 on 9,165
    starts; 8.6/13.5/16.8/**22.6**/18.4 e8 on 44,800.  The per-shape
    optima differ (4096 small by +4%, 2048 large by +23%); 2048 is the
    minimax-regret single default.
    """
    from bluerov2_dynamics_tpu.ops.pallas_eval import make_window_eval_fn

    kernel = _make_quat_window_kernel(p, dt, method, renormalize)
    return make_window_eval_fn(
        kernel, n_state=13, n_in=6, H=H, block_b=block_b,
        scratch_shapes=lambda b: [pltpu.VMEM((13, b), jnp.float32)],
        interpret=interpret,
    )


def _make_quat_window_kernel(p: FossenParams, dt: float, method: str,
                             renormalize: bool):
    """Sliding-window kernel body for the quat13 wrench model (shared by
    the single-device evaluator above and the shard_map composition in
    ``parallel/sharded.py``)."""
    rhs = _make_rhs_quat_rows(p)

    def kernel(tau_ref, x_ref, out_ref, x_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_scr[:] = x_ref[:]

        tau = tuple(tau_ref[0, j] for j in range(6))
        xs = tuple(x_scr[i] for i in range(13))
        xs = _quat_step_rows(rhs, xs, tau, dt, method, renormalize)
        for i in range(13):
            x_scr[i] = xs[i]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = x_scr[:]

    return kernel


def make_rollout_final_pallas_quat(
    p: FossenParams,
    dt: float,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    renormalize: bool = True,
):
    """Build ``fn(x0, TAU_seq) -> xT``: whole quat13 rollout in VMEM under
    a shared wrench sequence.  ``x0``: ``(B, 13)`` (B divisible by
    ``min(block_b, B)`` — small batches run as one block);
    ``TAU_seq``: ``(T, 6)``.  Trig-free — not bounded by
    transcendental throughput like the euler12 kernel; the round-4
    measured block sweep picked 2048 (2.18e9 steps/s vs 1.99e9 at 1024,
    1.29e9 at 512 on v5e — see ``bench.py --full`` roofline rows).
    """
    rhs = _make_rhs_quat_rows(p)

    def kernel_factory(T):
        def kernel(tau_ref, x_ref, out_ref):
            xs = tuple(x_ref[i] for i in range(13))

            def body(t, xs):
                tau = tuple(tau_ref[t, j] for j in range(6))
                return _quat_step_rows(rhs, xs, tau, dt, method, renormalize)

            xs = jax.lax.fori_loop(0, T, body, xs)
            for i in range(13):
                out_ref[i] = xs[i]

        return kernel

    @jax.jit
    def fn(x0, TAU):
        B = x0.shape[0]
        T = TAU.shape[0]
        bb = min(block_b, B)  # small batches: one block
        assert B % bb == 0, f"B={B} not divisible by block_b={bb}"
        out = pl.pallas_call(
            kernel_factory(T),
            out_shape=jax.ShapeDtypeStruct((13, B), x0.dtype),
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (T, 6) wrenches
                pl.BlockSpec((13, bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((13, bb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(TAU.astype(x0.dtype), x0.T)
        return out.T

    return fn
