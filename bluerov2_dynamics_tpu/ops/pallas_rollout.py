"""Pallas TPU kernel: full multi-step Fossen rollout resident in VMEM.

The XLA `lax.scan` rollout (bench.py) round-trips the state carry through
HBM every step; at 12+24 floats per trajectory that carry traffic — not
compute — bounds throughput.  This kernel keeps each trajectory's state in
VMEM for the ENTIRE T-step rollout: HBM traffic is one read of x0 and one
write of x_T per trajectory, plus the tiny shared input sequence.

Scope: the shared-input batched rollout — exactly the shape of the
reference's endpoint evaluator and simulation workloads (one recorded
input trajectory driving many rollout starts,
``train_tank_brov2_full_comparison.py:469-487``).  The thruster lag filter
is driven by the shared inputs, so the per-step body wrench ``tau_seq``
(T, 6) is precomputed exactly by the canonical lag scan and read from SMEM
inside the kernel.

All physical constants are baked into the kernel as compile-time floats;
the loop body is pure VPU work on ``(12, BLOCK_B)`` tiles.  Parity with the
canonical step is tested in tests/test_pallas_rollout.py (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bluerov2_dynamics_tpu.models.params import FossenParams, LagParams, ThrusterConfig
from bluerov2_dynamics_tpu.models.thrusters import lag_step, static_thrust, wrench_from_thrust


def shared_tau_sequence(cfg: ThrusterConfig, lag: LagParams, U, use_lag: bool = True):
    """Exact per-step body wrench for a shared command sequence ``U`` (T, 8).

    One tiny ``lax.scan`` through the lag filter — identical numerics to
    the per-step path inside ``make_thruster_step``.
    """
    if not use_lag:
        return wrench_from_thrust(cfg, static_thrust(cfg, U))

    def body(state, u8):
        state, F = lag_step(lag, state, static_thrust(cfg, u8))
        return state, wrench_from_thrust(cfg, F)

    _, tau = jax.lax.scan(body, jnp.zeros((8, 3), U.dtype), U)
    return tau


def _scalar(x) -> float:
    return float(jax.device_get(x))


def _make_hydro_rows(p: FossenParams):
    """Shared hydrodynamics of the euler12 AND quat13 row RHSs.

    Everything the two state conventions have in common — the constants
    prologue, Coriolis, current-relative damping, DCM-row restoring,
    nu_dot assembly and linear-velocity kinematics — factored to one
    copy (the ocean-current feature once had to be added to both RHSs
    by hand).  Returns ``hydro(R, nu, tau) -> ((px, py, pz),
    (nd0..nd5))`` where ``R`` is the 9-tuple of ``R_{b->n}`` entries
    (row-major; the euler caller passes ``r20 = -sin(theta)``, an exact
    negation, so results are bit-identical to the previous inline forms)
    and ``nu = (u, v, w, p, q, r)`` body velocities as (B,) rows.
    """
    mdiag = [_scalar(v) for v in p.mdiag]
    minv = [_scalar(v) for v in p.minv]
    added = [_scalar(v) for v in p.added]
    gyro = [_scalar(v) for v in p.gyro]
    d_lin = [_scalar(v) for v in p.d_lin]
    d_quad = [_scalar(v) for v in p.d_quad]
    W = _scalar(p.W)
    Bf = _scalar(p.B)
    xb, yb, zb = (_scalar(v) for v in p.cb)
    WB = W - Bf
    xbB, ybB, zbB = xb * Bf, yb * Bf, zb * Bf
    Xud, Yvd, Zwd = added[0], added[1], added[2]
    cur = [_scalar(v) for v in jnp.broadcast_to(p.current, (3,))]
    has_current = any(c != 0.0 for c in cur)
    cnx, cny, cnz = cur

    def hydro(R, nu, tau):
        r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
        u, v, w, pp, q, r = nu

        c0 = mdiag[2] * w * q - mdiag[1] * v * r
        c1 = -mdiag[2] * w * pp + mdiag[0] * u * r
        c2 = mdiag[1] * v * pp - mdiag[0] * u * q
        c3 = gyro[0] * q * r + (Yvd - Zwd) * v * w
        c4 = gyro[1] * pp * r + (Zwd - Xud) * u * w
        c5 = gyro[2] * pp * q + (Xud - Yvd) * u * v

        if has_current:
            # v_c^b = R^T v_c^n; nu_r on linear DOFs, damping is the only
            # consumer (fossen/BlueROV2.py:376-378)
            ur = u - (r00 * cnx + r10 * cny + r20 * cnz)
            vr = v - (r01 * cnx + r11 * cny + r21 * cnz)
            wr = w - (r02 * cnx + r12 * cny + r22 * cnz)
        else:
            ur, vr, wr = u, v, w
        d0 = (d_lin[0] + d_quad[0] * jnp.abs(ur)) * ur
        d1 = (d_lin[1] + d_quad[1] * jnp.abs(vr)) * vr
        d2 = (d_lin[2] + d_quad[2] * jnp.abs(wr)) * wr
        d3 = (d_lin[3] + d_quad[3] * jnp.abs(pp)) * pp
        d4 = (d_lin[4] + d_quad[4] * jnp.abs(q)) * q
        d5 = (d_lin[5] + d_quad[5] * jnp.abs(r)) * r

        # third DCM row: sin(theta) = -r20, cth*sphi = r21, cth*cphi = r22
        sth = -r20
        g0 = WB * sth
        g1 = -WB * r21
        g2 = -WB * r22
        g3 = ybB * r22 - zbB * r21
        g4 = -zbB * sth - xbB * r22
        g5 = xbB * r21 + ybB * sth

        nd0 = (tau[0] - c0 - d0 - g0) * minv[0]
        nd1 = (tau[1] - c1 - d1 - g1) * minv[1]
        nd2 = (tau[2] - c2 - d2 - g2) * minv[2]
        nd3 = (tau[3] - c3 - d3 - g3) * minv[3]
        nd4 = (tau[4] - c4 - d4 - g4) * minv[4]
        nd5 = (tau[5] - c5 - d5 - g5) * minv[5]

        px = r00 * u + r01 * v + r02 * w
        py = r10 * u + r11 * v + r12 * w
        pz = r20 * u + r21 * v + r22 * w

        return (px, py, pz), (nd0, nd1, nd2, nd3, nd4, nd5)

    return hydro


def _make_rhs_rows(p: FossenParams):
    """Closed-form euler12 RHS with all coefficients as Python floats.

    Same math as ``fossen.wrench_rhs_euler``, INCLUDING the constant NED
    ocean current (``fossen/BlueROV2.py:376-378``): the current is rotated
    to body frame per state with the R rows already computed here, and the
    relative velocity enters the damping on the linear DOFs only.  A zero
    current (the default) bakes to exactly the previous arithmetic.

    **State representation: a 12-tuple of (B,) row vectors**, NOT a
    stacked (12, B) array.  On TPU a (B,) vector is already in the native
    (8, 128) vreg layout, while every row extraction from / stack into a
    (12, B) tile is a sublane relayout — keeping the RK4 stages entirely
    in rows made the rollout kernel 3.3x faster (bit-identical results).
    ``tau`` is a 6-sequence of scalars or (B,) vectors (broadcasting).
    """
    hydro = _make_hydro_rows(p)

    def rhs(x, tau):
        phi, theta, psi = x[3], x[4], x[5]
        nu = (x[6], x[7], x[8], x[9], x[10], x[11])
        pp, q, r = nu[3], nu[4], nu[5]

        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

        R = (
            cpsi * cth,
            -spsi * cphi + cpsi * sth * sphi,
            spsi * sphi + cpsi * cphi * sth,
            spsi * cth,
            cpsi * cphi + sphi * sth * spsi,
            -cpsi * sphi + sth * spsi * cphi,
            -sth,  # r20 = -sin(theta); negation is exact, so the shared
            cth * sphi,  # hydro's sth = -r20 round-trips bit-identically
            cth * cphi,
        )
        (px, py, pz), nd = hydro(R, nu, tau)

        eps = 1e-7
        sign = jnp.where(cth < 0.0, -1.0, 1.0)
        cth_c = jnp.where(jnp.abs(cth) < eps, eps * sign, cth)
        tth = sth / cth_c
        dphi = pp + sphi * tth * q + cphi * tth * r
        dtheta = cphi * q - sphi * r
        dpsi = (sphi * q + cphi * r) / cth_c

        return (px, py, pz, dphi, dtheta, dpsi) + nd

    return rhs


def _rk4_rows(rhs, xs, tau, dt, method):
    """One integrator step on the 12-tuple row state (no relayouts)."""
    if method not in ("euler", "rk4"):
        # mirror fossen._STEPPERS[method]'s KeyError: a typo ("Euler",
        # "rk2") must not silently integrate with RK4 while the XLA-scan
        # twin raises — that would change blessed numbers with no error
        raise ValueError(f"unknown method {method!r}; use 'euler' or 'rk4'")
    if method == "euler":
        k1 = rhs(xs, tau)
        return tuple(x + dt * k for x, k in zip(xs, k1))
    k1 = rhs(xs, tau)
    k2 = rhs(tuple(x + (0.5 * dt) * k for x, k in zip(xs, k1)), tau)
    k3 = rhs(tuple(x + (0.5 * dt) * k for x, k in zip(xs, k2)), tau)
    k4 = rhs(tuple(x + dt * k for x, k in zip(xs, k3)), tau)
    return tuple(
        x + (dt / 6.0) * (a + 2.0 * b + 2.0 * c + d)
        for x, a, b, c, d in zip(xs, k1, k2, k3, k4)
    )


def make_rollout_final_pallas(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    dt: float,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    use_lag: bool = True,
):
    """Build a jitted ``fn(x0, U) -> xT`` VMEM-resident rollout.

    ``x0``: ``(B, 12)`` (B divisible by ``min(block_b, B)`` — small
    batches run as one block); ``U``: ``(T, 8)``
    shared commands.  The physical constants are extracted eagerly here
    (compile-time floats), so the returned function is jit/trace-safe.

    The T-step loop carries the state as a 12-tuple of (block_b,) rows —
    native vreg layout, zero sublane relayouts inside the loop (the
    stacked (12, B) carry paid 4 row-extracts + 4 stacks per RK4 step and
    ran 3.3x slower at identical numerics).  The (12, B) array form only
    exists at the block boundaries (one read, one write).  Default block
    2048 from the round-4 measured alternating A/B (1.29-1.32e9 steps/s
    vs 1.20-1.26e9 at 1024 on v5e; 4096 slightly below 2048).
    """
    rhs = _make_rhs_rows(p)

    def kernel_factory(T):
        def kernel(tau_ref, x_ref, out_ref):
            xs = tuple(x_ref[i] for i in range(12))

            def body(t, xs):
                tau = tuple(tau_ref[t, j] for j in range(6))
                return _rk4_rows(rhs, xs, tau, dt, method)

            xs = jax.lax.fori_loop(0, T, body, xs)
            for i in range(12):
                out_ref[i] = xs[i]

        return kernel

    @jax.jit
    def fn(x0, U):
        B = x0.shape[0]
        T = U.shape[0]
        bb = min(block_b, B)  # small batches: one block (keeps B=1024
        # etc. working under the 2048 default)
        assert B % bb == 0, f"B={B} not divisible by block_b={bb}"
        tau_seq = shared_tau_sequence(cfg, lag, U.astype(jnp.float32), use_lag)
        out = pl.pallas_call(
            kernel_factory(T),
            out_shape=jax.ShapeDtypeStruct((12, B), x0.dtype),
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # tau_seq (T, 6)
                pl.BlockSpec(
                    (12, bb), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (12, bb), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(tau_seq, x0.T)
        return out.T

    return fn


def rollout_final_pallas(
    p: FossenParams,
    cfg: ThrusterConfig,
    lag: LagParams,
    x0,
    U,
    dt: float,
    method: str = "rk4",
    block_b: int = 2048,
    interpret: bool = False,
    use_lag: bool = True,
):
    """One-shot convenience wrapper around :func:`make_rollout_final_pallas`."""
    fn = make_rollout_final_pallas(
        p, cfg, lag, dt, method=method, block_b=block_b,
        interpret=interpret, use_lag=use_lag,
    )
    return fn(x0, U)
