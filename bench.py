"""Headline benchmark: batched 6-DOF RK4 steps/second on one TPU chip.

Baseline (BASELINE.md): the reference's single-trajectory RK4 rollout runs
at ~851 steps/s on CPU (``training/best_results.txt:232-233``); the north
star is >= 1e7 batched RK4 steps/s on a single v5e chip.

The benchmarked step is the FULL flagship path per trajectory per step:
T200 static curve -> third-order thruster lag -> wrench map -> closed-form
Fossen hydrodynamics -> RK4 (4 RHS evaluations).  Primary path: the Pallas
VMEM-resident rollout kernel (state never round-trips HBM during the T-step
loop, ``bluerov2_dynamics_tpu/ops/pallas_rollout.py``); falls back to the
pure-XLA ``lax.scan`` rollout if the kernel is unavailable on the platform.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 851.0  # reference CPU single-trajectory RK4


def chained_steps_per_sec(f, x0, total_steps: int, iters: int):
    """The ONE timing discipline for device rollouts (CLAUDE.md: never
    time any other way on this platform): warm once, then chain ``iters``
    calls through a real data dependency (``x = f(x)``) and end the timed
    region with a scalar host readback — ``block_until_ready`` alone can
    return before the remote execution finishes (measured: 0.1 ms "per
    call" unchained vs 45 ms chained for an identical kernel).

    ``f(x) -> x`` must map the chained state to itself; returns
    ``(steps_per_sec, seconds_per_call)``.
    """
    x = f(x0)
    float(x[0, 0])  # warm (+ compile); readback forces real completion
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    float(x[0, 0])
    elapsed = (time.perf_counter() - t0) / iters
    return total_steps / elapsed, elapsed


def run_pallas(batch: int = 65536, T: int = 500, iters: int = 3,
               method: str = "rk4", block_b: int = 2048, repeats: int = 1):
    """Headline kernel throughput.  Returns a LIST of ``repeats``
    independent ``(steps_per_sec, seconds_per_call)`` measurements of the
    same compiled kernel (each one an ``iters``-deep chained timing
    region): the published headline is the MEDIAN of >=3 repeats, with the
    min..max band alongside — a single best-ever run is not reproducible
    on the tunnel (round-4 VERDICT weak-item 1: ~10% run-to-run band)."""
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )
    from bluerov2_dynamics_tpu.ops.pallas_rollout import make_rollout_final_pallas

    dt = 0.02
    p = fossen_params()
    cfg = thruster_config()
    lag = lag_params(dt)
    roll = make_rollout_final_pallas(p, cfg, lag, dt, method=method, block_b=block_b)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = 0.1 * jax.random.normal(k1, (batch, 12), jnp.float32)
    U = jnp.clip(0.5 * jax.random.normal(k2, (T, 8), jnp.float32), -1.0, 1.0)

    f = lambda x: roll(x, U)  # noqa: E731
    return [chained_steps_per_sec(f, x0, batch * T, iters)
            for _ in range(repeats)]


def run(batch: int = 16384, T: int = 500, iters: int = 5, method: str = "rk4"):
    from bluerov2_dynamics_tpu.models.fossen import make_thruster_step
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )

    dt = 0.02
    p = fossen_params()
    cfg = thruster_config()
    lag = lag_params(dt)
    step = make_thruster_step(p, cfg, lag, dt, method=method)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = 0.1 * jax.random.normal(k1, (batch, 12), jnp.float32)
    lag0 = jnp.zeros((batch, 8, 3), jnp.float32)
    # per-step shared random commands (streamed from HBM like recorded data)
    U = jnp.clip(0.5 * jax.random.normal(k2, (T, 8), jnp.float32), -1.0, 1.0)

    @jax.jit
    def rollout_final(x0, lag0, U):
        def body(carry, u):
            return step(carry, u), None

        (x, lag_state), _ = jax.lax.scan(body, (x0, lag0), U)
        return x

    return chained_steps_per_sec(
        lambda x: rollout_final(x, lag0, U), x0, batch * T, iters
    )


def measure_vpu_fma_peak(rows: int = 512, iters: int = 32768,
                         streams: int = 8, calls: int = 3):
    """Measured elementwise speed of light on this chip.

    A Pallas kernel holds ``streams`` independent (rows, 128) f32
    accumulators in VMEM and advances each through ``iters`` steps of the
    non-shareable recurrence ``acc <- acc * (c - acc * d)`` (3 flops) —
    independent streams expose the ILP a real fused RHS has, and the
    nonlinearity prevents the compiler from collapsing the recurrence.
    Calls are CHAINED through a data dependency and the result is read
    back to host: on this platform ``block_until_ready`` alone does not
    guarantee the remote execution finished, so unchained timing loops
    measure dispatch, not compute (measured: 0.1 ms "per call" unchained
    vs 45 ms chained for the identical kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        c = jnp.float32(1.0000001)
        d = jnp.float32(1e-9)
        a = x_ref[:]
        accs = [a * jnp.float32(1.0 + 0.01 * i) for i in range(streams)]

        def body(_, accs):
            return tuple(acc * (c - acc * d) for acc in accs)

        accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:] = out

    @jax.jit
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        # renormalise to ~0.5 magnitude so calls can chain indefinitely;
        # the data dependency on y is real (mean cannot be DCE'd)
        return y * (0.5 / jnp.mean(jnp.abs(y)))

    x = jnp.full((rows, 128), 0.5, jnp.float32)
    return chained_steps_per_sec(f, x, 3 * rows * 128 * iters * streams,
                                 calls)[0]


def measure_vpu_transcendental_peak(rows: int = 512, iters: int = 8192,
                                    streams: int = 8, calls: int = 3):
    """Measured transcendental (sin) throughput on this chip.

    Companion to :func:`measure_vpu_fma_peak`: the Fossen RHS is a mix of
    FMA work and trig, so an FMA-only denominator is not a ceiling for it.
    Same structure — ``streams`` independent (rows, 128) f32 accumulators
    advanced through ``iters`` steps of ``acc <- sin(acc) + 0.5*acc``
    (1 transcendental + 2 flops; the recurrence is non-collapsible and the
    iterates stay bounded), chained calls + host readback for completion-
    correct timing.  Returns transcendental evaluations per second (the
    FMA share of the loop is <1% of a sin's cost and ignored).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        accs = [a * jnp.float32(1.0 + 0.01 * i) for i in range(streams)]

        def body(_, accs):
            return tuple(jnp.sin(acc) + jnp.float32(0.5) * acc for acc in accs)

        accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:] = out

    @jax.jit
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return y * (0.5 / jnp.mean(jnp.abs(y)))  # rescale so calls chain

    x = jnp.full((rows, 128), 0.5, jnp.float32)
    return chained_steps_per_sec(f, x, rows * 128 * iters * streams,
                                 calls)[0]


def measure_vpu_fma_tree_peak(rows: int = 128, iters: int = 8192,
                              chains: int = 8, depth: int = 64,
                              calls: int = 3):
    """Max-ILP FMA peak: per loop iteration a wide tree of INDEPENDENT
    Horner chains seeded by the iteration index (cannot be hoisted), with
    a single accumulate as the only loop-carried dependency.

    This is the ceiling shape for the quat13 kernel, whose RK4 step is a
    wide independent expression DAG — unlike :func:`measure_vpu_fma_peak`,
    whose serial per-stream recurrence (and VMEM-spilled accumulators at
    the round-3 shape) understates the VPU by ~2.7x (measured round 4:
    dependent-chain peak 1.09e12 vs 2.95e12 here; the real quat kernel's
    achieved 1.9e12 jaxpr-flops/s exceeds the former).  Counted flops:
    2 per chain step (FMA) + tree adds.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    flops_iter = chains * depth * 2 + chains

    def kernel(x_ref, o_ref):
        a = x_ref[:]

        def body(i, acc):
            v = a * (jnp.float32(1.0) + jnp.float32(1e-7) * i.astype(jnp.float32))
            ts = []
            for c in range(chains):
                t = v
                for d in range(depth):
                    t = t * jnp.float32(0.99 + 0.0001 * c) + jnp.float32(
                        1e-3 * (d + 1))
                ts.append(t)
            s = ts[0]
            for t in ts[1:]:
                s = s + t
            return acc + s * jnp.float32(1e-6)

        o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    @jax.jit
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return y * (0.5 / jnp.mean(jnp.abs(y)))  # rescale so calls chain

    x = jnp.full((rows, 128), 0.5, jnp.float32)
    return chained_steps_per_sec(f, x, flops_iter * rows * 128 * iters,
                                 calls)[0]


def measure_quat_mix_peak(oc=None, rows: int = 128, iters: int = 4096,
                          chains: int = 8, calls: int = 3,
                          interpret: bool = False):
    """MEASURED ceiling for the quat13 kernel's exact audited op mix.

    The issue-slot model prices div/sqrt/rsqrt at zero and every cheap op
    at one slot — assumptions, not measurements.  This kernel removes the
    assumptions: per loop iteration it emits exactly the quat13 step's
    audited op-class budget (``oc`` from :func:`quat_step_op_counts`) —
    the same number of issue slots of fused-FMA work (independent Horner
    chains, max ILP), the same number of ``div``/``rsqrt`` ops and the
    same number of cheap ops (abs/max/compare/select), wired into the
    dataflow so none can be folded away — with a single accumulate as the
    only loop-carried dependency.  One loop iteration therefore "costs"
    one kernel step under the slot model, and the measured iterations/s
    per lane is a ceiling in real steps/s that PRICES the div/rsqrt/cheap
    ops at their true throughput.  The emitted body is jaxpr-audited with
    the same bucketer as the kernel step and asserted to match ``oc`` on
    the slots/div/sqrt/cheap buckets exactly.

    Returns ``(steps_per_sec, emitted_buckets)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if oc is None:
        oc = quat_step_op_counts()
    n_rsqrt, n_div, n_cheap = oc["sqrt"], oc["div"], oc["cheap"]
    n_cheap_chains = min(4, n_cheap)
    n_values = chains + n_rsqrt + n_div + n_cheap_chains
    # Slot ledger under the audit's maximal-fusion pricing
    # (slots = max(muls, adds) + cheap; adds dominate here): every Horner
    # step is one fused slot, and the seed/rsqrt/div-input muls fuse into
    # the accumulate-tree adds, which cost n_values slots total.
    horner = oc["slots"] - oc["cheap"] - n_values
    assert horner >= chains, f"op budget too small: horner={horner}"
    depths = [horner // chains + (1 if c < horner % chains else 0)
              for c in range(chains)]

    def body_math(i, a, acc):
        v = a * (jnp.float32(1.0) + jnp.float32(1e-7) * i.astype(jnp.float32))
        ts = []
        for c in range(chains):
            t = v
            for d in range(depths[c]):
                t = t * jnp.float32(0.99 + 0.0001 * c) + jnp.float32(
                    1e-3 * (d + 1))
            ts.append(t)
        rs = [jax.lax.rsqrt(ts[j % chains] * ts[j % chains])
              for j in range(n_rsqrt)]
        ds = [jnp.float32(1.0) / (ts[j % chains] * ts[j % chains])
              for j in range(n_div)]
        us = [ts[k % chains] for k in range(n_cheap_chains)]
        emitted = 0
        k = 0
        while emitted < n_cheap:
            lane = k % n_cheap_chains
            sel = k % 3
            if sel == 0:
                us[lane] = jnp.abs(us[lane])
                emitted += 1
            elif sel == 1:
                us[lane] = jnp.maximum(us[lane], jnp.float32(0.1))
                emitted += 1
            elif emitted + 2 <= n_cheap:
                b = us[lane] < jnp.float32(0.5)
                us[lane] = jnp.where(b, us[lane], v)
                emitted += 2
            else:
                us[lane] = -us[lane]
                emitted += 1
            k += 1
        s = ts[0]
        for t in ts[1:] + rs + ds + us:
            s = s + t
        return acc + s * jnp.float32(1e-6)

    emitted_oc = _vector_op_buckets(
        body_math, jnp.int32(1),
        jnp.zeros((8,), jnp.float32), jnp.zeros((8,), jnp.float32))
    for key in ("slots", "div", "sqrt", "cheap"):
        assert emitted_oc[key] == oc[key], (
            f"mix kernel {key}={emitted_oc[key]} != audited {oc[key]}")

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        o_ref[:] = jax.lax.fori_loop(
            0, iters, lambda i, acc: body_math(i, a, acc), x_ref[:])

    @jax.jit
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)
        return y * (0.5 / jnp.mean(jnp.abs(y)))  # rescale so calls chain

    x = jnp.full((rows, 128), 0.5, jnp.float32)
    sps = chained_steps_per_sec(f, x, rows * 128 * iters, calls)[0]
    return sps, emitted_oc


def _iter_eqns(jx):
    """Yield every equation of ``jx`` and of all nested sub-jaxprs.

    One traversal for every jaxpr audit in this file.  Descends into
    scan/closed-call bodies (``params['jaxpr']``), cond branches
    (``params['branches']``) AND while-loop bodies
    (``params['cond_jaxpr']``/``['body_jaxpr']``) — the earlier
    per-audit walkers skipped while_p, so any op inside a
    ``lax.while_loop`` was silently counted as zero.
    """
    for eqn in jx.eqns:
        yield eqn
        for key in ("jaxpr", "cond_jaxpr", "body_jaxpr"):
            if key in eqn.params:
                inner = eqn.params[key]
                yield from _iter_eqns(getattr(inner, "jaxpr", inner))
        if "branches" in eqn.params:
            for br in eqn.params["branches"]:
                yield from _iter_eqns(getattr(br, "jaxpr", br))


def _vector_op_buckets(fn, *args):
    """Jaxpr-audited VECTOR op-class counts of ``fn(*args)`` (scalar-only
    ops excluded), bucketed the way the issue-slot model prices them.

    Returns a dict with ``flops`` (add+sub+mul), ``div``, ``sqrt``
    (sqrt+rsqrt), ``cheap`` (abs/neg/select/compare/max at ~1 issue slot
    each), and ``slots``: the minimum VPU issue slots under maximal
    mul+add FMA fusion (muls + adds + subs − min(muls, adds+subs) +
    cheap).
    """
    from collections import Counter

    jaxpr = jax.make_jaxpr(fn)(*args)
    c = Counter()
    for eqn in _iter_eqns(jaxpr.jaxpr):
        if getattr(eqn.outvars[0].aval, "shape", ()):  # vector ops only
            c[eqn.primitive.name] += 1
    muls, adds = c["mul"], c["add"] + c["sub"]
    cheap = c["abs"] + c["neg"] + c["select_n"] + c["lt"] + c["gt"] + c["max"]
    return {
        "flops": muls + adds,
        "div": c["div"],
        "sqrt": c["sqrt"] + c["rsqrt"],
        "cheap": cheap,
        "slots": muls + adds - min(muls, adds) + cheap,
    }


def quat_step_op_counts(method: str = "rk4"):
    """Machine-audited per-trajectory op counts of ONE quat13 Pallas
    kernel step (RK4 + per-stage and post-step normalize), from the jaxpr
    of the exact row computation the kernel performs (buckets per
    :func:`_vector_op_buckets`)."""
    from bluerov2_dynamics_tpu.models.params import fossen_params
    from bluerov2_dynamics_tpu.ops.pallas_quat import (
        _make_rhs_quat_rows,
        _quat_step_rows,
    )

    rhs = _make_rhs_quat_rows(fossen_params())

    def kernel_step(xs, tau):
        return _quat_step_rows(rhs, xs, tau, 0.02, method, True)

    return _vector_op_buckets(
        kernel_step,
        tuple(jnp.zeros((8,), jnp.float32) for _ in range(13)),
        tuple(jnp.float32(0) for _ in range(6)),
    )


def step_costs_per_trajectory(method: str = "rk4", batch: int = 1024):
    """(FLOPs, transcendentals) of one full thruster-input Fossen step per
    trajectory, from XLA's own cost model of the compiled step (auditable,
    not hand-counted)."""
    from bluerov2_dynamics_tpu.models.fossen import make_thruster_step
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )

    dt = 0.02
    step = make_thruster_step(fossen_params(), thruster_config(),
                              lag_params(dt), dt, method=method)
    args = (
        (jnp.zeros((batch, 12), jnp.float32), jnp.zeros((batch, 8, 3), jnp.float32)),
        jnp.zeros((8,), jnp.float32),
    )
    compiled = jax.jit(step).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return (float(ca["flops"]) / batch,
            float(ca.get("transcendentals", 0.0)) / batch)


def _pallas_kernel_step(method: str = "rk4"):
    """The exact per-step computation of the Pallas rollout kernel as a
    plain jax function over the 12-tuple row state (for cost auditing)."""
    from bluerov2_dynamics_tpu.models.params import fossen_params
    from bluerov2_dynamics_tpu.ops.pallas_rollout import (
        _make_rhs_rows,
        _rk4_rows,
    )

    dt = 0.02
    rhs = _make_rhs_rows(fossen_params())

    def kernel_step(xs, tau):
        return _rk4_rows(rhs, xs, tau, dt, method)

    return kernel_step


def step_trig_count(method: str = "rk4"):
    """sin/cos evaluations per trajectory per step of the PALLAS kernel
    (the path the headline measures), audited from the jaxpr of the exact
    per-step computation the kernel performs (not hand-counted).

    This is deliberately narrower than the XLA cost model's
    ``transcendentals`` bucket, which also charges every divide — ops the
    VPU executes far faster than sin — so a ceiling built from that bucket
    at measured-sin cost is NOT a valid upper bound (the measured kernel
    exceeds it; see RESULTS.md §7).
    """
    kernel_step = _pallas_kernel_step(method)
    jaxpr = jax.make_jaxpr(kernel_step)(
        tuple(jnp.zeros((8,), jnp.float32) for _ in range(12)),
        tuple(jnp.float32(0) for _ in range(6)),
    )

    return sum(eqn.primitive.name in ("sin", "cos")
               for eqn in _iter_eqns(jaxpr.jaxpr))


def run_soa(batch: int = 65536, T: int = 500, iters: int = 3,
            method: str = "rk4"):
    """Batch-last (structure-of-arrays) XLA-scan rollout — the measured
    layout comparison for the batch-first default (CLAUDE.md: batch-first
    won; this line keeps the claim auditable)."""
    from bluerov2_dynamics_tpu.models.fossen_soa import make_thruster_step_soa
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )

    dt = 0.02
    step = make_thruster_step_soa(fossen_params(), thruster_config(),
                                  lag_params(dt), dt, method=method)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = 0.1 * jax.random.normal(k1, (12, batch), jnp.float32)
    lag0 = jnp.zeros((8, 3, batch), jnp.float32)
    U = jnp.clip(0.5 * jax.random.normal(k2, (T, 8), jnp.float32), -1.0, 1.0)

    @jax.jit
    def rollout_final(x0, lag0, U):
        def body(carry, u):
            return step(carry, u), None

        (x, lag_state), _ = jax.lax.scan(body, (x0, lag0), U)
        return x

    return chained_steps_per_sec(
        lambda x: rollout_final(x, lag0, U), x0, batch * T, iters
    )


def run_full(only: str | None = None):
    """Secondary benchmarks (printed as extra JSON lines; opt-in via
    --full, not consumed by the driver).  ``only`` restricts to a single
    named section (``--section``) for targeted re-blessing."""
    import jax.random as jr

    from bluerov2_dynamics_tpu.data.synthetic import generate_sim_dataset
    from bluerov2_dynamics_tpu.eval.metrics import rmse
    from bluerov2_dynamics_tpu.eval.timing import time_fn
    from bluerov2_dynamics_tpu.models import koopman
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )
    from bluerov2_dynamics_tpu.ops.pallas_eval import make_endpoint_final_pallas

    N, dt = 45823, 0.02
    split = int(0.8 * N)
    _data = {}

    def dataset():
        # generated lazily: host-only sections (--section ingest) must not
        # touch the device at all
        if "XU" not in _data:
            sim = generate_sim_dataset(jax.random.PRNGKey(0), n_steps=N, dt=dt)
            _data["XU"] = (sim.X, sim.U)
        return _data["XU"]

    def fitted_model():
        # shared across sections (sec_koopman stores its timed fit here so
        # sec_mxu does not refit the identical model in the same run)
        if "model" not in _data:
            X, U = dataset()
            _data["model"] = koopman.fit(jr.PRNGKey(0), X[:split], U[:split],
                                         n_rbfs=500, gamma=3.0, ridge=1e-1)
            jax.block_until_ready(_data["model"].A)
        return _data["model"]

    rows = []

    def section(name, fn):
        """Run one secondary-benchmark section; a failure (e.g. no Pallas
        on this platform) must never prevent the remaining sections or the
        headline driver-contract line from being emitted.  A failed section
        emits an ``<name>_error`` JSON row (value 1.0) so a consumer diffing
        BENCH_r*.json can tell a crashed section from a never-run one."""
        if only is not None and name != only:
            return
        if only is None and name in explicit_only:
            return  # sweep-length sections run only via --section NAME
        try:
            fn()
        except Exception as e:  # pragma: no cover - platform fallback
            print(f"[warn] --full section '{name}' failed "
                  f"({type(e).__name__}: {e}); skipping", file=sys.stderr)
            # same schema as normal rows (unit='error', vs=None) with the
            # exception text in a dedicated 'error' key, so a consumer
            # diffing BENCH_r*.json never sees schema drift on failures
            rows.append((f"{name}_error", 1.0, "error", None,
                         f"{type(e).__name__}: {e}"[:120]))

    def sec_koopman():
        X, U = dataset()
        model, t_fit = time_fn(
            lambda: koopman.fit(jr.PRNGKey(0), X[:split], U[:split],
                                n_rbfs=500, gamma=3.0, ridge=1e-1),
            warmup=1, iters=3,
        )
        rows.append(("koopman_fit_500rbf_36k_seconds", t_fit, "s", 2.30 / t_fit))
        _data["model"] = model  # reuse in sec_mxu (same seed/hyperparams)
        _, t_k = time_fn(
            lambda: koopman.multistep_rmse(model, X[split:], U[split:], 100),
            warmup=1, iters=3,
        )
        rows.append(("koopman_h100_eval_seconds", t_k, "s", 41.2 / t_k))

        # device-bound companion row: the wall-time row above carries the
        # tunnel's ~60-120 ms dispatch floor (it measured 0.060-0.112 s
        # for the same work on different days); this one chains calls
        # through a vanishing data dependency so it times the device.
        Xk, Uk = X[split:], U[split:]

        @jax.jit
        def chained_k(Xc):
            r = koopman.multistep_rmse(model, Xc, Uk, 100)
            return Xc.at[0, 0].add(1e-20 * r)

        _, t_kd = chained_steps_per_sec(chained_k, Xk, 1, 10)
        rows.append(("koopman_h100_eval_device_seconds", t_kd,
                     "s/call (chained)", 41.2 / t_kd))

        # method="conv" A/B: same affine endpoint as one batched
        # control-convolution GEMM (models/koopman.py:_endpoint_conv).
        # Round-5 captures: scan 22.2-23.8 ms vs conv 2.6-4.0 ms
        # (5.9-8.5x), RMSE agreement 5.1e-6 rel at this shape.
        @jax.jit
        def chained_kc(Xc):
            r = koopman.multistep_rmse(model, Xc, Uk, 100, method="conv")
            return Xc.at[0, 0].add(1e-20 * r)

        _, t_kc = chained_steps_per_sec(chained_kc, Xk, 1, 10)
        rows.append(("koopman_h100_eval_conv_device_seconds", t_kc,
                     "s/call (chained)", 41.2 / t_kc))
        r_scan = float(koopman.multistep_rmse(model, Xk, Uk, 100))
        r_conv = float(koopman.multistep_rmse(model, Xk, Uk, 100,
                                              method="conv"))
        rows.append(("koopman_h100_conv_vs_scan_rel_agreement",
                     abs(r_conv - r_scan) / max(r_scan, 1e-30),
                     "rel", None))

    def sec_fossen_eval():
        X, U = dataset()
        p, cfg, lag = fossen_params(), thruster_config(), lag_params(dt)
        fe = make_endpoint_final_pallas(p, cfg, lag, dt, 100, method="euler",
                                        block_b=2048)
        run_f = jax.jit(lambda X, U: rmse(X[100:].astype(jnp.float32), fe(X, U)))
        _, t_f = time_fn(run_f, X[split:], U[split:], warmup=1, iters=3)
        rows.append(("fossen_h100_eval_seconds", t_f, "s", 1246.7 / t_f))

        # device-bound companion row (see koopman section for rationale)
        Xe, Ue = X[split:], U[split:]

        @jax.jit
        def chained_f(Xc):
            r = rmse(Xc[100:].astype(jnp.float32), fe(Xc, Ue))
            return Xc.at[0, 0].add(1e-20 * r)

        _, t_fd = chained_steps_per_sec(chained_f, Xe, 1, 20)
        rows.append(("fossen_h100_eval_device_seconds", t_fd,
                     "s/call (chained)", 1246.7 / t_fd))

    def sec_layouts():
        soa_sps, _ = run_soa()
        rows.append(("fossen_rk4_steps_per_sec_soa_layout", soa_sps,
                     "6dof_rk4_steps/s", soa_sps / BASELINE_STEPS_PER_SEC))
        xla_sps, _ = run(batch=65536, iters=3)
        rows.append(("fossen_rk4_steps_per_sec_xla_scan", xla_sps,
                     "6dof_rk4_steps/s", xla_sps / BASELINE_STEPS_PER_SEC))

    def sec_roofline():
        # Roofline data (all measured or machine-audited, no hand counts):
        # * chained-FMA and chained-sin microbenchmark peaks;
        # * the FULL-PATH per-step cost (XLA cost model of the canonical
        #   scan step — includes the per-trajectory thruster map, which
        #   the shared-input kernel amortizes; labeled as such) and the
        #   jaxpr-audited sin/cos count of the exact kernel step;
        # * the TRIG-ONLY bound: sin_peak / trig_per_step — an upper bound
        #   that models every non-trig op as FREE.  The rows-layout kernel
        #   reaches ~0.9 of even this bound; additive FMA+trig models
        #   built from the microbenchmark peaks are EXCEEDED by the
        #   measured kernel, which shows those standalone peaks understate
        #   the hardware in context (loop overhead, issue-slot modeling) —
        #   they are reported as data, not as a ceiling.
        vpu_peak = measure_vpu_fma_peak()
        rows.append(("vpu_fma_measured_peak", vpu_peak, "flops/s", None))
        trans_peak = measure_vpu_transcendental_peak()
        rows.append(("vpu_transcendental_measured_peak", trans_peak,
                     "transcendentals/s", None))
        full_flops, full_trans = step_costs_per_trajectory()
        rows.append(("fossen_rk4_flops_per_step_full_path", full_flops,
                     "flops (incl. per-traj thruster map, amortized in the "
                     "shared-input kernel)", None))
        trig_step = step_trig_count()
        rows.append(("fossen_rk4_trig_per_step_jaxpr", trig_step,
                     "sin_cos_evals", None))
        (pallas_sps, _), = run_pallas(iters=3)
        trig_bound = trans_peak / trig_step
        rows.append(("fossen_rk4_trig_only_bound_steps_per_sec", trig_bound,
                     "6dof_rk4_steps/s (ALL non-trig work modeled free)",
                     None))
        rows.append(("fossen_rk4_fraction_of_trig_only_bound",
                     pallas_sps / trig_bound,
                     "fraction_of_trig_only_upper_bound", None))

    def sec_quat_rollout():
        # quat13 wrench-input VMEM rollout + its roofline accounting
        # (round-4 anchor, VERDICT r3 item 2).  Trig-free kinematics, so
        # the dominant resource is FMA-class vector work, not
        # transcendentals.  Two ceilings are printed, loose to tight:
        # * fma-only bound: tree-peak flops / jaxpr-audited flops-per-step
        #   (ALL non-fma-class work free, perfect mul+add fusion);
        # * issue-slot bound: tree-peak SLOTS (= flops/2: each slot is one
        #   fused FMA) / audited min issue slots (fma-class after maximal
        #   fusion + cheap vector ops; div/sqrt modeled free — they
        #   overlap with FMA issue, measured: additive div models are
        #   exceeded by the real kernel).
        # block_b=2048 from the measured round-4 sweep (0.78/1.29/1.99/
        # 2.18/1.88 e9 steps/s at 256/512/1024/2048/4096).  The per-stage
        # quat normalize is NOT hoisted: the reference normalizes inside
        # every RHS entry (BlueROV2_wrench.py:322-330) and parity tests
        # pin that semantics.
        from bluerov2_dynamics_tpu.models.params import fossen_params
        from bluerov2_dynamics_tpu.ops.pallas_quat import (
            make_rollout_final_pallas_quat,
        )

        B, T, iters = 65536, 500, 3
        p = fossen_params()
        roll = make_rollout_final_pallas_quat(p, 0.02, method="rk4")
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x0 = 0.1 * jax.random.normal(k1, (B, 13), jnp.float32)
        x0 = x0.at[:, 3].add(1.0)  # near-identity quats
        TAU = 3.0 * jax.random.normal(k2, (T, 6), jnp.float32)
        sps, _ = chained_steps_per_sec(lambda x: roll(x, TAU), x0,
                                       B * T, iters)
        rows.append(("fossen_quat13_rk4_steps_per_sec", sps,
                     "13state_rk4_steps/s", None))
        tree_peak = measure_vpu_fma_tree_peak()
        rows.append(("vpu_fma_tree_peak", tree_peak,
                     "flops/s (max-ILP independent-FMA ceiling)", None))
        oc = quat_step_op_counts()
        rows.append(("fossen_quat13_flops_per_step_jaxpr", oc["flops"],
                     f"fma_class_flops (+{oc['div']} div, {oc['sqrt']} "
                     f"sqrt, {oc['cheap']} cheap)", None))
        rows.append(("fossen_quat13_achieved_flops_per_sec",
                     sps * oc["flops"], "flops/s", None))
        fma_bound = tree_peak / oc["flops"]
        rows.append(("fossen_quat13_fma_only_bound_steps_per_sec",
                     fma_bound, "13state_rk4_steps/s (all non-fma work "
                     "free, perfect fusion)", None))
        rows.append(("fossen_quat13_fraction_of_fma_only_bound",
                     sps / fma_bound, "fraction", None))
        slot_bound = (tree_peak / 2.0) / oc["slots"]
        rows.append(("fossen_quat13_slot_bound_steps_per_sec", slot_bound,
                     "13state_rk4_steps/s (min issue slots at fused-FMA "
                     "slot rate)", None))
        rows.append(("fossen_quat13_fraction_of_slot_bound",
                     sps / slot_bound, "fraction", None))
        # Round-5: the slot bound PRICES div/rsqrt at zero and cheap ops
        # at one slot — assumptions.  The mix peak measures the same
        # audited op budget as a max-ILP kernel (exact slots/div/rsqrt/
        # cheap match, jaxpr-asserted), so it is the measured ceiling for
        # this op mix; the gap between it and the slot bound is the true
        # cost of the non-FMA ops, not kernel inefficiency.
        mix_peak, _ = measure_quat_mix_peak(oc)
        rows.append(("fossen_quat13_mix_peak_steps_per_sec", mix_peak,
                     "13state_rk4_steps/s (measured max-ILP ceiling for "
                     "the audited op mix)", None))
        rows.append(("fossen_quat13_fraction_of_mix_peak",
                     sps / mix_peak, "fraction", None))

    def sec_numerics_guard():
        # Round-2 bf16 Gram-cancellation regression guard, executed on the
        # REAL device every round: at the TPU-default single-pass-bf16
        # matmul precision, the RBF distance GEMM cancels catastrophically
        # for states far from the origin (psi ~ 60 rad on wound
        # recordings) — the fix pins Precision.HIGHEST in ops/lifting.py.
        # CPU tests cannot catch a regression here (XLA:CPU ignores matmul
        # precision hints entirely), so the contract is asserted on-chip
        # and the error lands in BENCH_r{N}.json where a regression is
        # visible.  Measured healthy value on the chip: ~3e-3 (f32
        # accumulation of ||x||^2 ~ 3.8e3 costs eps*|x2| ~ 5e-4 in the
        # distance); the round-2 failure mode gives inf/NaN.
        import numpy as np

        from bluerov2_dynamics_tpu.ops.lifting import rbf_lift

        rng = np.random.default_rng(0)
        X = rng.normal(size=(256, 12))
        X[:, 5] += 60.0  # unwrapped psi far from origin
        C = X[rng.choice(256, 50, replace=False)] + 0.01 * rng.normal(size=(50, 12))
        got = np.asarray(rbf_lift(
            jnp.asarray(X, jnp.float32), jnp.asarray(C, jnp.float32),
            jnp.asarray(3.0, jnp.float32),
        ))
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        want = np.concatenate([X, np.exp(-3.0 * d2)], axis=1)
        err = float(np.max(np.abs(got - want)))
        rows.append(("rbf_lift_far_state_max_abs_err_vs_f64", err,
                     "abs_err (healthy ~3e-3; inf/NaN = bf16 regression)",
                     None))

    def sec_mxu():
        # MXU measured-peak accounting for the two GEMM-bound surfaces
        # (VERDICT r3 item 4): chained-matmul peaks, achieved flops of the
        # Koopman Gram GEMM and the H=100 multistep eval as fractions of
        # the HIGHEST-precision peak, and the propagation-precision A/B.
        # Round-4 probe data (v5e): bf16-in default peak rises with size
        # (4.2e13 @ n=1024 -> 1.26e14 @ n=8192, the serial chain hides
        # less MXU drain at small n); HIGHEST (6-pass f32) peak 2.8e13.
        # A/B on the pseudo recording: default-bf16 propagation is WRONG
        # (rmse 0.2069 vs 0.1405), HIGH matches HIGHEST to 2.6e-4 rel for
        # only an 11% speedup on this shape — decision: propagation stays
        # HIGHEST (models/koopman.py:253-256; distance GEMMs unconditionally
        # HIGHEST per the round-2 cancellation fix).
        import jax.random as jr2

        from bluerov2_dynamics_tpu.eval.timing import time_fn as _time_fn

        def matmul_peak(n, k_iters, precision, bf16):
            # spectral norm ~0.9 via Marchenko-Pastur scaling (top sv of
            # G/sqrt(n) -> 2): QR-orthogonalising at n=8192 took minutes
            # of chip time and blew the section budget; decay over
            # k_iters is undone by the per-call renormalisation
            W = (0.45 / jnp.sqrt(jnp.float32(n))) * jr2.normal(
                jr2.PRNGKey(0), (n, n), jnp.float32)
            if bf16:
                W = W.astype(jnp.bfloat16)

            # W is an ARGUMENT, not a closure constant: embedded constants
            # of this size blow up the remote-compile payload on the
            # tunneled platform (HTTP 413 at f32 n=8192)
            @jax.jit
            def f(x, W):
                def body(i, x):
                    with jax.default_matmul_precision(precision):
                        return x @ W

                y = jax.lax.fori_loop(0, k_iters, body, x)
                y32 = y.astype(jnp.float32)
                out = y32 * (1.0 / jnp.sqrt(jnp.mean(y32 * y32) + 1e-20))
                return out.astype(W.dtype)

            x = jr2.normal(jr2.PRNGKey(1), (n, n), jnp.float32).astype(W.dtype)
            return chained_steps_per_sec(lambda x: f(x, W), x,
                                         2.0 * n**3 * k_iters, 3)[0]

        X, U = dataset()
        bf16_peak = matmul_peak(8192, 4, "default", True)
        rows.append(("mxu_bf16_measured_peak", bf16_peak,
                     "flops/s (chained 8192^3 bf16 matmul)", None))
        hi_peak = matmul_peak(4096, 16, "highest", False)
        rows.append(("mxu_highest_measured_peak", hi_peak,
                     "flops/s (chained 4096^3 6-pass-f32 matmul)", None))

        model = fitted_model()

        # Gram GEMM at the exact fit shapes (G^T G + G^T Y, HIGHEST),
        # timed CHAINED: the wall-clock version of this row carried the
        # tunnel's ~60-120 ms dispatch floor over ~1 ms of device work
        # and misread the achieved fraction ~20x low (then misattributed
        # the gap to MXU tiling in the unit string).
        Z = koopman.lift(model, X[:split - 1])
        G = jnp.concatenate([Z, U[:split - 1]], axis=1)
        Y = koopman.lift(model, X[1:split])

        @jax.jit
        def chained_gram(Gc):
            with jax.default_matmul_precision("highest"):
                g1 = Gc.T @ Gc
                g2 = Gc.T @ Y
            return Gc.at[0, 0].add(1e-20 * (g1[0, 0] + g2[0, 0]))

        _, t_gram = chained_steps_per_sec(chained_gram, G, 1, 20)
        n_rows_g, d_g = G.shape
        fl_gram = 2.0 * n_rows_g * d_g * d_g + 2.0 * n_rows_g * d_g * Y.shape[1]
        rows.append(("koopman_gram_gemm_achieved_flops_per_sec",
                     fl_gram / t_gram,
                     f"flops/s ({n_rows_g}x{d_g} Gram, HIGHEST, chained)",
                     None))
        rows.append(("koopman_gram_gemm_fraction_of_highest_peak",
                     (fl_gram / t_gram) / hi_peak, "fraction", None))

        # H=100 multistep eval achieved + propagation-precision A/B
        Xe, Ue = X[split:], U[split:]
        H = 100
        n_start = Xe.shape[0] - H
        d = model.A.shape[0]

        # A/B through the PRODUCTION evaluator (its precision kwarg), so
        # the measurement cannot drift from the shipped code path.  The
        # rmse VALUES are the point; the per-precision wall times carry
        # the tunnel dispatch floor and are labeled as such.  The
        # achieved-fraction row is computed from a CHAINED device time
        # (wall time misread it ~3x low).
        fl_ms = 2.0 * n_start * d * (d + Ue.shape[1]) * H
        for prec in ("default", "high", "highest"):
            val, t_ms = _time_fn(
                lambda p=prec: koopman.multistep_rmse(model, Xe, Ue, H, p),
                warmup=1, iters=5)
            rows.append((f"koopman_h100_rmse_precision_{prec}", float(val),
                         f"rmse (wall incl. dispatch {t_ms * 1e3:.1f} ms)",
                         None))

        @jax.jit
        def chained_ms(Xc):
            r = koopman.multistep_rmse(model, Xc, Ue, H, "highest")
            return Xc.at[0, 0].add(1e-20 * r)

        _, t_msd = chained_steps_per_sec(chained_ms, Xe, 1, 10)
        rows.append(("koopman_h100_eval_fraction_of_highest_peak",
                     (fl_ms / t_msd) / hi_peak, "fraction (chained)", None))

    def sec_ingest():
        # Host-side ingestion throughput: the native C++ batch CDR decoder
        # vs the per-message Python codec vs the schema-driven typesys
        # generic decoder, on a synthesized ~100k-message bag worth of
        # px4 VehicleOdometry blobs (the tank recordings' densest topic).
        # This is the number that justifies native/cdr_decode.cpp ("the
        # only real host-side hot loop", VERDICT r3 item 7).  The Python
        # paths are timed on a 20k subset (rates are rates).
        import numpy as onp

        from bluerov2_dynamics_tpu.data import cdr, typesys

        rng = onp.random.default_rng(0)
        n = 100_000
        n_py = 20_000
        qs = rng.normal(size=(n, 4))
        qs /= onp.linalg.norm(qs, axis=1, keepdims=True)
        pos = rng.normal(size=(n, 3))
        vel = rng.normal(size=(n, 3))
        ang = rng.normal(size=(n, 3))
        blobs = [
            cdr.encode_vehicle_odometry(pos[i], qs[i], vel[i], ang[i],
                                        timestamp=i)
            for i in range(n)
        ]

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        try:
            from bluerov2_dynamics_tpu.data import native_cdr

            native_cdr.decode_vehicle_odometry_batch(blobs[:16])  # build
            t_nat = best_of(
                lambda: native_cdr.decode_vehicle_odometry_batch(blobs))
            rows.append(("ingest_native_cdr_msgs_per_sec", n / t_nat,
                         "msgs/s (C++ batch decoder, 100k VehicleOdometry)",
                         None))
        except Exception as e:  # pragma: no cover - no toolchain
            print(f"[warn] native CDR unavailable ({e})", file=sys.stderr)
            t_nat = None
        t_py = best_of(
            lambda: [cdr.decode_vehicle_odometry(b) for b in blobs[:n_py]])
        rows.append(("ingest_python_cdr_msgs_per_sec", n_py / t_py,
                     "msgs/s (per-message Python codec)", None))
        ts = typesys.default_typestore()
        t_gen = best_of(
            lambda: [ts.decode("px4_msgs/msg/VehicleOdometry", b)
                     for b in blobs[:n_py]])
        rows.append(("ingest_typesys_generic_msgs_per_sec", n_py / t_gen,
                     "msgs/s (schema-driven generic decoder)", None))
        if t_nat is not None:
            rows.append(("ingest_native_speedup_vs_python",
                         (n / t_nat) / (n_py / t_py), "x", None))

    def sec_window_blocks():
        # CHAINED block_b sweep for the sliding-window evaluator family
        # (thruster-euler12 / wrench-euler12 / quat13) at the REAL tank
        # workload shapes (H=100; 9,165 = the recording's test-split ROW
        # count — the app's evaluator actually runs rows-H = 9,065
        # starts, an identical padding class <1.1% away — and 44,800 =
        # the full-recording scale) — the sweep the
        # round-4 VERDICT asked for (weak-item 3): the 512 default was
        # never separated from dispatch noise.  The start counts are
        # deliberately NOT multiples of the candidate blocks: the kernel
        # pads n_start up to a block multiple, so the steps/s printed
        # here (real_starts*H / time) is USEFUL throughput with the
        # padding waste priced in (at 9,165 starts, block 4096 runs 34%
        # dead rows; an earlier sweep at multiple-of-4096 shapes hid
        # that).  Slope timing proved too noisy for these sub-10 ms
        # kernels (it produced >speed-of-light readings), so this uses
        # the headline rollout's discipline instead: each call's X
        # depends on the previous call's output through a vanishing
        # perturbation (X0 + 1e-20*finals), which chains the device
        # stream exactly like the rollout benchmark while keeping the
        # numeric state constant.  Median of 3 regions.
        from bluerov2_dynamics_tpu.models.params import (
            fossen_params,
            lag_params,
            thruster_config,
        )
        from bluerov2_dynamics_tpu.ops.pallas_eval import (
            make_endpoint_final_pallas,
            make_endpoint_final_pallas_wrench,
        )
        from bluerov2_dynamics_tpu.ops.pallas_quat import (
            make_endpoint_final_pallas_quat,
        )

        dt, H = 0.02, 100
        p = fossen_params()
        cfg = thruster_config()
        lag = lag_params(dt)
        key = jax.random.PRNGKey(0)
        for n_start in (9165, 44800):
            N = n_start + H
            iters = 60 if n_start < 20_000 else 20  # small/fast shapes need more iters to beat dispatch noise
            ks = jax.random.split(key, 4)
            X12 = 0.1 * jax.random.normal(ks[0], (N, 12), jnp.float32)
            U8 = jnp.clip(0.5 * jax.random.normal(ks[1], (N, 8), jnp.float32),
                          -1.0, 1.0)
            TAU6 = 4.0 * jax.random.normal(ks[2], (N, 6), jnp.float32)
            X13 = 0.1 * jax.random.normal(ks[3], (N, 13), jnp.float32)
            X13 = X13.at[:, 3].add(1.0)
            # method="euler" throughout: every app runs these evaluators
            # with the euler step (tank_koopman.py:40, tank_wrench_comp.py:77,
            # tank_wrench_quat.py:80; T6's default --integrator is euler) —
            # an earlier sweep used the thruster/wrench factory default
            # (rk4, a ~4x heavier step), i.e. tuned a kernel the apps never
            # run.  tank_rk4 users can pass block_b explicitly.
            families = (
                ("thruster", make_endpoint_final_pallas,
                 (p, cfg, lag, dt, H), X12, U8),
                ("wrench", make_endpoint_final_pallas_wrench,
                 (p, dt, H), X12, TAU6),
                ("quat", make_endpoint_final_pallas_quat,
                 (p, dt, H), X13, TAU6),
            )
            for name, build, bargs, X0, U in families:
                for bb in (256, 512, 1024, 2048, 4096):
                    ev = build(*bargs, method="euler", block_b=bb)

                    @jax.jit
                    def f(X, X0=X0, U=U, ev=ev):
                        finals = ev(X, U)
                        # keep values pinned at X0 but make the next call
                        # data-depend on this call's output
                        return X0.at[:finals.shape[0]].add(1e-20 * finals)

                    times = [
                        chained_steps_per_sec(f, X0, n_start * H, iters)[1]
                        for _ in range(3)
                    ]
                    warm = float(statistics.median(times))
                    rows.append((
                        f"window_{name}_n{n_start}_blk{bb}_warm_s",
                        warm,
                        f"s/call ({n_start * H / warm:.3e} steps/s)",
                        None))

    def sec_estimation():
        # EKF throughput at the estimation workload's two shapes
        # (apps/estimate.py, RESULTS.md §2d): a vmapped segment BANK
        # (the fit_noise / sharded_ekf_bank shape — parallel over
        # segments, sequential only within one) and the full-recording
        # single sequential filter.  Chained via the m0 dependency
        # (previous call's final means perturb the next call's priors by
        # 1e-20) — the ONE timing discipline.  Each step is one exact
        # jacfwd of the Fossen wrench step + a Joseph-form update
        # (12x12 ops; latency-bound sequentially, which is exactly why
        # the bank shape exists).
        from bluerov2_dynamics_tpu.models import estimation, fossen
        from bluerov2_dynamics_tpu.models.params import fossen_params

        p = fossen_params()
        step = fossen.make_wrench_step(p, dt, "euler", "euler12")
        h = lambda x: x
        Q = jnp.eye(12, dtype=jnp.float32) * 1e-6
        R = jnp.eye(12, dtype=jnp.float32) * 1e-6
        P0 = jnp.eye(12, dtype=jnp.float32) * 1e-2
        key = jax.random.PRNGKey(0)

        B, T = 2048, 250
        ks = jax.random.split(key, 3)
        TAU_b = 2.0 * jax.random.normal(ks[0], (B, T - 1, 6), jnp.float32)
        Y_b = 0.02 * jax.random.normal(ks[1], (B, T, 12), jnp.float32)

        # big operands enter as ARGUMENTS, never jit-closure constants
        # (CLAUDE.md round-4: embedded constants ship inline in the
        # remote-compile payload — HTTP 413 at 256 MB)
        @jax.jit
        def bank(m0, TAU_b, Y_b):
            res = jax.vmap(
                lambda m0b, Ub, Yb: estimation.ekf(step, h, Q, R, m0b, P0,
                                                   Ub, Yb)
            )(m0, TAU_b, Y_b)
            return Y_b[:, 0] + 1e-20 * res.means[:, -1]

        sps, warm = chained_steps_per_sec(
            lambda m0: bank(m0, TAU_b, Y_b), Y_b[:, 0], B * T, 3)
        rows.append(("ekf_bank_2048x250_filter_updates_per_sec", sps,
                     f"updates/s ({warm:.3f} s/call)", None))

        N1 = 45823
        TAU_1 = 2.0 * jax.random.normal(ks[2], (N1 - 1, 6), jnp.float32)
        Y_1 = 0.02 * jax.random.normal(ks[1], (N1, 12), jnp.float32)

        @jax.jit
        def single(m0, TAU_1, Y_1):
            res = estimation.ekf(step, h, Q, R, m0[0], P0, TAU_1, Y_1)
            return Y_1[:2] + 1e-20 * res.means[-1]

        _, warm1 = chained_steps_per_sec(
            lambda m0: single(m0, TAU_1, Y_1), Y_1[:2], N1, 3)
        rows.append(("ekf_single_45823_warm_s", warm1,
                     f"s/call ({N1 / warm1:.3e} updates/s; sequential "
                     "latency-bound — the bank shape is the TPU answer)",
                     None))

        # bootstrap particle filter: the ensemble is a leading batch
        # axis through the full nonlinear step (sequential over time,
        # massively parallel over particles) — throughput in
        # particle-steps/s.  R at the workload's sensor scale so the
        # weights stay non-degenerate.
        NP, TP = 8192, 500
        R_pf = jnp.eye(12, dtype=jnp.float32) * 4e-4
        TAU_p = 2.0 * jax.random.normal(ks[2], (TP - 1, 6), jnp.float32)
        Y_p = 0.02 * jax.random.normal(ks[1], (TP, 12), jnp.float32)

        @jax.jit
        def pf(m0, TAU_p, Y_p):
            res = estimation.particle_filter(
                step, h, Q, R_pf, m0[0], P0, TAU_p, Y_p,
                n_particles=NP, key=jax.random.PRNGKey(0))
            return Y_p[:2] + 1e-20 * res.means[-1]

        sps_p, warm_p = chained_steps_per_sec(
            lambda m0: pf(m0, TAU_p, Y_p), Y_p[:2], NP * TP, 3)
        rows.append((f"pf_{NP}x{TP}_particle_steps_per_sec", sps_p,
                     f"particle-steps/s ({warm_p:.3f} s/call)", None))

    def sec_streaming():
        # Online absorption rate of the streaming Koopman accumulator
        # (models/koopman.py:streaming_scan) at the tank dictionary shape
        # (d = 512 lift, r = 8): how fast live telemetry can be folded
        # into the sufficient statistics, vs the 50 Hz recording rate.
        X, U = dataset()
        model = fitted_model()  # same dictionary as the batch fit rows
        Xs, Us = X[:split], U[:split]
        stats0 = koopman.streaming_init(model.centers, model.gamma,
                                        input_dim=8)
        n_pairs = split - 1

        @jax.jit
        def absorb(Xc):
            s = koopman.streaming_scan(stats0, Xc, Us, 1024,
                                       forgetting=0.9995)
            return Xc.at[0, 0].add(1e-20 * s.gram[0, 0])

        pps, warm = chained_steps_per_sec(absorb, Xs, n_pairs, 3)
        rows.append(("koopman_streaming_absorb_pairs_per_sec", pps,
                     f"pairs/s ({warm:.3f} s per {split}-row pass; "
                     f"{pps / 50.0:.0f}x the 50 Hz recording rate)", None))

        # re-solve latency: one (520, 520) Cholesky over the accumulator
        stats = jax.block_until_ready(
            koopman.streaming_scan(stats0, Xs, Us, 1024))

        @jax.jit
        def resolve(g):
            m = koopman.streaming_finalize(stats._replace(gram=g),
                                           ridge=1e-1)
            return g.at[0, 0].add(1e-20 * m.A[0, 0])

        _, warm_f = chained_steps_per_sec(resolve, stats.gram, 1, 10)
        rows.append(("koopman_streaming_resolve_seconds", warm_f,
                     "s/call (chained)", None))

        # honesty row: the streamed solve vs the batch fit it refactors —
        # same centers and pairs, chunked f32 Gram accumulation; report
        # the H=100 metric disagreement (expected ~1e-3..1e-2 rel from
        # solve-amplified reassociation on this ill-conditioned
        # dictionary; the f64 identity is pinned by tests)
        streamed = koopman.streaming_finalize(stats, ridge=1e-1)
        r_batch = float(koopman.multistep_rmse(model, X[split:],
                                               U[split:], 100))
        r_stream = float(koopman.multistep_rmse(streamed, X[split:],
                                                U[split:], 100))
        rows.append(("koopman_streaming_vs_batch_h100_rel_agreement",
                     abs(r_stream - r_batch) / max(r_batch, 1e-30),
                     "rel", None))

    def sec_control():
        # Closed-loop control throughput at the blessed app shapes
        # (RESULTS §2c) — the operational metric is the REAL-TIME factor
        # against the 50 Hz plant.  Chained via an x0 perturbation (the
        # ONE timing discipline); the policy/seed setup is paid once
        # outside the timed region.
        from bluerov2_dynamics_tpu.models import control, fossen
        from bluerov2_dynamics_tpu.models.params import (
            fossen_params as fp_ctl,
            lag_params as lp_ctl,
            thruster_config as tc_ctl,
        )

        p = fp_ctl()
        cfg = tc_ctl()
        plant = fossen.make_thruster_step(p, cfg, lp_ctl(dt), dt, "euler")
        pol = control.fossen_lqr(p, cfg, dt)
        jax.block_until_ready(pol.K)
        lag0 = jnp.zeros((8, 3), jnp.float32)
        x0 = jnp.zeros((2, 12), jnp.float32).at[0, 0].set(0.5).at[0, 5].set(0.5)
        steps = 600

        # pure state-feedback loop: plant + policy, strictly sequential —
        # the latency-bound baseline (cf. ekf_single in sec_estimation)
        @jax.jit
        def lqr_loop(x0):
            X, _ = control.simulate_closed_loop(
                plant, pol, (x0[0], lag0), steps, get_state=lambda c: c[0])
            return x0 + 1e-20 * X[-1]

        sps, warm = chained_steps_per_sec(lqr_loop, x0, steps, 3)
        rows.append(("lqr_closed_loop_steps_per_sec", sps,
                     f"steps/s ({warm:.3f} s/call; {sps / 50.0:.0f}x "
                     "real time at 50 Hz)", None))

        # LOS waypoint guidance as a FLEET: 256 vehicles vmapped over
        # the same 24 s mission (the TPU batch shape; a single mission
        # is latency-bound like the lqr row).  Throughput in
        # mission-steps/s across the fleet.
        from bluerov2_dynamics_tpu.models import guidance

        wps = jnp.asarray([[1.5, 0.0, 0.3], [1.5, 1.5, 0.5],
                           [0.0, 1.5, 0.2], [0.0, 0.0, 0.0]], jnp.float32)
        plan = guidance.make_plan(jnp.zeros(3, jnp.float32), wps,
                                  accept_radius=0.15, lookahead=0.6,
                                  cruise_speed=0.25)
        n_fleet, m_steps = 256, 1200
        x0f = 0.05 * jax.random.normal(jax.random.PRNGKey(3),
                                       (n_fleet, 12), jnp.float32)

        @jax.jit
        def los_fleet(x0s):
            def fly(x0):
                res = guidance.simulate_los_mission(
                    plant, pol, plan, (x0, lag0), m_steps,
                    get_state=lambda c: c[0])
                return res.X[-1]

            return x0s + 1e-20 * jax.vmap(fly)(x0s)

        sps_l, warm_l = chained_steps_per_sec(los_fleet, x0f,
                                              n_fleet * m_steps, 3)
        rows.append(("los_fleet_mission_steps_per_sec", sps_l,
                     f"mission-steps/s ({n_fleet}-vehicle fleet, "
                     f"{warm_l:.3f} s/call for {m_steps / 50.0:.0f} s "
                     "missions)", None))

        # output-feedback LQG: per step one 36-dim jacfwd of the lag
        # plant + Joseph update (the `brov2-control lqg` shape)
        @jax.jit
        def lqg_loop(x0):
            res = control.simulate_lqg(
                plant, pol, lambda x: x[:6], 1e-8, 25e-6, (x0[0], lag0),
                steps=steps, key=jax.random.PRNGKey(0),
                get_state=lambda c: c[0])
            return x0 + 1e-20 * res.X[-1]

        sps_g, warm_g = chained_steps_per_sec(lqg_loop, x0, steps, 3)
        rows.append(("lqg_closed_loop_steps_per_sec", sps_g,
                     f"steps/s ({warm_g:.3f} s/call; {sps_g / 50.0:.0f}x "
                     "real time at 50 Hz)", None))

        # sampling MPPI at the blessed obstacle shape: 4x512 sampled
        # 60-step rollouts per plant step — throughput in sampled plant
        # steps/s (the massively-parallel shape)
        sim_steps, rounds, n_samp, H_m, init_rounds = 150, 4, 512, 60, 20

        @jax.jit
        def mppi_loop(x0):
            X, _ = control.simulate_mppi(
                plant, x0[0], jnp.zeros(12, jnp.float32),
                sim_steps=sim_steps, horizon=H_m, n_samples=n_samp,
                sigma=0.15, temperature=0.01, init_rounds=init_rounds,
                replan_rounds=rounds, effort_weight=1e-2,
                carry_init=lambda x: (x, lag0),
                get_state=lambda c: c[0], key=jax.random.PRNGKey(1))
            return x0 + 1e-20 * X[-1]

        sampled = (sim_steps * rounds + init_rounds) * n_samp * H_m
        sps_m, warm_m = chained_steps_per_sec(mppi_loop, x0, sampled, 3)
        rows.append(("mppi_sampled_plant_steps_per_sec", sps_m,
                     f"sampled-steps/s ({warm_m:.3f} s/call for "
                     f"{sim_steps} plant steps = "
                     f"{sim_steps / warm_m / 50.0:.1f}x real time)", None))

    # window_blocks is a ~12-minute 30-compile tuning sweep: kept out of
    # the default --full pass (its result is a committed DEFAULT, not a
    # per-round measurement); rerun explicitly when retuning.
    explicit_only = {"window_blocks"}
    sections = {
        "roofline": sec_roofline,
        "quat_rollout": sec_quat_rollout,
        "koopman": sec_koopman,
        "fossen_eval": sec_fossen_eval,
        "window_blocks": sec_window_blocks,
        "layouts": sec_layouts,
        "mxu": sec_mxu,
        "numerics_guard": sec_numerics_guard,
        "estimation": sec_estimation,
        "streaming": sec_streaming,
        "control": sec_control,
        "ingest": sec_ingest,
    }
    if only is not None and only not in sections:
        raise SystemExit(
            f"unknown --section {only!r}; available: {', '.join(sections)}")
    for name, fn in sections.items():
        # roofline runs first: its kernel measurement must not inherit
        # queued work from the other sections (measured: +60% runtime
        # when it ran last)
        section(name, fn)

    for metric, value, unit, vs, *err in rows:
        rec = {"metric": metric, "value": value, "unit": unit,
               "vs_baseline": vs}
        if err:
            rec["error"] = err[0]
        print(json.dumps(rec))


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true",
                    help="also print the secondary benchmark JSON lines")
    ap.add_argument("--section", default=None, metavar="NAME",
                    help="run ONLY this --full section (targeted "
                         "re-blessing; skips the headline line)")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--t", type=int, default=500, help="rollout length")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3,
                    help="independent timing repetitions; headline value "
                         "is their median (band in the JSON line)")
    ap.add_argument("--block-b", type=int, default=2048,
                    help="Pallas kernel batch block size")
    args = ap.parse_args()
    if args.batch < 1 or args.t < 1 or args.iters < 1:
        ap.error("--batch, --t, and --iters must be >= 1")
    if args.repeats < 1:
        ap.error("--repeats must be >= 1")
    if args.block_b < 1:
        ap.error("--block-b must be >= 1")
    args.block_b = min(args.block_b, args.batch)  # small batches: one block
    if args.batch % args.block_b != 0:
        ap.error("--block-b must divide --batch")

    if args.section is not None:
        run_full(only=args.section)
        return
    # The headline is MEASURED before the --full secondary sections: the
    # same kernel read +60% runtime when it ran after them (queued-work
    # interference despite per-section readbacks — the reason sec_roofline
    # runs first within run_full).  The JSON line still prints last so the
    # driver contract (final line = headline) is unchanged.
    path = "pallas_vmem"
    try:
        runs = run_pallas(
            batch=args.batch, T=args.t, iters=args.iters,
            block_b=args.block_b, repeats=args.repeats,
        )
        sps_runs = sorted(r[0] for r in runs)
    except Exception as e:  # pragma: no cover - platform fallback
        print(f"[warn] pallas path failed ({type(e).__name__}: {e}); "
              "falling back to XLA scan", file=sys.stderr)
        steps_per_sec, elapsed = run(batch=args.batch, T=args.t,
                                     iters=args.iters)
        sps_runs = [steps_per_sec]
        path = "xla_scan_fallback"
    if args.full:
        try:
            run_full()
        except Exception as e:  # pragma: no cover - headline must survive
            print(f"[warn] --full secondary benchmarks failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
    # Median of the repeated measurements is the reproducible headline;
    # the min..max band quantifies the tunnel's run-to-run spread.
    steps_per_sec = statistics.median(sps_runs)
    print(
        json.dumps(
            {
                "metric": "fossen_rk4_steps_per_sec",
                "value": steps_per_sec,
                "unit": "6dof_rk4_steps/s",
                "vs_baseline": steps_per_sec / BASELINE_STEPS_PER_SEC,
                "path": path,
                "repeats": len(sps_runs),
                "band_low": sps_runs[0],
                "band_high": sps_runs[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
