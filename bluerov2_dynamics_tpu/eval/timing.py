"""Wall-clock timing harness for jitted computations.

Replaces the reference's ``perf_counter`` bracketing
(``train_tank_brov2_full_comparison.py:928-930, 977-1009``) with a
completion-correct version.  Two platform facts shape it:

* JAX dispatch is asynchronous, so timings must synchronise on the result;
* on the tunneled TPU platform used here, ``jax.block_until_ready`` can
  return before the remote execution has actually finished (measured: an
  unchained loop of 45 ms kernels "completes" in 0.1 ms/call, while the
  backlog drains minutes later).  Reading an element of the result back to
  the host IS a completion barrier, so every timed call ends with a small
  host readback (~ms on the tunnel; negligible against the >=10 ms
  workloads timed here, and it serialises repeated calls correctly).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def sync(result):
    """Force completion of ``result``'s computation (host readback of one
    element per DISTINCT device among the array leaves); returns ``result``.

    One readback per DEVICE (via each leaf's addressable shards), not per
    leaf: a sharded leaf needs every participating device barriered (one
    element of the whole leaf only forces the shard-0 device), while
    leaves sharing a device share one execution stream — per-leaf
    readbacks would add one tunnel RTT (~1-4 ms) each inside the timed
    region and bias warm timings of multi-leaf results (e.g. a fitted
    model pytree) upward for no extra correctness.
    """
    jax.block_until_ready(result)
    seen = set()
    for leaf in jax.tree.leaves(result):
        if not (isinstance(leaf, jax.Array) and leaf.size):
            continue  # numpy leaf (or empty): no device to barrier
        # one readback per DEVICE via the leaf's shards: reading element 0
        # of the whole leaf only barriers the device holding shard 0, so a
        # sharded output would leave the other devices' streams unawaited
        # — exactly the early-return failure mode this function prevents
        for shard in leaf.addressable_shards:
            dev = shard.device
            if dev in seen or not shard.data.size:
                continue
            seen.add(dev)
            np.asarray(jax.device_get(shard.data.ravel()[0]))
    return result


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 1, **kwargs):
    """Time ``fn(*args, **kwargs)``, returning ``(result, seconds_per_call)``.

    ``warmup`` calls are discarded (the first includes compilation);
    ``iters`` timed calls are averaged.  Every call is completion-forced
    via :func:`sync`.
    """
    result = None
    for _ in range(max(warmup, 0)):
        result = sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(max(iters, 1)):
        result = sync(fn(*args, **kwargs))
    dt = (time.perf_counter() - t0) / max(iters, 1)
    return result, dt


def time_fn_slope(fn: Callable, *args, k_lo: int = 2, k_hi: int = 10,
                  reps: int = 3, **kwargs):
    """Time ``fn`` with the single-call dispatch overhead removed:
    ``(result, cold_seconds, warm_seconds)`` where warm is the SLOPE of
    wall time over batched call count.

    On the tunneled TPU a single dispatched call carries a ~50-60 ms
    host-device round-trip, so one-call timings of sub-60 ms metric
    evaluations all read the same floor (round-3 finding: every model at
    every horizon "took" 0.062-0.066 s while the quat13 evaluator's real
    device time was 9.4 ms).  Here two batches of ``k_lo`` and ``k_hi``
    queued calls are timed — their scalar results are SUMMED and the sum
    is read back, which completion-barriers every call in the batch (the
    device stream is FIFO and the sum depends on all of them) — and the
    per-call time is ``(t_hi - t_lo) / (k_hi - k_lo)``: the constant
    dispatch overhead cancels.  Requires ``fn`` to return a pytree whose
    leaves can be summed (scalar metrics).  Backlog stays bounded
    (``k_hi`` small metric evals), respecting the platform rule against
    queueing large unconsumed executions.

    The pair is repeated ``reps`` times and the MEDIAN slope reported: a
    single tunnel hiccup during one batch corrupts that pair's slope, and
    with one pair the corrupted (possibly negative) value would land in
    blessed tables unflagged.  If the median itself is non-positive the
    measurement is untrustworthy and ``warm`` is returned as ``nan`` —
    never silently clamped to 0.0.
    """

    def batch(k):
        t0 = time.perf_counter()
        acc = None
        for _ in range(k):
            v = fn(*args, **kwargs)
            acc = v if acc is None else jax.tree.map(lambda a, b: a + b, acc, v)
        sync(acc)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    result = sync(fn(*args, **kwargs))
    cold = time.perf_counter() - t0
    batch(k_lo)  # settle caches/transfers before the timed pairs
    slopes = []
    for _ in range(max(reps, 1)):
        t_lo = batch(k_lo)
        t_hi = batch(k_hi)
        slopes.append((t_hi - t_lo) / (k_hi - k_lo))
    warm = float(np.median(slopes))
    if warm <= 0.0:
        warm = float("nan")
    return result, cold, warm


def time_fn_cold_warm(fn: Callable, *args, iters: int = 1, **kwargs):
    """Time ``fn`` twice: cold (first call, includes jit compilation) and
    warm (steady-state execution, averaged over ``iters``).

    Returns ``(result, cold_seconds, warm_seconds)``.  The reference's
    timing tables (``best_results.txt:795-809``) are steady-state CPU
    numbers; on TPU the first call is compile-dominated, so reporting a
    single bracketed time misrepresents both.  Blessed records report the
    two columns separately.
    """
    t0 = time.perf_counter()
    result = sync(fn(*args, **kwargs))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(max(iters, 1)):
        result = sync(fn(*args, **kwargs))
    warm = (time.perf_counter() - t0) / max(iters, 1)
    return result, cold, warm
