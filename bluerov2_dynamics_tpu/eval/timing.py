"""Wall-clock timing harness for jitted computations.

Replaces the reference's ``perf_counter`` bracketing
(``train_tank_brov2_full_comparison.py:928-930, 977-1009``) with a
``block_until_ready``-correct version: JAX dispatch is asynchronous, so
timings must synchronise on the result.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 1, **kwargs):
    """Time ``fn(*args, **kwargs)``, returning ``(result, seconds_per_call)``.

    ``warmup`` calls are discarded (the first includes compilation);
    ``iters`` timed calls are averaged.  All calls synchronise via
    ``block_until_ready`` on the output pytree.
    """
    result = None
    for _ in range(max(warmup, 0)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(max(iters, 1)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    dt = (time.perf_counter() - t0) / max(iters, 1)
    return result, dt


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
    result = jax.block_until_ready(fn(*args, **kwargs))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(max(iters, 1)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    warm = (time.perf_counter() - t0) / max(iters, 1)
    return result, cold, warm
