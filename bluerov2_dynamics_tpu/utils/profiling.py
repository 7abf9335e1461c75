"""Profiling and numerical-hygiene utilities.

TPU-native replacements for the reference's auxiliary practices
(SURVEY.md §5): ``perf_counter`` tables become ``jax.profiler`` traces +
synchronized steps/sec counters; the loaders' inf/NaN hygiene becomes an
explicit finite-check usable inside evaluation harnesses (alongside
``jax.config.update('jax_debug_nans', True)`` for hard failure).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepsPerSecond:
    """Throughput counter: ``with StepsPerSecond(n_steps) as c: ...``;
    synchronizes on a result pytree passed to ``c.done(result)``."""

    def __init__(self, steps: int):
        self.steps = steps
        self.rate = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def done(self, result):
        jax.block_until_ready(result)
        self.rate = self.steps / (time.perf_counter() - self._t0)
        return result

    def __exit__(self, *exc):
        return False


def check_finite(tree, name: str = "pytree") -> None:
    """Raise ``FloatingPointError`` if any leaf contains non-finite values."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def fraction_nonfinite(tree) -> float:
    """Fraction of non-finite elements across all leaves (diagnostics)."""
    total = 0
    bad = 0
    for leaf in jax.tree.leaves(tree):
        arr = jnp.asarray(leaf)
        total += arr.size
        bad += int(jnp.sum(~jnp.isfinite(arr)))
    return bad / max(total, 1)
