"""Implicit fixed-step integrators (jitted Newton iterations).

The reference integrates the stiff coupled ROV+tether system with scipy's
implicit BDF solver (``fossen/test_ode.py:43-50``) — adaptive host-side
control flow that cannot live under ``jit``.  These A-stable fixed-step
implicit rules are the compiled-friendly alternative: a fixed number of
Newton iterations per step, with the Jacobian from ``jax.jacfwd`` and a
dense solve (the coupled state is small: 12 + 6(n-1)).

For non-stiff paths prefer the explicit steppers in
:mod:`bluerov2_dynamics_tpu.ops.integrators`; for the tether the
substepped RK4 in :mod:`..models.tether` is usually fastest — use these
when unconditional stability at large dt matters.  Method choice: the
trapezoidal rule is A- but not L-stable, so undamped stiff oscillations
(the tether's axial modes) ring at large dt; **backward Euler** is the
robust choice there (validated against the substepped solution in
tests/test_implicit.py).

Steps operate on a single 1-D state; batch with ``jax.vmap``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _newton_solve(g: Callable, y0, iters: int):
    def body(i, y):
        J = jax.jacfwd(g)(y)
        return y - jnp.linalg.solve(J, g(y))

    return jax.lax.fori_loop(0, iters, body, y0)


def backward_euler_step(rhs: Callable, x, u, dt, newton_iters: int = 6):
    """Implicit (backward) Euler: solve ``y = x + dt f(y, u)``.

    First order, L-stable — the robust choice for very stiff transients.
    """
    def g(y):
        return y - x - dt * rhs(y, u)

    return _newton_solve(g, x + dt * rhs(x, u), newton_iters)


def trapezoidal_step(rhs: Callable, x, u, dt, newton_iters: int = 6):
    """Implicit trapezoidal rule: solve ``y = x + dt/2 (f(x,u) + f(y,u))``.

    Second order, A-stable (the fixed-step analogue of the reference's
    BDF usage for the tether).
    """
    f0 = rhs(x, u)

    def g(y):
        return y - x - 0.5 * dt * (f0 + rhs(y, u))

    return _newton_solve(g, x + dt * f0, newton_iters)


def make_implicit_step(
    rhs: Callable,
    dt: float,
    method: str = "trapezoidal",
    newton_iters: int = 6,
):
    """Build ``step(x, u) -> x'`` using an implicit rule."""
    steppers = {
        "trapezoidal": trapezoidal_step,
        "backward_euler": backward_euler_step,
    }
    if method not in steppers:
        raise ValueError(f"unknown method {method!r}; expected one of "
                         f"{sorted(steppers)}")
    stepper = steppers[method]

    def step(x, u):
        return stepper(rhs, x, u, dt, newton_iters)

    return step
