"""Fixed-step integrators and scanned rollouts (natively batched).

The reference integrates with explicit Euler loops
(``/root/reference/training/train_tank_brov2_full_comparison.py:453-466``)
and classic RK4 (``training/train_tank_brov2_rk4.py:375-396``), one Python
iteration per time step.  Here a rollout is a single ``lax.scan`` over
time; the state may carry arbitrary batch dimensions, so thousands of
trajectories advance per scan step in one fused XLA kernel.

``rhs`` signature: ``rhs(x, u) -> xdot`` where ``x`` is ``(..., n)`` and
``u`` broadcasts against it.  Steps are pure; any auxiliary state (e.g.
thruster-lag filters) lives in the scan carry of the model-level steppers
in :mod:`bluerov2_dynamics_tpu.models.fossen`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def euler_step(rhs: Callable, x, u, dt):
    """Explicit Euler: x + dt * f(x, u)."""
    return x + dt * rhs(x, u)


def rk4_step(rhs: Callable, x, u, dt):
    """Classic fourth-order Runge-Kutta with input held constant over the step.

    Matches the stage structure of ``training/train_tank_brov2_rk4.py:375-396``
    (u is zero-order-held across the four stages).
    """
    k1 = rhs(x, u)
    k2 = rhs(x + 0.5 * dt * k1, u)
    k3 = rhs(x + 0.5 * dt * k2, u)
    k4 = rhs(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPS = {"euler": euler_step, "rk4": rk4_step}


def rollout_stepper(
    rhs: Callable,
    dt: float,
    method: str = "euler",
    postprocess: Optional[Callable] = None,
    substeps: int = 1,
):
    """Build a discrete step ``x_{k+1} = F(x_k, u_k)`` from a continuous RHS.

    Parameters
    ----------
    rhs : ``rhs(x, u) -> xdot``
    dt : outer step size.
    method : 'euler' or 'rk4'.
    postprocess : optional hook applied to the state after each outer step
        (e.g. quaternion renormalization, mirroring
        ``training/train_tank_brov2_wrench_quat.py:262-265``).
    substeps : integrate ``substeps`` inner steps of size ``dt/substeps``
        per outer step (for stiff dynamics such as the tether, where the
        reference resorts to an implicit BDF solver,
        ``fossen/test_ode.py:43-50``).
    """
    try:
        stepper = _STEPS[method]
    except KeyError:
        raise ValueError(f"unknown method {method!r}; expected one of {sorted(_STEPS)}")
    h = dt / substeps

    def step(x, u):
        if substeps == 1:
            x = stepper(rhs, x, u, h)
        else:
            def body(i, x):
                return stepper(rhs, x, u, h)
            x = jax.lax.fori_loop(0, substeps, body, x)
        if postprocess is not None:
            x = postprocess(x)
        return x

    return step


def rollout(step: Callable, carry0, us, include_initial: bool = False, unroll: int = 1):
    """Scan ``step(carry, u) -> carry`` over the leading (time) axis of ``us``.

    Returns ``(final_carry, trajectory)`` where ``trajectory`` stacks the
    carry after every step; with ``include_initial=True`` the initial carry
    is prepended (shape ``(T+1, ...)``), matching the reference rollouts
    that store x0 in row 0
    (``training/train_tank_brov2_full_comparison.py:453-466``).
    """

    def body(carry, u):
        carry = step(carry, u)
        return carry, carry

    final_carry, traj = jax.lax.scan(body, carry0, us, unroll=unroll)
    if include_initial:
        traj = jax.tree.map(
            lambda x0, tr: jnp.concatenate([x0[None], tr], axis=0), carry0, traj
        )
    return final_carry, traj
