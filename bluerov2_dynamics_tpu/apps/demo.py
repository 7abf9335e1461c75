"""Physics demos: the reference's executable consistency checks.

Rebuild of ``/root/reference/fossen/test_euler.py`` (explicit Euler loop
printing the pose each step) and ``fossen/test_ode.py`` (implicit-solver
integration with optional tether).  Both should yield consistent results
(``fossen/README.md:31``) — here the "ODE" path is the jitted substepped
RK4 rollout, optionally cross-checked against scipy BDF with ``--bdf``.

Usage::

    python -m bluerov2_dynamics_tpu.apps.demo euler
    python -m bluerov2_dynamics_tpu.apps.demo ode [--tether] [--bdf]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.models import fossen, tether
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config

U_DEMO = (0.1, 0.1, 0.1, 0.0, 0.5, 0.5, 0.5, 0.5)


def _print_pose(t, x):
    print(
        f"Time={t:.2f}, pos=({x[0]:.2f}, {x[1]:.2f}, {x[2]:.2f}, "
        f"{x[3]:.2f}, {x[4]:.2f}, {x[5]:.2f})"
    )


def run_euler(dt=0.01, t_end=5.0, print_every=1):
    p = fossen_params()
    cfg = thruster_config()
    lag = lag_params(dt)
    n = int(t_end / dt)
    x0 = jnp.zeros(12).at[2].set(5.0)
    U = jnp.broadcast_to(jnp.asarray(U_DEMO), (n, 8))
    print(f"Starting Euler integration for t=[0...{t_end}] at dt={dt}")
    traj = np.asarray(fossen.simulate_thruster(p, cfg, lag, x0, U, dt, method="euler"))
    for k in range(1, n + 1, print_every):
        _print_pose(k * dt, traj[k])
    return traj


def run_ode(dt=0.01, t_end=5.0, use_tether=False, bdf_check=False, print_every=100):
    p = fossen_params()
    cfg = thruster_config()
    lag = lag_params(dt)
    n = int(t_end / dt)
    x0 = jnp.zeros(12).at[2].set(5.0)
    U = jnp.broadcast_to(jnp.asarray(U_DEMO), (n, 8))
    print(f"Starting substepped-RK4 integration for t=[0...{t_end}] at dt={dt}"
          + (" with tether" if use_tether else ""))
    if use_tether:
        tcfg = tether.TetherConfig(n_segments=3, length=20.0)
        anchor = jnp.zeros(3)
        x_teth = tether.init_nodes_line(tcfg, np.zeros(3), np.array([0.0, 0.0, 5.0]))
        x_ext0 = jnp.concatenate([x0, x_teth])
        traj = np.asarray(
            tether.simulate_with_tether(p, cfg, lag, tcfg, anchor, x_ext0, U, dt)
        )
    else:
        step = fossen.make_thruster_step(p, cfg, lag, dt, method="rk4")
        from bluerov2_dynamics_tpu.ops.integrators import rollout

        (_, _), (traj, _) = rollout(
            step, (x0, jnp.zeros((8, 3))), U, include_initial=True
        )
        traj = np.asarray(traj)
    for k in range(0, n + 1, print_every):
        _print_pose(k * dt, traj[k])

    if bdf_check and not use_tether:
        from scipy.integrate import solve_ivp

        from bluerov2_dynamics_tpu.models.thrusters import thruster_wrench_nolag

        tau = thruster_wrench_nolag(cfg, jnp.asarray(U_DEMO))
        rhs = jax.jit(lambda x: fossen.wrench_rhs_euler(p, x, tau))
        sol = solve_ivp(
            lambda t, x: np.asarray(rhs(jnp.asarray(x))),
            (0.0, t_end), np.zeros(12) + np.asarray(x0),
            method="BDF", rtol=3e-6, atol=1e-7,
        )
        print(f"[i] BDF endpoint pos: {sol.y[0:3, -1]}")
    return traj


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["euler", "ode"])
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--t-end", type=float, default=5.0)
    ap.add_argument("--tether", action="store_true")
    ap.add_argument("--bdf", action="store_true")
    args = ap.parse_args(argv)
    if args.mode == "euler":
        return run_euler(args.dt, args.t_end)
    return run_ode(args.dt, args.t_end, args.tether, args.bdf)


if __name__ == "__main__":
    main()
