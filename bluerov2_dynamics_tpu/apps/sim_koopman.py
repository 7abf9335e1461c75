"""Simulation workload (T1): generate data from the physics model, fit
Koopman EDMDc, report multi-step RMSE, render an open-loop comparison.

Rebuild of ``/root/reference/training/train_sim_brov2_koopmanEDMDc.py``:
AR(1)-driven Euler simulation with sensor noise, 80/20 causal split
(test starts at split-1), Koopman with 200 RBFs / gamma=1 / ridge=1e-3,
H = 1/10/100 endpoint RMSE, 200-step open-loop GIF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.apps import common
from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.data.synthetic import generate_sim_dataset
from bluerov2_dynamics_tpu.models import koopman
from bluerov2_dynamics_tpu.utils.log import info, ok


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.set_defaults(n_rbfs=200, gamma=1.0, ridge=1e-3, steps=48_000, dt=0.05)
    ap.add_argument("--demo-steps", type=int, default=200)
    args = ap.parse_args(argv)
    if getattr(args, "extra_csv", None):
        raise SystemExit(
            "--extra-csv applies to the tank workloads; the simulation "
            "workload (T1) generates its own dataset and would silently "
            "ignore the extra recordings."
        )

    sim = generate_sim_dataset(
        jax.random.PRNGKey(args.seed), n_steps=args.steps, dt=args.dt
    )
    ds = csv_loader.Dataset(
        X=np.asarray(sim.X, np.float64), U=np.asarray(sim.U, np.float64),
        t=np.arange(args.steps) * args.dt, dt=args.dt,
    )
    train, test = csv_loader.train_test_split(
        ds, args.train_split, causal_overlap=True
    )
    info(f"Train: {len(train.X)} | Test: {len(test.X)}")

    model = koopman.fit(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(train.X), jnp.asarray(train.U),
        n_rbfs=args.n_rbfs, gamma=args.gamma, ridge=args.ridge,
    )
    jax.block_until_ready(model.A)
    ok("Model fitted!")

    X_test = jnp.asarray(test.X)
    U_test = jnp.asarray(test.U)
    print(f"One-step RMSE on test set: {float(koopman.evaluate(model, X_test, U_test)):.4f}")
    for H in (10, 100):
        r = float(koopman.multistep_rmse(model, X_test, U_test, H,
                                         method=common.koopman_method(args)))
        print(f"{H}-step RMSE on test set: {r:.4f}")

    horizon = min(args.demo_steps, len(test.X) - 1)
    pred = np.asarray(koopman.simulate(model, X_test[0], U_test[:horizon]))
    true = test.X[: horizon + 1]
    if not args.no_media:
        from bluerov2_dynamics_tpu.viz import animate_topdown

        animate_topdown(
            {"TRUE (BlueROV2)": true, "KOOPMAN PREDICTION": pred},
            dt=args.dt,
            save_path=f"{args.media_dir}/sim_true_vs_koopman.gif",
            title="Simulation: True vs. Koopman (top view)",
            speed=2.0,
        )
    return {"pred": pred, "true": true}


if __name__ == "__main__":
    main()
