"""Wrench workload, Euler state (T3): Koopman vs Fossen vs DI on 6D wrench
inputs.

Rebuild of ``/root/reference/training/train_tank_brov2_wrench_comp.py``:
the 12-state dataset with ``Fx..Mz`` inputs drives a Koopman(12,6) model,
the wrench-input Fossen model (``fossen/BlueROV2_thrust.py``) and a learned
double integrator; identical endpoint evaluator; multi-panel animation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.apps import common
from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.eval.timing import time_fn_cold_warm
from bluerov2_dynamics_tpu.models import di, fossen, koopman
from bluerov2_dynamics_tpu.models.params import fossen_params
from bluerov2_dynamics_tpu.ops.integrators import rollout
from bluerov2_dynamics_tpu.utils.log import info


def synthetic_wrench_dataset(args) -> csv_loader.Dataset:
    """Synthetic fallback: simulate with thrusters, expose wrench inputs via
    the effectiveness matrix (the R2 augmentation path)."""
    from bluerov2_dynamics_tpu.data.wrench import thrusters_to_wrench

    ds = common.load_or_generate(args, csv_loader.load_thruster_dataset)
    W = thrusters_to_wrench(ds.U)
    return csv_loader.Dataset(X=ds.X, U=W, t=ds.t, dt=ds.dt)


def main(argv=None):
    ap = common.base_parser(__doc__)
    common.add_sysid_args(ap)
    args = ap.parse_args(argv)

    if args.synthetic or args.csv is None:
        ds = synthetic_wrench_dataset(args)
    else:
        # through load_or_generate so '--csv <directory>' search and
        # --csv-name work here like in the other tank apps
        ds = common.load_or_generate(args, csv_loader.load_wrench_dataset)
    train, test = csv_loader.train_test_split(ds, args.train_split)
    info(f"Train: {len(train.X)} | Test: {len(test.X)}")
    dt = float(ds.dt)

    X_tr = jnp.asarray(train.X, jnp.float32)
    U_tr = jnp.asarray(train.U, jnp.float32)
    X_te = jnp.asarray(test.X, jnp.float32)
    U_te = jnp.asarray(test.U, jnp.float32)

    model, t_koop_cold, t_koop = common.fit_koopman_from_args(
        args, jax.random.PRNGKey(args.seed), X_tr, U_tr,
        loader=csv_loader.load_wrench_dataset,
    )
    common.summarize_fit("Koopman", t_koop_cold, t_koop)
    gains, t_di_cold, t_di = time_fn_cold_warm(
        lambda: di.estimate_gains(X_tr, U_tr, dt))
    common.summarize_fit("Double Integrator", t_di_cold, t_di)

    p = fossen_params()
    fossen_step = fossen.make_wrench_step(p, dt, method="euler", state="euler12")
    di_step = di.make_step_euler12(gains, dt)

    # Fossen baseline: VMEM-resident Pallas evaluator on TPU, XLA scan
    # elsewhere (shared policy; parity tested in test_pallas_eval.py)
    from bluerov2_dynamics_tpu.ops.pallas_eval import (
        make_endpoint_final_pallas_wrench,
    )

    fossen_eval = common.endpoint_evaluator_with_pallas(
        X_te, U_te,
        build_pallas=lambda H: make_endpoint_final_pallas_wrench(
            p, dt, H, method="euler"
        ),
        scan_eval=lambda H: metrics.endpoint_rmse(fossen_step, X_te, U_te, H),
    )

    k_method = common.koopman_method(args)
    evaluators = {
        "Koopman": lambda H: koopman.multistep_rmse(model, X_te, U_te, H,
                                                    method=k_method),
        "Fossen (wrench)": fossen_eval,
        "Double Integrator": lambda H: metrics.endpoint_rmse(di_step, X_te, U_te, H),
    }
    fit_res = common.fit_fossen_from_args(args, X_tr, U_tr, dt, kind="wrench")
    if fit_res is not None:
        fitted_step = fossen.make_wrench_step(
            fit_res.params, dt, method="euler", state="euler12")
        evaluators["Fossen (fitted)"] = common.endpoint_evaluator_with_pallas(
            X_te, U_te,
            build_pallas=lambda H: make_endpoint_final_pallas_wrench(
                fit_res.params, dt, H, method="euler"
            ),
            scan_eval=lambda H: metrics.endpoint_rmse(fitted_step, X_te, U_te, H),
        )
    common.timed_metric_table(evaluators)

    start, horizon = common.open_loop_window(test.X, args.open_loop_steps)
    x0 = X_te[start]
    U_seq = U_te[start : start + horizon]
    predK = np.asarray(koopman.simulate(model, x0, U_seq))
    _, predF = rollout(fossen_step, x0, U_seq, include_initial=True)
    _, predD = rollout(di_step, x0, U_seq, include_initial=True)
    true = test.X[start : start + horizon + 1]

    if not args.no_media:
        from bluerov2_dynamics_tpu.viz import animate_topdown

        animate_topdown(
            {
                "TRUE (Recorded)": true,
                "KOOPMAN": predK,
                "FOSSEN (wrench)": np.asarray(predF),
                "DOUBLE INTEGRATOR": np.asarray(predD),
            },
            dt=dt,
            save_path=f"{args.media_dir}/tank_wrench_comparison.gif",
            title="Wrench inputs: True vs. Koopman / Fossen / DI",
            ncols=2,
        )
    return {"koopman": predK, "fossen": np.asarray(predF), "di": np.asarray(predD)}


if __name__ == "__main__":
    main()
