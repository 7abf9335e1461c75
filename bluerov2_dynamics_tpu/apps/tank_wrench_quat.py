"""Quaternion workload (T4): Koopman vs quat-Fossen vs quat-DI.

Rebuild of ``/root/reference/training/train_tank_brov2_wrench_quat.py``:
13-state quaternion dataset (legacy Euler CSVs auto-converted), Koopman
(13, 6), the quaternion wrench-input Fossen model
(``fossen/BlueROV2_wrench.py``) with per-step quaternion renormalization,
and the quaternion double integrator; identical endpoint evaluator.
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


def synthetic_quat_dataset(args) -> csv_loader.Dataset:
    """Synthetic fallback: euler12 simulation converted to quat13 + wrench."""
    from bluerov2_dynamics_tpu.data.wrench import thrusters_to_wrench
    from bluerov2_dynamics_tpu.data.csv_loader import euler_to_quat_np

    ds = common.load_or_generate(args, csv_loader.load_thruster_dataset)
    q = euler_to_quat_np(ds.X[:, 3], ds.X[:, 4], ds.X[:, 5])
    X13 = np.concatenate([ds.X[:, 0:3], q, ds.X[:, 6:12]], axis=1)
    return csv_loader.Dataset(X=X13, U=thrusters_to_wrench(ds.U), t=ds.t, dt=ds.dt)


def main(argv=None):
    ap = common.base_parser(__doc__)
    common.add_sysid_args(ap)
    args = ap.parse_args(argv)

    if args.synthetic or args.csv is None:
        ds = synthetic_quat_dataset(args)
    else:
        # through load_or_generate so '--csv <directory>' search and
        # --csv-name work here like in the other tank apps
        ds = common.load_or_generate(args, csv_loader.load_quat_dataset)
    train, test = csv_loader.train_test_split(ds, args.train_split)
    info(f"Train: {len(train.X)} | Test: {len(test.X)}")
    dt = float(ds.dt)

    X_tr = jnp.asarray(train.X, jnp.float32)
    U_tr = jnp.asarray(train.U, jnp.float32)
    X_te = jnp.asarray(test.X, jnp.float32)
    U_te = jnp.asarray(test.U, jnp.float32)

    model, t_koop_cold, t_koop = common.fit_koopman_from_args(
        args, jax.random.PRNGKey(args.seed), X_tr, U_tr,
        loader=csv_loader.load_quat_dataset,
    )
    common.summarize_fit("Koopman (quat)", t_koop_cold, t_koop)
    gains, t_di_cold, t_di = time_fn_cold_warm(
        lambda: di.estimate_gains(X_tr, U_tr, dt))
    common.summarize_fit("Double Integrator (quat)", t_di_cold, t_di)

    p = fossen_params()
    fossen_step = fossen.make_wrench_step(p, dt, method="euler", state="quat13")
    di_step = di.make_step_quat13(gains, dt)

    # Fossen baseline: quat13 VMEM Pallas evaluator on TPU, XLA scan
    # elsewhere (shared policy; interpret-parity in test_pallas_quat.py,
    # hardware-verified: exact RMSE vs scan, 9.4 ms warm at H=100 on the
    # 9.1k-start tank shape vs ~60 ms for the scan)
    from bluerov2_dynamics_tpu.ops.pallas_quat import (
        make_endpoint_final_pallas_quat,
    )

    fossen_eval = common.endpoint_evaluator_with_pallas(
        X_te, U_te,
        build_pallas=lambda H: make_endpoint_final_pallas_quat(
            p, dt, H, method="euler"
        ),
        scan_eval=lambda H: metrics.endpoint_rmse(fossen_step, X_te, U_te, H),
    )

    def koopman_eval(H: int):
        # The shared jitted evaluator (HIGHEST-precision propagation,
        # NaN for H >= test length) with the reference's quat renorm
        # before scoring (train_tank_brov2_wrench_quat.py:466-467).
        # The round-3 app-local copy of this logic was un-jitted (~1.2 s
        # per call over the tunnel) and ran at default-bf16 precision —
        # one code path now (models/koopman.py:multistep_rmse).
        return koopman.multistep_rmse(
            model, X_te, U_te, H, post_decode=fossen.renormalize_quat13,
            method=common.koopman_method(args))

    evaluators = {
        "Koopman (quat)": koopman_eval,
        "Fossen (quat)": fossen_eval,
        "DI (quat)": lambda H: metrics.endpoint_rmse(di_step, X_te, U_te, H),
    }
    fit_res = common.fit_fossen_from_args(
        args, X_tr, U_tr, dt, kind="wrench", state="quat13")
    if fit_res is not None:
        fitted_step = fossen.make_wrench_step(
            fit_res.params, dt, method="euler", state="quat13")
        evaluators["Fossen (fitted)"] = common.endpoint_evaluator_with_pallas(
            X_te, U_te,
            build_pallas=lambda H: make_endpoint_final_pallas_quat(
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
                "KOOPMAN (quat)": predK,
                "FOSSEN (quat)": np.asarray(predF),
                "DI (quat)": np.asarray(predD),
            },
            dt=dt,
            save_path=f"{args.media_dir}/tank_wrench_quat_comparison.gif",
            title="Quaternion state: True vs. Koopman / Fossen / DI",
            ncols=2,
        )
    return {"koopman": predK, "fossen": np.asarray(predF), "di": np.asarray(predD)}


if __name__ == "__main__":
    main()
