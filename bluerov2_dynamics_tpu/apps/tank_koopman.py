"""Tank workload (T2): Koopman identification on a recorded tank dataset.

Rebuild of ``/root/reference/training/train_tank_brov2_koopmanEDMDc.py``:
load the 50 Hz tank CSV (thruster contract), fit Koopman with 500 RBFs /
gamma=3 / ridge=0.1, report endpoint RMSE at H = 1/10/100, render a
500-step open-loop GIF.  ``--physics-baseline`` additionally evaluates the
Fossen model through the identical evaluator (present but unused in the
reference's main, ``train_tank_brov2_koopmanEDMDc.py:222-283``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.apps import common
from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.models import fossen, koopman
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config
from bluerov2_dynamics_tpu.utils.log import info, ok


def fossen_evaluator(dt, X_test, U_test, method="euler", p=None, cfg=None):
    """fn(H) -> endpoint RMSE of the full thruster-input physics model.

    On TPU the VMEM-resident Pallas evaluator is used (35x faster than the
    XLA scan at H=100); elsewhere the scan evaluator runs.  ``p``/``cfg``
    default to the nominal Table A1 set; passing fitted values (e.g. a
    ``sysid.fit_thruster`` result) evaluates the calibrated model through
    the identical path — the Pallas kernels bake whatever concrete
    coefficients they are built with.
    """
    from bluerov2_dynamics_tpu.ops.pallas_eval import make_endpoint_final_pallas

    p = p if p is not None else fossen_params()
    cfg = cfg if cfg is not None else thruster_config()
    lag = lag_params(dt)
    step = fossen.make_thruster_step(p, cfg, lag, dt, method=method)
    return common.endpoint_evaluator_with_pallas(
        X_test, U_test,
        build_pallas=lambda H: make_endpoint_final_pallas(
            p, cfg, lag, dt, H, method=method
        ),
        scan_eval=lambda H: metrics.endpoint_rmse_carry(
            step,
            lambda x: jnp.zeros((*x.shape[:-1], 8, 3), x.dtype),
            X_test, U_test, H,
        ),
    )


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.add_argument("--physics-baseline", action="store_true")
    ap.add_argument("--decoder", action="store_true",
                    help="learn a linear decoder x ~ W z instead of the "
                         "first-n-coordinates readout (the reference's "
                         "commented-out capability, koopmanEDMDc.py:105-111)")
    ap.add_argument("--save-model", type=str, default=None,
                    help="save the fitted Koopman model (centers, gamma, "
                         "A, B, optional decoder/weights) as .npz")
    ap.add_argument("--load-model", type=str, default=None,
                    help="load a previously saved model instead of fitting "
                         "(the Koopman analogue of the reference's PINc "
                         "checkpoint skip-if-exists flow)")
    common.add_sysid_args(ap)
    args = ap.parse_args(argv)

    ds = common.load_or_generate(args, csv_loader.load_thruster_dataset)
    train, test = csv_loader.train_test_split(ds, args.train_split)
    info(f"Train: {len(train.X)} | Test: {len(test.X)}")

    if args.load_model:
        info(f"Loading Koopman model: {args.load_model}")
        model = koopman.load_model(args.load_model)
        t_fit_cold = t_fit = 0.0
    else:
        model, t_fit_cold, t_fit = common.fit_koopman_from_args(
            args, jax.random.PRNGKey(args.seed),
            jnp.asarray(train.X, jnp.float32), jnp.asarray(train.U, jnp.float32),
            loader=csv_loader.load_thruster_dataset,
        )
    common.summarize_fit("Koopman", t_fit_cold, t_fit)
    if args.decoder:
        model = koopman.fit_decoder(model, jnp.asarray(train.X, jnp.float32))
        info("Learned linear decoder fitted (x ~ W z readout).")
    if args.save_model:
        koopman.save_model(args.save_model, model)
        ok(f"Saved Koopman model -> {args.save_model}")

    X_test = jnp.asarray(test.X, jnp.float32)
    U_test = jnp.asarray(test.U, jnp.float32)
    k_method = common.koopman_method(args)
    evaluators = {
        "Koopman": lambda H: koopman.multistep_rmse(model, X_test, U_test, H,
                                                    method=k_method),
    }
    if args.physics_baseline:
        evaluators["Fossen (BlueROV2)"] = fossen_evaluator(
            float(ds.dt), jnp.asarray(test.X), jnp.asarray(test.U)
        )
    fit_res = common.fit_fossen_from_args(
        args, jnp.asarray(train.X, jnp.float32), jnp.asarray(train.U, jnp.float32),
        float(ds.dt), kind="thruster",
    )
    if fit_res is not None:
        evaluators["Fossen (fitted)"] = fossen_evaluator(
            float(ds.dt), X_test, U_test, p=fit_res.params, cfg=fit_res.cfg
        )
    common.timed_metric_table(evaluators)

    start, horizon = common.open_loop_window(test.X, args.open_loop_steps)
    pred = np.asarray(
        koopman.simulate(model, X_test[start], U_test[start : start + horizon])
    )
    true = test.X[start : start + horizon + 1]
    if not args.no_media:
        from bluerov2_dynamics_tpu.viz import animate_topdown

        animate_topdown(
            {"TRUE (Recorded)": true, "KOOPMAN": pred},
            dt=float(ds.dt),
            save_path=f"{args.media_dir}/tank_true_vs_koopman.gif",
            title="Tank recording: True vs. Koopman (top view)",
        )
    ok("done")
    return {"pred": pred, "true": true}


if __name__ == "__main__":
    main()
