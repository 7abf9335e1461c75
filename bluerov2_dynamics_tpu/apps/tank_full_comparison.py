"""Flagship comparison (T6): Koopman + Fossen + DI + PINc, fully timed.

Rebuild of ``/root/reference/training/train_tank_brov2_full_comparison.py``:
four models on the thruster-input tank dataset, timed fit / H=1,10,100
metrics / open-loop rollouts, multi-panel animation and 2D figure.  PINc
weights are checkpointed (msgpack); training is skipped when the
checkpoint exists, matching the reference's flow
(``train_tank_brov2_full_comparison.py:944-969``).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.apps import common
from bluerov2_dynamics_tpu.apps.tank_koopman import fossen_evaluator
from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.eval import metrics
from bluerov2_dynamics_tpu.eval.timing import time_fn, time_fn_cold_warm
from bluerov2_dynamics_tpu.models import di, fossen, koopman, pinc
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config
from bluerov2_dynamics_tpu.utils.checkpoint import load_pytree, save_pytree
from bluerov2_dynamics_tpu.utils.log import info, ok


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.add_argument("--pinc-epochs", type=int, default=200)
    ap.add_argument("--pinc-ckpt", type=str, default="models/pinc_best.msgpack")
    ap.add_argument("--pinc-hidden", type=int, nargs="+", default=[64, 64, 64, 64])
    ap.add_argument("--pinc-normalize", action="store_true",
                    help="standardize PINc inputs (improvement over the reference)")
    ap.add_argument("--pinc-position-invariant", action="store_true",
                    help="mask x,y,z from the PINc MLP input (improvement)")
    ap.add_argument("--pinc-lr-schedule", choices=["const", "cosine"],
                    default="const",
                    help="PINc learning-rate schedule (cosine = improvement)")
    ap.add_argument("--pinc-ckpt-unsafe-unpickle", action="store_true",
                    help="allow FULL unpickling of a --pinc-ckpt .pt file "
                         "that is not a weights-only state_dict (runs "
                         "arbitrary code from the file; trusted files only)")
    ap.add_argument("--pinc-dp", type=int, default=1, metavar="N",
                    help="data-parallel PINc training over a mesh of the "
                         "first N local devices (1 = single-device)")
    ap.add_argument("--pinc-psi-ssa", action="store_true",
                    help="also report PINc RMSE with the yaw error wrapped to "
                         "the smallest signed angle (the reference scores raw "
                         "unwrapped psi)")
    ap.add_argument("--integrator", choices=["euler", "rk4"], default="euler")
    ap.add_argument("--media-prefix", type=str, default="",
                    help="filename prefix for saved media (lets the RK4 "
                         "workload keep separate artifacts)")
    ap.add_argument("--json-out", type=str, default=None,
                    help="write metrics + timings as JSON to this path "
                         "(machine-readable run record)")
    common.add_sysid_args(ap)
    args = ap.parse_args(argv)

    ds = common.load_or_generate(args, csv_loader.load_thruster_dataset)
    train, test = csv_loader.train_test_split(ds, args.train_split)
    info(f"Train: {len(train.X)} | Test: {len(test.X)}")
    dt = float(ds.dt)

    X_tr = jnp.asarray(train.X, jnp.float32)
    U_tr = jnp.asarray(train.U, jnp.float32)
    X_te = jnp.asarray(test.X, jnp.float32)
    U_te = jnp.asarray(test.U, jnp.float32)

    # ---------------- fits (timed) ----------------
    model, t_koop_cold, t_koop = common.fit_koopman_from_args(
        args, jax.random.PRNGKey(args.seed), X_tr, U_tr,
        loader=csv_loader.load_thruster_dataset,
    )
    common.summarize_fit("Koopman", t_koop_cold, t_koop)

    gains, t_di_cold, t_di = time_fn_cold_warm(
        lambda: di.estimate_gains(X_tr, U_tr, dt, ridge=1e-3)
    )
    common.summarize_fit("Double Integrator", t_di_cold, t_di)

    cfg = thruster_config()
    lag = lag_params(dt)
    hidden = tuple(args.pinc_hidden)
    ckpt = Path(args.pinc_ckpt)
    import numpy as _np

    sidecar = ckpt.with_suffix(ckpt.suffix + ".json")
    if ckpt.exists() and ckpt.suffix == ".pt":
        # torch state-dict checkpoint — e.g. the reference's shipped
        # models/pinc_best.pt (train_tank_brov2_full_comparison.py:948-969)
        info(f"Importing torch PINc checkpoint: {ckpt}")
        net, params = pinc.load_torch_checkpoint(
            ckpt, hidden, allow_full_unpickle=args.pinc_ckpt_unsafe_unpickle)
        t_pinc = 0.0
    elif ckpt.exists():
        import json

        info(f"Loading PINc checkpoint: {ckpt}")
        pi_flag = args.pinc_position_invariant
        if sidecar.exists():
            # the training configuration travels with the checkpoint —
            # params trained with masked (position-invariant) inputs are
            # silently wrong if scored through an unmasked net, and vice
            # versa, so the sidecar overrides the CLI flags on load
            meta = json.loads(sidecar.read_text())
            hidden = tuple(meta.get("hidden", hidden))
            pi_flag = bool(meta.get("position_invariant", pi_flag))
            if pi_flag != args.pinc_position_invariant:
                info(f"Checkpoint sidecar overrides --pinc-position-invariant"
                     f" -> {pi_flag} (trained that way)")
            tuned = [
                k for k, ref_val in (("normalize", False),
                                     ("position_invariant", False),
                                     ("lr_schedule", "const"))
                if meta.get(k, ref_val) != ref_val
            ]
            if tuned:
                # defaults stay reference-faithful elsewhere; make it loud
                # when the default checkpoint path carries a tuned model
                print("[notice] Loaded a TUNED (non-reference) PINc "
                      f"checkpoint: {', '.join(tuned)} differ from the "
                      "reference training configuration. Delete the "
                      "checkpoint (or point --pinc-ckpt elsewhere) to "
                      "retrain reference-faithfully.")
        _, params0 = pinc.init_params(jax.random.PRNGKey(args.seed + 1), hidden)
        ckpt_like = {"params": params0, "norm_mu": _np.zeros(14),
                     "norm_sigma": _np.ones(14)}
        restored = load_pytree(ckpt, ckpt_like)
        params = restored["params"]
        net, _ = pinc.init_params(
            jax.random.PRNGKey(args.seed + 1), hidden,
            norm_mu=restored["norm_mu"], norm_sigma=restored["norm_sigma"],
            position_invariant=pi_flag,
        )
        t_pinc = 0.0
    elif ckpt.suffix == ".pt":
        # a missing .pt path must NOT fall into the train branch: the
        # trained msgpack bytes would be saved under the .pt name and the
        # import branch above would try to torch.load them on the next run
        raise SystemExit(
            f"--pinc-ckpt {ckpt}: .pt paths are for importing an existing "
            "torch checkpoint (e.g. the reference's models/pinc_best.pt), "
            "but the file does not exist. To train and checkpoint, pass a "
            ".msgpack path."
        )
    else:
        import json

        info("Training PINc (no checkpoint found).")
        data = pinc.make_dataset(X_tr, U_tr, dt, cfg, lag)
        tc = pinc.TrainConfig(
            epochs=args.pinc_epochs,
            normalize=args.pinc_normalize,
            position_invariant=args.pinc_position_invariant,
            lr_schedule=args.pinc_lr_schedule,
        )

        mesh = None
        if args.pinc_dp > 1:
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < args.pinc_dp:
                raise SystemExit(f"--pinc-dp {args.pinc_dp}: only "
                                 f"{len(devs)} devices available")
            mesh = Mesh(_np.array(devs[:args.pinc_dp]), ("data",))
            info(f"PINc DP training over {args.pinc_dp} devices")

        def train_pinc():
            return pinc.train(jax.random.PRNGKey(args.seed + 1), data, tc,
                              hidden, mesh=mesh)

        (net, params, _hist), t_pinc = time_fn(train_pinc, warmup=0)
        save_pytree(ckpt, {
            "params": params,
            "norm_mu": _np.asarray(net.norm_mu, _np.float64),
            "norm_sigma": _np.asarray(net.norm_sigma, _np.float64),
        })
        sidecar.write_text(json.dumps({
            "hidden": list(hidden),
            "normalize": args.pinc_normalize,
            "position_invariant": args.pinc_position_invariant,
            "lr_schedule": args.pinc_lr_schedule,
            "epochs": args.pinc_epochs,
        }))
        ok(f"Saved PINc checkpoint -> {ckpt} (+ config sidecar)")
    ok(f"PINc ready. (fit/load time = {t_pinc:.3f} s)")

    print("\n[timings] Train/Fit, warm (s): "
          f"Koopman {t_koop:.4f} | Fossen 0.0000 | DI {t_di:.4f} | PINc {t_pinc:.4f}")
    print("[timings] Train/Fit, cold incl. compile (s): "
          f"Koopman {t_koop_cold:.4f} | Fossen 0.0000 | DI {t_di_cold:.4f}")

    # ---------------- metrics ----------------
    U4_te = pinc.wrench4_from_thrusters(cfg, lag, U_te)
    # build step closures ONCE so the jit caches keyed on them stay warm
    di_step = (
        di.make_step_euler12(gains, dt)
        if args.integrator == "euler"
        else di.make_step_euler12_rk4(gains, dt)
    )
    k_method = common.koopman_method(args)
    evaluators = {
        "Koopman": lambda H: koopman.multistep_rmse(model, X_te, U_te, H,
                                                    method=k_method),
        "Fossen (BlueROV2)": fossen_evaluator(dt, X_te, U_te, method=args.integrator),
        "Double Integrator": lambda H: metrics.endpoint_rmse(di_step, X_te, U_te, H),
        "PINc (ResDNN)": lambda H: pinc.endpoint_rmse(net, params, X_te, U4_te, dt, H),
    }
    if args.pinc_psi_ssa:
        evaluators["PINc (ssa psi)"] = lambda H: pinc.endpoint_rmse(
            net, params, X_te, U4_te, dt, H, psi_error="ssa"
        )
    fit_res = common.fit_fossen_from_args(
        args, X_tr, U_tr, dt, kind="thruster", method=args.integrator)
    if fit_res is not None:
        evaluators["Fossen (fitted)"] = fossen_evaluator(
            dt, X_te, U_te, method=args.integrator,
            p=fit_res.params, cfg=fit_res.cfg,
        )
    rmses, times = common.timed_metric_table(evaluators)
    if args.json_out:
        import json

        payload = {
            "dataset": {"steps": args.steps, "dt": dt,
                        "recording": bool(getattr(args, "recording", False)),
                        "coeff_jitter": getattr(args, "coeff_jitter", None)},
            "fit_seconds_warm": {"koopman": t_koop, "di": t_di, "pinc": t_pinc},
            "rmse": rmses,
            "metric_seconds_warm": times,
            "backend": jax.default_backend(),
        }
        Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
        # sanitize: a slope-timer NaN sentinel must serialize as null,
        # not as a bare NaN token that strict JSON parsers reject
        Path(args.json_out).write_text(
            json.dumps(common.json_sanitize(payload), indent=1,
                       allow_nan=False))
        ok(f"Wrote JSON run record -> {args.json_out}")

    # ---------------- open-loop rollouts (timed) ----------------
    start, horizon = common.open_loop_window(test.X, args.open_loop_steps)
    x0 = X_te[start]
    U_seq = U_te[start : start + horizon]

    rollout_timer = common.make_timer()  # slope on TPU: single-call times
    # of these ~ms rollouts are dispatch floor, not compute
    predK, tKc, tK = rollout_timer(lambda: koopman.simulate(model, x0, U_seq))
    p = fossen_params()
    sim_fossen = jax.jit(
        lambda x0, U: fossen.simulate_thruster(p, cfg, lag, x0, U, dt,
                                               method=args.integrator)
    )
    predF, tFc, tF = rollout_timer(sim_fossen, x0, U_seq)
    di_variant = "euler12" if args.integrator == "euler" else "euler12_rk4"
    sim_di = jax.jit(lambda x0, U: di.simulate(gains, x0, U, dt, variant=di_variant))
    predD, tDc, tD = rollout_timer(sim_di, x0, U_seq)
    sim_pinc = jax.jit(lambda x0, U4: pinc.simulate(net, params, x0, U4, dt))
    predP, tPc, tP = rollout_timer(sim_pinc, x0, U4_te[start : start + horizon])
    rollout_times = {"Koopman": (tKc, tK), "Fossen (BlueROV2)": (tFc, tF),
                     "Double Integrator": (tDc, tD), "PINc (ResDNN)": (tPc, tP)}
    predFit = None
    if fit_res is not None:
        sim_fit = jax.jit(
            lambda x0, U: fossen.simulate_thruster(
                fit_res.params, fit_res.cfg, lag, x0, U, dt,
                method=args.integrator)
        )
        predFit, tXc, tX = rollout_timer(sim_fit, x0, U_seq)
        rollout_times["Fossen (fitted)"] = (tXc, tX)
    common.print_rollout_timings(rollout_times)

    true = test.X[start : start + horizon + 1]
    trajs = {
        "TRUE (Recorded)": true,
        "KOOPMAN": np.asarray(predK),
        "FOSSEN (BlueROV2)": np.asarray(predF),
        "DOUBLE INTEGRATOR": np.asarray(predD),
        "PINc (ResDNN)": np.asarray(predP),
    }
    if predFit is not None:
        trajs["FOSSEN (fitted)"] = np.asarray(predFit)
    if not args.no_media:
        from bluerov2_dynamics_tpu.viz import animate_topdown, plot_topdown_with_depth

        animate_topdown(
            trajs, dt=dt,
            save_path=f"{args.media_dir}/{args.media_prefix}tank_true_vs_4models.gif",
            title="Recorded data: True vs. Koopman / Fossen / DI / PINc",
        )
        plot_topdown_with_depth(
            {k: v for k, v in trajs.items() if "PINc" not in k},
            dt=dt, seconds=10.0,
            save_path=f"{args.media_dir}/{args.media_prefix}tank_true_vs_4models_2D.png",
        )
        if fit_res is not None:
            from bluerov2_dynamics_tpu.models.sysid import COEFF_NAMES
            from bluerov2_dynamics_tpu.viz import plot_coefficient_scales

            true_scales = None
            if (args.synthetic or args.csv is None) and getattr(
                    args, "recording", False):
                # generated pseudo recording: the generator's perturbation
                # draws are reproducible from the seed — plot ground truth
                from bluerov2_dynamics_tpu.data.synthetic import (
                    recording_coefficient_draws,
                )

                true_scales = recording_coefficient_draws(
                    jax.random.PRNGKey(args.seed), args.coeff_jitter)
            plot_coefficient_scales(
                np.exp(np.asarray(fit_res.log_scales, np.float64)),
                COEFF_NAMES, true_scales=true_scales,
                stderr=(None if fit_res.stderr is None
                        else fit_res.stderr["s"]),
                save_path=f"{args.media_dir}/{args.media_prefix}fossen_fit_scales.png",
            )
    return {"rmses": rmses, "trajs": trajs}


if __name__ == "__main__":
    main()
