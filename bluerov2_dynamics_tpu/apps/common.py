"""Shared app infrastructure: arguments, datasets, timed metric tables.

Replaces the per-script duplicated helpers of the reference training code
(SURVEY.md T7) with one implementation.
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict, Sequence

import numpy as np

from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.eval.timing import time_fn_cold_warm
from bluerov2_dynamics_tpu.utils.log import info, ok

HORIZONS = (1, 10, 100)


def base_parser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--csv", type=str, default=None,
                    help="dataset CSV file, or a directory to search for the "
                         "newest --csv-name under (reference behavior); omit "
                         "with --synthetic")
    ap.add_argument("--csv-name", type=str, default="koopman_dataset_50Hz.csv",
                    help="file name searched for when --csv is a directory")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate a simulated dataset instead of loading a CSV")
    ap.add_argument("--recording", action="store_true",
                    help="with --synthetic: generate the pseudo tank "
                         "recording (perturbed generator coefficients, "
                         "yaw-winding commands, sensor noise) instead of "
                         "the nominal-parameter sim dataset")
    ap.add_argument("--coeff-jitter", type=float, default=0.10,
                    help="generator coefficient perturbation for --recording")
    ap.add_argument("--noise-scale", type=float, default=1.0,
                    help="multiply the synthetic generator's per-channel "
                         "sensor-noise sigmas (1.0 = mocap-scale defaults; "
                         ">1 emulates a cheaper DVL/AHRS-class sensor — "
                         "the regime where heavier filtering pays); the "
                         "noise DRAW is unchanged, so truth/commands stay "
                         "bit-identical to the blessed datasets")
    ap.add_argument("--steps", type=int, default=20_000,
                    help="synthetic dataset length")
    ap.add_argument("--dt", type=float, default=0.02,
                    help="synthetic dataset sample period")
    ap.add_argument("--train-split", type=float, default=0.8)
    ap.add_argument("--open-loop-steps", type=int, default=500)
    ap.add_argument("--media-dir", type=str, default="media")
    ap.add_argument("--no-media", action="store_true",
                    help="skip animations/figures")
    ap.add_argument("--n-rbfs", type=int, default=500)
    ap.add_argument("--gamma", type=float, default=3.0)
    ap.add_argument("--ridge", type=float, default=1e-1)
    ap.add_argument("--koopman-position-invariant", action="store_true",
                    help="mask x,y,z out of the RBF distances (extension; "
                         "the dynamics are translation-invariant, so "
                         "position-bearing RBFs generalize poorly on "
                         "drifting recordings)")
    ap.add_argument("--koopman-conv", action="store_true",
                    help="score Koopman multistep metrics via the batched "
                         "control-convolution endpoint "
                         "(koopman.multistep_rmse(method='conv'): measured "
                         "5.9-8.5x faster at H=100 on v5e, shifts RMSEs by "
                         "~5e-6 relative; default is the reference-faithful "
                         "scan recurrence)")
    ap.add_argument("--sweep", action="store_true",
                    help="fit every (gamma, ridge) combination as one "
                         "vmapped solve and keep the best on a validation "
                         "tail (TPU-native extension; see koopman.fit_sweep)")
    ap.add_argument("--sweep-gammas", type=float, nargs="+",
                    default=[0.5, 1.0, 3.0, 10.0])
    ap.add_argument("--sweep-ridges", type=float, nargs="+",
                    default=[1e-3, 1e-2, 1e-1])
    ap.add_argument("--streaming-chunk", type=int, default=None,
                    help="fit the Koopman model through the streaming "
                         "sufficient-statistics accumulator in chunks of "
                         "this many rows (koopman.fit_streaming — the "
                         "online/deployment fit path; equals the batch fit "
                         "at --forgetting 1)")
    ap.add_argument("--forgetting", type=float, default=1.0,
                    help="exponential forgetting factor for "
                         "--streaming-chunk (RLS memory ~1/(1-lam) pairs; "
                         "<1 tracks plant drift within the recording)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--extra-csv", nargs="*", default=[],
                    help="additional recording CSVs used as extra TRAINING "
                         "trajectories; fitted jointly without cross-file "
                         "transitions (koopman.fit_multi, the reference's "
                         "multi-bag capability at koopmanEDMDc.py:113-152). "
                         "Metrics stay on the main dataset's test split. "
                         "Each workload loads extras with its own column "
                         "contract (thruster / wrench / quat).")
    return ap


def koopman_method(args) -> str:
    """Koopman multistep propagation method selected by --koopman-conv."""
    return "conv" if getattr(args, "koopman_conv", False) else "scan"


def add_sysid_args(ap: argparse.ArgumentParser) -> None:
    """CLI options for the differentiable Fossen coefficient fit
    (:mod:`bluerov2_dynamics_tpu.models.sysid` — TPU-native extension; the
    reference hard-codes its Table A1 coefficients)."""
    g = ap.add_argument_group("differentiable Fossen fit (extension)")
    g.add_argument("--fossen-fit", action="store_true",
                   help="fit the 23 Table A1 coefficients to the training "
                        "split by gradient descent through the rollout and "
                        "report a 'Fossen (fitted)' metric row (the nominal "
                        "Fossen row is unchanged)")
    g.add_argument("--fossen-fit-steps", type=int, default=300,
                   help="Adam iterations (full-batch, one compiled scan)")
    g.add_argument("--fossen-fit-horizon", type=int, default=10,
                   help="multi-step prediction-loss window length")
    g.add_argument("--fossen-fit-lr", type=float, default=0.02,
                   help="Adam learning rate in log-scale space")
    g.add_argument("--fossen-fit-gains", action="store_true",
                   help="additionally fit 8 per-thruster gain factors "
                        "(actuator asymmetry; thruster-input workloads only)")
    g.add_argument("--fossen-fit-current", action="store_true",
                   help="additionally estimate a constant ambient NED "
                        "current (3 additive parameters, m/s)")
    g.add_argument("--fossen-fit-stderr", action="store_true",
                   help="report Gauss-Newton/Laplace standard errors per "
                        "coefficient (identifiability diagnostic; "
                        "jax.hessian through the rollout)")
    g.add_argument("--fossen-fit-delay", type=int, choices=(0, 1), default=None,
                   help="which command drives the step from X[k]: 0 = U[k] "
                        "(evaluator/reference convention, right for real "
                        "recordings), 1 = U[k+1] (the generated datasets' "
                        "discrete pairing; see sysid.fit_thruster). Default: "
                        "1 for generated data, 0 for CSV data")


def fit_fossen_from_args(args, X_tr, U_tr, dt, kind: str = "thruster",
                         method: str = "euler", state: str = "euler12"):
    """Run the differentiable coefficient fit when ``--fossen-fit`` is set.

    Returns a :class:`~bluerov2_dynamics_tpu.models.sysid.SysidResult` (or
    ``None`` when the flag is off) and prints the fit summary.  ``kind``
    selects the input contract: ``"thruster"`` (u1..u8 datasets) or
    ``"wrench"`` (Fx..Mz datasets, with ``state`` euler12/quat13).
    """
    if not getattr(args, "fossen_fit", False):
        return None
    from bluerov2_dynamics_tpu.eval.timing import time_fn
    from bluerov2_dynamics_tpu.models import sysid

    delay = args.fossen_fit_delay
    if delay is None:
        # generated datasets record each command next to the state it
        # PRODUCED (see sysid.fit_thruster docstring); real CSVs pair U[k]
        # with the state it is about to act on.  The condition MUST match
        # the data-selection branch (load_or_generate): --synthetic wins
        # over --csv, so synthetic data keeps delay 1 even with both set.
        delay = 1 if (args.synthetic or args.csv is None) else 0
    kwargs = dict(horizon=args.fossen_fit_horizon, steps=args.fossen_fit_steps,
                  lr=args.fossen_fit_lr, method=method, input_delay=delay,
                  fit_current=args.fossen_fit_current,
                  compute_stderr=getattr(args, "fossen_fit_stderr", False))
    if kind == "thruster":
        fit = lambda: sysid.fit_thruster(
            X_tr, U_tr, dt, fit_gains=args.fossen_fit_gains, **kwargs)
    elif kind == "wrench":
        fit = lambda: sysid.fit_wrench(X_tr, U_tr, dt, state=state, **kwargs)
    else:
        raise ValueError(f"unknown sysid kind {kind!r}")
    res, t_fit = time_fn(fit, warmup=0)
    ok(f"Fossen coefficients fitted ({args.fossen_fit_steps} Adam steps, "
       f"horizon {args.fossen_fit_horizon}, input delay {delay}): loss "
       f"{float(res.losses[0]):.3e} -> {float(res.losses[-1]):.3e} "
       f"in {t_fit:.2f} s (incl. compile)")
    if res.current is not None:
        c = [f"{v:+.4f}" for v in res.current.tolist()]
        ok(f"Estimated ambient NED current [m/s]: [{', '.join(c)}]")
    if res.stderr is not None:
        import numpy as np

        from bluerov2_dynamics_tpu.models.sysid import COEFF_NAMES

        scales = np.exp(np.asarray(res.log_scales, np.float64))
        se = np.asarray(res.stderr["s"], np.float64)
        print("[i] Coefficient scales +- Laplace stderr (log-space; inf = "
              "unidentifiable on this recording; optimistic in absolute "
              "terms — see sysid._laplace_stderr):")
        cells = [
            f"{n} {s:.3f}±{'inf' if not np.isfinite(e) else format(e, '.3f')}"
            for n, s, e in zip(COEFF_NAMES, scales, se)
        ]
        for row_start in range(0, len(cells), 6):
            print("      " + "  ".join(
                f"{c:<16s}" for c in cells[row_start:row_start + 6]))
    return res


def _generate_sim(args):
    """Build the synthetic SimDataset selected by the CLI args."""
    import jax

    from bluerov2_dynamics_tpu.data.synthetic import (
        generate_sim_dataset,
        generate_tank_recording,
    )

    if getattr(args, "recording", False):
        info(f"Generating pseudo tank recording: {args.steps} steps @ "
             f"dt={args.dt} (coeff jitter +-{args.coeff_jitter:.0%})")
        return generate_tank_recording(
            jax.random.PRNGKey(args.seed), n_steps=args.steps, dt=args.dt,
            jitter=args.coeff_jitter,
            noise_scale=getattr(args, "noise_scale", 1.0),
        )
    info(f"Generating synthetic dataset: {args.steps} steps @ dt={args.dt}")
    return generate_sim_dataset(
        jax.random.PRNGKey(args.seed), n_steps=args.steps, dt=args.dt,
        noise_scale=getattr(args, "noise_scale", 1.0),
    )


def load_or_generate(args, loader: Callable = csv_loader.load_thruster_dataset):
    """Load the CSV named by --csv (or discovered), or generate synthetic."""
    if args.synthetic or args.csv is None:
        sim = _generate_sim(args)
        return csv_loader.Dataset(
            X=np.asarray(sim.X, np.float64),
            U=np.asarray(sim.U, np.float64),
            t=np.arange(args.steps) * args.dt,
            dt=args.dt,
        )
    from pathlib import Path

    csv_path = Path(args.csv)
    if csv_path.is_dir():
        csv_path = csv_loader.find_latest_csv(
            csv_path, getattr(args, "csv_name", "koopman_dataset_50Hz.csv")
        )
    return loader(csv_path)


def load_or_generate_with_truth(
    args, loader: Callable = csv_loader.load_thruster_dataset
):
    """:func:`load_or_generate` plus the two facts only the estimation
    workload needs: the generator's noise-free states (``None`` for CSV
    data) and the dataset's input-delay convention — generated datasets
    record each command next to the state it PRODUCED (transition
    ``X[k] -> X[k+1]`` is driven by ``U[k+1]``, delay 1; see
    ``models/sysid.py::fit_thruster``), real CSVs pair ``U[k]`` with the
    state it is about to act on (delay 0).

    Returns ``(Dataset, X_true_or_None, input_delay)``.
    """
    if args.synthetic or args.csv is None:
        sim = _generate_sim(args)
        ds = csv_loader.Dataset(
            X=np.asarray(sim.X, np.float64),
            U=np.asarray(sim.U, np.float64),
            t=np.arange(args.steps) * args.dt,
            dt=args.dt,
        )
        return ds, np.asarray(sim.X_true, np.float64), 1
    return load_or_generate(args, loader), None, 0


def fit_koopman_from_args(args, key, X_tr, U_tr, loader: Callable = None):
    """Fit the Koopman model per CLI args, timed cold/warm.

    Default: one fit at (--gamma, --ridge).  With ``--sweep``: every
    (gamma, ridge) combination is fitted as ONE vmapped solve
    (``koopman.fit_sweep``) and scored by endpoint H=10 RMSE on the last
    20% of the training split (``koopman.select_best``) — model selection
    the reference's sequential scripts cannot express.  With
    ``--extra-csv``: the main training split plus every extra recording
    are fitted jointly via ``koopman.fit_multi`` (no cross-file
    transitions); ``loader`` is the workload's dataset loader applied to
    each extra path (thruster columns by default).

    Returns ``(model, cold_seconds, warm_seconds)``.
    """
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.models import koopman

    pi = getattr(args, "koopman_position_invariant", False)
    chunk = getattr(args, "streaming_chunk", None)
    lam = float(getattr(args, "forgetting", 1.0))
    if lam != 1.0 and chunk is None:
        raise SystemExit(
            "--forgetting only applies to the streaming fit; add "
            "--streaming-chunk N (otherwise the batch fit would silently "
            "ignore it)."
        )
    extra = getattr(args, "extra_csv", None) or []
    if extra:
        if getattr(args, "sweep", False):
            raise SystemExit(
                "--extra-csv fits via koopman.fit_multi, which does not "
                "support --sweep; drop one of the flags."
            )
        if getattr(args, "streaming_chunk", None):
            raise SystemExit(
                "--extra-csv fits via koopman.fit_multi, which does not "
                "support --streaming-chunk (a stream has one contiguous "
                "recording); drop one of the flags."
            )
        if loader is None:
            loader = csv_loader.load_thruster_dataset
        extras = [loader(p) for p in extra]
        X_list = [X_tr] + [jnp.asarray(e.X, X_tr.dtype) for e in extras]
        U_list = [U_tr] + [jnp.asarray(e.U, U_tr.dtype) for e in extras]
        info(f"Multi-trajectory fit over {len(X_list)} recordings "
             f"({sum(len(x) for x in X_list)} rows total)")
        return time_fn_cold_warm(
            lambda: koopman.fit_multi(
                key, X_list, U_list,
                n_rbfs=args.n_rbfs, gamma=args.gamma, ridge=args.ridge,
                position_invariant=pi,
            )
        )
    if chunk is not None:
        if chunk < 1:
            raise SystemExit(f"--streaming-chunk must be >= 1, got {chunk}")
        if getattr(args, "sweep", False):
            raise SystemExit(
                "--streaming-chunk fits via koopman.fit_streaming, which "
                "does not support --sweep; drop one of the flags."
            )
        if not (0.0 < lam <= 1.0):
            raise SystemExit(f"--forgetting must be in (0, 1], got {lam}")
        n_chunks = -(-max(len(X_tr), 1) // chunk)
        mem = "full history" if lam == 1.0 else f"~{1.0 / (1.0 - lam):.0f} pairs"
        info(f"Streaming fit: {n_chunks} chunks of {chunk} rows, "
             f"forgetting {lam:g} (RLS memory {mem})")
        return time_fn_cold_warm(
            lambda: koopman.fit_streaming(
                key, X_tr, U_tr,
                n_rbfs=args.n_rbfs, gamma=args.gamma, ridge=args.ridge,
                chunk=chunk, position_invariant=pi, forgetting=lam,
            )
        )
    if not getattr(args, "sweep", False):
        model, cold, warm = time_fn_cold_warm(
            lambda: koopman.fit(
                key, X_tr, U_tr,
                n_rbfs=args.n_rbfs, gamma=args.gamma, ridge=args.ridge,
                position_invariant=pi,
            )
        )
        return model, cold, warm

    n_val = max(int(0.2 * len(X_tr)), max(HORIZONS) + 1)
    if len(X_tr) - n_val < max(args.n_rbfs, 2):
        raise SystemExit(
            f"--sweep needs a training split larger than the validation "
            f"tail plus the dictionary ({len(X_tr)} rows, n_val={n_val}, "
            f"n_rbfs={args.n_rbfs}); use more data or fewer RBFs."
        )
    X_fit, U_fit = X_tr[:-n_val], U_tr[:-n_val]
    X_val, U_val = X_tr[-n_val:], U_tr[-n_val:]

    def fit():
        models, combos = koopman.fit_sweep(
            key, X_fit, U_fit, n_rbfs=args.n_rbfs,
            gammas=tuple(args.sweep_gammas), ridges=tuple(args.sweep_ridges),
            position_invariant=pi,
        )
        best, combo, rmses = koopman.select_best(
            models, combos, X_val, U_val, H=10, method=koopman_method(args))
        return best, combo, rmses

    (model, combo, rmses), cold, warm = time_fn_cold_warm(fit)
    vals = np.asarray(rmses)
    n_bad = int(np.isnan(vals).sum())
    bad = f", {n_bad} combo(s) NaN (ill-conditioned, skipped)" if n_bad else ""
    info(f"Sweep over {len(args.sweep_gammas)}x{len(args.sweep_ridges)} "
         f"(gamma, ridge) combos -> best gamma={float(combo[0]):g} "
         f"ridge={float(combo[1]):g} (val H=10 RMSE "
         f"{np.nanmin(vals):.6f}, worst finite {np.nanmax(vals):.6f}{bad})")
    return model, cold, warm


def endpoint_evaluator_with_pallas(X_test, U_test, build_pallas, scan_eval):
    """Shared physics-baseline evaluator policy: ``fn(H) -> endpoint RMSE``.

    On TPU the Pallas VMEM kernel built by ``build_pallas(H)`` runs (with
    a per-H cache so warm timings stay warm); elsewhere ``scan_eval(H)``.
    ``H >= len(X_test)`` returns NaN (reference evaluator semantics).
    One implementation for every workload's backend switch — the kernel
    factory is the only thing that differs per input contract.
    """
    import jax
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.eval.metrics import rmse

    use_pallas = jax.default_backend() == "tpu"
    cache: Dict[int, Callable] = {}

    def run(H: int):
        if X_test.shape[0] - H <= 0:
            return jnp.asarray(jnp.nan, X_test.dtype)
        if use_pallas:
            if H not in cache:
                cache[H] = build_pallas(H)
            final = cache[H](X_test, U_test)
            return rmse(X_test[H:].astype(final.dtype), final)
        return scan_eval(H)

    return run


def make_timer():
    """``timer(fn, *args) -> (result, cold_s, warm_s)`` for app tables.

    On TPU: the slope method (:func:`time_fn_slope`), which cancels the
    ~60 ms tunnel dispatch floor that otherwise makes every sub-60 ms
    call read identically (round-3 VERDICT item 3; it also hid that the
    reference's CPU beat our *single-call* numbers on tiny rollouts).
    Elsewhere (CPU test runs) single-call timing is accurate and 7x
    cheaper (15 calls per cell -> 2).
    """
    import jax

    from bluerov2_dynamics_tpu.eval.timing import time_fn_slope

    if jax.default_backend() == "tpu":
        return time_fn_slope

    def timer(fn, *args):
        return time_fn_cold_warm(fn, *args, iters=1)

    return timer


def timed_metric_table(
    evaluators: Dict[str, Callable[[int], float]],
    horizons: Sequence[int] = HORIZONS,
):
    """Evaluate every model at every horizon with timings; print the tables
    in the reference's format (``train_tank_brov2_full_comparison.py:996-1009``).

    ``evaluators``: name -> fn(H) returning the endpoint RMSE (jittable).
    Returns ``(rmse[name][H], warm_seconds[name][H])``; cold (compile-
    included) and warm (steady-state) timings are printed as separate
    tables so TPU compile time is never conflated with execution time.
    Warm timings use the slope method (:func:`time_fn_slope`), which
    cancels the ~60 ms tunnel dispatch floor that made every sub-60 ms
    evaluator read identically in single-call timings (round-3 VERDICT
    item 3) — per-model warm numbers now resolve real device time.
    """
    timer = make_timer()

    rmses: Dict[str, Dict[int, float]] = {}
    times: Dict[str, Dict[int, float]] = {}
    cold_times: Dict[str, Dict[int, float]] = {}
    for name, fn in evaluators.items():
        rmses[name], times[name], cold_times[name] = {}, {}, {}
        for H in horizons:
            val, cold_s, warm_s = timer(fn, H)
            rmses[name][H] = float(val)
            times[name][H] = warm_s
            cold_times[name][H] = cold_s

    names = list(evaluators)
    print("\n[metrics] Endpoint RMSE (identical evaluator):")
    header = "  Model                 |" + "|".join(
        f" {('%d-step RMSE' % H):>13} " for H in horizons
    )
    print(header)
    print("  " + "-" * (len(header) - 2))
    for n in names:
        row = f"  {n:<21} |" + "|".join(
            f" {rmses[n][H]:>13.6f} " for H in horizons
        )
        print(row)

    print("\n[timings] Metric evaluation, warm (s, per-call slope — "
          "dispatch overhead cancelled):")
    for n in names:
        row = f"  {n:<21} |" + "|".join(
            f" {times[n][H]:>13.4f} " for H in horizons
        )
        print(row)
    print("[timings] Metric evaluation, cold (s, first call incl. jit compile):")
    for n in names:
        row = f"  {n:<21} |" + "|".join(
            f" {cold_times[n][H]:>13.4f} " for H in horizons
        )
        print(row)
    return rmses, times


def json_sanitize(obj):
    """Recursively replace non-finite floats with ``None`` so the result
    is valid STRICT JSON (``json.dumps`` happily emits bare ``NaN`` /
    ``Infinity`` tokens that ``jq`` / ``JSON.parse`` reject).  The slope
    timer (`eval/timing.time_fn_slope`) deliberately returns NaN when a
    tunnel hiccup makes the measured slope non-positive — that sentinel
    must land in ``--json-out`` run records as ``null``, not break them."""
    if isinstance(obj, dict):
        return {k: json_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_sanitize(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def print_rollout_timings(timings: Dict[str, tuple]):
    """``timings``: name -> (cold_seconds, warm_seconds)."""
    print("\n[timings] Open-loop rollout time:")
    print("  Model                 |    warm [s] | cold+compile [s]")
    print("  ----------------------|------------:|-----------------:")
    for n, (cold, warm) in timings.items():
        print(f"  {n:<21} | {warm:11.6f} | {cold:16.6f}")


def open_loop_window(X_test: np.ndarray, horizon: int):
    """Start index + horizon for the demo rollout
    (``train_tank_brov2_full_comparison.py:1014-1017``)."""
    horizon = min(horizon, len(X_test) - 1)
    start = int(0.4 * (len(X_test) - horizon))
    return start, horizon


def summarize_fit(name: str, cold_seconds: float, warm_seconds: float = None):
    """Report fit timing; ``cold`` includes jit compilation, ``warm`` is a
    steady-state refit (the number comparable to the reference's CPU fit
    times, ``best_results.txt:798``)."""
    if warm_seconds is None:
        ok(f"{name} fitted. (fit time = {cold_seconds:.3f} s)")
    else:
        ok(f"{name} fitted. (warm fit = {warm_seconds:.3f} s, "
           f"cold incl. compile = {cold_seconds:.3f} s)")
