"""State-estimation workload: filter a noisy recording with the physics
EKF/UKF (+ optional RTS smoother and ML noise identification).

TPU-native extension — the reference trains and evaluates every model on
the raw noisy mocap states (``train_sim_brov2_koopmanEDMDc.py:173-192``
adds per-channel Gaussian sensor noise; nothing downstream ever filters
it, and the tank pipeline ingests the mocap topics verbatim,
``rosbags/bag2csv.py``).  This app closes that loop:

1. the recorded thruster commands are converted to the exact per-step
   applied wrench by one linear lag scan
   (``thrusters.effective_wrench_history`` — the lag depends only on the
   commands, so the 12-state filter never needs the 24 lag coordinates);
   ``--filter pf`` swaps in the bootstrap particle filter for heavy-noise
   / non-Gaussian regimes (pair with ``--noise-scale``), ``--filter mhe``
   the Huber moving-horizon estimator for impulsive-outlier regimes
   (pair with ``--outlier-frac``);
2. an EKF (exact ``jax.jacfwd`` Jacobians of the full Fossen wrench step,
   one ``lax.scan``) or UKF filters the recording; ``--smooth`` adds the
   RTS backward pass;
3. ``--fit-noise`` first identifies diagonal Q/R by maximum likelihood
   (Adam on the innovation log-likelihood through the differentiable
   filter, ``estimation.fit_noise``);
4. ``--fossen-fit`` calibrates the plant coefficients on the raw states
   before filtering (``models/sysid.py``) — sysid feeding estimation;
5. ``--refit-koopman`` demonstrates the downstream value: a Koopman
   model fitted on the FILTERED training states vs one fitted on the raw
   states, both scored on the noise-free truth (synthetic data only).

On synthetic data (``--synthetic [--recording]``) the generator's
noise-free states are ground truth, so the app reports honest
raw-vs-filtered-vs-smoothed RMSE per channel group; on a real CSV the
consistency statistics (mean NIS vs its chi^2 expectation) and the
innovation log-likelihood are the observable diagnostics.

Usage::

    python -m bluerov2_dynamics_tpu.apps.estimate --synthetic --recording \
        --steps 8000 --smooth --fit-noise --refit-koopman
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from bluerov2_dynamics_tpu.apps import common
from bluerov2_dynamics_tpu.apps.common import (
    add_sysid_args,
    base_parser,
    fit_fossen_from_args,
    json_sanitize,
)
from bluerov2_dynamics_tpu.data import csv_loader
from bluerov2_dynamics_tpu.eval.timing import time_fn, time_fn_cold_warm
from bluerov2_dynamics_tpu.utils.log import info, ok, warn

# per-channel-group sensor-noise scales (pos, ang, vel, angvel) matching
# the pseudo recording generator's defaults (data/synthetic.py)
DEFAULT_R_SCALES = (1e-3, 2e-3, 1e-3, 2e-3)
GROUPS = (("position", 0, 3), ("attitude", 3, 6),
          ("lin. velocity", 6, 9), ("ang. velocity", 9, 12))


def build_parser():
    ap = base_parser(
        "Filter a (noisy) thruster-contract recording with the physics "
        "EKF/UKF; optional RTS smoothing, ML noise identification, plant "
        "calibration, and a raw-vs-filtered Koopman refit comparison."
    )
    g = ap.add_argument_group("estimation")
    g.add_argument("--contract", choices=("thruster", "quat"),
                   default="thruster",
                   help="dataset contract: 'thruster' = euler12 states + "
                        "u1..u8 commands (T2/T6 family; EKF/UKF/lifted-KF "
                        "filters); 'quat' = quat13 states + wrench inputs "
                        "(T4 family) — filtered by the MULTIPLICATIVE EKF "
                        "(estimation.mekf_quat13: error-state on "
                        "R^3 x S^3 x R^6, quaternions stay exactly unit)")
    g.add_argument("--filter", choices=("ekf", "ukf", "pf", "mhe",
                                        "koopman"),
                   default="ekf",
                   help="forward filter (ekf: exact jacfwd Jacobians; "
                        "ukf: sigma points, no Jacobians; pf: bootstrap "
                        "particle filter — a particle ensemble batched "
                        "through the full nonlinear step, no Gaussian "
                        "posterior assumption; mhe: moving-horizon "
                        "estimation — per-window optimization with an "
                        "optional outlier-robust Huber penalty; koopman: "
                        "the "
                        "exact linear KF on the lifted system of an EDMDc "
                        "model fitted to the training split — data-driven "
                        "filtering, no physics anywhere)")
    g.add_argument("--pf-particles", type=int, default=1024,
                   help="ensemble size for --filter pf")
    g.add_argument("--mhe-window", type=int, default=20,
                   help="--filter mhe: sliding window length")
    g.add_argument("--mhe-iters", type=int, default=20,
                   help="--filter mhe: Adam iterations per window from "
                        "the shifted warm start (the first window gets "
                        "20x this)")
    g.add_argument("--mhe-meas-loss", choices=("quadratic", "huber"),
                   default="huber",
                   help="--filter mhe: measurement penalty — 'huber' "
                        "saturates the influence of impulsive outliers "
                        "(pair with --outlier-frac to demonstrate)")
    g.add_argument("--outlier-frac", type=float, default=0.0,
                   help="synthetic only: corrupt this fraction of sensor "
                        "samples with impulsive +-(--outlier-sigma)-sigma "
                        "glitches AFTER generation — the robustness regime "
                        "--filter mhe --mhe-meas-loss huber is for")
    g.add_argument("--outlier-sigma", type=float, default=50.0,
                   help="outlier magnitude in per-channel sigmas")
    g.add_argument("--koopman-q", type=float, default=1e-6,
                   help="lifted-space process-noise scale for "
                        "--filter koopman")
    g.add_argument("--smooth", action="store_true",
                   help="add the RTS backward pass (ekf; for --contract "
                        "quat the manifold/tangent-space variant)")
    g.add_argument("--measure", choices=("all", "pose"), default="all",
                   help="measured channels: 'all' = the full recorded "
                        "state; 'pose' = position+attitude only — the "
                        "real mocap pipeline's primary measurement (its "
                        "velocity columns come from the twist topic or "
                        "finite differences, rosbags/bag2csv.py:146) — "
                        "the filter then ESTIMATES the velocities it "
                        "never sees")
    g.add_argument("--q", type=float, default=1e-6,
                   help="process-noise variance (isotropic diagonal; "
                        "absorbs model mismatch, e.g. the recording's "
                        "±10%% perturbed generator coefficients)")
    g.add_argument("--r-scales", type=float, nargs=4,
                   default=list(DEFAULT_R_SCALES),
                   metavar=("POS", "ANG", "VEL", "ANGVEL"),
                   help="measurement-noise standard deviations per channel "
                        "group (default: the pseudo recording's generator "
                        "values)")
    g.add_argument("--p0", type=float, default=1e-2,
                   help="prior covariance scale (isotropic)")
    g.add_argument("--fit-noise", action="store_true",
                   help="identify diagonal Q/R by maximum likelihood "
                        "before filtering (estimation.fit_noise; Adam on "
                        "the innovation log-likelihood)")
    g.add_argument("--fit-noise-window", type=int, default=4000,
                   help="recording prefix length the ML noise fit runs on")
    g.add_argument("--fit-noise-steps", type=int, default=200)
    g.add_argument("--fit-noise-lr", type=float, default=0.15)
    g.add_argument("--fit-noise-seglen", type=int, default=250,
                   help="the fit window is cut into contiguous segments of "
                        "this length and filtered as a vmapped BANK "
                        "(estimation.segment_trajectory) — parallel on "
                        "device instead of one window-long sequential "
                        "gradient chain; 0 = one unsegmented window")
    g.add_argument("--no-lag", action="store_true",
                   help="drive the filter plant with the static thruster "
                        "curve instead of the lag-filtered wrench history")
    g.add_argument("--refit-koopman", action="store_true",
                   help="fit Koopman on raw vs filtered training states and "
                        "score both on the noise-free truth (synthetic "
                        "data only)")
    g.add_argument("--out-csv", type=str, default=None,
                   help="write the filtered (or smoothed) states + inputs "
                        "as a CSV in the run's contract (thruster or "
                        "quat13/wrench) that the tank apps can load")
    g.add_argument("--json-out", type=str, default=None,
                   help="write a JSON run record")
    add_sysid_args(ap)
    return ap


def _load(args):
    """Returns (X noisy (N,12), U commands (N,8), X_true or None, t,
    dt, input_delay) — the shared loader plus truth/delay, cast to the
    app's f32 working dtype."""
    ds, X_true, delay = common.load_or_generate_with_truth(args)
    return (np.asarray(ds.X, np.float32), np.asarray(ds.U, np.float32),
            None if X_true is None else np.asarray(X_true, np.float32),
            np.asarray(ds.t, np.float64), ds.dt, delay)


def _group_rmse(A, B):
    """Per-channel-group RMSE dict between (N,12) arrays."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    out = {}
    for name, lo, hi in GROUPS:
        out[name] = float(np.sqrt(np.mean((A[:, lo:hi] - B[:, lo:hi]) ** 2)))
    out["all"] = float(np.sqrt(np.mean((A - B) ** 2)))
    return out


def _print_rmse_table(rows):
    """rows: name -> group-RMSE dict."""
    names = list(rows)
    header = "  Signal                |" + "|".join(
        f" {n:>12} " for n in names)
    print("\n[metrics] RMSE vs noise-free truth:")
    print(header)
    print("  " + "-" * (len(header) - 2))
    for gname, _, _ in GROUPS:
        print(f"  {gname:<21} |" + "|".join(
            f" {rows[n][gname]:>12.6f} " for n in names))
    print(f"  {'all channels':<21} |" + "|".join(
        f" {rows[n]['all']:>12.6f} " for n in names))


DEFAULT_FIG_CHANS = ((2, "z", "m"), (5, "psi", "rad"),
                     (6, "u", "m/s"), (11, "r", "rad/s"))


def _save_figure(path, dt, X, X_filt, X_sm, X_true, diag_text,
                 seconds=20.0, t0_frac=0.4, chans=DEFAULT_FIG_CHANS):
    """One panel per channel group on a zoomed window: truth (if
    available), raw sensor, filtered, smoothed; the filter's consistency
    diagnostic (``diag_text``: NIS for the Kalman family, ESS for the
    PF) in the title.  ``chans``: (column, name, unit) per panel.
    Scoped Agg backend like viz/plots.py."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    N = X.shape[0]
    w = min(int(seconds / max(dt, 1e-9)), N)
    s = int(t0_frac * (N - w))
    t = (np.arange(s, s + w) - s) * dt
    errors = X_true is not None
    fig, axes = plt.subplots(2, 2, figsize=(10, 6), dpi=150, sharex=True)
    for ax, (c, name, unit) in zip(axes.ravel(), chans):
        # with ground truth, plot the ERRORS — the filter's value is
        # invisible on overlapping traces at mocap noise scales
        ref = X_true[s:s + w, c] if errors else 0.0
        ax.plot(t, X[s:s + w, c] - ref, ".", ms=2, color="0.65",
                label="raw sensor")
        ax.plot(t, X_filt[s:s + w, c] - ref, lw=1.0, label="filtered")
        if X_sm is not None:
            ax.plot(t, X_sm[s:s + w, c] - ref, lw=1.0, ls="--",
                    label="smoothed")
        if errors:
            ax.axhline(0.0, color="k", lw=0.6)
            ax.set_ylabel(f"{name} error [{unit}]")
        else:
            ax.set_ylabel(f"{name} [{unit}]")
        ax.grid(alpha=0.3)
    for ax in axes[1]:
        ax.set_xlabel("t [s]")
    axes[0, 0].legend(loc="best", fontsize=8)
    kind = "error vs truth" if errors else "estimates"
    fig.suptitle(f"State estimation on the recording ({kind}) — "
                 f"{diag_text}")
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    ok(f"Wrote estimation figure -> {path}")


def _main_quat(args):
    """The quat13/wrench contract (T4 family), filtered by the
    multiplicative EKF.  Tangent-space accuracy table (position,
    attitude rotation-vector, velocities via ``quat13_boxminus``);
    ``--fossen-fit`` calibrates the quat13 wrench plant first
    (``sysid.fit_wrench(state='quat13')``)."""
    import jax
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.data.csv_loader import euler_to_quat_np
    from bluerov2_dynamics_tpu.models import estimation, fossen
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )
    from bluerov2_dynamics_tpu.models.thrusters import effective_wrench_history

    def to_quat13(X12):
        q = euler_to_quat_np(X12[:, 3], X12[:, 4], X12[:, 5])
        return np.concatenate([X12[:, 0:3], q, X12[:, 6:12]],
                              axis=1).astype(np.float32)

    if args.synthetic or args.csv is None:
        ds, X_true12, delay = common.load_or_generate_with_truth(args)
        X = to_quat13(ds.X)
        X_true = to_quat13(X_true12)
        # the EXACT applied wrench from the recorded commands (lag scan)
        cfg, lag = thruster_config(), lag_params(ds.dt)
        TAU = np.asarray(effective_wrench_history(
            cfg, lag, np.asarray(ds.U, np.float32),
            use_lag=not args.no_lag), np.float32)
    else:
        ds = common.load_or_generate(args, csv_loader.load_quat_dataset)
        X, X_true, delay = np.asarray(ds.X, np.float32), None, 0
        TAU = np.asarray(ds.U, np.float32)
    N, dt = X.shape[0], float(ds.dt)
    info(f"Dataset (quat13/wrench): {N} rows @ dt={dt:.4f} "
         f"(input delay {delay})")
    record = {"n_rows": N, "dt": dt, "filter": "mekf_quat13"}

    p = fossen_params()
    n_tr = int(args.train_split * N)
    sysid_res = fit_fossen_from_args(
        args, jnp.asarray(X[:n_tr]), jnp.asarray(TAU[:n_tr]), dt,
        kind="wrench", state="quat13")
    if sysid_res is not None:
        p = sysid_res.params
    record["plant"] = "fitted" if sysid_res is not None else "nominal"

    step = fossen.make_wrench_step(p, dt, "euler", "quat13")
    # tangent-space (12-dim) noise model: pos, attitude rotvec, vels
    r_diag = np.repeat(np.asarray(args.r_scales, np.float64) ** 2, 3)
    Q = jnp.eye(12, dtype=jnp.float32) * args.q
    R = jnp.asarray(np.diag(r_diag), jnp.float32)
    P0 = jnp.eye(12, dtype=jnp.float32) * args.p0
    Y = jnp.asarray(X)
    TAU_trans = jnp.asarray(TAU)[delay:delay + N - 1]

    res, cold, warm = time_fn_cold_warm(
        lambda: estimation.mekf_quat13(step, Q, R, Y[0], P0, TAU_trans, Y))
    nis_mean = float(jnp.mean(res.nis))
    ok(f"MEKF (quat13) over {N} steps: warm {warm:.4f} s (cold incl. "
       f"compile {cold:.2f} s); loglik {float(res.loglik):.1f}, mean NIS "
       f"{nis_mean:.2f} (chi^2 expectation 12)")
    record.update({"loglik": float(res.loglik), "nis_mean": nis_mean,
                   "filter_warm_s": warm, "filter_cold_s": cold})
    norms = np.linalg.norm(np.asarray(res.means)[:, 3:7], axis=-1)
    if not np.allclose(norms, 1.0, atol=1e-5):
        warn(f"quaternion norm drift: max |1-||q||| = "
             f"{float(np.max(np.abs(norms - 1.0))):.2e}")

    sm = None
    if args.smooth:
        sm, cold_s, warm_s = time_fn_cold_warm(
            lambda: estimation.manifold_rts_smooth(
                step, Q, TAU_trans, res,
                boxplus=estimation.quat13_boxplus,
                boxminus=estimation.quat13_boxminus))
        ok(f"Manifold RTS smoother backward pass: warm {warm_s:.4f} s "
           f"(cold {cold_s:.2f} s)")
        record.update({"smooth_warm_s": warm_s, "smooth_cold_s": cold_s})
    X_best = np.asarray(sm.means) if sm is not None else np.asarray(res.means)

    if X_true is not None:
        bm = jax.vmap(estimation.quat13_boxminus)
        err_r = np.asarray(bm(Y, jnp.asarray(X_true)))
        zero = 0.0 * err_r
        rows = {"raw sensor": _group_rmse(err_r, zero),
                "MEKF": _group_rmse(
                    np.asarray(bm(res.means, jnp.asarray(X_true))), zero)}
        if sm is not None:
            rows["RTS smoothed"] = _group_rmse(
                np.asarray(bm(sm.means, jnp.asarray(X_true))), zero)
        _print_rmse_table(rows)
        record["rmse_vs_truth"] = rows
    else:
        info("No ground truth available (real CSV) — NIS/loglik are the "
             "consistency diagnostics.")

    if not args.no_media:
        if X_true is not None:
            bm = jax.vmap(estimation.quat13_boxminus)
            Xt = jnp.asarray(X_true)
            try:
                _save_figure(
                    Path(args.media_dir) / "estimate_quat_channels.png",
                    dt, np.asarray(bm(Y, Xt)),
                    np.asarray(bm(res.means, Xt)),
                    np.asarray(bm(sm.means, Xt)) if sm is not None else None,
                    np.zeros((N, 12), np.float32),   # errors around zero
                    f"mean NIS {float(jnp.mean(res.nis)):.2f} "
                    f"(chi^2 expectation 12)",
                    chans=((2, "z", "m"), (5, "rotvec-z (yaw)", "rad"),
                           (6, "u", "m/s"), (11, "r", "rad/s")))
            except ImportError:
                warn("matplotlib unavailable — skipping the estimation "
                     "figure")
        else:
            info("estimation figure needs ground truth for the "
                 "tangent-space error view — skipped on real CSV data")

    if args.out_csv:
        cols = ["t"] + csv_loader.QUAT13_COLS + csv_loader.WRENCH_COLS
        data = np.column_stack([np.asarray(ds.t, np.float64), X_best, TAU])
        path = Path(args.out_csv)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(path, data, delimiter=",", comments="",
                   header=",".join(cols))
        ok(f"Wrote filtered quat13-contract CSV -> {path}")
    if args.json_out:
        path = Path(args.json_out)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(json_sanitize(record), indent=2))
        ok(f"Wrote JSON run record -> {path}")
    return record


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.models import estimation, fossen
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params,
        lag_params,
        thruster_config,
    )
    from bluerov2_dynamics_tpu.models.thrusters import effective_wrench_history

    args = build_parser().parse_args(argv)
    # argv-only validation FIRST — these must not burn a 45k-row filter
    # run (tens of seconds of tunnel compile+execute) before failing
    if args.smooth and args.filter != "ekf":
        raise SystemExit("--smooth composes with --filter ekf")
    if args.filter == "mhe" and args.steps > 800 and (
            args.synthetic or args.csv is None):
        raise SystemExit(
            "--filter mhe runs iters x window sequential optimization "
            "steps PER SAMPLE — measured ~54 ms/row on the tunneled TPU "
            "(latency-bound; the receding scan gains nothing from the "
            "chip), so >800 rows exceeds the ~1 min single-execution "
            "crash limit (measured: 1500 rows = ~80 s crashed the "
            "worker).  Run a shorter --steps slice, or vmap mhe over "
            "estimation.segment_trajectory segments for long records.")
    if args.outlier_frac > 0.0 and not (args.synthetic or args.csv is None):
        raise SystemExit("--outlier-frac corrupts SYNTHETIC sensors "
                         "(real CSVs carry whatever glitches they "
                         "carry); run with --synthetic")
    if args.filter == "koopman":
        if args.measure == "pose":
            raise SystemExit("--filter koopman needs --measure all (the "
                             "lifted KF measures through the full-state "
                             "readout)")
        if getattr(args, "fossen_fit", False):
            raise SystemExit("--filter koopman ignores the calibrated "
                             "physics plant (the lifted model is fitted "
                             "from data); drop --fossen-fit")
    if args.refit_koopman and not (args.synthetic or args.csv is None):
        raise SystemExit("--refit-koopman needs ground truth; run with "
                         "--synthetic [--recording]")
    if args.contract == "quat":
        for flag, name in (
                (args.fit_noise, "--fit-noise"),
                (args.refit_koopman, "--refit-koopman"),
                (args.measure == "pose", "--measure pose"),
                (args.filter != "ekf", f"--filter {args.filter}")):
            if flag:
                raise SystemExit(
                    f"{name} is not supported with --contract quat "
                    f"(this contract always runs the MEKF; leave "
                    f"--filter at its default)")
        return _main_quat(args)

    X, U, X_true, t_stamps, dt, delay = _load(args)
    N = X.shape[0]
    info(f"Dataset: {N} rows @ dt={dt:.4f} (input delay {delay})")

    if args.outlier_frac > 0.0:
        rng_o = np.random.default_rng(args.seed + 1)
        sig_groups = np.repeat(
            np.asarray(args.r_scales, np.float64)
            * (args.noise_scale if tuple(args.r_scales) == DEFAULT_R_SCALES
               else 1.0), 3)
        mask = rng_o.random(X.shape) < args.outlier_frac
        X = X + np.where(
            mask,
            args.outlier_sigma * sig_groups
            * np.sign(rng_o.standard_normal(X.shape)), 0.0
        ).astype(X.dtype)
        info(f"Injected impulsive outliers: {mask.mean():.1%} of samples "
             f"at +-{args.outlier_sigma:g} sigma")

    record = {"n_rows": N, "dt": dt, "filter": args.filter}

    # ---- plant: nominal or sysid-calibrated physics --------------------
    p = fossen_params()
    cfg = thruster_config()
    lag = lag_params(dt)
    n_tr = int(args.train_split * N)
    sysid_res = fit_fossen_from_args(args, jnp.asarray(X[:n_tr]),
                                     jnp.asarray(U[:n_tr]), dt)
    if sysid_res is not None:
        p, cfg = sysid_res.params, sysid_res.cfg
        record["plant"] = "fitted"
    else:
        record["plant"] = "nominal"

    # ---- exact wrench inputs from the command history ------------------
    TAU = effective_wrench_history(cfg, lag, U, use_lag=not args.no_lag)
    TAU_trans = jnp.asarray(TAU)[delay:delay + N - 1]          # (N-1, 6)
    step = fossen.make_wrench_step(p, dt, "euler", "euler12")
    pose_only = args.measure == "pose"
    m_dim = 6 if pose_only else 12
    h = (lambda x: x[:6]) if pose_only else (lambda x: x)

    # ---- noise model ----------------------------------------------------
    r_scales = np.asarray(args.r_scales, np.float64)
    if (args.noise_scale != 1.0 and (args.synthetic or args.csv is None)
            and tuple(args.r_scales) == DEFAULT_R_SCALES):
        # the defaults mirror the generator's sigmas — keep them matched
        # when --noise-scale changes the generated sensor noise
        r_scales = r_scales * args.noise_scale
        info(f"--noise-scale {args.noise_scale:g}: default R sigmas "
             f"scaled to match the generator")
    r_diag = np.repeat(r_scales ** 2, 3)[:m_dim]
    Q = jnp.eye(12, dtype=jnp.float32) * args.q
    R = jnp.asarray(np.diag(r_diag), jnp.float32)
    P0 = jnp.eye(12, dtype=jnp.float32) * args.p0
    Y = jnp.asarray(X)[:, :m_dim]
    if pose_only:
        # unmeasured velocities: zero prior mean, loose prior variance
        P0 = P0.at[jnp.arange(6, 12), jnp.arange(6, 12)].set(0.25)
        m0 = jnp.concatenate([Y[0], jnp.zeros(6, jnp.float32)])
        info("Measuring position+attitude only — velocities are "
             "estimated, never observed")
    else:
        m0 = Y[0]

    if args.fit_noise:
        W = min(args.fit_noise_window, N)
        L = args.fit_noise_seglen
        if L and W // L >= 2:
            m0_f, U_f, Y_f = estimation.segment_trajectory(
                TAU_trans[:W - 1], Y[:W], L)
            if pose_only:
                # segment priors: measured pose, zero-velocity mean
                m0_f = jnp.concatenate(
                    [m0_f, jnp.zeros((m0_f.shape[0], 6), jnp.float32)],
                    axis=1)
            info(f"ML noise identification on the first {W} rows as a "
                 f"{U_f.shape[0]}x{L}-segment bank "
                 f"({args.fit_noise_steps} Adam steps)...")
        else:
            m0_f, U_f, Y_f = m0, TAU_trans[:W - 1], Y[:W]
            info(f"ML noise identification on the first {W} rows "
                 f"({args.fit_noise_steps} Adam steps)...")
        fit, t_fit = time_fn(
            lambda: estimation.fit_noise(
                step, h, m0_f, P0, U_f, Y_f,
                q0=args.q, r0=r_diag.astype(np.float32),
                steps=args.fit_noise_steps, lr=args.fit_noise_lr),
            warmup=0)
        Q, R = fit.Q, fit.R
        q_grp = {g: float(np.sqrt(np.mean(
            np.exp(np.asarray(fit.log_q, np.float64))[lo:hi])))
            for g, lo, hi in GROUPS}
        r_grp = {g: float(np.sqrt(np.mean(
            np.exp(np.asarray(fit.log_r, np.float64))[lo:hi])))
            for g, lo, hi in GROUPS if hi <= m_dim}
        ok(f"Noise fitted in {t_fit:.2f} s (incl. compile): negll/meas "
           f"{float(fit.losses[0]):.3f} -> {float(fit.losses[-1]):.3f}")
        info("  fitted per-group RMS sigma:  " + "  ".join(
            f"{g}: q={q_grp[g]:.2e}" + (f" r={r_grp[g]:.2e}"
                                        if g in r_grp else "")
            for g in q_grp))
        if args.filter == "koopman":
            warn("--filter koopman uses only the fitted R; the fitted "
                 "(state-space) Q does not transfer to the lifted system "
                 "(process noise stays --koopman-q)")
        record["fit_noise"] = {
            "seconds": t_fit,
            "negll_first": float(fit.losses[0]),
            "negll_last": float(fit.losses[-1]),
            "q_var_diag": np.exp(
                np.asarray(fit.log_q, np.float64)).tolist(),
            "r_var_diag": np.exp(
                np.asarray(fit.log_r, np.float64)).tolist(),
        }

    # ---- filter ----------------------------------------------------------
    if args.filter == "koopman":
        # data-driven filter: fit EDMDc on the (noisy) training split,
        # then run the EXACT linear KF on its lifted system.  The model's
        # own pairing convention (X[k] -> X[k+1] driven by U[k], the
        # evaluator convention every app fits with) fixes the input slice.
        model, _, fit_warm = common.fit_koopman_from_args(
            args, jax.random.PRNGKey(args.seed), jnp.asarray(X[:n_tr]),
            jnp.asarray(U[:n_tr]))
        ok(f"EDMDc model fitted on the training split for the lifted KF "
           f"({args.n_rbfs} RBFs, warm {fit_warm:.3f} s)")
        U_k = jnp.asarray(U[:N - 1])
        run_filter = lambda: estimation.koopman_kalman_filter(
            model, R, U_k, Y, q=args.koopman_q)
    else:
        run_filter = {
            "ekf": lambda: estimation.ekf(step, h, Q, R, m0, P0,
                                          TAU_trans, Y),
            "ukf": lambda: estimation.ukf(step, h, Q, R, m0, P0,
                                          TAU_trans, Y),
            "pf": lambda: estimation.particle_filter(
                step, h, Q, R, m0, P0, TAU_trans, Y,
                n_particles=args.pf_particles,
                key=jax.random.PRNGKey(args.seed)),
            "mhe": lambda: estimation.mhe(
                step, h, Q, R, m0, P0, TAU_trans, Y,
                window=args.mhe_window, iters=args.mhe_iters,
                init_iters=20 * args.mhe_iters,
                meas_loss=args.mhe_meas_loss),
        }[args.filter]
    res, cold, warm = time_fn_cold_warm(run_filter)
    if args.filter == "mhe":
        diag_text = (f"{args.mhe_meas_loss} MHE, window {args.mhe_window} "
                     f"x {args.mhe_iters} iters")
        ok(f"MHE ({args.mhe_meas_loss}) over {N} steps: warm {warm:.4f} s "
           f"(cold incl. compile {cold:.2f} s); final window cost "
           f"{float(res.losses[-1]):.2f}")
        record.update({"mhe_final_cost": float(res.losses[-1]),
                       "meas_loss": args.mhe_meas_loss,
                       "filter_warm_s": warm, "filter_cold_s": cold})
    elif args.filter == "pf":
        # the PF's consistency diagnostic is the effective sample size,
        # not NIS (no Gaussian innovation anywhere)
        ess_mean = float(jnp.mean(res.ess))
        diag_text = (f"mean ESS {ess_mean:.0f}/{args.pf_particles} "
                     f"particles")
        ok(f"PF ({args.pf_particles} particles) over {N} steps: warm "
           f"{warm:.4f} s (cold incl. compile {cold:.2f} s); loglik "
           f"{float(res.loglik):.1f}, {diag_text}")
        record.update({"loglik": float(res.loglik), "ess_mean": ess_mean,
                       "n_particles": args.pf_particles,
                       "filter_warm_s": warm, "filter_cold_s": cold})
    else:
        nis_mean = float(jnp.mean(res.nis))
        diag_text = (f"mean NIS {nis_mean:.2f} (chi^2 expectation "
                     f"{Y.shape[1]})")
        ok(f"{args.filter.upper()} over {N} steps: warm {warm:.4f} s "
           f"(cold incl. compile {cold:.2f} s); loglik "
           f"{float(res.loglik):.1f}, {diag_text}")
        record.update({"loglik": float(res.loglik), "nis_mean": nis_mean,
                       "filter_warm_s": warm, "filter_cold_s": cold})

    sm = None
    if args.smooth:
        sm, cold_s, warm_s = time_fn_cold_warm(
            lambda: estimation.rts_smooth(step, Q, TAU_trans, res))
        ok(f"RTS smoother backward pass: warm {warm_s:.4f} s "
           f"(cold {cold_s:.2f} s)")
        record.update({"smooth_warm_s": warm_s, "smooth_cold_s": cold_s})

    X_filt = np.asarray(res.means)
    X_best = np.asarray(sm.means) if sm is not None else X_filt

    # ---- accuracy vs truth (synthetic only) ------------------------------
    if X_true is not None:
        rows = {"raw sensor": _group_rmse(X, X_true),
                args.filter.upper(): _group_rmse(X_filt, X_true)}
        if sm is not None:
            rows["RTS smoothed"] = _group_rmse(np.asarray(sm.means), X_true)
        _print_rmse_table(rows)
        record["rmse_vs_truth"] = rows
        if hasattr(res, "covs"):
            ne = estimation.nees(res, jnp.asarray(X_true))
            record["nees_mean"] = float(jnp.mean(ne[10:]))
            info(f"mean NEES (post-transient): {record['nees_mean']:.2f} "
                 f"(chi^2 expectation 12)")
    else:
        info("No ground truth available (real CSV) — NIS/loglik are the "
             "consistency diagnostics.")

    # ---- downstream value: Koopman refit on filtered states --------------
    if args.refit_koopman:
        from bluerov2_dynamics_tpu.models import koopman

        key = jax.random.PRNGKey(args.seed)
        X_te_true = jnp.asarray(X_true[n_tr:])
        U_te = jnp.asarray(U[n_tr:])
        rows_k = {}
        for label, Xtr in (("raw", X[:n_tr]), ("filtered", X_best[:n_tr])):
            model = koopman.fit(
                key, jnp.asarray(Xtr), jnp.asarray(U[:n_tr]),
                n_rbfs=args.n_rbfs, gamma=args.gamma, ridge=args.ridge,
                position_invariant=args.koopman_position_invariant)
            rows_k[label] = {
                H: float(koopman.multistep_rmse(
                    model, X_te_true, U_te, H=H,
                    method=common.koopman_method(args)))
                for H in common.HORIZONS
            }
        print("\n[metrics] Koopman endpoint RMSE on NOISE-FREE truth "
              "(train on raw vs filtered states):")
        print("  Train states          |" + "|".join(
            f" {('H=%d' % H):>10} " for H in common.HORIZONS))
        for label, vals in rows_k.items():
            print(f"  {label:<21} |" + "|".join(
                f" {vals[H]:>10.6f} " for H in common.HORIZONS))
        record["koopman_refit"] = {
            k: {str(H): v for H, v in d.items()} for k, d in rows_k.items()}

    # ---- artifacts --------------------------------------------------------
    if not args.no_media:
        try:
            # non-default filters get their own filename so a ukf/pf/
            # koopman run never clobbers the blessed EKF figures
            fig_name = ("estimate_channels"
                        + ("_pose" if pose_only else "")
                        + (f"_{args.filter}" if args.filter != "ekf" else "")
                        + ".png")
            _save_figure(
                Path(args.media_dir) / fig_name,
                dt, X,
                X_filt, np.asarray(sm.means) if sm is not None else None,
                X_true, diag_text)
        except ImportError:
            warn("matplotlib unavailable — skipping the estimation figure")

    if args.out_csv:
        cols = (["t"] + csv_loader.EULER12_COLS + csv_loader.THRUSTER_COLS)
        data = np.column_stack([t_stamps, X_best, U])
        path = Path(args.out_csv)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(path, data, delimiter=",", comments="",
                   header=",".join(cols))
        ok(f"Wrote {'smoothed' if sm is not None else 'filtered'} "
           f"thruster-contract CSV -> {path}")

    if args.json_out:
        path = Path(args.json_out)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(json_sanitize(record), indent=2))
        ok(f"Wrote JSON run record -> {path}")
    return record


if __name__ == "__main__":
    main()
