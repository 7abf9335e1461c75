"""End-to-end smoke tests: every workload app runs on small synthetic data."""

import os

import numpy as np
import pytest


def _args(tmp_path, extra=()):
    return [
        "--synthetic", "--steps", "600", "--dt", "0.02",
        "--n-rbfs", "30", "--gamma", "1.0", "--ridge", "1e-3",
        "--open-loop-steps", "50",
        "--media-dir", str(tmp_path / "media"),
        "--no-media",
        *extra,
    ]


def test_sim_koopman_app(tmp_path, capsys):
    from bluerov2_dynamics_tpu.apps import sim_koopman

    out = sim_koopman.main(
        ["--steps", "800", "--dt", "0.05", "--n-rbfs", "30",
         "--demo-steps", "40", "--no-media",
         "--media-dir", str(tmp_path / "media")]
    )
    assert out["pred"].shape == out["true"].shape
    assert np.all(np.isfinite(out["pred"]))
    assert "One-step RMSE" in capsys.readouterr().out


def test_tank_koopman_app(tmp_path, capsys):
    from bluerov2_dynamics_tpu.apps import tank_koopman

    out = tank_koopman.main(_args(tmp_path, ["--physics-baseline"]))
    assert np.all(np.isfinite(out["pred"]))
    text = capsys.readouterr().out
    assert "Koopman" in text and "Fossen" in text


def test_tank_koopman_app_conv_method(tmp_path, capsys):
    """--koopman-conv scores via the control-convolution endpoint; the
    metric table must agree with the default scan run to f32 reassociation
    tolerance."""
    import re

    from bluerov2_dynamics_tpu.apps import tank_koopman

    def koopman_row(text):
        row = next(ln for ln in text.splitlines()
                   if ln.strip().startswith("Koopman") and "|" in ln)
        return [float(v) for v in re.findall(r"\d+\.\d+", row)]

    tank_koopman.main(_args(tmp_path))
    base = koopman_row(capsys.readouterr().out)
    tank_koopman.main(_args(tmp_path, ["--koopman-conv"]))
    conv = koopman_row(capsys.readouterr().out)
    assert len(conv) == len(base) and len(base) >= 3  # no nan cells parsed away
    # f32 reassociation drift over H=100 plus 6-decimal table rounding
    np.testing.assert_allclose(conv, base, rtol=5e-3, atol=5e-6)


def test_tank_koopman_multi_csv(tmp_path, capsys):
    """--extra-csv fits multiple recordings jointly (fit_multi path)."""
    import jax
    import pandas as pd

    from bluerov2_dynamics_tpu.apps import tank_koopman
    from bluerov2_dynamics_tpu.data.synthetic import generate_sim_dataset

    # write two small recordings as CSVs
    cols = ["x", "y", "z", "phi", "theta", "psi",
            "u", "v", "w", "p", "q", "r"] + [f"u{i}" for i in range(1, 9)]
    paths = []
    for seed in (1, 2):
        ds = generate_sim_dataset(jax.random.PRNGKey(seed), n_steps=400, dt=0.02)
        df = pd.DataFrame(np.c_[np.asarray(ds.X), np.asarray(ds.U)], columns=cols)
        df.insert(0, "t", np.arange(400) * 0.02)
        path = tmp_path / f"rec{seed}.csv"
        df.to_csv(path, index=False)
        paths.append(str(path))

    out = tank_koopman.main([
        "--csv", paths[0], "--extra-csv", paths[1],
        "--n-rbfs", "20", "--open-loop-steps", "40", "--no-media",
        "--media-dir", str(tmp_path / "media"),
    ])
    assert np.all(np.isfinite(out["pred"]))
    text = capsys.readouterr().out
    assert "Multi-trajectory fit over 2 recordings" in text


def test_tank_koopman_decoder_flag(tmp_path, capsys):
    """--decoder learns the linear readout (reference's sketched capability)."""
    from bluerov2_dynamics_tpu.apps import tank_koopman

    out = tank_koopman.main(_args(tmp_path, ["--decoder"]))
    assert np.all(np.isfinite(out["pred"]))
    assert "Learned linear decoder" in capsys.readouterr().out


def test_tank_koopman_sweep_flag(tmp_path, capsys):
    """--sweep fits all (gamma, ridge) combos vmapped and reports the pick."""
    from bluerov2_dynamics_tpu.apps import tank_koopman

    out = tank_koopman.main(_args(tmp_path, [
        "--sweep", "--sweep-gammas", "1.0", "3.0",
        "--sweep-ridges", "1e-3", "1e-1",
    ]))
    assert np.all(np.isfinite(out["pred"]))
    text = capsys.readouterr().out
    assert "Sweep over 2x2" in text and "best gamma=" in text


def test_tank_wrench_comp_app(tmp_path, capsys):
    from bluerov2_dynamics_tpu.apps import tank_wrench_comp

    out = tank_wrench_comp.main(_args(tmp_path))
    for k in ("koopman", "fossen", "di"):
        assert np.all(np.isfinite(out[k])), k
    assert "Fossen (wrench)" in capsys.readouterr().out


def test_tank_wrench_quat_app(tmp_path, capsys):
    from bluerov2_dynamics_tpu.apps import tank_wrench_quat

    out = tank_wrench_quat.main(_args(tmp_path))
    for k in ("koopman", "fossen", "di"):
        assert np.all(np.isfinite(out[k])), k
    # quaternion norms along the Fossen rollout
    norms = np.linalg.norm(out["fossen"][:, 3:7], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize("integrator", ["euler", "rk4"])
def test_tank_full_comparison_app(tmp_path, capsys, integrator):
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    ckpt = tmp_path / "pinc.msgpack"
    out = tank_full_comparison.main(
        _args(tmp_path, [
            "--pinc-epochs", "3",
            "--pinc-hidden", "16", "16",
            "--pinc-ckpt", str(ckpt),
            "--integrator", integrator,
        ])
    )
    assert ckpt.exists()
    for name, traj in out["trajs"].items():
        assert np.all(np.isfinite(traj)), name
    rmses = out["rmses"]
    assert set(rmses) == {
        "Koopman", "Fossen (BlueROV2)", "Double Integrator", "PINc (ResDNN)"
    }
    for vals in rmses.values():
        assert set(vals) == {1, 10, 100}
    # checkpoint-skip path
    out2 = tank_full_comparison.main(
        _args(tmp_path, [
            "--pinc-epochs", "3",
            "--pinc-hidden", "16", "16",
            "--pinc-ckpt", str(ckpt),
            "--integrator", integrator,
        ])
    )
    assert "Loading PINc checkpoint" in capsys.readouterr().out


def test_flagship_json_out(tmp_path, capsys):
    """--json-out writes a machine-readable run record."""
    import json

    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    out_path = tmp_path / "rec" / "run.json"
    tank_full_comparison.main(_args(tmp_path, [
        "--pinc-epochs", "2", "--pinc-ckpt", str(tmp_path / "ck.msgpack"),
        "--json-out", str(out_path),
    ]))
    d = json.loads(out_path.read_text())
    assert {"dataset", "fit_seconds_warm", "rmse", "metric_seconds_warm",
            "backend"} <= set(d)
    assert "Koopman" in d["rmse"] and len(d["rmse"]["Koopman"]) == 3
    # strict JSON: no bare NaN/Infinity tokens (the slope timer's NaN
    # sentinel must serialize as null) — parse_constant raises on any
    json.loads(out_path.read_text(),
               parse_constant=lambda c: (_ for _ in ()).throw(
                   AssertionError(f"non-strict JSON token {c!r}")))


def test_json_sanitize_maps_nonfinite_to_null():
    """common.json_sanitize turns NaN/inf anywhere in a nested record
    into None so --json-out artifacts are strict JSON (jq/JSON.parse
    parseable) even when a tunnel hiccup made a slope timing NaN."""
    import json

    from bluerov2_dynamics_tpu.apps import common

    rec = {"a": float("nan"), "b": [1.0, float("inf"), {"c": -float("inf")}],
           "d": "keep", "e": 2, "f": (3.5, float("nan"))}
    out = common.json_sanitize(rec)
    assert out == {"a": None, "b": [1.0, None, {"c": None}],
                   "d": "keep", "e": 2, "f": [3.5, None]}
    json.dumps(out, allow_nan=False)  # must not raise


def test_pinc_checkpoint_sidecar_overrides_flags(tmp_path, capsys):
    """A checkpoint trained with --pinc-position-invariant must reload with
    the same net construction even when the flag is NOT passed (the config
    sidecar travels with the checkpoint and overrides the CLI)."""
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    ckpt = tmp_path / "pi_ck.msgpack"
    common_args = _args(tmp_path, ["--pinc-epochs", "2",
                                   "--pinc-ckpt", str(ckpt)])
    tank_full_comparison.main(common_args + ["--pinc-position-invariant"])
    assert (tmp_path / "pi_ck.msgpack.json").exists()
    capsys.readouterr()
    out1 = tank_full_comparison.main(common_args)  # no flag on reload
    text = capsys.readouterr().out
    assert "sidecar overrides" in text
    # and the reloaded metrics equal a reload WITH the flag (same net)
    out2 = tank_full_comparison.main(
        common_args + ["--pinc-position-invariant"])
    for H in (1, 10, 100):
        assert out1["rmses"]["PINc (ResDNN)"][H] == out2["rmses"]["PINc (ResDNN)"][H]


def test_viz_outputs(tmp_path, rng):
    """Animation + static figure actually produce files."""
    from bluerov2_dynamics_tpu.viz import animate_topdown, plot_topdown_with_depth

    T = 30
    traj = np.zeros((T, 12))
    traj[:, 0] = np.linspace(0, 3, T)
    traj[:, 1] = np.sin(np.linspace(0, 2, T))
    traj[:, 5] = np.linspace(0, 1, T)
    traj2 = traj + 0.1 * rng.normal(size=traj.shape)
    gif = tmp_path / "anim.gif"
    animate_topdown({"A": traj, "B": traj2}, dt=0.1, save_path=str(gif))
    assert gif.exists() and gif.stat().st_size > 0
    png = plot_topdown_with_depth(
        {"A": traj, "B": traj2}, dt=0.1, seconds=2.0,
        save_path=str(tmp_path / "fig.png"),
    )
    assert os.path.exists(png)


def test_demo_euler(capsys):
    from bluerov2_dynamics_tpu.apps import demo

    traj = demo.run_euler(dt=0.01, t_end=0.5, print_every=10)
    assert traj.shape == (51, 12)
    assert "Time=0.41" in capsys.readouterr().out  # k = 1, 11, ..., 41


def test_demo_ode_with_tether(capsys):
    from bluerov2_dynamics_tpu.apps import demo

    traj = demo.run_ode(dt=0.01, t_end=0.3, use_tether=True, print_every=10)
    assert traj.shape[0] == 31
    import numpy as np

    assert np.all(np.isfinite(traj))


def test_profiling_utils():
    import jax.numpy as jnp
    import pytest as _pytest

    from bluerov2_dynamics_tpu.utils import profiling

    with profiling.StepsPerSecond(100) as c:
        c.done(jnp.ones(4))
    assert c.rate > 0
    profiling.check_finite({"a": jnp.ones(3)}, "ok")
    with _pytest.raises(FloatingPointError):
        profiling.check_finite({"a": jnp.array([1.0, jnp.nan])}, "bad")
    assert profiling.fraction_nonfinite({"a": jnp.array([1.0, jnp.inf])}) == 0.5


def test_app_csv_directory_discovery(tmp_path, capsys):
    """--csv pointing at a directory discovers the newest dataset file."""
    import pandas as pd

    from bluerov2_dynamics_tpu.apps import tank_koopman
    from bluerov2_dynamics_tpu.data import csv_loader

    rng = np.random.default_rng(0)
    d = tmp_path / "rosbags" / "run1"
    d.mkdir(parents=True)
    N = 300
    cols = {"t": np.arange(N) * 0.02}
    for c in csv_loader.EULER12_COLS:
        cols[c] = rng.normal(size=N) * 0.1
    for c in csv_loader.THRUSTER_COLS:
        cols[c] = np.clip(rng.normal(size=N), -1, 1)
    pd.DataFrame(cols).to_csv(d / "koopman_dataset_50Hz.csv", index=False)

    out = tank_koopman.main([
        "--csv", str(tmp_path), "--n-rbfs", "10", "--gamma", "1.0",
        "--ridge", "1e-3", "--open-loop-steps", "20", "--no-media",
        "--media-dir", str(tmp_path / "m"),
    ])
    assert np.all(np.isfinite(out["pred"]))
    assert "koopman_dataset_50Hz.csv" in capsys.readouterr().out


def test_animate_quat_trajectories(tmp_path, rng):
    """The animator derives heading from the quaternion block of 13-state
    trajectories."""
    from bluerov2_dynamics_tpu.viz import animate_topdown
    from bluerov2_dynamics_tpu.viz.animate import _yaw_of
    from bluerov2_dynamics_tpu.data.csv_loader import euler_to_quat_np

    T = 20
    psi = np.linspace(0, 1.5, T)
    q = euler_to_quat_np(np.zeros(T), np.zeros(T), psi)
    traj13 = np.zeros((T, 13))
    traj13[:, 0] = np.linspace(0, 2, T)
    traj13[:, 3:7] = q
    np.testing.assert_allclose(_yaw_of(traj13), psi, atol=1e-9)
    gif = tmp_path / "q.gif"
    animate_topdown({"quat": traj13}, dt=0.1, save_path=str(gif))
    assert gif.exists()


def test_tank_wrench_comp_multi_csv(tmp_path, capsys):
    """--extra-csv now works in every tank workload (round-2 gap: only
    tank_koopman could consume multi-recording data); the wrench app loads
    extras through its own wrench column contract."""
    import jax
    import pandas as pd

    from bluerov2_dynamics_tpu.apps import tank_wrench_comp
    from bluerov2_dynamics_tpu.data.synthetic import generate_sim_dataset
    from bluerov2_dynamics_tpu.data.wrench import thrusters_to_wrench

    cols = ["x", "y", "z", "phi", "theta", "psi",
            "u", "v", "w", "p", "q", "r"]
    wcols = ["Fx", "Fy", "Fz", "Mx", "My", "Mz"]
    paths = []
    for seed in (1, 2):
        ds = generate_sim_dataset(jax.random.PRNGKey(seed), n_steps=400, dt=0.02)
        W = np.asarray(thrusters_to_wrench(np.asarray(ds.U)))
        df = pd.DataFrame(np.c_[np.asarray(ds.X), W], columns=cols + wcols)
        df.insert(0, "t", np.arange(400) * 0.02)
        path = tmp_path / f"wrench{seed}.csv"
        df.to_csv(path, index=False)
        paths.append(str(path))

    out = tank_wrench_comp.main([
        "--csv", paths[0], "--extra-csv", paths[1],
        "--n-rbfs", "20", "--open-loop-steps", "40", "--no-media",
        "--media-dir", str(tmp_path / "media"),
    ])
    assert np.all(np.isfinite(out["koopman"]))
    text = capsys.readouterr().out
    assert "Multi-trajectory fit over 2 recordings" in text


def test_tank_koopman_save_load_model(tmp_path, capsys):
    """--save-model / --load-model: the deterministic Koopman fit is
    cacheable like the reference's PINc checkpoint (SURVEY §5)."""
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.apps import tank_koopman
    from bluerov2_dynamics_tpu.models import koopman

    mpath = str(tmp_path / "koop.npz")
    out1 = tank_koopman.main(_args(tmp_path, [
        "--save-model", mpath, "--koopman-position-invariant", "--decoder",
    ]))
    out2 = tank_koopman.main(_args(tmp_path, ["--load-model", mpath]))
    np.testing.assert_allclose(out1["pred"], out2["pred"], atol=1e-6)
    text = capsys.readouterr().out
    assert "Loading Koopman model" in text

    m = koopman.load_model(mpath)
    assert m.decoder is not None and m.rbf_weights is not None
    assert m.rbf_weights[0] == 0.0  # position-invariant mask survived


def test_flagship_rejects_missing_pt_checkpoint(tmp_path):
    """A nonexistent --pinc-ckpt *.pt must error out, not train and save
    msgpack bytes under the .pt name (which would poison the next run's
    torch import branch)."""
    import pytest as _pytest

    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    with _pytest.raises(SystemExit, match="msgpack"):
        tank_full_comparison.main(_args(tmp_path, [
            "--pinc-ckpt", str(tmp_path / "missing.pt"),
        ]))
    assert not (tmp_path / "missing.pt").exists()


def test_sim_koopman_rejects_extra_csv(tmp_path):
    import pytest as _pytest

    from bluerov2_dynamics_tpu.apps import sim_koopman

    with _pytest.raises(SystemExit, match="tank workloads"):
        sim_koopman.main(["--steps", "400", "--no-media",
                          "--extra-csv", "whatever.csv"])


def test_tank_full_comparison_pinc_dp(tmp_path):
    """The flagship app's --pinc-dp N trains PINc over an N-device mesh
    (library DP path) end-to-end."""
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    ckpt = tmp_path / "pinc_dp.msgpack"
    out = tank_full_comparison.main(
        _args(tmp_path, [
            "--pinc-epochs", "2",
            "--pinc-hidden", "16", "16",
            "--pinc-ckpt", str(ckpt),
            "--pinc-dp", "4",
        ])
    )
    assert ckpt.exists()
    assert np.all(np.isfinite(out["rmses"]["PINc (ResDNN)"][1]))


@pytest.mark.parametrize("app_name, extra", [
    ("tank_koopman", ["--physics-baseline"]),
    ("tank_wrench_comp", []),
    ("tank_wrench_quat", []),
])
def test_fossen_fit_flag(tmp_path, capsys, app_name, extra):
    """--fossen-fit adds a finite 'Fossen (fitted)' metric row in every
    input contract (thruster / wrench-euler12 / wrench-quat13)."""
    import importlib

    app = importlib.import_module(f"bluerov2_dynamics_tpu.apps.{app_name}")
    app.main(_args(tmp_path, [
        *extra, "--fossen-fit", "--fossen-fit-steps", "5",
        "--fossen-fit-horizon", "3",
    ]))
    text = capsys.readouterr().out
    assert "Fossen coefficients fitted" in text
    row = next(ln for ln in text.splitlines()
               if ln.strip().startswith("Fossen (fitted)"))
    vals = [float(v) for v in row.split("|")[1:]]
    assert len(vals) >= 3 and np.all(np.isfinite(vals)), row


def test_flagship_fossen_fit_gains(tmp_path, capsys):
    """Flagship --fossen-fit --fossen-fit-gains end to end (fitted cfg is
    threaded into the evaluator)."""
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    out = tank_full_comparison.main(
        _args(tmp_path, [
            "--pinc-epochs", "2",
            "--pinc-hidden", "16", "16",
            "--pinc-ckpt", str(tmp_path / "pinc_ff.msgpack"),
            "--fossen-fit", "--fossen-fit-steps", "5",
            "--fossen-fit-horizon", "3", "--fossen-fit-gains",
        ])
    )
    text = capsys.readouterr().out
    assert "Fossen coefficients fitted" in text
    assert "Fossen (fitted)" in text
    # the fitted model joins the open-loop rollout + media panels
    assert "FOSSEN (fitted)" in out["trajs"]
    assert np.all(np.isfinite(out["trajs"]["FOSSEN (fitted)"]))


def test_flagship_fossen_fit_scales_figure(tmp_path):
    """--fossen-fit with media on writes the coefficient-scales figure
    (with generator ground truth on the pseudo recording)."""
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    args = _args(tmp_path, [
        "--recording",
        "--pinc-epochs", "2", "--pinc-hidden", "16", "16",
        "--pinc-ckpt", str(tmp_path / "pinc_fig.msgpack"),
        "--fossen-fit", "--fossen-fit-steps", "4", "--fossen-fit-horizon", "3",
        "--open-loop-steps", "20",
    ])
    args.remove("--no-media")
    tank_full_comparison.main(args)
    assert (tmp_path / "media" / "fossen_fit_scales.png").exists()


def test_control_demo_app(tmp_path, capsys):
    """Closed-loop control demo: all three tasks run and report recovery."""
    from bluerov2_dynamics_tpu.apps import control_demo

    out = control_demo.main(["all", "--steps", "300",
                             "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "LQR hover recovery" in text
    assert "Koopman-LQR hover recovery" in text
    assert "terminal position error" in text
    for task in ("hover", "koopman"):
        assert out[task]["final_norm"] < 0.1 * out[task]["initial_norm"], task
    assert out["waypoint"]["terminal_error"] < 0.05
    assert (tmp_path / "media" / "control_demo_2D.png").exists()


def test_estimate_app_filter_beats_raw(tmp_path, capsys):
    """EKF + ML noise fit + RTS on the pseudo recording: the smoothed
    states beat the raw sensors on every channel group, the NIS lands near
    its chi^2 expectation, and the written CSV round-trips the thruster
    contract."""
    from bluerov2_dynamics_tpu.apps import estimate
    from bluerov2_dynamics_tpu.data import csv_loader

    out_csv = tmp_path / "filtered.csv"
    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "1200",
        "--smooth", "--fit-noise", "--fit-noise-window", "400",
        "--fit-noise-steps", "60",
        "--media-dir", str(tmp_path / "media"),   # NEVER the repo media/
        "--out-csv", str(out_csv),
        "--json-out", str(tmp_path / "rec.json"),
    ])
    assert (tmp_path / "media" / "estimate_channels.png").exists()
    rows = rec["rmse_vs_truth"]
    for g in ("position", "attitude", "all"):
        assert rows["RTS smoothed"][g] < rows["raw sensor"][g], g
    assert rows["RTS smoothed"]["all"] < rows["EKF"]["all"]
    assert 3.0 < rec["nis_mean"] < 40.0   # chi^2_12 expectation = 12
    text = capsys.readouterr().out
    assert "RMSE vs noise-free truth" in text
    assert "Noise fitted" in text

    ds = csv_loader.load_thruster_dataset(out_csv)
    assert ds.X.shape == (1200, 12) and ds.U.shape == (1200, 8)
    assert abs(ds.dt - 0.02) < 1e-9
    assert (tmp_path / "rec.json").exists()


def test_estimate_app_ukf_and_refit_koopman(tmp_path, capsys):
    from bluerov2_dynamics_tpu.apps import estimate

    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "900",
        "--filter", "ukf", "--no-media",
        "--refit-koopman", "--n-rbfs", "40", "--gamma", "1.0",
        "--ridge", "1e-3",
    ])
    assert "koopman_refit" in rec
    assert set(rec["koopman_refit"]) == {"raw", "filtered"}
    for d in rec["koopman_refit"].values():
        assert all(np.isfinite(v) for v in d.values())
    assert "UKF" in capsys.readouterr().out


def test_control_demo_mppi_task(tmp_path, capsys, monkeypatch):
    """MPPI task smoke run (small sample budget): runs end-to-end, writes
    the obstacle figure (keep-out disk overlay), reports distances.  The
    obstacle-avoidance CLAIM is pinned at full budget in
    tests/test_control.py::test_mppi_obstacle_indicator_cost."""
    from bluerov2_dynamics_tpu.apps import control_demo

    orig = control_demo.run_mppi
    monkeypatch.setattr(control_demo, "run_mppi",
                        lambda: orig(sim_steps=150, n_samples=96))
    out = control_demo.main(["mppi", "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "min obstacle distance" in text
    assert np.isfinite(out["mppi"]["min_dist"])
    assert out["mppi"]["U"].shape == (150, 8)
    assert (tmp_path / "media" / "control_demo_mppi_2D.png").exists()


def test_control_demo_ilqr_task(tmp_path, capsys, monkeypatch):
    """iLQR task smoke run (short horizon): plans, executes under the
    unseen current with and without the time-varying gains, writes the
    three-trajectory figure.  The disturbance-rejection CLAIM is pinned at
    full scale in tests/test_control.py::test_tvlqr_rejects_unseen_current."""
    from bluerov2_dynamics_tpu.apps import control_demo

    orig = control_demo.run_ilqr
    monkeypatch.setattr(control_demo, "run_ilqr",
                        lambda: orig(horizon=120, iters=6))
    out = control_demo.main(["ilqr", "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "open-loop replay misses" in text
    rec = out["ilqr"]
    assert rec["U"].shape == (120, 8)
    assert np.isfinite(rec["feedback_error"])
    assert rec["feedback_error"] < rec["open_loop_error"]
    assert (tmp_path / "media" / "control_demo_ilqr_2D.png").exists()


def test_control_demo_adaptive_task(tmp_path, capsys, monkeypatch):
    """Adaptive task smoke run (small seed + short loop): runs end-to-end,
    beats the frozen policy, writes the two-trajectory figure.  The
    recovery CLAIM is pinned at full scale in
    tests/test_control.py::test_adaptive_koopman_lqr_recovers_thruster_damage."""
    from bluerov2_dynamics_tpu.apps import control_demo

    orig = control_demo.run_adaptive
    monkeypatch.setattr(
        control_demo, "run_adaptive",
        lambda: orig(steps=600, segment=100, n_episodes=20, ep_len=60,
                     n_rbfs=40))
    out = control_demo.main(
        ["adaptive", "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "re-trimmed command" in text
    rec = out["adaptive"]
    assert rec["U"].shape == (600, 8)
    assert np.isfinite(rec["tail_rms"])
    assert rec["tail_rms"] < rec["frozen_tail_rms"]
    assert (tmp_path / "media" / "control_demo_adaptive_2D.png").exists()


def test_control_demo_lqg_task(tmp_path, capsys, monkeypatch):
    """LQG task smoke run (short loop): runs end-to-end in explicit f32,
    beats the naive raw-pose feedback, writes the three-trajectory
    figure.  Full-scale claims are pinned in
    tests/test_control.py::test_lqg_pose_only_regulates_lag_plant (f64)
    and test_control_demo_lqg_full_scale_f32 (f32)."""
    from bluerov2_dynamics_tpu.apps import control_demo

    orig = control_demo.run_lqg
    monkeypatch.setattr(control_demo, "run_lqg", lambda: orig(steps=200))
    out = control_demo.main(["lqg", "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "mean NIS" in text
    rec = out["lqg"]
    assert rec["U"].shape == (200, 8)
    assert rec["X"].dtype == np.float32
    assert rec["tail_rms"] < rec["naive_tail_rms"]
    assert (tmp_path / "media" / "control_demo_lqg_2D.png").exists()


def test_control_demo_los_task(tmp_path, capsys, monkeypatch):
    """LOS waypoint-mission task smoke run (short mission): runs
    end-to-end, reports hits, writes the waypoint-circle figure.  The
    full-mission CLAIM (all 4 waypoints + station keeping) is pinned in
    tests/test_guidance.py::test_full_plant_square_mission_f32."""
    from bluerov2_dynamics_tpu.apps import control_demo

    orig = control_demo.run_los
    monkeypatch.setattr(control_demo, "run_los",
                        lambda: orig(steps=700, cruise_speed=0.3))
    out = control_demo.main(["los", "--media-dir", str(tmp_path / "media")])
    text = capsys.readouterr().out
    assert "cross-track RMS" in text
    rec = out["los"]
    assert rec["U"].shape == (700, 8)
    assert rec["X"].dtype == np.float32
    # short mission: at least the first waypoint is reached
    assert rec["min_dist"][0] < 0.15
    assert (tmp_path / "media" / "control_demo_los_2D.png").exists()


def test_estimate_app_particle_filter(tmp_path, capsys):
    """--filter pf: the bootstrap PF beats the raw sensors on the pseudo
    recording and reports its ESS diagnostic; the figure gets a
    filter-suffixed name so blessed EKF media is never clobbered."""
    from bluerov2_dynamics_tpu.apps import estimate

    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "800",
        "--noise-scale", "25",    # the DVL/AHRS-noise regime the PF is for
        "--filter", "pf", "--pf-particles", "512", "--q", "1e-4",
        "--media-dir", str(tmp_path / "media"),
    ])
    rows = rec["rmse_vs_truth"]
    # measured: PF 0.0174 vs raw 0.0394 (2.3x) at ESS ~66
    assert rows["PF"]["all"] < 0.7 * rows["raw sensor"]["all"]
    assert 8.0 <= rec["ess_mean"] <= 512.0
    assert "mean ESS" in capsys.readouterr().out
    assert (tmp_path / "media" / "estimate_channels_pf.png").exists()


def test_estimate_app_mhe_huber_outliers(tmp_path, capsys):
    """--filter mhe --outlier-frac: impulsive 50-sigma glitches on 3% of
    samples; the Huber moving-horizon estimator shrugs them off (the
    EKF-vs-MHE comparison at full strength is pinned in
    tests/test_estimation.py)."""
    from bluerov2_dynamics_tpu.apps import estimate

    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "600",
        "--outlier-frac", "0.03", "--q", "1e-4",
        "--filter", "mhe", "--mhe-window", "15", "--mhe-iters", "15",
        "--no-media",
    ])
    rows = rec["rmse_vs_truth"]
    # measured 0.0037 vs raw 0.0133 (3.7x); q=1e-4 absorbs the
    # recording's +-10% coefficient mismatch (same lesson as the PF)
    assert rows["MHE"]["all"] < 0.45 * rows["raw sensor"]["all"]
    assert rec["meas_loss"] == "huber"
    assert "Injected impulsive outliers" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="crash limit"):
        estimate.main(["--synthetic", "--steps", "9000", "--filter", "mhe"])
    with pytest.raises(SystemExit, match="synthetic"):
        estimate.main(["--csv", "/nonexistent.csv",
                       "--outlier-frac", "0.1"])


def test_estimate_app_validation_errors(tmp_path):
    from bluerov2_dynamics_tpu.apps import estimate

    with pytest.raises(SystemExit, match="ekf"):
        estimate.main(["--synthetic", "--steps", "300", "--filter", "ukf",
                       "--smooth"])


def test_estimate_app_koopman_filter(tmp_path, capsys):
    """Data-driven filtering: the exact linear KF on the lifted EDMDc
    system (no physics anywhere) beats the raw sensors on position."""
    from bluerov2_dynamics_tpu.apps import estimate

    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "1500",
        "--filter", "koopman", "--koopman-position-invariant",
        "--n-rbfs", "100", "--gamma", "1.0", "--ridge", "1e-3",
        "--no-media",
    ])
    rows = rec["rmse_vs_truth"]
    assert rows["KOOPMAN"]["position"] < rows["raw sensor"]["position"]
    assert "EDMDc model fitted" in capsys.readouterr().out


def test_estimate_app_pose_only_recovers_velocities(tmp_path):
    """--measure pose: the filter never observes velocities (the real
    mocap pipeline's primary measurement is pose; velocities are twist /
    finite differences) — yet the smoothed velocity estimates beat the
    recorded noisy velocity channels."""
    from bluerov2_dynamics_tpu.apps import estimate

    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "3000",
        "--measure", "pose", "--smooth", "--fossen-fit",
        "--fossen-fit-steps", "150",
        "--fit-noise", "--fit-noise-window", "1000",
        "--fit-noise-steps", "120", "--no-media",
    ])
    rows = rec["rmse_vs_truth"]
    for g in ("position", "attitude", "lin. velocity", "ang. velocity"):
        assert rows["RTS smoothed"][g] < rows["raw sensor"][g], g
    assert 2.0 < rec["nis_mean"] < 18.0   # chi^2_6 expectation = 6
    with pytest.raises(SystemExit, match="measure all"):
        estimate.main(["--synthetic", "--steps", "300",
                       "--filter", "koopman", "--measure", "pose"])


def test_estimate_app_quat_contract(tmp_path, capsys):
    """--contract quat: the multiplicative EKF on the T4 family
    (quat13 states + exact lag-derived wrench inputs); tangent-space
    accuracy beats the raw sensors and the filtered CSV round-trips
    through load_quat_dataset."""
    from bluerov2_dynamics_tpu.apps import estimate
    from bluerov2_dynamics_tpu.data import csv_loader

    out_csv = tmp_path / "filtered_q.csv"
    rec = estimate.main([
        "--synthetic", "--recording", "--steps", "2000",
        "--contract", "quat", "--smooth",
        "--fossen-fit", "--fossen-fit-steps", "100",
        "--no-media", "--out-csv", str(out_csv),
    ])
    rows = rec["rmse_vs_truth"]
    for g in ("position", "attitude", "lin. velocity", "ang. velocity"):
        assert rows["MEKF"][g] < rows["raw sensor"][g], g
        assert rows["RTS smoothed"][g] < rows["MEKF"][g], g
    assert 2.0 < rec["nis_mean"] < 40.0
    assert "MEKF (quat13)" in capsys.readouterr().out
    ds = csv_loader.load_quat_dataset(out_csv)
    assert ds.X.shape == (2000, 13) and ds.U.shape == (2000, 6)
    norms = np.linalg.norm(ds.X[:, 3:7], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # unsupported combos fail fast, before any compute
    with pytest.raises(SystemExit, match="not supported"):
        estimate.main(["--synthetic", "--steps", "300",
                       "--contract", "quat", "--fit-noise"])


def test_tank_koopman_streaming_fit(tmp_path, capsys):
    """--streaming-chunk at forgetting=1 reproduces the batch-fit metric
    table; a forgetting factor < 1 still produces a finite model; the
    flag conflicts are rejected before any fitting."""
    import re

    import pytest

    from bluerov2_dynamics_tpu.apps import tank_koopman

    def koopman_row(text):
        row = next(ln for ln in text.splitlines()
                   if ln.strip().startswith("Koopman") and "|" in ln)
        return [float(v) for v in re.findall(r"\d+\.\d+", row)]

    tank_koopman.main(_args(tmp_path))
    base = koopman_row(capsys.readouterr().out)
    tank_koopman.main(_args(tmp_path, ["--streaming-chunk", "128"]))
    out = capsys.readouterr().out
    assert "Streaming fit" in out
    # f32 chunked Gram accumulation reassociates the normal equations; the
    # ill-conditioned RBF solve amplifies that to ~1% in the H-metrics
    # (the f64 library test pins the exact identity at 1e-7)
    np.testing.assert_allclose(koopman_row(out), base, rtol=3e-2)

    tank_koopman.main(_args(tmp_path, ["--streaming-chunk", "128",
                                       "--forgetting", "0.995"]))
    rls = koopman_row(capsys.readouterr().out)
    assert np.all(np.isfinite(rls))

    with pytest.raises(SystemExit):
        tank_koopman.main(_args(tmp_path, ["--streaming-chunk", "128",
                                           "--sweep"]))
    with pytest.raises(SystemExit):
        tank_koopman.main(_args(tmp_path, ["--streaming-chunk", "128",
                                           "--forgetting", "1.5"]))
    with pytest.raises(SystemExit):  # forgetting without the streaming fit
        tank_koopman.main(_args(tmp_path, ["--forgetting", "0.99"]))
    with pytest.raises(SystemExit):  # chunk 0 must not silently batch-fit
        tank_koopman.main(_args(tmp_path, ["--streaming-chunk", "0"]))
