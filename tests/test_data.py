"""Data-pipeline tests: loaders, wrench augmentation, synthetic, sanity, T200."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from bluerov2_dynamics_tpu.data import csv_loader, sanity, synthetic, t200, wrench


def _write_thruster_csv(path, N=50, rng=None, shuffle=False, with_nan=False):
    rng = rng or np.random.default_rng(0)
    t = np.arange(N) * 0.02
    cols = {"t": t}
    for c in csv_loader.EULER12_COLS:
        cols[c] = rng.normal(size=N)
    for c in csv_loader.THRUSTER_COLS:
        cols[c] = np.clip(rng.normal(size=N), -1, 1)
    df = pd.DataFrame(cols)
    if with_nan:
        df.loc[3, "x"] = np.inf
        df.loc[7, "u"] = np.nan
    if shuffle:
        df = df.sample(frac=1.0, random_state=0)
    df.to_csv(path, index=False)
    return df


def test_thruster_loader_contract(tmp_path, rng):
    path = tmp_path / "koopman_dataset_50Hz.csv"
    _write_thruster_csv(path, rng=rng, shuffle=True, with_nan=True)
    ds = csv_loader.load_thruster_dataset(path, verbose=False)
    assert ds.X.shape[1] == 12 and ds.U.shape[1] == 8
    assert ds.X.shape[0] == 48  # two bad rows dropped
    assert np.all(np.isfinite(ds.X))
    assert np.all(np.diff(ds.t) > 0)  # sorted, deduped
    np.testing.assert_allclose(ds.dt, 0.02, atol=1e-9)


def test_loader_missing_inputs_zero_filled(tmp_path, rng):
    path = tmp_path / "nostate.csv"
    N = 20
    cols = {"t": np.arange(N) * 0.05}
    for c in csv_loader.EULER12_COLS:
        cols[c] = rng.normal(size=N)
    pd.DataFrame(cols).to_csv(path, index=False)
    ds = csv_loader.load_wrench_dataset(path, verbose=False)
    np.testing.assert_allclose(ds.U, 0.0)
    # quat loader on a CSV with neither quaternion nor Euler columns
    path2 = tmp_path / "noquat.csv"
    cols2 = {k: v for k, v in cols.items() if k not in ("phi", "theta", "psi")}
    pd.DataFrame(cols2).to_csv(path2, index=False)
    with pytest.raises(ValueError, match="Missing state column"):
        csv_loader.load_quat_dataset(path2, verbose=False)


def test_quat_loader_auto_converts_euler(tmp_path, rng):
    path = tmp_path / "legacy.csv"
    N = 30
    cols = {"t": np.arange(N) * 0.02}
    for c in csv_loader.EULER12_COLS:
        cols[c] = rng.normal(size=N) * 0.4
    for c in csv_loader.WRENCH_COLS:
        cols[c] = rng.normal(size=N)
    pd.DataFrame(cols).to_csv(path, index=False)
    ds = csv_loader.load_quat_dataset(path, verbose=False)
    assert ds.X.shape == (N, 13)
    norms = np.linalg.norm(ds.X[:, 3:7], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    # quaternion must match the ops euler_to_quat conversion
    from bluerov2_dynamics_tpu.ops import euler_to_quat

    df = pd.read_csv(path)
    q = np.asarray(
        euler_to_quat(
            jnp.asarray(df["phi"]), jnp.asarray(df["theta"]), jnp.asarray(df["psi"])
        )
    )
    np.testing.assert_allclose(ds.X[:, 3:7], q, atol=1e-12)


def test_find_latest_and_root(tmp_path):
    (tmp_path / "rosbags" / "sub").mkdir(parents=True)
    older = tmp_path / "rosbags" / "data.csv"
    newer = tmp_path / "rosbags" / "sub" / "data.csv"
    older.write_text("t\n0\n")
    newer.write_text("t\n0\n")
    import os, time

    t_now = time.time()
    os.utime(older, (t_now - 100, t_now - 100))
    os.utime(newer, (t_now, t_now))
    assert csv_loader.find_latest_csv(tmp_path, "data.csv") == newer
    assert csv_loader.find_project_root(tmp_path / "rosbags" / "sub") == tmp_path


def test_train_test_split():
    ds = csv_loader.Dataset(
        X=np.arange(100)[:, None].astype(float),
        U=np.zeros((100, 1)),
        t=np.arange(100.0),
        dt=1.0,
    )
    tr, te = csv_loader.train_test_split(ds, 0.8)
    assert len(tr.X) == 80 and te.X[0, 0] == 80
    tr, te = csv_loader.train_test_split(ds, 0.8, causal_overlap=True)
    assert te.X[0, 0] == 79  # reference's split-1 convention


def test_wrench_effectiveness_matrix(rng):
    E = wrench.effectiveness_matrix()
    assert E.shape == (6, 8)
    # axes normalized: columns' force block has unit norm
    np.testing.assert_allclose(np.linalg.norm(E[0:3], axis=0), 1.0)
    # vertical thrusters produce no x/y force
    np.testing.assert_allclose(E[0:2, 4:], 0.0)
    # oracle: manual per-rotor loop
    U = rng.normal(size=(10, 8))
    W = wrench.thrusters_to_wrench(U)
    for k in range(10):
        tau = np.zeros(6)
        for i, (axis, pos) in enumerate(wrench.ROTOR_TABLE):
            a = np.asarray(axis, float)
            a = a / np.linalg.norm(a)
            tau[:3] += U[k, i] * a
            tau[3:] += U[k, i] * np.cross(np.asarray(pos, float), a)
        np.testing.assert_allclose(W[k], tau, atol=1e-12)


def test_wrench_augment_csv_roundtrip(tmp_path, rng):
    path = tmp_path / "ds.csv"
    _write_thruster_csv(path, rng=rng)
    out = wrench.augment_csv(path)
    df = pd.read_csv(out)
    for c in ["Fx", "Fy", "Fz", "Mx", "My", "Mz"]:
        assert c in df.columns
    assert "u1" not in df.columns
    # setpoint-compatible naming mode
    out2 = wrench.augment_csv(path, tmp_path / "sp.csv", setpoint_names=True)
    df2 = pd.read_csv(out2)
    assert "Fx_sp" in df2.columns and "Tz_sp" in df2.columns
    np.testing.assert_allclose(df["Fx"], df2["Fx_sp"])


def test_synthetic_dataset(rng):
    ds = synthetic.generate_sim_dataset(jax.random.PRNGKey(0), n_steps=500, dt=0.05)
    assert ds.X.shape == (500, 12) and ds.U.shape == (500, 8)
    assert np.all(np.isfinite(np.asarray(ds.X)))
    assert np.max(np.abs(np.asarray(ds.U))) <= 1.0
    # noise is small but nonzero
    d = np.asarray(ds.X) - np.asarray(ds.X_true)
    assert 0 < np.abs(d).max() < 0.05
    # AR(1) inputs are smooth: successive diffs bounded by the noise scale
    du = np.diff(np.asarray(ds.U), axis=0)
    assert np.abs(du).max() < 0.2


def test_tank_recording_dataset(rng):
    """The pseudo tank recording: generator must differ from the nominal
    model, psi must wind beyond +-pi, attitude/depth must stay bounded."""
    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.eval import metrics
    from bluerov2_dynamics_tpu.models import fossen
    from bluerov2_dynamics_tpu.models.params import (
        fossen_params, lag_params, thruster_config,
    )

    n = 20_000
    ds = synthetic.generate_tank_recording(jax.random.PRNGKey(0), n_steps=n,
                                           dt=0.02)
    X = np.asarray(ds.X)
    assert X.shape == (n, 12) and np.all(np.isfinite(X))
    assert np.max(np.abs(np.asarray(ds.U))) <= 1.0
    # psi winds far beyond +-pi (the real recording reached 1217 deg)
    assert np.degrees(X[:, 5].max() - X[:, 5].min()) > 720.0
    # piloted flight: bounded attitude and depth
    assert np.degrees(np.abs(X[:, 3:5]).max()) < 30.0
    assert np.abs(X[:, 2]).max() < 5.0
    # the generator is NOT the nominal model: coefficients are perturbed
    # (within the jitter bound), and the stepped dynamics differ on
    # identical (state, lag, input)
    k_p = jax.random.split(jax.random.PRNGKey(0), 4)[0]  # generator's split
    pp = synthetic.perturbed_fossen_params(k_p, jitter=0.10)
    p = fossen_params()
    rel = np.abs(np.asarray(pp.added) / np.asarray(p.added) - 1.0)
    assert rel.max() > 0.01 and rel.max() <= 0.10 + 1e-6
    cfg, lag = thruster_config(), lag_params(0.02)
    step_nom = fossen.make_thruster_step(p, cfg, lag, 0.02, method="euler")
    step_gen = fossen.make_thruster_step(pp, cfg, lag, 0.02, method="euler")
    x = jnp.asarray(ds.X_true[1000], jnp.float32)
    lag0 = jnp.zeros((8, 3), jnp.float32)
    u = jnp.asarray(ds.U[1000], jnp.float32)
    xn, _ = step_nom((x, lag0), u)
    xg, _ = step_gen((x, lag0), u)
    assert float(metrics.rmse(xn, xg)) > 1e-6


def test_noise_scale_preserves_truth_and_scales_noise(rng):
    """noise_scale multiplies the sensor-noise DRAW only: X_true/U stay
    bit-identical to the blessed default datasets and the noise scales
    exactly linearly (same PRNG stream, scaled sigmas)."""
    import jax

    k = jax.random.PRNGKey(5)
    a = synthetic.generate_tank_recording(k, n_steps=500, dt=0.02)
    b = synthetic.generate_tank_recording(k, n_steps=500, dt=0.02,
                                          noise_scale=25.0)
    np.testing.assert_array_equal(np.asarray(a.X_true), np.asarray(b.X_true))
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    na = np.asarray(a.X) - np.asarray(a.X_true)
    nb = np.asarray(b.X) - np.asarray(b.X_true)
    # recovered noise = difference of f32 sums: tolerance is the f32
    # quantization of X_true (psi winds to tens of rads), not exactness
    np.testing.assert_allclose(nb, 25.0 * na, rtol=0.05, atol=1e-5)

    s1 = synthetic.generate_sim_dataset(k, n_steps=300, dt=0.05)
    s2 = synthetic.generate_sim_dataset(k, n_steps=300, dt=0.05,
                                        noise_scale=10.0)
    np.testing.assert_array_equal(np.asarray(s1.X_true),
                                  np.asarray(s2.X_true))
    np.testing.assert_allclose(
        np.asarray(s2.X) - np.asarray(s2.X_true),
        10.0 * (np.asarray(s1.X) - np.asarray(s1.X_true)),
        rtol=0.05, atol=1e-5)


def test_tank_recording_structural_mismatch_options(rng):
    """Opt-in generator systematics: per-thruster gain asymmetry and an
    ambient current change the data (vs the default generator) while
    keeping it bounded; defaults are unchanged (blessed-record stability)."""
    import jax.numpy as jnp

    base = synthetic.generate_tank_recording(jax.random.PRNGKey(3),
                                             n_steps=3000, dt=0.02)
    syst = synthetic.generate_tank_recording(
        jax.random.PRNGKey(3), n_steps=3000, dt=0.02,
        thruster_gain_jitter=0.10, current=(0.04, -0.03, 0.0),
    )
    Xb, Xs = np.asarray(base.X), np.asarray(syst.X)
    assert np.all(np.isfinite(Xs))
    assert np.abs(Xs[:, 3:5]).max() < 0.6          # still stabilized
    assert np.abs(Xs - Xb).max() > 0.01            # systematics present
    # same key, default options -> bit-identical to base (no default drift)
    again = synthetic.generate_tank_recording(jax.random.PRNGKey(3),
                                              n_steps=3000, dt=0.02)
    np.testing.assert_array_equal(np.asarray(again.X), Xb)


def test_sanity_checks_on_consistent_data(rng):
    """Synthetic physics data must pass the kinematic-consistency check."""
    ds = synthetic.generate_sim_dataset(
        jax.random.PRNGKey(1), n_steps=2000, dt=0.02,
        pos_noise=0.0, ang_noise=0.0, vel_noise=0.0, angvel_noise=0.0,
    )
    loader_ds = csv_loader.Dataset(
        X=np.asarray(ds.X), U=np.asarray(ds.U),
        t=np.arange(2000) * 0.02, dt=0.02,
    )
    res = sanity.run_all(loader_ds, verbose=False)
    assert res["kinematic"]["corr"] > 0.99
    assert res["kinematic"]["rmse"] < 0.05
    assert res["actuator_corrs"].shape == (8,)


def test_t200_fit_recovers_polynomial(rng):
    """Data generated from a known piecewise polynomial is recovered."""
    # a0 = 0 keeps the piecewise curve continuous at u = 0 (a shared point
    # of both fit domains)
    true_pos = np.array([0.0, 30.0, 5.0, -2.0, 0.5, 1.0])
    true_neg = np.array([0.0, 25.0, 3.0, -1.0, 0.2, 0.4])
    pwm = np.linspace(1100, 1900, 161)
    u = t200.pwm_to_u(pwm)
    thrust_N = np.where(
        u >= 0,
        t200.eval_poly_asc(true_pos, u),
        -t200.eval_poly_asc(true_neg, -u),
    )
    fit = t200.fit_forward_reverse(pwm, thrust_N / t200.G0)
    np.testing.assert_allclose(fit.pos_coeff, true_pos, atol=1e-6)
    np.testing.assert_allclose(fit.neg_coeff, true_neg, atol=1e-6)
    # piecewise evaluation matches
    np.testing.assert_allclose(t200.eval_piecewise(fit, u), thrust_N, atol=1e-6)


def _write_min_xlsx(path):
    """Hand-build a minimal .xlsx exercising shared strings, inline
    strings, skipped cells, booleans, and non-numeric coercion."""
    import zipfile

    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Data 1" sheetId="1" r:id="rId1"/>'
        '<sheet name="16 V" sheetId="2" r:id="rId2"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="x/worksheet" Target="worksheets/sheet2.xml"/>'
        '</Relationships>'
    )
    sst = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<si><t xml:space="preserve"> PWM (µs)</t></si>'
        '<si><r><t>Force </t></r><r><t>(Kg f)</t></r></si>'
        '<si><t>n/a</t></si></sst>'
    )
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet1 = f'<?xml version="1.0"?><worksheet {ns}><sheetData/></worksheet>'
    sheet2 = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>Flag</t></is></c></row>'
        # full numeric row (with a formula cell: <f> then cached <v>)
        '<row r="2"><c r="A2"><v>1100</v></c>'
        '<c r="B2"><f>A2*2</f><v>-4.25</v></c><c r="C2" t="b"><v>1</v></c></row>'
        # fully-empty row: must be dropped
        '<row r="3"><c r="A3"/><c r="B3"/></row>'
        # sparse row: B missing entirely, A non-numeric shared string
        '<row r="4"><c r="A4" t="s"><v>2</v></c><c r="C4" t="b"><v>0</v></c></row>'
        '<row r="5"><c r="A5"><v>1900</v></c><c r="B5"><v>5.5</v></c></row>'
        '</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_xlsx_reader_minimal_workbook(tmp_path):
    from bluerov2_dynamics_tpu.data import xlsx

    path = tmp_path / "mini.xlsx"
    _write_min_xlsx(path)

    assert xlsx.sheet_names(path) == ["Data 1", "16 V"]
    header, rows = xlsx.read_sheet(path, "16 V")
    assert header == [" PWM (µs)", "Force (Kg f)", "Flag"]
    assert len(rows) == 3  # empty row dropped
    assert rows[0] == [1100.0, -4.25, True]
    assert rows[1] == ["n/a", None, False]
    assert rows[2] == [1900.0, 5.5, None]

    pwm = xlsx.numeric_column(header, rows, " PWM (µs)")
    np.testing.assert_allclose(pwm, [1100.0, np.nan, 1900.0], equal_nan=True)
    force = xlsx.numeric_column(header, rows, "Force (Kg f)")
    np.testing.assert_allclose(force, [-4.25, np.nan, 5.5], equal_nan=True)

    hdr_empty, rows_empty = xlsx.read_sheet(path, "Data 1")
    assert hdr_empty == [] and rows_empty == []
    with pytest.raises(KeyError):
        xlsx.read_sheet(path, "nope")


def test_xlsx_reader_positional_cells_without_refs(tmp_path):
    """Cells missing the optional 'r' attribute are positionally
    sequential (the spec allows omitting refs), not collapsed to column A."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    wb = (
        '<?xml version="1.0"?>'
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x/worksheet" Target="worksheets/sheet1.xml"/>'
        '</Relationships>'
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        # header: no refs at all
        '<row><c t="inlineStr"><is><t>a</t></is></c>'
        '<c t="inlineStr"><is><t>b</t></is></c>'
        '<c t="inlineStr"><is><t>c</t></is></c></row>'
        # mixed: explicit ref jumps to C, next ref-less cell follows at D…
        '<row><c><v>1</v></c><c r="C2"><v>3</v></c></row>'
        '<row><c><v>10</v></c><c><v>20</v></c><c><v>30</v></c></row>'
        '</sheetData></worksheet>'
    )
    path = tmp_path / "norefs.xlsx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    from bluerov2_dynamics_tpu.data import xlsx

    header, rows = xlsx.read_sheet(path, "S")
    assert header == ["a", "b", "c"]
    assert rows[0] == [1.0, None, 3.0]
    assert rows[1] == [10.0, 20.0, 30.0]
