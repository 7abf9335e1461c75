"""Direct behavioral parity against the reference implementation.

These tests import the reference code (read-only, ``/root/reference``) and
compare our TPU-native implementations against it on identical inputs:
same states, same inputs, same hyperparameters.  Where the reference has
stateful semantics (thruster lag) we match its explicit-Euler behavior
(one RHS call per step) exactly.

Skipped automatically if the reference checkout is unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
if REF.exists():
    sys.path.insert(0, str(REF))

from bluerov2_dynamics_tpu.models import di, fossen, koopman, tether
from bluerov2_dynamics_tpu.models.params import (
    fossen_params,
    lag_params,
    reduced_params,
    thruster_config,
)
from bluerov2_dynamics_tpu.models.thrusters import init_lag_state
from bluerov2_dynamics_tpu.ops.integrators import rollout

P64 = fossen_params(dtype=jnp.float64)
CFG64 = thruster_config(dtype=jnp.float64)


def _rand_state12(rng, scale=0.5):
    x = rng.normal(size=12) * scale
    x[3:5] *= 0.5
    return x


# ------------------- full thruster-input model (fossen/BlueROV2.py) -------------------

def test_thruster_dynamics_single_call_parity(rng):
    """One dynamics() evaluation with fresh lag state matches exactly."""
    from fossen.BlueROV2 import BlueROV2

    dt = 0.02
    lag = lag_params(dt, dtype=jnp.float64)
    for _ in range(5):
        x = _rand_state12(rng)
        u = np.clip(rng.normal(size=8), -1, 1)
        ref = BlueROV2(dt=dt)
        want = ref.dynamics(x.copy(), u, dt)
        _, got = fossen.thruster_dynamics(
            P64, CFG64, lag, init_lag_state(dtype=jnp.float64),
            jnp.asarray(x), jnp.asarray(u),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-10)


def test_thruster_euler_trajectory_parity(rng):
    """200-step explicit-Euler rollout with lag matches the reference loop
    (identical per-step lag advancement under Euler)."""
    from fossen.BlueROV2 import BlueROV2

    dt = 0.02
    T = 200
    lag = lag_params(dt, dtype=jnp.float64)
    x0 = _rand_state12(rng, scale=0.2)
    U = np.clip(rng.normal(size=(T, 8)) * 0.4, -1, 1)

    ref = BlueROV2(dt=dt)
    x = x0.copy()
    ref_traj = [x.copy()]
    for k in range(T):
        x = x + dt * ref.dynamics(x, U[k], dt)
        ref_traj.append(x.copy())
    ref_traj = np.asarray(ref_traj)

    got = np.asarray(
        fossen.simulate_thruster(
            P64, CFG64, lag, jnp.asarray(x0), jnp.asarray(U), dt, method="euler"
        )
    )
    np.testing.assert_allclose(got, ref_traj, rtol=1e-7, atol=1e-8)


def test_current_handling_parity(rng):
    from fossen.BlueROV2 import BlueROV2

    dt = 0.02
    current = np.array([0.25, -0.15, 0.05])
    p = fossen_params(current=tuple(current), dtype=jnp.float64)
    lag = lag_params(dt, dtype=jnp.float64)
    x = _rand_state12(rng)
    u = np.clip(rng.normal(size=8), -1, 1)
    ref = BlueROV2(dt=dt, current_speed=current)
    want = ref.dynamics(x.copy(), u, dt)
    _, got = fossen.thruster_dynamics(
        p, CFG64, lag, init_lag_state(dtype=jnp.float64),
        jnp.asarray(x), jnp.asarray(u),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-10)


# ------------------- wrench-input models -------------------

def test_wrench_euler_rhs_parity(rng):
    from fossen.BlueROV2_thrust import BlueROV2 as RefWrenchEuler

    ref = RefWrenchEuler()
    for _ in range(5):
        x = _rand_state12(rng)
        tau = rng.normal(size=6) * 10
        want = ref.dynamics(x.copy(), tau, 0.02)
        got = fossen.wrench_rhs_euler(P64, jnp.asarray(x), jnp.asarray(tau))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-11)


def test_wrench_quat_rhs_parity(rng):
    from fossen.BlueROV2_wrench import BlueROV2 as RefWrenchQuat

    ref = RefWrenchQuat()
    for _ in range(5):
        x = rng.normal(size=13)
        x[3:7] /= np.linalg.norm(x[3:7])
        tau = rng.normal(size=6) * 5
        want = ref.dynamics(x.copy(), tau)
        got = fossen.wrench_rhs_quat(P64, jnp.asarray(x), jnp.asarray(tau))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-11)


def test_quat_utils_parity(rng):
    import fossen.BlueROV2_wrench as refq

    from bluerov2_dynamics_tpu import ops

    q1 = rng.normal(size=4)
    q2 = rng.normal(size=4)
    np.testing.assert_allclose(
        np.asarray(ops.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))),
        refq.quat_multiply(q1, q2), atol=1e-12,
    )
    om = rng.normal(size=3)
    qn = q1 / np.linalg.norm(q1)
    np.testing.assert_allclose(
        np.asarray(ops.quat_derivative(jnp.asarray(qn), jnp.asarray(om))),
        refq.quat_derivative(qn, om), atol=1e-12,
    )
    angles = rng.uniform(-1.2, 1.2, size=3)
    np.testing.assert_allclose(
        np.asarray(ops.euler_to_quat(*[jnp.asarray(a) for a in angles])),
        refq.euler_to_quat(*angles), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ops.quat_to_rotation_matrix(jnp.asarray(qn))),
        refq.quat_to_rotation_matrix(qn), atol=1e-12,
    )


# ------------------- tether -------------------

def test_tether_dynamics_parity(rng):
    from fossen.BlueROV2 import Tether as RefTether

    ref = RefTether(n_segments=5, length=12.0)
    cfg = tether.TetherConfig(n_segments=5, length=12.0)
    anchor = np.zeros(3)
    rov_pos = np.array([4.0, 2.0, 6.0])
    rov_vel = rng.normal(size=3) * 0.3
    current = np.array([0.1, -0.2, 0.0])
    x_teth = ref.init_nodes_line(anchor, rov_pos)
    x_teth = x_teth + rng.normal(size=x_teth.shape) * 0.4
    want_dx, want_F = ref.dynamics(x_teth, anchor, rov_pos, rov_vel, current)
    got_dx, got_F = tether.tether_dynamics(
        cfg, jnp.asarray(x_teth), jnp.asarray(anchor), jnp.asarray(rov_pos),
        jnp.asarray(rov_vel), jnp.asarray(current),
    )
    np.testing.assert_allclose(np.asarray(got_dx), want_dx, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_F), want_F, rtol=1e-9, atol=1e-9)


def test_tether_init_parity():
    from fossen.BlueROV2 import Tether as RefTether

    ref = RefTether(n_segments=6, length=18.0)
    cfg = tether.TetherConfig(n_segments=6, length=18.0)
    anchor = np.array([1.0, 2.0, 0.0])
    rov = np.array([5.0, -1.0, 7.0])
    np.testing.assert_allclose(
        np.asarray(tether.init_nodes_line(cfg, anchor, rov, dtype=jnp.float64)),
        ref.init_nodes_line(anchor, rov), atol=1e-12,
    )


# ------------------- reduced torch model -------------------

def test_reduced_rhs_parity_vs_torch(rng):
    import torch
    from fossen.bluerov_torch import bluerov_compute

    rp = reduced_params(dtype=jnp.float64)
    X9 = rng.normal(size=(16, 9))
    X9[:, 3:5] /= np.linalg.norm(X9[:, 3:5], axis=1, keepdims=True)
    U4 = rng.normal(size=(16, 4)) * 8
    want = bluerov_compute(
        0.0, torch.from_numpy(X9).double(), torch.from_numpy(U4).double()
    ).numpy()
    got = np.asarray(fossen.reduced_rhs(rp, jnp.asarray(X9), jnp.asarray(U4)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)


# ------------------- Koopman EDMDc -------------------

def _small_sim(rng, N=800, dt=0.05):
    """Small trajectory of the reference physics model as common data."""
    lag = lag_params(dt, dtype=jnp.float64)
    U = np.clip(rng.normal(size=(N, 8)) * 0.3, -1, 1)
    x0 = jnp.zeros(12, dtype=jnp.float64)
    X = np.array(
        fossen.simulate_thruster(P64, CFG64, lag, x0, jnp.asarray(U), dt)
    )[:-1]
    X = X + rng.normal(size=X.shape) * 1e-3
    return X, U


def test_koopman_evaluator_parity_on_reference_fit(rng):
    """Load the REFERENCE-fitted (A, B, centers) into our model: evaluate()
    and multistep_rmse() must agree to float precision — proves identical
    evaluator semantics independent of the k-means difference."""
    from Koopman.koopmanEDMDc import KoopmanEDMDc

    X, U = _small_sim(rng)
    split = int(0.8 * len(X))
    refm = KoopmanEDMDc(state_dim=12, input_dim=8, n_rbfs=40, gamma=1.0, ridge=1e-6)
    refm.fit(X[:split], U[:split])

    ours = koopman.KoopmanModel(
        centers=jnp.asarray(refm.centers_),
        gamma=jnp.asarray(1.0, jnp.float64),
        A=jnp.asarray(refm.A_),
        B=jnp.asarray(refm.B_),
    )
    X_te = jnp.asarray(X[split:])
    U_te = jnp.asarray(U[split:])
    np.testing.assert_allclose(
        float(koopman.evaluate(ours, X_te, U_te)),
        refm.evaluate(X[split:], U[split:]),
        rtol=1e-8,
    )
    for H in (1, 10, 50):
        np.testing.assert_allclose(
            float(koopman.multistep_rmse(ours, X_te, U_te, H)),
            refm.multistep_rmse(X[split:], U[split:], H=H),
            rtol=1e-7,
        )


def test_koopman_simulate_parity_on_reference_fit(rng):
    from Koopman.koopmanEDMDc import KoopmanEDMDc

    X, U = _small_sim(rng, N=400)
    refm = KoopmanEDMDc(state_dim=12, input_dim=8, n_rbfs=25, gamma=1.0, ridge=1e-6)
    refm.fit(X, U)
    ours = koopman.KoopmanModel(
        centers=jnp.asarray(refm.centers_),
        gamma=jnp.asarray(1.0, jnp.float64),
        A=jnp.asarray(refm.A_),
        B=jnp.asarray(refm.B_),
    )
    pred_ref = refm.simulate(X[0], U[:50])
    pred_ours = np.asarray(koopman.simulate(ours, jnp.asarray(X[0]), jnp.asarray(U[:50])))
    np.testing.assert_allclose(pred_ours, pred_ref, rtol=1e-6, atol=1e-8)


def test_koopman_fit_quality_parity(rng):
    """Our on-device k-means differs from sklearn's, so compare fit QUALITY:
    one-step RMSE of both fits on held-out data must be the same scale."""
    from Koopman.koopmanEDMDc import KoopmanEDMDc

    X, U = _small_sim(rng)
    split = int(0.8 * len(X))
    refm = KoopmanEDMDc(state_dim=12, input_dim=8, n_rbfs=40, gamma=1.0, ridge=1e-6)
    refm.fit(X[:split], U[:split])
    rmse_ref = refm.evaluate(X[split:], U[split:])

    ours = koopman.fit(
        jax.random.PRNGKey(0), jnp.asarray(X[:split]), jnp.asarray(U[:split]),
        n_rbfs=40, gamma=1.0, ridge=1e-6,
    )
    rmse_ours = float(koopman.evaluate(ours, jnp.asarray(X[split:]), jnp.asarray(U[split:])))
    assert rmse_ours < 2.0 * rmse_ref, (rmse_ours, rmse_ref)


# ------------------- Double Integrator -------------------

def test_di_gains_and_rollout_parity(rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_full", REF / "training" / "train_tank_brov2_full_comparison.py"
    )
    ref_full = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref_full)
    except Exception as e:
        pytest.skip(f"reference training module not importable: {e}")

    X, U = _small_sim(rng, N=500)
    dt = 0.05
    K_lin, K_ang = ref_full.estimate_di_gains(X, U, dt, ridge=1e-3)
    gains = di.estimate_gains(jnp.asarray(X), jnp.asarray(U), dt, ridge=1e-3)
    np.testing.assert_allclose(np.asarray(gains.K_lin), K_lin, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gains.K_ang), K_ang, rtol=1e-6, atol=1e-9)

    traj_ref = ref_full.simulate_double_integrator(X[0], U[:80], dt, K_lin, K_ang)
    traj_ours = np.asarray(
        di.simulate(gains, jnp.asarray(X[0]), jnp.asarray(U[:80]), dt, variant="euler12")
    )
    np.testing.assert_allclose(traj_ours, traj_ref, rtol=1e-6, atol=1e-8)

    want = ref_full.multistep_rmse_endpoint_di(X, U, 10, dt, K_lin, K_ang)
    from bluerov2_dynamics_tpu.eval import metrics

    got = float(
        metrics.endpoint_rmse(
            di.make_step_euler12(gains, dt), jnp.asarray(X), jnp.asarray(U), 10
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ------------------- thruster lag -------------------

def test_lag_filter_parity(rng):
    from fossen.BlueROV2 import ThrusterLag

    from bluerov2_dynamics_tpu.models.thrusters import lag_step

    dt = 0.02
    lag = lag_params(dt, dtype=jnp.float64)
    ref = ThrusterLag()
    state = jnp.zeros((1, 3), jnp.float64)
    for _ in range(100):
        u = float(rng.normal())
        want = ref.step(u, dt)
        state, got = lag_step(lag, state, jnp.asarray([u], jnp.float64))
        np.testing.assert_allclose(float(got[0]), want, rtol=1e-10, atol=1e-12)


# ------------------- T200 polynomial fit -------------------

def test_t200_fit_parity(rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_t200", REF / "rosbags" / "T200" / "T200_fit_polynomial.py"
    )
    ref_t200 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_t200)

    from bluerov2_dynamics_tpu.data import t200

    pwm = np.linspace(1100, 1900, 201)
    u = t200.pwm_to_u(pwm)
    thrust_kgf = np.where(u >= 0, 3.0 * u**2 + 0.5 * u, -(2.5 * u**2 - 0.4 * u))
    want = ref_t200.fit_forward_reverse(pwm, thrust_kgf)
    got = t200.fit_forward_reverse(pwm, thrust_kgf)
    np.testing.assert_allclose(got.pos_coeff, want.pos_coeff, atol=1e-8)
    np.testing.assert_allclose(got.neg_coeff, want.neg_coeff, atol=1e-8)


T200_XLSX = REF / "rosbags" / "T200" / (
    "T200-Public-Performance-Data-10-20V-September-2019.xlsx")

# The reference's own fitted coefficients on the REAL workbook, as logged
# in training/best_results.txt:1025-1053 ([a0..a5], Newtons, plugin format).
T200_LOGGED = {
    16: ([1.56126574e-02, -9.35153055e+00, 2.08830810e+02, -4.15509637e+02,
          4.44776674e+02, -1.76771528e+02],
         [1.59248426e-03, -6.81757549e+00, 1.66237012e+02, -3.43638683e+02,
          3.80069467e+02, -1.55688898e+02]),
    18: ([6.11750784e-02, -1.04874827e+01, 2.33708779e+02, -5.09567410e+02,
          5.83718240e+02, -2.37921148e+02],
         [2.84439112e-04, -6.91792134e+00, 1.85083311e+02, -4.03797031e+02,
          4.62767807e+02, -1.91889602e+02]),
    20: ([-2.20545111e-01, 2.37936891e+00, 1.49248519e+02, -3.27398031e+02,
          4.36609803e+02, -1.94364029e+02],
         [-1.25983096e-01, 3.42623942e-01, 1.34413692e+02, -2.84606487e+02,
          3.51715475e+02, -1.52174269e+02]),
}


@pytest.mark.skipif(not T200_XLSX.exists(), reason="T200 xlsx not present")
def test_t200_real_xlsx_matches_logged_coefficients():
    """End-to-end fit of the checkout's only REAL measured-data file (the
    Blue Robotics T200 workbook) through the stdlib xlsx reader reproduces
    the reference's logged coefficients for all six polynomials across the
    16/18/20 V sheets (``training/best_results.txt:1025-1053``) to the
    log's print precision."""
    from bluerov2_dynamics_tpu.data import t200

    fits = t200.fit_from_xlsx(T200_XLSX)
    assert sorted(fits) == [16, 18, 20]
    for V, (pos, neg) in T200_LOGGED.items():
        np.testing.assert_allclose(fits[V].pos_coeff, pos, rtol=1e-6)
        np.testing.assert_allclose(fits[V].neg_coeff, neg, rtol=1e-6)
    # spot physical sanity: ~52 N max forward thrust at 16 V
    f_max = t200.eval_piecewise(fits[16], np.array([1.0]))[0]
    assert 45.0 < f_max < 60.0


@pytest.mark.skipif(not T200_XLSX.exists(), reason="T200 xlsx not present")
def test_xlsx_reader_matches_reference_loader_on_real_workbook():
    """The stdlib zip+XML sheet reader agrees with the reference's pandas
    load (``T200_fit_polynomial.py:168-190``) cell-for-cell on the numeric
    columns actually consumed (201 rows per voltage sheet)."""
    pd = pytest.importorskip("pandas")
    try:
        ref_df = pd.read_excel(T200_XLSX, sheet_name="16 V")
    except ImportError:
        pytest.skip("pandas lacks an xlsx engine (openpyxl not installed)")
    from bluerov2_dynamics_tpu.data import xlsx

    header, rows = xlsx.read_sheet(T200_XLSX, "16 V")
    assert header == [str(c) for c in ref_df.columns]
    assert len(rows) == len(ref_df.dropna(how="all"))
    for col in header:
        want = pd.to_numeric(ref_df[col], errors="coerce").to_numpy(float)
        got = xlsx.numeric_column(header, rows, col)
        np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_legacy_static_thrust_curve_parity(rng):
    """static_thrust == the reference's lag-free legacy curve
    ``_old_thruster_force_from_input`` (``fossen/BlueROV2.py:234-243``) on a
    dense command grid (closes SURVEY P4's last item)."""
    from fossen.BlueROV2 import BlueROV2

    from bluerov2_dynamics_tpu.models.thrusters import static_thrust

    ref = BlueROV2(dt=0.02)
    V = np.linspace(-1.0, 1.0, 401)
    want = np.array([ref._old_thruster_force_from_input(v) for v in V])
    got = np.asarray(static_thrust(CFG64, jnp.asarray(V)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ------------------- PINc torch checkpoint import (K4 weight-level parity) --


PINC_PT = REF / "models" / "pinc_best.pt"


def _ref_training_module():
    """Import the reference flagship training module (import-safe: all
    executable code is behind its ``__main__`` guard,
    ``train_tank_brov2_full_comparison.py:1099``)."""
    sys.path.insert(0, str(REF / "training"))
    import train_tank_brov2_full_comparison as ref_mod

    return ref_mod


@pytest.mark.skipif(not PINC_PT.exists(), reason="reference checkpoint absent")
def test_pinc_torch_import_forward_parity(rng):
    """The reference's ONLY shipped trained artifact (models/pinc_best.pt,
    consumed at ``train_tank_brov2_full_comparison.py:948-969``) imported
    into flax params: forward pass matches the torch module to <=1e-5 on
    identical inputs — K4 reaches K2's weight-level parity standard."""
    import torch

    from bluerov2_dynamics_tpu.models import pinc

    ref_mod = _ref_training_module()
    tnet = ref_mod.PINcNet(hidden_sizes=[64, 64, 64, 64])
    tnet.load_state_dict(torch.load(PINC_PT, map_location="cpu", weights_only=True))
    tnet.eval()

    net, params = pinc.load_torch_checkpoint(PINC_PT)

    z = rng.normal(size=(64, 14)).astype(np.float32)
    z[:, 3:5] /= np.linalg.norm(z[:, 3:5], axis=1, keepdims=True)
    z[:, 13] = 0.02
    with torch.no_grad():
        want = tnet(torch.from_numpy(z)).numpy()
    got = np.asarray(net.apply(params, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(not PINC_PT.exists(), reason="reference checkpoint absent")
def test_pinc_torch_import_simulate_parity(rng):
    """Open-loop rollout of the imported weights vs the reference's
    ``simulate_pinc`` (``train_tank_brov2_full_comparison.py:838-862``) on
    the same commands — including the stateful thruster->wrench map, which
    our side reproduces via the explicit-lag scan."""
    import torch
    from fossen.BlueROV2 import BlueROV2

    from bluerov2_dynamics_tpu.models import pinc

    ref_mod = _ref_training_module()
    tnet = ref_mod.PINcNet(hidden_sizes=[64, 64, 64, 64])
    tnet.load_state_dict(torch.load(PINC_PT, map_location="cpu", weights_only=True))
    tnet.eval()

    dt = 0.02
    T = 50
    U8 = np.clip(rng.normal(size=(T, 8)) * 0.3, -1, 1)
    x0 = _rand_state12(rng, scale=0.2)

    want = ref_mod.simulate_pinc(
        x0, U8, dt, tnet, BlueROV2(dt=dt), torch.device("cpu")
    )

    net, params = pinc.load_torch_checkpoint(PINC_PT)
    cfg = thruster_config()
    lag = lag_params(dt)
    U4 = pinc.wrench4_from_thrusters(cfg, lag, jnp.asarray(U8, jnp.float32))
    got = np.asarray(
        pinc.simulate(net, params, jnp.asarray(x0, jnp.float32), U4, dt)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(not PINC_PT.exists(), reason="reference checkpoint absent")
def test_flagship_app_loads_reference_pt(tmp_path):
    """--pinc-ckpt pointed at the reference's .pt runs the flagship app end
    to end with the imported weights (the reference's load branch)."""
    from bluerov2_dynamics_tpu.apps import tank_full_comparison

    out = tank_full_comparison.main([
        "--synthetic", "--steps", "800", "--open-loop-steps", "40",
        "--no-media", "--n-rbfs", "20",
        "--pinc-ckpt", str(PINC_PT),
    ])
    for v in out["rmses"]["PINc (ResDNN)"].values():
        assert np.isfinite(v)
