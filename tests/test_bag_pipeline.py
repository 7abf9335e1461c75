"""Tests for the bag-ingestion transform pipeline and frame discovery
(pure-array parts; actual bag decoding requires the optional rosbags pkg)."""

import numpy as np
import pandas as pd
import pytest

from bluerov2_dynamics_tpu.data import bag2csv, frames
from bluerov2_dynamics_tpu.data.csv_loader import euler_to_quat_np


def _xyzw(q_wxyz):
    return np.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)


def test_quat_dcm_orthonormal(rng):
    q = rng.normal(size=(20, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = bag2csv.quat_dcm(q)
    eye = np.broadcast_to(np.eye(3), (20, 3, 3))
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2), eye, atol=1e-12)


def test_quat_to_euler_xyzw_roundtrip(rng):
    angles = rng.uniform(-1.2, 1.2, size=(30, 3))
    q_wxyz = euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])
    phi, theta, psi = bag2csv.quat_to_euler_xyzw(_xyzw(q_wxyz))
    np.testing.assert_allclose(phi, angles[:, 0], atol=1e-10)
    np.testing.assert_allclose(theta, angles[:, 1], atol=1e-10)
    np.testing.assert_allclose(psi, angles[:, 2], atol=1e-10)


def test_ned_enu_swap():
    v = np.array([[1.0, 2.0, 3.0]])
    out = bag2csv.ned_to_enu(v)
    np.testing.assert_allclose(out, [[2.0, 1.0, -3.0]])
    # applying twice returns the original (the swap is an involution)
    np.testing.assert_allclose(bag2csv.ned_to_enu(out), v)


def test_ned_quat_to_enu_euler_mapping(rng):
    angles = rng.uniform(-0.8, 0.8, size=(10, 3))
    q_ned = _xyzw(euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2]))
    q_enu = bag2csv.ned_quat_to_enu(q_ned)
    phi_e, theta_e, psi_e = bag2csv.quat_to_euler_xyzw(q_enu)
    np.testing.assert_allclose(phi_e, angles[:, 1], atol=1e-9)   # phi_enu = theta_ned
    np.testing.assert_allclose(theta_e, angles[:, 0], atol=1e-9)  # theta_enu = phi_ned
    np.testing.assert_allclose(psi_e, -angles[:, 2], atol=1e-9)   # psi_enu = -psi_ned


def _synthetic_motion(rng, N=400, dt=0.02):
    """World trajectory with known attitude and world-frame velocity."""
    t = np.arange(N) * dt
    angles = np.stack(
        [0.2 * np.sin(0.5 * t), 0.1 * np.cos(0.7 * t), 0.5 * t], axis=1
    )
    q = _xyzw(euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2]))
    v_world = np.stack(
        [np.sin(t), np.cos(1.3 * t), 0.2 * np.sin(0.4 * t)], axis=1
    )
    pos = np.cumsum(v_world * dt, axis=0)
    return t, pos, v_world, q


def test_infer_twist_frame_parent(rng):
    t, pos, v_world, q = _synthetic_motion(rng)
    assert bag2csv.infer_twist_frame(t, pos, v_world, q, verbose=False) == "parent"


def test_infer_twist_frame_body(rng):
    t, pos, v_world, q = _synthetic_motion(rng)
    # express the twist in the frame whose rotation by quat_dcm^T recovers world
    R = bag2csv.quat_dcm(q)
    v_enc = np.einsum("nij,nj->ni", R, v_world)
    assert bag2csv.infer_twist_frame(t, pos, v_enc, q, verbose=False) == "body"


def test_odom_table_modes(rng):
    t, pos, v_world, q = _synthetic_motion(rng, N=50)
    ang = rng.normal(size=(50, 3)) * 0.1
    df_parent = bag2csv.odom_table(t, pos, q, v_world, ang, mode="parent")
    df_body = bag2csv.odom_table(t, pos, q, v_world, ang, mode="body")
    # body mode passes twists through
    np.testing.assert_allclose(df_body[["u", "v", "w"]].to_numpy(), v_world)
    # parent mode rotates them by the DCM
    R = bag2csv.quat_dcm(q)
    np.testing.assert_allclose(
        df_parent[["u", "v", "w"]].to_numpy(),
        np.einsum("nij,nj->ni", R, v_world),
        atol=1e-12,
    )
    assert list(df_parent.columns) == ["t"] + bag2csv.STATE_COLS


def test_actuator_diagnostics_and_table():
    times = np.arange(5) * 0.1
    raw = np.zeros((5, 8))
    raw[1, 2] = np.nan
    raw[3, :] = np.nan
    raw[4, 0] = 2.5  # out of range
    rep = bag2csv.actuator_diagnostics(raw, verbose=False)
    assert rep.total == 5 and rep.nan_any == 2
    assert rep.nan_per_chan[2] == 2 and rep.nan_per_chan[0] == 1
    assert rep.valid_count_hist[0] == 1 and rep.valid_count_hist[7] == 1
    df = bag2csv.actuator_table(times, raw)
    assert float(df.loc[1, "u3"]) == 0.0   # NaN -> 0
    assert float(df.loc[4, "u1"]) == 1.0   # clipped


def test_resample_and_join(rng):
    # irregular ~25 Hz odometry with a psi wrap crossing
    N = 200
    t = np.cumsum(rng.uniform(0.03, 0.05, size=N))
    psi = np.linspace(3.0, 3.6, N)  # crosses +pi
    psi_wrapped = (psi + np.pi) % (2 * np.pi) - np.pi
    df_odom = pd.DataFrame({"t": t})
    for c in bag2csv.STATE_COLS:
        df_odom[c] = rng.normal(size=N) * 0.1
    df_odom["psi"] = psi_wrapped
    df_act = pd.DataFrame({"t": t[::2]})
    for i, c in enumerate(bag2csv.ACT_COLS):
        df_act[c] = np.sin(t[::2] + i)

    out = bag2csv.resample_and_join(df_odom, df_act, hz=50.0, verbose=False)
    dts = np.diff(out["t"].to_numpy())
    np.testing.assert_allclose(dts, 0.02, atol=1e-9)       # regular 50 Hz
    assert not out.isna().any().any()
    # unwrap undid the wrap: psi is monotone increasing past pi
    assert out["psi"].max() > np.pi
    assert (np.abs(out[bag2csv.ACT_COLS].to_numpy()) <= 1.0).all()
    assert list(out.columns) == ["t"] + bag2csv.STATE_COLS + bag2csv.ACT_COLS


def test_resample_without_actuators(rng):
    N = 50
    t = np.arange(N) * 0.02
    df_odom = pd.DataFrame({"t": t})
    for c in bag2csv.STATE_COLS:
        df_odom[c] = rng.normal(size=N)
    out = bag2csv.resample_and_join(df_odom, None, hz=50.0, verbose=False)
    np.testing.assert_allclose(out[bag2csv.ACT_COLS].to_numpy(), 0.0)


def test_read_bag_gated():
    with pytest.raises((ImportError, FileNotFoundError)):
        bag2csv.read_bag("/nonexistent/bag")


# ------------------------- frame discovery -------------------------

def test_score_conventions_recovers_flip(rng):
    """Gyro = flip_yz of the mocap body rates -> as_is/flip_yz must win."""
    N = 500
    t = np.arange(N) * 0.01
    G = np.stack([np.sin(3 * t), np.cos(2 * t), np.sin(5 * t)], axis=1)
    S = frames.FLIPS["flip_yz"]
    W_mocap = G @ S.T  # because S is its own inverse (diagonal +-1)
    q = np.tile([0.0, 0.0, 0.0, 1.0], (N, 1))
    res = frames.score_conventions(t, W_mocap, q, t, G, verbose=False)
    best = res["as_is"]
    assert best["flip"] == "flip_yz"
    assert best["score"] > 2.9


def test_score_conventions_rotated_mode(rng):
    """Mocap twist in the parent frame: the rotated hypothesis must win."""
    N = 500
    t = np.arange(N) * 0.01
    angles = np.stack(
        [0.3 * np.sin(t), 0.2 * np.cos(t), 0.8 * t], axis=1
    )
    q = np.concatenate(
        [euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])[:, 1:4],
         euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])[:, 0:1]],
        axis=1,
    )
    G = np.stack([np.sin(3 * t), np.cos(2 * t), np.sin(5 * t)], axis=1)
    # encode: W such that quat_dcm(q) @ W = G
    R = bag2csv.quat_dcm(q)
    W = np.einsum("nji,nj->ni", R, G)  # R^T @ G
    res = frames.score_conventions(t, W, q, t, G, verbose=False)
    assert res["rotated"]["flip"] == "identity"
    assert res["rotated"]["score"] > 2.9
    assert res["rotated"]["score"] > res["as_is"]["score"]


def test_axis_correlation_basics(rng):
    a = rng.normal(size=300)
    assert frames.axis_correlation(a, a) == pytest.approx(1.0)
    assert frames.axis_correlation(a, -a) == pytest.approx(-1.0)
    b = rng.normal(size=300)
    assert abs(frames.axis_correlation(a, b)) < 0.2
