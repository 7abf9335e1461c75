"""Dependency-free rosbag2 reading: CDR codec + sqlite storage + pipeline."""

import sqlite3
import struct

import numpy as np
import pandas as pd
import pytest

from bluerov2_dynamics_tpu.data import bag_sqlite, cdr
from bluerov2_dynamics_tpu.data.bag2csv import BagTopics, convert
from bluerov2_dynamics_tpu.data.csv_loader import euler_to_quat_np, load_thruster_dataset


# ------------------------------ CDR codec ------------------------------

def test_cdr_actuator_motors_exact_bytes():
    """Hand-computed byte layout guards against shared encode/decode bugs:
    header(4) | u64 ts | u64 ts_sample | u16 flags | pad(2) | 12 f32."""
    control = [0.5] * 12
    data = cdr.encode_actuator_motors(control, timestamp=7)
    expect = (
        b"\x00\x01\x00\x00"
        + struct.pack("<QQ", 7, 7)
        + struct.pack("<H", 0)
        + b"\x00\x00"  # alignment padding to the next float32
        + struct.pack("<12f", *control)
    )
    assert data == expect
    m = cdr.decode_actuator_motors(data)
    assert m.timestamp == 7
    np.testing.assert_allclose(m.control, control)


def test_cdr_odometry_roundtrip(rng):
    pos = rng.normal(size=3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    lin = rng.normal(size=3)
    ang = rng.normal(size=3)
    data = cdr.encode_odometry(pos, q, lin, ang, child_frame_id="base_link",
                               sec=12, nanosec=34)
    m = cdr.decode_odometry(data)
    assert m.header.stamp.sec == 12 and m.header.stamp.nanosec == 34
    assert m.child_frame_id == "base_link"
    p = m.pose.pose.position
    np.testing.assert_allclose([p.x, p.y, p.z], pos, atol=1e-12)
    o = m.pose.pose.orientation
    np.testing.assert_allclose([o.x, o.y, o.z, o.w], q, atol=1e-12)
    tw = m.twist.twist
    np.testing.assert_allclose([tw.linear.x, tw.linear.y, tw.linear.z], lin, atol=1e-12)
    np.testing.assert_allclose([tw.angular.x, tw.angular.y, tw.angular.z], ang, atol=1e-12)


def test_cdr_vehicle_odometry_roundtrip(rng):
    pos = rng.normal(size=3).astype(np.float32)
    q = np.array([1.0, 0, 0, 0], np.float32)
    vel = rng.normal(size=3).astype(np.float32)
    ang = rng.normal(size=3).astype(np.float32)
    m = cdr.decode_vehicle_odometry(
        cdr.encode_vehicle_odometry(pos, q, vel, ang, timestamp=99)
    )
    assert m.timestamp == 99
    np.testing.assert_allclose(m.position, pos, atol=1e-7)
    np.testing.assert_allclose(m.q, q, atol=1e-7)
    np.testing.assert_allclose(m.velocity, vel, atol=1e-7)
    np.testing.assert_allclose(m.angular_velocity, ang, atol=1e-7)


def test_cdr_string_alignment():
    """A string of odd length must not break the alignment of following
    doubles (alignment is relative to the payload start)."""
    w = cdr.CdrWriter()
    w.string("abc")          # 4 (len) + 4 bytes payload -> offset 8
    w.prim("float64", 2.5)   # needs 8-alignment -> no pad here
    w.string("x")            # 4 + 2 -> offset 22
    w.prim("float64", -1.0)  # pad to 24
    r = cdr.CdrReader(w.bytes())
    assert r.string() == "abc"
    assert r.prim("float64") == 2.5
    assert r.string() == "x"
    assert r.prim("float64") == -1.0


# ------------------------------ sqlite storage ------------------------------

ROSBAG2_SCHEMA = """
CREATE TABLE topics(
  id INTEGER PRIMARY KEY, name TEXT NOT NULL, type TEXT NOT NULL,
  serialization_format TEXT NOT NULL, offered_qos_profiles TEXT NOT NULL);
CREATE TABLE messages(
  id INTEGER PRIMARY KEY, topic_id INTEGER NOT NULL,
  timestamp INTEGER NOT NULL, data BLOB NOT NULL);
"""


def _make_bag(tmp_path, rng, n=200, hz=50.0, with_motors=True):
    """Synthesize a rosbag2 directory with mocap odometry + actuators."""
    bag_dir = tmp_path / "rosbag2_test"
    bag_dir.mkdir()
    db3 = bag_dir / "rosbag2_test_0.db3"
    con = sqlite3.connect(db3)
    con.executescript(ROSBAG2_SCHEMA)
    topics = BagTopics()
    con.execute(
        "INSERT INTO topics VALUES (1, ?, 'nav_msgs/msg/Odometry', 'cdr', '')",
        (topics.mocap_odom,),
    )
    con.execute(
        "INSERT INTO topics VALUES (2, ?, 'px4_msgs/msg/ActuatorMotors', 'cdr', '')",
        (topics.px4_motors,),
    )
    dt_ns = int(1e9 / hz)
    t = np.arange(n) * (1.0 / hz)
    angles = np.stack([0.1 * np.sin(t), 0.05 * np.cos(t), 0.3 * t], axis=1)
    q_wxyz = euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])
    pos = np.stack([np.sin(t), np.cos(t), 0.1 * t], axis=1)
    lin_body = rng.normal(size=(n, 3)) * 0.2
    ang_body = rng.normal(size=(n, 3)) * 0.1
    msg_id = 1
    for k in range(n):
        q_xyzw = np.concatenate([q_wxyz[k, 1:4], q_wxyz[k, 0:1]])
        blob = cdr.encode_odometry(pos[k], q_xyzw, lin_body[k], ang_body[k],
                                   child_frame_id="base_link")
        con.execute("INSERT INTO messages VALUES (?, 1, ?, ?)",
                    (msg_id, 1_000_000 + k * dt_ns, blob))
        msg_id += 1
    if with_motors:
        for k in range(0, n, 2):  # motors at half rate
            ctrl = list(np.clip(rng.normal(size=8) * 0.4, -1, 1)) + [np.nan] * 4
            blob = cdr.encode_actuator_motors(ctrl, timestamp=k)
            con.execute("INSERT INTO messages VALUES (?, 2, ?, ?)",
                        (msg_id, 1_000_000 + k * dt_ns, blob))
            msg_id += 1
    con.commit()
    con.close()
    return bag_dir, pos, lin_body, ang_body


def test_read_bag_sqlite(tmp_path, rng):
    bag_dir, pos, lin_body, ang_body = _make_bag(tmp_path, rng)
    df_odom, df_act = bag_sqlite.read_bag_sqlite(bag_dir, verbose=False)
    assert len(df_odom) == 200
    np.testing.assert_allclose(df_odom[["x", "y", "z"]].to_numpy(), pos, atol=1e-9)
    # child_frame 'base_link' => body mode => twists pass through
    np.testing.assert_allclose(df_odom[["u", "v", "w"]].to_numpy(), lin_body, atol=1e-9)
    np.testing.assert_allclose(df_odom[["p", "q", "r"]].to_numpy(), ang_body, atol=1e-9)
    assert df_act is not None and len(df_act) == 100
    assert (df_act[[f"u{i}" for i in range(1, 9)]].abs().to_numpy() <= 1.0).all()


def test_convert_pipeline_via_sqlite_fallback(tmp_path, rng):
    """Full R1 pipeline without the rosbags package: bag -> 50 Hz CSV that
    the training loader accepts."""
    bag_dir, *_ = _make_bag(tmp_path, rng, n=300)
    csv_path = convert(bag_dir, out_base=tmp_path / "out" / "ds")
    ds = load_thruster_dataset(csv_path, verbose=False)
    assert ds.X.shape[1] == 12 and ds.U.shape[1] == 8
    np.testing.assert_allclose(ds.dt, 0.02, atol=1e-6)
    assert np.all(np.isfinite(ds.X))


def test_px4_fallback_source(tmp_path, rng):
    """Bag with only PX4 VehicleOdometry: NED->ENU conversion path."""
    bag_dir = tmp_path / "bag_px4"
    bag_dir.mkdir()
    db3 = bag_dir / "b_0.db3"
    con = sqlite3.connect(db3)
    con.executescript(ROSBAG2_SCHEMA)
    topics = BagTopics()
    con.execute(
        "INSERT INTO topics VALUES (1, ?, 'px4_msgs/msg/VehicleOdometry', 'cdr', '')",
        (topics.px4_odom,),
    )
    n = 50
    for k in range(n):
        blob = cdr.encode_vehicle_odometry(
            [1.0 + 0.01 * k, 2.0, 3.0], [1.0, 0, 0, 0],
            [0.1, 0.2, 0.3], [0.0, 0.0, 0.1], timestamp=k,
        )
        con.execute("INSERT INTO messages VALUES (?, 1, ?, ?)",
                    (k + 1, 1_000_000 + k * 20_000_000, blob))
    con.commit()
    con.close()
    df_odom, df_act = bag_sqlite.read_bag_sqlite(bag_dir, verbose=False)
    assert df_act is None
    # NED (x_n, y_n, z_n) -> ENU (y_n, x_n, -z_n)
    np.testing.assert_allclose(df_odom["x"].iloc[0], 2.0, atol=1e-6)
    np.testing.assert_allclose(df_odom["y"].iloc[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(df_odom["z"].iloc[0], -3.0, atol=1e-6)


def test_missing_topics_raises(tmp_path):
    bag_dir = tmp_path / "bag_empty"
    bag_dir.mkdir()
    con = sqlite3.connect(bag_dir / "e_0.db3")
    con.executescript(ROSBAG2_SCHEMA)
    con.commit()
    con.close()
    with pytest.raises(RuntimeError, match="No pose/odometry stream"):
        bag_sqlite.read_bag_sqlite(bag_dir, verbose=False)


def test_compare_bag_sqlite_fallback(tmp_path, rng):
    """R4 (frame discovery) end-to-end through the dependency-free reader:
    a bag where the PX4 gyro equals the mocap body rates must score the
    rotated/identity hypothesis highest."""
    from bluerov2_dynamics_tpu.data import frames

    bag_dir = tmp_path / "bag_frames"
    bag_dir.mkdir()
    con = sqlite3.connect(bag_dir / "f_0.db3")
    con.executescript(ROSBAG2_SCHEMA)
    topics = BagTopics()
    con.execute(
        "INSERT INTO topics VALUES (1, ?, 'nav_msgs/msg/Odometry', 'cdr', '')",
        (topics.mocap_odom,),
    )
    con.execute(
        "INSERT INTO topics VALUES (2, ?, 'px4_msgs/msg/VehicleOdometry', 'cdr', '')",
        (topics.px4_odom,),
    )
    n = 300
    t = np.arange(n) * 0.02
    angles = np.stack([0.2 * np.sin(t), 0.1 * np.cos(t), 0.5 * t], axis=1)
    q_wxyz = euler_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])
    # body rates measured by the gyro
    G = np.stack([np.sin(3 * t), np.cos(2 * t), np.sin(5 * t)], axis=1)
    # mocap twist expressed so quat_dcm(q) @ W = G ('rotated' hypothesis)
    from bluerov2_dynamics_tpu.data.bag2csv import quat_dcm

    q_xyzw = np.concatenate([q_wxyz[:, 1:4], q_wxyz[:, 0:1]], axis=1)
    R = quat_dcm(q_xyzw)
    W = np.einsum("nji,nj->ni", R, G)
    mid = 1
    for k in range(n):
        blob = cdr.encode_odometry([0, 0, 0], q_xyzw[k], [0, 0, 0], W[k],
                                   child_frame_id="odom")
        con.execute("INSERT INTO messages VALUES (?, 1, ?, ?)",
                    (mid, 1_000_000 + k * 20_000_000, blob)); mid += 1
    for k in range(n):
        blob = cdr.encode_vehicle_odometry([0, 0, 0], [1, 0, 0, 0],
                                           [0, 0, 0], G[k])
        con.execute("INSERT INTO messages VALUES (?, 2, ?, ?)",
                    (mid, 1_000_000 + k * 20_000_000, blob)); mid += 1
    con.commit()
    con.close()

    res = frames.compare_bag(bag_dir)
    assert res["rotated"]["flip"] == "identity"
    assert res["rotated"]["score"] > 2.9


def test_bag2csv_cli(tmp_path, rng, capsys):
    """The bag2csv CLI end-to-end on a synthesized bag."""
    from bluerov2_dynamics_tpu.data import bag2csv as b2c

    bag_dir, *_ = _make_bag(tmp_path, rng, n=120)
    out_base = tmp_path / "cli_out" / "dataset"
    b2c.main([str(bag_dir), "--out", str(out_base), "--hz", "25"])
    df = pd.read_csv(out_base.with_suffix(".csv"))
    assert list(df.columns) == ["t"] + b2c.STATE_COLS + b2c.ACT_COLS
    dts = np.diff(df["t"].to_numpy())
    np.testing.assert_allclose(dts, 0.04, atol=1e-9)


def test_bag2csv_parquet_output(tmp_path, rng):
    """--parquet writes a parquet twin of the CSV with identical contents
    (reference feature at rosbags/bag2csv.py:467-482)."""
    pytest.importorskip("pyarrow")
    from bluerov2_dynamics_tpu.data import bag2csv as b2c

    bag_dir, *_ = _make_bag(tmp_path, rng, n=150)
    out_base = tmp_path / "pq_out" / "dataset"
    b2c.main([str(bag_dir), "--out", str(out_base), "--parquet"])
    pq_path = out_base.with_suffix(".parquet")
    assert pq_path.exists()
    df_csv = pd.read_csv(out_base.with_suffix(".csv"))
    df_pq = pd.read_parquet(pq_path)
    assert list(df_pq.columns) == list(df_csv.columns)
    np.testing.assert_allclose(df_pq.to_numpy(), df_csv.to_numpy(), atol=1e-12)


def test_bag2csv_quicklook_video(tmp_path, rng):
    """--video writes the top-down quicklook animation
    (reference feature at rosbags/bag2csv.py:483-559)."""
    from bluerov2_dynamics_tpu.data import bag2csv as b2c

    bag_dir, *_ = _make_bag(tmp_path, rng, n=120)
    out_base = tmp_path / "vid_out" / "dataset"
    video = tmp_path / "vid_out" / "quicklook.gif"
    b2c.main([str(bag_dir), "--out", str(out_base), "--video", str(video)])
    assert video.exists() and video.stat().st_size > 1000


def test_loader_accepts_parquet(tmp_path, rng):
    """The training loader consumes the parquet twin directly."""
    pytest.importorskip("pyarrow")
    from bluerov2_dynamics_tpu.data import bag2csv as b2c

    bag_dir, *_ = _make_bag(tmp_path, rng, n=150)
    out_base = tmp_path / "pq2" / "dataset"
    b2c.main([str(bag_dir), "--out", str(out_base), "--parquet"])
    ds_pq = load_thruster_dataset(out_base.with_suffix(".parquet"), verbose=False)
    ds_csv = load_thruster_dataset(out_base.with_suffix(".csv"), verbose=False)
    np.testing.assert_allclose(ds_pq.X, ds_csv.X, atol=1e-12)
    np.testing.assert_allclose(ds_pq.U, ds_csv.U, atol=1e-12)


def test_iter_messages_warns_on_systematic_decode_failure(tmp_path, rng, capsys):
    """All-corrupt blobs for a topic must produce a loud warning, not a
    silently empty stream (the round-3 'swallowed into 0 messages' bug
    class)."""
    bag_dir, *_ = _make_bag(tmp_path, rng, n=20, with_motors=False)
    db3 = next(bag_dir.glob("*.db3"))
    con = sqlite3.connect(db3)
    # truncate every blob to 3 bytes: even the CDR header check fails
    con.execute("UPDATE messages SET data = X'000100'")
    con.commit()
    con.close()
    from bluerov2_dynamics_tpu.data.bag_sqlite import iter_messages

    msgs = list(iter_messages(bag_dir / db3.name, BagTopics().mocap_odom))
    assert msgs == []
    out = capsys.readouterr()
    assert "failed to decode" in out.out + out.err
