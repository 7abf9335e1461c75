"""Native (C++) batch CDR decoder: build, parity with Python codec, speed."""

import time

import numpy as np
import pytest

from bluerov2_dynamics_tpu.data import cdr

native_cdr = pytest.importorskip("bluerov2_dynamics_tpu.data.native_cdr")
if not native_cdr.available():
    pytest.skip("g++ unavailable; native CDR decoders not built",
                allow_module_level=True)


def _odometry_blobs(rng, n=200):
    blobs = []
    truth = []
    for i in range(n):
        pos = rng.normal(size=3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        lin = rng.normal(size=3)
        ang = rng.normal(size=3)
        cf = "itrl_rov_1/base_link" if i % 2 == 0 else "odom"
        blobs.append(cdr.encode_odometry(pos, q, lin, ang, child_frame_id=cf))
        truth.append((np.concatenate([pos, q, lin, ang]), 1 if i % 2 == 0 else 0))
    return blobs, truth


def test_odometry_batch_parity(rng):
    blobs, truth = _odometry_blobs(rng)
    fields, flags = native_cdr.decode_odometry_batch(blobs)
    assert fields.shape == (len(blobs), 13)
    for i, (vals, flag) in enumerate(truth):
        np.testing.assert_allclose(fields[i], vals, atol=1e-12)
        assert flags[i] == flag
        # cross-check against the Python decoder
        m = cdr.decode_odometry(blobs[i])
        p = m.pose.pose.position
        np.testing.assert_allclose(fields[i, 0:3], [p.x, p.y, p.z], atol=1e-12)


def test_actuator_batch_parity(rng):
    blobs = []
    truth = []
    for _ in range(150):
        ctrl = list(rng.normal(size=8)) + [np.nan] * 4
        blobs.append(cdr.encode_actuator_motors(ctrl, timestamp=3))
        truth.append(ctrl[:8])
    out = native_cdr.decode_actuator_motors_batch(blobs)
    np.testing.assert_allclose(out, np.asarray(truth, np.float32), atol=1e-7)


def test_vehicle_odometry_batch_parity(rng):
    blobs = []
    truth = []
    for _ in range(100):
        pos = rng.normal(size=3)
        q = rng.normal(size=4)
        vel = rng.normal(size=3)
        ang = rng.normal(size=3)
        blobs.append(cdr.encode_vehicle_odometry(pos, q, vel, ang))
        truth.append(np.concatenate([pos, q, vel, ang]).astype(np.float32))
    out = native_cdr.decode_vehicle_odometry_batch(blobs)
    np.testing.assert_allclose(out, np.stack(truth), atol=1e-6)


def test_malformed_blob_raises(rng):
    blobs, _ = _odometry_blobs(rng, n=3)
    blobs[1] = blobs[1][:20]  # truncated
    with pytest.raises(ValueError, match="index 1"):
        native_cdr.decode_odometry_batch(blobs)


def test_native_faster_than_python(rng):
    """The batch decoder should beat the per-message Python codec
    (best-of-3 timings to ride out scheduler noise)."""
    blobs, _ = _odometry_blobs(rng, n=3000)
    native_cdr.decode_odometry_batch(blobs)  # warmup/build

    def best_of(fn, reps=3):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(lambda: native_cdr.decode_odometry_batch(blobs))
    t_python = best_of(lambda: [cdr.decode_odometry(b) for b in blobs])
    assert t_native < t_python, (t_native, t_python)


def test_bag_reader_native_matches_python(tmp_path, rng):
    from test_bag_sqlite import _make_bag

    from bluerov2_dynamics_tpu.data.bag_sqlite import read_bag_sqlite

    bag_dir, *_ = _make_bag(tmp_path, rng, n=120)
    df_n, act_n = read_bag_sqlite(bag_dir, verbose=False, use_native=True)
    df_p, act_p = read_bag_sqlite(bag_dir, verbose=False, use_native=False)
    np.testing.assert_allclose(df_n.to_numpy(), df_p.to_numpy(), atol=1e-12)
    np.testing.assert_allclose(act_n.to_numpy(), act_p.to_numpy(), atol=1e-7)
