"""Validation of the ingestion layer against the REAL tank recordings'
``metadata.yaml`` files.

The reference checkout's ``.db3`` payloads are 134-byte git-LFS stubs, but
all three ``metadata.yaml`` files are real (~36 KB): they record the actual
topic names, ROS types, serialization format, per-topic message counts and
durations of the tank recordings behind ``training/best_results.txt``.
These tests pin the ingestion layer to that ground truth (round-4 VERDICT
item 4):

* the stdlib metadata parser round-trips all three real files exactly
  (per-topic counts sum to the header count);
* every :class:`~bluerov2_dynamics_tpu.data.bag2csv.BagTopics` default
  names a topic that exists in EVERY real recording, CDR-serialized, with
  the expected ROS type and a registered decoder;
* the pseudo tank recording's default duration matches the real manual
  recording (the source of the 45,823-row 50 Hz CSV,
  ``training/best_results.txt:3,222``), and the 50 Hz resample target sits
  below every source topic's real rate.

Reference: ``rosbags/rosbag2_2025_11_06/rosbag2_2025_11_06-manual/metadata.yaml:1``
(and the 2025_10_30 / stabilized siblings).
"""

from __future__ import annotations

import math
from pathlib import Path

import pytest

from bluerov2_dynamics_tpu.data import bagmeta
from bluerov2_dynamics_tpu.data.bag2csv import BagTopics, validate_against_metadata

REF = Path("/root/reference/rosbags")
BAGS = {
    "2025_10_30": REF / "rosbag2_2025_10_30/rosbag2_2025_10_30-16_31_20",
    "manual": REF / "rosbag2_2025_11_06/rosbag2_2025_11_06-manual",
    "stabilized": REF / "rosbag2_2025_11_06/rosbag2_2025_11_06-stabilized",
}

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

# ROS type each BagTopics field must carry in the real recordings
EXPECTED_TYPES = {
    "mocap_odom": "nav_msgs/msg/Odometry",
    "mocap_pose": "geometry_msgs/msg/PoseStamped",
    "mocap_vel": "geometry_msgs/msg/TwistStamped",
    "px4_odom": "px4_msgs/msg/VehicleOdometry",
    "px4_motors": "px4_msgs/msg/ActuatorMotors",
}


@pytest.mark.parametrize("bag", list(BAGS), ids=list(BAGS))
def test_parser_roundtrips_real_metadata(bag):
    """The stdlib mini-YAML parser reads the real files exactly: version-5
    sqlite3 layout, and the per-topic message counts sum to the recording's
    total message count (an internal-consistency check rosbag2 guarantees)."""
    m = bagmeta.read_metadata(BAGS[bag])
    assert m.version == 5
    assert m.storage_identifier == "sqlite3"
    assert m.duration_s > 900.0  # all three tank sessions are 15+ minutes
    assert m.message_count > 700_000
    assert sum(t.message_count for t in m.topics) == m.message_count
    assert len(m.topics) == 64
    assert len(m.relative_file_paths) == 1
    assert m.relative_file_paths[0].endswith(".db3")
    # the quoted one-line QoS strings parse (escapes unfolded to newlines)
    doc = bagmeta.parse_simple_yaml((BAGS[bag] / "metadata.yaml").read_text())
    qos = doc["rosbag2_bagfile_information"]["topics_with_message_count"][0][
        "topic_metadata"]["offered_qos_profiles"]
    assert "\n" in qos and "reliability" in qos


@pytest.mark.parametrize("bag", list(BAGS), ids=list(BAGS))
def test_bagtopics_defaults_exist_in_every_real_recording(bag):
    """Every default topic the ingestion consumes exists in every real
    recording with the expected ROS type, CDR serialization, and a nonzero
    message count — i.e. the defaults were not guessed, they are the real
    recording layout."""
    m = bagmeta.read_metadata(BAGS[bag])
    topics = BagTopics()
    for field, expected_type in EXPECTED_TYPES.items():
        t = m.topic(getattr(topics, field))  # KeyError = missing topic
        assert t.type == expected_type, (field, t.type)
        assert t.serialization_format == "cdr"
        assert t.message_count > 20_000, (field, t.message_count)


@pytest.mark.parametrize("bag", list(BAGS), ids=list(BAGS))
def test_every_default_topic_type_has_a_decoder(bag):
    """Every type carried by the default topics decodes either via the
    hand-written codecs (:mod:`data.cdr`) or the schema-driven typestore
    (:mod:`data.typesys`) — the coverage claim of the dependency-free
    reader, checked against the real type names."""
    from bluerov2_dynamics_tpu.data import cdr, typesys

    decodable = set(cdr.DECODERS) | set(typesys.default_typestore().types)
    m = bagmeta.read_metadata(BAGS[bag])
    topics = BagTopics()
    for field in EXPECTED_TYPES:
        t = m.topic(getattr(topics, field))
        assert t.type in decodable, f"{field}: no decoder for {t.type}"


def test_px4_aux_topics_covered_by_typesys():
    """The PX4 topics the reference's frame-comparison tool reads
    (``rosbags/compare_body_frames.py:91-242``) are present in the real
    recordings and their types have registered typesys schemas."""
    from bluerov2_dynamics_tpu.data import typesys

    ts = typesys.default_typestore()
    m = bagmeta.read_metadata(BAGS["manual"])
    for name, typ in [
        ("/itrl_rov_1/fmu/out/sensor_combined", "px4_msgs/msg/SensorCombined"),
        ("/itrl_rov_1/fmu/out/manual_control_setpoint",
         "px4_msgs/msg/ManualControlSetpoint"),
    ]:
        t = m.topic(name)
        assert t.type == typ
        assert t.message_count > 20_000
        assert typ in ts.types


def test_validate_against_metadata_clean_on_real_layout():
    """The ingest-time validation passes with zero issues on the real
    manual recording's metadata and default topics."""
    meta, report = validate_against_metadata(BAGS["manual"], BagTopics(), 50.0)
    assert meta.message_count == 792_821
    for field, entry in report.items():
        assert entry["found"], field
        assert entry["decodable"], field
        assert entry["issues"] == [], (field, entry["issues"])
        assert entry["rate_hz"] > 50.0


def test_validate_against_metadata_flags_bad_topic():
    topics = BagTopics(mocap_odom="/does/not/exist")
    _, report = validate_against_metadata(BAGS["manual"], topics, 50.0)
    assert not report["mocap_odom"]["found"]
    assert report["mocap_odom"]["issues"] == ["topic not in recording"]
    # the untouched fields still validate clean
    assert report["px4_motors"]["issues"] == []


def test_validate_flags_low_rate_topic():
    """A topic recorded below the resample target is flagged (the 24 Hz
    manual_control_setpoint vs a 50 Hz target)."""
    topics = BagTopics(
        px4_motors="/itrl_rov_1/fmu/out/manual_control_setpoint")
    _, report = validate_against_metadata(BAGS["manual"], topics, 50.0)
    e = report["px4_motors"]
    assert e["found"] and e["decodable"]
    assert any("below the 50 Hz resample target" in s for s in e["issues"])


def test_pseudo_recording_duration_calibrated_to_real_manual_bag():
    """The pseudo tank recording's default size (45,823 rows @ 50 Hz =
    916.46 s) matches the real manual recording's duration (916.58 s) to
    0.05% — the reference's 45,823-row CSV (``best_results.txt:3,222``) is
    this bag resampled at 50 Hz, and the generator defaults reproduce that
    duration exactly rather than being round numbers."""
    import inspect

    from bluerov2_dynamics_tpu.data.synthetic import generate_tank_recording

    sig = inspect.signature(generate_tank_recording)
    n_steps = sig.parameters["n_steps"].default
    dt = sig.parameters["dt"].default
    assert n_steps == 45_823 and dt == 0.02
    real = bagmeta.read_metadata(BAGS["manual"]).duration_s
    assert math.isclose(n_steps * dt, real, rel_tol=5e-4), (n_steps * dt, real)


@pytest.mark.parametrize("bag", list(BAGS), ids=list(BAGS))
def test_50hz_resample_below_every_source_rate(bag):
    """The 50 Hz resample target undercuts every source topic's real rate
    (mocap streams ~95-97 Hz, PX4 streams ~100 Hz in all three sessions) —
    resampling DOWNsamples, never invents data."""
    m = bagmeta.read_metadata(BAGS[bag])
    topics = BagTopics()
    for field in EXPECTED_TYPES:
        rate = m.rate_hz(getattr(topics, field))
        assert rate > 50.0, (field, rate)
        assert rate < 110.0  # and the metadata rates are physically sane
