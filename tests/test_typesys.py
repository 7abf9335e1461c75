"""Schema-driven .msg/.idl type system and generic CDR decoding.

The reference registers custom bag types from ``.msg`` or ``.idl`` files
(``rosbags/bag2csv.py:74-97``); these tests pin our dependency-free
equivalent — parse both formats, decode real CDR payloads generically,
and match the hand-written decoders byte-for-byte.
"""

import numpy as np

from bluerov2_dynamics_tpu.data import cdr, typesys
from bluerov2_dynamics_tpu.data.px4_msgs import ACTUATOR_MOTORS, VEHICLE_ODOMETRY

ACTUATOR_MOTORS_IDL = """\
// generated from rosidl_adapter/resource/msg.idl.em
// with input from px4_msgs/msg/ActuatorMotors.msg

module px4_msgs {
  module msg {
    typedef float float__12[12];
    module ActuatorMotors_Constants {
      const uint32 MESSAGE_VERSION = 0;
      const uint8 ACTUATOR_FUNCTION_MOTOR1 = 101;
      const uint8 NUM_CONTROLS = 12;
    };
    @verbatim (language="comment", text="Motor control message")
    struct ActuatorMotors {
      uint64 timestamp;

      @unit (value="us")
      uint64 timestamp_sample;

      uint16 reversible_flags;

      float__12 control;
    };
  };
};
"""


def test_parse_msg_skips_constants_and_reads_arrays():
    fields = typesys.parse_msg(ACTUATOR_MOTORS, "px4_msgs/msg/ActuatorMotors")
    names = [f.name for f in fields]
    assert names == ["timestamp", "timestamp_sample", "reversible_flags",
                     "control"]
    assert fields[-1] == typesys.Field("control", "float32", 12)


def test_parse_idl_matches_parse_msg():
    got = typesys.parse_idl(ACTUATOR_MOTORS_IDL)
    assert list(got) == ["px4_msgs/msg/ActuatorMotors"]
    assert got["px4_msgs/msg/ActuatorMotors"] == typesys.parse_msg(
        ACTUATOR_MOTORS, "px4_msgs/msg/ActuatorMotors"
    )


def test_generic_decode_matches_hand_decoder_actuator_motors(rng):
    control = rng.normal(size=12).astype(np.float32)
    blob = cdr.encode_actuator_motors(control, timestamp=123456789)

    want = cdr.decode_actuator_motors(blob)
    ts = typesys.default_typestore()
    got = ts.decode("px4_msgs/msg/ActuatorMotors", blob)
    assert got.timestamp == want.timestamp
    np.testing.assert_allclose(got.control, want.control)

    # same again via the .idl registration path
    ts2 = typesys.TypeStore()
    found = ts2.register_idl(ACTUATOR_MOTORS_IDL)
    assert found == ["px4_msgs/msg/ActuatorMotors"]
    got2 = ts2.decode("px4_msgs/msg/ActuatorMotors", blob)
    np.testing.assert_allclose(got2.control, want.control)


def test_generic_decode_vehicle_odometry(rng):
    pos = rng.normal(size=3).astype(np.float32)
    q = rng.normal(size=4).astype(np.float32)
    vel = rng.normal(size=3).astype(np.float32)
    ang = rng.normal(size=3).astype(np.float32)
    blob = cdr.encode_vehicle_odometry(pos, q, vel, ang, timestamp=42)

    want = cdr.decode_vehicle_odometry(blob)
    got = typesys.default_typestore().decode("px4_msgs/msg/VehicleOdometry", blob)
    np.testing.assert_allclose(got.position, want.position)
    np.testing.assert_allclose(got.q, want.q)
    np.testing.assert_allclose(got.velocity, want.velocity)
    np.testing.assert_allclose(got.angular_velocity, want.angular_velocity)
    assert got.pose_frame == want.pose_frame


def test_load_directory_registers_msg_and_idl(tmp_path):
    """Directory-scan contract of the reference's register_custom_types:
    pkg/msg/*.msg and *.idl trees both register."""
    msg_dir = tmp_path / "my_pkg" / "msg"
    msg_dir.mkdir(parents=True)
    (msg_dir / "Simple.msg").write_text(
        "uint8 FLAG=1\nfloat64 value\nint32[4] counts\n"
    )
    (msg_dir / "Other.idl").write_text("""\
module my_pkg {
  module msg {
    struct Other {
      uint32 id;
      sequence<float> data;
      string label;
    };
  };
};
""")
    ts = typesys.TypeStore()
    found = ts.load_directory(tmp_path)
    assert sorted(found) == ["my_pkg/msg/Other", "my_pkg/msg/Simple"]
    assert ts.types["my_pkg/msg/Simple"] == [
        typesys.Field("value", "float64", None),
        typesys.Field("counts", "int32", 4),
    ]
    assert ts.types["my_pkg/msg/Other"] == [
        typesys.Field("id", "uint32", None),
        typesys.Field("data", "float32", -1),
        typesys.Field("label", "string", None),
    ]

    # round-trip a payload of the .idl-registered type
    w = cdr.CdrWriter()
    w.prim("uint32", 7)
    w.prim("uint32", 3)          # sequence length
    w.array("float32", [1.0, 2.5, -3.0])
    w.string("hello")
    got = ts.decode("my_pkg/msg/Other", w.bytes())
    assert got.id == 7
    np.testing.assert_allclose(got.data, [1.0, 2.5, -3.0])
    assert got.label == "hello"


def test_nested_types_decode():
    """Nested registered types (Header -> Time) decode recursively."""
    ts = typesys.default_typestore()
    ts.register_msg("demo/msg/Stamped", "std_msgs/Header header\nfloat64 x\n")
    w = cdr.CdrWriter()
    w.prim("int32", 5)
    w.prim("uint32", 600)
    w.string("map")
    w.prim("float64", 2.75)
    # the bare 'Header' shorthand namespaces to std_msgs/msg/Header
    fields = typesys.parse_msg("Header header\nfloat64 x\n", "demo/msg/S2")
    assert fields[0].kind == "std_msgs/msg/Header"
    got = ts.decode("demo/msg/Stamped", w.bytes())
    assert got.header.stamp.sec == 5
    assert got.header.frame_id == "map"
    assert got.x == 2.75


def test_bag_sqlite_generic_fallback(tmp_path, rng):
    """iter_messages falls back to the schema decoder for types without a
    hand-written decoder."""
    import sqlite3

    from bluerov2_dynamics_tpu.data import bag_sqlite

    db = tmp_path / "bag_0.db3"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                "type TEXT, serialization_format TEXT, "
                "offered_qos_profiles TEXT)")
    con.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                "topic_id INTEGER, timestamp INTEGER, data BLOB)")
    con.execute("INSERT INTO topics VALUES (1, '/fmu/out/manual_control_setpoint', "
                "'px4_msgs/msg/ManualControlSetpoint', 'cdr', '')")
    con.commit()
    con.close()

    # build a real ManualControlSetpoint payload from its schema
    ts = typesys.default_typestore()
    fields = ts.types["px4_msgs/msg/ManualControlSetpoint"]
    w = cdr.CdrWriter()
    vals = {}
    for f in fields:
        if f.kind == "bool":
            w.prim("bool", True)
            vals[f.name] = True
        elif f.kind == "string":
            w.string("x")
            vals[f.name] = "x"
        elif f.kind.startswith("float"):
            v = float(np.round(rng.normal(), 3))
            w.prim(f.kind, v)
            vals[f.name] = v
        else:
            w.prim(f.kind, 3)
            vals[f.name] = 3
    con = sqlite3.connect(db)
    con.execute("INSERT INTO messages VALUES (1, 1, 1000, ?)",
                (w.bytes(),))
    con.commit()
    con.close()

    out = list(bag_sqlite.iter_messages(db, "/fmu/out/manual_control_setpoint"))
    assert len(out) == 1
    ts_ns, msg = out[0]
    assert ts_ns == 1000
    assert msg.valid is True
    np.testing.assert_allclose(msg.roll, vals["roll"], rtol=1e-6)
    assert msg.buttons == 3


def test_idl_annotation_with_parens_in_quotes():
    """rosidl @verbatim annotations routinely contain ')' inside quoted
    text ('Heading (rad)'); the stripper must consume quoted strings
    atomically or the next field's type is corrupted."""
    idl = """\
module demo {
  module msg {
    struct Annotated {
      @verbatim (language="comment", text="Heading accuracy (rad)")
      float heading;
      uint32 counter;
    };
  };
};
"""
    got = typesys.parse_idl(idl)
    assert got["demo/msg/Annotated"] == [
        typesys.Field("heading", "float32", None),
        typesys.Field("counter", "uint32", None),
    ]


def test_msg_bounded_string_and_unparseable_line():
    """Bounded strings parse (same wire format as unbounded); a field line
    that cannot be parsed raises instead of silently misaligning every
    subsequent field's CDR offset."""
    fields = typesys.parse_msg("string<=64 name\nfloat64 x\n", "d/msg/S")
    assert fields == [typesys.Field("name", "string", None),
                      typesys.Field("x", "float64", None)]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unparseable"):
        typesys.parse_msg("float64[3 broken\n", "d/msg/S")


def test_wstring_decodes_utf16_and_keeps_alignment():
    """wstring payloads are UTF-16 code units (2 bytes each, length counted
    in units); decoding them as a narrow string advanced the cursor by n
    instead of 2n and silently misaligned every later field."""
    from bluerov2_dynamics_tpu.data.cdr import CdrWriter
    from bluerov2_dynamics_tpu.data.typesys import TypeStore

    ts = TypeStore()
    ts.register_msg("demo/msg/W", "wstring label\nint32 value\n")
    blob = CdrWriter().wstring("héllo").prim("int32", 42).bytes()
    msg = ts.decode("demo/msg/W", blob)
    assert msg.label == "héllo"
    assert msg.value == 42  # field AFTER the wstring still aligned


def test_idl_brace_inside_string_constant_does_not_corrupt_modules():
    """A '{' inside a const string literal must not desync the module-brace
    scanner (every later struct would register under a wrong path)."""
    from bluerov2_dynamics_tpu.data.typesys import parse_idl

    idl = """
module demo {
  module msg {
    module Weird_Constants {
      const string TEMPLATE = "{x} and { more";
    };
    struct Weird {
      int32 a;
    };
  };
};
"""
    out = parse_idl(idl)
    assert "demo/msg/Weird" in out
    (f,) = out["demo/msg/Weird"]
    assert f.name == "a" and f.kind == "int32"
