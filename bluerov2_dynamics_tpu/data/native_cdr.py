"""ctypes binding for the native batch CDR decoders.

Compiles ``native/cdr_decode.cpp`` on first use with the system ``g++``
(cached next to the source; rebuilt when the source changes) and exposes
batch decoders operating on lists of message blobs.  Falls back cleanly —
callers should catch :class:`NativeUnavailable` and use the pure-Python
decoders in :mod:`cdr`.

Parity with the Python decoders is tested in tests/test_native_cdr.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "cdr_decode.cpp"
_LIB = _SRC.with_name("libcdrdecode.so")
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, text=True,
        )
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise NativeUnavailable(f"could not build cdr_decode: {detail}") from e
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build()))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.decode_odometry_batch.restype = ctypes.c_int64
    lib.decode_odometry_batch.argtypes = [u8p, i64p, ctypes.c_int64, f64p, i8p]
    lib.decode_actuator_motors_batch.restype = ctypes.c_int64
    lib.decode_actuator_motors_batch.argtypes = [u8p, i64p, ctypes.c_int64, f32p]
    lib.decode_vehicle_odometry_batch.restype = ctypes.c_int64
    lib.decode_vehicle_odometry_batch.argtypes = [u8p, i64p, ctypes.c_int64, f32p]
    _lib = lib
    return lib


def _pack(blobs: List[bytes]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = np.frombuffer(b"".join(blobs), np.uint8)
    return data, offsets


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_odometry_batch(blobs: List[bytes]):
    """-> ``(fields (N, 13) float64, body_flags (N,) int8)``.

    Field columns: pos(3), quat xyzw(4), linear twist(3), angular twist(3).
    Raises ValueError if any blob is malformed.
    """
    lib = _load()
    data, offsets = _pack(blobs)
    n = len(blobs)
    out = np.empty((n, 13), np.float64)
    flags = np.zeros(n, np.int8)
    done = lib.decode_odometry_batch(
        _ptr(data, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64), n,
        _ptr(out, ctypes.c_double), _ptr(flags, ctypes.c_int8),
    )
    if done != n:
        raise ValueError(f"malformed Odometry blob at index {done}")
    return out, flags


def decode_actuator_motors_batch(blobs: List[bytes]) -> np.ndarray:
    """-> ``(N, 8) float32`` of the first eight control channels."""
    lib = _load()
    data, offsets = _pack(blobs)
    n = len(blobs)
    out = np.empty((n, 8), np.float32)
    done = lib.decode_actuator_motors_batch(
        _ptr(data, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64), n,
        _ptr(out, ctypes.c_float),
    )
    if done != n:
        raise ValueError(f"malformed ActuatorMotors blob at index {done}")
    return out


def decode_vehicle_odometry_batch(blobs: List[bytes]) -> np.ndarray:
    """-> ``(N, 13) float32``: pos(3), q wxyz(4), velocity(3), angvel(3)."""
    lib = _load()
    data, offsets = _pack(blobs)
    n = len(blobs)
    out = np.empty((n, 13), np.float32)
    done = lib.decode_vehicle_odometry_batch(
        _ptr(data, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64), n,
        _ptr(out, ctypes.c_float),
    )
    if done != n:
        raise ValueError(f"malformed VehicleOdometry blob at index {done}")
    return out


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False
