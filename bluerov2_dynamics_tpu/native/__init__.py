"""Native (C++) host-side components, bound via ctypes.

Currently: batch CDR decoders for rosbag2 ingestion
(:mod:`bluerov2_dynamics_tpu.data.native_cdr`).  Compiled on demand with
the system ``g++``; everything degrades gracefully to the pure-Python
paths when no compiler is available.
"""
