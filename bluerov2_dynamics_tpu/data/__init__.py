"""Host-side data pipeline.

CSV/rosbag decoding is inherently host work; the CSV column contract is the
boundary between host and device (SURVEY.md §7).  Sub-modules:

* :mod:`csv_loader` — dataset loaders for the three column contracts
  (thruster u1..u8, wrench Fx..Mz, quaternion state).
* :mod:`synthetic` — simulated-dataset generation (AR(1) thruster noise).
* :mod:`wrench` — effectiveness-matrix wrench augmentation of thruster CSVs.
* :mod:`sanity` — kinematic-consistency dataset checks.
* :mod:`t200` — T200 thrust-curve polynomial fitting from bench-test tables.
* :mod:`xlsx` — dependency-free .xlsx sheet reader (stdlib zip + XML).
* :mod:`bag2csv` — rosbag2 -> 50 Hz CSV ingestion (uses the optional
  ``rosbags`` package when present, otherwise the built-in sqlite3+CDR
  reader in :mod:`bag_sqlite`/:mod:`cdr`).
* :mod:`typesys` — dependency-free ``.msg``/``.idl`` type definitions ->
  generic schema-driven CDR decoding (the reference's custom-type
  registration, ``rosbags/bag2csv.py:74-97``).
* :mod:`bagmeta` — stdlib rosbag2 ``metadata.yaml`` reader; validates the
  configured topics/types against the REAL tank recordings' metadata
  (the payload-free ground truth surviving the LFS stubs).
"""

from bluerov2_dynamics_tpu.data.csv_loader import (  # noqa: F401
    find_project_root,
    find_latest_csv,
    load_thruster_dataset,
    load_wrench_dataset,
    load_quat_dataset,
)
