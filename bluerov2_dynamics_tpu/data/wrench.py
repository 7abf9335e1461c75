"""Wrench augmentation of thruster-command CSVs.

Rebuild of ``/root/reference/rosbags/create_thrust_torque_csv.py``: the
normalized body wrench ``W = (E U^T)^T`` from the 6x8 effectiveness matrix
``E = [a ; r x a]`` of the BlueROV2-heavy rotor table (axes normalized),
appended as wrench columns while the ``u1..u8`` columns are dropped.

Column-naming note (SURVEY.md R2): the reference writes ``Fx_sp..Tz_sp``
(``create_thrust_torque_csv.py:89-94``) but its own wrench training
scripts expect ``Fx..Mz`` and silently zero-fill the missing names
(``train_tank_brov2_wrench_comp.py:177-186``) — a real pipeline
inconsistency.  We resolve it deliberately: default output names are the
consumable ``Fx..Mz``; pass ``setpoint_names=True`` for byte-compatible
``*_sp`` columns.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

# BlueROV2-heavy rotor table used for the recorded vehicle (differs from the
# von Benzon simulator geometry in models/params.py — both kept as data).
# (axis, position) per rotor, reference create_thrust_torque_csv.py:37-47.
ROTOR_TABLE: List[Tuple[Tuple[float, float, float], Tuple[float, float, float]]] = [
    ((1.0, -1.0, 0.0), (0.14, 0.10, 0.06)),
    ((1.0, 1.0, 0.0), (0.14, -0.10, 0.06)),
    ((1.0, 1.0, 0.0), (-0.14, 0.10, 0.06)),
    ((1.0, -1.0, 0.0), (-0.14, -0.10, 0.06)),
    ((0.0, 0.0, -1.0), (0.12, 0.22, 0.00)),
    ((0.0, 0.0, 1.0), (0.12, -0.22, 0.00)),
    ((0.0, 0.0, 1.0), (-0.12, 0.22, 0.00)),
    ((0.0, 0.0, -1.0), (-0.12, -0.22, 0.00)),
]


def effectiveness_matrix(rotors=None, normalize_axes: bool = True) -> np.ndarray:
    """6x8 matrix mapping per-rotor normalized thrust to body wrench."""
    rotors = rotors if rotors is not None else ROTOR_TABLE
    E = np.zeros((6, len(rotors)))
    for i, (axis, pos) in enumerate(rotors):
        a = np.asarray(axis, float)
        if normalize_axes:
            n = np.linalg.norm(a)
            if n > 0:
                a = a / n
        r = np.asarray(pos, float)
        E[0:3, i] = a
        E[3:6, i] = np.cross(r, a)
    return E


def thrusters_to_wrench(U: np.ndarray, rotors=None) -> np.ndarray:
    """(N, 8) normalized commands -> (N, 6) normalized body wrench."""
    return U @ effectiveness_matrix(rotors).T


def augment_csv(
    in_path,
    out_path=None,
    setpoint_names: bool = False,
    drop_inputs: bool = True,
):
    """Read a thruster CSV, append wrench columns, write ``out_path``.

    Returns the output path.  Actuator columns are ``u1..u8`` if present,
    else the last eight numeric columns (reference fallback,
    ``create_thrust_torque_csv.py:66-73``).
    """
    from pathlib import Path

    from bluerov2_dynamics_tpu.utils.log import info, warn

    in_path = Path(in_path)
    out_path = Path(out_path) if out_path else in_path.with_name(
        in_path.stem + "_with_wrench.csv"
    )
    df = pd.read_csv(in_path)
    u_cols = [f"u{i}" for i in range(1, 9)]
    if not all(c in df.columns for c in u_cols):
        numeric = [c for c in df.columns if pd.api.types.is_numeric_dtype(df[c])]
        if len(numeric) < 8:
            raise ValueError("Could not find 8 actuator columns.")
        u_cols = numeric[-8:]
    info("Using actuator columns:", u_cols)

    U = df[u_cols].to_numpy(float)
    if np.nanmax(np.abs(U)) > 1.05:
        warn("actuator values exceed ~[-1,1]. Proceeding anyway.")
    W = thrusters_to_wrench(U)

    out = df.drop(columns=u_cols) if drop_inputs else df.copy()
    names = (
        ["Fx_sp", "Fy_sp", "Fz_sp", "Tx_sp", "Ty_sp", "Tz_sp"]
        if setpoint_names
        else ["Fx", "Fy", "Fz", "Mx", "My", "Mz"]
    )
    for j, name in enumerate(names):
        out[name] = W[:, j]
    out.to_csv(out_path, index=False)
    info("Wrote:", out_path)
    return out_path
