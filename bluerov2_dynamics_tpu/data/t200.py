"""T200 thrust-curve polynomial fitting from bench-test tables.

Rebuild of ``/root/reference/rosbags/T200/T200_fit_polynomial.py``: fit
separate forward/reverse 5th-order thrust-magnitude polynomials (Newtons,
ascending-coefficient "gz plugin" format) from Blue Robotics public
performance data (PWM in [1100, 1900] us normalized to u = (PWM-1500)/400).

The xlsx reader is gated (``openpyxl`` optional); the fitting core takes
plain arrays so it is testable without the spreadsheet.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

MIN_PWM = 1100.0
MAX_PWM = 1900.0
MID_PWM = 0.5 * (MIN_PWM + MAX_PWM)
HALF_RANGE = 0.5 * (MAX_PWM - MIN_PWM)
POLY_DEG = 5
G0 = 9.80665  # kgf -> N


class ThrustFit(NamedTuple):
    pos_coeff: np.ndarray  # ascending powers, forward magnitude [N]
    neg_coeff: np.ndarray  # ascending powers, reverse magnitude [N]


def pwm_to_u(pwm):
    """Normalize PWM to u = (pwm - 1500) / 400 in [-1, 1]."""
    return (np.asarray(pwm, float) - MID_PWM) / HALF_RANGE


def eval_poly_asc(coeff_asc, u):
    """Horner evaluation of ascending-coefficient polynomials."""
    u = np.asarray(u, float)
    y = np.zeros_like(u)
    for a in np.asarray(coeff_asc)[::-1]:
        y = y * u + a
    return y


def eval_piecewise(fit: ThrustFit, u):
    """Signed thrust [N]: +pos(|u|) for u>=0, -neg(|u|) for u<0."""
    u = np.asarray(u, float)
    return np.where(
        u >= 0, eval_poly_asc(fit.pos_coeff, u), -eval_poly_asc(fit.neg_coeff, -u)
    )


def fit_forward_reverse(pwm, thrust_kgf, deg: int = POLY_DEG) -> ThrustFit:
    """Fit forward/reverse magnitude polynomials in Newtons."""
    pwm = np.asarray(pwm, float)
    thrust_kgf = np.asarray(thrust_kgf, float)
    u = pwm_to_u(pwm)

    def clean(x, y):
        m = np.isfinite(x) & np.isfinite(y)
        return x[m], y[m]

    u_pos, t_pos = clean(u[u >= 0], thrust_kgf[u >= 0])
    u_neg, t_neg = clean(-u[u <= 0], -thrust_kgf[u <= 0])
    pos = np.polyfit(u_pos, t_pos * G0, deg)[::-1]
    neg = np.polyfit(u_neg, t_neg * G0, deg)[::-1]
    return ThrustFit(pos_coeff=pos, neg_coeff=neg)


def fit_from_xlsx(
    xlsx_path,
    voltages: Tuple[int, ...] = (16, 18, 20),
    plot_dir: Optional[str] = None,
):
    """Fit polynomials per supply-voltage sheet of the Blue Robotics xlsx.

    Returns ``{voltage: ThrustFit}``.  Sheet/column discovery follows the
    reference's fuzzy matching (``T200_fit_polynomial.py:36-100``).
    """
    import pandas as pd

    from bluerov2_dynamics_tpu.utils.log import info, ok

    xls = pd.ExcelFile(xlsx_path)
    results = {}
    for V in voltages:
        sheet = _find_sheet(xls.sheet_names, V)
        df = pd.read_excel(xlsx_path, sheet_name=sheet).dropna(how="all")
        pwm_col, thrust_col = _guess_columns(df)
        info(f"{V}V sheet={sheet!r} pwm_col={pwm_col!r} thrust_col={thrust_col!r}")
        pwm = pd.to_numeric(df[pwm_col], errors="coerce").to_numpy(float)
        kgf = pd.to_numeric(df[thrust_col], errors="coerce").to_numpy(float)
        m = np.isfinite(pwm) & np.isfinite(kgf) & (pwm >= MIN_PWM) & (pwm <= MAX_PWM)
        fit = fit_forward_reverse(pwm[m], kgf[m])
        ok(f"{V}V positiveThrustPolynomial = {list(fit.pos_coeff)}")
        ok(f"{V}V negativeThrustPolynomial = {list(fit.neg_coeff)}")
        results[V] = fit
        if plot_dir is not None:
            _plot_fit(fit, pwm[m], kgf[m], V, plot_dir)
    return results


def _find_sheet(names, voltage: int) -> str:
    v = str(voltage)
    for key in (f"{v}V", f"{v} V", f"{v}v", f"{v} v"):
        for n in names:
            if n.strip().lower() == key.strip().lower():
                return n
    for n in names:
        s = n.strip().lower().replace(" ", "")
        if v in s and "v" in s:
            return n
    raise ValueError(f"Could not find a {v}V sheet. Available: {names}")


def _guess_columns(df) -> Tuple[str, str]:
    import pandas as pd  # noqa: F401

    def norm(s: str) -> str:
        s = s.strip().lower().replace("µ", "u")
        s = s.replace("(", " ").replace(")", " ")
        return "".join(s.split())

    cols = list(df.columns)
    ncols = [norm(str(c)) for c in cols]

    def find(pred):
        for c, nc in zip(cols, ncols):
            if pred(nc):
                return c
        return None

    pwm_col = find(lambda s: "pwm" in s and "us" in s) or find(lambda s: "pwm" in s)
    if pwm_col is None:
        raise ValueError(f"Could not identify PWM column. Columns: {cols}")
    thrust_col = (
        find(lambda s: ("force" in s or "thrust" in s) and "kgf" in s)
        or find(lambda s: "kgf" in s)
        or find(lambda s: "thrust" in s)
        or find(lambda s: "force" in s)
    )
    if thrust_col is None:
        raise ValueError(f"Could not identify thrust column. Columns: {cols}")
    return pwm_col, thrust_col


def _plot_fit(fit: ThrustFit, pwm, kgf, voltage: int, plot_dir):
    from pathlib import Path

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = np.linspace(MIN_PWM, MAX_PWM, 801)
    y_kgf = eval_piecewise(fit, pwm_to_u(grid)) / G0
    fig, ax = plt.subplots()
    ax.scatter(pwm, kgf, s=18, label="measured")
    ax.plot(grid, y_kgf, lw=2, color="C2", label="fit")
    ax.set_xlabel("PWM (µs)")
    ax.set_ylabel("Thrust (kgf)")
    ax.set_title(f"T200 thrust fit @ {voltage}V")
    ax.grid(True)
    ax.legend()
    out = Path(plot_dir) / f"T200_{voltage}V_thrust_polynomial_fit.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out
