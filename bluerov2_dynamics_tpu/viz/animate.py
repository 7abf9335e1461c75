"""Top-view trajectory animations (host-side matplotlib).

One generic N-panel animator replacing the reference's per-script copies
(``animate_xy_true_vs_koopman`` / ``_four`` / ``_five``,
e.g. ``train_tank_brov2_full_comparison.py:120-254``): each trajectory gets
its own panel with a trailing path, current-position dot, heading arrow and
time/depth readout; axes are shared across panels.  Heading is read from
Euler yaw (column 5 of a 12-state trajectory) or derived from the
quaternion block of a 13-state trajectory.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _yaw_of(traj: np.ndarray) -> np.ndarray:
    """Yaw series from a (T, 12) Euler or (T, 13) quaternion trajectory."""
    if traj.shape[1] >= 13:  # quat13: [x,y,z,qw,qx,qy,qz,...]
        qw, qx, qy, qz = traj[:, 3], traj[:, 4], traj[:, 5], traj[:, 6]
        return np.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy**2 + qz**2))
    return traj[:, 5]


def animate_topdown(
    trajs: Dict[str, np.ndarray],
    dt: float,
    save_path: Optional[str] = None,
    title: str = "Top view",
    tail_secs: float = 10.0,
    speed: float = 1.0,
    dpi: int = 120,
    ncols: Optional[int] = None,
):
    """Animate any number of equal-length trajectories, one panel each.

    ``trajs``: ordered mapping name -> (T, >=6) array.  Saves GIF (Pillow)
    or MP4 (ffmpeg) depending on the suffix; shows interactively when
    ``save_path`` is None; falls back to showing if saving fails (same
    contract as the reference helpers).
    """
    import matplotlib
    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    names = list(trajs)
    arrays = [np.asarray(trajs[n]) for n in names]
    T = arrays[0].shape[0]
    assert all(a.shape[0] == T for a in arrays), "trajectories must share length"

    n_panels = len(arrays)
    if ncols is None:
        ncols = min(3, n_panels)
    nrows = -(-n_panels // ncols)

    xs = np.concatenate([a[:, 0] for a in arrays])
    ys = np.concatenate([a[:, 1] for a in arrays])
    pad = lambda lo, hi: 0.10 * max(1e-6, hi - lo)
    xlim = (xs.min() - pad(xs.min(), xs.max()), xs.max() + pad(xs.min(), xs.max()))
    ylim = (ys.min() - pad(ys.min(), ys.max()), ys.max() + pad(ys.min(), ys.max()))
    head_len = 0.1 * max(xs.max() - xs.min(), ys.max() - ys.min(), 1e-6)
    tail = max(1, int(tail_secs / max(dt, 1e-9)))

    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4.7 * ncols, 4.0 * nrows), dpi=dpi,
        constrained_layout=True, squeeze=False,
    )
    fig.suptitle(title)
    flat_axes = axes.ravel()
    for ax in flat_axes[n_panels:]:
        ax.axis("off")

    panels = []
    for i, (name, a) in enumerate(zip(names, arrays)):
        ax = flat_axes[i]
        color = f"C{i}"
        ax.set_aspect("equal", adjustable="box")
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.grid(True, alpha=0.3)
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_title(name)
        (path_line,) = ax.plot([], [], lw=2, alpha=0.9, color=color)
        (dot,) = ax.plot([], [], "o", ms=6, color=color)
        (arrow_line,) = ax.plot([], [], lw=2, color=color)
        text = ax.text(0.02, 0.98, "", transform=ax.transAxes, va="top")
        panels.append((a, _yaw_of(a), path_line, dot, arrow_line, text))

    def update(i):
        out = []
        s = max(0, i - tail)
        for a, yaw, path_line, dot, arrow_line, text in panels:
            path_line.set_data(a[s : i + 1, 0], a[s : i + 1, 1])
            dot.set_data([a[i, 0]], [a[i, 1]])
            x0, y0 = a[i, 0], a[i, 1]
            arrow_line.set_data(
                [x0, x0 + head_len * math.cos(yaw[i])],
                [y0, y0 + head_len * math.sin(yaw[i])],
            )
            text.set_text(f"t = {i * dt:5.2f} s\nz = {a[i, 2]:.2f} m")
            out.extend([path_line, dot, arrow_line, text])
        return tuple(out)

    interval_ms = int(max(1, 1000.0 * dt / max(speed, 1e-6)))
    ani = FuncAnimation(fig, update, frames=T, blit=True, interval=interval_ms)

    if save_path is None:
        plt.show()
    else:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fps = int(round(1.0 / dt * speed))
        try:
            if str(save_path).lower().endswith(".gif"):
                from matplotlib.animation import PillowWriter

                ani.save(save_path, writer=PillowWriter(fps=fps), dpi=dpi)
            else:
                from matplotlib.animation import FFMpegWriter

                ani.save(save_path, writer=FFMpegWriter(fps=fps), dpi=dpi)
            print(f"[ok] Animation saved -> {save_path}")
        except Exception as e:  # pragma: no cover
            print(f"[warn] Could not save animation ({e}). Showing instead.")
            plt.show()
    plt.close(fig)
    return ani
