"""RK4 workload (T5): the four-model comparison with RK4 integration and
per-model fit/rollout timings + a static 2D figure.

Rebuild of ``/root/reference/training/train_tank_brov2_rk4.py`` — a thin
parameterization of the flagship comparison with the physics and DI models
integrated by classic RK4 (``train_tank_brov2_rk4.py:375-396, 497-525``).
"""

from __future__ import annotations

from bluerov2_dynamics_tpu.apps import tank_full_comparison


def main(argv=None):
    argv = list(argv) if argv is not None else None
    extra = ["--integrator", "rk4"]
    if argv is None:
        import sys

        argv = sys.argv[1:]
    has_prefix = any(
        a == "--media-prefix" or a.startswith("--media-prefix=") for a in argv
    )
    if not has_prefix:
        extra += ["--media-prefix", "rk4_"]
    return tank_full_comparison.main(argv + extra)


if __name__ == "__main__":
    main()
