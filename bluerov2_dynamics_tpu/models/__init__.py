"""Dynamics model families.

* :mod:`params` — parameter pytrees (von Benzon Table A1 + the reduced set).
* :mod:`fossen` — Fossen 6-DOF physics in three state conventions
  (euler12 thruster-input, euler12 wrench-input, quat13 wrench-input)
  plus the reduced 9-state RHS used by PINc.
* :mod:`thrusters` — T200 static curve, geometry, third-order lag filter.
* :mod:`tether` — lumped-mass tether, vectorized over segments.
* :mod:`koopman` — EDMDc with RBF dictionary (on-device k-means + ridge).
* :mod:`di` — learned linear double-integrator model.
* :mod:`pinc` — physics-informed residual network (flax/optax).
* :mod:`sysid` — differentiable Fossen coefficient identification.
* :mod:`control` — trim / LQR / Koopman-LQR / trajopt / MPC / MPPI.
* :mod:`guidance` — lookahead-based LOS waypoint path following.
* :mod:`estimation` — KF / EKF / UKF / PF / MHE / RTS smoother / Koopman-KF.
"""

from bluerov2_dynamics_tpu.models.params import (  # noqa: F401
    FossenParams,
    ReducedParams,
    ThrusterConfig,
    LagParams,
    fossen_params,
    reduced_params,
    thruster_config,
    lag_params,
)
