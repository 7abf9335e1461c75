"""Runnable workload entry points (the reference's six training scripts).

Each app is a thin CLI over the library:

* :mod:`sim_koopman` — simulated-data Koopman identification (T1).
* :mod:`tank_koopman` — tank-recording Koopman identification (T2).
* :mod:`tank_wrench_comp` — wrench-input 3-model comparison (T3).
* :mod:`tank_wrench_quat` — quaternion-state 3-model comparison (T4).
* :mod:`tank_rk4` — RK4-integrator 4-model comparison with timings (T5).
* :mod:`tank_full_comparison` — flagship 4-model comparison (T6).

All tank apps accept ``--synthetic`` to run on generated data when no
recording is available.  Run as ``python -m bluerov2_dynamics_tpu.apps.<name>``.
"""
