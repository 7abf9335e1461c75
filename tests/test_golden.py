"""Golden-value regression tests.

Pin exact float64 trajectory endpoints (generated at round 1) so future
refactors cannot silently change the numerics of the physics step,
integrators, thruster path or lag filter.  Tolerances are tight (1e-12
relative) — any intentional numerics change must regenerate these values
and say so in the commit message.
"""

import numpy as np
import jax.numpy as jnp

from bluerov2_dynamics_tpu.models import fossen
from bluerov2_dynamics_tpu.models.params import fossen_params, lag_params, thruster_config

DT = 0.02

GOLDEN_EULER = np.array([
    -0.07120831871319724, -0.04016405894029672, 2.92526139536095,
    0.6117304052510589, -0.12284017337066262, -0.05362508411281489,
    -0.03802755052492129, -0.11446567935371363, 0.00840881351403827,
    0.45369113069258726, 0.7536951128124625, -0.4463713903050154,
])
GOLDEN_RK4 = np.array([
    -0.07184451356813044, -0.04083033390351435, 2.9242304849682643,
    0.6039792120886611, -0.11505489533951883, -0.0530688062977409,
    -0.03861620038380504, -0.11415036954912118, 0.00666871154276824,
    0.485533791121365, 0.7303268857960921, -0.45135734390494203,
])
GOLDEN_QUAT = np.array([
    0.00622690863616366, 0.00918973978997987, 0.05277061622261253,
    0.9921197974846899, -0.00768659653370065, -0.09003646499732948,
    0.08679089032525775, -0.00375564735243391, -0.00834393913453623,
    0.03223735789917839, 0.4330491294959904, 0.10831605167585497,
    0.3766900057865868,
])


def _inputs():
    rng = np.random.default_rng(1234)
    U8 = jnp.asarray(np.clip(rng.normal(size=(100, 8)) * 0.4, -1, 1))
    TAU = jnp.asarray(rng.normal(size=(100, 6)) * 3.0)
    return U8, TAU


def test_golden_thruster_euler_and_rk4():
    p = fossen_params(dtype=jnp.float64)
    cfg = thruster_config(dtype=jnp.float64)
    lag = lag_params(DT, dtype=jnp.float64)
    x0 = jnp.zeros(12, jnp.float64).at[2].set(3.0)
    U8, _ = _inputs()
    tr_e = fossen.simulate_thruster(p, cfg, lag, x0, U8, DT, method="euler")
    tr_r = fossen.simulate_thruster(p, cfg, lag, x0, U8, DT, method="rk4")
    np.testing.assert_allclose(np.asarray(tr_e[-1]), GOLDEN_EULER, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tr_r[-1]), GOLDEN_RK4, rtol=1e-12)


def test_golden_quat_wrench_rk4():
    p = fossen_params(dtype=jnp.float64)
    x0 = jnp.zeros(13, jnp.float64).at[3].set(1.0)
    _, TAU = _inputs()
    tr = fossen.simulate_wrench(p, x0, TAU, DT, method="rk4", state="quat13")
    np.testing.assert_allclose(np.asarray(tr[-1]), GOLDEN_QUAT, rtol=1e-12)
