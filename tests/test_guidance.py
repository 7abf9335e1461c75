"""LOS waypoint guidance: geometry, switching, full-plant missions.

TPU-native extension (no reference counterpart — the reference stops at
modeling); the LOS law under test is the standard lookahead steering of
Fossen's Handbook ch. 10.3, pinned here against hand-computed geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bluerov2_dynamics_tpu.models import control, fossen, guidance
from bluerov2_dynamics_tpu.models.params import (
    fossen_params,
    lag_params,
    thruster_config,
)

DT = 0.02


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def test_track_errors_axis_aligned():
    # Path along +x from origin; a point at (2, 0.5) is 2 m along and
    # 0.5 m to the LEFT (+e).
    a, b = jnp.zeros(3), jnp.asarray([10.0, 0.0, 0.0])
    s, e = guidance.track_errors(a, b, jnp.asarray([2.0, 0.5, 0.0]))
    assert np.isclose(float(s), 2.0)
    assert np.isclose(float(e), 0.5)


def test_track_errors_rotated_segment():
    # 45-degree path; the point 1 m perpendicular-right of the midpoint.
    a, b = jnp.zeros(3), jnp.asarray([2.0, 2.0, 0.0])
    mid = jnp.asarray([1.0, 1.0, 0.0])
    right = jnp.asarray([jnp.sin(jnp.pi / 4), -jnp.cos(jnp.pi / 4), 0.0])
    s, e = guidance.track_errors(a, b, mid + right)
    assert np.isclose(float(s), np.sqrt(2.0), atol=1e-6)
    assert np.isclose(float(e), -1.0, atol=1e-6)


def test_los_heading_on_path_points_along_path():
    a, b = jnp.zeros(3), jnp.asarray([0.0, 5.0, 0.0])   # path = +y
    psi = guidance.los_heading(a, b, jnp.asarray([0.0, 1.0, 0.0]), 0.6)
    assert np.isclose(float(psi), np.pi / 2, atol=1e-6)


def test_los_heading_steers_back_toward_path():
    # Left-of-path error -> command right of the path tangent, and the
    # correction angle is exactly atan2(-e, Delta).
    a, b = jnp.zeros(3), jnp.asarray([10.0, 0.0, 0.0])
    e = 1.0
    psi = guidance.los_heading(a, b, jnp.asarray([2.0, e, 0.0]), 0.5)
    assert np.isclose(float(psi), np.arctan2(-e, 0.5), atol=1e-6)
    assert float(psi) < 0.0


def test_make_plan_prepends_start():
    plan = guidance.make_plan([1.0, 2.0, 3.0], [[4.0, 5.0, 6.0]])
    assert plan.waypoints.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(plan.waypoints[0]), [1, 2, 3])


# ---------------------------------------------------------------------------
# Switching on a trivial kinematic plant (fast)
# ---------------------------------------------------------------------------

def _kinematic_mission(wps, steps=900, kappa=0.0, dtype=jnp.float32):
    """Single-integrator 'vehicle': velocity commands pass straight
    through — isolates the guidance/switching logic from the dynamics."""
    plan = guidance.make_plan(jnp.zeros(3, dtype), wps, accept_radius=0.1,
                              lookahead=0.4, cruise_speed=0.5,
                              integral_gain=kappa, dtype=dtype)
    # Plant: x,y advance along psi at the commanded surge, z and psi are
    # first-order servos.  With u = -K err, K=+1 rows make each channel
    # a stabilizing servo on its reference (x[6] stays 0, so
    # u0 = -(0 - u_d) = u_d exactly).
    K = jnp.zeros((8, 12), dtype)
    K = K.at[0, 6].set(1.0)       # u0 = commanded surge
    K = K.at[1, 5].set(1.0)       # u1 = psi servo
    K = K.at[2, 2].set(1.0)       # u2 = z servo
    pol = control.LQRPolicy(K=K, z_ref=jnp.zeros(12, dtype),
                            u_eq=jnp.zeros(8, dtype), u_lo=-2.0, u_hi=2.0)

    def plant(x, u):
        psi = x[5] + 2.0 * u[1] * DT
        return (x.at[0].add(u[0] * jnp.cos(psi) * DT)
                 .at[1].add(u[0] * jnp.sin(psi) * DT)
                 .at[2].add(2.0 * u[2] * DT)
                 .at[5].set(psi))

    res = guidance.simulate_los_mission(plant, pol, plan,
                                        jnp.zeros(12, dtype), steps)
    return res, plan


def test_kinematic_mission_hits_all_waypoints():
    wps = [[2.0, 0.0, 0.2], [2.0, 2.0, 0.4], [0.0, 2.0, 0.1]]
    res, plan = _kinematic_mission(wps)
    s = guidance.mission_summary(res, plan)
    assert s["all_hit"], s
    # Depth reference interpolates: z visited both intermediate depths.
    z = np.asarray(res.X[:, 2])
    assert z.max() > 0.3
    assert s["final_pos_err"] < 0.2


def test_wp_index_monotone_and_saturates():
    wps = [[2.0, 0.0, 0.0], [2.0, 2.0, 0.0], [0.0, 2.0, 0.0]]
    res, plan = _kinematic_mission(wps, steps=1500)
    idx = np.asarray(res.wp_index)
    assert (np.diff(idx) >= 0).all()
    assert idx[0] == 1
    assert idx[-1] == plan.waypoints.shape[0]   # hold = n_seg + 1


def test_cross_track_converges_from_offset_start():
    # The PLAN's path runs (0,0) -> (6,0) but the VEHICLE starts 1 m
    # left of it at (0,1): |e| must shrink and stay small once captured.
    dtype = jnp.float32
    plan = guidance.make_plan([0.0, 0.0, 0.0], [[6.0, 0.0, 0.0]],
                              accept_radius=0.1, lookahead=0.5,
                              cruise_speed=0.5, dtype=dtype)
    K = jnp.zeros((8, 12), dtype).at[0, 6].set(1.0).at[1, 5].set(1.0)
    pol = control.LQRPolicy(K=K, z_ref=jnp.zeros(12, dtype),
                            u_eq=jnp.zeros(8, dtype), u_lo=-2.0, u_hi=2.0)

    def plant(x, u):
        psi = x[5] + 2.0 * u[1] * DT
        return (x.at[0].add(u[0] * jnp.cos(psi) * DT)
                 .at[1].add(u[0] * jnp.sin(psi) * DT)
                 .at[5].set(psi))

    x0 = jnp.zeros(12, dtype).at[1].set(1.0)
    res = guidance.simulate_los_mission(plant, pol, plan, x0, 700)
    ct = np.abs(np.asarray(res.cross_track))
    assert ct[0] > 0.9
    captured = np.argmax(ct < 0.05)
    assert 0 < captured < 500
    assert (ct[captured:captured + 100] < 0.15).all()


# ---------------------------------------------------------------------------
# Full nonlinear lag plant (explicit f32 per the repo's f32 rule)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def full_plant():
    p = fossen_params()
    cfg = thruster_config()
    plant = fossen.make_thruster_step(p, cfg, lag_params(DT), DT, "euler")
    pol = control.fossen_lqr(p, cfg, DT)
    return plant, pol


def test_full_plant_square_mission_f32(full_plant):
    plant, pol = full_plant
    wps = [[1.5, 0.0, 0.3], [1.5, 1.5, 0.5], [0.0, 1.5, 0.2],
           [0.0, 0.0, 0.0]]
    plan = guidance.make_plan([0, 0, 0], wps, accept_radius=0.15,
                              lookahead=0.6, cruise_speed=0.25)
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))
    res = guidance.simulate_los_mission(plant, pol, plan, carry0, 4000,
                                        get_state=lambda c: c[0])
    assert res.X.dtype == jnp.float32
    s = guidance.mission_summary(res, plan)
    assert s["all_hit"], s
    assert (s["min_dist"] < 0.15).all()
    # Station keeping at the final waypoint (hold mode, rotated xy
    # feedback at the final-segment heading 3*pi/2).
    assert s["final_pos_err"] < 0.02
    assert s["cross_track_rms"] < 0.15
    # Hit ordering follows the waypoint order (wp4 == start, whose
    # step-0 "hit" is a geometric artifact — exclude it).
    hits = s["hit_step"][:3]
    assert (np.diff(hits) > 0).all()


def _current_mission(kappa, steps=1500, cur=0.25, dtype=jnp.float32):
    """Kinematic vehicle in a constant +y cross current, straight +x
    path: isolates the ILOS claim from the dynamics."""
    plan = guidance.make_plan([0.0, 0.0, 0.0], [[30.0, 0.0, 0.0]],
                              accept_radius=0.1, lookahead=0.5,
                              cruise_speed=0.5, integral_gain=kappa,
                              dtype=dtype)
    K = jnp.zeros((8, 12), dtype).at[0, 6].set(1.0).at[1, 5].set(1.0)
    pol = control.LQRPolicy(K=K, z_ref=jnp.zeros(12, dtype),
                            u_eq=jnp.zeros(8, dtype), u_lo=-2.0, u_hi=2.0)

    def plant(x, u):
        psi = x[5] + 2.0 * u[1] * DT
        return (x.at[0].add(u[0] * jnp.cos(psi) * DT)
                 .at[1].add((u[0] * jnp.sin(psi) + cur) * DT)
                 .at[5].set(psi))

    return guidance.simulate_los_mission(plant, pol, plan,
                                         jnp.zeros(12, dtype), steps, dt=DT)


def test_ilos_rejects_current_offset_kinematic():
    # Plain LOS under a cross current settles at the well-known
    # steady-state cross-track offset e_ss = Delta * v_cur / u_along
    # (the crab-angle correction is only produced BY an error); ILOS
    # integrates it away.
    tail = slice(-400, None)
    e_plain = np.asarray(_current_mission(0.0).cross_track)[tail]
    e_ilos = np.asarray(_current_mission(0.5).cross_track)[tail]
    assert abs(e_plain.mean()) > 0.15        # ~0.25 m predicted offset
    assert abs(e_ilos.mean()) < 0.02
    assert np.abs(e_ilos).max() < 0.05


def test_ilos_noop_without_current():
    # kappa > 0 must not degrade the no-current multi-waypoint mission
    # (the integrator resets at every switch).
    wps = [[2.0, 0.0, 0.2], [2.0, 2.0, 0.4], [0.0, 2.0, 0.1]]
    res0, plan0 = _kinematic_mission(wps)
    res1, plan1 = _kinematic_mission(wps, kappa=0.4)
    s0 = guidance.mission_summary(res0, plan0)
    s1 = guidance.mission_summary(res1, plan1)
    assert s0["all_hit"] and s1["all_hit"]
    assert s1["cross_track_rms"] < s0["cross_track_rms"] + 0.05


def test_ilos_full_plant_cross_current_f32(full_plant):
    """BlueROV2 in a 0.08 m/s cross current: plain LOS tracks the
    straight path with a steady cross-track offset (0.036 m measured —
    smaller than the kinematic prediction 0.19 m because the LQR's
    sway-damping rows already crab partially into the current); ILOS
    removes it (24x measured at kappa=0.4)."""
    _, pol = full_plant
    p = fossen_params(current=(0.0, 0.08, 0.0))
    cfg = thruster_config()
    plant = fossen.make_thruster_step(p, cfg, lag_params(DT), DT, "euler")
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))

    def fly(kappa):
        plan = guidance.make_plan([0, 0, 0], [[10.0, 0.0, 0.0]],
                                  accept_radius=0.1, lookahead=0.6,
                                  cruise_speed=0.25, integral_gain=kappa)
        return guidance.simulate_los_mission(
            plant, pol, plan, carry0, 1600, get_state=lambda c: c[0],
            dt=DT)

    tail = slice(-500, None)
    e_plain = np.asarray(fly(0.0).cross_track)[tail]
    e_ilos = np.asarray(fly(0.4).cross_track)[tail]
    assert abs(e_plain.mean()) > 0.02
    assert abs(e_ilos.mean()) < 0.005
    assert abs(e_ilos.mean()) < 0.1 * abs(e_plain.mean())


def test_fleet_vmap_matches_single(full_plant):
    """A fleet of vehicles on different missions is just vmap — batched
    results match per-vehicle runs exactly."""
    plant, pol = full_plant
    base = np.asarray([[1.0, 0.0, 0.2], [1.0, 1.0, 0.3]], np.float32)
    offsets = np.asarray([0.0, 0.3, -0.2], np.float32)
    plans = [guidance.make_plan([0, 0, 0], base + o, accept_radius=0.15,
                                lookahead=0.6, cruise_speed=0.25)
             for o in offsets]
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))

    def fly(plan):
        return guidance.simulate_los_mission(
            plant, pol, plan, carry0, 1200, get_state=lambda c: c[0])

    batched_plan = jax.tree.map(lambda *ls: jnp.stack(ls), *plans)
    res_b = jax.vmap(fly)(batched_plan)
    for i, plan in enumerate(plans):
        res_i = fly(plan)
        np.testing.assert_allclose(np.asarray(res_b.X[i]),
                                   np.asarray(res_i.X), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res_b.wp_index[i]),
                                      np.asarray(res_i.wp_index))
        s = guidance.mission_summary(
            guidance.MissionResult(*[x[i] for x in res_b]), plan)
        assert s["all_hit"], (i, s)
