"""Waypoint guidance: lookahead-based line-of-sight (LOS) path following.

TPU-native extension — the reference stops at modeling (no guidance or
control anywhere in `/root/reference`; see `/root/reference/README.md:1-22`).
This module adds the classic marine-craft guidance loop on top of
``models/control.py``'s inner-loop controllers: a waypoint list is
followed by steering the vehicle's HEADING at a cruise surge speed
(Fossen's lookahead-based LOS steering law), with depth interpolated
along each path segment, and a station-keeping hold at the final
waypoint.

Design (TPU-first):

* The whole mission is ONE ``lax.scan``: the active-waypoint index is an
  ``int32`` carried through the scan and advanced with ``jnp.where``
  masks (acceptance-circle hit OR along-track overrun) — no
  data-dependent Python control flow, so the program compiles once for
  any number of waypoints.
* Guidance is pure geometry on ``(..., 3)`` arrays — it broadcasts over
  leading batch dims, so a FLEET of vehicles flying different missions
  is just ``jax.vmap(simulate_los_mission, ...)`` (tested).
* The inner loop reuses the hover :class:`~...control.LQRPolicy` gain:
  in transit the x/y position errors are masked out (guidance owns the
  plane; the LQR tracks ``psi_d``/``u_d``/``z_d``), which makes the
  hover linearization heading-invariant; in hold the horizontal
  position error is rotated into the heading-aligned frame before the
  gain (station keeping at arbitrary final heading).

The LOS law is the standard lookahead steering of Fossen's *Handbook of
Marine Craft Hydrodynamics and Motion Control* ch. 10.3 (public-domain
math; no reference-repo counterpart exists):

``psi_d = pi_p + atan2(-e, Delta)``

with ``pi_p`` the path-tangential angle of the active segment, ``e``
the cross-track error and ``Delta`` the lookahead distance.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.ops.rotations import ssa


# ---------------------------------------------------------------------------
# LOS geometry (pure, batch-broadcasting)
# ---------------------------------------------------------------------------

def path_tangential_angle(wp_a, wp_b):
    """Azimuth ``pi_p`` of the segment ``a -> b`` in the horizontal plane."""
    d = jnp.asarray(wp_b)[..., :2] - jnp.asarray(wp_a)[..., :2]
    return jnp.arctan2(d[..., 1], d[..., 0])


def track_errors(wp_a, wp_b, pos):
    """Along-track / cross-track errors of ``pos`` w.r.t. segment ``a -> b``.

    Returns ``(s, e)``: ``s`` is the distance travelled along the
    segment from ``a`` (projection on the path tangent), ``e`` the
    signed cross-track error (positive to the LEFT of the path when
    looking from ``a`` to ``b``, i.e. ``e = -dx sin(pi_p) + dy cos(pi_p)``).
    """
    wp_a = jnp.asarray(wp_a)
    pi_p = path_tangential_angle(wp_a, wp_b)
    c, s_ = jnp.cos(pi_p), jnp.sin(pi_p)
    dx = jnp.asarray(pos)[..., 0] - wp_a[..., 0]
    dy = jnp.asarray(pos)[..., 1] - wp_a[..., 1]
    return c * dx + s_ * dy, -s_ * dx + c * dy


def los_heading(wp_a, wp_b, pos, lookahead):
    """Lookahead-based LOS heading command for segment ``a -> b``.

    ``psi_d = pi_p + atan2(-e, Delta)``: zero cross-track error steers
    along the path; a positive (left-of-path) error steers right, back
    toward the path, converging over ~``lookahead`` metres.
    """
    pi_p = path_tangential_angle(wp_a, wp_b)
    _, e = track_errors(wp_a, wp_b, pos)
    return ssa(pi_p + jnp.arctan2(-e, lookahead))


# ---------------------------------------------------------------------------
# Mission plan + closed-loop simulation
# ---------------------------------------------------------------------------

class WaypointPlan(NamedTuple):
    """A waypoint mission.  ``waypoints[0]`` is the START position (the
    first active segment is ``waypoints[0] -> waypoints[1]``); build
    with :func:`make_plan`."""

    waypoints: jnp.ndarray   # (N+1, 3) NED positions incl. start row
    accept_radius: jnp.ndarray   # scalar: horizontal acceptance circle
    lookahead: jnp.ndarray       # scalar: LOS lookahead distance [m]
    cruise_speed: jnp.ndarray    # scalar: desired surge u_d in transit
    integral_gain: jnp.ndarray   # scalar kappa: 0 = plain LOS, >0 = ILOS


def make_plan(start_pos, waypoints, accept_radius=0.15, lookahead=0.6,
              cruise_speed=0.25, integral_gain=0.0, dtype=jnp.float32):
    """Build a :class:`WaypointPlan` from a start position and an
    ``(N, 3)`` waypoint array (NED; ``N >= 1``).

    ``integral_gain`` (kappa) > 0 enables INTEGRAL LOS (ILOS,
    Borhaug/Kaasa/Pettersen 2008): under a constant ocean current the
    plain LOS law settles with a steady-state cross-track offset (the
    heading correction needed to crab into the current is only produced
    BY an error); ILOS integrates the cross-track error and steers on
    ``e + kappa * e_int``, driving the offset to zero.  The integrator
    state is carried through the mission scan and reset at each
    waypoint switch.
    """
    start = jnp.asarray(start_pos, dtype).reshape(3)
    wps = jnp.asarray(waypoints, dtype).reshape(-1, 3)
    return WaypointPlan(
        waypoints=jnp.concatenate([start[None], wps], axis=0),
        accept_radius=jnp.asarray(accept_radius, dtype),
        lookahead=jnp.asarray(lookahead, dtype),
        cruise_speed=jnp.asarray(cruise_speed, dtype),
        integral_gain=jnp.asarray(integral_gain, dtype),
    )


def _advance_index(plan: WaypointPlan, pos, idx):
    """Waypoint-switching logic: advance ``idx`` (int32) past the active
    target when inside its acceptance circle OR past the segment end
    (along-track overrun), saturating at ``n_wp`` = "hold"."""
    n_seg = plan.waypoints.shape[0] - 1           # segments 1..n_seg
    seg = jnp.minimum(idx, n_seg)
    a = plan.waypoints[seg - 1]
    b = plan.waypoints[seg]
    s, _ = track_errors(a, b, pos)
    seg_len = jnp.linalg.norm(b[:2] - a[:2])
    hit = jnp.linalg.norm(pos[:2] - b[:2]) < plan.accept_radius
    overrun = s > seg_len
    return jnp.minimum(idx + jnp.where(hit | overrun, 1, 0), n_seg + 1)


def _references(plan: WaypointPlan, x, idx, e_int):
    """Reference state + error mask for the inner-loop gain at waypoint
    index ``idx`` (``idx > n_seg`` = hold at the final waypoint).
    ``e_int`` is the ILOS cross-track integrator (steers on
    ``e + kappa * e_int``; a no-op at ``integral_gain = 0``)."""
    dtype = plan.waypoints.dtype
    n_seg = plan.waypoints.shape[0] - 1
    hold = idx > n_seg
    seg = jnp.minimum(idx, n_seg)
    a = plan.waypoints[seg - 1]
    b = plan.waypoints[seg]
    pos = x[:3]

    pi_p = path_tangential_angle(a, b)
    s, e = track_errors(a, b, pos)
    e_eff = e + plan.integral_gain * e_int
    psi_los = ssa(pi_p + jnp.arctan2(-e_eff, plan.lookahead))
    seg_len = jnp.maximum(jnp.linalg.norm(b[:2] - a[:2]), 1e-6)
    frac = jnp.clip(s / seg_len, 0.0, 1.0)
    z_d = a[2] + frac * (b[2] - a[2])

    psi_d = jnp.where(hold, pi_p, psi_los)
    u_d = jnp.where(hold, jnp.asarray(0.0, dtype), plan.cruise_speed)
    x_ref = (
        jnp.zeros(12, dtype)
        .at[0].set(jnp.where(hold, b[0], pos[0]))
        .at[1].set(jnp.where(hold, b[1], pos[1]))
        .at[2].set(jnp.where(hold, b[2], z_d))
        .at[5].set(psi_d)
        .at[6].set(u_d)
    )
    return x_ref, hold, e


def _masked_error(x, x_ref, hold):
    """State error fed to the gain: angles wrapped; in transit the x/y
    rows are zeroed (guidance owns the plane); in hold the horizontal
    position error is rotated into the heading-aligned frame so the
    hover-linearized (psi=0) gain steers correctly at any final
    heading."""
    err = x - x_ref
    err = err.at[3:6].set(ssa(err[3:6]))
    c, s = jnp.cos(x[5]), jnp.sin(x[5])
    ex, ey = err[0], err[1]
    ex_r = c * ex + s * ey
    ey_r = -s * ex + c * ey
    zero = jnp.zeros((), err.dtype)
    return (err
            .at[0].set(jnp.where(hold, ex_r, zero))
            .at[1].set(jnp.where(hold, ey_r, zero)))


class MissionResult(NamedTuple):
    X: jnp.ndarray          # (steps+1, 12) states incl. initial
    U: jnp.ndarray          # (steps, 8) thruster commands
    wp_index: jnp.ndarray   # (steps,) int32 active waypoint index
    cross_track: jnp.ndarray  # (steps,) signed cross-track error [m]
    psi_d: jnp.ndarray      # (steps,) commanded heading


def simulate_los_mission(
    plant_step: Callable,
    policy,
    plan: WaypointPlan,
    carry0,
    steps: int,
    get_state: Callable = lambda c: c,
    dt: float = 0.02,
) -> MissionResult:
    """Fly a waypoint mission closed-loop: LOS guidance (outer) + a
    state-feedback gain (inner) against any plant step of this
    framework.  One jitted scan; ``policy`` is an
    :class:`~bluerov2_dynamics_tpu.models.control.LQRPolicy` (its
    ``K``/``u_eq``/clip limits are used; ``z_ref``/``phi`` are replaced
    by the guidance references).  ``dt`` only feeds the ILOS
    integrator (irrelevant at ``integral_gain = 0``).
    """
    K = policy.K
    u_eq = policy.u_eq
    dtype = plan.waypoints.dtype
    n_seg = plan.waypoints.shape[0] - 1

    @jax.jit
    def run(carry0):
        def body(carry, _):
            pc, idx, e_int = carry
            x = get_state(pc)
            idx_new = _advance_index(plan, x[:3], idx)
            # reset the ILOS integrator on waypoint switch / in hold
            e_int = jnp.where((idx_new != idx) | (idx_new > n_seg),
                              jnp.zeros((), dtype), e_int)
            x_ref, hold, e_ct = _references(plan, x, idx_new, e_int)
            # Borhaug-style ILOS integrator: de_int/dt =
            # U * Delta * e / (Delta^2 + (e + kappa e_int)^2) — slows
            # near large errors (anti-windup) and freezes in hold.
            e_eff = e_ct + plan.integral_gain * e_int
            rate = (plan.cruise_speed * plan.lookahead * e_ct
                    / (plan.lookahead ** 2 + e_eff ** 2))
            e_int = jnp.where(hold, e_int, e_int + dt * rate)
            err = _masked_error(x, x_ref, hold)
            u = jnp.clip(u_eq - err @ K.T, policy.u_lo, policy.u_hi)
            pc = plant_step(pc, u)
            return (pc, idx_new, e_int), (get_state(pc), u, idx_new,
                                          e_ct, x_ref[5])

        idx0 = jnp.asarray(1, jnp.int32)
        _, (X, U, wp_idx, e_ct, psi_d) = jax.lax.scan(
            body, (carry0, idx0, jnp.zeros((), dtype)), None, length=steps)
        X = jnp.concatenate([get_state(carry0)[None], X])
        return MissionResult(X, U, wp_idx, e_ct, psi_d)

    return run(carry0)


def mission_summary(result: MissionResult, plan: WaypointPlan):
    """Host-side mission metrics: per-waypoint closest horizontal
    approach + first-hit step, final position error, and the
    cross-track RMS over the transit portion (hold excluded)."""
    import numpy as np

    X = np.asarray(result.X)
    wps = np.asarray(plan.waypoints)[1:]          # targets only
    r = float(plan.accept_radius)
    d = np.linalg.norm(X[:, None, :2] - wps[None, :, :2], axis=-1)
    min_dist = d.min(axis=0)
    hit = d < r
    hit_step = np.where(hit.any(axis=0), hit.argmax(axis=0), -1)
    idx = np.asarray(result.wp_index)
    transit = idx <= len(wps)
    ct = np.asarray(result.cross_track)[transit]
    return {
        "min_dist": min_dist,
        "hit_step": hit_step,
        "all_hit": bool(hit.any(axis=0).all()),
        "final_pos_err": float(np.linalg.norm(X[-1, :3] - wps[-1])),
        "cross_track_rms": float(np.sqrt(np.mean(ct ** 2))) if ct.size else 0.0,
    }
