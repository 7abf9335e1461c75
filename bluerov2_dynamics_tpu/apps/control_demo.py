"""Closed-loop control demo: LQR hover / Koopman-LQR / trajectory opt.

TPU-native extension — the reference stops at modeling
(`/root/reference/README.md:1-22`; EDMDc exists FOR control, but no
controller ships).  Three tasks against the framework's full nonlinear
thruster-lag plant:

* ``hover``       — trim + jax.jacobian linearization + Riccati LQR,
                    recovering a pose perturbation;
* ``koopman``     — LQR on the lifted (A, B) of an EDMDc model fitted to
                    episodic near-hover plant data (data-driven control,
                    no physics linearization anywhere);
* ``waypoint``    — direct trajectory optimization: Adam over a squashed
                    control sequence through the rollout scan;
* ``mpc``         — receding-horizon MPC (nested jitted scans) from a
                    near-reversed heading, vs the LQR's wide swing
                    (opt-in; not part of ``all``);
* ``mppi``        — sampling-based MPPI: batched sampled rollouts price
                    a DISCONTINUOUS keep-out-disk indicator cost that a
                    gradient planner cannot see, vs the obstacle-blind
                    LQR cutting straight through (opt-in);
* ``lqg``         — OUTPUT feedback: pose-only noisy mocap, an EKF in
                    the loop reconstructs velocities + lag states and
                    the LQR acts on the estimate — vs naive raw-pose
                    feedback and the true-state oracle (opt-in);
* ``adaptive``    — ONLINE adaptation: the Koopman-LQR loop keeps
                    refitting its lifted (A, B) from the closed-loop
                    data (forgetting-RLS), re-trimming and re-solving
                    the gains every segment, recovering from a reversed
                    half-strength thruster that strands the frozen
                    policy (opt-in);
* ``los``         — waypoint GUIDANCE: lookahead-based line-of-sight
                    path following (Fossen ch. 10.3) over a 4-waypoint
                    square with depth interpolation and a station-
                    keeping hold at the final waypoint, the whole
                    mission one jitted scan (opt-in);
* ``ilqr``        — second-order trajectory optimization (iterative LQR,
                    ~10 sweeps where Adam needs hundreds of iterations),
                    then the plan executed CLOSED-LOOP with the backward
                    pass' time-varying gains under an ocean current the
                    planner never saw, vs open-loop replay of the same
                    controls (opt-in).

Usage::

    python -m bluerov2_dynamics_tpu.apps.control_demo [hover|koopman|waypoint|mpc|mppi|ilqr|all]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from bluerov2_dynamics_tpu.eval.timing import time_fn
from bluerov2_dynamics_tpu.models import control, fossen, koopman
from bluerov2_dynamics_tpu.models.params import (
    fossen_params,
    lag_params,
    thruster_config,
)
from bluerov2_dynamics_tpu.utils.log import info, ok

DT = 0.02
X0_PERTURBED = (0.5, -0.4, 0.3, 0.1, 0.0, 0.6)  # x y z phi theta psi


def _plant():
    p = fossen_params()
    cfg = thruster_config()
    return p, cfg, fossen.make_thruster_step(p, cfg, lag_params(DT), DT,
                                             "euler")


def _perturbed_x0():
    return jnp.zeros(12, jnp.float32).at[:6].set(
        jnp.asarray(X0_PERTURBED, jnp.float32))


def _report(name, X, steps):
    e0 = float(jnp.linalg.norm(X[0]))
    ef = float(jnp.linalg.norm(X[-1]))
    ok(f"{name}: |x| {e0:.3f} -> {ef:.2e} over {steps * DT:.0f} s "
       f"({steps} steps)")
    return {"initial_norm": e0, "final_norm": ef}


def run_hover(steps=600):
    """Trim -> linearize -> LQR -> close the loop on the lag plant."""
    p, cfg, plant = _plant()
    info("hover: trim + exact-Jacobian LQR on the nonlinear lag plant")
    (pol, _), t = time_fn(lambda: (control.fossen_lqr(p, cfg, DT), None),
                          warmup=0)
    ok(f"trim + linearize + Riccati solved in {t:.2f} s (incl. compile); "
       f"hover command (vertical thrusters): "
       f"{np.round(np.asarray(pol.u_eq[4:]), 4).tolist()}")
    x0 = _perturbed_x0()
    X, U = control.simulate_closed_loop(
        plant, pol, (x0, jnp.zeros((8, 3), jnp.float32)), steps, get_state=lambda c: c[0])
    out = _report("LQR hover recovery", X, steps)
    out["X"], out["U"] = np.asarray(X), np.asarray(U)
    return out


def run_koopman(steps=600, n_episodes=60, ep_len=100, n_rbfs=100):
    """Episodic excitation -> EDMDc fit -> lifted LQR -> closed loop."""
    p, cfg, plant = _plant()
    info(f"koopman: EDMDc on {n_episodes}x{ep_len} near-hover episodes, "
         "LQR on the lifted (A, B)")
    u_eq, _ = control.trim(p, cfg)
    kU, kX = jax.random.split(jax.random.PRNGKey(0))
    U_ep = jnp.clip(u_eq + 0.3 * jax.random.normal(
        kU, (n_episodes, ep_len, 8), jnp.float32), -1, 1)
    x0s = 0.3 * jax.random.normal(kX, (n_episodes, 12), jnp.float32)

    @jax.jit
    def gen(x0, U):
        def body(c, u):
            c = plant(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, (x0, jnp.zeros((8, 3), jnp.float32)), U)
        return X

    Xs = jax.vmap(gen)(x0s, U_ep)
    model, t_fit = time_fn(lambda: koopman.fit_multi(
        jax.random.PRNGKey(1), list(Xs), list(U_ep),
        n_rbfs=n_rbfs, gamma=1.0, ridge=1e-6), warmup=0)
    pol, t_lqr = time_fn(lambda: control.koopman_dlqr(
        model, jnp.zeros(12, jnp.float32), u_eq=u_eq), warmup=0)
    ok(f"EDMDc fit {t_fit:.2f} s, lifted Riccati ({model.lift_dim}-dim) "
       f"{t_lqr:.2f} s (incl. compile)")
    x0 = _perturbed_x0()
    X, U = control.simulate_closed_loop(
        plant, pol, (x0, jnp.zeros((8, 3), jnp.float32)), steps, get_state=lambda c: c[0])
    out = _report("Koopman-LQR hover recovery", X, steps)
    out["X"], out["U"] = np.asarray(X), np.asarray(U)
    return out


def run_mpc(sim_steps=300):
    """Receding-horizon MPC from a near-reversed heading vs LQR."""
    p, cfg, plant = _plant()
    x0 = jnp.zeros(12, jnp.float32).at[0].set(1.5).at[1].set(0.5).at[5].set(3.0)
    init = float(jnp.linalg.norm(x0[:3]))
    info(f"mpc: receding horizon (60-step plan, 20 Adam iters/step, one "
         f"nested-scan XLA program) from psi=3.0 rad, {init:.2f} m out")
    pol = control.fossen_lqr(p, cfg, DT)
    Xl, _ = control.simulate_closed_loop(
        plant, pol, (x0, jnp.zeros((8, 3), jnp.float32)), sim_steps,
        get_state=lambda c: c[0])
    (X, U), t = time_fn(lambda: control.simulate_mpc(
        plant, x0, jnp.zeros(12, jnp.float32), sim_steps=sim_steps,
        horizon=60, replan_iters=20, init_iters=150, lr=0.1,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0]), warmup=0)
    pm = jnp.linalg.norm(X[:, :3], axis=1)
    pl = jnp.linalg.norm(Xl[:, :3], axis=1)
    ok(f"MPC {t:.1f} s (incl. compile): pos err {init:.3f} -> "
       f"{float(pm[-1]):.3f}, max excursion {float(jnp.max(pm)):.3f} "
       f"(monotone approach); LQR -> {float(pl[-1]):.3f} but swings to "
       f"{float(jnp.max(pl)):.3f}")
    return {"X": np.asarray(X), "U": np.asarray(U),
            "X_lqr": np.asarray(Xl),
            "max_excursion": float(jnp.max(pm)),
            "lqr_max_excursion": float(jnp.max(pl))}


MPPI_OBSTACLE = (0.75, 0.0, 0.3)   # (cx, cy, radius) keep-out cylinder


def run_mppi(sim_steps=400, n_samples=512):
    """Sampling-based MPPI through a hard keep-out cylinder vs the
    obstacle-blind LQR.  The obstacle cost is a DISCONTINUOUS indicator
    (zero gradient a.e. — the Adam-based MPC above could never see it);
    MPPI's batched sampled rollouts price it directly."""
    p, cfg, plant = _plant()
    x0 = jnp.zeros(12, jnp.float32).at[0].set(1.5)
    cx, cy, radius = MPPI_OBSTACLE
    center = jnp.asarray([cx, cy], jnp.float32)

    def obstacle(x, u):
        d = jnp.linalg.norm(x[..., :2] - center, axis=-1)
        return 200.0 * (d < radius)

    info(f"mppi: 4x{n_samples} sampled 60-step rollouts per replan "
         f"(one nested-scan XLA program), hard indicator keep-out disk "
         f"r={radius} m sitting on the straight line to the target")
    pol = control.fossen_lqr(p, cfg, DT)
    Xl, _ = control.simulate_closed_loop(
        plant, pol, (x0, jnp.zeros((8, 3), jnp.float32)), sim_steps,
        get_state=lambda c: c[0])
    (X, U), t = time_fn(lambda: control.simulate_mppi(
        plant, x0, jnp.zeros(12, jnp.float32), sim_steps=sim_steps,
        horizon=60, n_samples=n_samples, sigma=0.15, temperature=0.01,
        init_rounds=20, replan_rounds=4, effort_weight=1e-2,
        extra_cost=obstacle,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0], key=jax.random.PRNGKey(1)), warmup=0)
    dm = jnp.linalg.norm(X[:, :2] - center, axis=1)
    dl = jnp.linalg.norm(Xl[:, :2] - center, axis=1)
    ef = float(jnp.linalg.norm(X[-1, :3]))
    ok(f"MPPI {t:.1f} s (incl. compile): min obstacle distance "
       f"{float(jnp.min(dm)):.3f} m (radius {radius}); final pos err "
       f"{ef:.3f} m.  Obstacle-blind LQR cuts through at "
       f"{float(jnp.min(dl)):.3f} m")
    return {"X": np.asarray(X), "U": np.asarray(U),
            "X_lqr": np.asarray(Xl),
            "min_dist": float(jnp.min(dm)),
            "lqr_min_dist": float(jnp.min(dl)),
            "final_err": ef}


def run_lqg(steps=600, sigma=5e-3):
    """Output-feedback hover recovery: the controller sees ONLY a noisy
    6-dim pose (mocap at sigma=5 mm / 5 mrad, 50 Hz) — velocities and
    the 24 actuator-lag states are never measured.  An EKF over the
    flattened 36-dim plant carry reconstructs them through the dynamics
    and the LQR acts on the posterior (LQG / certainty equivalence);
    baselines: the same policy fed the raw noisy pose with zeroed
    velocities, and the full-true-state oracle."""
    p, cfg, plant = _plant()
    pol = control.fossen_lqr(p, cfg, DT)
    x0 = _perturbed_x0()
    carry0 = (x0, jnp.zeros((8, 3), jnp.float32))
    info(f"lqg: pose-only mocap (sigma={sigma * 1e3:.0f} mm/mrad), EKF on "
         f"the 36-dim carry in the loop, {steps} steps — one jitted scan")
    res, t = time_fn(lambda: control.simulate_lqg(
        plant, pol, lambda x: x[:6], 1e-8, sigma ** 2, carry0, steps=steps,
        key=jax.random.PRNGKey(0), get_state=lambda c: c[0]), warmup=0)

    @jax.jit
    def run_naive(carry0, key):
        def body(c, k):
            y = c[0][:6] + sigma * jax.random.normal(k, (6,), jnp.float32)
            u = pol(jnp.concatenate([y, jnp.zeros(6, jnp.float32)]))
            c = plant(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, carry0, jax.random.split(key, steps))
        return X

    Xn = run_naive(carry0, jax.random.PRNGKey(0))
    Xo, _ = control.simulate_closed_loop(plant, pol, carry0, steps,
                                         get_state=lambda c: c[0])
    tail = steps // 4

    def _rms(X):
        return float(jnp.sqrt(jnp.mean(jnp.sum(X[-tail:] ** 2, axis=1))))

    tail_lqg, tail_naive, tail_oracle = _rms(res.X), _rms(Xn), _rms(Xo)
    est_err = float(jnp.sqrt(jnp.mean(
        jnp.sum((res.X_est[-tail:] - res.X[-tail:]) ** 2, axis=1))))
    mean_nis = float(jnp.mean(res.nis))
    ok(f"LQG {t:.1f} s (incl. compile): tail-RMS |x| = {tail_lqg:.2e} vs "
       f"naive raw-pose feedback {tail_naive:.2e} "
       f"({tail_naive / max(tail_lqg, 1e-30):.0f}x) and true-state oracle "
       f"{tail_oracle:.2e}; estimate error {est_err:.2e}, mean NIS "
       f"{mean_nis:.2f} (chi^2(6) expects 6)")
    return {"X": np.asarray(res.X), "X_est": np.asarray(res.X_est),
            "U": np.asarray(res.U), "X_naive": np.asarray(Xn),
            "X_oracle": np.asarray(Xo),
            "tail_rms": tail_lqg, "naive_tail_rms": tail_naive,
            "oracle_tail_rms": tail_oracle, "est_err": est_err,
            "mean_nis": mean_nis}


def run_adaptive(steps=1200, segment=100, n_episodes=40, ep_len=80,
                 n_rbfs=60, forgetting=0.99, dither=0.05):
    """Online adaptation to a mid-life plant change: vertical thruster 6
    REVERSED at half strength.  The frozen lifted LQR (fitted on healthy
    data) is left with a large permanent offset; the adaptive loop
    (``control.simulate_adaptive_koopman_lqr``) keeps absorbing the
    closed-loop data into the forgetting-RLS EDMDc statistics, re-trims
    the hover command, and re-solves the Riccati gains every ``segment``
    steps — recovering to the dither noise floor.  One nested-scan XLA
    program (plant scan x streaming RLS x Riccati)."""
    p, cfg, plant = _plant()
    u_eq, _ = control.trim(p, cfg)
    info(f"adaptive: seeding EDMDc stats from {n_episodes}x{ep_len} "
         f"healthy near-hover episodes ({n_rbfs} RBFs)")
    kU, kX = jax.random.split(jax.random.PRNGKey(0))
    U_ep = jnp.clip(u_eq + 0.3 * jax.random.normal(
        kU, (n_episodes, ep_len, 8), jnp.float32), -1, 1)
    x0s = 0.3 * jax.random.normal(kX, (n_episodes, 12), jnp.float32)

    @jax.jit
    def gen(x0, U):
        def body(c, u):
            c = plant(c, u)
            return c, c[0]

        _, X = jax.lax.scan(body, (x0, jnp.zeros((8, 3), jnp.float32)), U)
        return X

    Xs = jax.vmap(gen)(x0s, U_ep)
    Xfull = jnp.concatenate([x0s[:, None, :], Xs], axis=1)
    from bluerov2_dynamics_tpu.ops.kmeans import kmeans

    centers, _ = kmeans(jax.random.PRNGKey(1), Xfull.reshape(-1, 12),
                        n_rbfs, iters=25)
    stats0 = koopman.streaming_init(centers, 1.0, input_dim=8,
                                    dtype=jnp.float32)

    @jax.jit
    def absorb(stats, Xe, Ue):
        def body(s, xu):
            return koopman.streaming_update_episode(s, xu[0], xu[1]), None

        s, _ = jax.lax.scan(body, stats, (Xe, Ue))
        return s

    stats0 = absorb(stats0, Xfull, U_ep)

    gains = jnp.asarray([1, 1, 1, 1, 1, -0.5, 1, 1], jnp.float32)

    def plant_damaged(c, u):
        return plant(c, u * gains)

    x0 = jnp.zeros(12, jnp.float32).at[0].set(0.4).at[2].set(0.25).at[5].set(0.4)
    carry0 = (x0, jnp.zeros((8, 3), jnp.float32))
    info("adaptive: thruster 6 reversed at half strength from t=0; "
         f"refit+retrim+Riccati every {segment} steps "
         f"(lam={forgetting}, dither={dither})")

    pol_frozen = control.koopman_dlqr(
        koopman.streaming_finalize(stats0, 1e-6), jnp.zeros(12, jnp.float32),
        u_eq=u_eq)
    Xf, _ = control.simulate_closed_loop(
        plant_damaged, pol_frozen, carry0, steps, get_state=lambda c: c[0])
    res, t = time_fn(lambda: control.simulate_adaptive_koopman_lqr(
        plant_damaged, carry0, stats0, jnp.zeros(12, jnp.float32), u_eq,
        steps=steps, segment=segment, forgetting=forgetting, dither=dither,
        key=jax.random.PRNGKey(2), get_state=lambda c: c[0]), warmup=0)
    tail = steps // 4
    tail_frozen = float(jnp.sqrt(jnp.mean(jnp.sum(Xf[-tail:] ** 2, axis=1))))
    tail_ad = float(jnp.sqrt(jnp.mean(jnp.sum(res.X[-tail:] ** 2, axis=1))))
    ok(f"adaptive loop {t:.1f} s (incl. compile): tail-RMS |x| over the "
       f"last {tail} steps = {tail_ad:.3f} vs frozen lifted LQR "
       f"{tail_frozen:.3f} ({tail_frozen / max(tail_ad, 1e-9):.0f}x); "
       f"re-trimmed command on the damaged thruster "
       f"{float(res.u_eq[5]):+.3f} (healthy trim {float(u_eq[5]):+.3f}), "
       f"gain churn settles at {float(res.gain_deltas[-1]):.3f}")
    return {"X": np.asarray(res.X), "U": np.asarray(res.U),
            "X_frozen": np.asarray(Xf),
            "tail_rms": tail_ad, "frozen_tail_rms": tail_frozen,
            "gain_deltas": np.asarray(res.gain_deltas),
            "u_eq": np.asarray(res.u_eq)}


def run_waypoint(horizon=250, opt_steps=250):
    """Direct trajectory optimization through the lag plant."""
    _, _, plant = _plant()
    target = jnp.zeros(12, jnp.float32).at[0].set(1.0).at[1].set(0.5).at[2].set(-0.3)
    info(f"waypoint: Adam over {horizon}x8 squashed controls through the "
         f"rollout scan -> ({float(target[0])}, {float(target[1])}, "
         f"{float(target[2])}) m in {horizon * DT:.0f} s")
    res, t = time_fn(lambda: control.trajopt(
        plant, jnp.zeros(12, jnp.float32), target, horizon=horizon, steps=opt_steps,
        lr=0.05, carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0]), warmup=0)
    err = float(jnp.linalg.norm(res.X[-1, :3] - target[:3]))
    ok(f"trajopt: loss {float(res.losses[0]):.3e} -> "
       f"{float(res.losses[-1]):.3e} in {t:.2f} s (incl. compile); "
       f"terminal position error {err:.2e} m")
    return {"X": np.asarray(res.X), "U": np.asarray(res.U),
            "terminal_error": err}


LOS_WAYPOINTS = [[1.5, 0.0, 0.3], [1.5, 1.5, 0.5], [0.0, 1.5, 0.2],
                 [0.0, 0.0, 0.0]]


def run_los(steps=4000, accept_radius=0.15, lookahead=0.6,
            cruise_speed=0.25):
    """LOS waypoint mission: outer guidance + hover-LQR inner loop."""
    from bluerov2_dynamics_tpu.models import guidance

    p, cfg, plant = _plant()
    info(f"los: {len(LOS_WAYPOINTS)}-waypoint square at "
         f"{cruise_speed} m/s cruise, lookahead {lookahead} m, "
         f"acceptance {accept_radius} m — one jitted {steps}-step scan")
    pol = control.fossen_lqr(p, cfg, DT)
    plan = guidance.make_plan([0, 0, 0], LOS_WAYPOINTS,
                              accept_radius=accept_radius,
                              lookahead=lookahead,
                              cruise_speed=cruise_speed)
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))
    res, t = time_fn(lambda: guidance.simulate_los_mission(
        plant, pol, plan, carry0, steps, get_state=lambda c: c[0]),
        warmup=0)
    s = guidance.mission_summary(res, plan)
    hits = ", ".join(
        f"wp{i + 1} @ {h * DT:.1f} s (closest {d:.3f} m)"
        for i, (h, d) in enumerate(zip(s["hit_step"], s["min_dist"])))
    ok(f"mission {t:.1f} s (incl. compile): all waypoints hit = "
       f"{s['all_hit']} [{hits}]; cross-track RMS "
       f"{s['cross_track_rms'] * 100:.1f} cm in transit; station-keeping "
       f"error at the final waypoint {s['final_pos_err'] * 100:.2f} cm")
    return {"X": np.asarray(res.X), "U": np.asarray(res.U),
            "wp_index": np.asarray(res.wp_index),
            "cross_track": np.asarray(res.cross_track),
            **{k: s[k] for k in ("all_hit", "final_pos_err",
                                 "cross_track_rms")},
            "min_dist": np.asarray(s["min_dist"]),
            "hit_step": np.asarray(s["hit_step"])}


def run_ilqr(horizon=250, iters=10, current=(0.12, -0.08, 0.0)):
    """iLQR waypoint plan + time-varying-LQR execution under an unseen
    current.  The planner never sees the current; the backward pass'
    feedback gains absorb it, while open-loop replay of the identical
    control sequence (gains zeroed) is blown off course."""
    p, cfg, plant = _plant()
    target = jnp.zeros(12, jnp.float32).at[0].set(1.0).at[1].set(0.5).at[2].set(-0.3)
    info(f"ilqr: {iters} second-order sweeps over a {horizon}x8 squashed "
         f"plan (vmapped jacfwd linearization + reverse-scan Riccati + "
         f"parallel line search, one XLA program)")
    res, t = time_fn(lambda: control.ilqr(
        plant, jnp.zeros(12, jnp.float32), target, horizon=horizon,
        iters=iters, effort_weight=1e-3,
        carry_init=lambda x: (x, jnp.zeros((8, 3), jnp.float32)),
        get_state=lambda c: c[0]), warmup=0)
    err_plan = float(jnp.linalg.norm(res.X[-1, :3] - target[:3]))
    ok(f"ilqr: cost {float(res.costs[0]):.2f} -> {float(res.costs[-1]):.2f} "
       f"in {iters} sweeps, {t:.2f} s (incl. compile); planned terminal "
       f"position error {err_plan:.2e} m")

    true_plant = fossen.make_thruster_step(
        fossen_params(current=current), cfg, lag_params(DT), DT, "euler")
    carry0 = (jnp.zeros(12, jnp.float32), jnp.zeros((8, 3), jnp.float32))
    Xo, _ = control.simulate_tvlqr(
        true_plant, res._replace(K=jnp.zeros_like(res.K)), carry0,
        get_state=lambda c: c[0])
    Xc, _ = control.simulate_tvlqr(true_plant, res, carry0,
                                   get_state=lambda c: c[0])
    err_open = float(jnp.linalg.norm(Xo[-1, :3] - target[:3]))
    err_fb = float(jnp.linalg.norm(Xc[-1, :3] - target[:3]))
    ok(f"executed under unseen current {current}: open-loop replay misses "
       f"by {err_open:.3f} m, time-varying-gain execution by "
       f"{err_fb:.3f} m ({err_open / max(err_fb, 1e-9):.1f}x)")
    return {"X": np.asarray(Xc), "U": np.asarray(res.U),
            "X_open": np.asarray(Xo), "X_plan": np.asarray(res.X),
            "plan_error": err_plan, "open_loop_error": err_open,
            "feedback_error": err_fb}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("task", nargs="?", default="all",
                    choices=["hover", "koopman", "waypoint", "mpc", "mppi",
                             "ilqr", "adaptive", "lqg", "los", "all"])
    ap.add_argument("--steps", type=int, default=600,
                    help="closed-loop steps for the hover tasks")
    ap.add_argument("--media-dir", type=str, default=None,
                    help="save a top-view trajectory figure here")
    args = ap.parse_args(argv)

    out = {}
    if args.task in ("hover", "all"):
        out["hover"] = run_hover(args.steps)
    if args.task in ("koopman", "all"):
        out["koopman"] = run_koopman(args.steps)
    if args.task in ("waypoint", "all"):
        out["waypoint"] = run_waypoint()
    if args.task == "mpc":
        # not in "all": ~40 s of nested-scan compile+run — opt-in task
        out["mpc"] = run_mpc()
    if args.task == "mppi":
        # opt-in like mpc (sim_steps x n_samples x horizon rollouts)
        out["mppi"] = run_mppi()
    if args.task == "ilqr":
        # opt-in like mpc (per-step Jacobian stacks along the horizon)
        out["ilqr"] = run_ilqr()
    if args.task == "adaptive":
        # opt-in like mpc (episodic seed + 12 in-scan Riccati re-solves)
        out["adaptive"] = run_adaptive()
    if args.task == "lqg":
        # opt-in (per-step 36-dim jacfwd + covariance update in the scan)
        out["lqg"] = run_lqg()
    if args.task == "los":
        # opt-in (4000-step mission scan)
        out["los"] = run_los()

    if args.media_dir:
        from bluerov2_dynamics_tpu.viz import plot_topdown_with_depth

        # single-task runs save under a task-specific name so the blessed
        # 3-task §2c figure is never clobbered
        obstacles = None
        if args.task == "mpc":
            # MPC's story is the PATH vs the saturated LQR's swing
            trajs = {"MPC": out["mpc"]["X"], "LQR": out["mpc"]["X_lqr"]}
            name = "control_demo_mpc_2D.png"
            title = ("Receding-horizon MPC vs saturated LQR from "
                     "psi=3.0 rad (top view)")
        elif args.task == "mppi":
            trajs = {"MPPI": out["mppi"]["X"], "LQR": out["mppi"]["X_lqr"]}
            name = "control_demo_mppi_2D.png"
            title = "MPPI vs obstacle-blind LQR (keep-out disk)"
            obstacles = [MPPI_OBSTACLE]
        elif args.task == "ilqr":
            trajs = {"TVLQR": out["ilqr"]["X"],
                     "OPEN-LOOP": out["ilqr"]["X_open"],
                     "PLAN": out["ilqr"]["X_plan"]}
            name = "control_demo_ilqr_2D.png"
            title = ("iLQR plan under an unseen current: time-varying "
                     "gains vs open-loop replay (top view)")
        elif args.task == "lqg":
            trajs = {"LQG": out["lqg"]["X"],
                     "NAIVE": out["lqg"]["X_naive"],
                     "ORACLE": out["lqg"]["X_oracle"]}
            name = "control_demo_lqg_2D.png"
            title = ("Output-feedback LQG (pose-only noisy mocap) vs "
                     "naive raw-pose feedback (top view)")
        elif args.task == "los":
            trajs = {"LOS": out["los"]["X"]}
            name = "control_demo_los_2D.png"
            title = ("LOS waypoint mission: lookahead guidance + "
                     "hover-LQR inner loop (top view)")
            # draw the acceptance circles of the waypoints
            obstacles = [(wx, wy, 0.15) for wx, wy, _ in LOS_WAYPOINTS]
        elif args.task == "adaptive":
            trajs = {"ADAPTIVE": out["adaptive"]["X"],
                     "FROZEN": out["adaptive"]["X_frozen"]}
            name = "control_demo_adaptive_2D.png"
            title = ("Adaptive Koopman-LQR vs frozen lifted LQR under "
                     "thruster damage (top view)")
        elif args.task == "all":
            trajs = {k.upper(): v["X"] for k, v in out.items()}
            name = "control_demo_2D.png"
            title = ("Closed-loop control: LQR / Koopman-LQR hover "
                     "recovery + trajopt waypoint (top view)")
        else:
            trajs = {args.task.upper(): out[args.task]["X"]}
            name = f"control_demo_{args.task}_2D.png"
            title = f"Closed-loop control: {args.task} task (top view)"
        plot_topdown_with_depth(
            trajs, dt=DT, seconds=len(next(iter(trajs.values()))) * DT,
            save_path=f"{args.media_dir}/{name}", title=title,
            obstacles=obstacles,
        )
    ok("done")
    return out


if __name__ == "__main__":
    main()
