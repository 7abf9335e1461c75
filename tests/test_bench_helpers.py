"""CPU-safe tests of bench.py's audit helpers (the perf-record inputs)."""

import subprocess
import sys
from pathlib import Path

import bench

REPO = Path(__file__).resolve().parent.parent


def test_step_trig_count_matches_kernel_structure():
    """24 sin/cos for RK4 (6 per RHS x 4 stages), 6 for Euler — audited
    from the jaxpr of the exact Pallas kernel step."""
    assert bench.step_trig_count("rk4") == 24
    assert bench.step_trig_count("euler") == 6


def test_step_costs_include_transcendentals():
    flops, transc = bench.step_costs_per_trajectory("rk4")
    assert flops > 1000  # full path incl. thruster map
    assert transc > 0
    flops_e, _ = bench.step_costs_per_trajectory("euler")
    assert flops_e < flops  # 1 RHS eval vs 4


def test_bench_cli_rejects_bad_args():
    for bad in (["--batch", "0"], ["--t", "0"], ["--iters", "0"],
                ["--batch", "100", "--block-b", "7"]):
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), *bad],
            capture_output=True, text=True, cwd=str(REPO),
        )
        assert proc.returncode != 0, bad
        # the argparse guard, not some unrelated startup failure
        assert "must be" in proc.stderr or "must divide" in proc.stderr, (
            bad, proc.stderr)


def test_quat_step_op_counts_audit():
    """The quat13 op audit returns machine-counted classes with the
    expected structure (trig-free; 5 normalizes per RK4 step, each one
    rsqrt on ||q||^2 — the round-5 rsqrt form, no divides; slots <=
    flops; everything positive)."""
    import bench

    oc = bench.quat_step_op_counts()
    assert set(oc) == {"flops", "div", "sqrt", "cheap", "slots"}
    # 4 RHS + 1 post-step normalize; rsqrt lands in the sqrt bucket
    assert oc["div"] == 0 and oc["sqrt"] == 5
    assert 500 < oc["flops"] < 1500
    assert 0 < oc["slots"] < oc["flops"]
    # trig-free claim is auditable: no sin/cos in the counts by construction


def test_jaxpr_walker_descends_into_while_loops():
    """The shared jaxpr walker must count ops inside lax.while_loop
    bodies (params cond_jaxpr/body_jaxpr) — the earlier per-audit
    walkers skipped them, silently undercounting any audited budget
    that ever contained one."""
    import jax.numpy as jnp
    from jax import lax

    import bench

    def f(x):
        return lax.while_loop(
            lambda c: c[1] < 3,
            lambda c: (jnp.sin(c[0]) * 2.0 + 1.0, c[1] + 1),
            (x, 0),
        )[0]

    oc = bench._vector_op_buckets(f, jnp.zeros((8,), jnp.float32))
    assert oc["flops"] == 2  # the mul and add inside the body


def test_time_fn_slope_cancels_constant_overhead():
    """The slope method recovers per-call compute time with a constant
    per-call overhead subtracted (simulated dispatch floor)."""
    import time as _time

    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.eval.timing import time_fn_slope

    calls = []

    def fn(H):
        calls.append(H)
        _time.sleep(0.004)  # simulated per-call cost incl. "dispatch"
        return jnp.float32(H)

    val, cold, warm = time_fn_slope(fn, 7, k_lo=2, k_hi=6, reps=3)
    assert float(val) == 7.0
    assert cold > 0
    # slope ~ 4 ms/call; generous band for CI jitter
    assert 0.002 < warm < 0.012
    # cold + settle + reps * (k_lo + k_hi)
    assert len(calls) == 1 + 2 + 3 * (2 + 6)


def test_time_fn_slope_flags_nonpositive_slope_as_nan():
    """A measurement whose median slope comes out non-positive (tunnel
    hiccup during the k_lo batches) is flagged as nan, not clamped to a
    silently-wrong 0.0 (round-4 advisor finding)."""
    import math

    import jax.numpy as jnp

    from bluerov2_dynamics_tpu.eval.timing import time_fn_slope

    import time as _time

    # call indices belonging to the k_lo batches of the timed pairs
    # (cold=0, settle=1-2, then per rep: 2 k_lo calls + 10 k_hi calls)
    k_lo_calls = {3, 4, 15, 16, 27, 28}
    counter = {"i": -1}

    def slow_fn():
        counter["i"] += 1
        if counter["i"] in k_lo_calls:  # hiccup hits every k_lo batch
            _time.sleep(0.01)
        return jnp.float32(1.0)

    _, _, warm = time_fn_slope(slow_fn, k_lo=2, k_hi=10, reps=3)
    assert math.isnan(warm)


def test_sync_covers_sharded_leaves():
    """sync() must walk a sharded leaf's addressable shards (one readback
    per participating device) — reading element 0 of the whole leaf only
    barriers the shard-0 device."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bluerov2_dynamics_tpu.eval.timing import sync
    from bluerov2_dynamics_tpu.parallel import make_mesh

    mesh = make_mesh(axis_names=("data",))
    x = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("data")))
    out = sync({"a": x, "b": jnp.ones(3)})
    assert out["a"] is x  # identity preserved
    assert len(x.addressable_shards) == len(mesh.devices.ravel())
