"""Regression tests for the driver entry points (__graft_entry__.py).

The subprocess tests reproduce the DRIVER's environment exactly (production
``JAX_PLATFORMS``, no ``XLA_FLAGS``, no conftest) — round 1's only red
artifact was a dryrun that passed in-suite but crashed in the driver env
because the virtual CPU mesh was provisioned by conftest, not by
``dryrun_multichip`` itself.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    x, lag_state = out
    assert x.shape == (64, 12) and lag_state.shape == (64, 8, 3)
    assert np.all(np.isfinite(np.asarray(x)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def _run_in_production_env(body: str, extra_env=None) -> None:
    """Run a python snippet in a fresh subprocess with the conftest's env
    tweaks undone: production JAX_PLATFORMS restored, XLA_FLAGS cleared."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # conftest set JAX_PLATFORMS=cpu only if unset; restore the production
    # default (the axon plugin env) so the subprocess sees what the driver
    # sees.  If the machine never had the plugin, plain unset is the
    # production default.
    if os.path.isdir("/root/.axon_site"):
        env["JAX_PLATFORMS"] = "axon"
    else:
        env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, "-c", body],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"subprocess failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )


def test_dryrun_multichip_driver_contract():
    """The exact call the driver makes, in the exact env the driver has."""
    _run_in_production_env(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )


def test_dryrun_multichip_after_backend_init():
    """dryrun must recover even if something already initialised a live
    single-device backend in the same process (clear + re-provision path).

    Uses a 1-device CPU backend as the pre-initialised platform (NOT the
    tunneled TPU: the suite must not depend on tunnel health; the
    clear+reinit code path is identical)."""
    _run_in_production_env(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8  # live backend: too few devices\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n",
        extra_env={"JAX_PLATFORMS": "cpu"},
    )


def _cpu_env() -> dict:
    """Env for subprocesses that are MEANT to run on CPU.  The axon TPU
    plugin does not honor JAX_PLATFORMS=cpu as an env var (CLAUDE.md), so
    with /root/.axon_site on PYTHONPATH these "CPU" subprocesses were
    actually initializing the tunneled TPU — and hung the suite whenever
    the tunnel was down.  Strip the plugin's site dir from PYTHONPATH so
    CPU means CPU and the tests are independent of tunnel health."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    parts = [q for q in env.get("PYTHONPATH", "").split(os.pathsep)
             if q and ".axon_site" not in q]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def test_bench_prints_exactly_one_json_line():
    """Driver contract: `python bench.py` prints exactly ONE JSON line on
    stdout (warnings/fallback notes go to stderr).  Run on CPU at tiny
    sizes; the driver runs the same file on the real TPU."""
    import json

    env = _cpu_env()
    proc = subprocess.run(
        [sys.executable, "bench.py", "--batch", "256", "--t", "20",
         "--iters", "1"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected 1 stdout line, got {lines}"
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_bench_section_cli():
    """--section runs exactly one --full section (host-only 'ingest' keeps
    this off the device) and rejects unknown names."""
    import json

    env = _cpu_env()
    proc = subprocess.run(
        [sys.executable, "bench.py", "--section", "ingest"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    metrics = {json.loads(l)["metric"] for l in lines}
    assert "ingest_python_cdr_msgs_per_sec" in metrics
    assert not any(m.startswith("fossen_rk4_steps") for m in metrics)

    proc = subprocess.run(
        [sys.executable, "bench.py", "--section", "nope"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    assert "unknown --section" in proc.stderr


def test_dryrun_fails_on_broken_psum(monkeypatch):
    """The dryrun's equality assertions must CATCH a wrong sharded value,
    not just a NaN (round-4 VERDICT weak-item 5).  Two sabotage modes:

    - a DROPPED psum leaves per-shard partials -> shard_map's static
      replication check refuses the out_specs (fails fast, good);
    - a SCALED psum is properly replicated but numerically wrong — only
      the single-device equality cross-checks can catch it, and must.
    """
    import jax

    real_psum = jax.lax.psum

    # dropped reduce: fails (statically or numerically), either way fails
    monkeypatch.setattr(jax.lax, "psum", lambda x, axis_name, **kw: x)
    with np.testing.assert_raises(Exception):
        graft.dryrun_multichip(8)

    # scaled reduce: finite, replicated, WRONG — must trip the
    # "deviates from single-device reference" assertion specifically
    monkeypatch.setattr(
        jax.lax, "psum",
        lambda x, axis_name, **kw: real_psum(x, axis_name, **kw) * 2.0,
    )
    try:
        graft.dryrun_multichip(8)
    except AssertionError as e:
        assert "deviates" in str(e)
    else:
        raise AssertionError(
            "dryrun accepted a 2x-scaled psum — equality checks missing")
