"""Regression tests for the driver entry points (__graft_entry__.py)."""

import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
