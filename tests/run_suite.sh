#!/bin/bash
# Chunked full-suite runner.
#
# Why this exists: a single-process `pytest tests/ -q` accumulates
# hundreds of XLA:CPU compiled executables over its lifetime and has
# segfaulted inside `backend_compile_and_load` twice, each time >60 min
# into the run under load (different test each time — a process-lifetime
# pathology, not a test bug).  Running the suite as a handful of
# separate pytest processes bounds per-process compile-cache growth and
# sidesteps it.  Each chunk still shares tests/conftest.py (CPU backend,
# 8 virtual devices, x64).
#
# Usage: bash tests/run_suite.sh            (from the repo root)
# Exit code: 0 iff every chunk passed.
set -u
cd "$(dirname "$0")/.."

CHUNKS=(
  "tests/test_apps.py"
  "tests/test_control.py tests/test_estimation.py tests/test_guidance.py"
  "tests/test_bag_pipeline.py tests/test_bag_sqlite.py tests/test_bagmeta.py tests/test_bench_helpers.py tests/test_data.py tests/test_eval_koopman_di.py tests/test_fossen.py tests/test_fossen_soa.py tests/test_golden.py"
  "tests/test_graft_entry.py tests/test_implicit.py tests/test_native_cdr.py tests/test_ops.py tests/test_packaging.py tests/test_pallas_eval.py tests/test_pallas_quat.py tests/test_pallas_rollout.py tests/test_parallel.py"
  "tests/test_pinc.py tests/test_reference_parity.py tests/test_sysid.py tests/test_tether.py tests/test_typesys.py tests/test_viz.py"
)

# guard: a test file missing from every chunk would silently not run
all_chunks="${CHUNKS[*]}"
for f in tests/test_*.py; do
  if ! grep -qF "$f" <<< "$all_chunks"; then
    echo "ERROR: $f is not in any chunk — add it to CHUNKS" >&2
    exit 2
  fi
done

fail=0
for chunk in "${CHUNKS[@]}"; do
  echo "=== chunk: $chunk ==="
  # shellcheck disable=SC2086  # word-splitting the chunk is intentional
  python -m pytest $chunk -q --no-header 2>&1 | tail -4
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "=== chunk FAILED (rc=$rc): $chunk ==="
    fail=1
  fi
done

if [ "$fail" -eq 0 ]; then
  echo "ALL CHUNKS PASSED"
else
  echo "SUITE FAILED"
fi
exit $fail
