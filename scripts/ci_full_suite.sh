#!/usr/bin/env bash
# Full-tier test run (fast tier + @pytest.mark.slow end-to-end tests).
# Intended to run in the background while development continues:
#   bash scripts/ci_full_suite.sh & tail -f /tmp/siss_full_suite.log
set -u
LOG=${1:-/tmp/siss_full_suite.log}
cd "$(dirname "$0")/.."
# Build the native C++ batch assembler first so its parity tests RUN in CI
# instead of silently importorskip-ing on a clean checkout (user installs
# still degrade to the numpy path when the build is unavailable).
python scripts/build_native.py || echo "WARNING: native build failed; batcher tests will skip"
python -m pytest tests/ -q --runslow 2>&1 | tee "$LOG"
