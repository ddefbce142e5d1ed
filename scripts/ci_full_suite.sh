#!/usr/bin/env bash
# Full-tier test run (fast tier + @pytest.mark.slow end-to-end tests).
# Intended to run in the background while development continues:
#   bash scripts/ci_full_suite.sh & tail -f /tmp/siss_full_suite.log
set -u
LOG=${1:-/tmp/siss_full_suite.log}
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --runslow 2>&1 | tee "$LOG"
