#!/bin/sh
# Full verification: default (fast) suite, then the slow-marked gates
# (Pallas interpret-mode parity, TF cross-validation, spatial sharding,
# app smoke tests). The slow gates are excluded from the default pytest
# run by pytest.ini; this script exists so they cannot silently rot.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -x -q
python -m pytest tests/ -x -q -m slow
python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
"
echo "CI: all suites green"
