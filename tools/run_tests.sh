#!/usr/bin/env bash
# Run the full suite the way the README describes: two pytest processes.
#
# On slow 2-core hosts a single process takes hours and has hit a flaky
# XLA-CPU compiler abort deep into the run; splitting roughly in half
# (alphabetical) avoids both.  Each process still runs on the 8-virtual-
# device CPU mesh (tests/conftest.py sets the XLA flags).
set -euo pipefail
cd "$(dirname "$0")/.."

FIRST=(tests/test_advect_fast.py tests/test_api.py tests/test_checkpoint.py
       tests/test_dist.py tests/test_flow.py tests/test_golden.py
       tests/test_native.py)
REST=()
for f in tests/test_*.py; do
    skip=0
    for g in "${FIRST[@]}"; do [[ "$f" == "$g" ]] && skip=1; done
    [[ $skip == 0 ]] && REST+=("$f")
done

python -m pytest "${FIRST[@]}" -q "$@"
python -m pytest "${REST[@]}" -q "$@"
