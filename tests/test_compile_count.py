"""Executable-count regression guard (VERDICT r4 item 6).

The round-4 fusion work cut the 6-view stitch from 69 compiled
executables to 14; on the axon relay every DISTINCT executable costs a
~17 s AOT round-trip, so count regressions directly inflate first-run
latency. This test compiles the 6-view bench workload on the CPU backend
(same trace -> same executable set as TPU) in a subprocess (isolated jax
config/logging) and pins the count.

Budget: 16 = the measured r5 count (13: one executable per fused stage,
3 BA LM shape groups) plus small slack for borderline library-version
differences. A legitimate increase (a new stage) should raise the budget
in the same commit with a note here.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_6VIEW = 16


@pytest.mark.slow
def test_six_view_executable_count():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "count_compiles.py"),
         "6view"],
        capture_output=True, text=True, timeout=2400,
        cwd=REPO,
    )
    m = re.search(r"=== 6view: (\d+) compiled executables", out.stdout)
    assert m, f"count_compiles produced no summary:\n{out.stdout[-2000:]}\n{out.stderr[-1000:]}"
    count = int(m.group(1))
    assert count <= BUDGET_6VIEW, (
        f"6-view stitch now compiles {count} executables "
        f"(budget {BUDGET_6VIEW}) — every extra one costs a relay AOT "
        f"round-trip; see tools/count_compiles.py output for the new sites"
    )
