"""Generated doc tables must match the records they are rendered from.

The measured tables in BASELINE.md / README.md / benchmarks/README.md
are generated from benchmarks/results.json and BENCH_r*.json by
benchmarks/gen_tables.py (round-2 verdict: hand-synced copies drifted).
This guard fails when a record changed without regenerating the docs —
fix with: python benchmarks/gen_tables.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generated_tables_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "gen_tables.py"),
         "--check"],
        cwd=REPO, capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, (
        "generated doc tables are stale — run "
        f"`python benchmarks/gen_tables.py`:\n{proc.stderr}")
