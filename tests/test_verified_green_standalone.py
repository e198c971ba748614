"""_verified_green() must be callable standalone (VERDICT r13 task
3): a fresh interpreter that never called queries() still needs the
ledger check to work — _green_rounds reads registry.ORACLES and
_source_hash reads registry.QUERIES, both empty until load_all()
runs, which _verified_green now guarantees itself."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_verified_green_in_fresh_interpreter():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __spark_entry__ as e; "
            "g = e._verified_green(); "
            "assert isinstance(g, set); "
            "print(len(g))",
        ],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert int(proc.stdout.strip()) >= 0


def test_ordered_names_in_fresh_interpreter():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __spark_entry__ as e; "
            "n = e._ordered_names(); "
            "assert len(n) >= 200, len(n); "
            "print(len(n))",
        ],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
