"""Oracle vs patched reference binary (the full conformance chain).

Compiles a patched scratch copy of /root/reference (crash defects D1/D2
fixed, sources untouched) and checks the oracle reproduces its query
output on the fixture corpus — excluding terms hit by the reference's
own data-loss defects D3/D4/D7 (SURVEY.md §8).  Skipped when no C
compiler is available.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not Path("/root/reference/src").is_dir(),
    reason="needs gcc + the reference sources",
)


def test_oracle_matches_patched_binary():
    res = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "tools" / "validate_oracle_vs_reference.py")],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-1000:]
    assert "PASS" in res.stdout
