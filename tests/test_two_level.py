"""North-star criterion: identical violation rows per partition at N and 4N
parallelism — fresh local[2] and local[8] JVMs replaying every fixture."""

import subprocess
import sys


def test_fixture_rows_identical_at_two_parallelism_levels():
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/two_level_fixtures.py"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "IDENTICAL" in r.stdout
