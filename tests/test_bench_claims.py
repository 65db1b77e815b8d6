"""README benchmark claims must match the newest driver capture.

Round-3 verdict Weak #2: README quoted round-2 numbers one round after the
driver record moved. The claims block in README.md is generated
(scripts/update_readme_bench.py) from the newest BENCH_r<N>.json; this test
fails the fast tier whenever the two drift — including at the start of a new
round after the driver writes a fresh capture. The fix is always:

    python scripts/update_readme_bench.py
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_claims_match_newest_capture():
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "update_readme_bench.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr or res.stdout


def test_readme_has_no_stray_headline_claims():
    """Patches/s headline claims may only live inside the generated block
    (where the drift check sees them)."""
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    begin = readme.index("BENCH_CLAIMS:BEGIN")
    end = readme.index("BENCH_CLAIMS:END")
    outside = readme[:begin] + readme[end:]
    assert not re.search(r"\d+\.\d+\s*patches/s", outside), (
        "hand-written patches/s claim outside the generated BENCH_CLAIMS "
        "block — move it inside or drop it"
    )
