"""CI shard map completeness guard.

The CI workflow (.github/workflows/ci.yml) runs the suite as a matrix over
the shard groups in ci/shards.json.  A test file missing from that map
would silently never run in CI — the exact class of silent gap the CI gate
exists to close (reference ships build-only CI, /root/reference/.github/
workflows/ci.yml; this repo gates on the tests too) — so the map itself is
asserted complete and duplicate-free here.
"""

import glob
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_test_file_is_in_exactly_one_shard():
    with open(os.path.join(REPO_ROOT, "ci", "shards.json")) as f:
        shards = json.load(f)["shards"]
    mapped = [p for group in shards.values() for p in group]
    assert len(mapped) == len(set(mapped)), "duplicate entries in ci/shards.json"
    on_disk = {
        os.path.relpath(p, REPO_ROOT)
        for p in glob.glob(os.path.join(REPO_ROOT, "tests", "test_*.py"))
    }
    missing = on_disk - set(mapped)
    stale = set(mapped) - on_disk
    assert not missing, f"test files missing from ci/shards.json: {sorted(missing)}"
    assert not stale, f"ci/shards.json lists nonexistent files: {sorted(stale)}"
