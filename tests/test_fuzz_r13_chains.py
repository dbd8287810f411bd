"""A fixed-seed slice of the r13 differential fuzzer runs with the
suite, so the randomized families (PQ rotation chain, stable-prefix
verifies, minhash sizing regimes, sketch merge algebra) keep executing
against their DuckDB oracles every round — the full 120-draw sweep is
scripts/fuzz_r13.py (artifact: scripts/fuzz_r13.json). Seeds here are
pinned: two per family from the recorded sweep, plus the seed that
CAUGHT the empty-batch refresh crash (20260818001 — kept forever as the
family's proof it can find real bugs)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import fuzz_r13  # noqa: E402


@pytest.mark.parametrize("fam,seed", [
    ("pq", 20260817000),
    ("pq", 20260817005),
    ("prefix", 20260818000),
    ("prefix", 20260818001),  # the r13 catch: empty ingest batch
    ("minhash", 20260819000),
    ("sketch", 20260820000),
    ("sketch", 20260820001),
])
def test_fuzz_draw(spark, fam, seed):
    r = fuzz_r13.FAMILIES[fam][0](spark, seed)
    assert r["ok"], (r["params"], r["mismatches"])
