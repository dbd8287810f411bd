"""Driver-evidence bookkeeping, derived PROGRAMMATICALLY from the
``CORRECTNESS_r*.json`` artifacts instead of by hand (the r6 notes
undercounted the never-driver-checked backlog 53 vs the true 68 —
VERDICT r6 "What's wrong" #1; this module is the fix).

Definitions:

- driver-checked: a query name appears in ANY round's CORRECTNESS file
  (the external verify driver ran it against its DuckDB oracle).
- backlog: registered queries with NO driver history, in registry
  order. The driver samples a 50-entry PREFIX of the registry each
  round, so the rotation plan = put backlog entries (newest code
  first) in ``_FRONT`` until the class is empty.
- standing policy once the backlog retires (VERDICT r6 #4): queries
  NEW this round lead the prefix (new code carries the most risk),
  back-filled with the LEAST-RECENTLY-driver-checked entries so
  evidence stays fresh; ``last_checked`` makes that mechanical.
"""

from __future__ import annotations

import glob
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def correctness_files(repo_root: str = _REPO) -> list[str]:
    return sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))


def last_checked(repo_root: str = _REPO) -> dict[str, int]:
    """query name → latest round number whose CORRECTNESS file records
    it (regardless of pass/fail — it's an evidence-freshness map, the
    pass/fail signal lives in the artifact itself)."""
    out: dict[str, int] = {}
    for f in correctness_files(repo_root):
        base = os.path.basename(f)
        digits = "".join(c for c in base if c.isdigit())
        rnd = int(digits) if digits else 0
        try:
            names = json.load(open(f)).keys()
        except (OSError, json.JSONDecodeError):
            continue
        for n in names:
            out[n] = max(out.get(n, 0), rnd)
    return out


def driver_checked(repo_root: str = _REPO) -> set[str]:
    return set(last_checked(repo_root))


def backlog(repo_root: str = _REPO) -> list[str]:
    """Registered queries with no driver history, in registry order."""
    from . import QUERIES

    seen = driver_checked(repo_root)
    return [n for n in QUERIES if n not in seen]


def rotation_order(repo_root: str = _REPO) -> list[str]:
    """The standing-policy prefix order once every query has history:
    never-checked first (registry order — new queries register at the
    front via _FRONT), then ascending last-checked round (stalest
    evidence first), ties broken by registry order."""
    from . import QUERIES

    lc = last_checked(repo_root)
    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (lc.get(n, -1), pos[n]))


if __name__ == "__main__":
    b = backlog()
    print(f"driver-checked: {len(driver_checked())}")
    print(f"backlog ({len(b)}):")
    for n in b:
        print(f"  {n}")
