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


def _names(names: list[str] | None) -> list[str]:
    if names is not None:
        return list(names)
    from . import QUERIES

    return list(QUERIES)


def backlog(repo_root: str = _REPO,
            names: list[str] | None = None) -> list[str]:
    """Registered queries with no driver history, in registry order."""
    seen = driver_checked(repo_root)
    return [n for n in _names(names) if n not in seen]


def rotation_order(repo_root: str = _REPO,
                   names: list[str] | None = None) -> list[str]:
    """The standing-policy prefix order: never-checked first (registry
    order), then ascending last-checked round (stalest evidence first),
    ties broken by registry order."""
    lc = last_checked(repo_root)
    ns = _names(names)
    pos = {n: i for i, n in enumerate(ns)}
    return sorted(ns, key=lambda n: (lc.get(n, -1), pos[n]))


def prefix(new_this_round: list[str], size: int = 50,
           repo_root: str = _REPO,
           names: list[str] | None = None) -> list[str]:
    """THE driver-prefix policy (VERDICT r7 #4), computed from the
    CORRECTNESS artifacts each time the package imports — rotation can
    no longer drift from this module:

    1. queries NEW this round lead (new code carries the most risk);
    2. then the rest of :func:`rotation_order` — never-driver-checked
       first, back-filled with the least-recently-checked so evidence
       stays fresh.

    The result is stable-by-construction across the round boundary: the
    moment the driver writes CORRECTNESS_r{N}.json, the next import
    recomputes a prefix consistent with the new evidence, so the test
    asserting ``list(QUERIES)[:50] == prefix(...)`` never goes stale
    (the r7 board's one red was a prefix test falsified by the driver's
    own artifact)."""
    ns = _names(names)
    known = set(ns)
    new = [n for n in new_this_round if n in known]
    seen = set(new)
    rest = [n for n in rotation_order(repo_root, ns) if n not in seen]
    return (new + rest)[:size]


if __name__ == "__main__":
    b = backlog()
    print(f"driver-checked: {len(driver_checked())}")
    print(f"backlog ({len(b)}):")
    for n in b:
        print(f"  {n}")
