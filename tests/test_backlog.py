"""Driver-evidence bookkeeping is DERIVED, not hand-counted (the r6
notes said 53 never-driver-checked remained; the true count was 68 —
VERDICT r6 "What's wrong" #1). These tests pin the derivation and the
rotation invariants so the arithmetic can never drift again."""

from activedata_etl_spark.queries import QUERIES, _FRONT
from activedata_etl_spark.queries import backlog as BL


def test_backlog_is_registry_minus_driver_history():
    lc = BL.last_checked()
    b = BL.backlog()
    assert set(b) == set(QUERIES) - set(lc)
    # every backlog entry really is registered, no phantom names
    assert all(n in QUERIES for n in b)


def test_front_entries_are_all_registered():
    assert all(n in QUERIES for n in _FRONT)
    assert len(set(_FRONT)) == len(_FRONT)  # no duplicate slots


def test_driver_prefix_is_first_time_evidence():
    """The driver samples a 50-entry prefix of the registry. Until the
    backlog retires, every prefix slot must be FIRST-TIME driver
    evidence: either never-driver-checked backlog or a query so new it
    has no CORRECTNESS history yet (same thing, derived)."""
    checked = BL.driver_checked()
    prefix = list(QUERIES)[:50]
    stale = [n for n in prefix if n in checked]
    assert not stale, f"prefix wastes driver slots on already-checked: {stale}"


def test_prefix_holds_50_until_backlog_retires():
    b = BL.backlog()
    if len(b) >= 50:
        assert len(_FRONT) >= 50


def test_rotation_order_policy():
    """Once the backlog retires: never-checked first, then stalest
    driver evidence first (the standing freshness policy, VERDICT r6
    #4)."""
    lc = BL.last_checked()
    order = BL.rotation_order()
    assert set(order) == set(QUERIES)
    rounds = [lc.get(n, -1) for n in order]
    assert rounds == sorted(rounds)
