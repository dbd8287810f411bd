"""Driver-contract smoke tests."""

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    mod = _load_entry_module()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query; queries without oracle = rows-only
    assert set(os_) <= set(qs)
