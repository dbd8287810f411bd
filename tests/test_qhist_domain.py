"""qhist bucket-0 domain contract: bucket 0 admits every v <= 0 (and,
via the BIGINT truncation, fractional values in (0, 1)), so its lower
bound must be NULL (unbounded below) — never a false "0" that would
claim a negative order statistic lies in [0, 0]."""

from activedata_etl_spark.functions import qhist as QH


def test_bucket0_lower_bound_is_null_for_negative_data(spark):
    df = spark.createDataFrame(
        [("g", v) for v in [-37, -5, -1, 0, 3, 9]], ["g", "v"])
    regs = QH.qhist_registers(df, ["g"], "v")
    out = QH.qhist_quantile_bounds(
        regs, ["g"], {"p25": (1, 4), "p99": (99, 100)}).collect()[0]
    # rank ceil(0.25*6)=2 → value -5 → bucket 0: lo NULL, hi 0, and the
    # envelope claim (-inf, 0] really does contain -5
    assert out["p25_bucket"] == 0
    assert out["p25_lo"] is None
    assert out["p25_hi"] == 0
    # rank ceil(0.99*6)=6 → value 9 → bucket 4: [8, 15] contains 9
    assert out["p99_bucket"] == 4
    assert out["p99_lo"] == 8 and out["p99_hi"] == 15


def test_positive_data_bounds_unchanged(spark):
    df = spark.createDataFrame([("g", v) for v in [1, 2, 4, 100]],
                               ["g", "v"])
    out = QH.qhist_quantile_bounds(
        QH.qhist_registers(df, ["g"], "v"),
        ["g"], {"p50": (1, 2)}).collect()[0]
    # rank 2 → value 2 → bucket 2: [2, 3]
    assert out["p50_lo"] == 2 and out["p50_hi"] == 3
