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


def test_windowed_qhist_bounds_negative_and_zero(spark):
    """qhist_bounds_over honors the module's domain contract per FRAME:
    bucket 0 (every v <= 0) reports lo NULL / hi 0, and the envelope
    holds for negative data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from activedata_etl_spark.operators import windows as W

    rows = [(i, float(v)) for i, v in enumerate(
        [-5, -1, 0, 0.4, 1, 3, 7, 9, 100, 1000])]
    df = spark.createDataFrame(rows, "i int, v double")
    w = Window.partitionBy().orderBy("i").rowsBetween(-3, 0)
    out = W.qhist_bounds_over(df, "v", w, {"p50": (1, 2)}) \
        .orderBy("i").collect()
    # exact trailing-4 medians (rank ceil(n/2)) for cross-checking
    for r in out:
        if r["p50_bucket"] == 0:
            assert r["p50_lo"] is None and r["p50_hi"] == 0
        else:
            assert r["p50_lo"] == 2 ** (r["p50_bucket"] - 1)
            assert r["p50_hi"] == 2 ** r["p50_bucket"] - 1
    # first rows see only non-positive values -> bucket 0
    assert out[0]["p50_bucket"] == 0 and out[2]["p50_bucket"] == 0
    # the 1000 tail: frame [7, 9, 100, 1000], rank 2 -> 9 -> bucket 4
    assert out[-1]["p50_bucket"] == 4
    assert out[-1]["n_frame"] == 4


def test_windowed_qhist_matches_exact_bucket(spark):
    """Register-selected bucket == bucket of the exact rank statistic on
    every frame (monotone-truncation argument) — checked against the
    exact collect-the-frame path on a frame too mixed to eyeball."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from activedata_etl_spark.functions.qhist import _bucket
    from activedata_etl_spark.operators import windows as W

    df = spark.range(200).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("i"),
        ((F.col("id") * 37 % 113) - 10).cast("double").alias("v"))
    w = Window.partitionBy("g").orderBy("i").rowsBetween(-9, 0)
    rank = F.expr("CAST((n_frame * 19 + 19) DIV 20 AS BIGINT)")
    out = (W.qhist_bounds_over(df, "v", w, {"p95": (19, 20)})
           .withColumn("exact", F.element_at(
               F.array_sort(F.collect_list("v").over(w)),
               rank.cast("int"))))
    bad = out.filter(
        F.col("p95_bucket") != _bucket(F.col("exact"))).count()
    assert bad == 0
