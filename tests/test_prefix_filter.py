"""Prefix-filter exact similarity join + histogram robust means.

The registry pairs prove value parity against the blind all-pairs
oracle at sweep scale; here the claims the oracle can't see are pinned:
recall == brute force on a corpus where blocking could plausibly miss
(a planted dup chain + noise docs), the no-cartesian plan shape, and
the robust-mean rank arithmetic on hand-checkable groups.
"""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.ext.text import shingles, tokens
from activedata_etl_spark.functions import aggs as AGG
from activedata_etl_spark.io import load_table


def _brute_pairs(df, threshold):
    sh = df.select(F.col("doc_id").alias("id"),
                   shingles(tokens("text")).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = (a.join(b, F.col("id_a") < F.col("id_b"))
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("inter"))
         .filter(F.col("inter") > 0)
         .withColumn("jaccard", F.col("inter") / F.col("uni"))
         .filter(F.col("jaccard") >= threshold))
    return {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in j.collect()}


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_recall_matches_brute_force(spark, sf_dir, threshold):
    d = load_table(spark, sf_dir, "documents").limit(120)
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
           for r in DD.prefix_filter_pairs(
               d, "doc_id", "text", threshold=threshold).collect()}
    assert got == _brute_pairs(d, threshold)


def test_token_mode_and_fp_boundary(spark):
    # 10-token sets sharing exactly 7 of 13 union tokens: J = 7/13 ≈ 0.538
    # passes t=0.5 but sits near the ceil(t*n) boundary where a naive
    # float ceil(10*0.7) could flip — exercised at t=0.7 with J=7/13 < 0.7
    # (excluded) and a full-dup pair (J=1.0, included).
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g x y z"),
        (3, "a b c d e f g h i j"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in DD.prefix_filter_pairs(
        d, "doc_id", "text", threshold=0.7, shingle_n=None).collect()}
    assert got == {(1, 3)}
    got5 = {(r["id_a"], r["id_b"]) for r in DD.prefix_filter_pairs(
        d, "doc_id", "text", threshold=0.5, shingle_n=None).collect()}
    assert got5 == {(1, 2), (1, 3), (2, 3)}


def test_no_cartesian_in_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    plan = DD.prefix_filter_pairs(d, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_trimmed_means_hand_checked(spark):
    # group g: values 1..10 → k=1, trimmed = mean(2..9) = 5.5,
    # winsorized = (2 + 2..9 + 9)/10 = 5.5, mean = 5.5
    # group h: [1, 1, 1, 100] → k=0 → all three equal the plain mean
    rows = ([("g", float(v)) for v in range(1, 11)]
            + [("h", 1.0), ("h", 1.0), ("h", 1.0), ("h", 100.0)])
    d = spark.createDataFrame(rows, ["grp", "v"])
    out = {r["grp"]: r for r in AGG.trimmed_means_histogram(
        d, ["grp"], "v", trim=0.1).collect()}
    g = out["g"]
    assert (g["n"], g["k"]) == (10, 1)
    assert g["mean"] == g["trimmed_mean"] == g["winsorized_mean"] == 5.5
    h = out["h"]
    assert (h["n"], h["k"]) == (4, 0)
    assert h["trimmed_mean"] == h["winsorized_mean"] == h["mean"] == 25.75


def test_trimmed_means_tie_heavy_group(spark):
    # 20 copies of 5 with one 0 and one 100 tail each: k=2 clips the
    # whole of both tails plus one 5 from each side
    rows = [("t", 0.0), ("t", 0.0)] + [("t", 5.0)] * 20 + \
        [("t", 100.0), ("t", 100.0)]
    d = spark.createDataFrame(rows, ["grp", "v"])
    r = AGG.trimmed_means_histogram(d, ["grp"], "v", trim=0.1).first()
    assert (r["n"], r["k"]) == (24, 2)
    assert r["trimmed_mean"] == 5.0
    # winsorized: tails become the boundary value 5 → all 24 rows at 5
    assert r["winsorized_mean"] == 5.0


def test_spearman_hand_checked(spark):
    # g: perfectly monotonic -> 1.0; h: perfectly reversed -> -1.0
    rows = ([("g", float(i), float(i * i)) for i in range(1, 9)]
            + [("h", float(i), float(-i)) for i in range(1, 9)])
    d = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r["grp"]: r for r in AGG.spearman_corr(
        d, ["grp"], "x", "y").collect()}
    assert out["g"]["spearman"] == 1.0
    assert out["h"]["spearman"] == -1.0


def test_spearman_ties_match_scipy_convention(spark):
    # x = [1,1,2,3], y = [10,20,20,30]: average-rank tie handling.
    # Hand computation with avg ranks x=[1.5,1.5,3,4], y=[1,2.5,2.5,4]:
    # rho = 0.7378647873726218 (pearson of the rank vectors)
    rows = [("t", 1.0, 10.0), ("t", 1.0, 20.0),
            ("t", 2.0, 20.0), ("t", 3.0, 30.0)]
    d = spark.createDataFrame(rows, ["grp", "x", "y"])
    r = AGG.spearman_corr(d, ["grp"], "x", "y").first()
    assert r["n"] == 4
    import math
    # pearson of [1.5,1.5,3,4] vs [1,2.5,2.5,4] via the same closed form
    xs, ys = [1.5, 1.5, 3.0, 4.0], [1.0, 2.5, 2.5, 4.0]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxx, syy = sum(v * v for v in xs), sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r["spearman"] - rho) < 1e-12


def test_cross_table_join_matches_brute_force(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(150)
    left = d.filter(F.col("doc_id") % 3 == 0)
    right = d.filter(F.col("doc_id") % 3 != 0)
    got = {(r["left_id"], r["right_id"], round(r["jaccard"], 9))
           for r in DD.prefix_filter_join(
               left, right, "doc_id", "text", threshold=0.4).collect()}
    # brute force over the cross pairs, reoriented to (left, right)
    brute = _brute_pairs(d, 0.4)
    want = set()
    for ia, ib, j in brute:
        a_left, b_left = ia % 3 == 0, ib % 3 == 0
        if a_left and not b_left:
            want.add((ia, ib, j))
        elif b_left and not a_left:
            want.add((ib, ia, j))
    assert got == want


def test_cross_table_verbatim_leak_is_reported(spark):
    rows_l = [(1, "the quick brown fox jumps over the lazy dog today")]
    rows_r = [(2, "the quick brown fox jumps over the lazy dog today"),
              (3, "completely different words appear in this other document")]
    left = spark.createDataFrame(rows_l, ["doc_id", "text"])
    right = spark.createDataFrame(rows_r, ["doc_id", "text"])
    got = {(r["left_id"], r["right_id"], r["jaccard"])
           for r in DD.prefix_filter_join(
               left, right, "doc_id", "text", threshold=0.9).collect()}
    assert got == {(1, 2, 1.0)}


def test_equidepth_bins_hand_checked(spark):
    # 16 distinct values 1..16 in one group, k=4: edges at ranks
    # ceil(4/4·b) = 4, 8, 12 → values 4.0, 8.0, 12.0
    rows = [("g", float(v)) for v in range(1, 17)]
    d = spark.createDataFrame(rows, ["grp", "v"])
    out = sorted((r["bin"], r["edge"]) for r in AGG.equidepth_bins(
        d, ["grp"], "v", k=4).collect())
    assert out == [(1, 4.0), (2, 8.0), (3, 12.0)]


def test_equidepth_bins_tie_heavy(spark):
    # all mass on one value: every edge collapses to it
    rows = [("t", 7.0)] * 9
    d = spark.createDataFrame(rows, ["grp", "v"])
    out = {(r["bin"], r["edge"]) for r in AGG.equidepth_bins(
        d, ["grp"], "v", k=3).collect()}
    assert out == {(1, 7.0), (2, 7.0)}


def test_kendall_tau_hand_checked(spark):
    import math
    # no ties: x=[1,2,3,4], y=[1,3,2,4] -> C=5, D=1, tau = 4/6
    rows = [("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 3.0, 2.0),
            ("g", 4.0, 4.0)]
    # with ties: x=[1,1,2], y=[1,2,3] -> C=2, D=0, n1=1, n2=0,
    # tau_b = 2/sqrt(3*2... ) = 2/sqrt((3-1)*(3-0))
    rows += [("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 3.0)]
    d = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r["grp"]: r for r in AGG.kendall_tau_histogram(
        d, ["grp"], "x", "y").collect()}
    assert abs(out["g"]["kendall_tau"] - 4.0 / 6.0) < 1e-15
    assert abs(out["t"]["kendall_tau"] - 2.0 / math.sqrt(6.0)) < 1e-15


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_aggregate_pair_bound_is_exact(spark, sf_dir, threshold):
    """The PPJoin+-flavored aggregate bound (o <= c + min(n_a - pa_max,
    n_b - pb_max) over ALL shared prefix rows) must keep every true
    pair — verifying its candidates reproduces the brute-force answer —
    and must never be looser than needed: its candidate set is a subset
    of the per-row positional filter's."""
    d = load_table(spark, sf_dir, "documents").limit(120)
    cand_pos, tok, pref = DD.prefix_candidates(
        d, "doc_id", "text", threshold=threshold)
    cand_agg, tok2, pref2 = DD.prefix_candidates(
        d, "doc_id", "text", threshold=threshold, pair_bound="aggregate")
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
           for r in DD.jaccard_pairs_counts(
               cand_agg, tok2, "__id__",
               threshold=float(threshold)).collect()}
    assert got == _brute_pairs(d, threshold)
    pos = {(r["id_a"], r["id_b"]) for r in cand_pos.collect()}
    agg = {(r["id_a"], r["id_b"]) for r in cand_agg.collect()}
    assert agg <= pos  # strictly tighter-or-equal blocking
    for t in (tok, pref, tok2, pref2):
        t.unpersist()


def test_kendall_sampled_estimates_monotone_association(spark):
    """Estimator sanity: on a perfectly monotone continuous relation
    the sampled tau is exactly 1 (every sampled pair concordant); on a
    perfectly anti-monotone one it's exactly -1; and the counts always
    satisfy C + D + T = M."""
    rows = [("g", float(i), i * 2.5 + 1.0, i) for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "x", "y", "k"])
    up = AGG.kendall_tau_sampled(df, ["g"], "x", "y",
                                 pair_keys=["k"]).collect()[0]
    assert up["tau_sampled"] == 1.0
    assert up["concordant"] == up["n_pairs"] and up["ties"] == 0
    down = AGG.kendall_tau_sampled(
        df.withColumn("y", -df.y), ["g"], "x", "y",
        pair_keys=["k"]).collect()[0]
    assert down["tau_sampled"] == -1.0
    assert (down["concordant"] + down["discordant"] + down["ties"]
            == down["n_pairs"])


def test_jx_pair_bound_knob_result_invariant(spark, sf_dir):
    """The jx op accepts pair_bound and the answer is bound-invariant
    (both filters are exact — only candidate volume differs)."""
    from activedata_etl_spark.io import register_views
    from activedata_etl_spark.plans import query as JXP

    register_views(spark, sf_dir)

    def run(bound):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in JXP.run(spark, {
                "from": {"op": "prefix_filter_pairs",
                         "table": "documents", "threshold": 0.5,
                         "pair_bound": bound}}).collect())

    pos, agg = run("positional"), run("aggregate")
    assert pos == agg and len(pos) > 0


def test_pair_bound_typo_fails_loud(spark, sf_dir):
    """pair_bound is validated (r7 ADVICE #4): a typo must raise, not
    silently run the other (also-exact) filter and corrupt
    blocking-audit comparisons."""
    import pytest

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="pair_bound"):
        DD.prefix_filter_pairs(d, "doc_id", "text", threshold=0.5,
                               pair_bound="agregate").collect()


def test_stable_delta_verify_forms_identical(spark, sf_dir, tmp_path):
    """The two verify forms of prefix_join_stable_delta (long-form
    counts vs dictionary-encoded int-array intersect, r11) are the same
    exact math — identical pairs AND jaccard values at every threshold.
    The ids form exists for bulk shapes where candidates ≈ corpus (the
    knob's docstring carries the measured trade); a token-id collision
    would show up here as an inflated intersection."""
    import os as _os

    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    base = str(tmp_path / "ps")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
    DD.freeze_prefix_order(b0, "doc_id", "text", order)
    DD.append_positioned_index(b0, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(d.filter(F.pmod("doc_id", F.lit(4)) == 2),
                               "doc_id", "text", idx, 1, spark, order)
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    for thr in (0.3, 0.6):
        a = {(r.id_a, r.id_b, round(r.jaccard, 9))
             for r in DD.prefix_join_stable_delta(
                 spark, idx, order, delta, "doc_id", "text",
                 threshold=thr, verify="counts").collect()}
        for form in ("ids", "positional"):
            b = {(r.id_a, r.id_b, round(r.jaccard, 9))
                 for r in DD.prefix_join_stable_delta(
                     spark, idx, order, delta, "doc_id", "text",
                     threshold=thr, verify=form).collect()}
            assert a == b and a, form


def test_positional_verify_survives_order_refresh(spark, sf_dir, tmp_path):
    """The unseen→tid migration case (r12): batch 1 is ingested under
    an order frozen from batch 0 only, so its sets rows classify the
    new vocabulary into the unseen STRING array; refresh_prefix_order
    then assigns those elements tids WITHOUT rewriting any sets batch
    (stable-tid contract). A delta doc containing the migrated elements
    now puts them in its INT array — the query-time unseen resolution
    is what keeps the two representations comparable, and this test is
    the proof: positional == counts after the refresh, at two
    thresholds."""
    import os as _os

    d = load_table(spark, sf_dir, "documents")
    base = str(tmp_path / "ps2")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
    DD.freeze_prefix_order(b0, "doc_id", "text", order)
    DD.append_positioned_index(b0, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(d.filter(F.pmod("doc_id", F.lit(4)) == 2),
                               "doc_id", "text", idx, 1, spark, order)
    sets1 = _os.path.join(idx, "sets", "batch=1")
    mtimes_before = sorted(
        (_os.path.getmtime(_os.path.join(sets1, f)), f)
        for f in _os.listdir(sets1))
    res = DD.refresh_prefix_order(spark, idx, order)
    assert res["epoch"] >= 1
    # stable-tid contract: no sets batch was rewritten by the refresh
    assert mtimes_before == sorted(
        (_os.path.getmtime(_os.path.join(sets1, f)), f)
        for f in _os.listdir(sets1))
    # the refreshed order carries tids for ALL current vocabulary, and
    # batch 1's unseen strings (non-empty pre-refresh by construction)
    # are now tid-mapped — the exact migration the resolver handles
    o = spark.read.parquet(order)
    assert "tid" in o.columns
    assert o.filter(F.col("tid").isNull()).count() == 0
    unseen_cnt = (spark.read.parquet(sets1)
                  .agg(F.sum(F.size("unseen"))).collect()[0][0])
    assert unseen_cnt > 0, "fixture must exercise the migration path"
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    for thr in (0.3, 0.6):
        a = {(r.id_a, r.id_b, round(r.jaccard, 9))
             for r in DD.prefix_join_stable_delta(
                 spark, idx, order, delta, "doc_id", "text",
                 threshold=thr, verify="counts").collect()}
        b = {(r.id_a, r.id_b, round(r.jaccard, 9))
             for r in DD.prefix_join_stable_delta(
                 spark, idx, order, delta, "doc_id", "text",
                 threshold=thr, verify="positional").collect()}
        assert a == b and a


def test_tids_stable_and_bijective_across_refresh(spark, sf_dir, tmp_path):
    """Every element present before a refresh keeps its exact tid, new
    vocabulary gets fresh ids, and the full map stays bijective — a
    collision or reassignment would silently corrupt every stored
    int-array."""
    import os as _os

    d = load_table(spark, sf_dir, "documents")
    base = str(tmp_path / "ps3")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
    DD.freeze_prefix_order(b0, "doc_id", "text", order)
    DD.append_positioned_index(b0, "doc_id", "text", idx, 0, spark, order)
    before = {r["s"]: r["tid"]
              for r in spark.read.parquet(order).collect()}
    DD.append_positioned_index(d.filter(F.pmod("doc_id", F.lit(4)) == 2),
                               "doc_id", "text", idx, 1, spark, order)
    DD.refresh_prefix_order(spark, idx, order)
    after = {r["s"]: r["tid"]
             for r in spark.read.parquet(order).collect()}
    assert set(before) < set(after), "refresh must add batch-1 vocab"
    assert all(after[s] == t for s, t in before.items())
    assert len(set(after.values())) == len(after), "tids must be bijective"


def test_positional_verify_refuses_tidless_index(spark, sf_dir, tmp_path):
    """A pre-r12 index (order without tid, no sets sidecar) must raise,
    never silently fall back or miscount."""
    import os as _os

    import pytest as _pytest

    d = load_table(spark, sf_dir, "documents").limit(200)
    base = str(tmp_path / "ps4")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
    DD.freeze_prefix_order(b0, "doc_id", "text", order)
    # simulate the legacy layout: strip tid from the order, drop sets
    legacy = spark.read.parquet(order).select("s", "df", "epoch")
    legacy.write.mode("overwrite").parquet(order + ".legacy")
    import shutil as _shutil
    _shutil.rmtree(order)
    _os.replace(order + ".legacy", order)
    spark.catalog.refreshByPath(order)
    DD.append_positioned_index(b0, "doc_id", "text", idx, 0, spark, order)
    assert not _os.path.isdir(_os.path.join(idx, "sets"))
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    with _pytest.raises(ValueError, match="tid-carrying order"):
        DD.prefix_join_stable_delta(spark, idx, order, delta,
                                    "doc_id", "text",
                                    verify="positional").collect()


def test_default_verify_resolves_positional_then_falls_back(
        spark, sf_dir, tmp_path, monkeypatch):
    """r13 default flip: ``verify=None`` resolves to positional on a
    tid-carrying index with complete sets sidecars, and silently to
    counts on an index that cannot serve positional — same exact pairs
    either way, and never the loud refusal (which remains reserved for
    an EXPLICIT verify="positional" request)."""
    import os as _os
    import shutil as _shutil

    d = load_table(spark, sf_dir, "documents").limit(300)
    base = str(tmp_path / "ps5")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
    DD.freeze_prefix_order(b0, "doc_id", "text", order)
    DD.append_positioned_index(b0, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(d.filter(F.pmod("doc_id", F.lit(4)) == 2),
                               "doc_id", "text", idx, 1, spark, order)
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)

    def pairs(**kw):
        return {(r.id_a, r.id_b, round(r.jaccard, 9))
                for r in DD.prefix_join_stable_delta(
                    spark, idx, order, delta, "doc_id", "text",
                    threshold=0.3, **kw).collect()}

    # modern index: the resolver's structural predicate holds...
    assert DD._sets_complete(idx)
    want = pairs(verify="positional")
    assert pairs() == want and want  # ...and the default matches it
    # force the fallback leg without touching the index: the resolver
    # must route to counts, not raise
    monkeypatch.setattr(DD, "_sets_complete", lambda p: False)
    assert pairs() == want
    monkeypatch.undo()
    # genuinely degraded index (sets sidecar gone): default still
    # answers (counts), explicit positional still refuses loudly
    _shutil.rmtree(_os.path.join(idx, "sets"))
    assert not DD._sets_complete(idx)
    assert pairs() == want
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sets sidecar missing"):
        pairs(verify="positional")


def test_refresh_survives_empty_ingest_batch(spark, tmp_path):
    """r13 fuzzer catch (seed 20260818001): an ingest batch whose docs
    are ALL below the shingle width writes an empty rows directory —
    legitimate (a thin nightly delta) — and the incremental refresh
    crashed on the batch's NULL epoch aggregate (int(None)). The empty
    batch must be skipped (no manifest entry needed: the delta join's
    epoch guard aggregates per batch over rows, so an empty batch is
    invisible to it) and the refreshed index must keep answering."""
    import os as _os

    rows = [(i, f"alpha beta gamma w{i} delta epsilon") for i in range(20)]
    rows += [(100 + i, "xy") for i in range(3)]  # < shingle width
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    base = str(tmp_path / "ps6")
    idx, order = _os.path.join(base, "idx"), _os.path.join(base, "order")
    full = d.filter(F.col("doc_id") < 100)
    DD.freeze_prefix_order(full, "doc_id", "text", order)
    DD.append_positioned_index(full, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(d.filter(F.col("doc_id") >= 100),
                               "doc_id", "text", idx, 1, spark, order)
    res = DD.refresh_prefix_order(spark, idx, order)
    assert "batch=1" in res["skipped"]
    delta = spark.createDataFrame([(500, "alpha beta gamma w1 delta "
                                    "epsilon")], "doc_id: long, text: string")
    got = {(r.id_a, r.id_b) for r in DD.prefix_join_stable_delta(
        spark, idx, order, delta, "doc_id", "text",
        threshold=0.5).collect()}
    assert (1, 500) in got
