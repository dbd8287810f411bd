"""Deterministic sampling for training-data pipelines.

``df.sample``/``sampleBy`` are seed-dependent AND partition-layout-dependent
— rerunning after a repartition changes the sample, which poisons
reproducibility of any derived training set. The scalable alternative every
large corpus pipeline converges on is HASH sampling: a row is in the sample
iff ``hash(key) mod D < k``. Properties that matter at 100 TB:

- scan-local (no shuffle, no state, no RNG): a pure filter Catalyst pushes
  wherever it wants; survives repartition, retries, and engine changes.
- stable under corpus growth: a doc's membership never changes as other
  docs arrive — samples are append-consistent across incremental runs.
- md5-based, so the oracle (or any other engine) reproduces it bit-for-bit.

The same trick yields disjoint train/val/test splits (disjoint hash ranges)
and per-stratum exact-N picks (rank by hash within stratum = a uniform
random-but-reproducible permutation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Modulus for the hash bucket: first 8 hex chars of md5 → 32-bit space.
_DENOM = 2 ** 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^32) from md5(salt || key) — the sampling
    coin. ``salt`` decorrelates multiple samples over the same keys."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
                  16, 10).cast("bigint")


def hash_sample(df: DataFrame, key: Column, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically, by hash range."""
    return df.filter(hash_bucket(key, salt) < int(fraction * _DENOM))


def split_label(key: Column, weights: dict[str, float], salt: str = "") -> Column:
    """Label each row train/val/test (or any names) by disjoint hash
    ranges proportional to ``weights``. Every row gets exactly one label;
    membership is stable as the corpus grows."""
    total = sum(weights.values())
    b = hash_bucket(key, salt)
    out, lo = None, 0
    items = list(weights.items())
    for name, w in items[:-1]:
        hi = lo + int(w / total * _DENOM)
        out = (F.when if out is None else out.when)(b < hi, F.lit(name))
        lo = hi
    return out.otherwise(F.lit(items[-1][0])) if out is not None \
        else F.lit(items[-1][0])


def stratified_take(df: DataFrame, strata: list[str] | str, key: Column,
                    n_per_stratum: int, salt: str = "") -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by hash rank —
    a reproducible uniform draw. One shuffle on the strata key (the same
    shuffle any per-group op needs); rank ties are impossible because the
    tiebreak includes the key itself."""
    strata = [strata] if isinstance(strata, str) else strata
    w = Window.partitionBy(*strata).orderBy(hash_bucket(key, salt), key)
    return (df.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") <= n_per_stratum)
            .drop("__rk__"))


def weighted_mixture(df: DataFrame, source_col: str, key: Column,
                     fractions: dict[str, float], default: float = 0.0,
                     salt: str = "") -> DataFrame:
    """Corpus mixing: keep a different deterministic fraction of each
    source ("100% of wiki, 30% of web, 5% of crawl"). Still a pure
    scan-local filter — the per-source threshold is a literal when-chain,
    so re-weighting a 100 TB mixture is one full-scan filter with no
    shuffle, and a source's kept-set only ever shrinks/grows monotonically
    as its weight moves (nested hash ranges)."""
    thr = None
    for name, frac in fractions.items():
        thr = (F.when if thr is None else thr.when)(
            F.col(source_col) == name, F.lit(int(frac * _DENOM)))
    thr = F.lit(int(default * _DENOM)) if thr is None \
        else thr.otherwise(F.lit(int(default * _DENOM)))
    return df.filter(hash_bucket(key, salt) < thr)


def sql_hash_bucket(key_expr: str, salt: str = "") -> str:
    """DuckDB rendering of hash_bucket for oracle pairing."""
    return ("CAST(('0x' || substring(md5(concat('" + salt + "', CAST(" + key_expr
            + " AS VARCHAR))), 1, 8)) AS BIGINT)")


def global_shuffle(df: DataFrame, key: Column, n_shards: int,
                   salt: str = "") -> DataFrame:
    """Deterministic global permutation for training order: shard =
    hash mod n_shards, position = hash rank within the shard. At scale
    this is ONE hash-partition shuffle (repartition on shard) + a
    shard-local sort — exactly what ``write.partitionBy('shard')`` with
    ``sortWithinPartitions`` emits — and the order is reproducible across
    engines, retries, and input layout (unlike ``orderBy(rand())``).
    """
    b = hash_bucket(key, salt)
    out = df.withColumn("shard", F.pmod(b, F.lit(n_shards)).cast("int")) \
            .withColumn("__b__", b)
    w = Window.partitionBy("shard").orderBy(F.col("__b__"), key)
    return out.withColumn("pos", F.row_number().over(w).cast("bigint") - 1) \
              .drop("__b__")


def mixture_budget(df: DataFrame, source_col: str, n_tok_col,
                   weight_num, budget: int) -> DataFrame:
    """Plan a token-budget mixture: given per-source token supply, an
    integer weight per source, and a total token budget, compute each
    source's target, keep rate, and shortfall — the sizing step BEFORE
    :func:`weighted_mixture` applies the rates.

    All allocation arithmetic is integer (bigint DIV), so the plan is
    engine-exact; only the final keep_rate is a double (one division of
    identical integers). One aggregation over the corpus; output is
    source-cardinality rows."""
    n = F.col(n_tok_col) if isinstance(n_tok_col, str) else n_tok_col
    wn = F.col(weight_num) if isinstance(weight_num, str) else weight_num
    per_src = (df.groupBy(source_col)
               .agg(F.sum(n).cast("bigint").alias("n_tokens"),
                    F.first(wn).alias("wn")))
    tot = per_src.agg(F.sum("wn").cast("bigint").alias("wsum"))
    return (per_src.crossJoin(F.broadcast(tot))
            .withColumn("target_tokens",
                        F.expr(f"CAST({budget} AS BIGINT) * wn DIV wsum"))
            .withColumn("keep_rate",
                        F.least(F.col("target_tokens"), F.col("n_tokens"))
                         .cast("double") / F.col("n_tokens"))
            .withColumn("shortfall",
                        F.greatest(F.col("target_tokens") - F.col("n_tokens"),
                                   F.lit(0)).cast("bigint"))
            .select(source_col, "n_tokens", "wn", "target_tokens",
                    "keep_rate", "shortfall"))


def priority_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, salt: str = "") -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007):
    weighted sampling WITHOUT replacement of exactly ``k`` rows, with
    the unbiased subset-sum estimator ``max(w, τ)`` where τ is the
    (k+1)-th largest priority.

    Each row gets priority ``w / u`` with ``u`` uniform in (0,1]. The
    textbook weighted-without-replacement key is ``u^(1/w)``
    (Efraimidis–Spirakis) — but pow()/ln() are libm calls that differ in
    the last ulp across engines, so a hash-seeded sample would not be
    bit-reproducible. Priority sampling needs only ONE IEEE division of
    exact integer operands: ``u = (h+1)/2^32`` from the md5
    :func:`hash_bucket`, so ``priority = (w·2^32)/(h+1)`` — both
    operands exact in a double for ``w < 2^21`` (caller's bound; weights
    here are document lengths). Deterministic, engine-portable,
    append-stable like every sampler in this module.

    Scale: the priority is scan-local; the global top-(k+1) lowers to
    TakeOrderedAndProject (per-partition heaps, driver merges k+1 rows
    per partition) — no global sort, no single-reducer window. Requires
    the corpus to have > k rows (with ≤ k rows the estimator would need
    the no-threshold branch; this helper targets corpus ≫ k).

    Returns (id, weight, priority, est_weight): the k sampled rows;
    Σ est_weight is an unbiased estimate of Σ w over the corpus.
    """
    w = F.col(weight_col).cast("bigint")
    keyed = df.select(
        F.col(id_col), w.alias("__w__"),
        ((w * F.lit(_DENOM)).cast("double")
         / (hash_bucket(F.col(id_col), salt) + F.lit(1)).cast("double")
         ).alias("priority"))
    top = keyed.orderBy(F.desc("priority"), id_col).limit(k + 1)
    tau = top.agg(F.min("priority").alias("__tau__"))
    return (top.orderBy(F.desc("priority"), id_col).limit(k)
            .crossJoin(F.broadcast(tau))
            .select(id_col, F.col("__w__").alias(weight_col), "priority",
                    F.greatest(F.col("__w__").cast("double"),
                               F.col("__tau__")).alias("est_weight")))


def temperature_mixture(df: DataFrame, source_col: str, id_col: str,
                        size_col: str, budget: int,
                        salt: str = "") -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-corpus
    standard, e.g. mBERT/XLM-R exponential smoothing): each source's
    share of a token/char ``budget`` is ∝ its size^α with α = 0.5
    (temperature τ = 1/α = 2) — big sources are damped, small sources
    up-weighted, the budget split sums to ≤ budget exactly.

    Engine-exact despite the fractional power: sqrt is a CORRECTLY-
    ROUNDED IEEE-754 operation (unlike pow/ln, which are libm), and the
    damped weight is floor-quantized to 1e-6 before the integer share
    arithmetic — so shares are BIGINT ratios, the keep rate is one IEEE
    division, and the realized sample is the usual md5 hash filter
    (layout-free, append-stable).

    Returns one row per source: size, damped weight, target units,
    keep_rate, and the REALIZED kept docs/units under the hash filter.
    Plan: one groupBy(source) agg (source-cardinality rows, broadcast
    back), then a scan-local filter + one more groupBy(source) — the
    corpus is never shuffled.
    """
    n = F.col(size_col).cast("bigint")
    per = (df.groupBy(source_col)
           .agg(F.sum(n).cast("bigint").alias("n_units")))
    per = per.withColumn(
        "w", F.floor(F.sqrt(F.col("n_units").cast("double"))
                     * F.lit(1000000.0)).cast("bigint"))
    tot = per.agg(F.sum("w").cast("bigint").alias("__wsum__"))
    plan = (per.crossJoin(F.broadcast(tot))
            .withColumn("target_units",
                        F.expr(f"CAST({int(budget)} AS BIGINT) * w DIV __wsum__"))
            .withColumn("keep_rate",
                        F.least(F.lit(1.0),
                                F.col("target_units").cast("double")
                                / F.col("n_units").cast("double"))))
    thr = F.floor(F.col("keep_rate") * F.lit(float(_DENOM))).cast("bigint")
    kept = (df.join(F.broadcast(plan.select(source_col, "keep_rate")),
                    source_col)
            .filter(hash_bucket(F.col(id_col), salt) < thr)
            .groupBy(source_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
                 F.sum(n).cast("bigint").alias("kept_units")))
    return (plan.join(kept, source_col, "left")
            .select(source_col, "n_units", "w", "target_units", "keep_rate",
                    F.coalesce("kept_docs", F.lit(0)).cast("bigint").alias("kept_docs"),
                    F.coalesce("kept_units", F.lit(0)).cast("bigint").alias("kept_units")))


def kcenter_coreset(df: DataFrame, id_col: str, vec_col: str,
                    k: int) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985; the farthest-
    point diversity sampler of modern data-pruning pipelines): start
    from the lowest-id vector, then repeatedly add the point FARTHEST
    (max over points of min cosine distance to the selected set) —
    the classic 2-approximation to the k-center cover, and the
    'maximally diverse subset' a curation pass keeps when shrinking a
    region of embedding space.

    Determinism: distances are 1 − cosine over the proven sequential
    folds; min over the selected set and the global argmax are pure
    order-free picks (no accumulation), ties broken by lowest id; the
    seed is the lowest id. Bit-reproducible on any partitioning.

    Plan: the selection is inherently sequential in k — each round is
    ONE corpus scan (selected centers broadcast, k×dim doubles) closing
    in a top-1 heap (TakeOrdered), with the single winner row collected
    to the driver (the scheduler-boundary pattern of prune_files: rows
    crossing the boundary are O(k), never data). Total cost: k scans.

    Returns (rank bigint, <id_col>, min_dist double) in selection order;
    the seed's min_dist is NULL (no prior centers).
    """
    from .similarity import cosine, _dvec

    v = df.select(F.col(id_col), _dvec(F.col(vec_col)).alias("__v__"))
    first = v.orderBy(id_col).limit(1).select(id_col, "__v__").first()
    picked = [(1, first[0], None, first[1])]  # (rank, id, mind, vec)
    spark = df.sparkSession
    for rank in range(2, k + 1):
        sel_ids = [p[1] for p in picked]
        centers = spark.createDataFrame(
            [(p[3],) for p in picked], f"__c__: array<double>")
        cand = (v.filter(~F.col(id_col).isin(sel_ids))
                .crossJoin(F.broadcast(centers))
                .withColumn("__d__",
                            F.lit(1.0) - cosine(F.col("__v__"),
                                                F.col("__c__")))
                .groupBy(id_col, "__v__")
                .agg(F.min("__d__").alias("__mind__")))
        win = (cand.orderBy(F.col("__mind__").desc(), F.col(id_col).asc())
               .limit(1).select(id_col, "__mind__", "__v__").first())
        if win is None:  # k exceeds the corpus: return what exists
            break
        picked.append((rank, win[0], win[1], win[2]))
    out = spark.createDataFrame(
        [(r, i, m) for r, i, m, _ in picked],
        f"rank bigint, {id_col} bigint, min_dist double")
    return out


def hashed_feature_counts(df: DataFrame, id_col: str, text_col: str,
                          n: int = 2, buckets: int = 4096) -> DataFrame:
    """(id, b, c): per-document hashed word-n-gram feature counts —
    DSIR's feature space (Xie et al. 2023 hash n-grams into 10k buckets;
    fastText's classifier uses the same trick). Bucket = first 8 md5 hex
    digits mod ``buckets``, the engine-portable hash used by every
    sketch in functions/ — so any oracle engine lands features in the
    SAME buckets. One explode + one map-side-combinable groupBy;
    bodies never shuffle, only (id, bucket) pairs."""
    from .text import ngrams, tokens

    # r13 opt: tokenize once before the n-gram explode (guide §4.1 —
    # ngrams re-embeds the tokenizer regex per slice under a Generate).
    tk = F.col("__tk0__")
    g = tk if n == 1 else ngrams(tk, n)
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col("__g__")), 1, 8), 16, 10)
        .cast("bigint"), F.lit(buckets))
    return (df.select(F.col(id_col), tokens(text_col).alias("__tk0__"))
            .select(F.col(id_col), F.explode(g).alias("__g__"))
            .select(id_col, b.alias("b"))
            .groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c")))


def importance_scores(raw: DataFrame, target: DataFrame,
                      id_col: str, text_col: str,
                      n: int = 2, buckets: int = 4096) -> DataFrame:
    """Data selection by importance toward a trusted target corpus over
    hashed n-gram features — DSIR (Xie et al. 2023) / the GPT-3-style
    quality-classifier filter, formulated log-free.

    DSIR's canonical weight is the log-ratio sum
    ``Σ c_b (log p_t(b) − log p_r(b))``; ln() differs between engines in
    the last ulp (the bigram_lm_score precedent), so the score here is
    the per-feature POSTERIOR under equal priors,
    ``score = Σ c_b · p_t(b) / (p_t(b) + p_r(b)) / Σ c_b`` with add-one
    smoothing — each term is P(feature came from target), the
    binary-classifier view of the same importance evidence, monotone in
    p_t/p_r per feature and built only from integer-operand IEEE
    division plus a bucket-ordered fold, so it is hash-exactly
    oracle-checkable. Scores above 0.5 mean the doc's features look more
    target-like than raw-like on average.

    Plan: the two model tables are ≤``buckets`` rows each — broadcast
    joins onto the per-doc feature table; one groupBy(id) closes. At
    100 TB the target slice is a sliver (DSIR's premise), the raw
    feature table is the only big operand, and it shuffles once as
    (id, bucket, c). Returns (id, n_feats, score)."""
    feats = hashed_feature_counts(raw, id_col, text_col, n, buckets)
    # model tables: corpus-wide counts per bucket (target and raw)
    tgt = (hashed_feature_counts(
        target.select(F.lit(0).alias("__tid__"), F.col(text_col)),
        "__tid__", text_col, n, buckets)
        .groupBy("b").agg(F.sum("c").alias("n_t")))
    rawc = feats.groupBy("b").agg(F.sum("c").alias("n_r"))
    # totals named apart from n_t/n_r: Spark resolution is
    # case-insensitive, so N_t would collide with n_t
    nt = tgt.groupBy().agg(F.sum("n_t").alias("__tot_t__"))
    nr = rawc.groupBy().agg(F.sum("n_r").alias("__tot_r__"))
    jb = (feats.join(F.broadcast(tgt), "b", "left")
          .join(F.broadcast(rawc), "b", "left")
          .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nr)))
    p_t = ((F.coalesce("n_t", F.lit(0)) + 1).cast("double")
           / (F.col("__tot_t__") + buckets).cast("double"))
    p_r = ((F.coalesce("n_r", F.lit(0)) + 1).cast("double")
           / (F.col("__tot_r__") + buckets).cast("double"))
    term = F.col("c").cast("double") * (p_t / (p_t + p_r))
    per = jb.select(id_col, "b", "c", term.alias("__term__"))
    # bucket-ordered fold: partition-order-independent double sum
    return (per.groupBy(id_col)
            .agg(F.sum("c").cast("bigint").alias("n_feats"),
                 (F.aggregate(
                     F.array_sort(F.collect_list(
                         F.struct("b", "__term__"))),
                     F.lit(0.0), lambda a, s: a + s["__term__"])
                  / F.sum("c")).alias("score")))
