"""Extension ops round 3: PII redaction, quality-percentile filtering,
boilerplate n-gram coverage — the remaining first-pass corpus filters a
training-data pipeline runs before dedup.

Oracle strategy: the PII patterns are written for the common Java-regex /
RE2 subset and interpolated into the oracle SQL from the SAME Python dict,
so both engines run byte-identical pattern text. The documents fixture has
no natural PII, so the PII query injects deterministic synthetic PII
derived from ``doc_id`` with identical construction on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..ext import pii as PII
from ..ext import text as TX
from ..functions import aggs as AG
from ..io import load_table, parallelize_narrow_scan
from .registry import query

# DuckDB-side shared fragments (mirror ext/text.py definitions)
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_SHINGLES = (
    "list_distinct(list_transform("
    " range(1, greatest(len({t}) - 2, 0) + 1),"
    " i -> array_to_string(list_slice({t}, i, i + 2), ' ')))"
).format(t=_TOKS)

# Synthetic-PII corpus: append class instances to a deterministic subset
# of docs (different moduli → overlapping subsets exercise multi-class
# docs). Same construction in Spark below.
_PII_CORPUS_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' ssn '
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' host 10.'
                || CAST(doc_id % 256 AS VARCHAR) || '.'
                || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                || CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END
           AS text
    FROM documents
"""

_PII_COUNT_SQL = ",\n      ".join(
    f"len(regexp_extract_all(text, '{pat}')) AS pii_{name}"
    for name, pat in PII.PII_PATTERNS.items()
)
_PII_TOTAL_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{pat}'))" for pat in PII.PII_PATTERNS.values()
)
_REDACT_SQL = "text"
for _name, _pat in PII.PII_PATTERNS.items():
    _REDACT_SQL = f"regexp_replace({_REDACT_SQL}, '{_pat}', '<{_name.upper()}>', 'g')"


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    email = F.concat(F.lit(" contact user"), s(did), F.lit("@example"),
                     s(did % 7), F.lit(".com"))
    ssn = F.concat(F.lit(" ssn "), F.lpad(s(did % 1000), 3, "0"), F.lit("-"),
                   F.lpad(s(did % 100), 2, "0"), F.lit("-"),
                   F.lpad(s(did % 10000), 4, "0"))
    phone = F.concat(F.lit(" call 555-"), F.lpad(s(did % 1000), 3, "0"),
                     F.lit("-"), F.lpad(s(did % 10000), 4, "0"))
    ip = F.concat(F.lit(" host 10."), s(did % 256), F.lit("."),
                  s((did * 7) % 256), F.lit("."), s(did % 254 + 1))
    return d.select("doc_id", F.concat(
        F.col("text"),
        F.when(did % 3 == 0, email).otherwise(F.lit("")),
        F.when(did % 5 == 0, ssn).otherwise(F.lit("")),
        F.when(did % 4 == 0, phone).otherwise(F.lit("")),
        F.when(did % 7 == 0, ip).otherwise(F.lit("")),
    ).alias("text"))


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH corpus AS ({_PII_CORPUS_SQL})
    SELECT doc_id,
      {_PII_COUNT_SQL},
      {_PII_TOTAL_SQL} AS pii_total,
      md5({_REDACT_SQL}) AS redacted_fp,
      length({_REDACT_SQL}) AS n_redacted_chars
    FROM corpus
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over the synthetic-PII corpus: per-class match
    counts and the md5 fingerprint of the redacted text (proves the
    rewrite itself is byte-identical, not just the counts). Scan-local at
    scale; locally the narrow single-row-group scan is widened so the
    regex work isn't pinned to one task."""
    corpus = parallelize_narrow_scan(_pii_corpus(spark, sf_dir))
    return PII.redact_table(corpus, "text").select(
        "doc_id",
        *[f"pii_{n}" for n in PII.PII_PATTERNS],
        "pii_total",
        F.md5("text_redacted").alias("redacted_fp"),
        F.length("text_redacted").alias("n_redacted_chars"),
    )


@query(
    "text_quality_percentile_filter",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
      FROM documents
    ), th AS (
      SELECT lang,
             percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(n_tok AS DOUBLE))
               AS lang_p25
      FROM t GROUP BY lang
    )
    SELECT t.doc_id, t.lang, t.n_tok, th.lang_p25
    FROM t JOIN th USING (lang)
    WHERE t.n_tok >= th.lang_p25
    """,
)
def text_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gate: drop docs below the language's 25th
    percentile of token count. Thresholds come from the histogram
    percentile path (token counts are low-cardinality, so the shuffle
    carries one row per distinct count — the 100 TB-safe plan), then
    broadcast back onto the scan: threshold side is |langs| rows, the
    corpus never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(TX.tokens("text")).alias("n_tok"))
    th = AG.histogram_percentiles(t, ["lang"], "n_tok", {"lang_p25": 0.25})
    return (t.join(F.broadcast(th), "lang")
            .filter(F.col("n_tok") >= F.col("lang_p25"))
            .select("doc_id", "lang", "n_tok", "lang_p25"))


@query(
    "text_boilerplate_coverage",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    f AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY s) AS df FROM ex)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN df * 10 >= (SELECT n_docs FROM nd)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN df * 10 >= (SELECT n_docs FROM nd)
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS boiler_frac
    FROM f
    GROUP BY doc_id
    """,
)
def text_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate signal: fraction of a doc's distinct 3-gram
    shingles whose corpus document-frequency is ≥10% of all docs. The
    threshold compares ``df*10 >= n_docs`` in pure integers — a float
    ``0.1*n_docs`` would be decimal math in DuckDB but binary in Spark
    and diverge on ties. Plan: shingle explode → window count over the
    shingle key (one shuffle) → per-doc agg (second shuffle); the corpus
    row count rides along as a broadcast scalar."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("__nd__"))
    # r13 opt: tokenize once before the shingle explode (guide §4.1).
    ex = (d.select("doc_id", TX.tokens("text").alias("__tk0__"))
          .select("doc_id", F.explode(TX.shingles(F.col("__tk0__"))).alias("s")))
    f = ex.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
    boiler = F.when(F.col("df") * 10 >= F.col("__nd__"), 1).otherwise(0)
    return (f.crossJoin(F.broadcast(n_docs))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(boiler).alias("n_boiler"),
                 (F.sum(boiler).cast("double") / F.count(F.lit(1)))
                 .alias("boiler_frac")))


@query(
    "text_unigram_rarity",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT tok, COUNT(*) AS n_t FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n_total FROM toks)
    SELECT doc_id, COUNT(*) AS n_tok,
           CAST(SUM(((SELECT n_total FROM tot) * 1000000) // n_t) AS BIGINT)
             / COUNT(*) AS mean_rarity
    FROM toks JOIN tf USING (tok)
    GROUP BY doc_id
    """,
)
def text_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: mean inverse unigram probability
    per doc (rare-token-heavy docs score high — the deterministic
    stand-in for LM-perplexity filtering). The per-token score is the
    INTEGER floor of N·1e6/n_t: a log or a raw double mean would hit
    libm / decimal-tie divergence between engines, while a bigint sum is
    exact in any order and the single final division is one IEEE op.
    Plan: explode → tiny vocab agg (broadcast back, no second data
    shuffle) → per-doc agg with map-side partials (explode preserves doc
    locality)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_t"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(F.broadcast(tf), "tok").crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.sum(F.expr("(n_total * 1000000) div n_t")).alias("__rs__"))
        .select("doc_id", "n_tok",
                (F.col("__rs__") / F.col("n_tok")).alias("mean_rarity"))
    )


@query(
    "text_url_kit",
    oracle="""
    SELECT doc_id,
           source || '.example.com'            AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang                                AS q_lang,
           source                              AS domain_label
    FROM documents
    """,
)
def text_url_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition for web-corpus prep (host-level dedup buckets,
    domain mixing weights, per-site quality priors all key on these).
    URLs are synthesized deterministically from the fixture
    (https://<source>.example.com/docs/<id>?lang=<lang>), then taken
    apart with Spark's builtin parse_url (JVM-side, codegen); the oracle
    states each component straight from the construction rule, so the
    check pins parse_url's HOST/PATH/QUERY semantics exactly. The
    registrable-domain label (the eTLD+1 analog; here the first host
    token) is what a crawler dedups and rate-buckets on."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"),
                   F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.split(host, "\\.").getItem(0).alias("domain_label"),
    )


@query(
    "corpus_host_stats",
    oracle=f"""
    SELECT source || '.example.com' AS host,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           {{md}} AS median_chars
    FROM documents
    GROUP BY source
    """.format(md="CAST(quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS DOUBLE)"),
)
def corpus_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host corpus profile — the crawl-governance table every
    web-scale pipeline keeps (domain mixing weights, per-site quality
    priors, rate buckets key on it): doc count, token volume, language
    spread, median doc size per registrable host. Groups on the URL
    kit's host; single hash shuffle, exact median via the sort-based
    percentile machinery."""
    d = load_table(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    base = d.select(host.alias("host"), F.size(TX.tokens("text")).alias("n_tok"),
                    "lang", "n_chars")
    agged = base.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
    med = AG.sorted_percentiles(
        base.select("host", F.col("n_chars").cast("double").alias("n_chars")),
        ["host"], "n_chars", {"median_chars": 0.5})
    return agged.join(med, "host")


@query(
    "text_fuzzy_title_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, array_to_string(list_slice({_TOKS}, 1, 3), ' ') AS title
      FROM documents
    ), corpus AS (
      SELECT doc_id, title FROM t
      UNION ALL
      SELECT doc_id + 1000000, title || ' x' FROM t
    ), keyed AS (
      SELECT doc_id, title, string_split(title, ' ')[1] AS blk FROM corpus
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.title, b.title) AS dist
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= 2
    """,
)
def text_fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching — the edit-distance near-dup class that
    shingle-Jaccard misses (char-level typos/suffixes on SHORT strings:
    titles, names, package ids). Blocking on the first token turns the
    all-pairs comparison into an equi-join; exact levenshtein (unit-cost,
    engine-verified identical to the oracle's) only runs within blocks.
    The corpus is each doc's 3-token title plus a ' x'-suffixed copy, so
    every title has a guaranteed distance-2 partner and the oracle checks
    real match structure, not an empty set. At scale: block keys want a
    phonetic/q-gram choice + a bucket-size cap (mirror the LSH caps) —
    first-token is the demonstration key."""
    d = load_table(spark, sf_dir, "documents")
    title = F.array_join(F.slice(TX.tokens("text"), 1, 3), " ")
    t = d.select("doc_id", title.alias("title"))
    corpus = t.unionByName(
        t.select((F.col("doc_id") + 1000000).alias("doc_id"),
                 F.concat(F.col("title"), F.lit(" x")).alias("title")))
    keyed = corpus.withColumn("blk", F.split("title", " ").getItem(0))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .withColumn("dist", F.levenshtein(F.col("a.title"), F.col("b.title")))
            .filter(F.col("dist") <= 2)
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"), "dist"))
