"""Seeded differential fuzzer over the r10–r12 numeric chains
(VERDICT r12 "Next round" #1).

The registry's two worst historical bugs — the r4 centroid tie and the
r5 decimal double-rounding — were found by randomized differential
sweeps, not by the fixed queries; the machinery added in r10–r12 (the
PQ rotate→rank→permute→train→encode→ADC chain, positional tids on the
stable prefix order, the observed-metric sizing regimes, and the
qhist/CMS/bottom-k merge algebra) had never been fuzzed. Each draw here
builds a fresh seeded synthetic dataset, runs the ENGINE path, and
re-derives the oracle independently in DuckDB (the parity.compare
standard: column names, row counts, exact canonical values — no float
tolerance), plus Spark-vs-Spark closure checks where the property is
algebraic (merge(parts) == whole; every sizing regime returns the same
pairs).

Families:

- ``pq``      — the full PQ chain at random (n, dim, m, ksub, n_iter,
                nq, k), with random REAL rotation matrices (bit-match
                needs no orthogonality — any literal matrix must
                multiply identically on both engines), the variance
                permutation on rotated or raw coordinates, and
                md5-sampled training (train_fraction codebook compare).
- ``prefix``  — stable-order prefix-filter delta joins on random
                corpora/splits/thresholds/shingle widths: positional
                AND counts verifies vs the blind exhaustive all-pairs
                oracle, optionally through an order REFRESH migration
                (stored positions survive, tids stay valid).
- ``minhash`` — the persisted minhash index's three sizing regimes
                (lookup / batch / bulk), each FORCED via its cap knobs
                on the same draw, all vs the full-chain LSH oracle
                restricted to delta-touching pairs — the regime router
                can only misroute performance, never pairs, and this
                pins it.
- ``sketch``  — qhist / CMS / bottom-k: registers vs the DuckDB
                re-derivation, merge(parts) == single-pass closure,
                and the family's answer contract (quantile bounds
                bracket the exact order statistic; CMS never
                undercounts; KMV exact when unsaturated).

Usage: python scripts/fuzz_r13.py [n_total] [master_seed] [out_json]
Defaults: 120 draws, seed 20260816, scripts/fuzz_r13.json.
Exit 0 iff every draw matches.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from pyspark.sql import SparkSession, functions as F  # noqa: E402


# --------------------------------------------------------------------------
# shared plumbing


def _connect(tables: dict[str, tuple[str, list[tuple]]]) -> "duckdb.DuckDBPyConnection":
    """Fresh DuckDB connection with the draw's synthetic tables.
    ``tables`` maps name -> (ddl_columns, rows)."""
    con = duckdb.connect()
    for name, (ddl, rows) in tables.items():
        con.execute(f"CREATE TABLE {name} ({ddl})")
        if rows:
            ph = ", ".join("?" for _ in rows[0])
            con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
    return con


def _diff(name: str, sdf, oracle_sql: str, con) -> list[str]:
    from activedata_etl_spark.parity import compare

    res = compare(name, sdf, oracle_sql, con)
    return [] if res.ok else res.mismatches[:4]


def _df_eq(name: str, a, b) -> list[str]:
    """Spark-vs-Spark canonical equality (the merge-closure check)."""
    from activedata_etl_spark.parity import canonical_rows

    if sorted(a.columns) != sorted(b.columns):
        return [f"{name}: columns {sorted(a.columns)} vs {sorted(b.columns)}"]
    ra = canonical_rows(a.columns, [tuple(r) for r in a.collect()])
    rb = canonical_rows(b.columns, [tuple(r) for r in b.collect()])
    if ra != rb:
        bad = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:2]
        return [f"{name}: {len(ra)} vs {len(rb)} rows; first diffs "
                f"{[(ra[i], rb[i]) for i in bad] if bad else 'set-level'}"]
    return []


# --------------------------------------------------------------------------
# family: pq — the rotate→rank→permute→train→encode→ADC chain


def _gen_vectors(rng: random.Random, n: int, dim: int) -> list[tuple]:
    return [(i, [rng.uniform(-1.0, 1.0) for _ in range(dim)])
            for i in range(n)]


def _rot_literal_values(rot: list[list[float]]) -> str:
    return ",\n".join(
        "({}, [{}])".format(i, ", ".join("%.17e" % v for v in row))
        for i, row in enumerate(rot))


def _fuzz_pq_oracle(m: int, ksub: int, n_iter: int, sub: int, nq: int,
                    k: int, rot: list[list[float]] | None,
                    balance: bool) -> str:
    """Generalized form of q_ext10's fixed-constant oracles: the same
    CTE chain at arbitrary (m, ksub, n_iter, sub, nq, k), any literal
    rotation matrix, with or without the variance permutation."""
    from activedata_etl_spark.queries.q_ext10 import _pq_ctes, _sql_l2

    l2 = _sql_l2
    pre: list[str] = []
    v_sql = None
    if rot is not None:
        pre += [
            """rbase AS (SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE)) AS vv FROM embeddings)""",
            f"rrot AS (SELECT * FROM (VALUES {_rot_literal_values(rot)}) "
            "t(i, rvec))",
            """bv0 AS (
              SELECT vec_id, list(val ORDER BY i) AS vv
              FROM (SELECT v.vec_id, r.i,
                           list_sum(list_transform(list_zip(r.rvec, v.vv),
                                    p -> p[1] * p[2])) AS val
                    FROM rbase v CROSS JOIN rrot r)
              GROUP BY vec_id)""",
        ]
    elif balance:
        pre += [
            """bv0 AS (SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE)) AS vv FROM embeddings)""",
        ]
    if balance:
        pre += [
            """bstat AS (
              SELECT i, CAST(COUNT(*) AS HUGEINT) AS n,
                     SUM(CAST(q AS HUGEINT)) AS s,
                     SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS ss
              FROM (SELECT generate_subscripts(vv, 1) AS i,
                           CAST(floor(unnest(vv) * 1000000000.0) AS BIGINT)
                             AS q
                    FROM bv0)
              GROUP BY i)""",
            f"""bperm AS (
              SELECT i, ((rnk - 1) % {m}) * {sub} + (rnk - 1) // {m} AS pos
              FROM (SELECT i, ROW_NUMBER() OVER (
                      ORDER BY n * ss - s * s DESC, i ASC) AS rnk
                    FROM bstat))""",
        ]
        v_sql = """
              SELECT vec_id, list(x ORDER BY pos) AS vv
              FROM (SELECT vec_id, generate_subscripts(vv, 1) AS i,
                           unnest(vv) AS x FROM bv0)
              JOIN bperm USING (i) GROUP BY vec_id"""
    elif rot is not None:
        v_sql = "SELECT vec_id, vv FROM bv0"
    ctes = _pq_ctes(m=m, ksub=ksub, n_iter=n_iter, sub=sub,
                    pre=pre or None, v_sql=v_sql)
    ctes.append(f"""dtab AS (
      SELECT q.vec_id AS q_id, q.j, c.code, {l2('q.s', 'c.cvec')} AS d
      FROM sv q JOIN c{n_iter} c ON c.j = q.j
      WHERE q.vec_id < {nq})""")
    ctes.append("""scored AS (
      SELECT q_id, vec_id, list_sum(list(d ORDER BY j)) AS adc
      FROM (SELECT dt.q_id, af.vec_id, dt.j, dt.d
            FROM af JOIN dtab dt ON dt.j = af.j AND dt.code = af.code
            WHERE dt.q_id <> af.vec_id)
      GROUP BY q_id, vec_id)""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT q_id, vec_id, adc FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY adc ASC, vec_id ASC) AS rn
      FROM scored) WHERE rn <= {k}""")


def run_pq_draw(spark: SparkSession, seed: int) -> dict:
    from activedata_etl_spark.ext import pq as PQ
    from activedata_etl_spark.ext.sampling import sql_hash_bucket
    from activedata_etl_spark.queries.q_ext10 import _pq_ctes

    rng = random.Random(seed)
    dim = rng.choice([8, 12, 16, 24, 32])
    m = rng.choice([d for d in (2, 4, 8) if dim % d == 0])
    sub = dim // m
    n = rng.randint(30, 90)
    ksub = rng.choice([2, 4, 8])
    n_iter = rng.choice([1, 2])
    nq, k = rng.choice([3, 5]), rng.choice([2, 3])
    variant = rng.choice(["plain", "balanced", "rotated",
                          "rotated_balanced", "train_sampled"])
    rows = _gen_vectors(rng, n, dim)
    params = {"variant": variant, "n": n, "dim": dim, "m": m, "ksub": ksub,
              "n_iter": n_iter, "nq": nq, "k": k}

    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    con = _connect({"embeddings": ("vec_id BIGINT, embedding DOUBLE[]", rows)})
    try:
        if variant == "train_sampled":
            frac = rng.choice([0.3, 0.5, 0.7])
            params["train_fraction"] = frac
            thr = int(frac * 2 ** 32)
            sql = ("WITH " + ",\n".join(_pq_ctes(
                m=m, ksub=ksub, n_iter=n_iter, sub=sub,
                where=f"{sql_hash_bucket('vec_id', 'pqtrain:')} < {thr}"))
                + f"""
                SELECT j, code,
                       CAST(generate_subscripts(cvec, 1) - 1 AS BIGINT) AS i,
                       unnest(cvec) AS x
                FROM c{n_iter}""")
            cb = PQ.pq_train(emb, "vec_id", "embedding", m=m, ksub=ksub,
                             n_iter=n_iter, dim=dim, train_fraction=frac)
            out = (cb.select("j", "code",
                             F.posexplode("cvec").alias("i", "x"))
                   .select("j", "code", F.col("i").cast("long").alias("i"),
                           "x"))
            mism = _diff(f"pq[{seed}]", out, sql, con)
        else:
            rot = None
            if variant.startswith("rotated"):
                rot = [[rng.uniform(-0.5, 0.5) for _ in range(dim)]
                       for _ in range(dim)]
            balance = variant.endswith("balanced")
            qs = emb.filter(F.col("vec_id") < nq)
            out = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=k, m=m,
                             ksub=ksub, n_iter=n_iter, dim=dim,
                             balance_dims=balance, rotation=rot)
            sql = _fuzz_pq_oracle(m, ksub, n_iter, sub, nq, k, rot, balance)
            mism = _diff(f"pq[{seed}]", out, sql, con)
    finally:
        con.close()
    return {"family": "pq", "seed": seed, "params": params,
            "ok": not mism, "mismatches": mism}


# --------------------------------------------------------------------------
# family: prefix — stable-order prefix joins with positional verify


def _gen_docs(rng: random.Random) -> list[tuple]:
    """Random corpus with planted near-dup structure: base docs plus
    mutated copies (word substitutions) and exact copies, short docs
    (below the shingle width) and single-token docs included on
    purpose."""
    vocab = [f"w{i}" for i in range(rng.randint(15, 50))]
    n_base = rng.randint(25, 60)
    docs: list[tuple] = []
    nid = 0
    for _ in range(n_base):
        length = rng.randint(1, 12)
        words = [rng.choice(vocab) for _ in range(length)]
        docs.append((nid, " ".join(words)))
        nid += 1
        r = rng.random()
        if r < 0.35 and length >= 3:  # mutated copy → near-dup candidate
            mut = list(words)
            for _ in range(rng.randint(1, max(1, length // 4))):
                mut[rng.randrange(length)] = rng.choice(vocab)
            docs.append((nid, " ".join(mut)))
            nid += 1
        elif r < 0.45:  # exact copy → jaccard 1.0
            docs.append((nid, " ".join(words)))
            nid += 1
    return docs


def _shingle_sql(n: int | None) -> str:
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    if n is None:
        return f"list_distinct({toks})"
    return (f"list_distinct(list_transform("
            f" range(1, greatest(len({toks}) - {n - 1}, 0) + 1),"
            f" i -> array_to_string(list_slice({toks}, i, i + {n - 1}),"
            f" ' ')))")


def _exact_pairs_sql(shingle_n: int | None, threshold: float,
                     pair_where: str) -> str:
    """Blind exhaustive all-pairs Jaccard oracle (the q_ext9
    _EXACT_PAIRS shape) at arbitrary shingle width and threshold."""
    return f"""
    WITH t AS (
      SELECT doc_id, {_shingle_sql(shingle_n)} AS s FROM documents
    ), sz AS (SELECT doc_id, len(s) AS n FROM t WHERE len(s) > 0),
    ex0 AS (SELECT doc_id, unnest(s) AS s FROM t),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS i
      FROM ex0 a JOIN ex0 b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= {threshold}
    )
    SELECT id_a, id_b, jaccard FROM exact WHERE {pair_where}"""


def run_prefix_draw(spark: SparkSession, seed: int) -> dict:
    from activedata_etl_spark.ext import dedup as DD

    rng = random.Random(seed)
    docs = _gen_docs(rng)
    n = len(docs)
    threshold = rng.choice([0.3, 0.5, 0.6, 0.8])
    shingle_n = rng.choice([2, 3, None])
    do_refresh = rng.random() < 0.4
    # id-threshold split: [0,t0) freezes the order, [t0,t1) is the
    # second stored batch (positioned under the stale order), [t1,n)
    # is the delta
    t0 = rng.randint(max(2, n // 4), max(3, n // 2))
    t1 = rng.randint(t0 + 1, max(t0 + 2, 3 * n // 4))
    params = {"n_docs": n, "threshold": threshold, "shingle_n": shingle_n,
              "t0": t0, "t1": t1, "refresh": do_refresh}

    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    b0 = d.filter(F.col("doc_id") < t0)
    b1 = d.filter((F.col("doc_id") >= t0) & (F.col("doc_id") < t1))
    delta = d.filter(F.col("doc_id") >= t1)
    base = tempfile.mkdtemp(prefix="fuzz_r13_prefix_")
    path, order_path = os.path.join(base, "idx"), os.path.join(base, "order")
    con = _connect({"documents": ("doc_id BIGINT, text VARCHAR", docs)})
    try:
        DD.freeze_prefix_order(b0, "doc_id", "text", order_path,
                               shingle_n=shingle_n)
        DD.append_positioned_index(b0, "doc_id", "text", path, 0, spark,
                                   order_path, shingle_n=shingle_n)
        DD.append_positioned_index(b1, "doc_id", "text", path, 1, spark,
                                   order_path, shingle_n=shingle_n)
        if do_refresh:
            # migration path: order refresh between ingest and query —
            # positions recompute / revalidate, tids stay stable
            DD.refresh_prefix_order(spark, path, order_path)
        sql = _exact_pairs_sql(shingle_n, threshold,
                               f"(id_a >= {t1} OR id_b >= {t1})")
        mism = []
        outs = {}
        for verify in ("positional", "counts"):
            out = DD.prefix_join_stable_delta(
                spark, path, order_path, delta, "doc_id", "text",
                threshold=threshold, shingle_n=shingle_n, verify=verify)
            outs[verify] = out.persist()
            mism += _diff(f"prefix[{seed}]:{verify}", outs[verify], sql, con)
        mism += _df_eq(f"prefix[{seed}]:pos==counts",
                       outs["positional"], outs["counts"])
        for o in outs.values():
            o.unpersist()
    finally:
        con.close()
        shutil.rmtree(base, ignore_errors=True)
    return {"family": "prefix", "seed": seed, "params": params,
            "ok": not mism, "mismatches": mism}


# --------------------------------------------------------------------------
# family: minhash — the persisted index's three sizing regimes


def _minhash_delta_oracle(n_hashes: int, n_bands: int, shingle_n: int,
                          threshold: float, t_new: int) -> str:
    """Full LSH chain (signature → bands → candidates → exact verify)
    over the WHOLE corpus, restricted to pairs touching a delta id —
    the q_ext dedup_lsh_jaccard_pairs oracle generalized to arbitrary
    (n_hashes, n_bands, shingle_n, threshold)."""
    rpb = n_hashes // n_bands
    hcols = ", ".join(f"min(md5('{i}:' || s)) AS h{i}"
                      for i in range(n_hashes))
    band_rows = ",\n".join(
        "({}, md5({}))".format(
            b, " || '|' || ".join(f"h{b * rpb + j}" for j in range(rpb)))
        for b in range(n_bands))
    return f"""
    WITH sh AS (SELECT doc_id, {_shingle_sql(shingle_n)} AS sh
                FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sig AS (SELECT doc_id, {hcols} FROM ex GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b.band_idx, b.band_sig FROM sig,
        LATERAL (SELECT * FROM (VALUES {band_rows})
                 v(band_idx, band_sig)) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           len(list_intersect(sa.sh, sb.sh)) * 1.0 /
           (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
             AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= {threshold}
      AND (id_a >= {t_new} OR id_b >= {t_new})"""


def run_minhash_draw(spark: SparkSession, seed: int) -> dict:
    from activedata_etl_spark.ext import dedup_index as DI

    rng = random.Random(seed)
    docs = _gen_docs(rng)
    n = len(docs)
    n_hashes = rng.choice([8, 16])
    n_bands = rng.choice([b for b in (2, 4) if n_hashes % b == 0])
    shingle_n = rng.choice([2, 3])
    threshold = rng.choice([0.2, 0.4])
    t_new = rng.randint(max(2, n // 2), max(3, n - 2))
    params = {"n_docs": n, "n_hashes": n_hashes, "n_bands": n_bands,
              "shingle_n": shingle_n, "threshold": threshold,
              "t_new": t_new}

    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    old = d.filter(F.col("doc_id") < t_new)
    new = d.filter(F.col("doc_id") >= t_new)
    base = tempfile.mkdtemp(prefix="fuzz_r13_minhash_")
    idx = os.path.join(base, "idx")
    con = _connect({"documents": ("doc_id BIGINT, text VARCHAR", docs)})
    kw = dict(n_hashes=n_hashes, n_bands=n_bands, shingle_n=shingle_n)
    # each regime forced via its cap knobs on the SAME draw — the
    # router may only ever change the plan, never the pairs
    regimes = {
        "natural": {},
        "lookup": {"_LOOKUP_DIR_BUDGET": 1.0, "_BULK_FRACTION": 10.0},
        "batch": {"_LOOKUP_CAP": 0, "_SEEK_CAP": 0, "_BULK_FRACTION": 10.0},
        "bulk": {"_BULK_FRACTION": 0.0},
    }
    saved = {k: getattr(DI, k) for k in
             ("_LOOKUP_CAP", "_SEEK_CAP", "_BULK_FRACTION",
              "_LOOKUP_DIR_BUDGET")}
    mism = []
    try:
        DI.build_index(old, "doc_id", "text", idx, **kw)
        sql = _minhash_delta_oracle(n_hashes, n_bands, shingle_n,
                                    threshold, t_new)
        for regime, knobs in regimes.items():
            for k_, v in saved.items():
                setattr(DI, k_, v)
            for k_, v in knobs.items():
                setattr(DI, k_, v)
            out = DI.pairs_against_index(new, "doc_id", "text", spark, idx,
                                         threshold=threshold, **kw)
            mism += _diff(f"minhash[{seed}]:{regime}", out, sql, con)
    finally:
        for k_, v in saved.items():
            setattr(DI, k_, v)
        con.close()
        shutil.rmtree(base, ignore_errors=True)
    return {"family": "minhash", "seed": seed, "params": params,
            "ok": not mism, "mismatches": mism}


# --------------------------------------------------------------------------
# family: sketch — qhist / CMS / bottom-k merge algebra + contracts


def _gen_grouped_values(rng: random.Random) -> list[tuple]:
    """(g, v) rows: zipf-ish magnitudes, negatives and zeros included
    (the qhist zero-bucket and CMS collision regimes both need them)."""
    n_groups = rng.randint(1, 4)
    rows = []
    for _ in range(rng.randint(40, 200)):
        g = f"g{rng.randrange(n_groups)}"
        mag = int(10 ** rng.uniform(0, rng.choice([2, 4, 6])))
        v = rng.choice([mag, mag, mag, -mag, 0])
        rows.append((g, v))
    return rows


def _parts(rng: random.Random, df, n_parts: int):
    """Split by a deterministic hash of a synthetic row index — every
    row lands in exactly one part."""
    parts = []
    salted = df.withColumn(
        "__p__", F.pmod(F.xxhash64(*df.columns, F.lit(rng.randrange(97))),
                        F.lit(n_parts)))
    for p in range(n_parts):
        parts.append(salted.filter(F.col("__p__") == p).drop("__p__"))
    return parts


def run_sketch_draw(spark: SparkSession, seed: int) -> dict:
    from activedata_etl_spark.functions import bottomk as BK
    from activedata_etl_spark.functions import cms as CMS
    from activedata_etl_spark.functions import qhist as QH

    rng = random.Random(seed)
    which = rng.choice(["qhist", "cms", "bottomk"])
    rows = _gen_grouped_values(rng)
    n_parts = rng.randint(2, 4)
    params = {"which": which, "n_rows": len(rows), "n_parts": n_parts}
    df = spark.createDataFrame(rows, "g: string, v: long")
    con = _connect({"vals": ("g VARCHAR, v BIGINT", rows)})
    mism = []
    try:
        if which == "qhist":
            regs = QH.qhist_registers(df, ["g"], "v")
            mism += _diff(f"sketch[{seed}]:qhist_regs", regs, """
                SELECT g,
                       CAST(CASE WHEN v <= 0 THEN 0
                            ELSE length(bin(CAST(v AS BIGINT))) END AS INT)
                         AS bucket,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM vals GROUP BY 1, 2""", con)
            merged = QH.qhist_merge(
                *[QH.qhist_registers(p, ["g"], "v")
                  for p in _parts(rng, df, n_parts)], group_cols=["g"])
            mism += _df_eq(f"sketch[{seed}]:qhist_merge", merged, regs)
            # contract: p50/p95 bounds bracket the exact order statistic
            bounds = {r["g"]: r for r in QH.qhist_quantile_bounds(
                regs, ["g"], {"p50": (1, 2), "p95": (19, 20)}).collect()}
            for g, num, den, nm in [(g, n_, d_, nm_) for g in bounds
                                    for (nm_, n_, d_) in
                                    [("p50", 1, 2), ("p95", 19, 20)]]:
                exact = con.execute(f"""
                    SELECT v FROM (
                      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
                             COUNT(*) OVER () AS tot
                      FROM vals WHERE g = ?)
                    WHERE rn = (tot * {num} + {den} - 1) // {den}""",
                    [g]).fetchone()[0]
                lo, hi = bounds[g][f"{nm}_lo"], bounds[g][f"{nm}_hi"]
                if not ((lo is None or lo <= exact) and exact <= hi):
                    mism.append(f"qhist bounds violated: g={g} {nm} "
                                f"exact={exact} not in [{lo},{hi}]")
        elif which == "cms":
            regs = CMS.cms_registers(df, ["g"], "v")
            mism += _diff(f"sketch[{seed}]:cms_regs", regs, f"""
                SELECT g, CAST(r.row AS INT) AS row,
                       CAST(CAST(('0x' || substring(md5('r' || r.row || '|'
                         || CAST(v AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {CMS.W_COLS} AS INT) AS col,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM vals, LATERAL (SELECT unnest(range(0, {CMS.D_ROWS}))
                                    AS row) r
                GROUP BY 1, 2, 3""", con)
            merged = CMS.cms_merge(
                *[CMS.cms_registers(p, ["g"], "v")
                  for p in _parts(rng, df, n_parts)], group_cols=["g"])
            mism += _df_eq(f"sketch[{seed}]:cms_merge", merged, regs)
            # contract: one-sided error — estimates never undercount
            probes = df.select("g", "v").distinct()
            est = {(r["g"], r["v"]): r["est"] for r in
                   CMS.cms_estimate(regs, probes, ["g"], "v").collect()}
            exact = {(g, v): c for g, v, c in con.execute(
                "SELECT g, v, COUNT(*) FROM vals GROUP BY 1, 2").fetchall()}
            under = [kv for kv, c in exact.items() if est.get(kv, 0) < c]
            if under:
                mism.append(f"cms undercount at {under[:3]}")
        else:
            k = rng.choice([4, 8, 16])
            sig = BK.bottomk_signature(df, ["g"], "v", k=k)
            mism += _diff(f"sketch[{seed}]:bottomk_sig", sig, f"""
                WITH d AS (SELECT DISTINCT g, v FROM vals
                           WHERE v IS NOT NULL),
                s AS (SELECT g, md5(CAST(v AS VARCHAR)) AS h, v AS key,
                             CAST(ROW_NUMBER() OVER (PARTITION BY g
                               ORDER BY md5(CAST(v AS VARCHAR))) AS INT)
                               AS rank
                      FROM d)
                SELECT g, h, key, rank FROM s WHERE rank <= {k}""", con)
            merged = BK.bottomk_merge(
                *[BK.bottomk_signature(p, ["g"], "v", k=k)
                  for p in _parts(rng, df, n_parts)],
                group_cols=["g"], k=k)
            mism += _df_eq(f"sketch[{seed}]:bottomk_merge", merged, sig)
            # contract: KMV exact when unsaturated
            ndv = {r["g"]: r for r in
                   BK.bottomk_ndv(sig, ["g"], k=k).collect()}
            exact = dict(con.execute(
                "SELECT g, COUNT(DISTINCT v) FROM vals GROUP BY 1")
                .fetchall())
            for g, r in ndv.items():
                if r["n_sig"] < k and r["est_ndv"] != float(exact[g]):
                    mism.append(f"bottomk unsaturated ndv wrong: g={g} "
                                f"est={r['est_ndv']} exact={exact[g]}")
            params["k"] = k
    finally:
        con.close()
    return {"family": "sketch", "seed": seed, "params": params,
            "ok": not mism, "mismatches": mism}


# --------------------------------------------------------------------------


#: third element = fixed per-family seed offset — NOT hash(name),
#: which PYTHONHASHSEED randomizes per process
FAMILIES = {
    "pq": (run_pq_draw, 0.4, 1),
    "prefix": (run_prefix_draw, 0.2, 2),
    "minhash": (run_minhash_draw, 0.2, 3),
    "sketch": (run_sketch_draw, 0.2, 4),
}


def run(spark: SparkSession, n_total: int = 120,
        master_seed: int = 20260816, progress=print) -> dict:
    t0 = time.time()
    results = []
    for fam, (fn, share, fam_off) in FAMILIES.items():
        n_fam = max(1, round(n_total * share))
        for i in range(n_fam):
            seed = master_seed * 1000 + fam_off * 1000 + i
            try:
                r = fn(spark, seed)
            except Exception as e:  # a crash IS a finding — record it
                r = {"family": fam, "seed": seed, "params": {},
                     "ok": False,
                     "mismatches": [f"CRASH {type(e).__name__}: {e}"]}
            results.append(r)
            if not r["ok"]:
                progress(f"FAIL {fam}[{seed}] {r['params']} :: "
                         f"{r['mismatches'][:2]}")
        done = len([r for r in results if r["family"] == fam])
        ok = len([r for r in results if r["family"] == fam and r["ok"]])
        progress(f"{fam}: {ok}/{done} in {time.time() - t0:.0f}s "
                 "cumulative")
    bad = [r for r in results if not r["ok"]]
    return {
        "master_seed": master_seed,
        "n_configs": len(results),
        "passed": len(results) - len(bad),
        "wall_sec": round(time.time() - t0, 1),
        "per_family": {
            fam: {"n": len([r for r in results if r["family"] == fam]),
                  "passed": len([r for r in results
                                 if r["family"] == fam and r["ok"]])}
            for fam in FAMILIES},
        "failures": [{k: r[k] for k in
                      ("family", "seed", "params", "mismatches")}
                     for r in bad],
    }


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    master_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    dest = sys.argv[3] if len(sys.argv) > 3 else \
        os.path.join(REPO, "scripts", "fuzz_r13.json")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, n_total, master_seed)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"fuzz": f"{out['passed']}/{out['n_configs']}",
                      "wall_sec": out["wall_sec"], "out": dest}),
          flush=True)
    sys.exit(0 if out["passed"] == out["n_configs"] else 1)


if __name__ == "__main__":
    main()
