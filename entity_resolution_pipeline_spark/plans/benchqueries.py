"""The engine's query battery: Spark implementations + ANSI-SQL oracles.

Every operator family from SURVEY.md §2 (and the training-data-pipeline
extensions: dedup, ANN, text analysis, multimodal) is exercised by at least
one named query over the driver testdata tables. For each query there is

* a Spark callable ``(spark, sf_dir) -> DataFrame`` (in ``QUERIES``), and
* an equivalent DuckDB SQL string (in ``ORACLE_SQL``) over the same parquet
  tables, used by the driver's side-by-side correctness check.

Column names are aliased identically on both sides (the compare hashes
values after sorting columns by name). Doubles that aggregate across rows
are rounded on both sides so IEEE summation-order differences between
engines cannot flip the hash. Hashing-based signatures (MinHash, SimHash)
are built on md5 specifically so DuckDB reproduces them bit-for-bit
(see functions/hashing.py).

Queries whose semantics SQL cannot express (iterative CC inside the full ER
pipeline with pUDF extraction) are registered without an oracle — the
driver records the weaker rows-only check for those, per contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import shingles_col, simhash_col
from ..functions.normalize import (
    acronym_col, fingerprint_col, normalize_ascii_col, prefix_col,
)
from ..functions.textstats import (
    LANG_STOPWORDS, bpe_ish_token_count_col, content_hash_col, lang_id_col,
    quality_score_col, token_count_col,
)
from ..operators.ann import brute_force_topk, ivf_topk
from ..operators.curation import (
    CHUNK_SIZE, CHUNK_STRIDE, DOMAIN_MIN_DOCS, DOMAIN_MIN_QUALITY,
    GATE_MIN_QUALITY, PACK_BUDGET, PACK_SHARDS,
    build_vocab, chunk_documents, corpus_length_stats, curation_flags,
    domain_stats, pack_sequences, training_corpus,
)
from ..operators.curation import _tokens as _curation_tokens
from ..operators.dedup import (
    fuzzy_dedup, lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs,
    shingle_table, simhash_table,
)
from ..operators.clustering import assign_clusters
from ..operators.multimodal import decode_media, media_stats, media_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like :func:`_t` but repartitioned to the session's parallelism.

    The testdata files are single tiny parquet splits, so a plain scan gives
    CPU-bound derivations (shingling, MinHash, SimHash) exactly one task. At
    production scale the input arrives in thousands of splits and this
    repartition is unnecessary — it exists so local benchmarks measure the
    operator, not a one-core artifact of a sub-128MB file.
    """
    return _t(spark, sf_dir, name).repartition(spark.sparkContext.defaultParallelism)


# =============================================================================
# Relational battery (TPC-H-ish): scans, filters, joins, aggs, windows, sets
# =============================================================================


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: filter → hash agg with partial map-side combine (A1/A10)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2002-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
       round(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(AVG(l_quantity) AS DOUBLE), 4) AS avg_qty,
       round(CAST(AVG(l_discount) AS DOUBLE), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_region(spark, sf_dir):
    """3-way join with broadcast dims (J3/J7): region⋈nation⋈customer⋈orders."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


ORACLE_REVENUE_BY_REGION = """
SELECT r.r_name AS region_name,
       round(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_top3_orders_per_customer(spark, sf_dir):
    """Top-N per group via row_number window with deterministic tie-break (W1)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rn").alias("rnk"),
        )
    )


ORACLE_TOP3_ORDERS = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       round(CAST(o_totalprice AS DOUBLE), 2) AS totalprice, rn AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_customer_order_profile(spark, sf_dir):
    """Group-agg with collect_set → sorted pipe-join (A4) + first/min (A3)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|")
             .alias("priorities"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


ORACLE_CUSTOMER_ORDER_PROFILE = """
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|') AS priorities,
       MIN(o_orderkey) AS first_orderkey,
       round(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS max_price
FROM orders
GROUP BY o_custkey
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti-join (J5): customers with no pending ('P'-status) orders."""
    cust = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return cust.join(
        pending, cust.c_custkey == pending.o_custkey, "left_anti"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey AS custkey, c_name AS name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


def q_parts_multi_supplier(spark, sf_dir):
    """Semi-join + window-count conflict detection (J6/D3): parts supplied by
    more than one supplier in lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("l_partkey")
    return (
        per.withColumn("n_suppliers", F.count("*").over(w))
        .where(F.col("n_suppliers") > 1)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.max("n_suppliers").alias("n_suppliers"))
    )


ORACLE_PARTS_MULTI_SUPPLIER = """
SELECT l_partkey AS partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(DISTINCT l_suppkey) > 1
"""


def q_rollup_orders(spark, sf_dir):
    """Multi-dim lineage stats via rollup (A11)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n", "revenue",
        )
    )


ORACLE_ROLLUP_ORDERS = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       COUNT(*) AS n, round(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS revenue
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_running_revenue(spark, sf_dir):
    """Running cumulative aggregate per key (W5) with total-order tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_revenue"),
    )


ORACLE_RUNNING_REVENUE = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       round(CAST(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_revenue
FROM orders
"""


def q_order_year_quarter(spark, sf_dir):
    """Date-part extraction (P16) + when() bucketing (P17/D1)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.when(F.col("o_totalprice") >= 300000, "A")
         .when(F.col("o_totalprice") >= 150000, "B")
         .when(F.col("o_totalprice") >= 50000, "C")
         .otherwise("REJECT").alias("tier"),
    )


ORACLE_ORDER_YEAR_QUARTER = """
SELECT o_orderkey AS orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CASE WHEN o_totalprice >= 300000 THEN 'A'
            WHEN o_totalprice >= 150000 THEN 'B'
            WHEN o_totalprice >= 50000 THEN 'C'
            ELSE 'REJECT' END AS tier
FROM orders
"""


def q_priority_except(spark, sf_dir):
    """Relational EXCEPT (U3): priorities seen in open but never finished orders."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority"))
    b = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority"))
    return a.exceptAll(b).distinct()


ORACLE_PRIORITY_EXCEPT = """
SELECT DISTINCT priority FROM (
  SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
)
"""


# =============================================================================
# Events: forward-fill, sessionization, JSON extraction
# =============================================================================


def q_events_ffill(spark, sf_dir):
    """Forward-fill via last(ignorenulls) frame window (W3 / S3 ffill)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    big = F.when(F.col("value") > 100.0, F.col("value"))
    return ev.select(
        "event_id", "user_id",
        F.round(F.last(big, ignorenulls=True).over(w), 4).alias("last_big_value"),
    )


ORACLE_EVENTS_FFILL = """
SELECT event_id, user_id,
       round(CAST(last_value(CASE WHEN value > 100.0 THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
         AS last_big_value
FROM events
"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization: lag → gap flag → cumulative session index (W5)."""
    ev = _t(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # ntz-safe (session tz UTC)
    gap = epoch - F.lag(epoch).over(order_w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("new_sess", new_sess)
        .select(
            "event_id", "user_id",
            F.sum("new_sess").over(cum_w).alias("session_idx"),
        )
    )


ORACLE_EVENTS_SESSIONIZE = """
SELECT event_id, user_id,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
FROM (
  SELECT *, CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                 OR lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS new_sess
  FROM events
)
"""


def q_events_json(spark, sf_dir):
    """JSON-in-string extraction (P18/D4 analog): props.k as int."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


ORACLE_EVENTS_JSON = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
"""


def q_events_type_stats(spark, sf_dir):
    """value_counts + conditional aggregates (A5/A10)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0)).alias("n_big"),
            F.round(F.avg((F.col("value") > 100.0).cast("int")), 6).alias("rate_big"),
        )
    )


ORACLE_EVENTS_TYPE_STATS = """
SELECT event_type, COUNT(*) AS n,
       round(CAST(AVG(value) AS DOUBLE), 4) AS avg_value,
       CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       round(CAST(AVG(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS DOUBLE), 6) AS rate_big
FROM events
GROUP BY event_type
"""


# =============================================================================
# Text analysis over documents (normalize, fingerprint, lang-id, quality)
# =============================================================================


def q_docs_normalize(spark, sf_dir):
    """Canonical normalization chain, native ASCII path (P1-P3)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_ascii_col(F.col("text")).alias("text_norm"))


ORACLE_DOCS_NORMALIZE = r"""
SELECT doc_id,
       lower(trim(regexp_replace(regexp_replace(coalesce(text, ''),
             '[^a-zA-Z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS text_norm
FROM documents
"""


def q_docs_fingerprint(spark, sf_dir):
    """Fingerprint / prefix / acronym / token count (P5-P8)."""
    docs = _t(spark, sf_dir, "documents")
    norm = normalize_ascii_col(F.col("text"))
    fp = fingerprint_col(norm, 2)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        prefix_col(fp, 8).alias("prefix8"),
        acronym_col(fp).alias("acronym"),
        token_count_col(norm).alias("n_tokens"),
    )


ORACLE_DOCS_FINGERPRINT = r"""
WITH n AS (
  SELECT doc_id,
         lower(trim(regexp_replace(regexp_replace(coalesce(text, ''),
               '[^a-zA-Z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS tn
  FROM documents
), f AS (
  SELECT doc_id, tn,
         array_to_string(list_sort(list_distinct(
           list_filter(string_split_regex(tn, '\s+'), t -> len(t) >= 2 AND t <> ''))), ' ')
           AS fingerprint
  FROM n
)
SELECT doc_id, fingerprint,
       substring(regexp_replace(fingerprint, '\s', '', 'g'), 1, 8) AS prefix8,
       upper(array_to_string(list_transform(
         list_filter(string_split_regex(fingerprint, '\s+'), t -> t <> ''),
         t -> substring(t, 1, 1)), '')) AS acronym,
       CAST(len(list_filter(string_split_regex(tn, '\s+'), t -> t <> '')) AS INT)
         AS n_tokens
FROM f
"""


def q_docs_winnow(spark, sf_dir):
    """Winnowing fingerprints (the MOSS algorithm): 32-bit hashes of
    word 4-shingles, minimum per sliding window of 4 hashes, sorted
    distinct selections — position-robust fingerprints with a guaranteed
    match window (any shared run of 7 words shares a fingerprint) at
    ~1/4 the density of full shingle sets, which is what plagiarism /
    near-dup indexes store at scale instead of every shingle. Pure
    per-row expression; the oracle reproduces the hash (md5-prefix
    integer) and the window minima exactly. The fingerprint SET is
    serialized to one comma-joined string in the battery projection —
    the driver's canonicalizer pandas-sorts raw cells and cannot hash
    list values (round-4 driver regression), so array outputs must leave
    the battery as scalars. Library:
    functions/hashing.py:winnow_fingerprints_col."""
    from ..functions.hashing import winnow_fingerprints_col

    docs = _t_wide(spark, sf_dir, "documents")
    fp = winnow_fingerprints_col(F.col("text"), k=4, w=4)
    return docs.select(
        "doc_id",
        F.array_join(F.transform(fp, lambda x: x.cast("string")), ",")
        .alias("fingerprints"),
        F.size(fp).cast("long").alias("n_fingerprints"),
    )


# Inner form (fingerprints as a BIGINT list) — composed by the winnow
# candidate-pair oracle, which unnests it; the battery-facing
# ORACLE_DOCS_WINNOW below serializes the list to a scalar string to
# mirror the Spark projection (driver canonicalizer can't sort lists).
_ORACLE_WINNOW_FP = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), hs AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4 THEN
                list_transform(generate_series(1, len(toks) - 3),
                  i -> CAST(('0x' || substring(md5(
                         toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2] || ' ' || toks[i+3]), 1, 8))
                       AS BIGINT))
              WHEN len(toks) > 0 THEN
                [CAST(('0x' || substring(md5(
                   array_to_string(toks, ' ')), 1, 8)) AS BIGINT)]
              ELSE CAST([] AS BIGINT[]) END AS h
  FROM t
), fp AS (
  SELECT doc_id,
         CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
              ELSE list_sort(list_distinct(list_transform(
                     generate_series(1, greatest(len(h) - 3, 1)),
                     j -> list_min(list_slice(h, j, j + 3)))))
         END AS fingerprints
  FROM hs
)
SELECT doc_id, fingerprints,
       CAST(len(fingerprints) AS BIGINT) AS n_fingerprints
FROM fp
"""

ORACLE_DOCS_WINNOW = f"""
WITH wf AS ({_ORACLE_WINNOW_FP})
SELECT doc_id, array_to_string(fingerprints, ',') AS fingerprints,
       n_fingerprints
FROM wf
"""


def q_dedup_winnow_pairs(spark, sf_dir):
    """Near-dup candidates from the winnowing index: ids sharing a
    winnow fingerprint (guaranteed collision for any shared 7-word run),
    degenerate buckets dropped, bucketed self-join — the MOSS index at
    ~1/4 full-shingle density. Library:
    operators/dedup.py:winnow_candidate_pairs."""
    from ..operators.dedup import winnow_candidate_pairs

    docs = _t_wide(spark, sf_dir, "documents")
    return winnow_candidate_pairs(docs, stop_threshold=LSH_STOP)


def _oracle_dedup_winnow_pairs() -> str:
    return f"""
WITH wf AS ({_ORACLE_WINNOW_FP}),
fps AS (
  SELECT doc_id AS id, unnest(fingerprints) AS fp FROM wf
), keep AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {LSH_STOP}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM fps a
JOIN keep k ON a.fp = k.fp
JOIN fps b ON a.fp = b.fp
WHERE a.id < b.id
"""


def q_docs_lang_id(spark, sf_dir):
    """Stopword-heuristic language ID (training-data text analysis)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_col(F.col("text")).alias("lang_pred"))


def _oracle_lang_id(table: dict[str, list[str]] | None = None) -> str:
    table = LANG_STOPWORDS if table is None else table
    hit_cols = []
    for lang, stops in table.items():
        inlist = ", ".join(f"'{s}'" for s in stops)
        hit_cols.append(
            f"len(list_filter(w, t -> t IN ({inlist}))) AS h_{lang}"
        )
    langs = list(table)
    mx = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + mx + " = 0 THEN 'und' "
    for l in langs:  # first language reaching the max wins (epsilon order)
        case += f"WHEN h_{l} = {mx} THEN '{l}' "
    case += "END"
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9'']+'),
                     t -> t <> '') AS w
  FROM documents
), h AS (
  SELECT doc_id, {', '.join(hit_cols)} FROM w
)
SELECT doc_id, {case} AS lang_pred FROM h
"""


def q_docs_quality(spark, sf_dir):
    """Composite quality score + BPE-ish token count."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        quality_score_col(F.col("text")).alias("quality"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_ish"),
    )


ORACLE_DOCS_QUALITY = r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), m AS (
  SELECT doc_id, t,
         CAST(len(t) AS DOUBLE) AS n_chars,
         list_filter(string_split_regex(lower(t), '[^a-z0-9'']+'), x -> x <> '') AS w,
         CAST(len(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha
  FROM base
), r AS (
  SELECT doc_id, t, n_chars, alpha,
         CAST(len(w) AS DOUBLE) AS n_words,
         CAST(len(list_filter(w, x -> x IN ('the','and','of','to','in','is','that','it','for','with'))) AS DOUBLE) AS stop_hits
  FROM m
)
SELECT doc_id,
       round((
         (CASE WHEN n_words > 0 AND alpha / n_words >= 3 AND alpha / n_words <= 10
               THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END)
         + least((CASE WHEN n_words > 0 THEN stop_hits / n_words ELSE 0.0 END) * 5, 1.0)
       ) / 3.0, 6) AS quality,
       CAST(len(list_filter(string_split_regex(t, '\s+'), x -> x <> ''))
            + len(regexp_extract_all(t, '[a-zA-Z][0-9]|[0-9][a-zA-Z]')) AS INT)
         AS n_bpe_ish
FROM r
"""


def q_docs_stats_by_source(spark, sf_dir):
    """Per-source descriptive aggregates (A9, exact parts only)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


ORACLE_DOCS_STATS = """
SELECT source, COUNT(*) AS n_docs,
       round(CAST(AVG(n_chars) AS DOUBLE), 4) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
"""


# =============================================================================
# Deduplication battery over documents
# =============================================================================


def q_dedup_exact(spark, sf_dir):
    """Exact-dedup hash groups (all groups, incl. singletons)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(content_hash_col(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper"))
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(coalesce(text, '')) AS content_hash,
       COUNT(*) AS n_dups, MIN(doc_id) AS keeper
FROM documents
GROUP BY md5(coalesce(text, ''))
"""


_SHINGLE_SQL = r"""
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
"""

_SHINGLE3 = """
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(toks) - 2),
                  i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
              WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
              ELSE [] END AS sh
  FROM t
"""


def q_dedup_minhash_sigs(spark, sf_dir):
    """Per-band MinHash signatures (md5-based, engine-portable)."""
    docs = _t_wide(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", k=3, n_bands=4)


def _mh_band_sql(b: int) -> str:
    """Band-b MinHash in the one-md5-per-shingle scheme: 8-hex slice o of
    digest group g (g ≥ 1 salts the input), mirroring minhash_sig_col."""
    g, o = divmod(b, 4)
    inner = "md5(s)" if g == 0 else f"md5('g{g}:' || s)"
    return f"list_min(list_transform(sh, s -> substring({inner}, {1 + 8 * o}, 8)))"


def _oracle_minhash_sigs(n_bands: int = 4) -> str:
    bands = ", ".join(f"{_mh_band_sql(b)} AS mh_{b}" for b in range(n_bands))
    return f"WITH t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3}) SELECT doc_id, {bands} FROM s"


LSH_STOP = 200  # degenerate-bucket guard: >200 members at sf-scale = no signal


UNIGRAM_V = 60       # battery vocab budget (chars + top substrings)
UNIGRAM_ITERS = 2    # hard-EM iterations replayed by the oracle


def q_unigram_train(spark, sf_dir):
    """Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training:
    seed vocabulary = all chars + top frequent substrings (≤4 chars,
    frequency-weighted, overlapping), then 2 hard-EM iterations — each
    Viterbi-segments the WORD TABLE (corpus touched once) with the
    current add-one-smoothed piece log-probs and re-counts pieces from
    the best segmentations. Returns the ranked piece table
    (rank, piece, cnt, logp). The oracle replays the seed selection and
    BOTH EM iterations, with the Viterbi DP as a recursive CTE whose
    (score, longer-piece) tie-break matches the Spark fold bit-for-bit.
    Library: operators/tokenizer.py:unigram_train."""
    from ..operators.tokenizer import unigram_train

    return unigram_train(_t_wide(spark, sf_dir, "documents"),
                         vocab_size=UNIGRAM_V, n_em=UNIGRAM_ITERS)


def q_unigram_segment(spark, sf_dir):
    """Apply the trained unigram tokenizer back to the corpus:
    per-source (n_words, n_pieces, avg_pieces_per_word) via ONE Viterbi
    pass over the word table + a dictionary join on the word key (the
    same scale-correct encode as bpe_segment — never a per-document DP).
    Library: operators/tokenizer.py:unigram_token_stats."""
    from ..operators.tokenizer import unigram_token_stats

    return unigram_token_stats(_t_wide(spark, sf_dir, "documents"),
                               vocab_size=UNIGRAM_V, n_em=UNIGRAM_ITERS)


def _oracle_unigram(n_em: int, mode: str) -> str:
    """Generated DuckDB replica of the full unigram-LM training loop:
    seed substring counts + top-V selection, then per iteration a
    recursive-CTE Viterbi DP (struct-MAX on (score, piece-length) — the
    exact tie-break of the Spark fold) and the weighted piece recount
    with add-one smoothing. ``mode``: "train" emits the ranked piece
    table; "segment" dictionary-joins the final segmentation sizes back
    to the corpus words per source."""
    from ..operators.tokenizer import UNIGRAM_MAXP

    parts = [rf"""
WITH RECURSIVE w AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc FROM (
    SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                 '\s+'),
                  x -> x <> '')) AS word FROM documents)
  GROUP BY word
), ks AS (SELECT unnest(generate_series(1, {UNIGRAM_MAXP})) AS k),
sub AS (
  SELECT piece, SUM(wc) AS cnt FROM (
    SELECT s.wc, substring(s.word, g.i, s.k) AS piece
    FROM (SELECT word, wc,
                 unnest(generate_series(1, least(length(word),
                                                 {UNIGRAM_MAXP}))) AS k
          FROM w) s,
         unnest(generate_series(1, length(s.word) - s.k + 1)) AS g(i)
  ) GROUP BY piece
),
chars AS (SELECT piece, cnt FROM sub WHERE length(piece) = 1),
multi AS (
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM sub WHERE length(piece) > 1)
  WHERE rn <= {UNIGRAM_V} - (SELECT COUNT(*) FROM chars)
),
c0 AS MATERIALIZED (SELECT * FROM chars UNION ALL SELECT * FROM multi),
v0 AS MATERIALIZED (
  SELECT piece,
         round(ln((cnt + 1.0) / ((SELECT SUM(cnt) FROM c0)
                                 + (SELECT COUNT(*) FROM c0))), 6) AS logp
  FROM c0
)"""]
    for it in range(1, n_em + 1):
        p = it - 1
        parts.append(f""",
dp{it} AS (
  SELECT word, wc, 0 AS j,
         [CAST(0.0 AS DOUBLE)] AS scores,
         [CAST([] AS VARCHAR[])] AS segs
  FROM w
  UNION ALL
  SELECT word, wc, j + 1 AS j,
         list_append(scores, best['s']) AS scores,
         list_append(segs, best['seg']) AS segs
  FROM (
    SELECT d.word, d.wc, d.j, d.scores, d.segs,
           MAX({{'s': d.scores[d.j + 2 - k.k] + v.logp,
                'k': k.k,
                'seg': list_append(d.segs[d.j + 2 - k.k], v.piece)}}) AS best
    FROM dp{it} d
    JOIN ks k ON k.k <= d.j + 1
    JOIN v{p} v ON v.piece = substring(d.word, d.j + 2 - k.k, k.k)
    WHERE d.j < length(d.word)
    GROUP BY d.word, d.wc, d.j, d.scores, d.segs
  )
),
seg{it} AS MATERIALIZED (
  SELECT word, wc, segs[length(word) + 1] AS seg
  FROM dp{it} WHERE j = length(word)
),
g{it} AS (
  SELECT piece, SUM(wc) AS n FROM (
    SELECT wc, unnest(seg) AS piece FROM seg{it}) GROUP BY piece
),
c{it} AS MATERIALIZED (
  SELECT c.piece, CAST(coalesce(g.n, 0) AS BIGINT) AS cnt
  FROM c0 c LEFT JOIN g{it} g ON c.piece = g.piece
),
v{it} AS MATERIALIZED (
  SELECT piece,
         round(ln((cnt + 1.0) / ((SELECT SUM(cnt) FROM c{it})
                                 + (SELECT COUNT(*) FROM c{it}))), 6) AS logp
  FROM c{it}
)""")
    if mode == "train":
        parts.append(f"""
SELECT CAST(row_number() OVER (ORDER BY c.cnt DESC, c.piece ASC) AS INTEGER)
         AS rank,
       c.piece, c.cnt, v.logp
FROM c{n_em} c JOIN v{n_em} v ON c.piece = v.piece
""")
    else:
        parts.append(rf"""
SELECT d.source, COUNT(*) AS n_words,
       CAST(SUM(len(s.seg)) AS BIGINT) AS n_pieces,
       round(AVG(len(s.seg)), 6) AS avg_pieces_per_word
FROM (SELECT source,
             unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                   '\s+'),
                    x -> x <> '')) AS word
      FROM documents) d
JOIN seg{n_em} s USING (word)
GROUP BY d.source
""")
    return "".join(parts)


def q_dedup_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs: ids sharing ≥1 MinHash band bucket (stop-key
    guarded — degenerate buckets are dropped, the skew story of blocking)."""
    docs = _t_wide(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, "doc_id", "text", k=3, n_bands=4,
                               stop_threshold=LSH_STOP)


def _oracle_lsh_pairs(n_bands: int = 4) -> str:
    bands = ", ".join(f"{_mh_band_sql(b)} AS mh_{b}" for b in range(n_bands))
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{b}:' || mh_{b} AS bucket FROM sigs" for b in range(n_bands)
    )
    return f"""
WITH t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3}),
sigs AS (SELECT doc_id, {bands} FROM s),
buckets0 AS ({unions}),
keep AS (SELECT bucket FROM buckets0 GROUP BY bucket HAVING COUNT(*) <= {LSH_STOP}),
buckets AS (SELECT b.* FROM buckets0 b JOIN keep k ON b.bucket = k.bucket)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard for every LSH candidate pair — one persisted
    shingle table shared between candidate generation and verification."""
    docs = _t_wide(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", k=3).persist()
    pairs = lsh_candidate_pairs(n_bands=4, stop_threshold=LSH_STOP, shingles=sh)
    out = ngram_jaccard_pairs(pairs=pairs, k=3, shingles=sh)
    # the wrapper's own shingle persist rides along with the forwarded
    # candidate-table handle so release_persisted frees BOTH
    out._erps_persisted = [sh, *(getattr(out, "_erps_persisted", None) or [])]
    return out


def _oracle_ngram_jaccard(n_bands: int = 4) -> str:
    pair_sql = _oracle_lsh_pairs(n_bands)
    return f"""
WITH pairs AS ({pair_sql}),
t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3})
SELECT p.id_a, p.id_b,
       round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
             THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh)))
             ELSE 0.0 END, 6) AS jaccard
FROM pairs p
JOIN s sa ON p.id_a = sa.doc_id
JOIN s sb ON p.id_b = sb.doc_id
"""


def q_dedup_containment(spark, sf_dir):
    """One-sided shingle containment (|A∩B|/|A| and /|B|) alongside
    Jaccard for every LSH candidate pair — the partial-copy signal: a
    short doc embedded in a long one scores low Jaccard (big union) but
    containment ≈ 1 on the short side, which is how curation pipelines
    catch quote-farms and wrapper pages. Shares the persisted shingle
    table with candidate generation. Library:
    operators/dedup.py:ngram_containment_pairs."""
    from ..operators.dedup import ngram_containment_pairs

    docs = _t_wide(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", k=3).persist()
    pairs = lsh_candidate_pairs(n_bands=4, stop_threshold=LSH_STOP,
                                shingles=sh)
    out = ngram_containment_pairs(pairs=pairs, k=3, shingles=sh)
    # EXTEND the forwarded candidate-table handle — overwriting it here
    # leaked the sigs cache (found by tools/audit_cache_bleed.py)
    out._erps_persisted = [sh, *(getattr(out, "_erps_persisted", None) or [])]
    return out


def _oracle_dedup_containment(n_bands: int = 4) -> str:
    pair_sql = _oracle_lsh_pairs(n_bands)
    return f"""
WITH pairs AS ({pair_sql}),
t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3})
SELECT p.id_a, p.id_b,
       round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
             THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh)))
             ELSE 0.0 END, 6) AS jaccard,
       round(CASE WHEN len(sa.sh) > 0
             THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(sa.sh) ELSE 0.0 END, 6) AS containment_a,
       round(CASE WHEN len(sb.sh) > 0
             THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(sb.sh) ELSE 0.0 END, 6) AS containment_b
FROM pairs p
JOIN s sa ON p.id_a = sa.doc_id
JOIN s sb ON p.id_b = sb.doc_id
"""


def q_dedup_simhash(spark, sf_dir):
    """Native 32-bit SimHash signature per document."""
    docs = _t_wide(spark, sf_dir, "documents")
    return simhash_table(docs, "doc_id", "text", bits=32)


def _oracle_simhash(bits: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(ints, h -> 2 * ((h >> {i}) & 1) - 1)) > 0 "
        f"THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
        for i in range(bits)
    )
    return rf"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '')) AS toks
  FROM documents
), i AS (
  SELECT doc_id,
         list_transform(toks, s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS ints
  FROM t
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM i
"""


def q_dedup_canonical(spark, sf_dir):
    """End-to-end fuzzy dedup: LSH candidates → exact-Jaccard verify →
    transitive closure → min-id keeper. Every document labeled."""
    docs = _t_wide(spark, sf_dir, "documents")
    out = fuzzy_dedup(docs, "doc_id", "text", k=3, n_bands=4,
                      threshold=0.7, stop_threshold=LSH_STOP)
    res = out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("dup_group").cast("bigint").alias("dup_group"),
        "is_keeper",
    )
    # .select drops the attribute — forward so release_persisted works
    res._erps_persisted = list(getattr(out, "_erps_persisted", None) or [])
    return res


def _oracle_dedup_canonical(n_bands: int = 4, threshold: float = 0.7) -> str:
    # group ids are LEXICOGRAPHIC minima (ids travel as strings through the
    # closure, mirroring ORACLE_CONNECTED_COMPONENTS)
    jacc_sql = _oracle_ngram_jaccard(n_bands)
    return f"""
WITH RECURSIVE ver AS (SELECT id_a, id_b FROM ({jacc_sql}) WHERE jaccard >= {threshold}),
e AS (SELECT id_a AS src, id_b AS dst FROM ver
      UNION SELECT id_b, id_a FROM ver),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src
  WHERE r.a <> e2.dst
), comp AS (
  SELECT a AS doc_id,
         MIN(least(CAST(a AS VARCHAR), CAST(b AS VARCHAR))) AS comp_str
  FROM reach GROUP BY a
)
SELECT d.doc_id,
       CAST(coalesce(c.comp_str, CAST(d.doc_id AS VARCHAR)) AS BIGINT) AS dup_group,
       coalesce(c.comp_str, CAST(d.doc_id AS VARCHAR)) = CAST(d.doc_id AS VARCHAR)
         AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


CURATION_MIN_QUALITY = 0.4


def q_corpus_curation(spark, sf_dir):
    """The canonical training-data pipeline end-to-end: keep fuzzy-dedup
    keepers that are predicted English above a quality floor, then report
    per-source corpus stats (docs kept, token budget, mean quality).

    Composition of three first-class operators — fuzzy_dedup (MinHash-LSH +
    Jaccard verify + transitive closure), lang_id_col, quality_score_col —
    exactly the filter→dedup→stats shape a 100 TB curation job runs.
    """
    docs = _t_wide(spark, sf_dir, "documents")
    fd = fuzzy_dedup(docs, "doc_id", "text", k=3, n_bands=4,
                     threshold=0.7, stop_threshold=LSH_STOP)
    keepers = (fd.where("is_keeper")
               .select(F.col("id").cast("bigint").alias("doc_id")))
    curated = (
        docs.join(keepers, "doc_id")
        .withColumn("lang_pred", lang_id_col(F.col("text")))
        .withColumn("quality", quality_score_col(F.col("text")))
        .withColumn("n_bpe_ish", bpe_ish_token_count_col(F.col("text")))
        .where((F.col("lang_pred") == "en")
               & (F.col("quality") >= CURATION_MIN_QUALITY))
    )
    res = curated.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe_ish").alias("n_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    # .where/.select dropped fuzzy_dedup's cache handles (the
    # training_corpus_full leak class the round-4 advisor flagged;
    # re-found here by tools/audit_cache_bleed.py)
    res._erps_persisted = list(getattr(fd, "_erps_persisted", None) or [])
    return res


def _oracle_corpus_curation() -> str:
    return f"""
WITH dedup AS ({_oracle_dedup_canonical(4, 0.7)}),
lang AS ({_oracle_lang_id()}),
qual AS ({ORACLE_DOCS_QUALITY})
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(q.n_bpe_ish) AS BIGINT) AS n_tokens,
       round(AVG(q.quality), 4) AS avg_quality
FROM documents d
JOIN dedup dd ON d.doc_id = dd.doc_id AND dd.is_keeper
JOIN lang l ON d.doc_id = l.doc_id AND l.lang_pred = 'en'
JOIN qual q ON d.doc_id = q.doc_id AND q.quality >= {CURATION_MIN_QUALITY}
GROUP BY d.source
"""


# =============================================================================
# Embeddings: ANN top-k, centroids, near-dup
# =============================================================================


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 20 vectors (broadcast queries)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


ORACLE_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), s AS (
  SELECT q.query_id, c.neighbor_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.qv, x -> x * x))) > 0
                     AND sqrt(list_sum(list_transform(c.cv, x -> x * x))) > 0
               THEN list_dot_product(q.qv, c.cv)
                    / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                       * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               ELSE 0.0 END, 6) AS cosine
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) WHERE rank <= 5
"""


PQ_M, PQ_K, PQ_TOPK = 4, 16, 5


def q_ann_pq(spark, sf_dir):
    """Product-quantization ADC top-5 (FAISS IndexPQ semantics): vectors
    L2-normalized (squared-L2 on unit vectors = 2 - 2·cosine, so ADC
    ranks like the exact cosine searches), seeded per-subspace codebooks
    (4 subspaces × 16 centroids over the 64-dim embeddings), argmin
    encode, per-query distance tables, m-lookup scoring. The oracle
    replicates the FULL PQ plan — normalization, codebook draw, encode
    argmin with (dist, cid) tie-break, ADC sum in subspace order.
    Recall on this synthetic corpus is modest (~0.3 @20 vs exact, ~7×
    random) because the embeddings are near-orthogonal noise and the
    codebooks are a seeded draw, not k-means — same disclosure as the
    SRP row; the operator contract equals FAISS IndexPQ with random
    init. Library: operators/ann.py:pq_topk."""
    from ..operators.ann import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return pq_topk(emb, queries, k=PQ_TOPK, m=PQ_M, k_cent=PQ_K)


ORACLE_ANN_PQ = f"""
WITH v0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), v1 AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v0
), v AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(e, x -> x / nrm)
              ELSE e END AS e
  FROM v1
), sub AS (
  SELECT vec_id, m, list_slice(e, (m - 1) * 16 + 1, m * 16) AS s
  FROM v, unnest([1, 2, 3, 4]) AS t(m)
), books AS (
  SELECT m, s AS cent,
         CAST(row_number() OVER (
           PARTITION BY m
           ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42:'
                        || CAST(m AS VARCHAR))) AS INTEGER) AS cid
  FROM sub
  QUALIFY cid <= {PQ_K}
), dists AS (
  SELECT s.vec_id, s.m, b.cid,
         list_sum(list_transform(generate_series(1, 16),
                  i -> (s.s[i] - b.cent[i]) * (s.s[i] - b.cent[i]))) AS d
  FROM sub s JOIN books b USING (m)
), codes AS (
  SELECT vec_id, m, cid
  FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) = 1
), adc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list(q.d ORDER BY q.m)), 6) AS adc_dist
  FROM codes c
  JOIN dists q ON c.m = q.m AND c.cid = q.cid
  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_dist,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank
FROM adc
QUALIFY rank <= {PQ_TOPK}
"""


def q_ann_ivf(spark, sf_dir):
    """IVF top-k at a REAL approximate setting (n_cells=8, n_probe=2) — the
    scale path for similarity search (J8; replaces FAISS IVF,
    /root/reference/src/blocking.py:438-517). Unlike ``ann_topk`` (exact
    brute force), the DuckDB oracle replicates the ENTIRE IVF plan — the
    seeded md5 centroid draw, the cosine-argmax cell assignment, and the
    per-query probe-cell selection — so the hash match verifies the
    approximate path itself, not merely its agreement with brute force.
    Cross-engine determinism holds because both sides fold identical
    float32→double casts left-to-right, so even the UNROUNDED argmax
    comparisons in assignment/probing agree bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=2)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


_IVF_COS = ("CASE WHEN sqrt(list_sum(list_transform({a}, x -> x * x))) > 0 "
            "AND sqrt(list_sum(list_transform({b}, x -> x * x))) > 0 "
            "THEN list_dot_product({a}, {b}) "
            "/ (sqrt(list_sum(list_transform({a}, x -> x * x))) "
            "* sqrt(list_sum(list_transform({b}, x -> x * x)))) "
            "ELSE 0.0 END")


def _oracle_ann_ivf() -> str:
    """DuckDB replica of the full IVF plan in ivf_topk/ivf_assign_cells."""
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_qc = _IVF_COS.format(a="q.qv", b="cn.c")
    cos_qn = _IVF_COS.format(a="p.qv", b="a.e")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT 8)
), asg AS (
  SELECT v.vec_id, v.e, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20
), pr AS (
  SELECT query_id, qv, cell_id FROM (
    SELECT q.query_id, q.qv, cn.cell_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {cos_qc} DESC, cn.cell_id ASC) AS rn
    FROM q CROSS JOIN cent cn) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         round({cos_qn}, 6) AS cosine
  FROM cells a JOIN pr p USING (cell_id)
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM cand) WHERE rank <= 5
"""


def q_ann_ivf_pq(spark, sf_dir):
    """IVF + residual PQ (FAISS IndexIVFPQ): coarse cells prune the scan
    (n_cells=8, n_probe=2) and ranking within probed cells is ADC over
    RESIDUALS (unit vector minus unit cell centroid) with seeded 4×16
    codebooks. The oracle replicates the ENTIRE composed plan in SQL —
    centroid draw, cosine cell assignment, residual computation, residual
    codebook draw, argmin encode, per-(query, probed-cell) distance
    tables, ADC sum — so the hash match verifies the composition itself.
    The battery row keeps the seeded draw + no refine for SQL parity; the
    production setting (kmeans codebooks + exact refine of the ADC
    shortlist) is pytest-pinned to beat BOTH halves' recall
    (tests/test_dedup_ann.py). Library: operators/ann.py:ivf_pq_topk."""
    from ..operators.ann import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ivf_pq_topk(emb, queries, k=PQ_TOPK, n_cells=8, n_probe=2,
                       m=PQ_M, k_cent=PQ_K)


def _oracle_ann_ivf_pq() -> str:
    """DuckDB replica of the full IndexIVFPQ plan in ivf_pq_topk."""
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_qc = _IVF_COS.format(a="q.qv", b="cn.c")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), u0 AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
), u AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(e, x -> x / nrm) ELSE e END
           AS eu
  FROM u0
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT 8)
), centu AS (
  SELECT cell_id,
         CASE WHEN nrm > 0 THEN list_transform(c, x -> x / nrm) ELSE c END
           AS cu
  FROM (SELECT cell_id, c,
               sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm
        FROM cent)
), asg AS (
  SELECT v.vec_id, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, cell_id FROM asg WHERE rn = 1
), resid AS (
  SELECT u.vec_id, cl.cell_id,
         list_transform(generate_series(1, len(u.eu)),
                        i -> u.eu[i] - cu.cu[i]) AS r
  FROM u JOIN cells cl USING (vec_id) JOIN centu cu USING (cell_id)
), sub AS (
  SELECT vec_id, cell_id, m,
         list_slice(r, (m - 1) * 16 + 1, m * 16) AS s
  FROM resid, unnest([1, 2, 3, 4]) AS t(m)
), books AS (
  SELECT m, s AS bcent,
         CAST(row_number() OVER (
           PARTITION BY m
           ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42:'
                        || CAST(m AS VARCHAR))) AS INTEGER) AS cid
  FROM sub
  QUALIFY cid <= {PQ_K}
), cdists AS (
  SELECT s.vec_id, s.cell_id, s.m, b.cid,
         list_sum(list_transform(generate_series(1, 16),
                  i -> (s.s[i] - b.bcent[i]) * (s.s[i] - b.bcent[i]))) AS d
  FROM sub s JOIN books b USING (m)
), codes AS (
  SELECT vec_id, cell_id, m, cid
  FROM cdists
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) = 1
), q AS (
  SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20
), pr AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, cn.cell_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {cos_qc} DESC, cn.cell_id ASC) AS rn
    FROM q CROSS JOIN cent cn) WHERE rn <= 2
), qresid AS (
  SELECT p.query_id, p.cell_id,
         list_transform(generate_series(1, len(u.eu)),
                        i -> u.eu[i] - cu.cu[i]) AS r
  FROM pr p JOIN u ON p.query_id = u.vec_id
  JOIN centu cu USING (cell_id)
), qsub AS (
  SELECT query_id, cell_id, m,
         list_slice(r, (m - 1) * 16 + 1, m * 16) AS s
  FROM qresid, unnest([1, 2, 3, 4]) AS t(m)
), qdists AS (
  SELECT s.query_id, s.cell_id, s.m, b.cid,
         list_sum(list_transform(generate_series(1, 16),
                  i -> (s.s[i] - b.bcent[i]) * (s.s[i] - b.bcent[i]))) AS d
  FROM qsub s JOIN books b USING (m)
), adc AS (
  SELECT qd.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list(qd.d ORDER BY qd.m)), 6) AS adc_dist
  FROM codes c
  JOIN qdists qd ON qd.cell_id = c.cell_id AND qd.m = c.m
                AND qd.cid = c.cid
  WHERE c.vec_id <> qd.query_id
  GROUP BY qd.query_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_dist,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank
FROM adc
QUALIFY rank <= {PQ_TOPK}
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (all-pairs baseline path)."""
    from ..operators.dedup import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.40, n_planes=0)


ORACLE_EMBEDDING_NEAR_DUP = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CASE WHEN sqrt(list_sum(list_transform(a.e, x -> x * x))) > 0
                   AND sqrt(list_sum(list_transform(b.e, x -> x * x))) > 0
             THEN list_dot_product(a.e, b.e)
                  / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                     * sqrt(list_sum(list_transform(b.e, x -> x * x))))
             ELSE 0.0 END, 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(CASE WHEN sqrt(list_sum(list_transform(a.e, x -> x * x))) > 0
                  AND sqrt(list_sum(list_transform(b.e, x -> x * x))) > 0
            THEN list_dot_product(a.e, b.e)
                 / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.e, x -> x * x))))
            ELSE 0.0 END, 6) >= 0.40
"""


SRP_TABLES, SRP_PLANES, SRP_DIM, SRP_SEED = 16, 3, 64, 42


def q_embedding_near_dup_srp(spark, sf_dir):
    """Embedding near-dup via banded sign-random-projection LSH — the scale
    path: L=16 hash tables × b=3 literal hyperplanes, bucket self-join,
    exact cosine verify. Same result contract as the all-pairs baseline
    minus LSH recall loss (bounded ≥0.9 in tests/test_dedup_ann.py)."""
    from ..operators.dedup import embedding_near_duplicates

    emb = _t_wide(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, threshold=0.40, n_tables=SRP_TABLES, n_planes=SRP_PLANES,
        dim=SRP_DIM, seed=SRP_SEED)


def _oracle_embedding_near_dup_srp() -> str:
    """DuckDB replica of the SRP path: the same driver-built ±1 plane matrix
    inlined as list literals, same bucket keys, same cosine verify."""
    from ..operators.dedup import srp_plane_matrix

    matrix = srp_plane_matrix(SRP_DIM, SRP_TABLES, SRP_PLANES, SRP_SEED)
    buckets = []
    for t, planes in enumerate(matrix):
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e, ["
            + ",".join(str(x) for x in row)
            + "]) >= 0 THEN '1' ELSE '0' END)"
            for row in planes
        )
        buckets.append(f"'{t}:' || {bits}")
    bucket_list = ",\n    ".join(buckets)
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), b AS (
  SELECT vec_id, e, u.bucket
  FROM v, unnest([
    {bucket_list}
  ]) AS u(bucket)
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT id_a, id_b,
       round(CASE WHEN sqrt(list_dot_product(x.e, x.e)) > 0
                   AND sqrt(list_dot_product(y.e, y.e)) > 0
             THEN list_dot_product(x.e, y.e)
                  / (sqrt(list_dot_product(x.e, x.e))
                     * sqrt(list_dot_product(y.e, y.e)))
             ELSE 0.0 END, 6) AS cosine
FROM cand JOIN v x ON cand.id_a = x.vec_id JOIN v y ON cand.id_b = y.vec_id
WHERE round(CASE WHEN sqrt(list_dot_product(x.e, x.e)) > 0
                  AND sqrt(list_dot_product(y.e, y.e)) > 0
            THEN list_dot_product(x.e, y.e)
                 / (sqrt(list_dot_product(x.e, x.e))
                    * sqrt(list_dot_product(y.e, y.e)))
            ELSE 0.0 END, 6) >= 0.40
"""


def q_embedding_centroids(spark, sf_dir):
    """Element-wise centroid per label via posexplode + group-avg."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("centroid_val"))
    )


ORACLE_EMBEDDING_CENTROIDS = """
SELECT label, CAST(i - 1 AS INT) AS pos,
       round(CAST(AVG(CAST(embedding[i] AS DOUBLE)) AS DOUBLE), 4) AS centroid_val
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i
"""


# =============================================================================
# Connected components (iterative large-star/small-star) vs recursive-CTE oracle
# =============================================================================


def _chain_edges(spark, sf_dir):
    """Deterministic edge set: rank docs within source; link rank-adjacent
    docs inside windows of 5 → components are chains of ≤5 (multi-hop, so the
    oracle genuinely requires transitivity)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    r = docs.select("doc_id", "source", (F.row_number().over(w) - 1).alias("r"))
    a = r.select("source", "r", F.col("doc_id").alias("src"))
    b = r.select("source", (F.col("r") - 1).alias("r"), F.col("doc_id").alias("dst"))
    # edge links rank r (src) to rank r+1 (dst); kept only when both fall in
    # the same window of 5 (floor(r/5) == floor((r+1)/5)) → chains of ≤5
    return (
        a.join(b, ["source", "r"])
        .where(F.pmod(F.col("r") + 1, F.lit(5)) != 0)
        .select(F.col("src").cast("string").alias("src"),
                F.col("dst").cast("string").alias("dst"))
    )


def q_connected_components(spark, sf_dir):
    """Large-star/small-star CC over the deterministic chain edges (G3)."""
    docs = _t(spark, sf_dir, "documents")
    edges = _chain_edges(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("string").alias("url"))
    out = assign_clusters(nodes, edges)
    res = out.select(
        F.col("url").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("component_id"),
    )
    # forward the closure's localCheckpoint handle for deterministic release
    res._erps_persisted = list(getattr(out, "_erps_persisted", None) or [])
    return res


# NOTE: node ids are compared as *strings* inside the CC operator (url
# semantics); the oracle mirrors that by casting before min().
ORACLE_CONNECTED_COMPONENTS = """
WITH RECURSIVE ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS r
  FROM documents
), e0 AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM ranked a JOIN ranked b ON a.source = b.source AND b.r = a.r - 1
  WHERE a.r % 5 <> 0
), e AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src
  WHERE r.a <> e2.dst
), comp AS (
  SELECT a AS doc_id,
         MIN(least(CAST(a AS VARCHAR), CAST(b AS VARCHAR))) AS comp_str
  FROM reach GROUP BY a
)
SELECT d.doc_id,
       CAST(coalesce(c.comp_str, CAST(d.doc_id AS VARCHAR)) AS BIGINT) AS component_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


# =============================================================================
# Multimodal plumbing (binary columns + typed metadata; decode is stubbed)
# =============================================================================


def q_media_stats(spark, sf_dir):
    """Typed-metadata aggregates over binary media columns (native)."""
    docs = _t(spark, sf_dir, "documents")
    return media_stats(media_table(docs)).select(
        "kind", "n_items", "total_bytes", "max_bytes", "distinct_payloads")


ORACLE_MEDIA_STATS = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(coalesce(text, '')) AS payload
  FROM documents
)
SELECT kind, COUNT(*) AS n_items,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes,
       COUNT(DISTINCT payload) AS distinct_payloads
FROM m GROUP BY kind
"""


def q_media_decode(spark, sf_dir):
    """mapInPandas decode plumbing with the deterministic fake codec —
    per-item byte-histogram features. Oracle-checkable because the stub's
    count/len ratios are plain IEEE divisions that DuckDB reproduces
    bit-for-bit from a hex-digit byte extraction (byte % 8 is a function
    of the low hex digit alone)."""
    docs = _t(spark, sf_dir, "documents")
    feats = decode_media(media_table(docs), fake=True, dim=8)
    return feats.select("media_id", "kind", "n_bytes",
                        F.element_at("feature", 1).alias("f0"),
                        F.element_at("feature", 4).alias("f3"),
                        F.element_at("feature", 8).alias("f7"))


ORACLE_MEDIA_DECODE = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(coalesce(text, '')) AS payload
  FROM documents
), h AS (
  SELECT media_id, kind, octet_length(payload) AS n,
         upper(to_hex(payload)) AS hx
  FROM m
), b AS (
  -- byte j's hex pair sits at chars (2j-1, 2j); byte %% 8 depends only on
  -- the LOW hex digit (16 = 0 mod 8), so one substring per byte suffices
  SELECT media_id, hx,
         unnest(generate_series(1, CAST(n AS BIGINT))) AS i
  FROM h
), d AS (
  SELECT media_id,
         (strpos('0123456789ABCDEF', substring(hx, CAST(i * 2 AS INT), 1)) - 1) % 8
           AS bucket
  FROM b
), c AS (
  SELECT media_id,
         SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS c3,
         SUM(CASE WHEN bucket = 7 THEN 1 ELSE 0 END) AS c7
  FROM d GROUP BY media_id
)
SELECT h.media_id, h.kind, CAST(h.n AS BIGINT) AS n_bytes,
       CASE WHEN h.n = 0 THEN 0.0
            ELSE CAST(coalesce(c.c0, 0) AS DOUBLE) / CAST(h.n AS DOUBLE) END AS f0,
       CASE WHEN h.n = 0 THEN 0.0
            ELSE CAST(coalesce(c.c3, 0) AS DOUBLE) / CAST(h.n AS DOUBLE) END AS f3,
       CASE WHEN h.n = 0 THEN 0.0
            ELSE CAST(coalesce(c.c7, 0) AS DOUBLE) / CAST(h.n AS DOUBLE) END AS f7
FROM h LEFT JOIN c USING (media_id)
"""


def q_media_frames(spark, sf_dir):
    """Video frame sampling (1→N mapInPandas row expansion) with the
    deterministic chunk stub: every 2nd 256-byte chunk, max 4 frames per
    video. The fake sampler is pure byte arithmetic, so the distributed
    expansion IS oracle-checkable (SQL substring over the blob).

    The frame is returned hex-encoded (``frame_hex``): the driver's pandas
    canonicalizer cannot factorize raw ``bytearray`` cells (round-2 red row),
    and a lossless hex string carries identical information."""
    from ..operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    frames = sample_frames(media_table(docs), frame_bytes=256, every_n=2,
                           max_frames=4, fake=True)
    return frames.select(
        "media_id", "frame_idx",
        F.hex(F.col("frame")).alias("frame_hex"),
    )


ORACLE_MEDIA_FRAMES = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         encode(coalesce(text, '')) AS payload
  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
), c AS (
  SELECT media_id, payload,
         CAST(ceil(octet_length(payload) / 256.0) AS BIGINT) AS n_chunks
  FROM m
)
SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
       -- 2 hex chars per byte: offset i*256 bytes = i*512 chars.
       -- upper() pins casing to Spark's (uppercase) hex() output.
       upper(substring(to_hex(payload), CAST(i AS BIGINT) * 512 + 1, 512)) AS frame_hex
FROM c CROSS JOIN (SELECT unnest([0, 2, 4, 6]) AS i) s
WHERE i < n_chunks
"""


# =============================================================================
# Temporal compat (F8) + investor guardrails (D6)
# =============================================================================


def q_year_compat(spark, sf_dir):
    """Year-difference + compatibility step function over planted year
    pairs from orders (some offsets, some NULL sides)."""
    from ..functions.dates import year_compat_col, year_diff_col

    o = _t(spark, sf_dir, "orders")
    m = F.pmod(F.col("o_orderkey"), F.lit(9))
    y1 = F.year("o_orderdate")
    y2 = F.when(m != 8, y1 + m.cast("int") - 3)  # diffs -3..4; m=8 → NULL
    return o.select(
        "o_orderkey",
        y1.alias("y1"), y2.alias("y2"),
        year_diff_col(y1, y2).alias("year_diff"),
        year_compat_col(y1, y2).alias("year_compat"),
    )


ORACLE_YEAR_COMPAT = """
WITH y AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS y1,
         CASE WHEN o_orderkey % 9 <> 8
              THEN CAST(year(o_orderdate) + (o_orderkey % 9) - 3 AS INT)
         END AS y2
  FROM orders
)
SELECT o_orderkey, y1, y2,
       abs(y1 - y2) AS year_diff,
       CAST(CASE WHEN y2 IS NULL THEN 0.5
            WHEN abs(y1 - y2) = 0 THEN 1.0
            WHEN abs(y1 - y2) <= 2 THEN 0.8
            WHEN abs(y1 - y2) <= 5 THEN 0.5
            ELSE 0.2 END AS DOUBLE) AS year_compat
FROM y
"""


def q_investor_guardrails(spark, sf_dir):
    """Promote/flag guardrails over planted tiers + investor coverage (D6)."""
    from ..operators.rerank import apply_investor_guardrails

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    tier = (
        F.when(F.pmod(k, 4) == 0, "A").when(F.pmod(k, 4) == 1, "B")
        .when(F.pmod(k, 4) == 2, "C").otherwise("REJECT")
    )
    matches = o.select(
        k.alias("match_id"),
        tier.alias("tier"),
        (F.pmod(k, 10).cast("double") / 10.0).alias("investor_cb_coverage"),
        (F.pmod(k, 3) > 0).alias("has_investor_data"),
    )
    return apply_investor_guardrails(matches, promote_threshold=0.3)


ORACLE_INVESTOR_GUARDRAILS = """
WITH m AS (
  SELECT o_orderkey AS match_id,
         CASE o_orderkey % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'B'
              WHEN 2 THEN 'C' ELSE 'REJECT' END AS tier,
         CAST(o_orderkey % 10 AS DOUBLE) / 10.0 AS investor_cb_coverage,
         (o_orderkey % 3) > 0 AS has_investor_data
  FROM orders
)
SELECT match_id, tier, investor_cb_coverage, has_investor_data,
       CASE WHEN investor_cb_coverage >= 0.3 AND tier IN ('B', 'C')
              THEN 'promoted'
            WHEN tier = 'A' AND has_investor_data
                 AND investor_cb_coverage = 0.0 THEN 'flagged'
            ELSE 'none' END AS investor_adjustment
FROM m
"""


# =============================================================================
# Corporate-family operators (G1/G2/J9)
# =============================================================================

_ENTITY_SQL = """
  SELECT s_suppkey AS bvd_id,
         CASE WHEN s_suppkey % 7 <> 6 THEN s_suppkey - (s_suppkey % 5) END
           AS guo_bvd_id,
         CASE WHEN s_suppkey % 3 = 1 THEN s_suppkey + 1000 END AS sub_bvd_id,
         CASE WHEN s_suppkey % 4 = 2 THEN s_suppkey + 2000 END AS sh_bvd_id,
         CASE WHEN s_suppkey % 6 = 3 THEN s_suppkey + 3000 END AS branch_bvd_id
  FROM supplier
"""


def _supplier_entities(spark, sf_dir):
    """Deterministic ownership graph planted on supplier: families of five
    consecutive ids with the multiple-of-5 as GUO; every 7th id standalone;
    sub/shareholder/branch edges on fixed residues."""
    sup = _t(spark, sf_dir, "supplier")
    s = F.col("s_suppkey")
    return sup.select(
        s.alias("bvd_id"),
        F.when(F.pmod(s, 7) != 6, s - F.pmod(s, 5)).alias("guo_bvd_id"),
        F.when(F.pmod(s, 3) == 1, s + 1000).alias("sub_bvd_id"),
        F.when(F.pmod(s, 4) == 2, s + 2000).alias("sh_bvd_id"),
        F.when(F.pmod(s, 6) == 3, s + 3000).alias("branch_bvd_id"),
    )


def q_family_structure(spark, sf_dir):
    """family_id = coalesce(guo, id) + role priority + edge flags (G1)."""
    from ..operators.family import derive_family_structure

    return derive_family_structure(_supplier_entities(spark, sf_dir))


ORACLE_FAMILY_STRUCTURE = f"""
WITH entities AS ({_ENTITY_SQL})
SELECT bvd_id,
       CAST(coalesce(guo_bvd_id, bvd_id) AS VARCHAR) AS family_id,
       CASE WHEN guo_bvd_id IS NOT NULL AND bvd_id = guo_bvd_id THEN 'GUO'
            WHEN branch_bvd_id IS NOT NULL THEN 'BRANCH'
            WHEN sub_bvd_id IS NOT NULL THEN 'SUBSIDIARY'
            ELSE 'ENTITY' END AS entity_role,
       CAST(guo_bvd_id AS VARCHAR) AS guo_bvd_id,
       CAST(guo_bvd_id IS NOT NULL AS INT) AS has_guo,
       CAST(sub_bvd_id IS NOT NULL AS INT) AS has_sub,
       CAST(sh_bvd_id IS NOT NULL AS INT) AS has_sh,
       CAST(branch_bvd_id IS NOT NULL AS INT) AS has_branch,
       CAST(guo_bvd_id IS NOT NULL AS INT) + CAST(sub_bvd_id IS NOT NULL AS INT)
       + CAST(sh_bvd_id IS NOT NULL AS INT)
       + CAST(branch_bvd_id IS NOT NULL AS INT) AS edge_count
FROM entities
"""


def q_family_features(spark, sf_dir):
    """Structural scorer features per entity: is_guo + log1p(family_size)
    (F9) over the planted ownership graph."""
    from ..operators.family import derive_family_structure, structural_features

    return structural_features(
        derive_family_structure(_supplier_entities(spark, sf_dir)))


ORACLE_FAMILY_FEATURES = f"""
WITH entities AS ({_ENTITY_SQL}),
fam AS (
  SELECT bvd_id,
         CAST(coalesce(guo_bvd_id, bvd_id) AS VARCHAR) AS family_id,
         CASE WHEN guo_bvd_id IS NOT NULL AND bvd_id = guo_bvd_id
              THEN 'GUO'
              WHEN branch_bvd_id IS NOT NULL THEN 'BRANCH'
              WHEN sub_bvd_id IS NOT NULL THEN 'SUBSIDIARY'
              ELSE 'ENTITY' END AS entity_role
  FROM entities
),
sizes AS (SELECT family_id, COUNT(*) AS n FROM fam GROUP BY family_id)
SELECT f.bvd_id, f.family_id,
       CAST(CASE WHEN f.entity_role = 'GUO' THEN 1.0 ELSE 0.0 END AS DOUBLE)
         AS is_guo,
       round(ln(1 + CAST(s.n AS DOUBLE)), 6) AS log1p_family_size
FROM fam f JOIN sizes s ON f.family_id = s.family_id
"""


def q_family_expand(spark, sf_dir):
    """Candidate expansion by GUO + top-3 family members (J9/G2), deduped
    with priority original > GUO > member."""
    from ..operators.family import (
        derive_family_structure, expand_candidates_by_family,
    )

    family = derive_family_structure(_supplier_entities(spark, sf_dir))
    sup = _t(spark, sf_dir, "supplier")
    cands = sup.where(F.col("s_suppkey") < 20).select(
        F.concat(F.lit("c"), F.col("s_suppkey").cast("string")).alias("cb_id"),
        F.col("s_suppkey").alias("bvd_id"),
    )
    return expand_candidates_by_family(cands, family, max_family_members=3)


ORACLE_FAMILY_EXPAND = f"""
WITH entities AS ({_ENTITY_SQL}),
fam AS (
  SELECT CAST(bvd_id AS VARCHAR) AS eid,
         CAST(coalesce(guo_bvd_id, bvd_id) AS VARCHAR) AS family_id,
         CAST(guo_bvd_id AS VARCHAR) AS guo
  FROM entities
),
cands AS (
  SELECT 'c' || CAST(s_suppkey AS VARCHAR) AS cand_id,
         CAST(s_suppkey AS VARCHAR) AS entity_id
  FROM supplier WHERE s_suppkey < 20
),
base AS (
  SELECT cand_id, entity_id, 'ORIGINAL' AS blocking_sources,
         100 AS blocking_score, 1 AS "rank", 0 AS prio
  FROM cands
),
joined AS (
  SELECT c.cand_id, c.entity_id, f.family_id, f.guo
  FROM cands c JOIN fam f ON c.entity_id = f.eid
),
guo_rows AS (
  SELECT cand_id, guo AS entity_id, 'FAMILY_EXPAND_GUO' AS blocking_sources,
         10 AS blocking_score, 999 AS "rank", 1 AS prio
  FROM joined WHERE guo IS NOT NULL AND guo <> entity_id
),
members AS (
  SELECT family_id, eid,
         row_number() OVER (PARTITION BY family_id ORDER BY eid ASC) AS mr
  FROM fam
),
member_rows AS (
  SELECT j.cand_id, m.eid AS entity_id, 'FAMILY_EXPAND' AS blocking_sources,
         5 AS blocking_score, 999 AS "rank", 2 AS prio
  FROM joined j JOIN members m ON j.family_id = m.family_id
  WHERE m.mr <= 3 AND m.eid <> j.entity_id
    AND (j.guo IS NULL OR m.eid <> j.guo)
),
allr AS (
  SELECT * FROM base UNION ALL SELECT * FROM guo_rows
  UNION ALL SELECT * FROM member_rows
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY cand_id, entity_id
            ORDER BY prio ASC, "rank" ASC, blocking_sources ASC) AS rn
  FROM allr
)
SELECT cand_id, entity_id, blocking_sources, blocking_score, "rank"
FROM r WHERE rn = 1
"""


# =============================================================================
# Legal-suffix strip (P4) + prose legal-name extraction (P20)
# =============================================================================


def q_legal_suffix_strip(spark, sf_dir):
    """Multi-pass legal-suffix strip + derived name views over deterministic
    suffix-laden company names synthesized from customer (P4/P7/P8)."""
    from ..functions.normalize import (
        acronym_col, prefix_col, strip_legal_suffix_col,
    )

    cust = _t(spark, sf_dir, "customer")
    m = F.pmod(F.col("c_custkey"), F.lit(6))
    suffix = (
        F.when(m == 0, F.lit(" GmbH & Co. KG"))
        .when(m == 1, F.lit(" Holdings Ltd."))
        .when(m == 2, F.lit(" S.p.A."))
        .when(m == 3, F.lit(" sp z o o"))
        .when(m == 4, F.lit(" Pty Ltd"))
        .otherwise(F.lit(""))
    )
    norm = normalize_ascii_col(F.concat(F.col("c_name"), suffix))
    out = cust.select(F.col("c_custkey"), norm.alias("name_norm"))
    stripped = strip_legal_suffix_col(F.col("name_norm"))
    inner = out.select("c_custkey", "name_norm", stripped.alias("name_stripped"))
    return inner.select(
        "c_custkey", "name_norm", "name_stripped",
        prefix_col(F.col("name_stripped"), 8).alias("prefix8"),
        acronym_col(F.col("name_stripped")).alias("acronym"),
    )


def _oracle_legal_suffix_strip() -> str:
    from ..functions.normalize import LEGAL_SUFFIX_PATTERN, MAX_SUFFIX_PASSES

    strip_expr = "name_norm"
    for _ in range(MAX_SUFFIX_PASSES):
        strip_expr = (
            f"trim(regexp_replace({strip_expr}, '{LEGAL_SUFFIX_PATTERN}', ''))"
        )
    strip_expr = rf"trim(regexp_replace({strip_expr}, '[\s,.\-]+$', ''))"
    return rf"""
WITH raw AS (
  SELECT c_custkey,
         c_name || CASE c_custkey % 6
           WHEN 0 THEN ' GmbH & Co. KG'
           WHEN 1 THEN ' Holdings Ltd.'
           WHEN 2 THEN ' S.p.A.'
           WHEN 3 THEN ' sp z o o'
           WHEN 4 THEN ' Pty Ltd'
           ELSE '' END AS raw_name
  FROM customer
), n AS (
  SELECT c_custkey,
         lower(trim(regexp_replace(
           regexp_replace(raw_name, '[^a-zA-Z0-9\s]', ' ', 'g'),
           '\s+', ' ', 'g'))) AS name_norm
  FROM raw
), s AS (
  SELECT c_custkey, name_norm,
         CASE WHEN {strip_expr} = '' THEN name_norm
              ELSE {strip_expr} END AS name_stripped
  FROM n
)
SELECT c_custkey, name_norm, name_stripped,
       substring(replace(name_stripped, ' ', ''), 1, 8) AS prefix8,
       upper(array_to_string(list_transform(
         list_filter(string_split_regex(name_stripped, '\s+'), t -> t <> ''),
         t -> substring(t, 1, 1)), '')) AS acronym
FROM s
"""


def q_prose_legal_name(spark, sf_dir):
    """Legal-name extraction from prose descriptions (P20) — first-match-
    wins over the reference's three patterns; NULL for prose without one."""
    from ..functions.normalize import extract_legal_name_col

    sup = _t(spark, sf_dir, "supplier")
    base = F.element_at(
        F.array(*[F.lit(x) for x in
                  ("Acme", "Zenith", "Nordwind", "Bluepeak", "Quartz")]),
        (F.pmod(F.col("s_suppkey"), F.lit(5)) + 1).cast("int"))
    m = F.pmod(F.col("s_suppkey"), F.lit(4))
    desc = (
        F.when(m == 0, F.concat(F.lit("The legal entity is "), base,
                                F.lit(" Ltd., a limited liability company")))
        .when(m == 1, F.concat(F.upper(base),
                               F.lit(" TECHNOLOGIES GMBH, registered in Berlin")))
        .when(m == 2, F.concat(F.lit("our company is "), base,
                               F.lit(" SAS and we sell parts")))
        .otherwise(F.concat(F.lit("a generic description of "), base))
    )
    inner = sup.select("s_suppkey", desc.alias("description"))
    return inner.select(
        "s_suppkey", "description",
        extract_legal_name_col(F.col("description")).alias("legal_name"),
    )


def _oracle_prose_legal_name() -> str:
    from ..functions.normalize import PROSE_LEGAL_NAME_PATTERNS

    extracts = ", ".join(
        f"nullif(trim(regexp_extract(description, '(?i){p}', 1)), '') AS e{i}"
        for i, p in enumerate(PROSE_LEGAL_NAME_PATTERNS)
    )
    return f"""
WITH names AS (
  SELECT s_suppkey,
         (['Acme','Zenith','Nordwind','Bluepeak','Quartz'])[(s_suppkey % 5) + 1]
           AS base
  FROM supplier
), d AS (
  SELECT s_suppkey,
         CASE s_suppkey % 4
           WHEN 0 THEN 'The legal entity is ' || base
                       || ' Ltd., a limited liability company'
           WHEN 1 THEN upper(base) || ' TECHNOLOGIES GMBH, registered in Berlin'
           WHEN 2 THEN 'our company is ' || base || ' SAS and we sell parts'
           ELSE 'a generic description of ' || base END AS description
  FROM names
), x AS (
  SELECT s_suppkey, description, {extracts} FROM d
)
SELECT s_suppkey, description, coalesce(e0, e1, e2) AS legal_name FROM x
"""


# =============================================================================
# Flagship ER pipeline, oracle-checked against the planted partition
# =============================================================================


def q_er_pipeline_clusters(spark, sf_dir):
    """Full pipeline (extract → block → pair → score → cluster) over pages
    derived from sf_dir documents, with cluster labels canonicalized to the
    minimum member url. The pages corpus plants ``true_cluster = doc_id``
    (sources/pages.py) and perturbations keep ≥80% token overlap, so a
    correct pipeline recovers EXACTLY the planted partition — which the
    DuckDB oracle reconstructs from the documents table (urls are a pure
    function of doc_id × variant). Any split, merge, or misassignment
    breaks the hash match: this is a driver-checkable end-to-end gate, not
    a rows-only smoke test.

    ``two_phase_scoring=True`` (the production scorer, same as bench.py's
    flagship config): only clusters are returned, and the two-phase scorer
    is threshold-decision-identical to the full scorer by contract
    (operators/scoring.py), so the oracle hash is unchanged while the
    Jaro-Winkler pUDF runs only on the borderline band — 49s → 17s at
    sf0.01, keeping this row well inside any per-query driver budget."""
    from .pipeline import PipelineConfig, run_pipeline
    from ..sources.pages import pages_from_documents
    from ..sources.tableio import TableIO
    from ..streaming.incremental import _tmp_sink_dir

    pages = pages_from_documents(spark, sf_dir, variants=4)
    io = TableIO(spark, _tmp_sink_dir("er_q_"))  # atexit-cleaned stage dir
    cfg = PipelineConfig(n_bands=8, top_n=100, two_phase_scoring=True)
    clusters = run_pipeline(spark, pages.drop("true_cluster"), io, cfg,
                            resume=False)
    w = Window.partitionBy("cluster_id")
    return clusters.select("url", F.min("url").over(w).alias("cluster_id"))


ORACLE_ER_PIPELINE_CLUSTERS = """
WITH p AS (
  SELECT doc_id,
         'https://'
         || CASE WHEN doc_id % 8 = 3 THEN 'hot-portal.example.com'
                 ELSE 'doc-' || CAST(doc_id % 250 AS VARCHAR) || '.example.com'
            END
         || '/d' || CAST(doc_id AS VARCHAR) || '/v' || CAST(v AS VARCHAR)
         AS url
  FROM documents, unnest([0, 1, 2, 3]) AS t(v)
)
SELECT url, MIN(url) OVER (PARTITION BY doc_id) AS cluster_id FROM p
"""


# =============================================================================
# Geo / dates / alias / weak supervision / Wilson / decisioning widening
# =============================================================================


def q_geo_parse(spark, sf_dir):
    """Location parsing + country ISO standardization (P14/P15) over
    deterministic location strings derived from customer⋈nation."""
    from ..functions.geo import parse_location_col

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    loc = F.concat(
        F.lit("City"), F.pmod(F.col("c_custkey"), F.lit(50)).cast("string"),
        F.lit(", Region"), F.col("c_nationkey").cast("string"),
        F.lit(", "), F.col("n_name"),
    )
    parsed = parse_location_col(loc)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            parsed.getField("city").alias("city"),
            parsed.getField("region").alias("region"),
            parsed.getField("country_iso").alias("country_iso"),
        )
    )


def _oracle_geo_parse() -> str:
    from ..functions.geo import COUNTRY_TO_ISO

    case = "CASE lower(trim(n.n_name)) " + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in COUNTRY_TO_ISO.items()
    ) + " ELSE NULL END"
    return f"""
SELECT c.c_custkey AS custkey,
       'City' || CAST(c.c_custkey % 50 AS VARCHAR) AS city,
       'Region' || CAST(c.c_nationkey AS VARCHAR) AS region,
       coalesce({case},
                CASE WHEN regexp_matches(lower(trim(n.n_name)), '^[a-z]{{2}}$')
                     THEN upper(trim(n.n_name)) END) AS country_iso
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def q_geo_pair_features(spark, sf_dir):
    """Pair-level geo features (F7): country_match (upper-equality on the
    ISO code) + city_similarity (token-overlap Jaccard) over deterministic
    location strings planted on adjacent customers. Locations are NULL for
    custkey%7==0 (missing-side → 0.0), cities grow a second token
    (' North') for custkey%3==0 so the Jaccard hits 1, 1/2, 1/3, and 0.
    Reference semantics: /root/reference/src/features.py:232-260."""
    from ..functions.geo import (
        city_similarity_col, country_match_col, parse_location_col,
    )

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    k = F.col("c_custkey")
    loc = F.when(
        F.pmod(k, F.lit(7)) != 0,
        F.concat(
            F.lit("City"), F.pmod(k, F.lit(50)).cast("string"),
            F.when(F.pmod(k, F.lit(3)) == 0, F.lit(" North")).otherwise(F.lit("")),
            F.lit(", Region"), F.col("c_nationkey").cast("string"),
            F.lit(", "), F.col("n_name"),
        ),
    )
    side = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(k.alias("custkey"), parse_location_col(loc).alias("g"))
    )
    a = side.where(F.pmod("custkey", F.lit(2)) == 0).select(
        F.col("custkey").alias("custkey_a"), F.col("g").alias("ga"))
    b = side.select(F.col("custkey").alias("custkey_b"), F.col("g").alias("gb"))
    pairs = a.join(b, F.col("custkey_b") == F.col("custkey_a") + 1)
    return pairs.select(
        "custkey_a", "custkey_b",
        F.col("ga.city").alias("city_a"),
        F.col("gb.city").alias("city_b"),
        F.col("ga.country_iso").alias("country_a"),
        F.col("gb.country_iso").alias("country_b"),
        country_match_col(F.col("ga.country_iso"), F.col("gb.country_iso"))
        .alias("country_match"),
        city_similarity_col(F.col("ga.city"), F.col("gb.city"))
        .alias("city_similarity"),
    )


def _oracle_geo_pair_features() -> str:
    from ..functions.geo import COUNTRY_TO_ISO

    iso = lambda n: ("CASE lower(trim(" + n + ".n_name)) " + " ".join(  # noqa: E731
        f"WHEN '{k}' THEN '{v}'" for k, v in COUNTRY_TO_ISO.items()
    ) + " ELSE NULL END")
    return f"""
WITH s AS (
  SELECT c.c_custkey AS k,
         (c.c_custkey % 7 <> 0) AS has_loc,
         'City' || CAST(c.c_custkey % 50 AS VARCHAR)
           || CASE WHEN c.c_custkey % 3 = 0 THEN ' North' ELSE '' END AS city,
         (c.c_custkey % 50) AS base,
         (c.c_custkey % 3 = 0) AS north,
         {iso('n')} AS iso
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT a.k AS custkey_a, b.k AS custkey_b,
       CASE WHEN a.has_loc THEN a.city END AS city_a,
       CASE WHEN b.has_loc THEN b.city END AS city_b,
       CASE WHEN a.has_loc THEN a.iso END AS country_a,
       CASE WHEN b.has_loc THEN b.iso END AS country_b,
       CAST(CASE WHEN a.has_loc AND b.has_loc AND a.iso IS NOT NULL
                      AND b.iso IS NOT NULL AND a.iso = b.iso
                 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS country_match,
       CASE WHEN NOT a.has_loc OR NOT b.has_loc THEN 0.0
            WHEN a.city = b.city THEN 1.0
            ELSE CAST(CAST(a.base = b.base AS INT)
                      + CAST(a.north AND b.north AS INT) AS DOUBLE)
                 / CAST(CASE WHEN a.base = b.base THEN 1 ELSE 2 END
                        + CAST(a.north OR b.north AS INT) AS DOUBLE)
       END AS city_similarity
FROM s a JOIN s b ON b.k = a.k + 1 WHERE a.k % 2 = 0
"""


def q_flexible_dates(spark, sf_dir):
    """Flexible date parsing round-trip (P16): orders dates re-serialized as
    ISO / 'Qn yyyy' / bare year / Excel-serial strings, then re-parsed."""
    from ..functions.dates import parse_flexible_date_col

    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    m = F.pmod(F.col("o_orderkey"), F.lit(4))
    raw = (
        F.when(m == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(m == 1, F.concat(F.lit("Q"), F.quarter(d).cast("string"),
                               F.lit(" "), F.year(d).cast("string")))
        .when(m == 2, F.year(d).cast("string"))
        .otherwise(F.datediff(d.cast("date"), F.to_date(F.lit("1899-12-30")))
                   .cast("string"))
    )
    parsed = parse_flexible_date_col(raw)
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        raw.alias("raw_date"),
        F.date_format(parsed, "yyyy-MM-dd").alias("parsed_date"),
        F.year(parsed).alias("parsed_year"),
    )


ORACLE_FLEXIBLE_DATES = r"""
WITH raw AS (
  SELECT o_orderkey AS orderkey,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
           WHEN 1 THEN 'Q' || CAST(quarter(o_orderdate) AS VARCHAR)
                    || ' ' || CAST(year(o_orderdate) AS VARCHAR)
           WHEN 2 THEN CAST(year(o_orderdate) AS VARCHAR)
           ELSE CAST(date_diff('day', DATE '1899-12-30',
                               CAST(o_orderdate AS DATE)) AS VARCHAR)
         END AS raw_date
  FROM orders
), parsed AS (
  SELECT orderkey, raw_date,
    coalesce(
      CASE WHEN regexp_matches(raw_date, '^(19|20)\d{2}$')
           THEN CAST(raw_date || '-01-01' AS DATE) END,
      CASE WHEN regexp_matches(raw_date, '^[Qq][1-4]\s+(19|20)\d{2}$')
           THEN CAST(regexp_extract(raw_date, '((19|20)\d{2})', 1) || '-' ||
                     lpad(CAST((CAST(regexp_extract(raw_date, '^[Qq]([1-4])', 1) AS INT) - 1) * 3 + 1
                          AS VARCHAR), 2, '0') || '-01' AS DATE) END,
      CASE WHEN regexp_matches(raw_date, '^\d{1,6}$')
           THEN DATE '1899-12-30' + CAST(raw_date AS INT) END,
      try_cast(raw_date AS DATE)
    ) AS p
  FROM raw
)
SELECT orderkey, raw_date, strftime(p, '%Y-%m-%d') AS parsed_date,
       CAST(year(p) AS INT) AS parsed_year
FROM parsed
"""


REBRAND_ALIASES = [
    ("UNITED STATES", "USA"), ("UNITED KINGDOM", "UK"),
    ("RUSSIA", "RUSSIAN FEDERATION"), ("VIETNAM", "VIET NAM"),
]


def q_alias_rebrand(spark, sf_dir):
    """Rebrand alias expansion (P19/J7): broadcast-join a literal old↔new
    dim table; canonical = new name when aliased, else original."""
    nation = _t(spark, sf_dir, "nation")
    alias_df = spark.createDataFrame(REBRAND_ALIASES, ["old_name", "new_name"])
    return (
        nation.join(F.broadcast(alias_df),
                    nation.n_name == alias_df.old_name, "left")
        .select(
            F.col("n_nationkey").alias("nationkey"),
            F.coalesce("new_name", "n_name").alias("canonical_name"),
        )
    )


def _oracle_alias_rebrand() -> str:
    vals = ", ".join(f"('{o}', '{n}')" for o, n in REBRAND_ALIASES)
    return f"""
SELECT n.n_nationkey AS nationkey,
       coalesce(a.new_name, n.n_name) AS canonical_name
FROM nation n LEFT JOIN (VALUES {vals}) a(old_name, new_name)
  ON n.n_name = a.old_name
"""


def q_weak_supervision(spark, sf_dir):
    """Snorkel-style label model (M1): rule votes as columns + weighted and
    majority aggregate labels — no per-row Python."""
    from ..operators.labeling import LabelRule, apply_rules

    orders = _t(spark, sf_dir, "orders")
    rules = [
        LabelRule("high_value", F.col("o_totalprice") >= 250000.0, 1, 2.0),
        LabelRule("urgent", F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1, 1.0),
        LabelRule("low_value", F.col("o_totalprice") < 50000.0, -1, 1.0),
        LabelRule("open_status", F.col("o_orderstatus") == "O", -1, 0.5),
    ]
    out = apply_rules(orders.select("o_orderkey", "o_totalprice",
                                    "o_orderpriority", "o_orderstatus"), rules)
    return out.select(
        F.col("o_orderkey").alias("orderkey"),
        "vote_high_value", "vote_urgent", "vote_low_value", "vote_open_status",
        "weighted_score", "majority_label",
    )


ORACLE_WEAK_SUPERVISION = """
WITH v AS (
  SELECT o_orderkey AS orderkey,
         CASE WHEN o_totalprice >= 250000.0 THEN 1 ELSE 0 END AS vote_high_value,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS vote_urgent,
         CASE WHEN o_totalprice < 50000.0 THEN -1 ELSE 0 END AS vote_low_value,
         CASE WHEN o_orderstatus = 'O' THEN -1 ELSE 0 END AS vote_open_status
  FROM orders
)
SELECT orderkey, vote_high_value, vote_urgent, vote_low_value, vote_open_status,
       round(CASE WHEN (CASE WHEN vote_high_value <> 0 THEN 2.0 ELSE 0 END
                      + CASE WHEN vote_urgent <> 0 THEN 1.0 ELSE 0 END
                      + CASE WHEN vote_low_value <> 0 THEN 1.0 ELSE 0 END
                      + CASE WHEN vote_open_status <> 0 THEN 0.5 ELSE 0 END) > 0
             THEN (vote_high_value * 2.0 + vote_urgent * 1.0
                   + vote_low_value * 1.0 + vote_open_status * 0.5)
                  / (CASE WHEN vote_high_value <> 0 THEN 2.0 ELSE 0 END
                     + CASE WHEN vote_urgent <> 0 THEN 1.0 ELSE 0 END
                     + CASE WHEN vote_low_value <> 0 THEN 1.0 ELSE 0 END
                     + CASE WHEN vote_open_status <> 0 THEN 0.5 ELSE 0 END)
             ELSE 0.0 END, 6) AS weighted_score,
       CASE WHEN vote_high_value + vote_urgent + vote_low_value + vote_open_status > 0 THEN 1
            WHEN vote_high_value + vote_urgent + vote_low_value + vote_open_status < 0 THEN 0
            ELSE NULL END AS majority_label
FROM v
"""


def q_wilson_tier_precision(spark, sf_dir):
    """Per-tier precision with Wilson 95% CI (E1/E5) — proxy labels:
    tier from totalprice, 'positive' = finished order."""
    from ..operators.labeling import tier_precision_with_ci

    orders = _t(spark, sf_dir, "orders")
    tiers = orders.select(
        F.when(F.col("o_totalprice") >= 300000, "A")
         .when(F.col("o_totalprice") >= 150000, "B")
         .when(F.col("o_totalprice") >= 50000, "C")
         .otherwise("REJECT").alias("tier"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    return tier_precision_with_ci(tiers)


ORACLE_WILSON_TIERS = """
WITH t AS (
  SELECT CASE WHEN o_totalprice >= 300000 THEN 'A'
              WHEN o_totalprice >= 150000 THEN 'B'
              WHEN o_totalprice >= 50000 THEN 'C'
              ELSE 'REJECT' END AS tier,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab
  FROM orders
), a AS (
  SELECT tier, COUNT(*) AS n, CAST(SUM(lab) AS BIGINT) AS n_pos FROM t GROUP BY tier
), w AS (
  SELECT tier, n, n_pos,
         CAST(n_pos AS DOUBLE) / n AS p,
         1.959963984540054 AS z,
         CAST(n AS DOUBLE) AS nn
  FROM a
)
SELECT tier, n, n_pos,
       round(p, 6) AS precision,
       round(greatest((p + z*z/(2*nn) - z * sqrt(p*(1-p)/nn + z*z/(4*nn*nn)))
             / (1 + z*z/nn), 0.0), 6) AS wilson_lower,
       round(least((p + z*z/(2*nn) + z * sqrt(p*(1-p)/nn + z*z/(4*nn*nn)))
             / (1 + z*z/nn), 1.0), 6) AS wilson_upper
FROM w
"""


def q_top1_with_alternatives(spark, sf_dir):
    """Top-1 + ranked alternatives per group (W2,
    /root/reference/src/decisioning.py:156-196): best order per customer,
    alternatives = ranks 2-4 pipe-joined in rank order."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    ranked = orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 4)
    alt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("rn").between(2, 4),
                       F.struct(F.col("rn"), F.col("o_orderkey").alias("k"))))),
            lambda x: x.getField("k").cast("string"),
        ), "|",
    )
    return ranked.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.when(F.col("rn") == 1, F.col("o_orderkey"))).alias("best_orderkey"),
        alt.alias("alternatives"),
    )


ORACLE_TOP1_ALTERNATIVES = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey AS custkey,
       MAX(CASE WHEN rn = 1 THEN o_orderkey END) AS best_orderkey,
       coalesce(array_to_string(
         list(CAST(o_orderkey AS VARCHAR) ORDER BY rn)
           FILTER (rn BETWEEN 2 AND 4), '|'), '') AS alternatives
FROM ranked
WHERE rn <= 4
GROUP BY o_custkey
"""


def q_url_domains(spark, sf_dir):
    """eTLD+1 + free-email extraction (P10/P12) over deterministic URLs/emails
    derived from doc_id (multi-part suffix cases included)."""
    from ..functions.domains import (
        email_domain_col, etld1_col, hostname_col, is_free_email_col,
    )

    docs = _t(spark, sf_dir, "documents")
    m = F.pmod(F.col("doc_id"), F.lit(3))
    mm = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("https://www.site"), mm, F.lit(".co.uk/p/1?q=2")))
        .when(m == 1, F.concat(F.lit("http://sub.host"), mm, F.lit(".example.org:8080/x")))
        .otherwise(F.concat(F.lit("https://cdn"), mm, F.lit(".io")))
    )
    email = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@"),
        F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit("gmail.com"))
         .otherwise(F.concat(F.lit("corp"), mm, F.lit(".com"))),
    )
    edom = email_domain_col(email)
    return docs.select(
        "doc_id",
        hostname_col(url).alias("hostname"),
        etld1_col(url).alias("etld1"),
        edom.alias("email_domain"),
        is_free_email_col(edom).alias("is_free_email"),
    )


ORACLE_URL_DOMAINS = r"""
WITH u AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'https://www.site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk/p/1?q=2'
           WHEN 1 THEN 'http://sub.host' || CAST(doc_id % 7 AS VARCHAR) || '.example.org:8080/x'
           ELSE 'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.io'
         END AS url,
         'user' || CAST(doc_id AS VARCHAR) || '@' ||
           CASE WHEN doc_id % 2 = 0 THEN 'gmail.com'
                ELSE 'corp' || CAST(doc_id % 7 AS VARCHAR) || '.com' END AS email
  FROM documents
), h AS (
  SELECT doc_id, email,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
           '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '[/?#].*$', ''), ':\d+$', '')
           AS hostname
  FROM u
), e AS (
  SELECT doc_id, email, hostname,
         string_split(hostname, '.') AS parts
  FROM h
)
SELECT doc_id, hostname,
       CASE WHEN len(parts) <= 2 THEN hostname
            WHEN parts[-2] || '.' || parts[-1] IN
                 ('co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp','or.jp',
                  'com.au','net.au','org.au','com.br','com.cn','com.mx','co.in',
                  'co.nz','co.za','com.sg','com.hk','com.tr')
            THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
            ELSE parts[-2] || '.' || parts[-1] END AS etld1,
       lower(regexp_extract(email, '@([^\s@]+)$', 1)) AS email_domain,
       lower(regexp_extract(email, '@([^\s@]+)$', 1)) IN
         ('gmail.com','yahoo.com','hotmail.com','outlook.com','aol.com',
          'icloud.com','mail.com','gmx.com','protonmail.com','yandex.com')
         AS is_free_email
FROM e
"""


def q_family_aggregates(spark, sf_dir):
    """Family-level aggregates (A6 analog,
    /root/reference/src/orbis_graph.py:115-198): per nation ("family"),
    member count, top-3 market segments by frequency (pipe-joined, count
    desc / name asc), representative (min) customer name — all native
    (contrast the reference's per-group Python loop)."""
    cust = _t(spark, sf_dir, "customer")
    seg_counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("cnt"), F.asc("c_mktsegment"))
    top3 = (
        seg_counts.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
        .groupBy("c_nationkey")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", F.col("c_mktsegment").alias("s")))),
                lambda x: x.getField("s"),
            ), "|").alias("top_segments"))
    )
    base = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n_members"),
        F.min("c_name").alias("representative"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )
    return base.join(top3, "c_nationkey").select(
        F.col("c_nationkey").alias("nationkey"),
        "n_members", "representative", "n_segments", "top_segments",
    )


ORACLE_FAMILY_AGGREGATES = """
WITH sc AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY c_nationkey, c_mktsegment
), r AS (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
             ORDER BY cnt DESC, c_mktsegment ASC) AS rk
  FROM sc
), t AS (
  SELECT c_nationkey,
         array_to_string(list(c_mktsegment ORDER BY rk) FILTER (rk <= 3), '|')
           AS top_segments
  FROM r GROUP BY c_nationkey
)
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS n_members,
       MIN(c.c_name) AS representative,
       COUNT(DISTINCT c.c_mktsegment) AS n_segments,
       MAX(t.top_segments) AS top_segments
FROM customer c JOIN t ON c.c_nationkey = t.c_nationkey
GROUP BY c.c_nationkey
"""


def q_stream_windowed_counts(spark, sf_dir):
    """Watermarked event-time window aggregation, run as a real Structured
    Streaming query (S5 depth: withWatermark + groupBy(window) + availableNow
    drain; streaming/analytics.py). The drained result equals the batch
    hourly rollup, which is the oracle."""
    import uuid

    from ..streaming.analytics import stream_windowed_event_stats

    return stream_windowed_event_stats(
        spark, f"{sf_dir}/events.parquet",
        query_name=f"winstats_{uuid.uuid4().hex[:8]}")


ORACLE_STREAM_WINDOWED_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       round(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_stream_sessionize(spark, sf_dir):
    """Stateful streaming sessionization via applyInPandasWithState
    (streaming/analytics.py): per-user (last_ts, session counter) state,
    Arrow-batched. Drained availableNow over the backlog it reproduces the
    batch lag-window sessionizer — same oracle as `events_sessionize`."""
    import uuid

    from ..streaming.analytics import stream_sessionize_stateful

    return stream_sessionize_stateful(
        spark, f"{sf_dir}/events.parquet",
        query_name=f"sess_{uuid.uuid4().hex[:8]}")


def q_stream_curation(spark, sf_dir):
    """Ingest-side curation as a foreachBatch stream
    (streaming/incremental.py:stream_curate_documents): documents land as
    a file-source stream, each micro-batch runs the per-doc curation gate
    and chunks the keepers into overlap windows, committed to batch-keyed
    idempotent sinks. Pure map work per batch (no corpus state), so the
    stream equals the batch plan — which is exactly what the oracle
    expresses (gate CTE ∩ chunk CTE)."""
    from ..streaming.incremental import stream_curate_documents

    return stream_curate_documents(
        spark, f"{sf_dir}/documents.parquet", timeout_s=240)


def _oracle_stream_curation() -> str:
    return f"""
WITH gate AS ({_oracle_curation_gate()}),
chunks AS ({ORACLE_DOCS_CHUNK})
SELECT c.doc_id, d.source, c.chunk_id, c.chunk_text, c.n_words
FROM chunks c
JOIN gate g ON c.doc_id = g.doc_id AND g.keep
JOIN documents d ON c.doc_id = d.doc_id
"""


def q_stream_decontaminate(spark, sf_dir):
    """Benchmark-release-day decontamination as a foreachBatch stream
    (streaming/incremental.py:stream_decontaminate_corpus): the eval
    slice (doc_id % 97 == 0) lands as a stream; each micro-batch
    broadcasts its shingles and probes the static persisted corpus
    shingle table, committing distinct (doc, shingle) hits to idempotent
    sinks; the distinct union across batches makes the result
    batching-invariant and equal to the one-shot contamination_flags —
    so the oracle is the SAME SQL as the batch decontaminate row."""
    from ..streaming.incremental import (
        _tmp_sink_dir, stream_decontaminate_corpus,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    d = _tmp_sink_dir("inc_eval_")  # atexit-cleaned, like the stream sinks
    eval_docs.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_decontaminate_corpus(
        spark, d, docs, k=DECON_K, min_overlap=DECON_MIN_OVERLAP,
        timeout_s=240)


def q_stream_ann(spark, sf_dir):
    """Incremental similarity search as a foreachBatch stream
    (streaming/incremental.py:stream_delta_ann): the corpus is IVF-indexed
    ONCE into static persisted state (driver centroids + cell-assigned
    vectors); newly landed embedding vectors (vec_id < 20) stream in and
    each micro-batch probes its n_probe nearest cells with a cell-key
    join — new vectors get neighbors, the corpus is never re-indexed.
    Batching-invariant (a delta vector's result depends only on corpus
    state + its own row), so the stream equals the one-shot ivf_topk and
    REUSES the full-plan ann_ivf oracle (seeded centroid draw, cosine
    assignment, probe selection, in-cell exact ranking)."""
    from ..streaming.incremental import _tmp_sink_dir, stream_delta_ann

    emb = _t(spark, sf_dir, "embeddings")
    delta = emb.where(F.col("vec_id") < 20)
    d = _tmp_sink_dir("inc_annq_")  # atexit-cleaned, like the stream sinks
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_delta_ann(spark, d, emb, k=5, n_cells=8, n_probe=2,
                            timeout_s=240)


def q_stream_vocab(spark, sf_dir):
    """Incremental corpus statistics as a foreachBatch stream
    (streaming/incremental.py:stream_update_vocab): documents land as a
    stream and cumulative vocabulary counts are maintained by monoid
    merge — each batch pays O(|batch| + |vocab|) (batch wordcount +
    full-outer sum with the predecessor snapshot, written as snapshot
    v=<batch_id>, replay-overwrite-safe). Counts merge associatively, so
    the final snapshot equals the one-shot corpus wordcount — which is
    exactly what the oracle expresses."""
    from ..streaming.incremental import stream_update_vocab

    return stream_update_vocab(spark, f"{sf_dir}/documents.parquet",
                               timeout_s=240)


def q_stream_sketch_hll(spark, sf_dir):
    """Incremental cardinality monitoring as a foreachBatch stream
    (streaming/incremental.py:stream_update_hll): documents land as a
    stream and per-source HLL register state (64 integer registers per
    group, ever) is monoid-merged per micro-batch. The register merge is
    exact, so the final estimates equal the one-shot batch sketch —
    the row shares the batch oracle (ORACLE_SKETCH_HLL)."""
    from ..streaming.incremental import stream_update_hll

    return stream_update_hll(spark, f"{sf_dir}/documents.parquet",
                             timeout_s=240)


def q_stream_pagerank(spark, sf_dir):
    """Incremental link-graph centrality as a foreachBatch stream
    (streaming/incremental.py:stream_update_linkgraph): documents land
    as a stream, each micro-batch's domain edges monoid-merge into the
    weighted edge snapshot, and PageRank re-ranks the final accreted
    graph — edge-count merge is exact and ranks are a deterministic
    function of the edge multiset, so the row shares the batch oracle
    (ORACLE_DOMAIN_PAGERANK)."""
    from ..streaming.incremental import stream_update_linkgraph

    return stream_update_linkgraph(
        spark, f"{sf_dir}/documents.parquet", _pr_edges,
        n_iter=PAGERANK_ITERS, timeout_s=240)


ORACLE_STREAM_VOCAB = r"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS word
      FROM documents)
GROUP BY word
"""


def q_incremental_near_dup(spark, sf_dir):
    """Incremental delta-vs-corpus near-dup as a foreachBatch stream
    (streaming/incremental.py): the corpus (doc_id % 4 != 0) becomes static
    persisted state (shingles + stop-guarded LSH buckets); the delta
    (doc_id % 4 == 0) is written to a directory, read back with readStream,
    and each micro-batch probes the static bucket index and Jaccard-verifies
    its candidates — per-batch cost independent of corpus pair count. The
    oracle replicates the full plan in SQL (md5 band minima, corpus-side
    stop rule, delta×corpus bucket join, exact shingle Jaccard)."""
    from ..streaming.incremental import _tmp_sink_dir, stream_delta_near_dups

    docs = _t_wide(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    delta = docs.where(F.col("doc_id") % 4 == 0)
    d = _tmp_sink_dir("inc_delta_")  # atexit-cleaned, like the stream sinks
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_delta_near_dups(spark, d, corpus, k=3, n_bands=4,
                                  stop_threshold=LSH_STOP)


def _oracle_incremental_near_dup(n_bands: int = 4) -> str:
    bands = ", ".join(f"{_mh_band_sql(b)} AS mh_{b}" for b in range(n_bands))
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{b}:' || mh_{b} AS bucket FROM sigs"
        for b in range(n_bands)
    )
    return f"""
WITH t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3}),
sigs AS (SELECT doc_id, {bands} FROM s),
buckets0 AS ({unions}),
corpus_b AS (SELECT * FROM buckets0 WHERE doc_id % 4 <> 0),
delta_b AS (SELECT * FROM buckets0 WHERE doc_id % 4 = 0),
keep AS (SELECT bucket FROM corpus_b GROUP BY bucket HAVING COUNT(*) <= {LSH_STOP}),
cand AS (SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id
         FROM delta_b d
         JOIN keep k ON d.bucket = k.bucket
         JOIN corpus_b c ON d.bucket = c.bucket)
SELECT p.delta_id, p.corpus_id,
       round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
             THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh)))
             ELSE 0.0 END, 6) AS jaccard
FROM cand p
JOIN s sa ON p.delta_id = sa.doc_id
JOIN s sb ON p.corpus_id = sb.doc_id
"""


# =============================================================================
# Similarity + decisioning driver-visible rows (F1/F2, D1/D3/D5, D2/D4)
# =============================================================================


def q_jaro_winkler(spark, sf_dir):
    """Jaro-Winkler (F1, the Arrow-batched pandas UDF) + Levenshtein ratio
    (F2, native builtin) over deterministic supplier-name variant pairs.

    The DuckDB oracle uses its builtin ``jaro_winkler_similarity`` — same
    standard parameters as the reference (p=0.1, boost threshold 0.7,
    4-char prefix cap; /root/reference/src/features.py:45-119) — verified
    bit-for-bit against ``jaro_winkler_py`` (also pinned by
    tests/test_similarity.py), so this row is an exact cross-engine check
    of the pUDF, not a rounded approximation."""
    from ..functions.similarity import jaro_winkler_udf, levenshtein_ratio_col

    supp = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    base = F.element_at(
        F.array(F.lit("acme corp"), F.lit("zenith gmbh"), F.lit("nordwind llc"),
                F.lit("bluepeak industries"), F.lit("quartz holdings")),
        (k % 5 + 1).cast("int"))
    a = F.concat(base, F.lit(" "), (k % 97).cast("string"))
    m3 = k % 3
    b = (
        F.when(m3 == 0, a)
        .when(m3 == 1, F.concat(base, F.lit(" "), ((k + 1) % 97).cast("string")))
        .otherwise(F.concat(F.reverse(base), F.lit(" x")))
    )
    d = supp.select(k.alias("suppkey"), a.alias("a"), b.alias("b"))
    return d.select(
        "suppkey", "a", "b",
        jaro_winkler_udf(F.col("a"), F.col("b")).alias("jw"),
        F.round(levenshtein_ratio_col(F.col("a"), F.col("b")), 6)
         .alias("lev_ratio"),
    )


ORACLE_JARO_WINKLER = """
WITH v AS (
  SELECT s_suppkey AS suppkey,
         (['acme corp','zenith gmbh','nordwind llc','bluepeak industries',
           'quartz holdings'])[(s_suppkey % 5) + 1] AS base
  FROM supplier
), p AS (
  SELECT suppkey,
         base || ' ' || CAST(suppkey % 97 AS VARCHAR) AS a,
         CASE suppkey % 3
           WHEN 0 THEN base || ' ' || CAST(suppkey % 97 AS VARCHAR)
           WHEN 1 THEN base || ' ' || CAST((suppkey + 1) % 97 AS VARCHAR)
           ELSE reverse(base) || ' x' END AS b
  FROM v
)
SELECT suppkey, a, b,
       jaro_winkler_similarity(a, b) AS jw,
       round(CASE WHEN greatest(len(a), len(b)) > 0
             THEN 1.0 - CAST(levenshtein(a, b) AS DOUBLE)
                        / greatest(len(a), len(b))
             ELSE 1.0 END, 6) AS lev_ratio
FROM p
"""


def q_decisioning_queue(spark, sf_dir):
    """Tier assignment (D1) → many-to-one conflict flags (D3) →
    review-queue selection (D5) — the decisioning operators themselves,
    driver-checked — over deterministic scored pairs derived from orders
    (p_match = (o_orderkey % 100)/100; url_b collides on o_orderkey % 499
    to plant conflicts). Reference: src/decisioning.py:30-91,198-216."""
    from ..operators.rerank import review_queue
    from ..operators.scoring import assign_tiers, flag_conflicts

    orders = _t(spark, sf_dir, "orders")
    scored = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("url_a"),
        F.concat(F.lit("o"), (F.col("o_orderkey") % 499).cast("string"))
         .alias("url_b"),
        ((F.col("o_orderkey") % 100).cast("double") / F.lit(100.0))
         .alias("p_match"),
    )
    matches = assign_tiers(scored).where(F.col("tier") != "REJECT")
    alt = Window.partitionBy("url_a")
    decided = flag_conflicts(matches).withColumn(
        "n_alternatives", F.count("*").over(alt) - 1)
    return review_queue(decided)


ORACLE_DECISIONING_QUEUE = """
WITH scored AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS url_a,
         'o' || CAST(o_orderkey % 499 AS VARCHAR) AS url_b,
         CAST(o_orderkey % 100 AS DOUBLE) / 100.0 AS p_match
  FROM orders
), tiered AS (
  SELECT *, CASE WHEN p_match >= 0.98 THEN 'A'
                 WHEN p_match >= 0.93 THEN 'B'
                 WHEN p_match >= 0.75 THEN 'C'
                 ELSE 'REJECT' END AS tier
  FROM scored
), matches AS (
  SELECT * FROM tiered WHERE tier <> 'REJECT'
), decided AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY url_b) > 1 AS conflict,
         COUNT(*) OVER (PARTITION BY url_a) - 1 AS n_alternatives
  FROM matches
)
SELECT url_a, url_b, p_match, tier, conflict, n_alternatives
FROM decided
WHERE tier = 'C' OR conflict OR n_alternatives > 3
"""


def q_match_type_evidence(spark, sf_dir):
    """Match-type classification (D2) + evidence JSON (D4) over
    deterministic feature rows from supplier. Feature values are exact
    multiples of 1/16 and weights powers of two, so every contribution is
    an exact short-decimal double that Spark's ``to_json`` and DuckDB's
    ``to_json`` print identically — the JSON strings hash-match verbatim.
    Reference: src/decisioning.py:112-131 (match type), evidence payload
    per src/decisioning.py report rows."""
    from ..operators.rerank import classify_match_type, with_evidence_json

    supp = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    m5 = k % 5
    d = supp.select(
        k.alias("suppkey"),
        ((k % 16).cast("double") / F.lit(16.0)).alias("jw_fingerprint"),
        (((k * 7) % 16).cast("double") / F.lit(16.0)).alias("token_jaccard"),
        (k % 2).cast("double").alias("domain_exact"),
        ((F.floor(k / 2) % 2).cast("double")).alias("prefix_match"),
        F.when(m5 == 0, "GUO").when(m5 == 1, "branch")
         .when(m5 == 2, "Sub").when(m5 == 3, "subsidiary").alias("role"),
    )
    weights = {"jw_fingerprint": 0.5, "token_jaccard": 0.25,
               "domain_exact": 0.5, "prefix_match": 0.125}
    out = classify_match_type(with_evidence_json(d, weights))
    return out.select("suppkey", "match_type", "evidence")


ORACLE_MATCH_TYPE_EVIDENCE = """
WITH f AS (
  SELECT s_suppkey AS suppkey,
         CAST(s_suppkey % 16 AS DOUBLE) / 16.0 * 0.5 AS c_jw,
         CAST((s_suppkey * 7) % 16 AS DOUBLE) / 16.0 * 0.25 AS c_tj,
         CAST(s_suppkey % 2 AS DOUBLE) * 0.5 AS c_dom,
         CAST((s_suppkey // 2) % 2 AS DOUBLE) * 0.125 AS c_pref,
         CASE s_suppkey % 5 WHEN 0 THEN 'GUO' WHEN 1 THEN 'branch'
              WHEN 2 THEN 'Sub' WHEN 3 THEN 'subsidiary' END AS role
  FROM supplier
), c AS (
  SELECT suppkey, role, u.f AS feature, round(u.c, 6) AS contribution
  FROM f, UNNEST([
    struct_pack(f := 'jw_fingerprint', c := c_jw),
    struct_pack(f := 'token_jaccard', c := c_tj),
    struct_pack(f := 'domain_exact', c := c_dom),
    struct_pack(f := 'prefix_match', c := c_pref)]) AS t(u)
), e AS (
  SELECT suppkey, any_value(role) AS role,
         to_json(list(struct_pack(feature := feature,
                                  contribution := contribution)
                      ORDER BY round(-abs(contribution), 6), feature))
           AS evidence
  FROM c GROUP BY suppkey
)
SELECT suppkey,
       CASE upper(coalesce(role, ''))
            WHEN 'GUO' THEN 'GUO'
            WHEN 'BRANCH' THEN 'BRANCH'
            WHEN 'SUB' THEN 'SUBSIDIARY'
            WHEN 'SUBSIDIARY' THEN 'SUBSIDIARY'
            ELSE 'LEGAL_ENTITY' END AS match_type,
       evidence
FROM e
"""


def q_docs_repetition(spark, sf_dir):
    """Gopher-style repetition/boilerplate signals over the documents
    table as EXACT integer counts (duplicate-word / duplicate-bigram /
    top-word fractions derive from them; integers hash identically across
    engines where float division drifts). Zero-shuffle projection — see
    functions/textstats.py:repetition_counts_col. LLM-pipeline extension
    (no reference analog)."""
    from ..functions.textstats import repetition_counts_col

    docs = _t(spark, sf_dir, "documents")
    # struct once, expand in a second select: CollapseProject keeps the
    # non-cheap fold single-evaluated instead of inlining it 5×.
    d = docs.select("doc_id", repetition_counts_col(F.col("text")).alias("r"))
    return d.select(
        "doc_id",
        F.col("r.total_words").alias("total_words"),
        F.col("r.distinct_words").alias("distinct_words"),
        F.col("r.total_bigrams").alias("total_bigrams"),
        F.col("r.distinct_bigrams").alias("distinct_bigrams"),
        F.col("r.top_word_count").alias("top_word_count"),
    )


# Tokenization mirrors functions/textstats.py:_words — lower, split on
# [^a-z0-9']+, drop empties.
ORACLE_DOCS_REPETITION = r"""
WITH w0 AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                     x -> x <> '') AS words
  FROM documents
), base AS (
  SELECT doc_id, words,
         list_transform(generate_series(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i + 1]) AS bigrams
  FROM w0
), u AS (
  SELECT doc_id, unnest(words) AS w FROM w0
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM u GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS top_word_count FROM wc GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.words) AS BIGINT) AS total_words,
       CAST(len(list_distinct(b.words)) AS BIGINT) AS distinct_words,
       CAST(len(b.bigrams) AS BIGINT) AS total_bigrams,
       CAST(len(list_distinct(b.bigrams)) AS BIGINT) AS distinct_bigrams,
       CAST(coalesce(t.top_word_count, 0) AS BIGINT) AS top_word_count
FROM base b LEFT JOIN top t USING (doc_id)
"""


def q_docs_pii_redact(spark, sf_dir):
    """PII scrub (emails / phones / IPv4) over documents whose text is
    deterministically salted with doc_id-derived contact strings (the raw
    corpus is PII-free word soup, so the salt is what exercises the
    redaction; presence varies by doc_id mod so counts span 0/1). Native
    regexp chain — functions/redact.py. LLM-pipeline extension."""
    from ..functions.redact import pii_counts_col, redact_pii_col

    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    salted = F.concat(
        F.col("text"),
        F.when((k % 3) != 0, F.concat(
            F.lit(" contact user"), k.cast("string"), F.lit("@mail"),
            (k % 5).cast("string"), F.lit(".example.com"),
        )).otherwise(F.lit("")),
        F.when((k % 2) == 0, F.concat(
            F.lit(" call +1-555-"),
            F.lpad((k % 10000).cast("string"), 4, "0"),
        )).otherwise(F.lit("")),
        F.when((k % 5) < 2, F.concat(
            F.lit(" from 10.0."), (k % 256).cast("string"), F.lit("."),
            (k % 100).cast("string"),
        )).otherwise(F.lit("")),
    )
    d = docs.select("doc_id", salted.alias("salted"))
    d = d.select("doc_id", "salted", pii_counts_col(F.col("salted")).alias("c"))
    return d.select(
        "doc_id",
        redact_pii_col(F.col("salted")).alias("redacted"),
        F.col("c.email_count").alias("email_count"),
        F.col("c.phone_count").alias("phone_count"),
        F.col("c.ip_count").alias("ip_count"),
    )


ORACLE_DOCS_PII_REDACT = r"""
WITH s AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 <> 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
                   CAST(doc_id % 5 AS VARCHAR) || '.example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 2 = 0
              THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 5 < 2
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                   CAST(doc_id % 100 AS VARCHAR)
              ELSE '' END AS salted
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(salted,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g'),
         '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted,
       CAST(len(regexp_extract_all(salted,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS email_count,
       CAST(len(regexp_extract_all(salted,
         '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS phone_count,
       CAST(len(regexp_extract_all(salted,
         '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS ip_count
FROM s
"""


def q_url_canonicalize(spark, sf_dir):
    """URL canonical dedup keys (case-fold, fragment / www. / default-port
    / tracking-param / trailing-slash strip) over deterministic messy URLs
    derived from doc_id — every mess variety (uppercase, :443, :80, utm_*,
    fbclid+gclid, fragment-only, bare host) is represented. Native regexp
    chain — functions/domains.py:canonicalize_url_col. First dedup stage
    of a crawl pipeline; LLM-pipeline extension."""
    from ..functions.domains import canonicalize_url_col

    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    m = k % 6
    s = (k % 9).cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("HTTPS://WWW.Site"), s,
                                F.lit(".COM:443/Path/?utm_source=x&q=1#frag")))
        .when(m == 1, F.concat(F.lit("http://site"), s, F.lit(".com:80/a/b/")))
        .when(m == 2, F.concat(F.lit("https://site"), s,
                               F.lit(".com/a?utm_campaign=c&utm_medium=m")))
        .when(m == 3, F.concat(F.lit("https://www.site"), s,
                               F.lit(".com/a?q=1&fbclid=AbC&gclid=9")))
        .when(m == 4, F.concat(F.lit("http://site"), s, F.lit(".com:80")))
        .otherwise(F.concat(F.lit("https://site"), s, F.lit(".com/#top")))
    )
    d = docs.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id", "url",
        canonicalize_url_col(F.col("url")).alias("canonical_url"),
    )


ORACLE_URL_CANONICALIZE = r"""
WITH u AS (
  SELECT doc_id,
         CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'HTTPS://WWW.Site' || CAST(doc_id % 9 AS VARCHAR) ||
                       '.COM:443/Path/?utm_source=x&q=1#frag'
           WHEN 1 THEN 'http://site' || CAST(doc_id % 9 AS VARCHAR) || '.com:80/a/b/'
           WHEN 2 THEN 'https://site' || CAST(doc_id % 9 AS VARCHAR) ||
                       '.com/a?utm_campaign=c&utm_medium=m'
           WHEN 3 THEN 'https://www.site' || CAST(doc_id % 9 AS VARCHAR) ||
                       '.com/a?q=1&fbclid=AbC&gclid=9'
           WHEN 4 THEN 'http://site' || CAST(doc_id % 9 AS VARCHAR) || '.com:80'
           ELSE 'https://site' || CAST(doc_id % 9 AS VARCHAR) || '.com/#top'
         END AS url
  FROM documents
), c1 AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         regexp_replace(lower(url),
           '#.*$', '', 'g'),
           '://www\.', '://', 'g'),
           ':(?:80|443)/', '/', 'g'),
           ':(?:80|443)\?', '?', 'g'),
           ':(?:80|443)$', '', 'g'),
           '(?:utm_[a-z]+|fbclid|gclid|msclkid)=[^&#]*', '', 'g'),
           '\?&+', '?', 'g'),
           '&&+', '&', 'g'),
           '[?&]+$', '', 'g') AS c
  FROM u
)
SELECT doc_id, url,
       CASE WHEN regexp_matches(c, '://$') THEN c
            ELSE regexp_replace(c, '/+$', '', 'g') END AS canonical_url
FROM c1
"""


def q_curation_gate(spark, sf_dir):
    """Per-document keep/drop gate composing the curation signals the way
    a real 100 TB filtering job chains them: language-ID == en, quality
    floor, and Gopher-style repetition caps (duplicate-word fraction
    ≤ 0.55, top-word fraction ≤ 0.10 — thresholds sit at the corpus
    medians so both flags genuinely split the data). Repetition rules are
    INTEGER cross-multiplications of the exact counts, so no float
    division can drift between engines; each flag is emitted alongside
    the conjunction so the oracle hash verifies every rule, not just the
    final keep bit. Library home: operators/curation.py:curation_flags."""
    return curation_flags(_t(spark, sf_dir, "documents"))


def _oracle_curation_gate() -> str:
    return f"""
WITH lang AS ({_oracle_lang_id()}),
qual AS ({ORACLE_DOCS_QUALITY}),
rep AS ({ORACLE_DOCS_REPETITION}),
flags AS (
  SELECT d.doc_id,
         l.lang_pred = 'en' AS lang_ok,
         q.quality >= {GATE_MIN_QUALITY} AS quality_ok,
         ((r.total_words - r.distinct_words) * 100 <= r.total_words * 55
          AND r.top_word_count * 10 <= r.total_words) AS repetition_ok
  FROM documents d
  JOIN lang l USING (doc_id)
  JOIN qual q USING (doc_id)
  JOIN rep r USING (doc_id)
)
SELECT doc_id, lang_ok, quality_ok, repetition_ok,
       (lang_ok AND quality_ok AND repetition_ok) AS keep
FROM flags
"""


def _lang_salt(lang: str) -> str:
    """Deterministic language-marker salt: the language's first 8
    stopwords repeated 3× (24 hits — strictly above the corpus's ≤8
    natural en-stopword hits, so the salted language wins the argmax).
    The raw synthetic text is English-ish word soup whatever the `lang`
    column says; salting de/fr/es docs with their own function words is
    what real multilingual pages look like to a stopword scorer."""
    from ..functions.textstats import LANG_STOPWORDS_EXT

    return " ".join(LANG_STOPWORDS_EXT[lang][:8] * 3)


def q_curation_gate_multilang(spark, sf_dir):
    """Per-LANGUAGE curation gate: language ID over the 10-language
    extended stopword table, thresholds from a broadcast config dim
    (en 0.65 / de 0.68 / fr-es 0.62 quality floors, per-language integer
    repetition caps) — the same numeric signals genuinely gate
    differently by predicted language (a 0.66-quality doc keeps as en,
    drops as de; pytest pins the overlap non-vacuously). Docs whose
    `lang` column says de/fr/es are salted with their language's function
    words (see :func:`_lang_salt`) so all four languages + 'und' actually
    occur; the oracle replays the salt, the extended lang-ID, the
    signal extraction, and the config join rule-for-rule.
    Library: operators/curation.py:curation_flags_multilang."""
    from ..operators.curation import curation_flags_multilang

    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(F.col("lang").isin("de", "fr", "es"),
               F.concat(F.col("text"), F.lit(" "),
                        F.when(F.col("lang") == "de",
                               F.lit(_lang_salt("de")))
                        .when(F.col("lang") == "fr", F.lit(_lang_salt("fr")))
                        .otherwise(F.lit(_lang_salt("es")))))
        .otherwise(F.col("text")).alias("text"),
    )
    return curation_flags_multilang(salted)


def _oracle_curation_gate_multilang() -> str:
    from ..functions.textstats import LANG_STOPWORDS_EXT
    from ..operators.curation import (
        GATE_DUP_WORD_PCT, GATE_MIN_QUALITY, GATE_TOP_WORD_X,
        LANG_GATE_CONFIG,
    )

    cfg_rows = ", ".join(
        f"('{lang}', CAST({mq!r} AS DOUBLE), {dup}, {topx})"
        for lang, mq, dup, topx in LANG_GATE_CONFIG)
    # shadow `documents` with the salted fixture (base view reached as
    # main.documents — DuckDB flags the bare name inside the CTE body as
    # a circular reference): every composed fragment below (lang-ID /
    # quality / repetition, all `FROM documents`) then reads the salted
    # text — the exact frame the Spark wrapper gates
    return f"""
WITH documents AS (
  SELECT doc_id,
         CASE WHEN lang = 'de' THEN text || ' {_lang_salt("de")}'
              WHEN lang = 'fr' THEN text || ' {_lang_salt("fr")}'
              WHEN lang = 'es' THEN text || ' {_lang_salt("es")}'
              ELSE text END AS text
  FROM main.documents
),
lang AS ({_oracle_lang_id(LANG_STOPWORDS_EXT)}),
qual AS ({ORACLE_DOCS_QUALITY}),
rep AS ({ORACLE_DOCS_REPETITION}),
cfg(lang_pred, min_quality, dup_pct, top_x) AS (VALUES {cfg_rows}),
flags AS (
  SELECT d.doc_id, l.lang_pred,
         c.min_quality IS NOT NULL AS lang_ok,
         q.quality >= coalesce(c.min_quality,
                               CAST({GATE_MIN_QUALITY!r} AS DOUBLE))
           AS quality_ok,
         ((r.total_words - r.distinct_words) * 100
            <= r.total_words * coalesce(c.dup_pct, {GATE_DUP_WORD_PCT})
          AND r.top_word_count * coalesce(c.top_x, {GATE_TOP_WORD_X})
            <= r.total_words) AS repetition_ok
  FROM documents d
  JOIN lang l USING (doc_id)
  JOIN qual q USING (doc_id)
  JOIN rep r USING (doc_id)
  LEFT JOIN cfg c ON c.lang_pred = l.lang_pred
)
SELECT doc_id, lang_pred, lang_ok, quality_ok, repetition_ok,
       (lang_ok AND quality_ok AND repetition_ok) AS keep
FROM flags
"""


def q_docs_chunk(spark, sf_dir):
    """Fixed-window document chunking with overlap — the sample-prep step
    between curation and tokenization in a training-data pipeline (pack
    each doc into 32-word windows, stride 24). One posexplode over a
    per-row transform(sequence(...)) — the chunk fan-out never shuffles,
    so at 100 TB it stays a map-side expansion the parquet sink absorbs.
    Short docs produce exactly one (possibly short) chunk; the final
    partial window is kept (n_words < 32 on the tail chunk). Library
    home: operators/curation.py:chunk_documents."""
    return chunk_documents(_t(spark, sf_dir, "documents"))


ORACLE_DOCS_CHUNK = """
WITH w0 AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), n0 AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= 32 THEN 1
              ELSE CAST(floor((len(w) - 32 + 23) / 24.0) AS BIGINT) + 1
         END AS nc
  FROM w0
)
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_id,
       array_to_string(list_slice(w, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text,
       CAST(len(list_slice(w, i * 24 + 1, i * 24 + 32)) AS BIGINT) AS n_words
FROM n0, unnest(generate_series(0, nc - 1)) AS t(i)
"""


def q_corpus_sample(spark, sf_dir):
    """Deterministic stratified corpus sampling (E3's corpus-scale analog):
    md5-bucket each doc_id into 0..99 and keep en docs at 50%, others at
    20%. Hash-based sampling is reproducible across engines, runs, and
    cluster sizes — unlike rand()-based sampling it survives re-execution
    and partial re-reads, which is what a 100 TB curation job needs for
    auditable subsets. Every row is emitted with its bucket and kept flag
    so the oracle verifies the rule itself, not just the surviving set."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sample:"),
                               F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long") % 100
    )
    d = docs.select("doc_id", "lang", bucket.alias("bucket"))
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(20))
    return d.select(
        "doc_id", "lang", "bucket", (F.col("bucket") < rate).alias("kept"),
    )


ORACLE_CORPUS_SAMPLE = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket,
       bucket < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END) AS kept
FROM b
"""

PPM_W, PPM_H = 8, 6


def q_media_ppm_decode(spark, sf_dir):
    """REAL image decode (not a stub): build a valid binary P6 PPM per doc
    JVM-side (header + deterministic RGB raster via hex-fold → unhex),
    then parse it with the actual numpy PPM decoder over mapInPandas and
    emit exact integer channel sums. The oracle recomputes the sums from
    the pixel-generation closed form — so a hash match proves the bytes
    Spark assembled were decoded correctly end-to-end. JPEG/PNG stay
    env-bound stubs; P6 needs no codec library."""
    from ..operators.multimodal import decode_ppm, ppm_payload_col

    docs = _t(spark, sf_dir, "documents")
    imgs = docs.select(
        "doc_id",
        ppm_payload_col(F.col("doc_id"), PPM_W, PPM_H).alias("payload"),
    )
    return decode_ppm(imgs)


DECON_K, DECON_MIN_OVERLAP = 3, 2


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing ≥2 distinct
    word 3-shingles with the deterministic eval slice (doc_id % 97 == 0).
    Broadcast eval shingle set, one pass over the corpus — see
    operators/dedup.py:contamination_flags. At sf0.01 this flags ~9% of
    docs with 177/500 having any hit, so both outputs genuinely split."""
    from ..operators.dedup import contamination_flags

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return contamination_flags(
        docs, eval_docs, k=DECON_K, min_overlap=DECON_MIN_OVERLAP)


# shingle CTE mirrors hashing.shingles_col: lower, split \s+, drop empties,
# per-doc distinct k-shingles; n<k degrades to the whole-doc token string.
ORACLE_DECONTAMINATE = f"""
WITH tsh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {DECON_K}
              THEN list_distinct(list_transform(
                     generate_series(1, len(toks) - {DECON_K - 1}),
                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
              WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
              ELSE [] END AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents)
), ev AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM tsh WHERE doc_id % 97 = 0
), hits AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM tsh) t
  JOIN ev USING (shingle)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) >= {DECON_MIN_OVERLAP} AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def q_training_corpus(spark, sf_dir):
    """THE end-to-end training-data-prep pipeline (capstone of the
    curation family): fuzzy-dedup keepers ∩ not-benchmark-contaminated
    ∩ curation-gate keep → overlap-chunk → per-source corpus budget
    (docs, chunks, words). Composes fuzzy_dedup, contamination_flags,
    curation_flags, and chunk_documents exactly the way a 100 TB job
    chains them: one zero-shuffle corpus scan for the gate, the bucketed
    LSH dedup, a broadcast decontamination join, a map-side chunk
    fan-out, and ONE final aggregation on source. Library home:
    operators/curation.py:training_corpus."""
    docs = _t_wide(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return training_corpus(docs, eval_docs, stop_threshold=LSH_STOP)


def _oracle_training_corpus() -> str:
    return f"""
WITH dedup AS ({_oracle_dedup_canonical(4, 0.7)}),
decon AS ({ORACLE_DECONTAMINATE}),
gate AS ({_oracle_curation_gate()}),
chunks AS ({ORACLE_DOCS_CHUNK}),
kept AS (
  SELECT d.doc_id, d.source
  FROM documents d
  JOIN dedup dd ON d.doc_id = dd.doc_id AND dd.is_keeper
  JOIN decon dc ON d.doc_id = dc.doc_id AND NOT dc.contaminated
  JOIN gate g ON d.doc_id = g.doc_id AND g.keep
)
SELECT k.source,
       COUNT(DISTINCT k.doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(c.n_words) AS BIGINT) AS n_words
FROM kept k JOIN chunks c USING (doc_id)
GROUP BY k.source
"""


def q_training_corpus_full(spark, sf_dir):
    """The FULL modern pipeline capstone: everything `training_corpus`
    chains (fuzzy-dedup keepers ∩ not-contaminated ∩ gate keep →
    overlap-chunk → per-source budget) PLUS the SemDeDup stage —
    embedding-space near-dup keepers intersected via one id-keyed
    semi-join (vec_id aligns with doc_id in the testdata). The oracle
    composes the existing dedup-closure / decontamination / gate / chunk
    CTEs with the semantic-dedup dropped-id CTE."""
    from ..operators.dedup import semantic_dedup

    docs = _t_wide(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    emb = _t(spark, sf_dir, "embeddings")
    sd = semantic_dedup(emb, n_cells=SEMDEDUP_CELLS,
                        threshold=SEMDEDUP_THRESHOLD)
    sem = sd.where("is_keeper").select("vec_id")
    # .where/.select return NEW frames that drop the _erps_persisted
    # attribute — re-attach semantic_dedup's persisted base (embeddings +
    # norms) so training_corpus forwards it and the per-row
    # release_persisted in bench.py / check_queries.py actually frees it
    # (round-4 advisor finding: the cache bled into later timings)
    sem._erps_persisted = list(getattr(sd, "_erps_persisted", None) or [])
    return training_corpus(docs, eval_docs, stop_threshold=LSH_STOP,
                           semantic_keepers=sem)


def _oracle_training_corpus_full() -> str:
    return f"""
WITH dedup AS ({_oracle_dedup_canonical(4, 0.7)}),
decon AS ({ORACLE_DECONTAMINATE}),
gate AS ({_oracle_curation_gate()}),
chunks AS ({ORACLE_DOCS_CHUNK}),
sem AS ({_oracle_semantic_dedup()}),
kept AS (
  SELECT d.doc_id, d.source
  FROM documents d
  JOIN dedup dd ON d.doc_id = dd.doc_id AND dd.is_keeper
  JOIN decon dc ON d.doc_id = dc.doc_id AND NOT dc.contaminated
  JOIN gate g ON d.doc_id = g.doc_id AND g.keep
  JOIN sem s ON d.doc_id = s.vec_id AND s.is_keeper
)
SELECT k.source,
       COUNT(DISTINCT k.doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(c.n_words) AS BIGINT) AS n_words
FROM kept k JOIN chunks c USING (doc_id)
GROUP BY k.source
"""


def q_corpus_length_stats(spark, sf_dir):
    """Per-source EXACT token-length distribution (p50/p90/p99 + mean) —
    the profiling pass that sizes chunk/pack budgets. Exact percentile so
    the DuckDB quantile_cont oracle matches after rounding. Library:
    operators/curation.py:corpus_length_stats."""
    return corpus_length_stats(_t_wide(spark, sf_dir, "documents"))


ORACLE_CORPUS_LENGTH_STATS = r"""
WITH t AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
       round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens,
       round(quantile_cont(n_tokens, 0.99), 4) AS p99_tokens,
       round(AVG(n_tokens), 4) AS mean_tokens
FROM t GROUP BY source
"""

VOCAB_TOP_N = 200


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary build (tokenizer/BPE prep): top-200 words by
    frequency, total deterministic order (count DESC, word ASC), 1-based
    rank. Map-side-combined wordcount + TakeOrdered — no global sort.
    Library: operators/curation.py:build_vocab."""
    return build_vocab(_t_wide(spark, sf_dir, "documents"), VOCAB_TOP_N)


ORACLE_VOCAB_TOPK = rf"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS word
  FROM documents
), c AS (
  SELECT word, COUNT(*) AS n FROM w GROUP BY word
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS INTEGER) AS rank,
       word, n
FROM c ORDER BY n DESC, word ASC LIMIT {VOCAB_TOP_N}
"""


def q_domain_stats(spark, sf_dir):
    """Domain-level curation over the deterministic per-doc URLs (same
    scheme as url_domains): group by eTLD+1, volume + mean-quality floors
    as separate flags — webtext pipelines drop whole domains before any
    per-document gate. Library: operators/curation.py:domain_stats."""
    docs = _t(spark, sf_dir, "documents")
    m = F.pmod(F.col("doc_id"), F.lit(3))
    mm = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("https://www.site"), mm, F.lit(".co.uk/p/1?q=2")))
        .when(m == 1, F.concat(F.lit("http://sub.host"), mm, F.lit(".example.org:8080/x")))
        .otherwise(F.concat(F.lit("https://cdn"), mm, F.lit(".io")))
    )
    return domain_stats(docs.withColumn("url", url))


def _oracle_domain_stats() -> str:
    return f"""
WITH dom AS ({ORACLE_URL_DOMAINS}),
qual AS ({ORACLE_DOCS_QUALITY}),
g AS (
  SELECT d.etld1, COUNT(*) AS n_docs, round(AVG(q.quality), 4) AS avg_quality
  FROM dom d JOIN qual q USING (doc_id)
  GROUP BY d.etld1
)
SELECT etld1, n_docs, avg_quality,
       n_docs >= {DOMAIN_MIN_DOCS} AS volume_ok,
       avg_quality >= {DOMAIN_MIN_QUALITY} AS quality_ok,
       (n_docs >= {DOMAIN_MIN_DOCS}
        AND avg_quality >= {DOMAIN_MIN_QUALITY}) AS keep
FROM g
"""


# Blocklist dim for the url_blocklist row — one domain from each of the
# three synthetic URL families (example.org is the shared eTLD+1 of all
# sub.hostN hosts, so the multi-label collapse is exercised too).
URL_BLOCKED_DOMAINS = ["site2.co.uk", "example.org", "cdn5.io"]


def q_url_blocklist(spark, sf_dir):
    """Stage-zero URL filtering (C4 / FineWeb / RefinedWeb): eTLD+1
    against a broadcast UT1-style domain blocklist + an adult/spam token
    regex over the raw URL, BEFORE any content parse. URLs use the
    deterministic per-doc scheme of url_domains with a badword path
    segment on doc_id % 11 == 0 so both rules fire.
    Library: operators/curation.py:url_blocklist_gate."""
    from ..operators.curation import url_blocklist_gate

    docs = _t(spark, sf_dir, "documents")
    m = F.pmod(F.col("doc_id"), F.lit(3))
    mm = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    path = (F.when(F.pmod(F.col("doc_id"), F.lit(11)) == 0,
                   F.lit("/casino-night"))
            .otherwise(F.lit("/page")))
    url = (
        F.when(m == 0, F.concat(F.lit("https://www.site"), mm,
                                F.lit(".co.uk"), path))
        .when(m == 1, F.concat(F.lit("http://sub.host"), mm,
                               F.lit(".example.org:8080"), path))
        .otherwise(F.concat(F.lit("https://cdn"), mm, F.lit(".io"), path))
    )
    return url_blocklist_gate(docs.withColumn("url", url),
                              URL_BLOCKED_DOMAINS)


def _oracle_url_blocklist() -> str:
    from ..operators.curation import URL_BADWORD_TOKENS

    blocked = ", ".join(f"'{d}'" for d in URL_BLOCKED_DOMAINS)
    pat = "(" + "|".join(URL_BADWORD_TOKENS) + ")"
    return rf"""
WITH u AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'https://www.site' || CAST(doc_id % 7 AS VARCHAR)
                       || '.co.uk' || p
           WHEN 1 THEN 'http://sub.host' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example.org:8080' || p
           ELSE 'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.io' || p
         END AS url
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN '/casino-night'
                    ELSE '/page' END AS p
        FROM documents)
), h AS (
  SELECT doc_id, url,
         string_split(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             lower(url),
             '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''),
             '[/?#].*$', ''), ':\d+$', ''),
           '.') AS parts
  FROM u
), e AS (
  SELECT doc_id, url,
         CASE WHEN len(parts) <= 2 THEN array_to_string(parts, '.')
              WHEN parts[-2] || '.' || parts[-1] IN
                   ('co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp',
                    'or.jp','com.au','net.au','org.au','com.br','com.cn',
                    'com.mx','co.in','co.nz','co.za','com.sg','com.hk',
                    'com.tr')
              THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
              ELSE parts[-2] || '.' || parts[-1] END AS etld1
  FROM h
)
SELECT doc_id, etld1,
       etld1 IN ({blocked}) AS domain_blocked,
       regexp_matches(lower(url), '{pat}') AS url_token_hit,
       (NOT etld1 IN ({blocked})
        AND NOT regexp_matches(lower(url), '{pat}')) AS keep
FROM e
"""


ORACLE_URL_BLOCKLIST = _oracle_url_blocklist()


PAGERANK_ITERS = 3


def q_domain_pagerank(spark, sf_dir):
    """Link-graph centrality (the Common-Crawl-style domain quality
    prior): PageRank over the deterministic domain link graph — each doc
    contributes one edge domain(doc_id) → domain(5·doc_id + 3) under the
    url_domains eTLD+1 scheme. Fixed-point micro-rank arithmetic makes
    the ITERATIVE approximation bit-exact in SQL, so the oracle replays
    all three power iterations. Library: operators/graph.py:pagerank."""
    from ..operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    return pagerank(_pr_edges(docs), n_iter=PAGERANK_ITERS)


def _pr_dom(x):
    m = F.pmod(x, F.lit(3))
    mm = F.pmod(x, F.lit(7)).cast("string")
    return (F.when(m == 0, F.concat(F.lit("site"), mm, F.lit(".co.uk")))
            .when(m == 1, F.lit("example.org"))
            .otherwise(F.concat(F.lit("cdn"), mm, F.lit(".io"))))


def _pr_edges(docs):
    return docs.select(
        _pr_dom(F.col("doc_id")).alias("src"),
        _pr_dom(F.col("doc_id") * 5 + 3).alias("dst"))


def _oracle_domain_pagerank() -> str:
    from ..operators.graph import PR_DAMPING, PR_SCALE

    dom = ("CASE CAST({x} % 3 AS INT)"
           " WHEN 0 THEN 'site' || CAST({x} % 7 AS VARCHAR) || '.co.uk'"
           " WHEN 1 THEN 'example.org'"
           " ELSE 'cdn' || CAST({x} % 7 AS VARCHAR) || '.io' END")
    d = PR_DAMPING
    iters = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS node, SUM((r.rank * e.w) // e.out_w) AS inflow
  FROM e JOIN {prev} r ON r.node = e.src GROUP BY e.dst
), dg{i} AS (
  SELECT COALESCE(SUM(rank), 0) AS dang FROM {prev}
  WHERE node NOT IN (SELECT src FROM e)
), r{i} AS (
  SELECT n.node,
         (({100 - d}) * (SELECT rz FROM params)
          + {d} * (COALESCE(c.inflow, 0)
                   + (SELECT dang FROM dg{i}) // (SELECT n FROM params)))
           // 100 AS rank
  FROM nodes n LEFT JOIN c{i} c USING (node)
)""")
        prev = f"r{i}"
    return f"""
WITH e0 AS (
  SELECT {dom.format(x='doc_id')} AS src,
         {dom.format(x='(5 * doc_id + 3)')} AS dst
  FROM documents
), ew AS (
  SELECT src, dst, COUNT(*) AS w FROM e0 GROUP BY src, dst
), e AS (
  SELECT ew.src, ew.dst, ew.w, o.out_w
  FROM ew JOIN (SELECT src, SUM(w) AS out_w FROM ew GROUP BY src) o
    USING (src)
), nodes AS (
  SELECT DISTINCT node FROM
    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
), params AS (
  SELECT COUNT(*) AS n, {PR_SCALE} // COUNT(*) AS rz FROM nodes
), r0 AS (
  SELECT node, (SELECT rz FROM params) AS rank FROM nodes
),{','.join(iters)}
SELECT node, rank AS rank_micro,
       round(CAST(rank AS DOUBLE) / {float(PR_SCALE)!r}, 9) AS rank
FROM {prev}
"""


ORACLE_DOMAIN_PAGERANK = _oracle_domain_pagerank()


HARMONIC_ITERS = 3


def q_domain_harmonic(spark, sf_dir):
    """HyperBall harmonic centrality (Boldi & Vigna 2013 — the algorithm
    behind Common Crawl's published domain ranks) over the same
    deterministic domain link graph as domain_pagerank, on REVERSED
    edges so the score is the classic Σ 1/d(u→v). Per-node HLL ball
    sketches propagate along edges; every ball-size estimate and the
    final score replay bit-for-bit in SQL (register max-merges are
    integer, shell sums are one fixed-order expression).
    Library: operators/graph.py:hyperball_harmonic."""
    from ..operators.graph import hyperball_harmonic

    docs = _t(spark, sf_dir, "documents")
    rev = _pr_edges(docs).select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"))
    return hyperball_harmonic(rev, n_iter=HARMONIC_ITERS)


def _oracle_domain_harmonic() -> str:
    from ..operators.graph import PR_DAMPING  # noqa: F401  (same module)
    from ..operators.sketches import (HLL_M, _HLL_NUM, _HLL_RHO_MAX,
                                      _HLL_SMALL)

    dom = ("CASE CAST({x} % 3 AS INT)"
           " WHEN 0 THEN 'site' || CAST({x} % 7 AS VARCHAR) || '.co.uk'"
           " WHEN 1 THEN 'example.org'"
           " ELSE 'cdn' || CAST({x} % 7 AS VARCHAR) || '.io' END")

    def est(reg, out):
        return f"""
{out} AS (
  SELECT grp AS node,
         round(CASE WHEN e_raw <= {_HLL_SMALL!r} AND v > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                    ELSE e_raw END, 4) AS n_est
  FROM (SELECT grp, {HLL_M} - nz AS v,
               {_HLL_NUM!r} / CAST(s + ({HLL_M} - nz)
                                   * (1::BIGINT << {_HLL_RHO_MAX}) AS DOUBLE)
                 AS e_raw
        FROM (SELECT grp, count(*) AS nz,
                     SUM(1::BIGINT << ({_HLL_RHO_MAX} - m_j)) AS s
              FROM {reg} GROUP BY grp))
)"""

    parts = []
    for t in range(1, HARMONIC_ITERS + 1):
        parts.append(f"""
reg{t} AS (
  SELECT grp, j, max(m_j) AS m_j FROM (
    SELECT e.src AS grp, r.j, r.m_j
    FROM e JOIN reg{t - 1} r ON r.grp = e.dst
    UNION ALL
    SELECT grp, j, m_j FROM reg{t - 1}
  ) GROUP BY grp, j
),{est(f'reg{t}', f'n{t}')}""")
    import math as _math
    lcm = _math.lcm(*range(1, HARMONIC_ITERS + 1))
    shell = " + ".join(
        f"{lcm // t}::BIGINT * (CAST(round(n{t}.n_est * 10000) AS BIGINT)"
        f" - CAST(round(n{t - 1}.n_est * 10000) AS BIGINT))"
        for t in range(1, HARMONIC_ITERS + 1))
    ball_cols = ", ".join(
        f"n{t}.n_est AS n_ball_{t}" for t in range(HARMONIC_ITERS + 1))
    joins = " ".join(
        f"JOIN n{t} ON n{t}.node = n0.node"
        for t in range(1, HARMONIC_ITERS + 1))
    return f"""
WITH e AS (
  SELECT DISTINCT {dom.format(x='(5 * doc_id + 3)')} AS src,
                  {dom.format(x='doc_id')} AS dst
  FROM documents
), nodes AS (
  SELECT DISTINCT node FROM
    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
), reg0 AS (
  SELECT grp, h % {HLL_M} AS j,
         max(CASE WHEN (h >> 6) = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(h >> 6)) END) AS m_j
  FROM (SELECT node AS grp,
               CAST(('0x' || substring(md5(node), 1, 15)) AS BIGINT) AS h
        FROM nodes)
  GROUP BY grp, j
),{est('reg0', 'n0')},{','.join(parts)}
SELECT n0.node, {ball_cols}, ({shell}) AS harmonic_micro,
       ({shell}) / {float(lcm * 10000)!r} AS harmonic
FROM n0 {joins}
"""


ORACLE_DOMAIN_HARMONIC = _oracle_domain_harmonic()


def q_domain_triangles(spark, sf_dir):
    """Per-domain triangle counts + local clustering coefficient (the
    link-farm signal: organic neighborhoods close triangles, spray-link
    spam doesn't) over a TWO-generator domain link graph — edges
    domain(id)→domain(5·id+3) and domain(id)→domain(3·id+1) — so both
    triangle-rich and triangle-free nodes appear. Exact integer counts;
    clustering is one unrounded IEEE division.
    Library: operators/graph.py:triangle_stats."""
    from ..operators.graph import triangle_stats

    docs = _t(spark, sf_dir, "documents")
    e1 = _pr_edges(docs)
    e2 = docs.select(
        _pr_dom(F.col("doc_id")).alias("src"),
        _pr_dom(F.col("doc_id") * 3 + 1).alias("dst"))
    return triangle_stats(e1.unionByName(e2))


def _oracle_domain_triangles() -> str:
    dom = ("CASE CAST({x} % 3 AS INT)"
           " WHEN 0 THEN 'site' || CAST({x} % 7 AS VARCHAR) || '.co.uk'"
           " WHEN 1 THEN 'example.org'"
           " ELSE 'cdn' || CAST({x} % 7 AS VARCHAR) || '.io' END")
    return f"""
WITH e0 AS (
  SELECT {dom.format(x='doc_id')} AS src,
         {dom.format(x='(5 * doc_id + 3)')} AS dst
  FROM documents
  UNION ALL
  SELECT {dom.format(x='doc_id')} AS src,
         {dom.format(x='(3 * doc_id + 1)')} AS dst
  FROM documents
), und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e0 WHERE src <> dst
), adj AS (
  SELECT u AS node, v AS nb FROM und
  UNION ALL
  SELECT v AS node, u AS nb FROM und
), deg AS (
  SELECT node, COUNT(*) AS n_neighbors FROM adj GROUP BY node
), tri AS (
  SELECT a.node, COUNT(*) AS n_triangles
  FROM adj a JOIN adj b ON a.node = b.node AND a.nb < b.nb
  WHERE EXISTS (SELECT 1 FROM und
                WHERE und.u = a.nb AND und.v = b.nb)
  GROUP BY a.node
)
SELECT d.node, d.n_neighbors,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       CAST(d.n_neighbors * (d.n_neighbors - 1) / 2 AS BIGINT) AS n_wedges,
       CASE WHEN d.n_neighbors >= 2
            THEN COALESCE(t.n_triangles, 0)
                 / CAST(d.n_neighbors * (d.n_neighbors - 1) / 2 AS DOUBLE)
            ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN tri t USING (node)
"""


ORACLE_DOMAIN_TRIANGLES = _oracle_domain_triangles()


# Trusted seed whitelist for the trustrank row: the site*.co.uk family.
TRUSTRANK_SEEDS = [f"site{i}.co.uk" for i in range(7)]


def q_domain_trustrank(spark, sf_dir):
    """TrustRank (Gyöngyi et al., VLDB 2004) over the same domain link
    graph as domain_pagerank: teleport and dangling mass restricted to a
    trusted seed whitelist (the site*.co.uk family), so trust flows only
    along links out of seeds — the classic web-spam demotion prior.
    Same exact fixed-point micro-rank arithmetic; the oracle replays all
    three iterations with the seed CASE.
    Library: operators/graph.py:trustrank."""
    from ..operators.graph import trustrank

    docs = _t(spark, sf_dir, "documents")
    return trustrank(_pr_edges(docs), TRUSTRANK_SEEDS,
                     n_iter=PAGERANK_ITERS)


def _oracle_domain_trustrank() -> str:
    from ..operators.graph import PR_DAMPING, PR_SCALE

    dom = ("CASE CAST({x} % 3 AS INT)"
           " WHEN 0 THEN 'site' || CAST({x} % 7 AS VARCHAR) || '.co.uk'"
           " WHEN 1 THEN 'example.org'"
           " ELSE 'cdn' || CAST({x} % 7 AS VARCHAR) || '.io' END")
    d = PR_DAMPING
    n_seeds = len(TRUSTRANK_SEEDS)
    seeds = ", ".join(f"'{s}'" for s in TRUSTRANK_SEEDS)
    iters = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS node, SUM((r.rank * e.w) // e.out_w) AS inflow
  FROM e JOIN {prev} r ON r.node = e.src GROUP BY e.dst
), dg{i} AS (
  SELECT COALESCE(SUM(rank), 0) AS dang FROM {prev}
  WHERE node NOT IN (SELECT src FROM e)
), r{i} AS (
  SELECT n.node,
         (CASE WHEN n.node IN ({seeds})
               THEN {100 - d} * (SELECT rz FROM params)
                    + {d} * ((SELECT dang FROM dg{i}) // {n_seeds})
               ELSE 0 END
          + {d} * COALESCE(c.inflow, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN c{i} c USING (node)
)""")
        prev = f"r{i}"
    return f"""
WITH e0 AS (
  SELECT {dom.format(x='doc_id')} AS src,
         {dom.format(x='(5 * doc_id + 3)')} AS dst
  FROM documents
), ew AS (
  SELECT src, dst, COUNT(*) AS w FROM e0 GROUP BY src, dst
), e AS (
  SELECT ew.src, ew.dst, ew.w, o.out_w
  FROM ew JOIN (SELECT src, SUM(w) AS out_w FROM ew GROUP BY src) o
    USING (src)
), nodes AS (
  SELECT DISTINCT node FROM
    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
), params AS (
  SELECT {PR_SCALE} // {n_seeds} AS rz
), r0 AS (
  SELECT node, CASE WHEN node IN ({seeds})
                    THEN (SELECT rz FROM params) ELSE 0 END AS rank
  FROM nodes
),{','.join(iters)}
SELECT node, rank AS trust_micro,
       round(CAST(rank AS DOUBLE) / {float(PR_SCALE)!r}, 9) AS trust
FROM {prev}
"""


ORACLE_DOMAIN_TRUSTRANK = _oracle_domain_trustrank()


def q_domain_prior(spark, sf_dir):
    """Capstone of the graph layer: the FineWeb-style per-domain quality
    PRIOR — volume + mean content quality (domain_stats) joined with
    PageRank mass, TrustRank trust, and clustering coefficient over the
    same 15-domain universe; keep ⇔ volume_ok ∧ quality_ok ∧ trusted.
    This is the claim in operators/graph.py's header made executable:
    link centrality feeds the SAME gate machinery as the content
    signals. Four 15-row frames, three id-keyed joins — the composition
    is free; all cost lives in the audited component plans. Full-plan
    oracle composes the four component oracles as nested CTEs."""
    stats = q_domain_stats(spark, sf_dir)
    pr = q_domain_pagerank(spark, sf_dir)
    tr = q_domain_trustrank(spark, sf_dir)
    tg = q_domain_triangles(spark, sf_dir)
    out = (
        stats
        .join(pr.select(F.col("node").alias("etld1"), "rank_micro"), "etld1")
        .join(tr.select(F.col("node").alias("etld1"), "trust_micro"), "etld1")
        .join(tg.select(F.col("node").alias("etld1"),
                        "n_triangles", "clustering"), "etld1")
        .select(
            "etld1", "n_docs", "avg_quality", "rank_micro", "trust_micro",
            "n_triangles", "clustering",
            (F.col("volume_ok") & F.col("quality_ok")
             & (F.col("trust_micro") > 0)).alias("keep"),
        )
    )
    out._erps_persisted = [
        *getattr(pr, "_erps_persisted", []),
        *getattr(tr, "_erps_persisted", []),
        *getattr(tg, "_erps_persisted", []),
    ]
    return out


def _oracle_domain_prior() -> str:
    return f"""
WITH ds AS ({_oracle_domain_stats()}),
pr AS ({ORACLE_DOMAIN_PAGERANK}),
tr AS ({ORACLE_DOMAIN_TRUSTRANK}),
tg AS ({ORACLE_DOMAIN_TRIANGLES})
SELECT ds.etld1, ds.n_docs, ds.avg_quality, pr.rank_micro,
       tr.trust_micro, tg.n_triangles, tg.clustering,
       (ds.volume_ok AND ds.quality_ok AND tr.trust_micro > 0) AS keep
FROM ds
JOIN pr ON pr.node = ds.etld1
JOIN tr ON tr.node = ds.etld1
JOIN tg ON tg.node = ds.etld1
"""


ORACLE_DOMAIN_PRIOR = _oracle_domain_prior()


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (the sample-prep step after chunking): md5-shard
    docs, order chunks within the shard, assign each chunk to the
    sequence holding its running word offset (floor(offset/64)) — the
    concat-then-split packing tokenizer pipelines run, parallel per
    shard, no global sort. Sequence-level output (n_chunks, n_words,
    fill). Library: operators/curation.py:pack_sequences."""
    chunks = chunk_documents(_t(spark, sf_dir, "documents"))
    return pack_sequences(chunks)


def _oracle_pack_sequences() -> str:
    return f"""
WITH chunks AS ({ORACLE_DOCS_CHUNK}),
sh AS (
  SELECT CAST(CAST(('0x' || substring(md5('pack:' || CAST(doc_id AS VARCHAR)),
                    1, 8)) AS BIGINT) % {PACK_SHARDS} AS INTEGER) AS shard,
         doc_id, chunk_id, n_words
  FROM chunks
), o AS (
  SELECT shard, n_words,
         CAST(floor(COALESCE(SUM(n_words) OVER (
                PARTITION BY shard ORDER BY doc_id, chunk_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_BUDGET}) AS BIGINT) AS seq_id
  FROM sh
)
SELECT shard, seq_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       round(SUM(n_words) / {float(PACK_BUDGET)}, 4) AS fill
FROM o GROUP BY shard, seq_id
"""


def q_docs_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality score: add-one-smoothed corpus bigram LM,
    per-doc pseudo-perplexity. Library:
    operators/curation.py:lm_perplexity."""
    from ..operators.curation import lm_perplexity

    return lm_perplexity(_t_wide(spark, sf_dir, "documents"))


ORACLE_DOCS_LM_PERPLEXITY = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), inst AS (
  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
), uni AS (
  SELECT word, COUNT(*) AS u_n
  FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word
), big AS (
  SELECT bg, COUNT(*) AS b_n FROM inst GROUP BY bg
), v AS (
  SELECT COUNT(*) AS v_n FROM uni
), score AS (
  SELECT i.doc_id, COUNT(*) AS n_bigrams,
         AVG(ln((coalesce(b.b_n, 0) + 1) * 1.0 / (u.u_n + v.v_n)))
           AS alp
  FROM inst i
  LEFT JOIN big b USING (bg)
  JOIN uni u ON i.w1 = u.word
  CROSS JOIN v
  GROUP BY i.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(s.alp, 6) AS avg_logp,
       round(exp(-s.alp), 4) AS perplexity
FROM documents d LEFT JOIN score s USING (doc_id)
"""


DUP_SPAN_K = 5


def q_docs_dup_span(spark, sf_dir):
    """RefinedWeb-style duplicated-span signal: per-doc fraction of
    distinct word 5-shingles shared with at least one other document.
    Library: operators/curation.py:dup_span_fraction."""
    from ..operators.curation import dup_span_fraction

    return dup_span_fraction(_t_wide(spark, sf_dir, "documents"),
                             k=DUP_SPAN_K)


# shingle CTE mirrors hashing.shingles_col at k=5 (lower, split \s+, drop
# empties, per-doc distinct; n<k degrades to the whole-doc token string)
ORACLE_DOCS_DUP_SPAN = r"""
WITH tsh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
              THEN list_distinct(list_transform(
                     generate_series(1, len(toks) - 4),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          || ' ' || toks[i+3] || ' ' || toks[i+4]))
              WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
              ELSE [] END AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents)
), ex AS (
  SELECT doc_id, unnest(sh) AS shingle FROM tsh
), freq AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY shingle
), per AS (
  SELECT e.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_shared
  FROM ex e JOIN freq f USING (shingle) GROUP BY e.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN coalesce(p.n_shingles, 0) > 0
            THEN round(p.n_shared * 1.0 / p.n_shingles, 6) END
         AS dup_span_frac
FROM documents d LEFT JOIN per p USING (doc_id)
"""


def q_docs_tfidf(spark, sf_dir):
    """Per-doc keyword extraction: top-3 terms by smoothed TF-IDF,
    deterministic ties, per-doc windows (no global sort). Library:
    operators/curation.py:tfidf_keywords."""
    from ..operators.curation import tfidf_keywords

    return tfidf_keywords(_t_wide(spark, sf_dir, "documents"))


ORACLE_DOCS_TFIDF = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS word
  FROM documents
), tf AS (
  SELECT id, word, COUNT(*) AS tf FROM toks GROUP BY id, word
), dfr AS (
  SELECT word, COUNT(DISTINCT id) AS df FROM toks GROUP BY word
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.id, tf.word, tf.tf,
         round(tf.tf * (ln((n.n_docs + 1.0) / (dfr.df + 1)) + 1), 6)
           AS tfidf
  FROM tf JOIN dfr USING (word) CROSS JOIN n
), ranked AS (
  SELECT id, word, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY id
                                 ORDER BY tfidf DESC, word ASC) AS INTEGER)
           AS rank
  FROM scored
)
SELECT id AS doc_id, rank, word, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rank <= 3
"""


def q_docs_token_stats(spark, sf_dir):
    """Per-document token accounting for training-data budgeting: the
    whitespace token count, a BPE-ish subword count (pieces split at
    whitespace and letter↔digit boundaries — the pretokenizer-shaped
    proxy for tokenizer cost), and the unigram token ENTROPY in nats
    (low-entropy docs are repetitive boilerplate even when integer
    repetition caps pass). All three are zero-shuffle per-row
    expressions; the entropy fold adds run·ln(run) in token-sorted
    order, so the oracle's ORDER BY word list_sum matches bit-for-bit.
    Library: functions/textstats.py:token_count_col /
    bpe_ish_token_count_col / token_entropy_col."""
    from ..functions.textstats import (
        bpe_ish_token_count_col, token_count_col, token_entropy_col,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count_col(F.col("text")).cast("long")
        .alias("n_bpe_tokens"),
        token_entropy_col(F.col("text")).alias("token_entropy"),
    )


# BPE-ish count relationally: pieces per \S+ word = 1 + letter<->digit
# transitions inside it (the zero-width split points of the Spark regex);
# transition pairs are 2 chars wide, so non-overlapping regexp_extract_all
# counts them exactly. Entropy: H = ln n - sum(c ln c)/n with the sum taken
# over an ORDER BY word list — the same addition order as the Spark fold.
ORACLE_DOCS_TOKEN_STATS = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), cnt AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS word FROM t) GROUP BY doc_id, word
), ent AS (
  SELECT doc_id, list_sum(list(c * ln(c) ORDER BY word)) AS sumclogc
  FROM cnt GROUP BY doc_id
), bpe AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))
         + len(regexp_extract_all(text, '[a-zA-Z][0-9]'))
         + len(regexp_extract_all(text, '[0-9][a-zA-Z]')) AS nb
  FROM documents
)
SELECT d.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_ws_tokens,
       CAST(b.nb AS BIGINT) AS n_bpe_tokens,
       CASE WHEN len(t.toks) > 0
            THEN round(ln(len(t.toks))
                       - coalesce(e.sumclogc, 0) / len(t.toks), 6)
       END AS token_entropy
FROM documents d
JOIN t USING (doc_id)
JOIN bpe b USING (doc_id)
LEFT JOIN ent e USING (doc_id)
"""


def q_remove_dup_spans(spark, sf_dir):
    """Exact-substring span REMOVAL (the operation behind the
    `docs_dup_span` diagnostic): every word covered by a 5-shingle that
    occurs in ≥2 documents is stripped, survivors reassembled in order —
    RefinedWeb's dedup step that actually changes the corpus. Two
    shuffles (shingle df, per-doc rebuild); the positional fan-outs are
    map-side. Library: operators/curation.py:remove_duplicate_spans."""
    from ..operators.curation import remove_duplicate_spans

    return remove_duplicate_spans(_t_wide(spark, sf_dir, "documents"))


# positional shingles over original-case words, matched case-insensitively
# (lower() on the joined slice); degenerate docs (n < 5) carry one
# whole-doc shingle covering every word — mirrors remove_duplicate_spans
ORACLE_REMOVE_DUP_SPANS = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id, i AS pos, least(i + 4, len(w)) AS endp,
         lower(array_to_string(list_slice(w, i, i + 4), ' ')) AS shingle
  FROM (SELECT doc_id, w,
               CASE WHEN len(w) >= 5 THEN len(w) - 4
                    WHEN len(w) > 0 THEN 1 ELSE 0 END AS npos
        FROM base),
       unnest(generate_series(1, npos)) AS g(i)
), freq AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY shingle
), covered AS (
  SELECT DISTINCT p.doc_id, j AS widx
  FROM pos p JOIN freq f USING (shingle),
       unnest(generate_series(p.pos, p.endp)) AS u(j)
  WHERE f.df >= 2
), words AS (
  SELECT doc_id, j AS widx, w[j] AS word
  FROM base, unnest(generate_series(1, len(w))) AS g(j)
), kept AS (
  SELECT ws.* FROM words ws
  ANTI JOIN covered c ON ws.doc_id = c.doc_id AND ws.widx = c.widx
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(word, ' ' ORDER BY widx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(len(b.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM base b LEFT JOIN rebuilt r USING (doc_id)
"""


LONG_REPEAT_LEN = 20  # min repeated-substring length in words (Lee et al.
#                       use 50 BPE tokens ≈ 35 words; 20 keeps the planted
#                       fixtures comfortably above threshold at sf0.01)
_BOILER_A = ("this website uses cookies to improve your experience we assume "
             "you accept by continuing to browse the site you agree to our "
             "use of cookies")          # 25 words ≥ LONG_REPEAT_LEN
_BOILER_B = ("all rights reserved reproduction in whole or in part without "
             "permission is prohibited please read our privacy policy and "
             "terms of service before use")  # 24 words ≥ LONG_REPEAT_LEN


def q_remove_long_repeats(spark, sf_dir):
    """Arbitrary-length exact-substring dedup (Lee et al. 2022
    ExactSubstr, arXiv:2107.06499): strip every token inside a ≥20-word
    sequence occurring ≥2 times corpus-wide — the production operator the
    fixed-k-shingle `remove_dup_spans` approximates. Implemented without
    suffix arrays via the window-frequency reduction (a token is in some
    ≥L repeat iff covered by a duplicated exactly-L window) with
    O(n·log L) doubling fingerprints. The raw corpus is ≥20-word-repeat
    free, so two boilerplate paragraphs (25 and 24 words — cookie banner /
    rights notice, each straddling the length threshold non-trivially)
    are planted on the doc_id%4∈{0,1} slices; the oracle replays the
    doubling levels, the window-occurrence count, and the strip exactly.
    Library: operators/curation.py:remove_long_repeats."""
    from ..operators.curation import remove_long_repeats

    docs = _t_wide(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("text"), F.lit(" " + _BOILER_A)))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.col("text"), F.lit(" " + _BOILER_B)))
        .otherwise(F.col("text")).alias("text"),
    )
    return remove_long_repeats(salted, min_len=LONG_REPEAT_LEN)


def _window_fp_ctes(prefix: str, base: str) -> tuple[str, str]:
    """SQL fragment replaying _window_fingerprints' doubling levels for
    L=LONG_REPEAT_LEN (p=4 → blocks of 16, overlapping combine at offset
    4) over CTE ``base`` (doc_id, w). Returns (ctes, wins_name) where
    ``wins_name`` emits (doc_id, pos, h) — one row per L-word window."""
    lvl_sql = """
  SELECT doc_id, w,
         CASE WHEN len(a) > {h}
              THEN list_transform(generate_series(1, len(a) - {h}),
                                  i -> md5(a[i] || a[i + {h}]))
              ELSE CAST([] AS VARCHAR[]) END AS a
  FROM {src}"""
    ctes = f""", {prefix}l0 AS (
  SELECT doc_id, w, list_transform(w, t -> md5(lower(t))) AS a FROM {base}
)"""
    src = f"{prefix}l0"
    for j, half in enumerate([1, 2, 4, 8, 4]):  # 4 doubling levels + the
        name = f"{prefix}l{j + 1}"              # offset-4 final combine
        ctes += f", {name} AS ({lvl_sql.format(h=half, src=src)})"
        src = name
    ctes += f""", {prefix}wins AS (
  SELECT doc_id, i AS pos, a[i] AS h
  FROM {src}, unnest(generate_series(1, len(a))) AS g(i)
)"""
    return ctes, f"{prefix}wins"


def _oracle_remove_long_repeats() -> str:
    """Replays the doubling levels, the corpus-wide occurrence count
    (HAVING COUNT(*) ≥ 2 over ALL window instances, not distinct docs),
    coverage expansion, and the ordered rebuild."""
    L = LONG_REPEAT_LEN
    levels, wins = _window_fp_ctes("", "base")
    return rf"""
WITH salted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || ' {_BOILER_A}'
              WHEN doc_id % 4 = 1 THEN text || ' {_BOILER_B}'
              ELSE text END AS text
  FROM documents
), base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM salted
){levels}, freq AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
), covered AS (
  SELECT DISTINCT ws.doc_id, j AS widx
  FROM wins ws JOIN freq USING (h),
       unnest(generate_series(ws.pos, ws.pos + {L - 1})) AS u(j)
), words AS (
  SELECT doc_id, j AS widx, w[j] AS word
  FROM base, unnest(generate_series(1, len(w))) AS g(j)
), kept AS (
  SELECT ws.* FROM words ws
  ANTI JOIN covered c ON ws.doc_id = c.doc_id AND ws.widx = c.widx
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(word, ' ' ORDER BY widx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(len(b.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM base b LEFT JOIN rebuilt r USING (doc_id)
"""


def q_stream_strip_long_repeats(spark, sf_dir):
    """Ingest-time arbitrary-length exact-substring removal as a
    foreachBatch stream (streaming/incremental.py:
    stream_strip_long_repeats): the corpus's distinct ≥20-word window
    fingerprints (docs with doc_id % 4 != 0; the % 4 == 1 slice carries
    the same planted cookie-banner boilerplate the delta does) are static
    persisted state; delta documents (doc_id % 4 == 0, boilerplate
    appended) stream in and lose every token covered by a corpus-seen
    window. Batching-invariant by construction (pure function of corpus
    state + own text), so the oracle is a FULL-plan replica: both sides'
    doubling levels, the corpus-distinct window set, the semi-join
    coverage, and the ordered rebuild."""
    from ..operators.curation import strip_long_repeats_vs_corpus  # noqa: F401
    from ..streaming.incremental import (
        _tmp_sink_dir, stream_strip_long_repeats,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 <= 1,
               F.concat(F.col("text"), F.lit(" " + _BOILER_A)))
        .otherwise(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = salted.where(F.col("doc_id") % 4 != 0)
    delta = salted.where(F.col("doc_id") % 4 == 0)
    d = _tmp_sink_dir("inc_lrepq_")  # atexit-cleaned
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_strip_long_repeats(spark, d, corpus,
                                     min_len=LONG_REPEAT_LEN, timeout_s=240)


def _oracle_stream_strip_long_repeats() -> str:
    c_levels, c_wins = _window_fp_ctes("c_", "corpus_base")
    d_levels, d_wins = _window_fp_ctes("d_", "delta_base")
    return rf"""
WITH salted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 <= 1 THEN text || ' {_BOILER_A}'
              ELSE text END AS text
  FROM documents
), corpus_base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM salted WHERE doc_id % 4 <> 0
), delta_base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM salted WHERE doc_id % 4 = 0
){c_levels}{d_levels}, ch AS (
  SELECT DISTINCT h FROM {c_wins}
), covered AS (
  SELECT DISTINCT dw.doc_id, j AS widx
  FROM {d_wins} dw JOIN ch USING (h),
       unnest(generate_series(dw.pos, dw.pos + {LONG_REPEAT_LEN - 1}))
         AS u(j)
), words AS (
  SELECT doc_id, j AS widx, w[j] AS word
  FROM delta_base, unnest(generate_series(1, len(w))) AS g(j)
), kept AS (
  SELECT ws.* FROM words ws
  ANTI JOIN covered c ON ws.doc_id = c.doc_id AND ws.widx = c.widx
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(word, ' ' ORDER BY widx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(len(b.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM delta_base b LEFT JOIN rebuilt r USING (doc_id)
"""


def q_stream_strip_spans(spark, sf_dir):
    """Ingest-time exact-substring removal as a foreachBatch stream
    (streaming/incremental.py:stream_strip_spans): the corpus's distinct
    positional 5-shingles (doc_id % 4 != 0) become static persisted
    state; delta documents (doc_id % 4 == 0) stream in and each
    micro-batch strips every word covered by a corpus-seen shingle —
    boilerplate is cut at the cheapest point, before the page enters
    the corpus store. Covered spans are a pure function of (corpus
    state, delta row) → batching-invariant, so the oracle is the
    one-shot delta-vs-corpus SQL."""
    from ..streaming.incremental import _tmp_sink_dir, stream_strip_spans

    docs = _t_wide(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    delta = docs.where(F.col("doc_id") % 4 == 0)
    d = _tmp_sink_dir("inc_spans_delta_")
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_strip_spans(spark, d, corpus, timeout_s=240)


ORACLE_STREAM_STRIP_SPANS = r"""
WITH baseall AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id, i AS pos, least(i + 4, len(w)) AS endp,
         lower(array_to_string(list_slice(w, i, i + 4), ' ')) AS shingle
  FROM (SELECT doc_id, w,
               CASE WHEN len(w) >= 5 THEN len(w) - 4
                    WHEN len(w) > 0 THEN 1 ELSE 0 END AS npos
        FROM baseall),
       unnest(generate_series(1, npos)) AS g(i)
), corp AS (
  SELECT DISTINCT shingle FROM pos WHERE doc_id % 4 <> 0
), base AS (
  SELECT * FROM baseall WHERE doc_id % 4 = 0
), covered AS (
  SELECT DISTINCT p.doc_id, j AS widx
  FROM pos p JOIN corp c USING (shingle),
       unnest(generate_series(p.pos, p.endp)) AS u(j)
  WHERE p.doc_id % 4 = 0
), words AS (
  SELECT doc_id, j AS widx, w[j] AS word
  FROM base, unnest(generate_series(1, len(w))) AS g(j)
), kept AS (
  SELECT ws.* FROM words ws
  ANTI JOIN covered c ON ws.doc_id = c.doc_id AND ws.widx = c.widx
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(word, ' ' ORDER BY widx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(len(b.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM base b LEFT JOIN rebuilt r USING (doc_id)
"""


def q_curation_gate_extended(spark, sf_dir):
    """The extended curation gate: base per-document rules (lang /
    quality / repetition) AND the two corpus-level signals stacked the
    way production gates actually compose them — duplicated-span
    fraction ≤ 0.5 and LM pseudo-perplexity ≤ 30.65 (≈ corpus p75, so
    the cap genuinely splits the data). Each signal is its own emitted
    flag; the oracle composes the three signal CTEs and verifies every
    rule. Library: operators/curation.py:curation_flags(extended=True)."""
    return curation_flags(_t_wide(spark, sf_dir, "documents"),
                          extended=True)


def _oracle_curation_gate_extended() -> str:
    from ..operators.curation import GATE_MAX_DUP_SPAN, GATE_MAX_PPL

    return f"""
WITH base AS ({_oracle_curation_gate()}),
spans AS ({ORACLE_DOCS_DUP_SPAN}),
ppl AS ({ORACLE_DOCS_LM_PERPLEXITY}),
ext AS (
  SELECT b.doc_id, b.lang_ok, b.quality_ok, b.repetition_ok,
         coalesce(s.dup_span_frac, 0.0) <= {GATE_MAX_DUP_SPAN}
           AS dup_span_ok,
         (p.perplexity IS NULL OR p.perplexity <= {GATE_MAX_PPL})
           AS perplexity_ok
  FROM base b
  JOIN spans s USING (doc_id)
  JOIN ppl p USING (doc_id)
)
SELECT doc_id, lang_ok, quality_ok, repetition_ok, dup_span_ok,
       perplexity_ok,
       (lang_ok AND quality_ok AND repetition_ok AND dup_span_ok
        AND perplexity_ok) AS keep
FROM ext
"""


RESIZE_W, RESIZE_H = 5, 4


def q_media_ppm_resize(spark, sf_dir):
    """REAL image resize: decode the Spark-assembled PPM, nearest-neighbor
    resample 8×6 → 5×4 in numpy, emit exact integer channel sums of the
    RESIZED raster. The oracle evaluates the resample arithmetic from the
    closed form — output pixel (x,y) reads source pixel
    ((x·8)//5, (y·6)//4) — so the hash verifies the resampling itself."""
    from ..operators.multimodal import ppm_payload_col, resize_ppm

    docs = _t(spark, sf_dir, "documents")
    imgs = docs.select(
        "doc_id",
        ppm_payload_col(F.col("doc_id"), PPM_W, PPM_H).alias("payload"),
    )
    return resize_ppm(imgs, RESIZE_W, RESIZE_H)


ORACLE_MEDIA_PPM_RESIZE = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(0, {RESIZE_W * RESIZE_H - 1}),
           p -> ((p // {RESIZE_W}) * {PPM_H} // {RESIZE_H}) * {PPM_W}
                + ((p % {RESIZE_W}) * {PPM_W} // {RESIZE_W})) AS src
  FROM documents
)
SELECT doc_id,
       CAST({RESIZE_W} AS BIGINT) AS width,
       CAST({RESIZE_H} AS BIGINT) AS height,
       CAST(list_sum(list_transform(src, s -> (doc_id + s) % 256))
            AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(src, s -> (doc_id * 3 + s * 5) % 256))
            AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(src, s -> (s * 7) % 256))
            AS BIGINT) AS sum_b
FROM px
"""


WAV_N_SAMPLES, WAV_RATE = 64, 8000


def q_media_wav_decode(spark, sf_dir):
    """REAL audio decode (not a stub): assemble a valid 16-bit mono PCM
    WAV per doc JVM-side (constant RIFF/fmt/data header + per-row
    little-endian samples via hex-fold → unhex), parse it with the actual
    RIFF chunk-walking numpy parser over mapInPandas, and emit exact
    integer amplitude stats. The oracle recomputes sum/min/max from the
    sample closed form: u_i = (doc_id*31 + i*17) % 65536 written as raw
    little-endian u16, so the decoded int16 is its two's-complement image
    ((u_i + 32768) % 65536 - 32768) — a hash match proves byte assembly
    AND decode end-to-end."""
    from ..operators.multimodal import decode_wav, wav_payload_col

    docs = _t(spark, sf_dir, "documents")
    audio = docs.select(
        "doc_id",
        wav_payload_col(F.col("doc_id"), WAV_N_SAMPLES, WAV_RATE)
        .alias("payload"),
    )
    return decode_wav(audio)


ORACLE_MEDIA_WAV_DECODE = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(generate_series(0, {WAV_N_SAMPLES - 1}),
                        i -> ((doc_id * 31 + i * 17) % 65536 + 32768)
                             % 65536 - 32768) AS amp
  FROM documents
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST({WAV_N_SAMPLES} AS BIGINT) AS n_samples,
       CAST(list_sum(amp) AS BIGINT) AS sum_amp,
       CAST(list_min(amp) AS BIGINT) AS min_amp,
       CAST(list_max(amp) AS BIGINT) AS max_amp
FROM s
"""


ORACLE_MEDIA_PPM_DECODE = f"""
SELECT doc_id,
       CAST({PPM_W} AS BIGINT) AS width,
       CAST({PPM_H} AS BIGINT) AS height,
       CAST({PPM_W * PPM_H} AS BIGINT) AS n_pixels,
       CAST(list_sum(list_transform(generate_series(0, {PPM_W * PPM_H - 1}),
            p -> (doc_id + p) % 256)) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(generate_series(0, {PPM_W * PPM_H - 1}),
            p -> (doc_id * 3 + p * 5) % 256)) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(generate_series(0, {PPM_W * PPM_H - 1}),
            p -> (p * 7) % 256)) AS BIGINT) AS sum_b
FROM documents
"""


BM25_QSTRIDE, BM25_QTERMS, BM25_K = 83, 8, 10
HYB_LIST_K, HYB_OUT_K, HYB_RRF_C = 20, 10, 60


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 lexical retrieval: every doc_id % 83 == 0 issues its
    first 8 distinct tokens as a query; top-10 corpus docs per query,
    self-matches excluded. Scores are integer micro-sums so the ranking
    is reproducible under any partitioning; the oracle replicates the
    FULL plan — tokenization, tf with carried doc length, query-vocab df,
    idf·tfnorm micro-rounding, integer sum, tie-broken window. Library:
    operators/retrieval.py:bm25_topk."""
    from ..operators.retrieval import bm25_topk

    docs = _t_wide(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % BM25_QSTRIDE == 0).select(
        F.col("doc_id").alias("query_id"),
        F.slice(_curation_tokens(F.col("text")), 1, BM25_QTERMS).alias("terms"),
    )
    return bm25_topk(docs, queries, k=BM25_K, exclude_self=True)


# tokenization/df/idf mirror operators/retrieval.py:bm25_topk exactly:
# same left-assoc arithmetic, micro-rounding BEFORE the integer sum, and
# (sum DESC, doc_id ASC) ranking on the exact integer score.
_BM25_CONTRIB_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM t
), tf AS (
  SELECT doc_id, dlen, word, COUNT(*) AS tf
  FROM (SELECT doc_id, len(toks) AS dlen, unnest(toks) AS word FROM t)
  GROUP BY doc_id, dlen, word
), qt AS (
  SELECT doc_id AS query_id,
         unnest(list_distinct(toks[1:{BM25_QTERMS}])) AS word
  FROM t WHERE doc_id % {BM25_QSTRIDE} = 0
), dfq AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df
  FROM tf WHERE word IN (SELECT DISTINCT word FROM qt)
  GROUP BY word
), contrib AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(
           (ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
            * ((tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * tf.dlen / stats.avgdl))))
           * 1000000.0, 0) AS BIGINT) AS m
  FROM tf JOIN dfq USING (word) JOIN qt USING (word) CROSS JOIN stats
  WHERE qt.query_id <> tf.doc_id
), bm_scored AS (
  SELECT query_id, doc_id, SUM(m) AS sm
  FROM contrib GROUP BY query_id, doc_id
), bm_ranked AS (
  SELECT query_id, doc_id, sm,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sm DESC, doc_id ASC) AS INTEGER)
           AS rank
  FROM bm_scored
)"""

ORACLE_BM25_TOPK = _BM25_CONTRIB_SQL + f"""
SELECT query_id, doc_id, round(sm / 1000000.0, 6) AS bm25, rank
FROM bm_ranked WHERE rank <= {BM25_K}
"""


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: the BM25 lexical top-20 and the exact-cosine
    embedding top-20 for the same query slice (doc_id % 83 == 0), fused
    by reciprocal-rank fusion (1/(60+rank), integer micro-sums), final
    top-10 per query. The production pattern for decontamination sweeps
    and near-dup review — lexical catches verbatim overlap, vectors
    catch paraphrase; RRF needs no score calibration between the two.
    Oracle replicates BOTH ranklists and the fusion end-to-end. Library:
    operators/retrieval.py:rrf_fuse (+ bm25_topk, ann.brute_force_topk)."""
    from ..operators.ann import brute_force_topk
    from ..operators.retrieval import bm25_topk, rrf_fuse

    docs = _t_wide(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    q_lex = docs.where(F.col("doc_id") % BM25_QSTRIDE == 0).select(
        F.col("doc_id").alias("query_id"),
        F.slice(_curation_tokens(F.col("text")), 1, BM25_QTERMS).alias("terms"),
    )
    bm = bm25_topk(docs, q_lex, k=HYB_LIST_K, exclude_self=True)
    q_vec = emb.where(F.col("vec_id") % BM25_QSTRIDE == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    ann = brute_force_topk(emb, q_vec, k=HYB_LIST_K)
    bm_ranks = bm.select("query_id", "doc_id", "rank")
    bm_ranks._erps_persisted = list(getattr(bm, "_erps_persisted", []) or [])
    return rrf_fuse(
        [bm_ranks, ann.select("query_id", "neighbor_id", "rank")],
        k=HYB_OUT_K, c=HYB_RRF_C,
    )


ORACLE_HYBRID_RRF = _BM25_CONTRIB_SQL + f""", q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id % {BM25_QSTRIDE} = 0
), c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), cos AS (
  SELECT q.query_id, c.neighbor_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.qv, x -> x * x))) > 0
                     AND sqrt(list_sum(list_transform(c.cv, x -> x * x))) > 0
               THEN list_dot_product(q.qv, c.cv)
                    / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                       * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               ELSE 0.0 END, 6) AS cosine
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.neighbor_id
), ann_ranked AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM cos
), fused AS (
  SELECT query_id, doc_id,
         CAST(round((1.0 / (60.0 + rank)) * 1000000.0, 0) AS BIGINT) AS m
  FROM bm_ranked WHERE rank <= {HYB_LIST_K}
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id,
         CAST(round((1.0 / (60.0 + rank)) * 1000000.0, 0) AS BIGINT) AS m
  FROM ann_ranked WHERE rank <= {HYB_LIST_K}
), fsum AS (
  SELECT query_id, doc_id, SUM(m) AS sm FROM fused GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, round(sm / 1000000.0, 6) AS rrf, rank FROM (
  SELECT query_id, doc_id, sm,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY sm DESC, doc_id ASC) AS INTEGER) AS rank
  FROM fsum
) WHERE rank <= {HYB_OUT_K}
"""


def q_stream_bm25(spark, sf_dir):
    """Incremental lexical retrieval as a foreachBatch stream
    (streaming/incremental.py:stream_bm25): the corpus is BM25-indexed
    ONCE into static persisted postings state; newly landed documents
    (doc_id % 83 == 0) stream in and each micro-batch issues its first
    8 distinct tokens as a query and broadcast-probes the index — new
    docs get lexical neighbors, the corpus is never re-tokenized.
    Batching-invariant (a delta row's ranklist depends only on corpus
    state + its own row), so the stream equals the one-shot batch
    bm25_topk and REUSES its full-plan oracle."""
    from ..streaming.incremental import _tmp_sink_dir, stream_bm25

    docs = _t_wide(spark, sf_dir, "documents")
    delta = docs.where(F.col("doc_id") % BM25_QSTRIDE == 0)
    d = _tmp_sink_dir("inc_bm25q_")  # atexit-cleaned, like the stream sinks
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_bm25(spark, d, docs, k=BM25_K,
                       n_query_terms=BM25_QTERMS, timeout_s=240)


MIX_ALPHA, MIX_BUDGET = 0.5, 0.5


def q_corpus_mix_temperature(spark, sf_dir):
    """Temperature-weighted source mixing (rate ∝ n_s^0.5, budget 50%):
    deterministic md5-bucket keeps, per-source rates normalized over a
    source-ordered fold. alpha=0.5 rides sqrt (IEEE-correctly-rounded →
    cross-engine bit parity). Library:
    operators/curation.py:sample_corpus_temperature."""
    from ..operators.curation import sample_corpus_temperature

    docs = _t_wide(spark, sf_dir, "documents")
    return sample_corpus_temperature(
        docs, alpha=MIX_ALPHA, budget_frac=MIX_BUDGET)


ORACLE_CORPUS_MIX = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), norm AS (
  SELECT list_sum(list(sqrt(n_s) ORDER BY source)) AS s_norm,
         SUM(n_s) AS n_total
  FROM counts
), rates AS (
  SELECT source,
         round(least(1.0, {MIX_BUDGET} * CAST(n_total AS DOUBLE)
                          * sqrt(n_s) / s_norm / n_s), 6) AS rate
  FROM counts CROSS JOIN norm
)
SELECT d.doc_id, d.source, r.rate,
       CAST(('0x' || substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                               1, 8)) AS BIGINT)
         < CAST(round(r.rate * 4294967296.0, 0) AS BIGINT) AS kept
FROM documents d JOIN rates r USING (source)
"""


SPLIT_SHARDS = 8


def q_corpus_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split + 8-way shard-shuffle:
    split/shard/in-shard position are each independent md5 functions of
    the id (stable release-over-release; no global sort — the position
    window is per (split, shard)). Library:
    operators/curation.py:split_corpus."""
    from ..operators.curation import split_corpus

    docs = _t_wide(spark, sf_dir, "documents")
    return split_corpus(docs, n_shards=SPLIT_SHARDS)


ORACLE_CORPUS_SPLIT = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 10000 AS bucket,
         CAST(CAST(('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT)
              % {SPLIT_SHARDS} AS INTEGER) AS shard,
         CAST(('0x' || substring(md5('pos:' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) AS p
  FROM documents
), s AS (
  SELECT doc_id, bucket,
         CASE WHEN bucket < 9000 THEN 'train'
              WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split,
         shard, p
  FROM h
)
SELECT doc_id, bucket, split, shard,
       CAST(row_number() OVER (PARTITION BY split, shard
                               ORDER BY p, doc_id) AS INTEGER) AS pos
FROM s
"""


# =============================================================================
# Registry
# =============================================================================

SEMDEDUP_CELLS = 8
SEMDEDUP_THRESHOLD = 0.35


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): embedding-cluster semantic near-dup
    pruning — every vector labeled (vec_id, cell_id, is_keeper), dropped
    iff a smaller-id vector in the same coarse cell has cosine ≥
    SEMDEDUP_THRESHOLD (0.35 here — the synthetic embeddings are near
    uniform on the sphere, so the paper's 0.9x settings would drop
    nothing at sf0.01).
    The oracle replicates the FULL plan (seeded centroid draw, cosine
    argmax cell assignment, within-cell pair scan, greedy min-id keeper)
    so the hash match verifies the approximate clustering itself.
    Library: operators/dedup.py:semantic_dedup."""
    from ..operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_cells=SEMDEDUP_CELLS,
                          threshold=SEMDEDUP_THRESHOLD)


def _oracle_semantic_dedup() -> str:
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_ab = _IVF_COS.format(a="a.e", b="b.e")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT {SEMDEDUP_CELLS})
), asg AS (
  SELECT v.vec_id, v.e, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE round({cos_ab}, 6) >= {SEMDEDUP_THRESHOLD}
)
SELECT c.vec_id, c.cell_id, d.vec_id IS NULL AS is_keeper
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
"""


def q_semantic_dedup_cc(spark, sf_dir):
    """SemDeDup with the keep-one-per-duplicate-GROUP keeper: thresholded
    within-cell cosine pairs → transitive closure → exactly one keeper
    per component (the component's NUMERIC min id) — the round-4
    advisor's alternative to the one-pass greedy rule; both ship, callers
    pick the semantics, and the keeper set here is provably a subset of
    the greedy rule's (pytest-pinned). Oracle: the full IVF cell plan
    plus a recursive-CTE closure (the connected_components oracle
    pattern) over the thresholded pair set.
    Library: operators/dedup.py:semantic_dedup_cc."""
    from ..operators.dedup import semantic_dedup_cc

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_cc(emb, n_cells=SEMDEDUP_CELLS,
                             threshold=SEMDEDUP_THRESHOLD)


def _oracle_semantic_dedup_cc() -> str:
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_ab = _IVF_COS.format(a="a.e", b="b.e")
    return f"""
WITH RECURSIVE v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT {SEMDEDUP_CELLS})
), asg AS (
  SELECT v.vec_id, v.e, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
), p0 AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM cells a JOIN cells b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE round({cos_ab}, 6) >= {SEMDEDUP_THRESHOLD}
), e AS (
  SELECT src, dst FROM p0 UNION SELECT dst, src FROM p0
), reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src
  WHERE r.a <> e2.dst
), comp AS (
  SELECT a AS vec_id,
         MIN(least(CAST(a AS VARCHAR), CAST(b AS VARCHAR))) AS comp_str
  FROM reach GROUP BY a
), lab AS (
  SELECT c.vec_id, c.cell_id,
         coalesce(m.comp_str, CAST(c.vec_id AS VARCHAR)) AS comp
  FROM cells c LEFT JOIN comp m ON c.vec_id = m.vec_id
)
SELECT vec_id, cell_id,
       vec_id = MIN(vec_id) OVER (PARTITION BY comp) AS is_keeper
FROM lab
"""


def q_stream_semantic_dedup(spark, sf_dir):
    """Incremental SemDeDup as a foreachBatch stream
    (streaming/incremental.py:stream_semantic_dedup): the curated corpus
    (vec_id ≥ 20) is cell-indexed ONCE into static persisted state; new
    vectors (vec_id < 20) stream in, land in exactly the cell the corpus
    build would give them (same driver-state centroid literals), and are
    flagged against corpus neighbors with cosine ≥ 0.35 — admission
    control for an embedding-deduplicated corpus. Batching-invariant
    (delta-vs-corpus only, by design), so the FULL-plan oracle replicates
    the corpus centroid draw, both assignments, and the thresholded
    cell-join count."""
    from ..streaming.incremental import _tmp_sink_dir, stream_semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 20)
    delta = emb.where(F.col("vec_id") < 20)
    d = _tmp_sink_dir("inc_semdq_")  # atexit-cleaned, like the stream sinks
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_semantic_dedup(spark, d, corpus, n_cells=SEMDEDUP_CELLS,
                                 threshold=SEMDEDUP_THRESHOLD, timeout_s=240)


def _oracle_stream_semantic_dedup() -> str:
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_dc = _IVF_COS.format(a="d.e", b="a.e")
    return f"""
WITH v0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v0 WHERE vec_id >= 20 ORDER BY _h LIMIT {SEMDEDUP_CELLS})
), asg AS (
  SELECT v.vec_id, v.e, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v0 v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
), hits AS (
  SELECT d.vec_id, COUNT(*) AS n
  FROM cells d JOIN cells a ON d.cell_id = a.cell_id
  WHERE d.vec_id < 20 AND a.vec_id >= 20
    AND round({cos_dc}, 6) >= {SEMDEDUP_THRESHOLD}
  GROUP BY d.vec_id
)
SELECT c.vec_id, c.cell_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_corpus_dups,
       h.n IS NULL AS is_keeper
FROM cells c LEFT JOIN hits h ON c.vec_id = h.vec_id
WHERE c.vec_id < 20
"""


FUZZY_DECON_THRESHOLD = 0.5


def q_fuzzy_decontaminate(spark, sf_dir):
    """FUZZY benchmark decontamination: MinHash-LSH candidates between
    the corpus and the deterministic eval slice (doc_id % 97 == 0),
    verified by EVAL-side shingle containment ≥ 0.5 — catches paraphrased
    or embedded benchmark items the exact-shingle counter under-counts
    (the GPT-3-style fuzzy decontamination stage). Full-plan oracle:
    per-band MinHash CTEs + broadcast-shaped bucket join + containment
    verify. Library: operators/dedup.py:fuzzy_contamination_flags."""
    from ..operators.dedup import fuzzy_contamination_flags

    docs = _t_wide(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return fuzzy_contamination_flags(
        docs, eval_docs, k=3, n_bands=4,
        threshold=FUZZY_DECON_THRESHOLD, stop_threshold=LSH_STOP)


def _oracle_fuzzy_decontaminate(n_bands: int = 4) -> str:
    bands = ", ".join(f"{_mh_band_sql(b)} AS mh_{b}" for b in range(n_bands))
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{b}:' || mh_{b} AS bucket FROM sigs"
        for b in range(n_bands)
    )
    return f"""
WITH t AS ({_SHINGLE_SQL}), s AS ({_SHINGLE3}),
sigs AS (SELECT doc_id, {bands} FROM s),
buckets0 AS ({unions}),
keep AS (SELECT bucket FROM buckets0 GROUP BY bucket
         HAVING COUNT(*) <= {LSH_STOP}),
tb AS (SELECT b.* FROM buckets0 b JOIN keep k ON b.bucket = k.bucket),
eb AS (SELECT DISTINCT bucket, doc_id AS eval_id FROM buckets0
       WHERE doc_id % 97 = 0),
cand AS (
  SELECT DISTINCT tb.doc_id, eb.eval_id
  FROM tb JOIN eb ON tb.bucket = eb.bucket
), ver AS (
  SELECT c.doc_id, c.eval_id,
         round(CASE WHEN len(se.sh) > 0
               THEN CAST(len(list_intersect(st.sh, se.sh)) AS DOUBLE)
                    / len(se.sh) ELSE 0.0 END, 6) AS containment
  FROM cand c
  JOIN s st ON c.doc_id = st.doc_id
  JOIN s se ON c.eval_id = se.doc_id
), hits AS (
  SELECT doc_id, COUNT(*) AS n_eval_matches,
         MAX(containment) AS max_containment
  FROM ver WHERE containment >= {FUZZY_DECON_THRESHOLD}
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       round(coalesce(h.max_containment, 0.0), 6) AS max_containment,
       coalesce(h.n_eval_matches, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def q_ann_sq(spark, sf_dir):
    """Scalar-quantized (SQ8) similarity search — the 4× embedding-storage
    compression path (FAISS IndexScalarQuantizer): per-dimension min/max
    ranges trained in ONE aggregation (driver state), corpus encoded to
    int codes by a narrow floor-quantization projection, search runs over
    the midpoint-reconstructed vectors with full-precision queries (the
    asymmetric convention). The oracle replicates the ENTIRE plan —
    range training, clamped floor encode, midpoint decode, cosine top-k —
    so the hash match verifies the quantization itself.
    Library: operators/ann.py:sq_train/sq_encode/sq_topk."""
    from ..operators.ann import sq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sq_topk(emb, queries, k=5)


def _oracle_ann_sq() -> str:
    cos_qc = _IVF_COS.format(a="q.e", b="r.c_vec")
    code = ("CASE WHEN rg.his[d] <= rg.los[d] THEN 0 "
            "ELSE least(255, greatest(0, CAST(floor("
            "(v.e[d] - rg.los[d]) / (rg.his[d] - rg.los[d]) * 256.0) "
            "AS INT))) END")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), dims AS (
  SELECT d, MIN(e[d]) AS lo, MAX(e[d]) AS hi
  FROM (SELECT e, unnest(generate_series(1, len(e))) AS d FROM v)
  GROUP BY d
), rg AS (
  SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM dims
), r AS (
  SELECT v.vec_id AS neighbor_id,
         list_transform(generate_series(1, len(v.e)), d ->
           rg.los[d] + ({code} + 0.5) / 256.0 * (rg.his[d] - rg.los[d]))
           AS c_vec
  FROM v CROSS JOIN rg
), q AS (
  SELECT vec_id AS query_id, e FROM v WHERE vec_id < 20
), scored AS (
  SELECT q.query_id, r.neighbor_id, round({cos_qc}, 6) AS cosine
  FROM r CROSS JOIN q WHERE q.query_id <> r.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored) WHERE rank <= 5
"""


def q_ann_ivf_sq(spark, sf_dir):
    """IVF + SQ8 (FAISS IndexIVFScalarQuantizer): coarse cells prune the
    scan (n_cells=8, n_probe=2) and within cells the corpus is int8
    codes reconstructed on the fly — the other production ANN
    composition next to IVFPQ. The oracle replicates the ENTIRE composed
    plan: centroid draw, cell assignment, range training, clamped floor
    encode, midpoint decode, probe selection, in-cell cosine ranking.
    Library: operators/ann.py:ivf_sq_topk."""
    from ..operators.ann import ivf_sq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ivf_sq_topk(emb, queries, k=5, n_cells=8, n_probe=2)


def _oracle_ann_ivf_sq() -> str:
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    cos_qc = _IVF_COS.format(a="q.qv", b="cn.c")
    cos_qr = _IVF_COS.format(a="p.qv", b="r.c_vec")
    code = ("CASE WHEN rg.his[d] <= rg.los[d] THEN 0 "
            "ELSE least(255, greatest(0, CAST(floor("
            "(a.e[d] - rg.los[d]) / (rg.his[d] - rg.los[d]) * 256.0) "
            "AS INT))) END")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT 8)
), asg AS (
  SELECT v.vec_id, v.e, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
), dims AS (
  SELECT d, MIN(e[d]) AS lo, MAX(e[d]) AS hi
  FROM (SELECT e, unnest(generate_series(1, len(e))) AS d FROM v)
  GROUP BY d
), rg AS (
  SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM dims
), r AS (
  SELECT a.vec_id AS neighbor_id, a.cell_id,
         list_transform(generate_series(1, len(a.e)), d ->
           rg.los[d] + ({code} + 0.5) / 256.0 * (rg.his[d] - rg.los[d]))
           AS c_vec
  FROM cells a CROSS JOIN rg
), q AS (
  SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20
), pr AS (
  SELECT query_id, qv, cell_id FROM (
    SELECT q.query_id, q.qv, cn.cell_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {cos_qc} DESC, cn.cell_id ASC) AS rn
    FROM q CROSS JOIN cent cn) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.query_id, r.neighbor_id,
         round({cos_qr}, 6) AS cosine
  FROM r JOIN pr p USING (cell_id)
  WHERE p.query_id <> r.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM cand) WHERE rank <= 5
"""


HASH_EMBED_DIM = 32


def q_docs_hash_embed(spark, sf_dir):
    """Feature-hashing document embeddings (the hashing trick /
    HashingTF, but md5-based so the WHOLE embedding is hash-checkable in
    SQL): each token's tf scatters into slot md5(token) mod 32,
    L2-normalized — the deterministic text→vector bridge that lets the
    ANN / SemDeDup / SRP stack run on any text corpus with no trained
    model. One token explode, one (id, slot) count shuffle, one per-id
    assembly. The battery projection serializes the vector to one
    comma-joined MICRO-INT string (×1e6 of the 6dp-rounded components):
    the driver canonicalizer can't sort list cells (round-4 driver
    regression), and integer rendering — unlike double→varchar — is
    format-identical across Spark and DuckDB.
    Library: functions/textstats.py:hashed_tf_embedding."""
    from ..functions.textstats import hashed_tf_embedding

    emb = hashed_tf_embedding(_t_wide(spark, sf_dir, "documents"),
                              dim=HASH_EMBED_DIM)
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.round(x * 1000000).cast("long").cast("string"))
    return emb.select("doc_id", F.array_join(micro, ",").alias("embedding"))


ORACLE_DOCS_HASH_EMBED = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '\s+'),
                x -> x <> '')) AS tok
  FROM documents
), counts AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)
              % {HASH_EMBED_DIM} AS INT) AS slot,
         COUNT(*) AS tf
  FROM toks GROUP BY 1, 2
), dense AS (
  SELECT d.doc_id, i.i AS slot, CAST(coalesce(c.tf, 0) AS DOUBLE) AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, {HASH_EMBED_DIM - 1})) AS i) i
  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.slot = i.i
), vecs AS (
  SELECT doc_id, list(v ORDER BY slot) AS v FROM dense GROUP BY doc_id
)
SELECT doc_id,
       array_to_string(list_transform(v,
         x -> CAST(round(round(CASE WHEN nrm > 0 THEN x / nrm
                                    ELSE x END, 6) * 1000000) AS BIGINT)),
         ',') AS embedding
FROM (SELECT doc_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM vecs)
"""


SKETCH_K = 64


def q_sketch_distinct(spark, sf_dir):
    """Per-source distinct-shingle estimate from a bottom-k (KMV) sketch
    — O(k) state per group instead of a distinct-width exchange; md5
    hash order makes the APPROXIMATE estimator itself hash-checkable in
    SQL (unlike HLL++'s engine-private registers).
    Library: operators/sketches.py:kmv_distinct."""
    from ..operators.sketches import kmv_distinct

    docs = _t_wide(spark, sf_dir, "documents")
    items = docs.select(
        "source",
        F.explode(shingles_col(F.lower(F.col("text")), 3)).alias("shingle"))
    return kmv_distinct(items, "source", "shingle", k=SKETCH_K)


_SKETCH_HASHED = r"""
  SELECT DISTINCT source AS grp,
         CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT)
           / 4294967296.0 AS h
  FROM (SELECT source, unnest(sh) AS shingle
        FROM (SELECT source,
                     CASE WHEN len(toks) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(toks) - 2),
                                 i -> toks[i] || ' ' || toks[i + 1]
                                      || ' ' || toks[i + 2]))
                          WHEN len(toks) > 0
                          THEN [array_to_string(toks, ' ')]
                          ELSE [] END AS sh
              FROM (SELECT source,
                           list_filter(string_split_regex(
                             lower(coalesce(text, '')), '\s+'),
                             x -> x <> '') AS toks
                    FROM documents)))
"""

ORACLE_SKETCH_DISTINCT = f"""
WITH hashed AS ({_SKETCH_HASHED}),
sk AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed QUALIFY rn <= {SKETCH_K}
), agg AS (
  SELECT grp, COUNT(*) AS n_in,
         MAX(CASE WHEN rn = {SKETCH_K} THEN h END) AS hk
  FROM sk GROUP BY grp
)
SELECT grp AS source,
       round(CASE WHEN n_in < {SKETCH_K} THEN CAST(n_in AS DOUBLE)
                  ELSE {SKETCH_K - 1}.0 / hk END, 4) AS n_est
FROM agg
"""


def q_sketch_hll(spark, sf_dir):
    """Per-source distinct-shingle estimate from a fixed-width
    HyperLogLog register sketch (m = 64) — the OTHER classic web-scale
    cardinality sketch beside the bottom-k row above, with a stronger
    scale shape: no distinct pre-pass at all (max(rho) folds duplicates
    map-side), state is exactly 64 integer registers per group, and the
    register transform is pure integer/bit arithmetic so the APPROXIMATE
    estimator replays exactly in SQL (unlike approx_count_distinct's
    engine-private HLL++ registers). Small sources exercise the
    linear-counting branch; large ones the harmonic estimator.
    Library: operators/sketches.py:hll_distinct."""
    from ..operators.sketches import hll_distinct

    docs = _t_wide(spark, sf_dir, "documents")
    items = docs.select(
        "source",
        F.explode(shingles_col(F.lower(F.col("text")), 3)).alias("shingle"))
    return hll_distinct(items, "source", "shingle")


# raw (grp, shingle) rows — the HLL path deliberately takes NO DISTINCT
# (register max is idempotent), so this mirrors the Spark input exactly
_SKETCH_ITEMS_RAW = r"""
  SELECT source AS grp, shingle
  FROM (SELECT source, unnest(sh) AS shingle
        FROM (SELECT source,
                     CASE WHEN len(toks) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(toks) - 2),
                                 i -> toks[i] || ' ' || toks[i + 1]
                                      || ' ' || toks[i + 2]))
                          WHEN len(toks) > 0
                          THEN [array_to_string(toks, ' ')]
                          ELSE [] END AS sh
              FROM (SELECT source,
                           list_filter(string_split_regex(
                             lower(coalesce(text, '')), '\s+'),
                             x -> x <> '') AS toks
                    FROM documents)))
"""


def _oracle_sketch_hll() -> str:
    from ..operators.sketches import (HLL_M, _HLL_NUM, _HLL_RHO_MAX,
                                      _HLL_SMALL)

    return f"""
WITH items AS ({_SKETCH_ITEMS_RAW}),
reg AS (
  SELECT grp, h % {HLL_M} AS j,
         max(CASE WHEN (h >> 6) = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(h >> 6)) END) AS m_j
  FROM (SELECT grp,
               CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS h
        FROM items)
  GROUP BY grp, j
), agg AS (
  SELECT grp, count(*) AS nz,
         SUM(1::BIGINT << ({_HLL_RHO_MAX} - m_j)) AS s
  FROM reg GROUP BY grp
)
SELECT grp AS source,
       round(CASE WHEN e_raw <= {_HLL_SMALL!r} AND v > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                  ELSE e_raw END, 4) AS n_est
FROM (SELECT grp, {HLL_M} - nz AS v,
             {_HLL_NUM!r} / CAST(s + ({HLL_M} - nz)
                                 * (1::BIGINT << {_HLL_RHO_MAX}) AS DOUBLE)
               AS e_raw
      FROM agg)
"""


ORACLE_SKETCH_HLL = _oracle_sketch_hll()


def q_sketch_source_overlap(spark, sf_dir):
    """Corpus overlap matrix: pairwise source shingle-Jaccard estimated
    from the bottom-k sketches ALONE (X = bottom-k of the merged hashes;
    Ĵ = fraction of X in both sketches) — the mixture-design audit that
    at 100 TB must never re-scan the corpus per pair. Full-plan oracle.
    Library: operators/sketches.py:kmv_source_overlap."""
    from ..operators.sketches import kmv_source_overlap

    docs = _t_wide(spark, sf_dir, "documents")
    items = docs.select(
        "source",
        F.explode(shingles_col(F.lower(F.col("text")), 3)).alias("shingle"))
    return kmv_source_overlap(items, "source", "shingle", k=SKETCH_K)


ORACLE_SKETCH_OVERLAP = f"""
WITH hashed AS ({_SKETCH_HASHED}),
sk AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed QUALIFY rn <= {SKETCH_K}
), g AS (SELECT DISTINCT grp FROM sk),
pairs AS (
  SELECT a.grp AS ga, b.grp AS gb FROM g a JOIN g b ON a.grp < b.grp
), u AS (
  SELECT ga, gb, h, MAX(fa) AS in_a, MAX(fb) AS in_b FROM (
    SELECT p.ga, p.gb, s.h, 1 AS fa, 0 AS fb
    FROM pairs p JOIN sk s ON s.grp = p.ga
    UNION ALL
    SELECT p.ga, p.gb, s.h, 0 AS fa, 1 AS fb
    FROM pairs p JOIN sk s ON s.grp = p.gb
  ) GROUP BY ga, gb, h
), x AS (
  SELECT ga, gb, in_a, in_b,
         row_number() OVER (PARTITION BY ga, gb
                            ORDER BY h, in_a, in_b) AS rn
  FROM u QUALIFY rn <= {SKETCH_K}
)
SELECT ga AS source_a, gb AS source_b,
       round(CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*), 4) AS jaccard_est
FROM x GROUP BY ga, gb
"""


def q_quality_filter(spark, sf_dir):
    """Model-based quality filtering (the GPT-3/LLaMA classifier stage),
    verified at its DEPLOYMENT path: native per-document features
    (token/char ratios, entropy, repetition fractions) → dot product with
    the COMMITTED coefficient artifact (PINNED_QUALITY_MODEL, one LBFGS
    training run at sf0.01 — the distilled classifier a 100 TB job
    broadcasts) → 6dp logit → keep ⇔ logit ≥ 0 (≡ p ≥ 0.5, logistic
    monotone — the logit avoids the one cross-engine-unsafe term, exp).
    gate_keep rides along for side-by-side audit. The FULL scoring plan
    has a DuckDB oracle (features, fold-ordered dot, threshold); training
    quality is pytest-gated (held-out agreement ≥ 0.85 / AUC ≥ 0.9 vs the
    gate labels, measured 0.912/0.967, plus fresh-model agreement with
    the pinned artifact). Library: operators/quality_model.py."""
    from ..operators.quality_model import (
        doc_quality_features, score_quality_pinned,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    scored = score_quality_pinned(doc_quality_features(docs))
    gate = curation_flags(docs).select(
        "doc_id", F.col("keep").alias("gate_keep"))
    return scored.select("doc_id", "logit", "keep").join(gate, "doc_id")


def _oracle_quality_filter() -> str:
    """Full-plan replica of q_quality_filter: the seven native features
    exactly as operators/quality_model.py:doc_quality_features folds them
    (three tokenizations: lowered-\\s+ for counts/stopwords, raw-\\s+ for
    entropy, the [^a-z0-9']+ word split for repetition), then the pinned
    dot product in QUALITY_FEATURES order (left-to-right adds — IEEE
    order-identical to the Spark expression), 6dp round, keep at 0."""
    from ..functions.textstats import LANG_STOPWORDS
    from ..operators.quality_model import (
        PINNED_QUALITY_COEFFS, PINNED_QUALITY_INTERCEPT, QUALITY_FEATURES,
    )

    stops = ", ".join(f"'{s}'" for s in LANG_STOPWORDS["en"])
    dot = f"CAST({PINNED_QUALITY_INTERCEPT!r} AS DOUBLE)"
    for name in QUALITY_FEATURES:
        dot += (f" + CAST({PINNED_QUALITY_COEFFS[name]!r} AS DOUBLE)"
                f" * {name}")
    return rf"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), tok AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(lower(t), '\s+'),
                     x -> x <> '') AS lw,
         list_filter(string_split_regex(t, '\s+'), x -> x <> '') AS rw,
         list_filter(string_split_regex(lower(t), '[^a-z0-9'']+'),
                     x -> x <> '') AS gw
  FROM base
), ent AS (
  SELECT doc_id, list_sum(list(c * ln(c) ORDER BY word)) AS sumclogc
  FROM (SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(rw) AS word FROM tok)
        GROUP BY 1, 2)
  GROUP BY doc_id
), top AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) AS twc
  FROM (SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(gw) AS word FROM tok)
        GROUP BY 1, 2)
  GROUP BY doc_id
), raw AS (
  SELECT k.doc_id,
         CAST(len(k.lw) AS DOUBLE) AS nt,
         CAST(len(regexp_replace(k.t, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           AS alpha,
         CAST(len(k.t) AS DOUBLE) AS nc,
         CAST(len(list_filter(k.lw, x -> x IN ({stops}))) AS DOUBLE)
           AS stop_hits,
         CASE WHEN len(k.rw) > 0
              THEN round(ln(len(k.rw))
                         - coalesce(e.sumclogc, 0) / len(k.rw), 6)
              ELSE 0.0 END AS entropy,
         CAST(len(k.gw) AS DOUBLE) AS tw,
         CAST(len(list_distinct(k.gw)) AS DOUBLE) AS dw,
         coalesce(tp.twc, 0.0) AS twc
  FROM tok k
  LEFT JOIN ent e USING (doc_id)
  LEFT JOIN top tp USING (doc_id)
), feats AS (
  SELECT doc_id, nt AS n_tokens,
         CASE WHEN nt > 0 THEN alpha / nt ELSE 0.0 END AS mean_word_len,
         CASE WHEN nc > 0 THEN alpha / nc ELSE 0.0 END AS alpha_ratio,
         CASE WHEN nt > 0 THEN stop_hits / nt ELSE 0.0 END AS stop_ratio,
         entropy,
         CASE WHEN tw > 0 THEN CAST(1.0 AS DOUBLE) - dw / tw
              ELSE 0.0 END AS dup_word_frac,
         CASE WHEN tw > 0 THEN twc / tw ELSE 0.0 END AS top_word_frac
  FROM raw
), scored AS (
  SELECT doc_id, round({dot}, 6) AS logit FROM feats
), gate AS ({_oracle_curation_gate()})
SELECT s.doc_id, s.logit, s.logit >= CAST(0.0 AS DOUBLE) AS keep,
       g.keep AS gate_keep
FROM scored s JOIN gate g USING (doc_id)
"""


def q_stream_quality_filter(spark, sf_dir):
    """Ingest-time model-based quality filtering as a foreachBatch stream
    (streaming/incremental.py:stream_quality_filter): the committed
    pinned-coefficient artifact is saved as its JSON S12 form, loaded
    back, and broadcast into every micro-batch's scoring projection —
    the full artifact round-trip a production delta job runs. Scoring is
    a pure per-row map (zero state), so the stream is batching-invariant
    by construction and this row REUSES the batch quality_filter
    full-plan oracle (features → pinned dot → 6dp logit → threshold,
    plus the heuristic gate verdict for audit)."""
    from ..operators.quality_model import save_pinned_quality_filter
    from ..streaming.incremental import (
        _tmp_sink_dir, stream_quality_filter,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    d = _tmp_sink_dir("inc_qfq_")  # atexit-cleaned
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    art = _tmp_sink_dir("inc_qfart_")
    save_pinned_quality_filter(art)
    return stream_quality_filter(spark, d, artifact_path=art, timeout_s=240)


def q_corpus_diff(spark, sf_dir):
    """Snapshot-over-snapshot corpus diff (dataset-versioning audit):
    old = docs with doc_id % 5 != 0, new = docs with doc_id % 11 != 0 and
    text revised ('<text> rev2') where doc_id % 7 == 0 — so all four
    statuses (added / removed / changed / unchanged) genuinely occur.
    Each side collapses to (id, md5) map-side; ONE full-outer id join
    classifies everything, text never moves.
    Library: operators/curation.py:corpus_diff."""
    from ..operators.curation import corpus_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text")).alias("text"),
    )
    return corpus_diff(old, new)


ORACLE_CORPUS_DIFF = """
WITH o AS (
  SELECT doc_id, md5(coalesce(text, '')) AS old_hash
  FROM documents WHERE doc_id % 5 <> 0
), n AS (
  SELECT doc_id,
         md5(coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                           ELSE text END, '')) AS new_hash
  FROM documents WHERE doc_id % 11 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.old_hash <> n.new_hash THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_hash, n.new_hash
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def q_stream_fuzzy_decontaminate(spark, sf_dir):
    """Fuzzy benchmark-release-day decontamination as a foreachBatch
    stream (streaming/incremental.py:stream_fuzzy_decontaminate): the
    corpus shingles + stop-guarded band-bucket index are static
    persisted state; new eval docs (doc_id % 97 == 0) stream in,
    broadcast-probe the index, and verified containment hits commit to
    idempotent batch sinks. Distinct-union of per-(corpus, eval-row)
    hits is batching-invariant, so the row REUSES the batch
    fuzzy_decontaminate full-plan oracle (same convention as
    stream_decontaminate)."""
    from ..streaming.incremental import (
        _tmp_sink_dir, stream_fuzzy_decontaminate,
    )

    docs = _t_wide(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    d = _tmp_sink_dir("inc_fdeconq_")  # atexit-cleaned
    eval_docs.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_fuzzy_decontaminate(
        spark, d, docs, k=3, n_bands=4,
        threshold=FUZZY_DECON_THRESHOLD, stop_threshold=LSH_STOP,
        timeout_s=240)


LINE_WORDS = 8  # deterministic line synthesis: one line per 8 words


def _structured_line_docs(spark, sf_dir) -> DataFrame:
    """Deterministic line synthesis for the line-dedup rows: the synthetic
    docs are single-line, so one line per 8 lowercase words (same fixture
    discipline as the media rows' byte-assembly); the planted near-dup
    docs then share EXACT lines, so the frequency rule genuinely fires."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"), lambda t: t != "")
    inner = docs.select("doc_id", toks.alias("_toks"))
    n = F.size("_toks")
    lines = F.transform(
        F.sequence(F.lit(1), F.ceil(n / F.lit(float(LINE_WORDS))).cast("int")),
        lambda i: F.concat_ws(
            " ", F.slice("_toks", (i - F.lit(1)) * LINE_WORDS + F.lit(1),
                         F.lit(LINE_WORDS))),
    )
    return inner.select(
        "doc_id",
        F.when(n > 0, F.array_join(lines, "\n")).otherwise(F.lit(""))
        .alias("text"),
    )


def q_line_dedup(spark, sf_dir):
    """C4-style line-level boilerplate removal: drop every line occurring
    ≥3 times corpus-wide or shorter than 4 words, reassemble the
    survivors in order (~194 line occurrences sit in ≥3 groups at
    sf0.01, so the rules genuinely fire).
    Library: operators/curation.py:line_dedup."""
    from ..operators.curation import line_dedup

    return line_dedup(_structured_line_docs(spark, sf_dir),
                      min_count=3, min_words=4)


def q_stream_line_dedup(spark, sf_dir):
    """Ingest-time C4 line dedup as a foreachBatch stream
    (streaming/incremental.py:stream_line_dedup): the corpus
    (doc_id % 13 != 0) is line-counted ONCE into static persisted
    frequent-line state; new documents (doc_id % 13 == 0) stream in and
    are scrubbed of corpus boilerplate per micro-batch with one
    anti-join. Frequency is judged on the CORPUS alone, so the result is
    batching-invariant and the FULL-plan oracle replicates the split:
    corpus-side frequency CTE, delta-side scrub + ordered reassembly."""
    from ..streaming.incremental import _tmp_sink_dir, stream_line_dedup

    structured = _structured_line_docs(spark, sf_dir)
    corpus = structured.where(F.col("doc_id") % 13 != 0)
    delta = structured.where(F.col("doc_id") % 13 == 0).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length("text").cast("long").alias("n_chars"))
    d = _tmp_sink_dir("inc_lineq_")  # atexit-cleaned, like the stream sinks
    delta.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_line_dedup(spark, d, corpus, min_count=3, min_words=4,
                             timeout_s=240)


ORACLE_LINE_DEDUP = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), structured AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           array_to_string(list_transform(
             generate_series(1, CAST(ceil(len(toks) / {LINE_WORDS}.0) AS INT)),
             i -> array_to_string(
               list_slice(toks, (i - 1) * {LINE_WORDS} + 1,
                          i * {LINE_WORDS}), ' ')), chr(10))
         ELSE '' END AS text
  FROM t
), lines AS (
  SELECT doc_id, i - 1 AS pos, ls[i] AS ln
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls,
               unnest(generate_series(1, len(string_split(text, chr(10)))))
                 AS i
        FROM structured)
), freq AS (
  SELECT ln FROM lines GROUP BY ln HAVING COUNT(*) >= 3
), kept AS (
  SELECT l.doc_id, l.pos, l.ln
  FROM lines l ANTI JOIN freq f ON l.ln = f.ln
  WHERE len(list_filter(string_split_regex(l.ln, '\s+'), x -> x <> '')) >= 4
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(ln ORDER BY pos), chr(10)) AS text_clean
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id
)
SELECT t.doc_id, t.n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(r.text_clean, '') AS text_clean
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


ORACLE_STREAM_LINE_DEDUP = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), structured AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           array_to_string(list_transform(
             generate_series(1, CAST(ceil(len(toks) / {LINE_WORDS}.0) AS INT)),
             i -> array_to_string(
               list_slice(toks, (i - 1) * {LINE_WORDS} + 1,
                          i * {LINE_WORDS}), ' ')), chr(10))
         ELSE '' END AS text
  FROM t
), lines AS (
  SELECT doc_id, i - 1 AS pos, ls[i] AS ln
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls,
               unnest(generate_series(1, len(string_split(text, chr(10)))))
                 AS i
        FROM structured)
), freq AS (
  SELECT ln FROM lines WHERE doc_id % 13 <> 0
  GROUP BY ln HAVING COUNT(*) >= 3
), delta AS (
  SELECT * FROM lines WHERE doc_id % 13 = 0
), kept AS (
  SELECT l.doc_id, l.pos, l.ln
  FROM delta l ANTI JOIN freq f ON l.ln = f.ln
  WHERE len(list_filter(string_split_regex(l.ln, '\s+'), x -> x <> '')) >= 4
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(ln ORDER BY pos), chr(10)) AS text_clean
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, COUNT(*) AS n_lines FROM delta GROUP BY doc_id
)
SELECT t.doc_id, t.n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(r.text_clean, '') AS text_clean
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


BPE_MERGES = 8


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training: learn 8 merges over the corpus
    — ONE corpus pass to the word-frequency table, then per-merge
    aggregations over that small table with the winner collected as
    driver state (tokenizer induction, the Sennrich '16 algorithm
    distributed). The oracle replays the ENTIRE iterative loop in SQL:
    8 chained CTE groups, each counting weighted adjacent pairs, picking
    the (count DESC, left ASC, right ASC) argmax, and re-segmenting via a
    gaps-and-islands formulation of the same greedy left-to-right
    non-overlapping scan the Spark fold implements.
    Library: operators/tokenizer.py:bpe_train."""
    from ..operators.tokenizer import bpe_train

    return bpe_train(_t_wide(spark, sf_dir, "documents"),
                     n_merges=BPE_MERGES)


def q_bpe_segment(spark, sf_dir):
    """Apply the freshly-trained BPE vocabulary back to the corpus:
    per-source (n_words, n_bpe_tokens, avg_tokens_per_word) via the
    dictionary-encode join (explode words ⋈ final word→|segmentation|
    table) — the scale-correct encode, never a per-doc merge-loop replay.
    Verifies the final segmentation STATE of training (q_bpe_train
    verifies the winners). Library: operators/tokenizer.py:bpe_token_stats."""
    from ..operators.tokenizer import bpe_token_stats

    return bpe_token_stats(_t_wide(spark, sf_dir, "documents"),
                           n_merges=BPE_MERGES)


def _oracle_bpe(n_merges: int, mode: str) -> str:
    """Generated DuckDB replica of the full BPE training loop.

    Iteration k: pc{{k}} counts adjacent symbol pairs weighted by word
    frequency; win{{k}} is the deterministic argmax; pos/run/sel{{k}}
    implement the greedy non-overlapping merge scan as gaps-and-islands
    (consecutive matched positions — only possible when left==right —
    alternate merge/skip, i.e. odd offsets within each run merge);
    seq{{k}} drops absorbed positions and rebuilds the list in order.
    ``mode``: "train" emits the merge table, "segment" joins the final
    segmentation back to the corpus words per source."""
    parts = [r"""
WITH w AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc FROM (
    SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                 '\s+'),
                  x -> x <> '')) AS word FROM documents)
  GROUP BY word
), seq0 AS MATERIALIZED (
  SELECT word, wc,
         list_transform(generate_series(1, length(word)),
                        i -> substring(word, i, 1)) AS seq
  FROM w
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f""",
pc{k} AS (
  SELECT l, r, SUM(wc) AS n FROM (
    SELECT wc, seq[i] AS l, seq[i + 1] AS r
    FROM (SELECT wc, seq, unnest(generate_series(1, len(seq) - 1)) AS i
          FROM seq{p} WHERE len(seq) >= 2)
  ) GROUP BY l, r
),
win{k} AS MATERIALIZED (
  SELECT l, r, l || r AS m, n FROM pc{k}
  ORDER BY n DESC, l ASC, r ASC LIMIT 1
),
pos{k} AS (
  SELECT word, wc, i, seq[i] AS sym,
         coalesce(i < len(seq) AND seq[i] = (SELECT l FROM win{k})
                  AND seq[i + 1] = (SELECT r FROM win{k}), FALSE) AS mt
  FROM (SELECT word, wc, seq, unnest(generate_series(1, len(seq))) AS i
        FROM seq{p})
),
run{k} AS (
  SELECT *, i - row_number() OVER (PARTITION BY word, mt ORDER BY i) AS grp
  FROM pos{k}
),
sel{k} AS (
  SELECT word, wc, i, sym,
         mt AND (row_number() OVER (PARTITION BY word, mt, grp ORDER BY i)
                 % 2 = 1) AS mh
  FROM run{k}
),
seq{k} AS MATERIALIZED (
  SELECT word, wc, list(osym ORDER BY i) AS seq FROM (
    SELECT word, wc, i,
           CASE WHEN mh THEN (SELECT m FROM win{k}) ELSE sym END AS osym,
           lag(mh, 1, FALSE) OVER (PARTITION BY word ORDER BY i) AS absorbed
    FROM sel{k})
  WHERE NOT absorbed GROUP BY word, wc
)""")
    if mode == "train":
        union = " UNION ALL ".join(
            f"SELECT {k} AS rank, l AS lft, r AS rgt, m AS merged, "
            f"n AS pair_count FROM win{k}"
            for k in range(1, n_merges + 1)
        )
        parts.append(f"""
SELECT CAST(rank AS INTEGER) AS rank, lft, rgt, merged,
       CAST(pair_count AS BIGINT) AS pair_count
FROM ({union})
""")
    else:
        parts.append(rf"""
SELECT d.source, COUNT(*) AS n_words,
       CAST(SUM(len(s.seq)) AS BIGINT) AS n_bpe_tokens,
       round(AVG(len(s.seq)), 6) AS avg_tokens_per_word
FROM (SELECT source,
             unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                   '\s+'),
                    x -> x <> '')) AS word
      FROM documents) d
JOIN seq{n_merges} s USING (word)
GROUP BY d.source
""")
    return "".join(parts)


# =============================================================================
# DSIR importance resampling (Xie et al. 2023) + quality-aware dedup keeper
# =============================================================================

from ..operators.selection import DSIR_SEED  # noqa: E402  (oracle literal)

DSIR_TARGET_SOURCES = ("src0", "src1")  # stand-in "quality" target corpus
DSIR_K = 120
DSIR_N_BUCKETS = 256


def _dsir_target(docs):
    return docs.where(F.col("source").isin(*DSIR_TARGET_SOURCES))


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    bucket models of the TARGET (sources src0/src1 — the stand-in
    quality corpus) and the RAW corpus, add-one smoothing, per-document
    exact-integer log-importance weights (6dp micro-int bucket ratios,
    so the dot product is order-free), then Gumbel-top-k sampling with
    md5-derived uniforms — sampling-without-replacement proportional to
    the importance weights, yet bit-reproducible in SQL. The corpus is
    touched once for its n-gram instances; the fitted model is a
    256-row broadcast table; the top-k is a sort+limit, never a global
    window over the corpus.
    Library: operators/selection.py:dsir_select."""
    from ..operators.selection import dsir_select

    docs = _t_wide(spark, sf_dir, "documents")
    return dsir_select(docs, _dsir_target(docs), k=DSIR_K,
                       n_buckets=DSIR_N_BUCKETS, method="gumbel")


def q_stream_dsir(spark, sf_dir):
    """Ingest-time DSIR admission as a foreachBatch stream
    (streaming/incremental.py:stream_dsir_select): the 256-row
    log-ratio model is fitted ONCE on the existing corpus + target and
    broadcast into every micro-batch; newly landed documents are
    admitted iff their exact-integer importance weight clears the
    pinned threshold (the batching-invariant analog of the batch
    top-k, whose global rank cannot be computed per-batch). Weight is a
    pure function of (document, static table), so the row carries a
    full-plan batch oracle."""
    from ..operators.selection import dsir_log_ratio
    from ..streaming.incremental import _tmp_sink_dir, stream_dsir_select

    docs = _t_wide(spark, sf_dir, "documents")
    lr = dsir_log_ratio(docs, _dsir_target(docs),
                        n_buckets=DSIR_N_BUCKETS)
    d = _tmp_sink_dir("inc_dsirq_")  # atexit-cleaned
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    return stream_dsir_select(spark, d, lr, threshold_micro=0,
                              timeout_s=240)


def _oracle_dsir_weights() -> str:
    b = DSIR_N_BUCKETS
    t_src = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    return rf"""
WITH words AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest(toks || CASE WHEN len(toks) >= 2
                             THEN list_transform(
                                    generate_series(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i + 1])
                             ELSE [] END) AS gram
  FROM words
), binst AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || substring(md5(gram), 1, 8)) AS BIGINT)
              % {b} AS INT) AS bucket
  FROM grams
), t_counts AS (
  SELECT bucket, COUNT(*) AS t_cnt FROM binst
  WHERE source IN ({t_src}) GROUP BY 1
), r_counts AS (
  SELECT bucket, COUNT(*) AS r_cnt FROM binst GROUP BY 1
), ratio AS (
  SELECT s.bucket,
         CAST(round(round(
           ln((coalesce(t.t_cnt, 0) + 1.0)
              / ((SELECT coalesce(SUM(t_cnt), 0) FROM t_counts) + {b}.0))
           - ln((coalesce(r.r_cnt, 0) + 1.0)
              / ((SELECT coalesce(SUM(r_cnt), 0) FROM r_counts) + {b}.0)),
           6) * 1000000) AS BIGINT) AS ratio_micro
  FROM (SELECT unnest(generate_series(0, {b - 1})) AS bucket) s
  LEFT JOIN t_counts t USING (bucket)
  LEFT JOIN r_counts r USING (bucket)
), weights AS (
  SELECT d.doc_id, coalesce(w.w, 0) AS weight_micro
  FROM documents d LEFT JOIN (
    SELECT bi.doc_id, SUM(rt.ratio_micro) AS w
    FROM binst bi JOIN ratio rt USING (bucket) GROUP BY 1) w
  ON d.doc_id = w.doc_id
)"""


ORACLE_DSIR_SELECT = rf"""{_oracle_dsir_weights()}
SELECT doc_id, weight_micro, score_micro, rank FROM (
  SELECT doc_id, weight_micro, score_micro,
         CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
              AS INT) AS rank
  FROM (SELECT doc_id, weight_micro,
               weight_micro + CAST(round(round(
                 -ln(-ln((CAST(('0x' || substring(
                       md5('{DSIR_SEED}:' || CAST(doc_id AS VARCHAR)),
                       1, 8)) AS BIGINT) + 0.5) / 4294967296.0)),
                 6) * 1000000) AS BIGINT) AS score_micro
        FROM weights))
WHERE rank <= {DSIR_K}
"""


ORACLE_STREAM_DSIR = rf"""{_oracle_dsir_weights()}
SELECT doc_id, weight_micro, weight_micro > 0 AS keep FROM weights
"""


def q_dedup_quality_keeper(spark, sf_dir):
    """Fuzzy dedup with a QUALITY-AWARE keeper: identical LSH →
    exact-Jaccard → transitive-closure groups as dedup_canonical, but
    each dup group keeps its LONGEST document (chars; ties → min id)
    instead of the arbitrary min-id — what production pipelines run once
    a quality signal exists (drop the shards, keep the full page). One
    extra id-keyed quality join + a top-1-per-group window
    (WindowGroupLimit over edge-bounded groups).
    Library: operators/dedup.py:fuzzy_dedup_quality_keeper."""
    from ..operators.dedup import fuzzy_dedup_quality_keeper

    docs = _t_wide(spark, sf_dir, "documents")
    out = fuzzy_dedup_quality_keeper(docs, "doc_id", "text", k=3,
                                     n_bands=4, threshold=0.7,
                                     stop_threshold=LSH_STOP)
    res = out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("dup_group").cast("bigint").alias("dup_group"),
        F.col("quality").cast("bigint").alias("quality"),
        "is_keeper",
    )
    res._erps_persisted = list(getattr(out, "_erps_persisted", None) or [])
    return res


def _oracle_dedup_quality_keeper(n_bands: int = 4,
                                 threshold: float = 0.7) -> str:
    # same verified-edge closure as ORACLE_DEDUP_CANONICAL (group ids are
    # lexicographic minima — ids travel as strings); only the keeper rule
    # changes: top-1 per group by (char length DESC, string id ASC)
    jacc_sql = _oracle_ngram_jaccard(n_bands)
    return f"""
WITH RECURSIVE ver AS (SELECT id_a, id_b FROM ({jacc_sql}) WHERE jaccard >= {threshold}),
e AS (SELECT id_a AS src, id_b AS dst FROM ver
      UNION SELECT id_b, id_a FROM ver),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src
  WHERE r.a <> e2.dst
), comp AS (
  SELECT a AS doc_id,
         MIN(least(CAST(a AS VARCHAR), CAST(b AS VARCHAR))) AS comp_str
  FROM reach GROUP BY a
), lab AS (
  SELECT d.doc_id,
         coalesce(c.comp_str, CAST(d.doc_id AS VARCHAR)) AS grp,
         CAST(length(coalesce(d.text, '')) AS BIGINT) AS quality
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT doc_id, CAST(grp AS BIGINT) AS dup_group, quality,
       row_number() OVER (PARTITION BY grp
         ORDER BY quality DESC, CAST(doc_id AS VARCHAR) ASC) = 1
         AS is_keeper
FROM lab
"""


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4):
    corpus-bigram-LM perplexity terciles per source — head = cleanest
    third. Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`), rounded 6dp, broadcast back as 2 cuts per
    group; unscorable docs land in tail.
    Library: operators/curation.py:ccnet_quality_buckets."""
    from ..operators.curation import ccnet_quality_buckets

    return ccnet_quality_buckets(_t_wide(spark, sf_dir, "documents"))


ORACLE_CCNET_BUCKETS = f"""
WITH ppl AS ({ORACLE_DOCS_LM_PERPLEXITY}),
j AS (
  SELECT p.doc_id, d.source, p.perplexity
  FROM ppl p JOIN documents d USING (doc_id)
), cuts AS (
  SELECT source,
         round(quantile_cont(perplexity, {1 / 3!r}), 6) AS p33,
         round(quantile_cont(perplexity, {2 / 3!r}), 6) AS p66
  FROM j WHERE perplexity IS NOT NULL GROUP BY source
)
SELECT j.doc_id, j.source, j.perplexity,
       CASE WHEN j.perplexity IS NULL THEN 'tail'
            WHEN j.perplexity <= c.p33 THEN 'head'
            WHEN j.perplexity <= c.p66 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM j LEFT JOIN cuts c USING (source)
"""


CBS_CELLS = 16
CBS_PER_CELL = 12


def q_cluster_balanced_sample(spark, sf_dir):
    """Topic-balanced corpus pruning (Sorscher et al. 2022 / D4 shape):
    the deterministic IVF quantizer clusters every embedding (driver-
    state centroid literals, one narrow assignment pass), then each
    cluster keeps ≤ 12 members by a seeded md5 draw — majority topics
    can't dominate the mix, and the sampled survivors are
    bit-reproducible in SQL. The per-cell rank is a WindowGroupLimit
    (kept rows only), never a full per-cell sort.
    Library: operators/selection.py:cluster_balanced_sample."""
    from ..operators.selection import cluster_balanced_sample

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(emb, n_cells=CBS_CELLS,
                                   per_cell=CBS_PER_CELL)


def _oracle_cluster_balanced_sample() -> str:
    cos_ac = _IVF_COS.format(a="v.e", b="cn.c")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT CAST(row_number() OVER (ORDER BY _h) AS INT) AS cell_id, e AS c
  FROM (SELECT e, md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
        FROM v ORDER BY _h LIMIT {CBS_CELLS})
), asg AS (
  SELECT v.vec_id, cn.cell_id,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {cos_ac} DESC, cn.cell_id ASC) AS rn
  FROM v CROSS JOIN cent cn
), cells AS (
  SELECT vec_id, cell_id FROM asg WHERE rn = 1
)
SELECT vec_id, cell_id, cell_rank FROM (
  SELECT vec_id, cell_id,
         CAST(row_number() OVER (PARTITION BY cell_id
           ORDER BY md5(CAST(vec_id AS VARCHAR) || ':7') ASC,
                    vec_id ASC) AS INT) AS cell_rank
  FROM cells)
WHERE cell_rank <= {CBS_PER_CELL}
"""


QUERIES = {
    # ORDER = driver-record priority (the driver record caps at 50 rows).
    # Round-5 window policy (round-4 verdict ask #8 + advisor): the first
    # 50 entries hold (a) the flagship + the stateful/corpus-state streams,
    # (b) every round-5 row, (c) the three round-4 regressions now fixed
    # (docs_winnow / quality_filter / docs_hash_embed), and (d) FOUR rows
    # ROTATED BACK IN that were absent from round 4's window so legacy
    # operators periodically re-earn driver-green (dedup_exact,
    # dedup_minhash_sigs, dedup_simhash — r1 rows living on local records
    # since r3 — plus bm25_topk, whose batch plan was never driver-checked).
    # Six delta-probes-static streams rotate OUT to make room: each is
    # batching-invariant by construction, was driver-green in r04, and
    # shares its oracle with a batch row that STAYS in the window
    # (stream_decontaminate/decontaminate, stream_fuzzy_decontaminate/
    # fuzzy_decontaminate, stream_line_dedup/line_dedup,
    # stream_strip_spans/remove_dup_spans, stream_vocab/vocab_topk,
    # stream_bm25/bm25_topk).
    # (stream_ann also rotates out — r04-green, oracle shared with the
    # multi-round-proven ann_ivf — making room for semantic_dedup_cc's
    # first driver check)
    # (stream_semantic_dedup also rotates out — r04-driver-green with a
    # full-plan oracle — for the brand-new stream_strip_long_repeats)
    # (late round-5 additions: dsir_select / stream_dsir /
    # dedup_quality_keeper enter the window; corpus_sample + corpus_split
    # rotate out — r04-driver-green, machinery shared with the staying
    # corpus_mix_temperature — and sketch_source_overlap rotates out —
    # r04-driver-green, KMV machinery shared with the staying
    # sketch_distinct)
    # (final round-5 additions: url_blocklist / domain_pagerank /
    # sketch_hll enter the window; rotating out vocab_topk — green
    # r01-r04, TakeOrdered plan pytest-pinned, corpus word table also
    # exercised by the staying bpe_train — dedup_containment — r04-green,
    # same shingle-join contract as the staying dedup_ngram_jaccard — and
    # dedup_winnow_pairs — r04-green, winnow fingerprints still
    # driver-checked via the staying docs_winnow)
    # (domain_harmonic + domain_triangles + domain_trustrank enter last;
    # pack_sequences, docs_chunk and corpus_length_stats rotate out — all
    # r04-driver-green: the chunk fan-out + shard-window machinery stays
    # exercised inside the staying training_corpus capstone, pack's
    # window plan shape is pytest-pinned, and descriptive stats remain
    # driver-checked via the staying docs_token_stats)
    # (domain_prior — the graph-layer capstone — enters last;
    # docs_lm_perplexity rotates out: r04-driver-green, the LM scoring
    # plan stays driver-checked inside the staying
    # curation_gate_extended's perplexity cap)
    "er_pipeline_clusters": q_er_pipeline_clusters,
    "stream_sessionize": q_stream_sessionize,
    "incremental_near_dup": q_incremental_near_dup,
    "stream_curation": q_stream_curation,
    "stream_strip_long_repeats": q_stream_strip_long_repeats,
    "stream_quality_filter": q_stream_quality_filter,
    # training-data curation family (capstone first)
    "training_corpus": q_training_corpus,
    "training_corpus_full": q_training_corpus_full,
    "corpus_curation": q_corpus_curation,
    "curation_gate": q_curation_gate,
    "remove_dup_spans": q_remove_dup_spans,
    "remove_long_repeats": q_remove_long_repeats,
    "curation_gate_multilang": q_curation_gate_multilang,
    "curation_gate_extended": q_curation_gate_extended,
    "docs_token_stats": q_docs_token_stats,
    "docs_winnow": q_docs_winnow,
    "docs_dup_span": q_docs_dup_span,
    "docs_tfidf": q_docs_tfidf,
    "domain_stats": q_domain_stats,
    "url_blocklist": q_url_blocklist,
    "domain_pagerank": q_domain_pagerank,
    "domain_harmonic": q_domain_harmonic,
    "domain_triangles": q_domain_triangles,
    "domain_trustrank": q_domain_trustrank,
    "domain_prior": q_domain_prior,
    "corpus_mix_temperature": q_corpus_mix_temperature,
    "dsir_select": q_dsir_select,
    "stream_dsir": q_stream_dsir,
    "decontaminate": q_decontaminate,
    "fuzzy_decontaminate": q_fuzzy_decontaminate,
    "line_dedup": q_line_dedup,
    "corpus_diff": q_corpus_diff,
    "quality_filter": q_quality_filter,
    # deterministic KMV sketches (distinct estimate + overlap matrix)
    "docs_hash_embed": q_docs_hash_embed,
    "sketch_distinct": q_sketch_distinct,
    "sketch_hll": q_sketch_hll,
    # tokenizer induction (distributed BPE + unigram-LM)
    "bpe_train": q_bpe_train,
    "bpe_segment": q_bpe_segment,
    "unigram_train": q_unigram_train,
    "unigram_segment": q_unigram_segment,
    # dedup (first three rotated back into the window this round)
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_sigs": q_dedup_minhash_sigs,
    "dedup_simhash": q_dedup_simhash,
    "dedup_lsh_pairs": q_dedup_lsh_pairs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_canonical": q_dedup_canonical,
    "dedup_quality_keeper": q_dedup_quality_keeper,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_cc": q_semantic_dedup_cc,
    # retrieval (batch BM25's first driver check) — window ends here
    "bm25_topk": q_bm25_topk,
    # --- driver-record window boundary is ~here (first 50 entries) ---
    "docs_lm_perplexity": q_docs_lm_perplexity,
    "corpus_length_stats": q_corpus_length_stats,
    "docs_chunk": q_docs_chunk,
    "pack_sequences": q_pack_sequences,
    "vocab_topk": q_vocab_topk,
    "dedup_containment": q_dedup_containment,
    "dedup_winnow_pairs": q_dedup_winnow_pairs,
    # ---- tail: rows a 50-row budget clips ----
    # rotated out for the late round-5 rows (see header note)
    "corpus_sample": q_corpus_sample,
    "corpus_split": q_corpus_split,
    "sketch_source_overlap": q_sketch_source_overlap,
    # late round-5 tail rows (machinery driver-checked via in-window kin:
    # IVF assignment via ann_ivf / semantic_dedup, the bigram LM via
    # docs_lm_perplexity)
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "ccnet_buckets": q_ccnet_buckets,
    # delta-probes-static streams rotated out this round (see header note)
    "stream_ann": q_stream_ann,
    "stream_semantic_dedup": q_stream_semantic_dedup,
    "stream_decontaminate": q_stream_decontaminate,
    "stream_fuzzy_decontaminate": q_stream_fuzzy_decontaminate,
    "stream_line_dedup": q_stream_line_dedup,
    "stream_strip_spans": q_stream_strip_spans,
    "stream_vocab": q_stream_vocab,
    "stream_sketch_hll": q_stream_sketch_hll,
    "stream_pagerank": q_stream_pagerank,
    "stream_bm25": q_stream_bm25,
    # embeddings (driver-green r03/r04 + every committed local record)
    "ann_sq": q_ann_sq,
    "ann_ivf_sq": q_ann_ivf_sq,
    "ann_ivf_pq": q_ann_ivf_pq,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "ann_pq": q_ann_pq,
    "hybrid_rrf": q_hybrid_rrf,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_srp": q_embedding_near_dup_srp,
    "embedding_centroids": q_embedding_centroids,
    # graph
    "connected_components": q_connected_components,
    # multimodal (incl. real decoders)
    "media_stats": q_media_stats,
    "media_decode": q_media_decode,
    "media_frames": q_media_frames,
    "media_ppm_decode": q_media_ppm_decode,
    "media_wav_decode": q_media_wav_decode,
    "media_ppm_resize": q_media_ppm_resize,
    # text analysis + webtext curation signals
    "docs_normalize": q_docs_normalize,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_lang_id": q_docs_lang_id,
    "docs_quality": q_docs_quality,
    "docs_stats_by_source": q_docs_stats_by_source,
    "docs_repetition": q_docs_repetition,
    "docs_pii_redact": q_docs_pii_redact,
    "url_canonicalize": q_url_canonicalize,
    # similarity + decisioning operators (F1/F2, D1/D3/D5, D2/D4)
    "jaro_winkler": q_jaro_winkler,
    "decisioning_queue": q_decisioning_queue,
    "match_type_evidence": q_match_type_evidence,
    # geo / dates / alias / labeling
    "geo_parse": q_geo_parse,
    "geo_pair_features": q_geo_pair_features,
    "flexible_dates": q_flexible_dates,
    "alias_rebrand": q_alias_rebrand,
    "weak_supervision": q_weak_supervision,
    "wilson_tier_precision": q_wilson_tier_precision,
    "url_domains": q_url_domains,
    # corporate-family operators (G1/G2/J9) + temporal/guardrails
    "family_structure": q_family_structure,
    "family_features": q_family_features,
    "family_expand": q_family_expand,
    "family_aggregates": q_family_aggregates,
    "year_compat": q_year_compat,
    "investor_guardrails": q_investor_guardrails,
    # legal-name processing (P4/P20)
    "legal_suffix_strip": q_legal_suffix_strip,
    "prose_legal_name": q_prose_legal_name,
    # structured streaming (watermarked window agg)
    "stream_windowed_counts": q_stream_windowed_counts,
    # relational battery (TPC-H-ish tail; green in every committed
    # full-battery local record)
    "tpch_q1": q_tpch_q1,
    "revenue_by_region": q_revenue_by_region,
    "top3_orders_per_customer": q_top3_orders_per_customer,
    "customer_order_profile": q_customer_order_profile,
    "customers_without_orders": q_customers_without_orders,
    "parts_multi_supplier": q_parts_multi_supplier,
    "rollup_orders": q_rollup_orders,
    "running_revenue": q_running_revenue,
    "order_year_quarter": q_order_year_quarter,
    "priority_except": q_priority_except,
    "top1_with_alternatives": q_top1_with_alternatives,
    "events_ffill": q_events_ffill,
    "events_sessionize": q_events_sessionize,
    "events_json": q_events_json,
    "events_type_stats": q_events_type_stats,
}

ORACLE_SQL = {
    "tpch_q1": ORACLE_TPCH_Q1,
    "revenue_by_region": ORACLE_REVENUE_BY_REGION,
    "top3_orders_per_customer": ORACLE_TOP3_ORDERS,
    "customer_order_profile": ORACLE_CUSTOMER_ORDER_PROFILE,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "parts_multi_supplier": ORACLE_PARTS_MULTI_SUPPLIER,
    "rollup_orders": ORACLE_ROLLUP_ORDERS,
    "running_revenue": ORACLE_RUNNING_REVENUE,
    "order_year_quarter": ORACLE_ORDER_YEAR_QUARTER,
    "priority_except": ORACLE_PRIORITY_EXCEPT,
    "events_ffill": ORACLE_EVENTS_FFILL,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_json": ORACLE_EVENTS_JSON,
    "events_type_stats": ORACLE_EVENTS_TYPE_STATS,
    "docs_normalize": ORACLE_DOCS_NORMALIZE,
    "docs_fingerprint": ORACLE_DOCS_FINGERPRINT,
    "docs_lang_id": _oracle_lang_id(),
    "docs_quality": ORACLE_DOCS_QUALITY,
    "docs_stats_by_source": ORACLE_DOCS_STATS,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_sigs": _oracle_minhash_sigs(4),
    "dedup_lsh_pairs": _oracle_lsh_pairs(4),
    "dedup_ngram_jaccard": _oracle_ngram_jaccard(4),
    "dedup_containment": _oracle_dedup_containment(4),
    "dedup_winnow_pairs": _oracle_dedup_winnow_pairs(),
    "dedup_simhash": _oracle_simhash(32),
    "dedup_canonical": _oracle_dedup_canonical(4, 0.7),
    "dedup_quality_keeper": _oracle_dedup_quality_keeper(4, 0.7),
    "dsir_select": ORACLE_DSIR_SELECT,
    "stream_dsir": ORACLE_STREAM_DSIR,
    "cluster_balanced_sample": _oracle_cluster_balanced_sample(),
    "ccnet_buckets": ORACLE_CCNET_BUCKETS,
    "corpus_curation": _oracle_corpus_curation(),
    "ann_topk": ORACLE_ANN_TOPK,
    "ann_ivf": _oracle_ann_ivf(),
    "ann_pq": ORACLE_ANN_PQ,
    "ann_ivf_pq": _oracle_ann_ivf_pq(),
    "ann_sq": _oracle_ann_sq(),
    "ann_ivf_sq": _oracle_ann_ivf_sq(),
    "bm25_topk": ORACLE_BM25_TOPK,
    "hybrid_rrf": ORACLE_HYBRID_RRF,
    "corpus_mix_temperature": ORACLE_CORPUS_MIX,
    "corpus_split": ORACLE_CORPUS_SPLIT,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "embedding_near_dup_srp": _oracle_embedding_near_dup_srp(),
    "embedding_centroids": ORACLE_EMBEDDING_CENTROIDS,
    "connected_components": ORACLE_CONNECTED_COMPONENTS,
    "media_stats": ORACLE_MEDIA_STATS,
    "media_decode": ORACLE_MEDIA_DECODE,
    "media_frames": ORACLE_MEDIA_FRAMES,
    "geo_parse": _oracle_geo_parse(),
    "geo_pair_features": _oracle_geo_pair_features(),
    "flexible_dates": ORACLE_FLEXIBLE_DATES,
    "alias_rebrand": _oracle_alias_rebrand(),
    "weak_supervision": ORACLE_WEAK_SUPERVISION,
    "wilson_tier_precision": ORACLE_WILSON_TIERS,
    "top1_with_alternatives": ORACLE_TOP1_ALTERNATIVES,
    "url_domains": ORACLE_URL_DOMAINS,
    "family_aggregates": ORACLE_FAMILY_AGGREGATES,
    "year_compat": ORACLE_YEAR_COMPAT,
    "investor_guardrails": ORACLE_INVESTOR_GUARDRAILS,
    "family_structure": ORACLE_FAMILY_STRUCTURE,
    "family_features": ORACLE_FAMILY_FEATURES,
    "family_expand": ORACLE_FAMILY_EXPAND,
    "legal_suffix_strip": _oracle_legal_suffix_strip(),
    "prose_legal_name": _oracle_prose_legal_name(),
    "jaro_winkler": ORACLE_JARO_WINKLER,
    "decisioning_queue": ORACLE_DECISIONING_QUEUE,
    "match_type_evidence": ORACLE_MATCH_TYPE_EVIDENCE,
    "docs_repetition": ORACLE_DOCS_REPETITION,
    "docs_pii_redact": ORACLE_DOCS_PII_REDACT,
    "url_canonicalize": ORACLE_URL_CANONICALIZE,
    "curation_gate": _oracle_curation_gate(),
    "remove_dup_spans": ORACLE_REMOVE_DUP_SPANS,
    "remove_long_repeats": _oracle_remove_long_repeats(),
    "stream_strip_long_repeats": _oracle_stream_strip_long_repeats(),
    "curation_gate_multilang": _oracle_curation_gate_multilang(),
    "curation_gate_extended": _oracle_curation_gate_extended(),
    "docs_token_stats": ORACLE_DOCS_TOKEN_STATS,
    "docs_winnow": ORACLE_DOCS_WINNOW,
    "docs_chunk": ORACLE_DOCS_CHUNK,
    "corpus_sample": ORACLE_CORPUS_SAMPLE,
    "media_ppm_decode": ORACLE_MEDIA_PPM_DECODE,
    "media_wav_decode": ORACLE_MEDIA_WAV_DECODE,
    "media_ppm_resize": ORACLE_MEDIA_PPM_RESIZE,
    "decontaminate": ORACLE_DECONTAMINATE,
    "fuzzy_decontaminate": _oracle_fuzzy_decontaminate(4),
    "line_dedup": ORACLE_LINE_DEDUP,
    "corpus_diff": ORACLE_CORPUS_DIFF,
    "docs_hash_embed": ORACLE_DOCS_HASH_EMBED,
    "quality_filter": _oracle_quality_filter(),
    "sketch_distinct": ORACLE_SKETCH_DISTINCT,
    "sketch_hll": ORACLE_SKETCH_HLL,
    "sketch_source_overlap": ORACLE_SKETCH_OVERLAP,
    "semantic_dedup": _oracle_semantic_dedup(),
    "semantic_dedup_cc": _oracle_semantic_dedup_cc(),
    "bpe_train": _oracle_bpe(BPE_MERGES, "train"),
    "bpe_segment": _oracle_bpe(BPE_MERGES, "segment"),
    "unigram_train": _oracle_unigram(UNIGRAM_ITERS, "train"),
    "unigram_segment": _oracle_unigram(UNIGRAM_ITERS, "segment"),
    "training_corpus": _oracle_training_corpus(),
    "training_corpus_full": _oracle_training_corpus_full(),
    "corpus_length_stats": ORACLE_CORPUS_LENGTH_STATS,
    "vocab_topk": ORACLE_VOCAB_TOPK,
    "docs_lm_perplexity": ORACLE_DOCS_LM_PERPLEXITY,
    "docs_dup_span": ORACLE_DOCS_DUP_SPAN,
    "docs_tfidf": ORACLE_DOCS_TFIDF,
    "domain_stats": _oracle_domain_stats(),
    "url_blocklist": ORACLE_URL_BLOCKLIST,
    "domain_pagerank": ORACLE_DOMAIN_PAGERANK,
    "domain_harmonic": ORACLE_DOMAIN_HARMONIC,
    "domain_triangles": ORACLE_DOMAIN_TRIANGLES,
    "domain_trustrank": ORACLE_DOMAIN_TRUSTRANK,
    "domain_prior": ORACLE_DOMAIN_PRIOR,
    "pack_sequences": _oracle_pack_sequences(),
    "stream_windowed_counts": ORACLE_STREAM_WINDOWED_COUNTS,
    "stream_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "incremental_near_dup": _oracle_incremental_near_dup(),
    "stream_curation": _oracle_stream_curation(),
    "stream_decontaminate": ORACLE_DECONTAMINATE,
    "stream_ann": _oracle_ann_ivf(),
    "stream_vocab": ORACLE_STREAM_VOCAB,
    "stream_sketch_hll": ORACLE_SKETCH_HLL,
    "stream_pagerank": ORACLE_DOMAIN_PAGERANK,
    "stream_strip_spans": ORACLE_STREAM_STRIP_SPANS,
    "stream_bm25": ORACLE_BM25_TOPK,
    "stream_semantic_dedup": _oracle_stream_semantic_dedup(),
    "stream_line_dedup": ORACLE_STREAM_LINE_DEDUP,
    "stream_fuzzy_decontaminate": _oracle_fuzzy_decontaminate(4),
    "stream_quality_filter": _oracle_quality_filter(),
    "er_pipeline_clusters": ORACLE_ER_PIPELINE_CLUSTERS,
}
