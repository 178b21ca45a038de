"""Pairwise feature computation + match scoring (F1-F13, D1-D3).

Feature assembly is two left equi-joins of the candidate pairs against the
page-attribute table (reference: /root/reference/src/features.py:698-701);
the big side sort-merge-joins, dims broadcast. Features are native Column
expressions except Jaro-Winkler / token-sort-ratio, which run in the
similarity pandas UDF (sanctioned touchpoint #2). Lengthy strings are capped
before the O(n²) string metrics — the metric is computed on the fingerprint
head, which is what the reference effectively compares for long names.

Scoring paths:
  * heuristic: calibrated weighted blend (deterministic, model-free, used by
    the minimal slice and tests);
  * learned: ``pyspark.ml`` GBTClassifier trained on labeled pairs
    (north-star "broadcast gradient-boosted classifier" — spark.ml
    broadcasts the fitted ensemble to executors inside its transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.domains import etld1_col
from ..functions.geo import (
    city_similarity_col, country_match_col, parse_location_col,
)
from ..functions.normalize import fingerprint_col, prefix_col, tokens_col
from ..functions.similarity import (
    jaro_winkler_udf, levenshtein_ratio_col, token_jaccard_col,
    token_sort_ratio_udf,
)

FEATURE_COLS = [
    "token_jaccard", "jw_fingerprint", "lev_ratio_prefix",
    "domain_exact", "prefix_match", "size_ratio", "num_conflict",
]

# Extras riding along in compute_features for the learned scorer
# (train_gbt(feature_cols=EXTENDED_FEATURE_COLS)); none is in the calibrated
# heuristic blend:
#   acronym_match (F5), token_sort_ratio (F2, ref src/features.py:139-148),
#   country_match / city_similarity (F7, ref src/features.py:232-260 — 0.0
#   whenever the corpus carries no location column).
EXTENDED_FEATURE_COLS = [
    *FEATURE_COLS, "acronym_match", "token_sort_ratio",
    "country_match", "city_similarity",
]


TOKEN_SKETCH_K = 64


def page_attrs(pages: DataFrame, jw_cap: int = 48,
               sketch_k: int = TOKEN_SKETCH_K,
               location_col: str = "location") -> DataFrame:
    """Narrow per-page projection the scorer joins against (url, derived).

    Tokens are carried as a bottom-k sketch of sorted 60-bit hashes: the
    pair join shuffles these arrays for every candidate pair, and the
    per-pair Jaccard cost is O(|array|), so at web scale the array must be
    bounded. Keeping the k smallest hashes is the classic bottom-k MinHash
    sketch — Jaccard over two sketches is *exact* for documents with ≤ k
    distinct tokens (all test fixtures) and a consistent estimate above
    that; 60-bit md5 collisions are negligible and deterministic. The exact
    distinct-token count travels separately (``n_toks``) for size features.
    """
    toks = tokens_col(F.col("text_norm"), 2)
    # xxhash64: native, fixed spec, ~20× cheaper than md5 — pipeline-internal
    hashed = F.array_sort(F.array_distinct(
        F.transform(toks, lambda t: F.xxhash64(t))))
    from ..functions.normalize import acronym_col

    # digit-bearing tokens are high-information identifiers (ids, years,
    # street/phone numbers): their own bottom-k sketch feeds the
    # numeric-conflict feature — Jaro-Winkler famously scores "acme 305"
    # vs "acme 368" ≈ 0.91, and a disjoint-numerics penalty is the classic
    # counter (cf. the reference's year-compat step, src/features.py:267-299)
    num_hashed = F.array_sort(F.array_distinct(F.transform(
        F.filter(toks, lambda t: t.rlike("[0-9]")),
        lambda t: F.xxhash64(t))))

    # geo attrs (F7): parsed when the corpus carries a location column,
    # typed NULLs otherwise so downstream pair features are schema-stable
    if location_col in pages.columns:
        loc = parse_location_col(F.col(location_col))
        city = loc.getField("city")
        country = loc.getField("country_iso")
    else:
        city = F.lit(None).cast("string")
        country = F.lit(None).cast("string")

    return pages.select(
        "url",
        F.slice(hashed, 1, sketch_k).alias("toks"),
        F.size(hashed).alias("n_toks"),
        F.slice(num_hashed, 1, 32).alias("nums"),
        fingerprint_col(F.col("text_norm"), 2).alias("fp"),
        etld1_col(F.col("url")).alias("dom"),
        F.substring(acronym_col(F.col("text_norm")), 1, 16).alias("acro"),
        city.alias("city"),
        country.alias("country"),
    ).withColumn("fp_head", F.substring("fp", 1, jw_cap)) \
     .withColumn("p16", prefix_col(F.col("fp"), 16))  # order-invariant prefix


def compute_features(pairs: DataFrame, attrs: DataFrame) -> DataFrame:
    a = attrs.select(
        F.col("url").alias("_ua"),
        *[F.col(c).alias(f"{c}_a") for c in attrs.columns if c != "url"],
    )
    b = attrs.select(
        F.col("url").alias("_ub"),
        *[F.col(c).alias(f"{c}_b") for c in attrs.columns if c != "url"],
    )
    df = (
        pairs.join(a, F.col("url_a") == F.col("_ua"), "left").drop("_ua")
        .join(b, F.col("url_b") == F.col("_ub"), "left").drop("_ub")
    )
    sz_a = F.col("n_toks_a").cast("double")
    sz_b = F.col("n_toks_b").cast("double")
    return df.select(
        "url_a", "url_b",
        F.col("blocking_score"),
        token_jaccard_col(F.col("toks_a"), F.col("toks_b")).alias("token_jaccard"),
        jaro_winkler_udf(F.col("fp_head_a"), F.col("fp_head_b")).alias("jw_fingerprint"),
        levenshtein_ratio_col(F.col("p16_a"), F.col("p16_b")).alias("lev_ratio_prefix"),
        (F.col("dom_a") == F.col("dom_b")).cast("double").alias("domain_exact"),
        (F.col("p16_a") == F.col("p16_b")).cast("double").alias("prefix_match"),
        F.when(F.greatest(sz_a, sz_b) > 0,
               F.least(sz_a, sz_b) / F.greatest(sz_a, sz_b)
               ).otherwise(F.lit(0.0)).alias("size_ratio"),
        ((F.col("acro_a") == F.col("acro_b")) & (F.length("acro_a") >= 2))
        .cast("double").alias("acronym_match"),
        _num_conflict_col().alias("num_conflict"),
        token_sort_ratio_udf(F.col("fp_head_a"), F.col("fp_head_b"))
        .alias("token_sort_ratio"),
        country_match_col(F.col("country_a"), F.col("country_b"))
        .alias("country_match"),
        city_similarity_col(F.col("city_a"), F.col("city_b"))
        .alias("city_similarity"),
    )


def _num_conflict_col():
    """1.0 when both sides carry digit-bearing tokens and their sketches
    are disjoint — negative evidence (id/year/number mismatch). Bottom-k
    sketches make this conservative: a shared numeric token fires only if
    it ranks in both bottom-32s, so near-identical sets never conflict."""
    return F.when(
        (F.size("nums_a") > 0) & (F.size("nums_b") > 0)
        & (F.size(F.array_intersect("nums_a", "nums_b")) == 0),
        F.lit(1.0)).otherwise(F.lit(0.0))


def score_pairs_two_phase(pairs: DataFrame, attrs: DataFrame,
                          threshold: float = 0.45) -> DataFrame:
    """Two-phase scoring: native prescore for all pairs, Jaro-Winkler pUDF
    only for the borderline band (the reference reranks only borderline
    pairs the same way, /root/reference/src/reranking.py:42-117 mask :73).

    Decision-equivalent to full scoring at ``threshold``: the JW term is
    bounded in [0, JW_WEIGHT], so any pair whose prescore clears (or cannot
    reach) the threshold keeps its decision regardless of JW; only pairs
    inside the band are refined. At web scale this keeps ~90+% of pairs
    entirely JVM-side.

    CONTRACT: ``p_match`` here is valid ONLY for thresholding at
    ``threshold`` — cold-branch scores omit the JW term, so above-threshold
    values run systematically up to JW_WEIGHT low. Do NOT feed this output
    to :func:`assign_tiers` or rerank bands; use :func:`heuristic_score`
    (full features) or the GBT path for calibrated scores. The
    ``jw_fingerprint`` column carries the computed JW for warm-band pairs
    and NULL for cold ones, so downstream code can detect partial scoring
    (``apply_gbt`` refuses NULL features by construction).
    """
    a = attrs.select(
        F.col("url").alias("_ua"),
        *[F.col(c).alias(f"{c}_a") for c in attrs.columns if c != "url"],
    )
    b = attrs.select(
        F.col("url").alias("_ub"),
        *[F.col(c).alias(f"{c}_b") for c in attrs.columns if c != "url"],
    )
    df = (
        pairs.join(a, F.col("url_a") == F.col("_ua"), "left").drop("_ua")
        .join(b, F.col("url_b") == F.col("_ub"), "left").drop("_ub")
    )
    sz_a = F.col("n_toks_a").cast("double")
    sz_b = F.col("n_toks_b").cast("double")
    feat = df.select(
        "url_a", "url_b", "blocking_score", "fp_head_a", "fp_head_b",
        token_jaccard_col(F.col("toks_a"), F.col("toks_b")).alias("token_jaccard"),
        levenshtein_ratio_col(F.col("p16_a"), F.col("p16_b")).alias("lev_ratio_prefix"),
        (F.col("dom_a") == F.col("dom_b")).cast("double").alias("domain_exact"),
        (F.col("p16_a") == F.col("p16_b")).cast("double").alias("prefix_match"),
        F.when(F.greatest(sz_a, sz_b) > 0,
               F.least(sz_a, sz_b) / F.greatest(sz_a, sz_b)
               ).otherwise(F.lit(0.0)).alias("size_ratio"),
        _num_conflict_col().alias("num_conflict"),
        # pair-level geo features (F7): native expressions, constant-folded
        # to 0.0 when the corpus has no location column (NULL attrs)
        country_match_col(F.col("country_a"), F.col("country_b"))
        .alias("country_match"),
        city_similarity_col(F.col("city_a"), F.col("city_b"))
        .alias("city_similarity"),
    )
    base = (
        0.55 * F.col("token_jaccard")
        + 0.10 * F.col("lev_ratio_prefix")
        + 0.10 * F.col("prefix_match")
        + 0.05 * F.col("domain_exact")
        - NUM_CONFLICT_WEIGHT * F.col("num_conflict")
    )
    feat = feat.withColumn("p_base", base)
    # ONE pass, no persist/union: the JW pandas UDF receives NULLed inputs
    # for cold rows (outside the borderline band). Python UDFs in a `when`
    # branch are still extracted and evaluated batch-wide (ExtractPythonUDFs
    # cannot short-circuit), so the null-out is what keeps cold rows cheap:
    # fillna('') → the 0.0 fast path, and the Arrow transfer ships nulls.
    # The round-1 design split cold/warm into two scans over a persisted
    # intermediate — a full-frame cache write + double scan that dominated
    # the stage once features went native.
    lo, hi = threshold - JW_WEIGHT, threshold
    in_band = F.col("p_base").between(lo, hi)
    jw = jaro_winkler_udf(F.when(in_band, F.col("fp_head_a")),
                          F.when(in_band, F.col("fp_head_b")))
    # token_sort_ratio (F2) rides the same borderline-band discipline:
    # NULLed inputs outside the band keep cold rows on the UDF's '' fast
    # path, and both pandas UDFs evaluate in ONE ArrowEvalPython node (same
    # projection, no extra Arrow round-trip). It is informational for
    # downstream rerank/GBT consumers — NOT in the p_match blend, so the
    # two-phase decision contract is unchanged.
    tsr = token_sort_ratio_udf(F.when(in_band, F.col("fp_head_a")),
                               F.when(in_band, F.col("fp_head_b")))
    keep = ["url_a", "url_b", "blocking_score", "token_jaccard",
            "jw_fingerprint", "token_sort_ratio", "lev_ratio_prefix",
            "domain_exact", "prefix_match", "size_ratio", "num_conflict",
            "country_match", "city_similarity", "p_match"]
    return (
        feat.withColumn("jw_fingerprint", F.when(in_band, jw))
        .withColumn("token_sort_ratio", F.when(in_band, tsr))
        .withColumn(
            "p_match",
            F.round(F.col("p_base")
                    + F.coalesce(JW_WEIGHT * F.col("jw_fingerprint"),
                                 F.lit(0.0)), 6))
        .select(*keep)
    )


from contextlib import contextmanager


@contextmanager
def scoring_join_prefs(spark):
    """Scoring-path join tuning: prefer shuffled-hash over sort-merge while
    the scorer runs. Its two pair⋈attrs equi-joins build small per-partition
    hash maps from the attrs side and skip two full sorts of the
    multi-million-row pair side (+16% scoring throughput measured at 16
    cores, tools/score_probe.py). Scoped, not a session default: with the
    raised 64 MB broadcast threshold, SHJ also becomes eligible for the
    blocking stage's big self-join, where per-partition hash builds at low
    partition counts OOMed the full pipeline — SMJ stays the default for
    everything but scoring."""
    key = "spark.sql.join.preferSortMergeJoin"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def release_persisted(df: DataFrame) -> None:
    """Unpersist the intermediate cache(s) attached to a result DataFrame
    (``_erps_persisted``: a DataFrame or a list of them).

    Call after the result is materialized (written/collected): a long-lived
    driver session running many scorings/dedups would otherwise accumulate
    cached partitions until the ContextCleaner gets around to them.
    """
    cached = getattr(df, "_erps_persisted", None)
    if cached is None:
        return
    for c in (cached if isinstance(cached, (list, tuple)) else [cached]):
        if c is not None:
            c.unpersist()


JW_WEIGHT = 0.20
NUM_CONFLICT_WEIGHT = 0.08


def heuristic_score(features: DataFrame) -> DataFrame:
    """Deterministic calibrated blend — model-free scorer.

    Token-Jaccard dominates (it is reorder/diacritic-noise invariant under
    the canonical extractor); JW and prefix act as confirmations; domain
    equality is a weak prior (mirrors are common in web dup clusters);
    disjoint numeric tokens are negative evidence (JW alone scores
    digit-suffixed near-identical names ~0.9).
    """
    s = (
        0.55 * F.col("token_jaccard")
        + 0.20 * F.col("jw_fingerprint")
        + 0.10 * F.col("lev_ratio_prefix")
        + 0.10 * F.col("prefix_match")
        + 0.05 * F.col("domain_exact")
        - NUM_CONFLICT_WEIGHT * F.col("num_conflict")
    )
    return features.withColumn("p_match", F.round(s, 6))


def match_edges(scored: DataFrame, threshold: float = 0.45) -> DataFrame:
    return scored.where(F.col("p_match") >= threshold).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst"))


# ---- learned scorer (spark.ml GBT) -------------------------------------------


def train_gbt(train_features: DataFrame, label_col: str = "label", seed: int = 42,
              feature_cols: list[str] | None = None):
    """GBTClassifier over FEATURE_COLS; fitted model broadcasts JVM-side."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=feature_cols or FEATURE_COLS, outputCol="fvec")
    gbt = GBTClassifier(
        featuresCol="fvec", labelCol=label_col, maxIter=40, maxDepth=4, seed=seed,
    )
    data = asm.transform(train_features.withColumn(label_col, F.col(label_col).cast("double")))
    return asm, gbt.fit(data)


def apply_gbt(features: DataFrame, asm, model) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    out = model.transform(asm.transform(features))
    return out.withColumn(
        "p_match", F.round(vector_to_array("probability")[1], 6)
    ).drop("fvec", "rawPrediction", "probability", "prediction")


# ---- decisioning (D1-D3) ------------------------------------------------------

TIER_A, TIER_B, TIER_C = 0.98, 0.93, 0.75


def assign_tiers(scored: DataFrame, score_col: str = "p_match") -> DataFrame:
    """Nested when() tier column (reference thresholds,
    /root/reference/src/decisioning.py:30-91). ``score_col`` lets the
    decisioning stage tier on calibrated probabilities (``p_calibrated``) —
    tier thresholds are probability statements (see operators/modeling.py)."""
    p = F.col(score_col)
    return scored.withColumn(
        "tier",
        F.when(p >= TIER_A, "A").when(p >= TIER_B, "B")
         .when(p >= TIER_C, "C").otherwise("REJECT"),
    )


def flag_conflicts(matches: DataFrame) -> DataFrame:
    """Many-to-one detection via window count (D3,
    /root/reference/src/decisioning.py:198-216)."""
    from pyspark.sql import Window

    w = Window.partitionBy("url_b")
    return matches.withColumn("conflict", F.count("*").over(w) > 1)
