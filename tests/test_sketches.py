"""KMV bottom-k sketches: estimator error bounds vs exact values, the
fewer-than-k exact path, and merge/repartition determinism."""

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.functions.hashing import shingles_col
from entity_resolution_pipeline_spark.operators.sketches import (
    kmv_distinct, kmv_source_overlap,
)

SF = "/root/testdata/sf0.01"


def _items(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "source",
        F.explode(shingles_col(F.lower(F.col("text")), 3)).alias("shingle"))


def test_kmv_distinct_error_bound(spark):
    items = _items(spark)
    est = {r["source"]: r["n_est"]
           for r in kmv_distinct(items, "source", "shingle", k=64).collect()}
    exact = {r["source"]: r["n"]
             for r in items.groupBy("source")
             .agg(F.countDistinct("shingle").alias("n")).collect()}
    assert set(est) == set(exact)
    # KMV std error ~ 1/sqrt(k-2) ≈ 0.127 at k=64; allow 3.5 sigma
    for s in exact:
        assert exact[s] > 64  # sketches genuinely saturate here
        rel = abs(est[s] - exact[s]) / exact[s]
        assert rel <= 0.45, (s, est[s], exact[s])
    # mean relative error well inside one sigma band
    mre = sum(abs(est[s] - exact[s]) / exact[s] for s in exact) / len(exact)
    assert mre <= 0.15, mre


def test_kmv_distinct_exact_below_k(spark):
    items = _items(spark)
    est = {r["source"]: r["n_est"]
           for r in kmv_distinct(items, "source", "shingle",
                                 k=100000).collect()}
    exact = {r["source"]: r["n"]
             for r in items.groupBy("source")
             .agg(F.countDistinct("shingle").alias("n")).collect()}
    assert est == {s: float(n) for s, n in exact.items()}


def test_kmv_overlap_tracks_exact_jaccard(spark):
    items = _items(spark).persist()
    got = {(r["source_a"], r["source_b"]): r["jaccard_est"]
           for r in kmv_source_overlap(items, "source", "shingle",
                                       k=64).collect()}
    sets = {r["source"]: set(r["sh"]) for r in items.groupBy("source")
            .agg(F.collect_set("shingle").alias("sh")).collect()}
    items.unpersist()
    srcs = sorted(sets)
    errs = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            errs.append(abs(got[(a, b)] - exact))
            assert abs(got[(a, b)] - exact) <= 0.25, (a, b, got[(a, b)], exact)
    assert sum(errs) / len(errs) <= 0.08, sum(errs) / len(errs)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2


def test_kmv_repartition_invariant(spark):
    items = _items(spark)
    a = sorted(tuple(r) for r in
               kmv_distinct(items, "source", "shingle", k=64).collect())
    b = sorted(tuple(r) for r in
               kmv_distinct(items.repartition(13), "source", "shingle",
                            k=64).collect())
    assert a == b


def test_hll_distinct_error_bound(spark):
    """HLL with m=64 registers: relative std error ~ 1.04/sqrt(64) ≈ 0.13;
    allow 3.5 sigma per source, tighter on the mean."""
    from entity_resolution_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    items = _items(spark)
    est = {r["source"]: r["n_est"]
           for r in hll_distinct(items, "source", "shingle").collect()}
    exact = {r["source"]: r["n"]
             for r in items.groupBy("source")
             .agg(F.countDistinct("shingle").alias("n")).collect()}
    assert set(est) == set(exact)
    for s in exact:
        rel = abs(est[s] - exact[s]) / exact[s]
        assert rel <= 0.46, (s, est[s], exact[s])
    mre = sum(abs(est[s] - exact[s]) / exact[s] for s in exact) / len(exact)
    assert mre <= 0.15, mre


def test_hll_small_range_linear_counting(spark):
    """A group far below 2.5m distinct items must take the
    linear-counting branch and land near-exact."""
    from entity_resolution_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    rows = [("tiny", f"item-{i % 12}") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, item string")
    (got,) = hll_distinct(df, "grp", "item").collect()
    assert abs(got["n_est"] - 12) <= 3, got["n_est"]


def test_hll_merge_is_a_monoid_and_repartition_invariant(spark):
    """Register tables over disjoint slices merged with per-register max
    must equal the whole-corpus register table, at any partitioning —
    the property that lets 1000 executors sketch independently."""
    from entity_resolution_pipeline_spark.operators.sketches import (
        hll_merge, hll_register_table,
    )

    items = _items(spark)
    whole = {tuple(r) for r in
             hll_register_table(items, "source", "shingle").collect()}
    s1 = hll_register_table(items.where(F.length("shingle") % 2 == 0),
                            "source", "shingle")
    s2 = hll_register_table(
        items.where(F.length("shingle") % 2 == 1).repartition(13),
        "source", "shingle")
    merged = {tuple(r) for r in hll_merge(s1.unionByName(s2)).collect()}
    assert merged == whole


def test_kmv_merge_is_a_monoid(spark):
    """Sketching two disjoint corpus slices independently and merging
    must equal sketching the whole corpus — the property distributed
    roll-ups rely on."""
    from entity_resolution_pipeline_spark.operators.sketches import (
        kmv_merge, kmv_sketch_table,
    )

    items = _items(spark)
    whole = {tuple(r) for r in
             kmv_sketch_table(items, "source", "shingle", k=32).collect()}
    s1 = kmv_sketch_table(items.where(F.length("shingle") % 2 == 0),
                          "source", "shingle", k=32)
    s2 = kmv_sketch_table(items.where(F.length("shingle") % 2 == 1),
                          "source", "shingle", k=32)
    merged = {tuple(r) for r in
              kmv_merge(s1.unionByName(s2), k=32).collect()}
    assert merged == whole
