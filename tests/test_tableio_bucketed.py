"""Bucketed-table layout: equal-bucketed tables join with NO Exchange.

The 100-TB co-location story: pay the shuffle once at write time, then
every equi-join on the bucket key is narrow. Asserted on the executed
physical plan, not on folklore.
"""

import os

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.sources.tableio import TableIO


def test_bucketed_join_no_shuffle(spark, tmp_root):
    io = TableIO(spark, os.path.join(tmp_root, "bucketed"))
    left = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("x"))
    right = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 5).alias("y"))
    try:
        io.write_bucketed("t_bleft", left, ["url"], 8)
        io.write_bucketed("t_bright", right, ["url"], 8)
        l, r = io.read_bucketed("t_bleft"), io.read_bucketed("t_bright")
        assert io.is_committed("t_bleft") and io.is_committed("t_bright")

        # merge hint: keep the broadcast planner away so the bucketed
        # sort-merge path (the one that matters at scale) is what's tested
        joined = l.hint("merge").join(r, "url")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

        # control: the same join from plain path reads DOES shuffle —
        # proves the assertion above is the bucketing, not a quirk
        lp = spark.read.parquet(io.path("t_bleft"))
        rp = spark.read.parquet(io.path("t_bright"))
        control = lp.hint("merge").join(rp, "url")
        control.count()
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_jsonl_roundtrip_committed(spark, tmp_path):
    """JSONL shards (the LLM-corpus interchange format): schema-pinned
    roundtrip is lossless incl. nulls and unicode, shards are gzipped,
    and the manifest commits the sink."""
    from entity_resolution_pipeline_spark.sources.tableio import TableIO

    io = TableIO(spark, str(tmp_path / "t"))
    rows = [(1, "héllo wörld", "en"), (2, None, "de"), (3, "x\ty", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    io.write_jsonl("docs_out", df.repartition(2), meta={"split": "train"})
    assert io.is_committed("docs_out")
    assert io.committed_meta("docs_out")["format"] == "jsonl"
    import glob
    assert glob.glob(io.path("docs_out") + "/*.json.gz")
    back = io.read_jsonl("docs_out", schema=df.schema)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(rows)
