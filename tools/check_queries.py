"""Local replica of the driver's correctness gate: run each Spark query and
its DuckDB oracle side-by-side at sf=0.01, compare row count, column names,
and order-insensitive values.

Usage: python tools/check_queries.py [--json OUT.json] [names...]

``--json`` additionally writes a machine-readable record with the SAME row
schema as the driver's CORRECTNESS_r0N.json ({name: {rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}}), so rounds can
commit a complete correctness record for every battery query even when the
driver's own record caps at 50 rows (round-3 verdict ask #1).
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from entity_resolution_pipeline_spark.plans.benchqueries import ORACLE_SQL, QUERIES  # noqa: E402
from entity_resolution_pipeline_spark.operators.scoring import release_persisted  # noqa: E402
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, dict)):
        # DRIVER PARITY: the driver's canonicalizer pandas-sorts raw
        # cells and throws on list values (round-4 regression:
        # docs_winnow / docs_hash_embed passed here because this helper
        # used to stringify lists, then went RED at the record of truth).
        # Battery projections must serialize arrays/structs to scalars.
        raise TypeError(
            f"non-scalar cell {type(v).__name__} — driver canonicalizer "
            "cannot sort this; serialize the column in the battery "
            "projection (array_join/to_json)")
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_queries.py [--json OUT.json] [names...]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or list(QUERIES)
    record: dict[str, dict] = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    # CHECK_CORES / CHECK_SHUFFLE override the session shape so the same
    # battery can be re-checked under a different parallelism — results
    # must be partition-invariant (see CORRECTNESS_LOCAL_r04_alt.json)
    import os
    spark = get_spark(cores=int(os.environ.get("CHECK_CORES", "8")),
                      shuffle_partitions=int(os.environ.get("CHECK_SHUFFLE",
                                                            "8")))
    failures = 0

    def rec(name, *, rows=False, schema=False, values=False,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": values,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows, "err": err,
        }

    for name in names:
        fn = QUERIES[name]
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            release_persisted(sdf)  # don't let row caches span the session
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec(name, err=f"spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in ORACLE_SQL:
            # rows-only check: never record a match flag as True — a
            # reader must not mistake an unchecked query for a verified one
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            rec(name, spark_rows=len(srows),
                err="no oracle (rows-only check)")
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            rec(name, spark_rows=len(srows),
                err=f"duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            rec(name, spark_rows=len(srows), oracle_rows=len(orows),
                err="schema mismatch")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            rec(name, schema=True, spark_rows=len(srows),
                oracle_rows=len(orows), err="rowcount mismatch")
            failures += 1
            continue
        try:
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
        except TypeError as e:  # non-scalar cell — same failure the
            print(f"FAIL  {name}: {e}")  # driver record would show
            rec(name, rows=True, schema=True, spark_rows=len(srows),
                oracle_rows=len(orows), err=f"canonicalize error: {e}")
            failures += 1
            continue
        if sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
            rec(name, rows=True, schema=True, spark_rows=len(srows),
                oracle_rows=len(orows), err="value mismatch")
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows  [{time.monotonic() - t0:.1f}s]")
        rec(name, rows=True, schema=True, values=True,
            spark_rows=len(srows), oracle_rows=len(orows))
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"record written to {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
