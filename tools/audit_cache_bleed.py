"""Audit: no battery row may leak cached partitions into later rows.

Round-4 advisor finding: a wrapper that ends with ``.where(...).select(...)``
on a library result DROPS the ``_erps_persisted`` attribute (DataFrame
transformations return new objects), so ``release_persisted`` in bench.py /
tools/check_queries.py silently no-ops and the library's MEMORY_AND_DISK
frames stay cached for the rest of the 120-row session — bleeding memory
pressure (and eviction noise) into every later timing. That violates the
repo's "caches never bleed into later timings" contract and is a prime
suspect for the unexplained ~1.3× single-run battery drift flagged in the
round-4 verdict.

This tool runs EVERY battery row at sf0.001, materializes it, calls
``release_persisted``, then asks the JVM for surviving persistent RDDs
(``sc.getPersistentRDDs``). Any row whose surviving-RDD count exceeds the
count before the row ran is a leaker. Exit code 1 if any leak.

Usage: python tools/audit_cache_bleed.py [names...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from entity_resolution_pipeline_spark.operators.scoring import release_persisted  # noqa: E402
from entity_resolution_pipeline_spark.plans.benchqueries import QUERIES  # noqa: E402
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def persistent_rdd_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def main() -> int:
    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    leaks = []
    for name in names:
        before = persistent_rdd_ids(spark)
        df = QUERIES[name](spark, SF_DIR)
        # match the harness: materialize, then release
        df.count()
        release_persisted(df)
        # only NEW surviving RDD ids attribute to THIS row (residue from
        # an earlier leaker must not smear over everything after it;
        # the async ContextCleaner may also reap old ids mid-run)
        fresh = persistent_rdd_ids(spark) - before
        cm_nonempty = not (spark._jsparkSession.sharedState()
                           .cacheManager().isEmpty())
        if fresh or cm_nonempty:
            leaks.append((name, len(fresh)))
            print(f"LEAK  {name}: new surviving RDD ids {sorted(fresh)} "
                  f"cacheManager_nonempty={cm_nonempty}", flush=True)
            spark.catalog.clearCache()
        else:
            print(f"ok    {name}", flush=True)
    print(f"\n{len(leaks)} leaking rows: {leaks}")
    return 1 if leaks else 0


if __name__ == "__main__":
    raise SystemExit(main())
