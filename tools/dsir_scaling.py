"""Two-width scaling evidence for DSIR importance selection.

Same methodology as tools/curation_scaling.py (and the gated scoring
legs): the SAME dsir_select job over the SAME input at local[N] vs
local[4N] (N=4), shuffle partitions pinned identically, fresh subprocess
JVM per leg warmed on an unrelated query family, paired rounds, medians.

The input is the documents table replicated ×REPLICAS (default 16) with
offset ids — at sf0.1 the un-replicated job is 1.5s of fixed overhead
and measures stage latency, not the plan. Replication scales the n-gram
instance stream (the job's work term: explode → md5 bucket → broadcast
model join → per-doc integer sum) while the model stays 256 rows.

Usage: python tools/dsir_scaling.py [sf_dir] [rounds]
Appends/replaces a "DSIR scaling" section in BENCH/BASELINE.md.
Run NOTHING concurrently (contention corrupts legs).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from entity_resolution_pipeline_spark.session import get_spark
from pyspark.sql import functions as F
import entity_resolution_pipeline_spark.plans.benchqueries as bq

width = int(sys.argv[1]); sf_dir = sys.argv[2]; replicas = int(sys.argv[3])
spark = get_spark(cores=width, shuffle_partitions=32,
                  app_name=f"dsir-leg-{{width}}")
spark.sparkContext.setLogLevel("ERROR")
# JVM/codegen/parquet warmup on a family sharing nothing with DSIR
bq.QUERIES["dedup_simhash"](spark, sf_dir).count()
from entity_resolution_pipeline_spark.operators.selection import dsir_select
base = bq._t_wide(spark, sf_dir, "documents")
docs = base.select(
    F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("r"), "*"
).select(
    (F.col("doc_id")
     + F.col("r").cast("long") * F.lit(10_000_000)).alias("doc_id"),
    "text", "source",
)
target = docs.where(F.col("source").isin("src0", "src1"))
n_docs = replicas * base.count()
t0 = time.perf_counter()
df = dsir_select(docs, target, k=1000, n_buckets=256, method="gumbel")
df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()
sec = time.perf_counter() - t0
print(json.dumps({{"width": width, "sec": round(sec, 3),
                   "n_docs": n_docs,
                   "docs_per_sec": round(n_docs / sec, 1)}}))
"""

MARK_BEGIN = "<!-- dsir-scaling:begin -->"
MARK_END = "<!-- dsir-scaling:end -->"


def run_leg(width: int, sf_dir: str, replicas: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG_SCRIPT.format(repo=REPO), str(width),
         sf_dir, str(replicas)],
        capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = int(os.environ.get("SCALING_N", "4"))
    replicas = int(os.environ.get("DSIR_REPLICAS", "16"))
    legs_n, legs_4n, effs = [], [], []
    for r in range(rounds):
        a = run_leg(n, sf_dir, replicas)
        b = run_leg(4 * n, sf_dir, replicas)
        eff = (a["sec"] / b["sec"]) / 4.0
        legs_n.append(a); legs_4n.append(b); effs.append(eff)
        print(f"round {r}: {n}c {a['sec']}s ({a['docs_per_sec']} docs/s) | "
              f"{4*n}c {b['sec']}s ({b['docs_per_sec']} docs/s) | "
              f"eff {eff:.3f}", flush=True)
    med_n = statistics.median(x["sec"] for x in legs_n)
    med_4n = statistics.median(x["sec"] for x in legs_4n)
    report = {
        "metric": "dsir_scaling",
        "sf_dir": sf_dir, "rounds": rounds,
        "n_docs": legs_n[0]["n_docs"],
        "widths": [n, 4 * n],
        "median_sec": [round(med_n, 3), round(med_4n, 3)],
        "median_docs_per_sec": [round(legs_n[0]["n_docs"] / med_n, 1),
                                round(legs_n[0]["n_docs"] / med_4n, 1)],
        "paired_median_eff": round(statistics.median(effs), 3),
        "eff_of_medians": round((med_n / med_4n) / 4.0, 3),
        "per_round_eff": [round(e, 3) for e in effs],
    }
    print(json.dumps(report))

    section = f"""{MARK_BEGIN}
### DSIR selection scaling (dsir_select, {sf_dir.rstrip('/').rsplit('/', 1)[-1]})

Two-width methodology of record (local[{n}] vs local[{4 * n}], shuffle
partitions pinned at 32, fresh JVM per leg, paired rounds): fit both
256-row hashed-n-gram models, weight every document (explode → md5
bucket → broadcast model join → per-doc exact-integer sum), Gumbel-top-k
— over {report["n_docs"]} docs (the sf table replicated
×{replicas} with offset ids; un-replicated the job is ~1.5s of fixed
overhead on any width).

| width | median sec | docs/s |
|---|---|---|
| {n} cores | {report["median_sec"][0]} | {report["median_docs_per_sec"][0]} |
| {4 * n} cores | {report["median_sec"][1]} | {report["median_docs_per_sec"][1]} |

Paired-median efficiency **{report["paired_median_eff"]}** over
{rounds} rounds (efficiency-of-medians {report["eff_of_medians"]};
per-round {report["per_round_eff"]}).
{MARK_END}"""

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path) as f:
        text = f.read()
    if MARK_BEGIN in text:
        text = re.sub(
            re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
            section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"section written to {path}")


if __name__ == "__main__":
    main()
