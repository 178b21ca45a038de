"""Scaling evidence for the training-data-prep capstone (training_corpus).

Same methodology as the gated scoring legs in tools/scaling_bench.py: the
SAME job over the SAME input at local[N] vs local[4N] (N=4 by default so
the shared box is never saturated and per-core conditions stay comparable
— see scaling_bench.py's module docstring for why 4→16 is the honest
local proxy), shuffle partitions pinned identically at both widths so the
plan differs only in parallelism, paired rounds (both widths back-to-back
per round) with the median of per-round efficiencies as the noise-robust
estimator.

Each leg is a fresh subprocess: warm the JVM on an unrelated query family
(simhash — no shingle caches), then time ONE cold run of the full
training_corpus flow (shingle → LSH dedup closure → decontamination →
gate → chunk → budget). A second warm run would hit the persisted shingle
table from the first and measure nothing.

The input is the documents table replicated ×REPLICAS with offset ids
(map-side explode, one scan): at sf0.1 the raw table is 5,000 docs and the
un-replicated job is fixed-overhead-dominated (~12s at BOTH 4 and 16
cores — stage scheduling + CC round latency, not compute — measured
eff 0.25 that says nothing about the plan). Replication makes the work
term dominate AND builds a dedup-heavy corpus (every doc has REPLICAS
exact copies, so the LSH/closure path does real group work). Both widths
run the identical replicated input.

Usage: python tools/curation_scaling.py [sf_dir] [rounds]
Appends/replaces a "Curation-capstone scaling" section in BENCH/BASELINE.md.
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
                  app_name=f"curation-leg-{{width}}")
spark.sparkContext.setLogLevel("ERROR")
# JVM/codegen/parquet warmup on a query family with no shared caches
bq.QUERIES["dedup_simhash"](spark, sf_dir).count()
from entity_resolution_pipeline_spark.operators.curation import training_corpus
base = bq._t_wide(spark, sf_dir, "documents")
docs = base.select(
    F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("r"), "*"
).select(
    (F.col("doc_id") + F.col("r") * F.lit(10_000_000)).alias("doc_id"),
    "text", "lang", "source",
)
eval_docs = docs.where(F.col("doc_id") % 97 == 0)
n_docs = replicas * base.count()
t0 = time.perf_counter()
df = training_corpus(docs, eval_docs, stop_threshold=bq.LSH_STOP)
df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()
sec = time.perf_counter() - t0
print(json.dumps({{"width": width, "sec": round(sec, 3),
                   "n_docs": n_docs,
                   "docs_per_sec": round(n_docs / sec, 1)}}))
"""

MARK_BEGIN = "<!-- curation-scaling:begin -->"
MARK_END = "<!-- curation-scaling:end -->"


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
    replicas = int(os.environ.get("CURATION_REPLICAS", "8"))
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
        "metric": "curation_capstone_scaling",
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
### Curation-capstone scaling (training_corpus, {sf_dir.rstrip('/').rsplit('/', 1)[-1]})

Same two-width methodology as the gated scoring legs (local[{n}] vs
local[{4 * n}], shuffle partitions pinned at 32 for both, fresh JVM per
leg, paired rounds): the full training-data-prep flow — shingle once →
MinHash-LSH dedup + closure → broadcast decontamination → curation gate
→ overlap-chunk → per-source budget — over {report["n_docs"]} docs (the
sf table replicated ×{replicas} with offset ids: a dedup-heavy corpus
where every doc has {replicas} exact copies; un-replicated the job is
fixed-overhead-bound at ~12s on BOTH widths, eff 0.25, measuring stage
latency rather than the plan).

| width | median sec | docs/s |
|---|---|---|
| {n} cores | {report["median_sec"][0]} | {report["median_docs_per_sec"][0]} |
| {4 * n} cores | {report["median_sec"][1]} | {report["median_docs_per_sec"][1]} |

Paired-median efficiency **{report["paired_median_eff"]}** over {rounds}
rounds (efficiency-of-medians {report["eff_of_medians"]}; per-round
{report["per_round_eff"]}). Efficiency rises with the work term —
measured 0.25 at ×1 (job is pure stage latency), 0.52 at ×8, ~0.70 at
×16 — the residual is the fixed per-round latency of the transitive
closure (2 shuffles + localCheckpoint barrier per star round), which
amortizes to noise at real corpus sizes where each CC round moves
hours of data. This is secondary evidence — the north-rule gate is the
candidate-pairs-scored/s metric above; it shows the LLM-data-prep
family scales under the same discipline.
{MARK_END}"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    text = open(path).read()
    pat = re.compile(re.escape(MARK_BEGIN) + ".*?" + re.escape(MARK_END), re.S)
    if pat.search(text):
        text = pat.sub(section, text)
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    open(path, "w").write(text)
    print(f"wrote section to {path}")


if __name__ == "__main__":
    main()
