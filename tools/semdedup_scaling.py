"""Two-width scaling check for semantic_dedup (secondary evidence; the
gated north-rule metric is the candidate-pairs scoring legs — see
BENCH/BASELINE.md). Interleaved local[4]/local[16] rounds, fresh JVM per
leg, 1 untimed cold pass + best-of-2 warm, sf0.1 embeddings replicated
REPS x with offset ids so the pair-scan work term dominates the ~2.2s
fixed job floor. Run NOTHING else concurrently.

Usage: python tools/semdedup_scaling.py [rounds=2] [reps=4]
"""

import json
import subprocess
import sys

LEG = r'''
import sys, time; sys.path.insert(0, ".")
from entity_resolution_pipeline_spark.session import get_spark
from entity_resolution_pipeline_spark.operators.dedup import semantic_dedup
from entity_resolution_pipeline_spark.operators.scoring import release_persisted
from pyspark.sql import functions as F
cores, reps = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(cores=cores, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
parts = [base.select((F.col("vec_id") + F.lit(i * 1000000)).alias("vec_id"),
                     "embedding") for i in range(reps)]
emb = parts[0]
for p in parts[1:]:
    emb = emb.unionByName(p)
emb = emb.repartition(32).persist()
emb.count()

def run():
    df = semantic_dedup(emb, n_cells=8, threshold=0.35)
    df.agg(F.bit_xor(F.xxhash64("vec_id", "cell_id", "is_keeper"))).collect()
    release_persisted(df)

run()  # cold: python worker spawn + codegen (amortized in production)
best = None
for _ in range(2):
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print("RESULT", cores, round(best, 3))
'''


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rows = []
    for rnd in range(rounds):
        for cores in (4, 16):
            out = subprocess.run(
                [sys.executable, "-c", LEG, str(cores), str(reps)],
                capture_output=True, text=True)
            lines = [l for l in out.stdout.splitlines()
                     if l.startswith("RESULT")]
            if not lines:
                print(out.stderr[-2000:])
                return 1
            _, c, t = lines[0].split()
            rows.append({"round": rnd, "cores": int(c), "sec": float(t)})
            print(rows[-1], flush=True)
    n4 = min(r["sec"] for r in rows if r["cores"] == 4)
    n16 = min(r["sec"] for r in rows if r["cores"] == 16)
    print(json.dumps({"rows": rows, "best_4": n4, "best_16": n16,
                      "efficiency": round(n4 / n16 / 4.0, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
