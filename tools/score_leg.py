"""One scaling-bench leg of the GATED job: score candidate pairs.

Reads the pre-staged pairs+attrs tables (built once by scaling_bench's
prep step — same input for every leg), runs one cold scoring pass (Python
worker spawn + codegen, amortized to zero on an hours-long 100-TB stage),
then waits at a file barrier until BARRIER_N legs are ready so that ALL
concurrent legs time their measured window simultaneously — without the
barrier, staggered apps measure their score phase while neighbours idle,
and 8 pinned cores on an otherwise-quiet socket run at turbo clocks with
exclusive memory bandwidth that no busy-cluster executor gets.

The measured window is SCORE_REPS (default 2) back-to-back warm
materializations — a longer window overlaps the concurrent legs more and
shrinks timer jitter.

Env: SPARK_GRAFT_MASTER/_EXEC_*/_DRIVER_MEM (session), SCORE_INPUT_DIR,
SCORE_CPUS, BARRIER_DIR, BARRIER_N, SCORE_REPS.
Prints one JSON line: {"pairs_scored_per_sec": ..., "n_pairs": ...,
"score_sec": ..., "score_cold_sec": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from entity_resolution_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig, stage_scored,
)
from entity_resolution_pipeline_spark.operators.scoring import (  # noqa: E402
    release_persisted, scoring_join_prefs,
)
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402


def barrier_wait(barrier_dir: str, n: int, timeout: float = 900.0) -> None:
    os.makedirs(barrier_dir, exist_ok=True)
    with open(os.path.join(barrier_dir, f"ready_{os.getpid()}"), "w") as f:
        f.write("1")
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        ready = [p for p in os.listdir(barrier_dir) if p.startswith("ready_")]
        if len(ready) >= n:
            return
        time.sleep(0.05)
    raise RuntimeError(f"barrier timeout: {barrier_dir}")


def main() -> None:
    input_dir = os.environ["SCORE_INPUT_DIR"]
    cpus = int(os.environ.get("SCORE_CPUS", "8"))
    barrier_dir = os.environ.get("BARRIER_DIR")
    barrier_n = int(os.environ.get("BARRIER_N", "1"))
    reps = int(os.environ.get("SCORE_REPS", "2"))

    extra = json.loads(os.environ.get("SCORE_EXTRA_CONF", "{}"))
    shuffle = int(os.environ.get("SCORE_SHUFFLE", str(max(cpus, 8))))
    spark = get_spark(cores=cpus, shuffle_partitions=shuffle,
                      app_name=f"score-leg-{cpus}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    pairs = spark.read.parquet(f"{input_dir}/pairs")
    attrs = spark.read.parquet(f"{input_dir}/attrs")
    cfg = PipelineConfig(two_phase_scoring=True)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix=f"score_leg_{cpus}_", dir=base)
    try:
        with scoring_join_prefs(spark):
            t0 = time.perf_counter()
            scored = stage_scored(pairs, attrs, cfg)
            scored.write.mode("overwrite").parquet(f"{tmp}/scored0")
            release_persisted(scored)
            cold = time.perf_counter() - t0
            n_pairs = spark.read.parquet(f"{tmp}/scored0").count()

            if barrier_dir:
                barrier_wait(barrier_dir, barrier_n)

            t0 = time.perf_counter()
            for r in range(reps):
                s = stage_scored(pairs, attrs, cfg)
                s.write.mode("overwrite").parquet(f"{tmp}/scored{r + 1}")
                release_persisted(s)
            warm = time.perf_counter() - t0

        print(json.dumps({
            "pairs_scored_per_sec": round(n_pairs * reps / max(warm, 1e-9), 1),
            "n_pairs": n_pairs,
            "score_sec": round(warm, 3),
            "score_cold_sec": round(cold, 3),
            "cpus": cpus,
            "reps": reps,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
