"""TableIO — Iceberg-shaped table commit/resume shim.

The real deployment writes Iceberg tables (``df.writeTo(tbl).createOrReplace()``)
and resumes from snapshot ids. This sandbox has no Iceberg runtime jar, so
TableIO keeps the same interface over Parquet directories plus an atomic
JSON manifest (`_manifest.json`) recording committed stages — the same
commit/resume semantics as the reference's per-step Parquet handoffs +
`pipeline_checkpoint.json` (/root/reference/run_pipeline.py:845-893), made
atomic (write-temp-then-rename) and queryable.

Switching to a real Iceberg catalog is a constructor flag away; no pipeline
code touches the storage layout directly.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    # -- manifest (atomic) ----------------------------------------------------
    def _read_manifest(self) -> dict[str, Any]:
        if not os.path.exists(self._manifest_path):
            return {"committed": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict[str, Any]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_manifest", suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    # -- table ops ------------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              meta: dict[str, Any] | None = None) -> None:
        """Write + commit. The manifest entry is appended only after the
        Parquet write succeeds — a crashed write never looks committed."""
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))
        m = self._read_manifest()
        m["committed"][name] = {
            "monotonic": time.monotonic_ns(),  # ordering only; not wall-clock content
            "meta": meta or {},
        }
        self._write_manifest(m)

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write_bucketed(self, name: str, df: DataFrame, bucket_cols: list[str],
                       n_buckets: int, sort_cols: list[str] | None = None,
                       meta: dict[str, Any] | None = None) -> None:
        """Bucketed external table: pre-shuffles ONCE at write time so every
        later equi-join / groupBy on ``bucket_cols`` between tables bucketed
        the same way runs with NO Exchange (and with ``sort_cols`` matching
        the join key, no Sort either) — the co-located-join layout for tables
        joined repeatedly at 100 TB (e.g. page attrs ⋈ candidate pairs on
        url). Iceberg's analog is a bucket partition transform; the sandbox
        uses the session catalog's bucketed-Parquet support, which Catalyst
        already understands (`spark.sql.sources.bucketing.enabled`)."""
        (df.write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*(sort_cols or bucket_cols))
            .option("path", self.path(name))
            .format("parquet")
            .saveAsTable(name))
        m = self._read_manifest()
        m["committed"][name] = {
            "monotonic": time.monotonic_ns(),
            "meta": {**(meta or {}), "bucket_cols": bucket_cols,
                     "n_buckets": n_buckets},
        }
        self._write_manifest(m)

    def read_bucketed(self, name: str) -> DataFrame:
        """Read via the catalog (NOT spark.read.parquet — a path read drops
        the bucketing metadata and with it the no-shuffle join plan)."""
        return self.spark.table(name)

    def write_csv(self, name: str, df: DataFrame) -> None:
        """CSV sink for human review queues (S8,
        /root/reference/src/decisioning.py:319-333): header on, distributed
        write (one file per partition; coalesce upstream if one file is
        needed)."""
        df.write.mode("overwrite").option("header", True).csv(self.path(name))

    def read_csv(self, name: str, schema=None) -> DataFrame:
        r = self.spark.read.option("header", True)
        if schema is not None:
            r = r.schema(schema)
        return r.csv(self.path(name))

    def write_jsonl(self, name: str, df: DataFrame,
                    compress: bool = True,
                    meta: dict[str, Any] | None = None) -> None:
        """JSON-Lines sink — the interchange format LLM training corpora
        actually ship as (one JSON object per line, gzip shards). Spark's
        native json writer IS jsonl; distributed, one shard per
        partition — `repartition(n)` upstream to target shard count/size.
        Manifest-committed like the parquet sink."""
        w = df.write.mode("overwrite")
        if compress:
            w = w.option("compression", "gzip")
        w.json(self.path(name))
        m = self._read_manifest()
        m["committed"][name] = {
            "monotonic": time.monotonic_ns(),
            "meta": {**(meta or {}), "format": "jsonl"},
        }
        self._write_manifest(m)

    def read_jsonl(self, name: str, schema=None) -> DataFrame:
        """Schema-pinned jsonl read: pass the schema in production —
        schema inference is a full extra pass over 100 TB and silently
        widens types; inference is for ad-hoc exploration only."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(self.path(name))

    def is_committed(self, name: str) -> bool:
        return name in self._read_manifest()["committed"]

    def committed_meta(self, name: str) -> dict[str, Any]:
        """Meta dict recorded at commit time ({} if not committed)."""
        entry = self._read_manifest()["committed"].get(name)
        return dict(entry["meta"]) if entry else {}

    def uncommit(self, name: str) -> None:
        """Drop a table's committed entry (its files stay; the next write
        overwrites them). Used to invalidate mid-stage checkpoints once the
        owning stage commits."""
        m = self._read_manifest()
        if name in m["committed"]:
            del m["committed"][name]
            self._write_manifest(m)

    def append_audit(self, rows: list[dict[str, Any]]) -> None:
        """Append lineage rows (per-stage, per-partition metrics) to the
        audit table — the Iceberg-audit-table analog. JSONL append keeps the
        shim dependency-free; rows carry stage, partition stats, histograms."""
        p = os.path.join(self.root, "_audit.jsonl")
        with open(p, "a") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True) + "\n")

    def read_audit(self) -> list[dict[str, Any]]:
        p = os.path.join(self.root, "_audit.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
