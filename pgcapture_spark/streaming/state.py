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

    def commit(self, df: DataFrame, batch_id: int, version: str | None = None) -> None:
        """Write a new version; atomically swing the manifest. Re-running the
        same batch_id rewrites the same version dir → idempotent. ``version``
        overrides the directory name for maintenance rewrites that must keep
        ``batch_id`` unchanged (a maintenance commit may never advance the
        stream's replay gate) while still writing a FRESH dir — overwriting
        the manifest-current dir in place would corrupt it on a mid-write
        crash."""
        version = version or f"v{batch_id:012d}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)

    def vacuum(self) -> list[str]:
        """Remove superseded version dirs (see BucketedSnapshotState.vacuum)."""
        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest) as f:
            current = json.load(f)["version"]
        return _vacuum_versions(self.root, {current})


def _vacuum_versions(root: str, referenced: set[str]) -> list[str]:
    import shutil

    removed = []
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if os.path.isdir(p) and name.startswith("v") and name not in referenced:
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


class BucketedSnapshotState:
    """Snapshot state partitioned by ``pmod(hash(key), n_buckets)`` — the
    merge-on-read layout that makes incremental apply O(touched data), not
    O(snapshot) (SURVEY §7 "exactly-once sink without Delta", scale form).

    Per micro-batch:
      1. the folded change images name the buckets they touch (a tiny
         projection of the small change set),
      2. ONLY those buckets' current files are read and merged,
      3. the merged rows are rewritten under a new version dir partitioned by
         bucket; the manifest swaps bucket→version pointers for touched
         buckets and carries every other bucket forward untouched.

    This is what Delta/Iceberg MERGE does with file-level pruning; at 100 TB
    with B sized so a bucket fits an executor, a batch touching k keys costs
    ~k bucket rewrites regardless of table size. The manifest is one tiny
    atomic-rename file, object-store friendly. The full-outer merge join now
    runs only over touched buckets, and AQE broadcasts the (small) image side
    within them."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str | list[str],
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.root = root
        # composite replica identities bucket on the hash of ALL key columns
        # (pkg/decode/schema.go:161-191 — the identity may be any column set)
        self.key_cols = [key] if isinstance(key, str) else list(key)
        self.key = key
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def initialized(self) -> bool:
        return os.path.exists(self._manifest)

    def touched_buckets(self, keys_df) -> list[int]:
        """Bucket ids a change set touches — a distinct over at most
        ``n_buckets`` values (bounded driver collect by construction)."""
        return sorted(
            r[0]
            for r in keys_df.select(self._bucket_col().alias("_b"))
            .distinct()
            .collect()
        )

    def _load(self) -> dict:
        if not os.path.exists(self._manifest):
            return {"batch_id": -1, "buckets": {}}
        with open(self._manifest) as f:
            return json.load(f)

    def last_batch(self) -> int:
        return self._load()["batch_id"]

    def _bucket_col(self):
        from pyspark.sql import functions as F

        return F.pmod(
            F.hash(*[F.col(k) for k in self.key_cols]), F.lit(self.n_buckets)
        )

    def initialize(self, snapshot: DataFrame) -> None:
        """Seed every bucket from the initial snapshot (version v-init)."""
        out = os.path.join(self.root, "vinit")
        (
            snapshot.withColumn("_b", self._bucket_col())
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(out)
        )
        buckets = {str(b): "vinit" for b in range(self.n_buckets)}
        self._swap({"batch_id": -1, "buckets": buckets})

    def _swap(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest)

    def _bucket_paths(self, manifest: dict, buckets: list[int]) -> list[str]:
        paths = []
        for b in buckets:
            ver = manifest["buckets"].get(str(b))
            if ver is not None:
                p = os.path.join(self.root, ver, f"_b={b}")
                if os.path.isdir(p):
                    paths.append(p)
        return paths

    def read_buckets(self, buckets: list[int]) -> DataFrame | None:
        paths = self._bucket_paths(self._load(), buckets)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def read(self) -> DataFrame | None:
        if not os.path.exists(self._manifest):
            return None
        return self.read_buckets(list(range(self.n_buckets)))

    def commit_buckets(self, merged: DataFrame, buckets: list[int], batch_id: int) -> None:
        """Write the merged rows of the touched buckets as a new version,
        re-point only those buckets. Idempotent per batch_id.

        The write clusters rows by bucket first (one task per touched
        bucket), so each bucket dir gets ONE file instead of one per
        (upstream partition × bucket) — file count per version stays
        O(touched buckets), and the extra exchange moves only the touched
        data the merge already shuffled."""
        from pyspark.sql import functions as F

        version = f"v{batch_id:012d}"
        (
            merged.withColumn("_b", self._bucket_col())
            .repartition(max(1, len(buckets)), F.col("_b"))
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(os.path.join(self.root, version))
        )
        manifest = self._load()
        for b in buckets:
            manifest["buckets"][str(b)] = version
        manifest["batch_id"] = batch_id
        self._swap(manifest)

    def vacuum(self) -> list[str]:
        """Remove version dirs no manifest entry references (the OPTIMIZE/
        VACUUM maintenance analog — log compaction for the state). Safe
        because the manifest swap is atomic: readers resolve paths from a
        manifest snapshot they already loaded."""
        manifest = self._load()
        return _vacuum_versions(self.root, set(manifest["buckets"].values()))
