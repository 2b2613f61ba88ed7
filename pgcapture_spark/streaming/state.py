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
            m = json.load(f)
        dirs = [m["version"], *m.get("deltas", [])]
        return self.spark.read.parquet(
            *[os.path.join(self.root, d) for d in dirs]
        )

    def commit(self, df: DataFrame, batch_id: int, version: str | None = None) -> None:
        """Write a new version; atomically swing the manifest. Re-running the
        same batch_id rewrites the same version dir → idempotent. ``version``
        overrides the directory name for maintenance rewrites that must keep
        ``batch_id`` unchanged (a maintenance commit may never advance the
        stream's replay gate) while still writing a FRESH dir — overwriting
        the manifest-current dir in place would corrupt it on a mid-write
        crash. A full commit SUPERSEDES any accumulated delta dirs
        (``commit_delta``): the manifest drops them and vacuum reclaims."""
        version = version or f"v{batch_id:012d}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)

    #: auto-compaction threshold for ``commit_delta``: once this many delta
    #: dirs ride the manifest, the next delta commit folds base + deltas into
    #: ONE fresh version. Bounds the per-trigger read fan-in (file listing,
    #: footers, scan tasks all stay O(threshold)) while keeping the write
    #: volume amortized O(new): a full rewrite every K triggers costs
    #: O(size/K) per trigger vs the old O(size) rewrite EVERY trigger.
    delta_compact_threshold: int = 16

    def commit_delta(self, delta: DataFrame, batch_id: int) -> None:
        """APPEND-ONLY commit: write only ``delta`` (rows NOT already in the
        state — the caller anti-joins) as a new single-file ``.delta`` dir
        riding the manifest's ``deltas`` list; ``read()`` is the union of the
        base version and every delta. For monotone row sets (the tx registry:
        one immutable row per transaction) this turns the per-trigger write
        from O(all rows so far) — a full rewrite per micro-batch, quadratic
        over a stream's lifetime — into O(new rows this batch). The delta is
        coalesced to ONE file and the delta list is BOUNDED
        (``delta_compact_threshold``) by folding into a fresh full version —
        an unbounded list would just move the quadratic cost from bytes to
        file count: the registry is re-read every trigger, and N delta dirs
        × part-files means O(N·P) listings, footer reads and scan tasks per
        trigger, with prune cadence the only bound and nothing forcing prune
        to run. A full ``commit`` (e.g. the prune
        maintenance rewrite) also supersedes and drops the deltas.
        Idempotent per batch_id: a crash between the dir write and the
        manifest swap re-runs into the same dir and appends it once."""
        if not os.path.exists(self._manifest):
            raise ValueError("commit_delta: no base version — commit() first")
        with open(self._manifest) as f:
            m = json.load(f)
        if len(m.get("deltas", [])) >= self.delta_compact_threshold:
            # fold base + deltas + this delta into one fresh version (reads
            # the still-on-disk old dirs; the manifest swap inside commit()
            # drops the delta list; vacuum reclaims the old dirs)
            self.commit(self.read().unionByName(delta), batch_id)
            self.vacuum()
            return
        d = f"v{batch_id:012d}.delta"
        # one file per delta: the frame is a micro-batch's new Begins (tiny),
        # and per-trigger read fan-in is file count, not bytes
        delta.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, d)
        )
        deltas = m.setdefault("deltas", [])
        if d not in deltas:
            deltas.append(d)
        m["batch_id"] = batch_id
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest)

    def vacuum(self) -> list[str]:
        """Remove superseded version dirs (see BucketedSnapshotState.vacuum).
        Delta dirs riding the current manifest are live."""
        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest) as f:
            m = json.load(f)
        return _vacuum_versions(
            self.root, {m["version"], *m.get("deltas", [])}
        )

    # ------------------------------------------- driver-local row commits
    #
    # The tx registry's per-trigger writes are a handful of rows the driver
    # ALREADY holds (the probe job collects the batch's Begins — the same
    # bound that makes the registry broadcastable for the commit-time join).
    # Writing them through a Spark job costs a full SQL execution per
    # trigger (plan + schedule + task round trip) to move bytes the driver
    # has in hand; these variants write the parquet file driver-side
    # (pyarrow) under the SAME dir/manifest protocol as commit/commit_delta,
    # so readers (spark.read.parquet unions, prune_tx_registry, crash
    # rehydration) see an identical layout. NOT for data-sized frames — the
    # rows must already be driver-resident by contract.

    _LOCAL_SCHEMA: list[tuple[str, str]] = [("lsn", "int64"), ("_commit_us", "int64")]

    def _write_local_parquet(
        self,
        rows: list[tuple],
        version: str,
        schema: list[tuple[str, str]] | None = None,
    ) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        out = os.path.join(self.root, version)
        os.makedirs(out, exist_ok=True)
        # idempotent replay: same batch id rewrites the same dir
        for name in os.listdir(out):
            if name.endswith(".parquet"):
                os.remove(os.path.join(out, name))
        schema = schema or self._LOCAL_SCHEMA
        names = [n for n, _ in schema]
        arrays = [
            pa.array([r[i] for r in rows], type=getattr(pa, t)())
            for i, (_, t) in enumerate(schema)
        ]
        pq.write_table(
            pa.Table.from_arrays(arrays, names=names),
            os.path.join(out, "part-00000.parquet"),
        )

    # Spark simple types a driver-local write can represent exactly; nested /
    # exotic types must keep using the Spark-job commit()
    _PA_FOR_SPARK: dict[str, str] = {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "string": "string",
        "boolean": "bool_",
        "double": "float64",
        "float": "float32",
        "binary": "binary",
    }

    def commit_collected(self, rows: list, dtypes: list[tuple[str, str]],
                         batch_id: int) -> None:
        """:meth:`commit` from rows the driver ALREADY collected (e.g. the
        wire consumers' relation cache, whose merged content is collected for
        the driver memo anyway): writes one fresh full version driver-side
        (no Spark job) under the same dir/manifest protocol. ``dtypes`` is
        the frame's ``DataFrame.dtypes`` — FLAT simple-typed schemas only
        (raises on anything the parquet writer cannot represent exactly as
        Spark would)."""
        schema = []
        for n, t in dtypes:
            if t not in self._PA_FOR_SPARK:
                raise ValueError(
                    f"commit_collected: column {n!r} has type {t!r}; only "
                    f"flat {sorted(self._PA_FOR_SPARK)} supported"
                )
            schema.append((n, self._PA_FOR_SPARK[t]))
        version = f"v{batch_id:012d}"
        self._write_local_parquet(
            [tuple(r) for r in rows], version, schema=schema
        )
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)

    def commit_rows(self, rows: list[tuple], batch_id: int) -> None:
        """Driver-local form of :meth:`commit`: write ``rows`` as one fresh
        full version (ONE file, no Spark job) and swing the manifest,
        dropping any delta dirs (a full commit supersedes them)."""
        version = f"v{batch_id:012d}"
        self._write_local_parquet(rows, version)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)

    def commit_delta_rows(self, rows: list[tuple], batch_id: int) -> None:
        """Driver-local form of :meth:`commit_delta`: append ``rows`` (already
        deduped against the committed registry by the caller) as a one-file
        ``.delta`` dir riding the manifest — no Spark job. The caller owns
        the compaction-threshold fold (it holds the full row set in memory,
        so the fold is a :meth:`commit_rows`, not a distributed union)."""
        if not os.path.exists(self._manifest):
            raise ValueError("commit_delta_rows: no base version — commit first")
        with open(self._manifest) as f:
            m = json.load(f)
        d = f"v{batch_id:012d}.delta"
        self._write_local_parquet(rows, d)
        deltas = m.setdefault("deltas", [])
        if d not in deltas:
            deltas.append(d)
        m["batch_id"] = batch_id
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest)

    def delta_count(self) -> int:
        """How many delta dirs ride the current manifest (the caller-side
        compaction-threshold check for ``commit_delta_rows``)."""
        if not os.path.exists(self._manifest):
            return 0
        with open(self._manifest) as f:
            return len(json.load(f).get("deltas", []))


def _same_state_entry(a: dict, b: dict) -> bool:
    """Whether two history entries describe the SAME state: identical
    pointer maps and identical schema/registry snapshots (batch ids aside).
    Both sides are JSON-normalized (entries come off a loaded manifest), so
    a serialized compare is exact."""
    keys = ("buckets", "schema", "registry")
    return all(
        json.dumps(a.get(k), sort_keys=True) == json.dumps(b.get(k), sort_keys=True)
        for k in keys
    )


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
        retain_versions: bool | int = False,
    ):
        self.spark = spark
        self.root = root
        # composite replica identities bucket on the hash of ALL key columns
        # (pkg/decode/schema.go:161-191 — the identity may be any column set)
        self.key_cols = [key] if isinstance(key, str) else list(key)
        self.key = key
        self.n_buckets = n_buckets
        # time-travel retention (the Delta/Iceberg deleted-file-retention
        # analog): an int N is the retention WINDOW — every commit pushes
        # the superseded manifest onto a bounded ``history`` list riding the
        # manifest itself, ``manifest_asof``/``read_asof`` resolve any of
        # the last N commits, and vacuum() removes version dirs referenced
        # by NEITHER the current manifest NOR the retained history, so
        # storage stays O(live data + N commits of rewrites). True retains
        # everything (vacuum no-op, unbounded — only for short-lived
        # fixtures); False (default) keeps no history.
        self.retain_versions = retain_versions
        os.makedirs(root, exist_ok=True)

    @property
    def _retain_n(self) -> int | None:
        """History entries to keep: None = unlimited (True), 0 = none."""
        r = self.retain_versions
        if r is True:
            return None
        return int(r) if r else 0

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def initialized(self) -> bool:
        return os.path.exists(self._manifest)

    def touched_buckets(self, keys_df) -> list[int]:
        """Bucket ids a change set touches — a ``collect_set`` aggregate
        (map-side partial, ONE result row; bounded by ``n_buckets`` by
        construction)."""
        from pyspark.sql import functions as F

        row = keys_df.select(self._bucket_col().alias("_b")).agg(
            F.collect_set("_b").alias("bs")
        ).collect()[0]
        return sorted(row["bs"])

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

    _READ_OPTS: dict[str, str] = {}

    def _reader(self, fields: list[tuple[str, str]] | None):
        """Parquet reader for bucket slices. When the caller supplies the
        authoritative ``[(name, spark_type), ...]`` field list (the evolving /
        dynamic states carry it in the manifest/registry), the read uses that
        EXPLICIT schema: Spark skips footer schema inference entirely — in
        particular the distributed ``mergeSchema`` footer-merge job the
        evolving reads otherwise launch per slice (one per trigger on the
        streamed paths). Parquet schema evolution gives the same surface the
        merge+align pair produced: files lacking a column NULL-fill, files
        carrying extra (dropped) columns ignore them."""
        reader = self.spark.read
        if fields is not None:
            return reader.schema(
                ", ".join(f"`{n}` {t}" for n, t in fields)
            )
        for k, v in self._READ_OPTS.items():
            reader = reader.option(k, v)
        return reader

    def read_buckets(
        self, buckets: list[int], fields: list[tuple[str, str]] | None = None
    ) -> DataFrame | None:
        paths = self._bucket_paths(self._load(), buckets)
        if not paths:
            return None
        return self._reader(fields).parquet(*paths)

    def read(self) -> DataFrame | None:
        if not os.path.exists(self._manifest):
            return None
        return self.read_buckets(list(range(self.n_buckets)))

    def manifest_snapshot(self) -> dict:
        """The current manifest as a plain dict — a RETAINED copy of this is
        a point-in-time handle: ``read_asof`` resolves against it as long as
        its version dirs survive (``retain_versions``)."""
        return self._load()

    def _push_history(self, manifest: dict) -> None:
        """Record the (about-to-be-superseded) manifest's pointer map on its
        bounded ``history`` list — called BEFORE a swap mutates it. Each
        entry is a complete point-in-time handle (batch_id + bucket→version
        map, plus the ``schema`` field list when the manifest carries one, so
        an as-of read aligns to the THEN-current schema, not today's);
        trimming to the window is what bounds both the manifest size and,
        via vacuum, the version-dir storage.

        A commit that supersedes NOTHING — ``mark_batch`` on an empty
        micro-batch — does not burn a retention slot (ADVICE r9: N quiet
        batches would otherwise evict every data-bearing retained manifest):
        an entry whose pointer map AND schema equal the newest retained
        entry is ABSORBED into it as a batch range (``batch_id_lo`` ..
        ``batch_id``), which ``manifest_asof`` resolves to the same state."""
        if not self.retain_versions:
            return
        hist = manifest.setdefault("history", [])
        entry = {
            "batch_id": manifest["batch_id"],
            "buckets": dict(manifest["buckets"]),
        }
        if "schema" in manifest:
            entry["schema"] = [list(f) for f in manifest["schema"]]
        if hist and _same_state_entry(hist[-1], entry):
            lo = hist[-1].get("batch_id_lo", hist[-1]["batch_id"])
            entry["batch_id_lo"] = lo
            hist[-1] = entry
        else:
            hist.append(entry)
        n = self._retain_n
        if n is not None:
            del hist[: max(0, len(hist) - n)]

    def retained_batches(self) -> list[int]:
        """Batch ids resolvable by ``manifest_asof`` (oldest→current). An
        entry absorbed no-op batches lists only its newest id; every id
        inside its ``batch_id_lo``..``batch_id`` range still resolves."""
        manifest = self._load()
        return [h["batch_id"] for h in manifest.get("history", [])] + [
            manifest["batch_id"]
        ]

    def manifest_asof(self, batch_id: int) -> dict:
        """The retained manifest snapshot AS OF ``batch_id`` — the state's
        bucket→version map right after that batch committed (a fresh copy on
        every branch — callers may mutate it freely). Fails loudly past the
        retention window (the Delta/Iceberg 'version not in log' error):
        history older than the last N commits has been trimmed and its
        exclusively-referenced version dirs vacuumed."""
        manifest = self._load()
        if manifest["batch_id"] == batch_id:
            out = {"batch_id": batch_id, "buckets": dict(manifest["buckets"])}
            if "schema" in manifest:
                out["schema"] = [list(f) for f in manifest["schema"]]
            return out
        for h in reversed(manifest.get("history", [])):
            if h.get("batch_id_lo", h["batch_id"]) <= batch_id <= h["batch_id"]:
                out = {"batch_id": batch_id, "buckets": dict(h["buckets"])}
                if "schema" in h:
                    out["schema"] = [list(f) for f in h["schema"]]
                return out
        raise ValueError(
            f"as-of batch {batch_id} is not retained — the retention window "
            f"(retain_versions={self.retain_versions!r}) holds batches "
            f"{self.retained_batches()}; older manifests were trimmed and "
            "their version dirs vacuumed"
        )

    def read_asof(
        self,
        manifest: dict,
        buckets: list[int] | None = None,
        fields: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Point-in-time read against a SAVED manifest snapshot (time travel
        over the state's own version history — the manifest maps each bucket
        to the version dir that was current at capture time, so the read is
        exactly the state as of that commit). The manifest must be within
        the retention window: a referenced version dir that no longer exists
        means vacuum ran past the capture, and the read fails loudly instead
        of silently returning a hole (a missing ``_b=`` subdir inside a LIVE
        version dir, by contrast, is a legitimately empty bucket)."""
        if buckets is None:
            buckets = list(range(self.n_buckets))
        need = {
            manifest["buckets"][str(b)]
            for b in buckets
            if str(b) in manifest["buckets"]
        }
        gone = sorted(
            v for v in need if not os.path.isdir(os.path.join(self.root, v))
        )
        if gone:
            raise ValueError(
                f"as-of read references vacuumed version dirs {gone} — the "
                "manifest snapshot is past the retention window "
                f"(retain_versions={self.retain_versions!r})"
            )
        paths = self._bucket_paths(manifest, buckets)
        if not paths:
            return None
        return self._reader(fields).parquet(*paths)

    def mark_batch(self, batch_id: int, extra: dict | None = None) -> None:
        """Advance the manifest's replay gate WITHOUT touching any bucket
        pointer — for micro-batches whose merge is empty (no touched
        buckets). Recording the batch_id keeps ``last_batch()`` in lockstep
        with Spark's streaming checkpoint (monitoring and ``on_batch``
        callbacks see progress), instead of relying on empty replays being
        no-ops. A manifest rename is the whole cost."""
        manifest = self._load()
        self._push_history(manifest)
        manifest["batch_id"] = batch_id
        if extra:
            manifest.update(extra)
        self._swap(manifest)

    def cluster_by_key(self, df: DataFrame) -> DataFrame:
        """Hash-cluster ``df`` into exactly ``n_buckets`` partitions on the
        key columns for a WRITE — partition ``p`` then holds exactly bucket
        ``p``'s keys (Spark's HashPartitioning is ``pmod(hash(cols), n)``,
        the same expression as ``_bucket_col``; a user by-num repartition
        feeding a write directly is honored): one task and one file per
        bucket, clustered by KEY hash instead of by ``hash(_b)`` (the latter
        collides buckets into some tasks and idles others — guide §2.5).
        NOT for merge-join inputs: EnsureRequirements rewrites a by-num
        shuffle feeding a co-partitioned join to ``max(n_buckets,
        spark.sql.shuffle.partitions)`` and pins a rigid count AQE cannot
        coalesce — the merge paths instead let the full-outer join plan its
        own exchanges and pass ``pre_clustered=True`` so the write inherits
        that layout (see ``pipeline.fold_commit``)."""
        from pyspark.sql import functions as F

        return df.repartition(self.n_buckets, *[F.col(k) for k in self.key_cols])

    def commit_buckets(
        self,
        merged: DataFrame,
        buckets: list[int],
        batch_id: int,
        extra: dict | None = None,
        pre_clustered: bool = False,
    ) -> None:
        """Write the merged rows of the touched buckets as a new version,
        re-point only those buckets. Idempotent per batch_id. ``extra``
        entries ride in the same atomic manifest swap (e.g. the evolving
        state's schema registry).

        The write clusters rows by key-hash into ``n_buckets`` partitions
        first (task ``p`` = bucket ``p``), so each bucket dir gets ONE file
        instead of one per (upstream partition × bucket) — file count per
        version stays O(touched buckets). With ``pre_clustered=True`` the
        caller asserts ``merged`` is ALREADY key-clustered (the full-outer
        merge join's own exchanges — see ``pipeline.fold_commit``), and the
        write adds no exchange at all — the partitioned write splits dirs
        correctly from the physical layout the merge already has (file count
        stays O(touched buckets): each bucket's rows sit in the few join
        partitions its key-hashes map to).

        CONTRACT (enforced): every merged row must hash into ``buckets`` —
        a row landing outside would be written but never re-pointed (reads
        would miss it while a stale copy survives via the old pointer), so
        the write is checked against the bucket list and fails loudly
        instead of losing data."""
        version = f"v{batch_id:012d}"
        out = os.path.join(self.root, version)
        clustered = merged if pre_clustered else self.cluster_by_key(merged)
        (
            clustered.withColumn("_b", self._bucket_col())
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(out)
        )
        _assert_buckets_within(out, buckets)
        manifest = self._load()
        self._push_history(manifest)
        for b in buckets:
            manifest["buckets"][str(b)] = version
        manifest["batch_id"] = batch_id
        if extra:
            manifest.update(extra)
        self._swap(manifest)

    def vacuum(self) -> list[str]:
        """Remove version dirs referenced by NEITHER the current manifest NOR
        the retained history window (the OPTIMIZE/VACUUM maintenance analog —
        log compaction for the state). Safe because the manifest swap is
        atomic: readers resolve paths from a manifest snapshot they already
        loaded. With an int retention window the history list is already
        trimmed to the last N commits, so this bounds total storage to
        O(live data + N commits of bucket rewrites); ``retain_versions=True``
        (unbounded) makes it a no-op."""
        if self.retain_versions is True:
            return []
        manifest = self._load()
        referenced = set(manifest["buckets"].values())
        for h in manifest.get("history", []):
            referenced.update(h["buckets"].values())
        return _vacuum_versions(self.root, referenced)

    def compact(self) -> str:
        """OPTIMIZE the state's storage: rewrite the LIVE snapshot as ONE
        fresh version dir (one file per bucket) and re-point every bucket —
        a maintenance commit that NEVER advances the replay gate (batch_id
        unchanged; a maintenance rewrite may not move the stream's resume
        position — the same contract as ``SnapshotState.commit``'s version
        override) and then vacuums the superseded dirs. This executes what
        the compaction planner schedules: after many incremental commits the
        live pointers scatter across as many version dirs as there were
        batches; compaction collapses them to one, bounding file count at
        O(n_buckets) regardless of history length (the Pulsar
        topic-compaction / Delta OPTIMIZE analog, pkg/sink/pulsar.go:143
        broker-side compaction). Retained history entries keep their OLD
        pointer maps and vacuum keeps their dirs — time travel inside the
        window survives compaction. A generation counter names each rewrite
        (``vc{batch}g{N}``) so re-running compaction writes a FRESH dir
        instead of overwriting the manifest-current one in place (mid-write
        crash safety), and the previous compaction dir vacuums away.
        Single-writer maintenance, like rebucket/prune. Returns the new
        version name."""
        manifest = self._load()
        cur = self.read()
        if cur is None:
            raise ValueError("compact: state is uninitialized")
        gen = int(manifest.get("compact_gen", 0)) + 1
        version = f"vc{manifest['batch_id']:012d}g{gen}"
        out = os.path.join(self.root, version)
        (
            # cluster by KEY hash, not by the derived _b value: hashing _b
            # again collides buckets into some tasks and leaves others empty
            # (guide §2.5 synthetic-key collisions); key-clustering gives
            # task p = bucket p exactly — one balanced task and one file per
            # bucket for the full-snapshot rewrite
            self.cluster_by_key(cur)
            .withColumn("_b", self._bucket_col())
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(out)
        )
        # NO history push: compaction changes layout, never content — the
        # pre-compact pointer map describes the same rows, so recording it
        # would burn a retention slot on a no-op (retained entries from real
        # commits keep their old maps, and vacuum keeps their dirs — as-of
        # reads inside the window are untouched)
        for b in range(self.n_buckets):
            if str(b) in manifest["buckets"]:
                manifest["buckets"][str(b)] = version
        manifest["compact_gen"] = gen
        self._swap(manifest)
        self.vacuum()
        return version

    def rebucket(self, new_root: str, new_n_buckets: int) -> "BucketedSnapshotState":
        """Execute the layout migration ``state_bucket_skew_plan`` plans:
        rewrite the live snapshot under a NEW bucket count (one full read +
        one bucket-clustered write — O(table) by nature, it IS the
        migration), into a fresh root. The source state is untouched, so
        readers keep resolving the old manifest during the copy and the
        cut-over is the caller swapping roots; the replay gate (batch_id)
        carries over so a resumed stream continues exactly where the old
        layout stopped. Single-writer maintenance, like prune/compact."""
        new = BucketedSnapshotState(
            self.spark, new_root, self.key, new_n_buckets,
            retain_versions=self.retain_versions,
        )
        cur = self.read()
        if cur is None:
            raise ValueError("rebucket: source state is uninitialized")
        new.initialize(cur)
        manifest = new._load()
        manifest["batch_id"] = self.last_batch()
        new._swap(manifest)
        return new


def _assert_buckets_within(version_dir: str, buckets: list[int]) -> None:
    """Enforce the commit contract: the partitioned write may only have
    produced ``_b=`` dirs inside the touched-bucket list. A violation means
    a caller handed rows that hash outside the buckets it probed — those
    rows would be silently stranded (written, never re-pointed), so fail
    before the manifest swings (the orphan version dir vacuums away)."""
    allowed = {str(b) for b in buckets}
    written = {
        name.split("=", 1)[1]
        for name in os.listdir(version_dir)
        if name.startswith("_b=")
    }
    stray = sorted(written - allowed, key=int)
    if stray:
        raise ValueError(
            f"commit wrote rows into buckets {stray} outside the touched "
            f"list {sorted(buckets)} — the merge produced keys the probe "
            f"never saw; refusing to strand them ({version_dir})"
        )


def align_to_fields(df: DataFrame, fields: list[tuple[str, str]]) -> DataFrame:
    """Project ``df`` onto an authoritative ``[(name, spark_type), ...]`` field
    list: absent columns NULL-fill (lazy schema evolution — old bucket files
    predate an ALTER ADD), extra columns disappear (post-DROP files still
    carry them). Shared by EvolvingBucketedState and the dynamic multi-table
    state."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    for name, spark_type in fields:
        if name not in have:
            df = df.withColumn(name, F.lit(None).cast(spark_type))
    return df.select(*[n for n, _ in fields])


class EvolvingBucketedState(BucketedSnapshotState):
    """BucketedSnapshotState whose row schema may EVOLVE mid-stream (the
    in-band DDL path, SURVEY §7 P5): a schema change is a VERSION BOUNDARY —
    buckets touched after the ALTER are written with the new schema, while
    untouched buckets keep their old files until their next merge (lazy
    evolution).

    Two additions make that safe:
    - reads merge schemas across version dirs (``mergeSchema``), so a slice
      spanning pre- and post-ALTER buckets surfaces the union of columns,
    - the CURRENT authoritative field list ``[(name, spark_type), ...]``
      rides in the manifest (swapped atomically with the data pointers), and
      ``aligned`` projects any slice onto it — added columns NULL-fill
      (exactly what the target table shows after ALTER TABLE ADD COLUMN,
      pkg/sink/postgres.go:357-393), dropped columns disappear even while
      old files still carry them."""

    _READ_OPTS = {"mergeSchema": "true"}

    def schema_fields(self) -> list[tuple[str, str]] | None:
        raw = self._load().get("schema")
        return [tuple(f) for f in raw] if raw is not None else None

    def aligned(self, df: DataFrame | None, fields: list[tuple[str, str]]) -> DataFrame | None:
        return align_to_fields(df, fields) if df is not None else None

    def read(self) -> DataFrame | None:
        # the manifest's authoritative field list doubles as the EXPLICIT
        # read schema (parquet schema evolution NULL-fills absent columns and
        # ignores dropped ones), so the read skips the distributed
        # mergeSchema footer job entirely; pre-schema manifests fall back to
        # the merge+align pair
        fields = self.schema_fields()
        df = self.read_buckets(list(range(self.n_buckets)), fields=fields)
        return self.aligned(df, fields) if fields is not None else df

    def read_asof(
        self,
        manifest: dict,
        buckets: list[int] | None = None,
        fields: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Point-in-time read aligned to the schema AS OF that commit: each
        retained history entry carries the field list that was authoritative
        when it was current (``_push_history``), so an as-of read crossing an
        ALTER shows the THEN-current columns — an ADD later than the pinned
        batch is absent, a column DROPped later is still present (filled from
        the old files; NULL where a bucket had already been rewritten). Falls
        back to the current field list only for pre-schema-snapshot manifests
        (the r9 on-disk format, documented divergence now closed). The field
        list is also the explicit read schema (no footer-merge job)."""
        raw = manifest.get("schema")
        if fields is None:
            fields = (
                [tuple(f) for f in raw] if raw is not None else self.schema_fields()
            )
        df = super().read_asof(manifest, buckets, fields=fields)
        return self.aligned(df, fields) if fields is not None else df
