"""Multi-table streaming apply with cross-table batch atomicity.

The reference applies each transaction — which may touch MANY tables — in one
pgconn pipeline, so downstream never observes half a transaction
(pkg/sink/postgres.go:207-278, 599-645). The Spark form relaxes tx granularity
to micro-batch granularity (SURVEY §7 "genuinely hard" #1), but the CROSS-TABLE
guarantee is kept: every table's snapshot advances under ONE manifest swung by
one atomic rename per batch. A crash between per-table writes leaves the
manifest on the previous batch — readers never see customer applied but orders
not.

Scale: per batch each table's subset folds independently (same O(touched)
shapes as the single-table pipeline); tables could be bucketed individually.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pgcapture_spark.operators.apply import cdc_apply

_LOG = logging.getLogger(__name__)


class MultiTableState:
    """N co-versioned named tables under one manifest — the compat (full-
    rewrite) path; the scale path is BucketedMultiTableState below."""

    def __init__(self, spark: SparkSession, root: str, tables: list[str]):
        self.spark = spark
        self.root = root
        self.tables = list(tables)
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def last_batch(self) -> int:
        if not os.path.exists(self._manifest):
            return -1
        with open(self._manifest) as f:
            return json.load(f)["batch_id"]

    def read(self) -> dict[str, DataFrame] | None:
        if not os.path.exists(self._manifest):
            return None
        with open(self._manifest) as f:
            version = json.load(f)["version"]
        base = os.path.join(self.root, version)
        return {
            t: self.spark.read.parquet(os.path.join(base, t)) for t in self.tables
        }

    def commit(self, snapshots: dict[str, DataFrame], batch_id: int) -> None:
        version = f"v{batch_id:012d}"
        base = os.path.join(self.root, version)
        for t in self.tables:
            snapshots[t].write.mode("overwrite").parquet(os.path.join(base, t))
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)

    def vacuum(self) -> list[str]:
        """Remove superseded version dirs (state storage stays O(live data))."""
        from pgcapture_spark.streaming.state import _vacuum_versions

        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest) as f:
            current = json.load(f)["version"]
        return _vacuum_versions(self.root, {current})


def _key_list(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


class BucketedMultiTableState:
    """N KEY-BUCKETED tables under ONE atomic manifest — the multi-table form
    of ``BucketedSnapshotState`` (streaming/state.py): each table's snapshot is
    partitioned by ``pmod(hash(key...), n_buckets)``, a micro-batch rewrites
    only the buckets its change set touches, and every table's bucket pointers
    swing in one manifest rename (the cross-table atomicity the reference gets
    from one pgconn pipeline per tx, pkg/sink/postgres.go:599-645).

    Manifest: ``{"batch_id": N, "buckets": {table: {bucket: version}}}``.
    Untouched tables/buckets carry their pointers forward untouched, so at
    100 TB a trigger that changes k keys across m tables costs ~k bucket
    rewrites — independent of total snapshot size."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        tables: list[str],
        keys: dict[str, str | list[str]],
        n_buckets: int = 32,
        retain_versions: bool | int = False,
    ):
        self.spark = spark
        self.root = root
        self.tables = list(tables)
        self.keys = dict(keys)
        self.n_buckets = n_buckets
        # same retention-window contract as BucketedSnapshotState: int N
        # keeps the last N superseded manifests (every table's pointer map
        # together — a retained entry is a CONSISTENT cross-table snapshot,
        # because all tables swing in one rename), True keeps all, False none
        self.retain_versions = retain_versions
        os.makedirs(root, exist_ok=True)

    @property
    def _retain_n(self) -> int | None:
        r = self.retain_versions
        if r is True:
            return None
        return int(r) if r else 0

    def _push_history(self, manifest: dict) -> None:
        """See BucketedSnapshotState._push_history — here each entry carries
        EVERY table's bucket→version map (one atomic cross-table handle),
        plus the relation ``registry`` snapshot when the manifest carries one
        (the dynamic state), so an as-of read across a schema evolution
        aligns to the THEN-current field lists. A no-op commit (mark_batch /
        pointer-identical state) is absorbed into the newest retained entry
        as a batch range instead of burning a retention slot (ADVICE r9)."""
        from pgcapture_spark.streaming.state import _same_state_entry

        if not self.retain_versions:
            return
        hist = manifest.setdefault("history", [])
        entry = {
            "batch_id": manifest["batch_id"],
            "buckets": {t: dict(m) for t, m in manifest["buckets"].items()},
        }
        if "registry" in manifest:
            entry["registry"] = json.loads(json.dumps(manifest["registry"]))
        if hist and _same_state_entry(hist[-1], entry):
            entry["batch_id_lo"] = hist[-1].get("batch_id_lo", hist[-1]["batch_id"])
            hist[-1] = entry
        else:
            hist.append(entry)
        n = self._retain_n
        if n is not None:
            del hist[: max(0, len(hist) - n)]

    def retained_batches(self) -> list[int]:
        manifest = self._load()
        return [h["batch_id"] for h in manifest.get("history", [])] + [
            manifest["batch_id"]
        ]

    def manifest_asof(self, batch_id: int) -> dict:
        """The retained CROSS-TABLE manifest as of ``batch_id`` — every
        table's pointer map as committed by that batch's single atomic
        rename, so an as-of read over several tables is transactionally
        consistent (a fresh copy on every branch — callers may mutate).
        Fails loudly past the retention window."""
        manifest = self._load()
        if manifest["batch_id"] == batch_id:
            out = {
                "batch_id": batch_id,
                "buckets": {t: dict(m) for t, m in manifest["buckets"].items()},
            }
            if "registry" in manifest:
                out["registry"] = json.loads(json.dumps(manifest["registry"]))
            return out
        for h in reversed(manifest.get("history", [])):
            if h.get("batch_id_lo", h["batch_id"]) <= batch_id <= h["batch_id"]:
                out = {
                    "batch_id": batch_id,
                    "buckets": {t: dict(m) for t, m in h["buckets"].items()},
                }
                if "registry" in h:
                    out["registry"] = json.loads(json.dumps(h["registry"]))
                return out
        raise ValueError(
            f"as-of batch {batch_id} is not retained — the retention window "
            f"(retain_versions={self.retain_versions!r}) holds batches "
            f"{self.retained_batches()}"
        )

    def read_asof(
        self,
        table: str,
        manifest: dict,
        buckets: list[int] | None = None,
        fields: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Point-in-time read of ONE table against a retained cross-table
        manifest (``manifest_asof``). A referenced version dir that vacuum
        removed fails loudly; a missing ``_b=`` subdir inside a live version
        is a legitimately empty bucket. ``fields`` (when the caller knows the
        authoritative field list) becomes the explicit read schema — no
        footer-merge job (see state.BucketedSnapshotState._reader)."""
        if buckets is None:
            buckets = list(range(self.n_buckets))
        per_t = manifest["buckets"].get(table, {})
        need = {per_t[str(b)] for b in buckets if str(b) in per_t}
        gone = sorted(
            v for v in need if not os.path.isdir(os.path.join(self.root, v))
        )
        if gone:
            raise ValueError(
                f"as-of read of {table!r} references vacuumed version dirs "
                f"{gone} — the manifest snapshot is past the retention window "
                f"(retain_versions={self.retain_versions!r})"
            )
        paths = []
        for b in buckets:
            ver = per_t.get(str(b))
            if ver is not None:
                p = os.path.join(self.root, ver, table, f"_b={b}")
                if os.path.isdir(p):
                    paths.append(p)
        if not paths:
            return None
        return self._reader(fields).parquet(*paths)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def _load(self) -> dict:
        if not os.path.exists(self._manifest):
            return {"batch_id": -1, "buckets": {t: {} for t in self.tables}}
        with open(self._manifest) as f:
            return json.load(f)

    def last_batch(self) -> int:
        return self._load()["batch_id"]

    def initialized(self) -> bool:
        return os.path.exists(self._manifest)

    def _bucket_col(self, table: str):
        return F.pmod(
            F.hash(*[F.col(k) for k in _key_list(self.keys[table])]),
            F.lit(self.n_buckets),
        )

    def touched_buckets(self, table: str, keys_df: DataFrame) -> list[int]:
        row = keys_df.select(self._bucket_col(table).alias("_b")).agg(
            F.collect_set("_b").alias("bs")
        ).collect()[0]
        return sorted(row["bs"])

    def touched_buckets_multi(
        self, keys_dfs: dict[str, DataFrame]
    ) -> dict[str, list[int]]:
        """Resolve SEVERAL tables' touched buckets in ONE driver job: each
        table's bucket-id projection is tagged and unioned, one distinct
        collect bounded by tables × n_buckets rows (the same fuse
        fold_commit_multi / apply_stream_dynamic use). Every requested table
        gets an entry (``[]`` when its key set is empty) — per-trigger probe
        job count stays flat in table count instead of one collect per
        table. Each ``keys_df`` must already carry the table's key
        column(s) under their state names (callers rename delta join keys
        first, e.g. ΔO's o_custkey → c_custkey for the customer probe)."""
        probe = None
        for t, kdf in keys_dfs.items():
            part = kdf.select(
                F.lit(t).alias("_t"), self._bucket_col(t).alias("_b")
            )
            probe = part if probe is None else probe.unionByName(part)
        out: dict[str, list[int]] = {t: [] for t in keys_dfs}
        if probe is not None:
            for r in probe.distinct().collect():
                out[r["_t"]].append(r["_b"])
        return {t: sorted(bs) for t, bs in out.items()}

    def mark_batch(self, batch_id: int) -> None:
        """Advance the replay gate without touching bucket pointers — for
        micro-batches whose merge set is empty (see
        BucketedSnapshotState.mark_batch)."""
        manifest = self._load()
        self._push_history(manifest)
        manifest["batch_id"] = batch_id
        self._swap(manifest)

    def initialize(self, snapshots: dict[str, DataFrame]) -> None:
        """Seed every table's buckets from its initial snapshot (one-time
        O(snapshot) write — the backfill; every later trigger is O(touched)).
        Tables seed CONCURRENTLY — independent jobs, same as commit()."""
        from concurrent.futures import ThreadPoolExecutor

        def _seed(t: str) -> None:
            (
                snapshots[t]
                .withColumn("_b", self._bucket_col(t))
                .write.mode("overwrite")
                .partitionBy("_b")
                .parquet(os.path.join(self.root, "vinit", t))
            )

        # a table absent from ``snapshots`` starts with no data files (its
        # pointers still reference vinit; reads of never-written buckets are
        # None) — the shape rebucket needs for an empty source table. Partial
        # dicts are allowed; UNKNOWN keys still fail loudly (ADVICE r9: a
        # misspelled table key must not become a silently empty table)
        unknown = sorted(set(snapshots) - set(self.tables))
        if unknown:
            raise ValueError(
                f"initialize: snapshot keys {unknown} are not declared tables "
                f"{sorted(self.tables)}"
            )
        seed_tables = [t for t in self.tables if t in snapshots]
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(seed_tables) or 1))) as ex:
            list(ex.map(_seed, seed_tables))
        buckets = {
            t: {str(b): "vinit" for b in range(self.n_buckets)} for t in self.tables
        }
        self._swap({"batch_id": -1, "buckets": buckets})

    def _swap(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest)

    _READ_OPTS: dict[str, str] = {}

    def _reader(self, fields: list[tuple[str, str]] | None):
        """See ``state.BucketedSnapshotState._reader``: an explicit field
        list skips footer schema inference — in particular the distributed
        mergeSchema job the dynamic state otherwise pays per bucket read."""
        reader = self.spark.read
        if fields is not None:
            return reader.schema(", ".join(f"`{n}` {t}" for n, t in fields))
        for k, v in self._READ_OPTS.items():
            reader = reader.option(k, v)
        return reader

    def cluster_by_key(self, table: str, df: DataFrame) -> DataFrame:
        """Hash-cluster ``df`` into exactly ``n_buckets`` partitions on the
        table's key columns for a WRITE (partition p = bucket p — Spark
        HashPartitioning is the same ``pmod(hash, n)`` as ``_bucket_col``,
        and a user by-num repartition feeding a write directly is honored):
        one task and one file per bucket, clustered by KEY hash instead of
        by ``hash(_b)`` (the latter collides buckets into some tasks and
        idles others — guide §2.5). NOT for merge-join inputs: there
        EnsureRequirements rewrites the by-num shuffle to
        ``max(n_buckets, spark.sql.shuffle.partitions)`` and pins a rigid
        count AQE cannot coalesce — the merge paths instead let the join
        plan its own exchanges and pass ``pre_clustered=True`` to inherit
        that layout (see ``fold_commit``)."""
        return df.repartition(
            self.n_buckets, *[F.col(k) for k in _key_list(self.keys[table])]
        )

    def read_buckets(
        self,
        table: str,
        buckets: list[int],
        fields: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        manifest = self._load()
        paths = []
        for b in buckets:
            ver = manifest["buckets"].get(table, {}).get(str(b))
            if ver is not None:
                p = os.path.join(self.root, ver, table, f"_b={b}")
                if os.path.isdir(p):
                    paths.append(p)
        if not paths:
            return None
        return self._reader(fields).parquet(*paths)

    def read(self) -> dict[str, DataFrame] | None:
        if not os.path.exists(self._manifest):
            return None
        return {
            t: self.read_buckets(t, list(range(self.n_buckets))) for t in self.tables
        }

    def _fuse_groups(
        self, merged: dict[str, tuple[DataFrame, list[int]]]
    ) -> list[list[str]]:
        """Partition the commit's tables into write groups: tables sharing
        the SAME touched-bucket list, the same bucketing key columns, and a
        SUBSET schema (one table's column:dtype set contained in the
        other's) write as ONE job — the tri-table MV consumers' by_group
        (key, group, v) / support (key, group, v, _th) pair, same group key
        and same buckets every trigger. The subset rule keeps the union
        dense: the subset table's files gain only the superset's few extra
        columns (NULL), which its readers' explicit selects prune. Tables
        sharing merely a key (minmax by_group vs its 6-column support) or
        nothing (orders vs customer) never fuse — a sparse union frame is
        not a saving, and extra columns leaking into an unselective reader
        broke exactly that pair."""
        items = list(merged.items())
        groups: list[list[str]] = []
        used: set[str] = set()
        for i, (t, (df, buckets)) in enumerate(items):
            if t in used:
                continue
            grp = [t]
            used.add(t)
            d1 = set(df.dtypes)
            for t2, (df2, b2) in items[i + 1 :]:
                if t2 in used or sorted(b2) != sorted(buckets):
                    continue
                if _key_list(self.keys[t2]) != _key_list(self.keys[t]):
                    continue
                d2 = set(df2.dtypes)
                if not (d1 <= d2 or d2 <= d1):
                    continue
                grp.append(t2)
                used.add(t2)
            groups.append(grp)
        return groups

    def commit(
        self,
        merged: dict[str, tuple[DataFrame, list[int]]],
        batch_id: int,
        pre_clustered: bool = False,
    ) -> None:
        """Write each table's merged touched-bucket rows under one new version
        dir, then swing ALL bucket pointers in one atomic manifest rename.
        Idempotent per batch_id. See :meth:`write_tables` (the write phase)
        and :meth:`swap_committed` (the pointer swap) — consumers whose later
        tables' content DEPENDS on observations riding the earlier tables'
        writes (streaming/mv.py) call the two phases directly; atomicity is
        identical because only the final swap publishes anything."""
        self.write_tables(merged, batch_id, pre_clustered=pre_clustered)
        self.swap_committed({t: b for t, (_, b) in merged.items()}, batch_id)

    def write_tables(
        self,
        merged: dict[str, tuple[DataFrame, list[int]]],
        batch_id: int,
        pre_clustered: bool = False,
    ) -> None:
        """The WRITE phase of a (possibly staged) commit: write the merged
        bucket files under this batch's version dir WITHOUT touching the
        manifest — invisible to every reader until :meth:`swap_committed`,
        and crash-idempotent (a replayed batch rewrites the same dirs).
        Independent tables write CONCURRENTLY
        (separate jobs, overlapped by the scheduler); tables sharing bucket
        list + key + compatible schema FUSE into one write job tagged by a
        ``_tbl`` partition column whose dirs are renamed into the per-table
        layout (one job instead of two — per-trigger fixed cost, ADVICE r7).
        ``pre_clustered=True`` asserts every merged frame is ALREADY
        key-clustered (the full-outer merge join's own exchanges — see
        ``pipeline.fold_commit``) — the write then adds NO exchange: the
        partitioned write splits dirs from the layout the merge already has,
        one network crossing for each merged frame instead of two (guide
        §2.4).
        Every table's rows must hash into its passed bucket list — enforced
        post-write, see ``state._assert_buckets_within`` (a stray row would
        be stranded)."""
        from concurrent.futures import ThreadPoolExecutor

        from pgcapture_spark.streaming.state import _assert_buckets_within

        version = f"v{batch_id:012d}"

        def _write_single(t: str) -> None:
            df, buckets = merged[t]
            out = os.path.join(self.root, version, t)
            # cluster by KEY hash into n_buckets (task p = bucket p): one
            # task and one file per touched bucket — unless the merge join
            # already key-clustered the frame, in which case the layout is
            # inherited and the write adds no exchange
            clustered = df if pre_clustered else self.cluster_by_key(t, df)
            (
                clustered.withColumn("_b", self._bucket_col(t))
                .write.mode("overwrite")
                .partitionBy("_b")
                .parquet(out)
            )
            _assert_buckets_within(out, buckets)

        def _write_fused(grp: list[str]) -> None:
            buckets = merged[grp[0]][1]
            fused = None
            for t in grp:
                part = (
                    merged[t][0]
                    .withColumn("_b", self._bucket_col(t))
                    .withColumn("_tbl", F.lit(t))
                )
                fused = (
                    part
                    if fused is None
                    else fused.unionByName(part, allowMissingColumns=True)
                )
            if not pre_clustered:
                # the fuse rule guarantees the group shares its key columns,
                # so ONE key-clustered exchange over the union gives task
                # p = bucket p for every member table (hashing the derived
                # _b again would collide buckets into some tasks)
                fused = fused.repartition(
                    self.n_buckets,
                    *[F.col(k) for k in _key_list(self.keys[grp[0]])],
                )
            # pre-clustered children concatenate partition-wise through the
            # union — no exchange; partitionBy splits (_tbl, _b) dirs from
            # the physical layout either way
            tmp = os.path.join(self.root, version, "__fused_" + "_".join(grp))
            (
                fused.write.mode("overwrite")
                .partitionBy("_tbl", "_b")
                .parquet(tmp)
            )
            for t in grp:
                src = os.path.join(tmp, f"_tbl={t}")
                dst = os.path.join(self.root, version, t)
                if os.path.isdir(src):
                    # idempotent replay: the same batch id re-fuses into the
                    # same version dir — clear a previous rename's target
                    if os.path.isdir(dst):
                        import shutil as _sh

                        _sh.rmtree(dst)
                    os.rename(src, dst)
                    _assert_buckets_within(dst, buckets)
                # a table whose merged slice is EMPTY writes no _tbl dir:
                # its pointers still re-point below and reads skip the
                # missing _b dirs (the empty-slice contract)
            import shutil as _sh

            _sh.rmtree(tmp, ignore_errors=True)  # _SUCCESS + empty leftovers

        def _write(grp: list[str]) -> None:
            if len(grp) == 1:
                _write_single(grp[0])
            else:
                _write_fused(grp)

        groups = self._fuse_groups(merged)
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(groups)))) as ex:
            list(ex.map(_write, groups))

    def swap_committed(
        self, table_buckets: dict[str, list[int]], batch_id: int
    ) -> None:
        """The PUBLISH phase: ONE atomic manifest rename re-pointing every
        staged table's touched buckets at this batch's version dir. Must
        follow the :meth:`write_tables` call(s) for exactly these tables —
        a crash before this point leaves the previous manifest (and its
        batch_id gate) fully intact."""
        version = f"v{batch_id:012d}"
        manifest = self._load()
        self._push_history(manifest)
        for t, buckets in table_buckets.items():
            for b in buckets:
                manifest["buckets"].setdefault(t, {})[str(b)] = version
        manifest["batch_id"] = batch_id
        self._swap(manifest)

    def vacuum(self) -> list[str]:
        """Remove version dirs referenced by neither the current pointers nor
        the retained history window (see BucketedSnapshotState.vacuum)."""
        from pgcapture_spark.streaming.state import _vacuum_versions

        if self.retain_versions is True:
            return []
        manifest = self._load()
        referenced = {
            v for per_t in manifest["buckets"].values() for v in per_t.values()
        }
        for h in manifest.get("history", []):
            for per_t in h["buckets"].values():
                referenced.update(per_t.values())
        return _vacuum_versions(self.root, referenced)

    def compact(self) -> str:
        """OPTIMIZE the whole multi-table state's storage (the multi-table
        form of ``BucketedSnapshotState.compact``): every table's live
        snapshot is rewritten bucket-clustered under ONE fresh
        generation-named version dir (tables write concurrently, one file
        per bucket per table), then ALL tables' pointers swing in one atomic
        manifest rename WITHOUT advancing the replay gate, and vacuum
        removes dirs referenced by neither the new pointers nor retained
        history. File count collapses to O(tables × n_buckets) regardless
        of how many commits accumulated. On the dynamic subclass the
        learned registry rides the same swap (``_swap``), so a stream
        resuming on compacted state rehydrates unchanged. Returns the new
        version name."""
        from concurrent.futures import ThreadPoolExecutor

        manifest = self._load()
        gen = int(manifest.get("compact_gen", 0)) + 1
        version = f"vc{manifest['batch_id']:012d}g{gen}"

        def _rewrite(t: str) -> None:
            cur = self.read_buckets(
                t, list(range(self.n_buckets)), fields=self._read_fields(t)
            )
            if cur is None:
                return  # never-written table: pointers re-point to nothing
            (
                # key-clustered (task p = bucket p), not hash-of-_b — the
                # latter collides buckets into some tasks and idles others
                self.cluster_by_key(t, self._compact_frame(t, cur))
                .withColumn("_b", self._bucket_col(t))
                .write.mode("overwrite")
                .partitionBy("_b")
                .parquet(os.path.join(self.root, version, t))
            )

        tables = [t for t in self.tables if t in manifest["buckets"]]
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(tables)))) as ex:
            list(ex.map(_rewrite, tables))
        # no history push — compaction supersedes layout, never content
        # (see BucketedSnapshotState.compact)
        for t in tables:
            written = os.path.isdir(os.path.join(self.root, version, t))
            for b in list(manifest["buckets"].get(t, {})):
                if written:
                    manifest["buckets"][t][b] = version
        manifest["compact_gen"] = gen
        self._swap(manifest)
        self.vacuum()
        return version

    def _read_fields(self, t: str) -> list[tuple[str, str]] | None:
        """Hook: the authoritative field list to read table ``t`` with (an
        explicit schema skips footer inference). None = infer from footers
        (the static state's schemas never evolve, one footer suffices)."""
        return None

    def _compact_frame(self, t: str, df: DataFrame) -> DataFrame:
        """Hook: the frame compaction physically rewrites for table ``t``.
        The dynamic subclass aligns to the current registry field list —
        compaction is when lazy schema evolution CATCHES UP on disk
        (post-DROP files stop carrying dead columns, post-ADD files gain
        the real NULL column instead of merge-schema absence)."""
        return df

    def rebucket(
        self, new_root: str, new_n_buckets: int
    ) -> "BucketedMultiTableState":
        """Execute a bucket-layout migration for the WHOLE multi-table state
        (the multi-table form of BucketedSnapshotState.rebucket,
        state.py): every table's live snapshot is rewritten bucket-clustered
        under the new count into a fresh root — one full read + one write
        per table, O(state) being the floor for a migration — while the
        source stays untouched (readers keep resolving its manifest during
        the copy) and the replay gate carries over, so a resumed stream and
        every consumer view continue exactly where the old layout stopped.
        Cut-over is the caller swapping roots. Single-writer maintenance."""
        new = BucketedMultiTableState(
            self.spark, new_root, self.tables, self.keys, new_n_buckets,
            retain_versions=self.retain_versions,
        )
        return self._rebucket_into(new)

    def _rebucket_into(self, new: "BucketedMultiTableState"):
        cur = self.read()
        if cur is None:
            raise ValueError("rebucket: source state is uninitialized")
        new.initialize(
            {t: df for t, df in cur.items() if df is not None and t in new.keys}
        )
        manifest = new._load()
        manifest["batch_id"] = self.last_batch()
        new._swap(manifest)
        return new


def fold_commit_multi(
    state,
    initial_snapshots: dict[str, DataFrame],
    per_table_changes: dict[str, DataFrame],
    keys: dict[str, str | list[str]],
    cols: dict[str, list[str]],
    batch_id: int,
    touched: dict[str, list[int]] | None = None,
) -> None:
    """Multi-table analog of ``pipeline.fold_commit``: fold every table's
    change rows to final per-key images, merge each into its snapshot slice,
    and advance ALL tables under one atomic manifest. Dispatches on the
    state's granularity (BucketedMultiTableState → only touched buckets read
    and rewritten; MultiTableState → full rewrite compat path). Both vacuum
    superseded versions after the swap.

    ``touched``: precomputed per-table touched-bucket ids (the wire consumer
    rides tagged collect_sets on its protocol probe —
    ``pipeline._wire_key_bucket_agg``); the fused cross-table probe job is
    then skipped, and the folded images are not persisted (each feeds
    exactly one merge join)."""
    from pgcapture_spark.operators.apply import cdc_apply, last_image, merge_images

    if not isinstance(state, BucketedMultiTableState):
        current = state.read()
        if current is None:
            current = initial_snapshots
        new = {
            t: cdc_apply(current[t], per_table_changes[t], keys[t], cols[t])
            for t in state.tables
        }
        state.commit(new, batch_id)
        state.vacuum()
        return

    seeds = {
        t: initial_snapshots[t].select(*_key_list(keys[t]), *cols[t])
        for t in state.tables
    }
    if not state.initialized():
        state.initialize(seeds)
    precomputed = touched is not None
    imgs = {
        t: last_image(per_table_changes[t], keys[t], cols[t])
        for t in state.tables
    }
    if not precomputed:
        imgs = {t: img.persist() for t, img in imgs.items()}
    try:
        if precomputed:
            touched = {t: bs for t, bs in touched.items() if bs}
        else:
            # ONE driver-side job resolves every table's touched buckets
            # (bounded by tables × n_buckets rows) — per-trigger job count
            # stays flat in table count instead of one distinct-collect per
            # table
            probe = None
            for t in state.tables:
                part = imgs[t].select(
                    F.lit(t).alias("_t"), state._bucket_col(t).alias("_b")
                )
                probe = part if probe is None else probe.unionByName(part)
            touched = {}
            for r in probe.distinct().collect():
                touched.setdefault(r["_t"], []).append(r["_b"])
        merged: dict[str, tuple[DataFrame, list[int]]] = {}
        for t, buckets in sorted(touched.items()):
            buckets = sorted(buckets)
            # the seed schema doubles as the explicit read schema (the
            # bucket files carry exactly those columns/types) — no
            # per-trigger footer inference
            current = state.read_buckets(t, buckets, fields=seeds[t].dtypes)
            base = (
                current.select(*_key_list(keys[t]), *cols[t])
                if current is not None
                else seeds[t].limit(0)
            )
            # the full-outer merge join's own exchanges key-cluster the
            # output, so the commit write inherits the layout and adds no
            # exchange (see pipeline.fold_commit)
            merged[t] = (
                merge_images(base, imgs[t], keys[t], cols[t]),
                buckets,
            )
        if merged:
            state.commit(merged, batch_id, pre_clustered=True)
            state.vacuum()
        else:
            # no table touched — manifest rename only, keeps last_batch()
            # in lockstep with the streaming checkpoint
            state.mark_batch(batch_id)
    finally:
        if not precomputed:
            for img in imgs.values():
                img.unpersist()


def apply_stream_multi_table(
    feed_stream: DataFrame,
    state: MultiTableState,
    initial_snapshots: dict[str, DataFrame],
    keys: dict[str, str | list[str]],
    cols: dict[str, list[str]],
    checkpoint_dir: str,
    table_col: str = "table_name",
) -> StreamingQuery:
    """foreachBatch: split the typed multi-table feed by table, fold each
    table's events onto its snapshot, commit ALL tables atomically."""

    def _key_cols(t: str) -> list[str]:
        k = keys[t]
        return [k] if isinstance(k, str) else list(k)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return  # replayed batch — every table already advanced together
        subs = {
            t: batch_df.where(F.col(table_col) == F.lit(t)).select(
                "ord", "op", "present", *_key_cols(t), *cols[t]
            )
            for t in state.tables
        }
        fold_commit_multi(state, initial_snapshots, subs, keys, cols, batch_id)

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class DynamicMultiTableState(BucketedMultiTableState):
    """BucketedMultiTableState whose table set GROWS mid-stream — the scale
    form of the dynamic relation-learning apply (the r7 verdict's last
    full-rewrite consumer, closed): every learned table is key-bucketed, a
    micro-batch reads and rewrites only the buckets its change set touches,
    and the relation registry rides the SAME atomic manifest as the bucket
    pointers — a restart rehydrates learned tables without re-observing their
    CREATE TABLE / Relation events (which live in already-committed, skipped
    batches).

    Schema evolution (ALTER / re-sent Relation message) is lazy, exactly like
    EvolvingBucketedState: buckets written after the refresh carry the new
    shape, untouched buckets keep their old files, reads merge schemas and
    align to the registry's CURRENT field list."""

    _READ_OPTS = {"mergeSchema": "true"}

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        registry,
        n_buckets: int = 32,
        retain_versions: bool | int = False,
    ):
        # same retention-window contract as the static multi-table state: a
        # retained entry snapshots every LEARNED table's pointers together
        # AND the registry as of that commit (_push_history), so an as-of
        # read across a schema evolution aligns to the THEN-current field
        # list — read_asof below (closes the r9 schema-as-of divergence)
        super().__init__(
            spark, root, [], {}, n_buckets, retain_versions=retain_versions
        )
        self.registry = registry
        self._rehydrate()
        self.adopt_tables()

    def _rehydrate(self) -> None:
        from pgcapture_spark.streaming.registry import RelationRegistry

        if os.path.exists(self._manifest):
            with open(self._manifest) as f:
                m = json.load(f)
            if "registry" in m:
                self.registry = RelationRegistry.from_dict(m["registry"])

    def _swap(self, manifest: dict) -> None:
        # the registry swings with the bucket pointers — one atomic rename
        manifest["registry"] = self.registry.to_dict()
        super()._swap(manifest)

    def adopt_tables(self) -> None:
        """Sync the bucketed table set with the registry's keyed relations.
        Composite replica identities bucket on the hash of ALL key columns —
        the same contract as the typed pipeline (state.py:117-121; the
        reference's identity may be any column set,
        pkg/decode/schema.go:161-191). Only KEYLESS relations are
        quarantined (logged, never applied — with no replica identity there
        is nothing to merge on; the reference likewise cannot apply a
        REPLICA IDENTITY NOTHING table's updates)."""
        for t in self.registry.tables():
            if t in self.keys:
                continue
            key_cols = self.registry.key(t)
            if not key_cols:
                _LOG.warning(
                    "DynamicMultiTableState: quarantining keyless relation %r"
                    " — no replica identity to merge on",
                    t,
                )
                continue
            self.tables.append(t)
            self.keys[t] = key_cols[0] if len(key_cols) == 1 else list(key_cols)

    def _fields_spark(self, t: str) -> list[tuple[str, str]]:
        from pgcapture_spark.functions.pgtypes import spark_type_for_oid

        return [(n, spark_type_for_oid(oid)) for n, oid in self.registry.fields(t)]

    def rebucket(self, new_root: str, new_n_buckets: int) -> "DynamicMultiTableState":
        """Layout migration carrying the learned relation registry: the new
        root's manifest swaps registry + pointers together (``_swap``), so a
        stream resuming on the migrated state rehydrates every learned
        relation without re-observing its CREATE/Relation events."""
        new = DynamicMultiTableState(
            self.spark,
            new_root,
            self.registry,
            n_buckets=new_n_buckets,
            retain_versions=self.retain_versions,
        )
        return self._rebucket_into(new)

    def _read_fields(self, t: str) -> list[tuple[str, str]] | None:
        return self._fields_spark(t) if t in self.keys else None

    def _compact_frame(self, t: str, df: DataFrame) -> DataFrame:
        from pgcapture_spark.streaming.state import align_to_fields

        return (
            align_to_fields(df, self._fields_spark(t)) if t in self.keys else df
        )

    def registry_asof(self, manifest: dict):
        """The relation registry AS OF a retained manifest (``manifest_asof``
        copies it onto the handle). Pre-snapshot manifests (r9 on-disk
        format) fall back to the current registry."""
        from pgcapture_spark.streaming.registry import RelationRegistry

        raw = manifest.get("registry")
        return RelationRegistry.from_dict(raw) if raw is not None else self.registry

    def read_asof(
        self,
        table: str,
        manifest: dict,
        buckets: list[int] | None = None,
        fields: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Point-in-time read aligned to the schema AS OF that commit: the
        retained entry's registry snapshot supplies the field list that was
        authoritative when the entry was current, so "the table as of batch
        N" across an ALTER shows batch N's columns — not today's (the r9
        documented divergence, closed). The field list doubles as the
        explicit read schema (no footer-merge job)."""
        from pgcapture_spark.functions.pgtypes import spark_type_for_oid
        from pgcapture_spark.streaming.state import align_to_fields

        if fields is None:
            reg = self.registry_asof(manifest)
            fields = [(n, spark_type_for_oid(oid)) for n, oid in reg.fields(table)]
        df = super().read_asof(table, manifest, buckets, fields=fields)
        if df is None:
            return None
        return align_to_fields(df, fields)

    def seed_table(self, t: str, snapshot: DataFrame) -> None:
        """One-time O(snapshot) backfill of a table's buckets (the initialize
        analog, per table so mid-stream tables can start empty while static
        ones seed from their snapshots). Idempotent — re-seeding after a
        crash before the first data commit overwrites the same version."""
        out = os.path.join(self.root, "vinit", t)
        (
            snapshot.withColumn("_b", self._bucket_col(t))
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(out)
        )
        manifest = self._load()
        for b in range(self.n_buckets):
            manifest["buckets"].setdefault(t, {})[str(b)] = "vinit"
        self._swap(manifest)

    def read(self) -> dict[str, DataFrame] | None:
        """Every REGISTRY relation, aligned to its current field list:
        bucketed tables read from their pointers (absent columns NULL-fill
        across schema versions), quarantined / never-touched relations
        surface as empty snapshots of their learned shape."""
        from pgcapture_spark.streaming.state import align_to_fields

        if not os.path.exists(self._manifest):
            return None
        out: dict[str, DataFrame] = {}
        for t in self.registry.tables():
            fields = self._fields_spark(t)
            df = (
                # the registry field list is the explicit read schema — no
                # distributed mergeSchema footer job per table
                self.read_buckets(t, list(range(self.n_buckets)), fields=fields)
                if t in self.keys
                else None
            )
            if df is None:
                df = self.registry.empty_snapshot(self.spark, t)
            out[t] = align_to_fields(df, fields)
        return out


def apply_stream_dynamic(
    feed_stream: DataFrame,
    state: DynamicMultiTableState,
    initial_snapshots: dict[str, DataFrame],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Multi-table apply over the GENERIC binary feed with in-stream relation
    learning: a CREATE TABLE event mid-stream materializes a new table (empty
    buckets with the parsed wire schema) and its subsequent row events decode
    and apply — the PGXSchemaLoader-refresh behavior (pkg/decode/schema.go:
    114-159) on Spark, now on bucketed state: per micro-batch every table
    reads and rewrites ONLY the key-buckets its change set touches (one union
    probe job across tables, one atomic manifest commit carrying the evolved
    registry).

    Feed schema: lsn, seq, ord, commit_ts, op, table_name, query,
    fields array<struct<name,oid,bin>>, old_fields (DELETE old key image —
    one entry per replica-identity column, composite identities included;
    learned tables bucket on the hash of ALL key columns, only keyless
    relations quarantine). ``initial_snapshots`` tables must be registered
    in the state's registry (learn_static) and are seeded into buckets
    once, on first contact."""
    from pgcapture_spark.operators.apply import last_image, merge_images
    from pgcapture_spark.operators.generic_feed import decode_binary_feed
    from pgcapture_spark.streaming.state import align_to_fields

    reg = state.registry

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        spark = batch_df.sparkSession
        # per-TABLE seed guard, not state.initialized(): seed_table swaps the
        # manifest once per table, so a crash between seeding table A and
        # table B would leave B permanently unseeded under a whole-state
        # guard (its merges would silently fall back to an empty base —
        # ADVICE r8). A table is seeded iff its bucket pointers exist; the
        # per-table vinit write is idempotent, so re-seeding after a crash
        # before the first data commit just overwrites the same version.
        seeded = state._load()["buckets"]
        for t, snap in initial_snapshots.items():
            if not seeded.get(t):  # no bucket pointers yet (absent or {})
                state.seed_table(t, snap)
        # 1) relation learning — the schema subset is tiny (driver-side,
        # ordered). Two in-band forms, exactly the reference's two refresh
        # triggers: DDL text (parse CREATE/ALTER) and Relation ('R') messages
        # (pkg/decode/pgoutput.go:93-117) whose column list rides in the
        # `fields` array (name, type oid, bin[0]=key flag) with NO DDL text.
        schema_events = (
            batch_df.where(F.col("op").isin("DDL", "RELATION"))
            .select("ord", "op", "table_name", "query", "fields")
            .orderBy("ord")
            .collect()
        )
        for row in schema_events:
            if row["op"] == "RELATION":
                cols = [
                    (f["name"], f["oid"], bool(f["bin"] and f["bin"][0]))
                    for f in (row["fields"] or [])
                ]
                reg.learn_relation(row["table_name"], cols)
            else:
                reg.learn_ddl(row["query"])
        state.adopt_tables()
        # 2) per-table decode + fold to per-key images (the registry supplies
        # wire schema + identity — nothing table-specific in the consumer)
        imgs: dict[str, DataFrame] = {}
        for t in state.tables:
            key_cols = _key_list(state.keys[t])
            oids = dict(reg.fields(t))
            # the DELETE/key-change old image carries EVERY replica-identity
            # column (composite identities included — the wire's old_fields
            # array holds one entry per key column, exactly the typed
            # pipeline's contract, extras.py binary-composite apply)
            old_keys = [(f"old_{k}", k, oids[k]) for k in key_cols]
            sub = batch_df.where(
                (F.col("table_name") == F.lit(t))
                & ~F.col("op").isin("DDL", "RELATION")
            )
            typed = decode_binary_feed(
                sub,
                reg.fields(t),
                old_key=old_keys,
                fused=True,  # the apply consumes every column of the relation
            )
            for k in key_cols:
                typed = typed.withColumn(
                    k, F.coalesce(F.col(k), F.col(f"old_{k}"))
                )
            imgs[t] = last_image(
                typed, state.keys[t], reg.value_cols(t)
            ).persist()
        try:
            # ONE probe job across all tables (see fold_commit_multi)
            probe = None
            for t in state.tables:
                part = imgs[t].select(
                    F.lit(t).alias("_t"), state._bucket_col(t).alias("_b")
                )
                probe = part if probe is None else probe.unionByName(part)
            touched: dict[str, list[int]] = {}
            if probe is not None:
                for r in probe.distinct().collect():
                    touched.setdefault(r["_t"], []).append(r["_b"])
            # 3) merge each touched table's bucket slice — aligned to the
            # (possibly evolved) relation shape first: added columns appear
            # NULL-filled, dropped ones disappear (the reference's post-DDL
            # column-cache refresh, lazily per bucket)
            merged: dict[str, tuple[DataFrame, list[int]]] = {}
            for t, buckets in sorted(touched.items()):
                buckets = sorted(buckets)
                key = state.keys[t]
                fields = state._fields_spark(t)
                # the registry field list is the explicit read schema: no
                # per-trigger footer-merge job (absent columns NULL-fill,
                # dropped ones are ignored — the same surface the
                # mergeSchema+align pair produced)
                cur = state.read_buckets(t, buckets, fields=fields)
                base = align_to_fields(
                    cur if cur is not None else reg.empty_snapshot(spark, t),
                    fields,
                )
                # the merge join's own exchanges key-cluster the output; the
                # commit write inherits that layout (see pipeline.fold_commit)
                merged[t] = (
                    merge_images(base, imgs[t], key, reg.value_cols(t)),
                    buckets,
                )
            if merged:
                state.commit(merged, batch_id, pre_clustered=True)
                state.vacuum()
            else:
                # schema-only / empty batch: the registry still rides the
                # manifest rename that advances the replay gate
                state.mark_batch(batch_id)
        finally:
            for img in imgs.values():
                img.unpersist()

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
