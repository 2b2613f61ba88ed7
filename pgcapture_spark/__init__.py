"""pgcapture_spark — a PySpark-native CDC/replication analytics engine.

Re-expresses the capabilities of the reference CDC system (replicase/pgcapture,
see SURVEY.md) Spark-first:

- the change feed is a DataFrame totally ordered by ``(lsn, seq)``
  (reference: pb/pgcapture.proto:40-60, pkg/cursor/main.go:13-26),
- apply/merge is a last-image-per-key aggregation + join against the snapshot
  (reference: pkg/sink/postgres.go:207-278),
- DBLog backfill is a partition-pruned batch read unioned into the stream under
  an LSN watermark guard (reference: pkg/dblog/gateway.go:113-217),
- consumer-side debounce is a keyed window/dedup (pkg/pgcapture/debounce.go),
- plus Spark-native large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) that the reference does not have.

Everything is DataFrame/Spark-SQL first so Catalyst can push filters, prune
columns and pick join strategies; Python UDFs appear only where built-ins
cannot express the semantics (PG binary decode, multimodal decode stubs).
"""

__version__ = "0.1.0"
