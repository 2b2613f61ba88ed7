"""Binary-passthrough generic feed — the reference's actual wire shape.

The reference never materializes typed rows in flight: every change carries
``[]*pb.Field{name, oid, value-bytes}`` (pb/pgcapture.proto:53-60) in PG binary
wire format, producers re-send the bytes untouched (pkg/decode/decoder.go:70-79)
and the sink binds them as binary params without decoding
(pkg/sink/postgres.go:422-434). Decode happens only at a consuming edge, driven
by the OID registry (python/pgcapture/decoders.py:157-225).

This module re-expresses that contract Spark-first:

- ``to_binary_feed``: typed feed → ``fields array<struct<name,oid,bin>>``
  (fixture edge — one Arrow-batched pandas UDF; the real producer is Postgres).
  TOAST-omitted columns are ABSENT from the array; explicit NULLs are present
  with ``bin IS NULL`` — exactly the reference's presence model
  (pkg/decode/decoder.go:106-114).
- ``decode_binary_feed``: generic feed → typed view, two decode strategies:

  * LAZY per-column (default for narrow schemas): each output column
    extracts its own field and runs its own fixed-OID codec UDF, so Catalyst
    column pruning skips the Python decode for untouched columns entirely
    (SURVEY §4 "binary passthrough") — at 100 TB a query touching 2 of 40
    columns pays 2 codecs, not 40.
  * FUSED (default for wide requests): ONE Arrow-batched UDF decodes every
    requested column into a struct — one Python boundary crossing instead of
    N. Field extraction stays in Catalyst either way; only the codec work
    crosses. A full-width apply over an 11-column feed pays 1 crossing, not
    11. Catalyst cannot prune inside the struct, so narrow consumers of a
    wide feed should pass the narrow field list (or ``fused=False``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.functions.pgtypes import (
    ENCODERS,
    decode_series,
    pg_decode_udf,
    spark_type_for_oid,
)

# (column, oid) schema of the generic customer feed — the Relation-message
# role (pkg/decode/schema.go:114-159)
CUSTOMER_FIELD_OIDS: list[tuple[str, int]] = [
    ("c_custkey", 20),
    ("c_name", 25),
    ("c_nationkey", 23),
    ("c_acctbal", 701),
    ("c_mktsegment", 1043),
]

_FIELDS_TYPE = "array<struct<name:string,oid:int,bin:binary>>"


_FIXED_WIDTH = {20: ">i8", 23: ">i4", 21: ">i2", 700: ">f4", 701: ">f8"}
_TEXT_OIDS = (25, 1042, 1043)


def _enc_column(oid: int, s: pd.Series) -> list:
    """Vectorized per-column PG-binary encode (numpy big-endian cast for
    fixed-width types, pandas str encode for text); per-row codec fallback
    for everything else. Returns a list of bytes-or-None."""
    import numpy as np

    if oid in _FIXED_WIDTH:
        vals = pd.to_numeric(s, errors="coerce")
        mask = vals.isna().to_numpy()
        arr = vals.fillna(0).to_numpy().astype(_FIXED_WIDTH[oid])
        raw, w = arr.tobytes(), arr.dtype.itemsize
        return [
            None if mask[i] else raw[i * w : (i + 1) * w] for i in range(len(mask))
        ]
    if oid in _TEXT_OIDS:
        return [None if pd.isna(v) else str(v).encode("utf-8") for v in s]
    if oid in (1114, 1184):
        dt = pd.to_datetime(s, utc=True, errors="coerce")
        try:
            dt = dt.dt.tz_localize(None)
        except (AttributeError, TypeError):
            pass
        ns = dt.astype("int64", copy=False).to_numpy()
        mask = dt.isna().to_numpy()
        raw = (ns // 1000 - 946_684_800_000_000).astype(">i8").tobytes()
        return [None if mask[i] else raw[i * 8 : (i + 1) * 8] for i in range(len(mask))]
    return [
        None
        if (v is None or (not isinstance(v, (list, bytes)) and pd.isna(v)))
        else ENCODERS[oid](v)
        for v in s
    ]


def _encode_fields_udf(field_oids: list[tuple[str, int]]):
    """(present, *values) → wire fields array. Present-list order is kept;
    a present column with a NULL value encodes as bin NULL. Encoding is
    vectorized per column; only row assembly loops in Python."""
    names = [n for n, _ in field_oids]
    oids = dict(field_oids)

    @F.pandas_udf(_FIELDS_TYPE)
    def _udf(present: pd.Series, *cols: pd.Series) -> pd.Series:
        encoded = [_enc_column(oids[name], cols[j]) for j, name in enumerate(names)]
        # feeds carry a handful of distinct present-lists — resolve each
        # variant to its field-index list once, not per row
        idx_cache: dict[str, list[int]] = {}
        out = []
        plist = present.tolist()
        for i, p in enumerate(plist):
            p = p or ""
            idx = idx_cache.get(p)
            if idx is None:
                pset = set(x for x in p.split(",") if x)
                # absent from present = unchanged TOAST: field omitted
                idx = [j for j, name in enumerate(names) if name in pset]
                idx_cache[p] = idx
            # positional tuples, not dicts — Arrow struct conversion accepts
            # both, and tuple assembly is ~30% cheaper at 600k rows × 11 fields
            out.append([(names[j], oids[names[j]], encoded[j][i]) for j in idx])
        return pd.Series(out)

    return _udf


def _norm_old_keys(
    old_key: tuple[str, str, int] | list[tuple[str, str, int]] | None,
) -> list[tuple[str, str, int]]:
    if old_key is None:
        return []
    if isinstance(old_key, tuple):
        return [old_key]
    return list(old_key)


def to_binary_feed(
    typed: DataFrame,
    field_oids: list[tuple[str, int]],
    old_key: tuple[str, str, int] | list[tuple[str, str, int]] | None = None,
    rebalance: bool | None = None,
) -> DataFrame:
    """Typed feed → generic binary feed: metadata columns + ``fields`` (new
    image) + ``old_fields`` (DELETE/key-change old image; one entry per
    replica-identity column — composite identities carry several).

    The encode UDF is the CPU-heavy step; when the source scan under-splits
    (one local file → a handful of skewed tasks) rebalancing first runs the
    codec one task per core — but the exchange itself costs a shuffle
    barrier, so it only pays when the per-row codec work outweighs it.
    Measured at sf0.1: 11-column lineitem 1.2× faster WITH the rebalance,
    5-column customer 2× faster WITHOUT. ``rebalance=None`` auto-gates on
    codec width (>= FUSE_THRESHOLD columns), the same wide/narrow split as
    the fused decode. On a well-split scan (100 TB) the rebalance is a
    no-op either way (``ensure_parallelism`` leaves the plan alone)."""
    from pgcapture_spark.operators.textstats import ensure_parallelism

    if rebalance is None:
        rebalance = len(field_oids) >= FUSE_THRESHOLD
    if rebalance:
        typed = ensure_parallelism(typed)
    enc = _encode_fields_udf(field_oids)
    cols = [name for name, _ in field_oids]
    old_keys = _norm_old_keys(old_key)
    out = typed.select(
        "lsn",
        "seq",
        "ord",
        "commit_ts",
        "op",
        enc(F.col("present"), *[F.col(c) for c in cols]).alias("fields"),
        *[F.col(src) for src, _, _ in old_keys],
    )
    if old_keys:
        names = ",".join(name for _, name, _ in old_keys)
        enc_old = _encode_fields_udf([(name, oid) for _, name, oid in old_keys])
        any_old = None
        for src, _, _ in old_keys:
            c = F.col(src).isNotNull()
            any_old = c if any_old is None else (any_old | c)
        out = out.withColumn(
            "old_fields",
            F.when(
                any_old,
                enc_old(F.lit(names), *[F.col(src) for src, _, _ in old_keys]),
            ).otherwise(F.lit(None).cast(_FIELDS_TYPE)),
        ).drop(*[src for src, _, _ in old_keys])
    return out


# width at which one fused boundary crossing beats N prunable ones: the apply
# paths request the full schema anyway, and per-UDF invocation overhead
# dominates past a handful of columns
FUSE_THRESHOLD = 8


def _decode_struct_udf(cols: list[tuple[str, int]], text: bool = False):
    """ONE Arrow-batched UDF decoding every (out_name, oid) datum column into
    a struct — a single Python boundary crossing for the whole width.
    ``text=True`` runs the text-format codecs (the wire's second datum
    representation, pb/pgcapture.proto:57) instead of PG binary."""
    from pgcapture_spark.functions.pgtypes import decode_text_series

    dec = decode_text_series if text else decode_series
    ddl = ", ".join(f"{n} {spark_type_for_oid(o)}" for n, o in cols)

    @F.pandas_udf(ddl)
    def _udf(*bins: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {n: dec(o, bins[j]) for j, (n, o) in enumerate(cols)}
        )

    return _udf


def _extract_bin(arr_col: str, name: str):
    """Pull one field's value bytes out of the wire array — pure Catalyst.
    The field name can be wire-learned (quoted PG identifiers may contain
    anything), so it is compared as a bound literal, never spliced into the
    lambda's SQL text."""
    return F.try_element_at(
        F.filter(F.col(arr_col), lambda f: f["name"] == F.lit(name)), F.lit(1)
    )["bin"]


def decode_binary_feed(
    generic: DataFrame,
    field_oids: list[tuple[str, int]],
    old_key: tuple[str, str, int] | list[tuple[str, str, int]] | None = None,
    fused: bool | None = None,
    text: bool = False,
) -> DataFrame:
    """Generic binary feed → typed view, decode-at-the-edge.

    Field extraction (``filter(fields, ...)``) is pure Catalyst either way;
    the codec work crosses the Python boundary once per column (lazy — each
    column prunable independently) or once per batch (fused — one UDF
    returning a struct of all requested columns). ``fused=None`` picks fused
    when the requested width ≥ FUSE_THRESHOLD: a caller asking for most of a
    wide schema (the apply paths) wants one crossing, a narrow projection
    over a wide feed wants prunability. The rebuilt ``present`` list
    preserves wire field order, so the typed view is drop-in for the same
    ``cdc_apply`` fold as the typed feed."""
    old_keys = _norm_old_keys(old_key)
    meta = ("lsn", "seq", "ord", "commit_ts", "op")
    present = F.expr("concat_ws(',', transform(fields, f -> f.name))").alias("present")
    width = len(field_oids) + len(old_keys)
    if fused is None:
        fused = width >= FUSE_THRESHOLD
    if text and not fused:
        fused = True  # text codecs ship only in the fused struct UDF
    if fused:
        cols = [(name, oid) for name, oid in field_oids] + [
            (src, oid) for src, _, oid in old_keys
        ]
        bins = [_extract_bin("fields", name) for name, _ in field_oids] + [
            _extract_bin("old_fields", name) for _, name, oid in old_keys
        ]
        dec = _decode_struct_udf(cols, text=text)
        return generic.select(*meta, dec(*bins).alias("_dec"), present).select(
            *meta, "_dec.*", "present"
        )
    return generic.select(
        *meta,
        *[
            pg_decode_udf(oid)(_extract_bin("fields", name)).alias(name)
            for name, oid in field_oids
        ],
        *[
            pg_decode_udf(oid)(_extract_bin("old_fields", name)).alias(src)
            for src, name, oid in old_keys
        ],
        present,
    )
