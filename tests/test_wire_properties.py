"""Property-based round-trip tests for the hand-rolled wire codecs: any
frame the fixture builders can emit must parse back to exactly the values it
was built from, for BOTH dialects (pgoutput and pglogical), across the whole
input space — lsn/xid extremes, unicode identifiers, empty tuples, every
tuple format combination. The golden-byte tests in test_pgoutput.py pin the
on-wire layout; these pin the algebra (parse ∘ build = id).

Pure-Python (no Spark session): the Arrow UDF wraps parse_frame verbatim, so
round-tripping the scalar parser covers the batch path's value semantics.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pgcapture_spark.functions.pglogical as pgl
import pgcapture_spark.functions.pgoutput as pgo

u32 = st.integers(min_value=0, max_value=2**32 - 1)
u64 = st.integers(min_value=0, max_value=2**64 - 1)

# identifiers: printable-ish unicode, no NUL (pgoutput cstr is NUL-terminated;
# Postgres identifiers cannot contain NUL either); pglogical String8 caps the
# UTF-8 byte length at 255
ident_text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=40,
)

datum = st.binary(min_size=0, max_size=64)


def field_strategy():
    """One tuple field: (format, datum) with datum only for b/t."""
    return st.one_of(
        st.tuples(st.just("n"), st.none()),
        st.tuples(st.just("u"), st.none()),
        st.tuples(st.just("b"), datum),
        st.tuples(st.just("t"), datum),
    )


fields = st.lists(field_strategy(), min_size=0, max_size=8)


def expect_fields(fs):
    """What the parser should return: text datums are NUL-trimmed on parse
    (the reference trims trailing NULs from text datums)."""
    out = []
    for fmt, d in fs:
        if fmt == "t":
            out.append({"format": fmt, "bin": d.rstrip(b"\x00")})
        elif fmt == "b":
            out.append({"format": fmt, "bin": d})
        else:
            out.append({"format": fmt, "bin": None})
    return out


@settings(max_examples=200, deadline=None)
@given(final_lsn=u64, commit_us=u64, xid=u32)
def test_begin_roundtrip_both_dialects(final_lsn, commit_us, xid):
    for mod in (pgo, pgl):
        p = mod.parse_frame(mod.build_begin(final_lsn, commit_us, xid))
        assert (p["op"], p["final_lsn"], p["commit_us"], p["xid"]) == (
            "BEGIN", final_lsn, commit_us, xid,
        )


@settings(max_examples=200, deadline=None)
@given(commit_lsn=u64, end_lsn=u64, commit_us=u64)
def test_commit_roundtrip_both_dialects(commit_lsn, end_lsn, commit_us):
    for mod in (pgo, pgl):
        p = mod.parse_frame(mod.build_commit(commit_lsn, end_lsn, commit_us))
        assert (p["op"], p["commit_lsn"], p["end_lsn"], p["commit_us"]) == (
            "COMMIT", commit_lsn, end_lsn, commit_us,
        )


@settings(max_examples=200, deadline=None)
@given(
    oid=u32,
    nsp=ident_text,
    name=ident_text,
    ident=st.sampled_from("dnfi"),
    cols=st.lists(
        st.tuples(ident_text, u32, st.booleans()), min_size=0, max_size=6
    ),
)
def test_pgoutput_relation_roundtrip(oid, nsp, name, ident, cols):
    p = pgo.parse_frame(pgo.build_relation(oid, nsp, name, ident, cols))
    assert p["op"] == "RELATION"
    assert (p["rel_oid"], p["rel_nsp"], p["rel_name"], p["rel_ident"]) == (
        oid, nsp, name, ident,
    )
    assert p["rel_cols"] == [
        {"flag": 1 if is_key else 0, "name": cname, "oid": toid}
        for cname, toid, is_key in cols
    ]


@settings(max_examples=200, deadline=None)
@given(
    oid=u32,
    nsp=ident_text.filter(lambda s: len(s.encode("utf-8")) <= 255),
    name=ident_text.filter(lambda s: len(s.encode("utf-8")) <= 255),
    cols=st.lists(ident_text, min_size=0, max_size=6),
)
def test_pglogical_relation_roundtrip(oid, nsp, name, cols):
    p = pgl.parse_frame(pgl.build_relation(oid, nsp, name, cols))
    assert p["op"] == "RELATION"
    assert (p["rel_oid"], p["rel_nsp"], p["rel_name"]) == (oid, nsp, name)
    # pglogical carries no type oids / identity flags: the parser normalizes
    # to the shared frame struct with flag 0 / oid 0 (types from the registry)
    assert p["rel_cols"] == [{"flag": 0, "name": c, "oid": 0} for c in cols]


row_case = st.one_of(
    # INSERT: new only
    st.tuples(st.just("I"), fields, st.none(), st.just("K")),
    # UPDATE without old image
    st.tuples(st.just("U"), fields, st.none(), st.just("K")),
    # UPDATE with old image, either kind
    st.tuples(st.just("U"), fields, fields, st.sampled_from("KO")),
    # DELETE: old only, either kind
    st.tuples(st.just("D"), st.none(), fields, st.sampled_from("KO")),
)


@settings(max_examples=300, deadline=None)
@given(oid=u32, case=row_case)
def test_row_change_roundtrip_both_dialects(oid, case):
    op, new_t, old_t, old_kind = case
    for mod in (pgo, pgl):
        raw = mod.build_row_change(op, oid, new_t, old_t, old_kind=old_kind)
        p = mod.parse_frame(raw)
        assert p["op"] == {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[op]
        assert p["rel_oid"] == oid
        assert p["new_tuple"] == (None if new_t is None else expect_fields(new_t))
        assert p["old_tuple"] == (None if old_t is None else expect_fields(old_t))


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=1, max_size=64))
def test_unknown_tags_raise_never_hang(data):
    """Arbitrary bytes either parse (if they happen to start with a valid tag
    and carry a well-formed body) or raise a ValueError/struct.error/index
    error — never hang, never return a half-filled frame silently for an
    unknown tag."""
    import struct as _struct

    for mod in (pgo, pgl):
        if chr(data[0]) in "BCRIUD":
            continue  # valid tags exercised above
        try:
            mod.parse_frame(data)
            raise AssertionError("unknown tag must not parse")
        except (ValueError, _struct.error, IndexError):
            pass


@settings(max_examples=300, deadline=None)
@given(data=st.binary(min_size=0, max_size=128))
def test_safe_parse_never_raises_any_dialect(data):
    """The streaming consumers' safe mode: ARBITRARY bytes either parse or
    come back as an op='ERROR' frame carrying the reason — never an
    exception (a poison frame must reach the dead-letter quarantine, not
    kill the stream), and never a half-filled success frame."""
    import pgcapture_spark.functions.protowire as pw

    for fn in (pgo.parse_frame_safe, pgl.parse_frame_safe, pw.parse_message_safe):
        out = fn(data)
        if out["op"] == "ERROR":
            assert out["parse_error"]  # reason always present
        else:
            assert out["parse_error"] is None


def test_safe_parse_valid_frames_identical_to_strict():
    """safe mode is a superset: well-formed frames parse to the SAME dict
    as the strict parser (parse_error None)."""
    b = pgo.build_begin(7, 123456, 42)
    assert pgo.parse_frame_safe(b) == pgo.parse_frame(b)
    bl = pgl.build_begin(7, 123456, 42)
    assert pgl.parse_frame_safe(bl) == pgl.parse_frame(bl)


@settings(max_examples=200, deadline=None)
@given(
    final_lsn=u64, commit_us=u64, xid=u32,
    cut=st.integers(min_value=0, max_value=200),
)
def test_truncated_valid_frames_never_parse_as_complete(final_lsn, commit_us, xid, cut):
    """Truncating a VALID frame at any byte must never raise in safe mode,
    and for the fixed-layout dialects must never parse 'successfully' —
    pgoutput/pglogical B frames have a fixed body, so any cut is detectable.
    For proto, a cut inside a length-delimited field must be detected (the
    _scan bounds check); cuts at field boundaries are proto3-undetectable
    by design, but must still yield a clean parse, never an exception."""
    import pgcapture_spark.functions.protowire as pw

    b = pgo.build_begin(final_lsn, commit_us, xid)
    t = b[: min(cut, len(b) - 1)]  # strictly shorter than the full frame
    if t:
        out = pgo.parse_frame_safe(t)
        assert out["op"] == "ERROR"
    bl = pgl.build_begin(final_lsn, commit_us, xid)
    tl = bl[: min(cut, len(bl) - 1)]
    if tl:
        out = pgl.parse_frame_safe(tl)
        assert out["op"] == "ERROR"
    msg = pw.build_begin(final_lsn, commit_us % (2**63), xid)
    tm = msg[: min(cut, len(msg) - 1)]
    out = pw.parse_message_safe(tm)  # ERROR or a clean shorter parse — never a raise
    assert out["op"] in ("ERROR", "BEGIN", None)
