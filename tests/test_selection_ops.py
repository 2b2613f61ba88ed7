"""Pure-Python reference checks for the greedy selection operators (MMR
re-rank, k-center coreset): the relational unrolls must reproduce the
textbook sequential algorithms on arbitrary small inputs — not just on the
one oracle fixture."""

from __future__ import annotations

import math
import random


def _mk_embeddings(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in e], 0) for i, e in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )


def _cos_q(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return math.floor(dot / (na * nb) * 1_000_000 + 0.5)


def test_mmr_matches_sequential_reference(spark):
    rng = random.Random(7)
    # f32-rounded inputs so Spark (float storage) and the reference agree
    import struct

    f32 = lambda v: struct.unpack("f", struct.pack("f", v))[0]
    vecs = {
        i: [f32(rng.uniform(-1, 1)) for _ in range(64)] for i in range(40)
    }
    from pgcapture_spark.operators.similarity import mmr_rerank

    df = _mk_embeddings(spark, vecs)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["mmr_q"])
        for r in mmr_rerank(df, "vec_id % 10 = 3", pool=5, k=3).collect()
    }

    d = {i: [float(v) for v in e] for i, e in vecs.items()}
    for q in [i for i in vecs if i % 10 == 3]:
        rel = sorted(
            ((_cos_q(d[q], d[n]), -n) for n in vecs if n != q), reverse=True
        )
        pool = [(-nid, rq) for rq, nid in rel[:5]]
        relmap = dict(pool)
        picked = []
        for rank in (1, 2, 3):
            best = None
            for nid, rq in pool:
                if nid in picked:
                    continue
                ms = max((_cos_q(d[nid], d[p]) for p in picked), default=0)
                score = 7 * rq - 3 * ms if picked else 7 * rq
                key = (score, -nid)
                if best is None or key > best[0]:
                    best = (key, nid, score)
            picked.append(best[1])
            assert got[(q, rank)] == (best[1], best[2]), (q, rank, got[(q, rank)], best)


def test_kcenter_matches_sequential_reference(spark):
    rng = random.Random(11)
    import struct

    f32 = lambda v: struct.unpack("f", struct.pack("f", v))[0]
    vecs = {i: [f32(rng.uniform(-1, 1)) for _ in range(64)] for i in range(30)}
    df = _mk_embeddings(spark, vecs)

    # sequential reference
    def d2q(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return math.floor(s * 1_000_000 + 0.5)

    d = {i: [float(v) for v in e] for i, e in vecs.items()}
    centers = [min(d)]
    expected = [(1, centers[0], 0)]
    for r in range(2, 6):
        best = None
        for v in d:
            if v in centers:
                continue
            dmin = min(d2q(d[v], d[c]) for c in centers)
            key = (dmin, -v)
            if best is None or key > best[0]:
                best = (key, v, dmin)
        centers.append(best[1])
        expected.append((r, best[1], best[2]))

    # the ACTUAL operator the query path uses, not a re-implementation
    from pgcapture_spark.operators.similarity import kcenter_select

    assert kcenter_select(df, k=5) == expected


def test_kcenter_degenerate_corpora(spark):
    """n = 0 returns [] (the relational unroll's seed CTE is empty); n < k
    returns all n points without crashing."""
    from pgcapture_spark.operators.similarity import kcenter_select

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert kcenter_select(empty, k=5) == []

    tiny = _mk_embeddings(spark, {3: [1.0, 0.0], 9: [0.0, 1.0]})
    got = kcenter_select(tiny, k=5)
    assert [(r, v) for r, v, _ in got] == [(1, 3), (2, 9)]
