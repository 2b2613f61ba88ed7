"""Reference-implementation tests for the late round-4 operators: binary
(1-bit) Hamming retrieval, degree-ordered triangle counting, and the KMV
(bottom-k) distinct sketch.

Each operator is checked against an independent brute-force Python reference
on small synthetic inputs — the invariants the DuckDB oracle comparison can't
localize (exact pair distances, per-triangle membership, sketch merge
algebra and layout invariance).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from pgcapture_spark.operators.kmv import (
    KMV_ADD,
    KMV_MOD,
    KMV_MULT,
    kmv_estimates,
    kmv_partition_summaries,
)
from pgcapture_spark.operators.similarity import hamming_topk, triangle_count


def _mk_embeddings(spark, vecs):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )


class TestHammingTopK:
    def test_matches_bruteforce_sign_hamming(self, spark):
        import random

        rng = random.Random(7)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(64)] for i in range(30)}
        df = _mk_embeddings(spark, vecs)
        out = hamming_topk(df, "vec_id % 10 = 0", k=4, dim=64).collect()

        # brute force: sign bits then per-pair popcount of the XOR.
        # _as_double L2-normalizes, which never flips a sign, so signs of the
        # raw vectors are the signs the operator sees.
        signs = {i: [x >= 0 for x in v] for i, v in vecs.items()}

        def ham(a, b):
            return sum(x != y for x, y in zip(signs[a], signs[b]))

        expected = {}
        for q in (0, 10, 20):
            cands = sorted(
                ((ham(q, n), n) for n in vecs if n != q),
            )[:4]
            expected[q] = [(rank + 1, n, h) for rank, (h, n) in enumerate(cands)]

        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"], r["hamming"])
            )
        for q in got:
            got[q].sort()
        assert got == expected

    def test_identical_vectors_have_distance_zero(self, spark):
        # 0 and 1 share the sign pattern (+,-,+,-) → distance 0; 2 is all
        # negative → differs in the two positive positions → distance 2
        vecs = {0: [1.0, -1.0, 2.0, -0.5], 1: [0.5, -2.0, 1.0, -1.0], 2: [-1.0] * 4}
        df = _mk_embeddings(spark, vecs)
        out = hamming_topk(df, "vec_id = 0", k=2, dim=4).collect()
        by_n = {r["neighbor_id"]: r for r in out}
        assert by_n[1]["hamming"] == 0 and by_n[1]["rank"] == 1
        assert by_n[2]["hamming"] == 2 and by_n[2]["rank"] == 2


class TestTriangleCount:
    @staticmethod
    def _edges(spark, pairs):
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "src_id long, dst_id long"
        )

    @staticmethod
    def _brute(pairs):
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        nodes = sorted({n for e in und for n in e})
        cnt: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if {(a, b), (a, c), (b, c)} <= und:
                for n in (a, b, c):
                    cnt[n] = cnt.get(n, 0) + 1
        return cnt

    def test_k4_and_known_graphs(self, spark):
        # K4: every node is in C(3,2)=3 triangles
        k4 = list(itertools.combinations(range(4), 2))
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, k4)).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3} == self._brute(k4)

        # square + one diagonal: two triangles sharing the diagonal
        sq = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, sq)).collect()}
        assert got == {0: 2, 1: 1, 2: 2, 3: 1} == self._brute(sq)

    def test_direction_duplicates_and_self_loops_ignored(self, spark):
        # both directions + dupes + a self-loop must not inflate counts
        pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (1, 1)]
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, pairs)).collect()}
        assert got == {0: 1, 1: 1, 2: 1}

    def test_triangle_free_graph_is_empty(self, spark):
        path = [(0, 1), (1, 2), (2, 3)]
        assert triangle_count(self._edges(spark, path)).count() == 0

    def test_random_graph_matches_bruteforce(self, spark):
        import random

        rng = random.Random(11)
        pairs = list({tuple(sorted(rng.sample(range(12), 2))) for _ in range(40)})
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, pairs)).collect()}
        assert got == self._brute(pairs)


def _kmv_ref_hash(u: int) -> int:
    return (u * KMV_MULT + KMV_ADD) % KMV_MOD


class TestKMV:
    @staticmethod
    def _rows(spark, data, parts=4):
        return spark.createDataFrame(
            [(g, int(v)) for g, v in data], "grp string, val long"
        ).repartition(parts)

    def test_exact_path_below_k(self, spark):
        data = [("a", v) for v in [1, 2, 3, 2, 1]] + [("b", v) for v in [10, 11]]
        out = {
            r["grp"]: (r["kth_min"], r["est_distinct"])
            for r in kmv_estimates(self._rows(spark, data), "grp", "val", k=64).collect()
        }
        # < k distinct: the sketch IS the distinct set — est is exact, kth_min
        # is the max of the group's hashes
        assert out["a"][1] == 3 and out["b"][1] == 2 and out["ALL"][1] == 5
        assert out["a"][0] == max(_kmv_ref_hash(v) for v in (1, 2, 3))

    def test_estimator_path_and_reference_formula(self, spark):
        k = 16
        vals = list(range(1, 2001))
        data = [("a", v) for v in vals]
        out = {
            r["grp"]: (r["kth_min"], r["est_distinct"])
            for r in kmv_estimates(self._rows(spark, data), "grp", "val", k=k).collect()
        }
        kth_ref = sorted(_kmv_ref_hash(v) for v in vals)[k - 1]
        est_ref = (k - 1) * KMV_MOD // kth_ref
        assert out["a"] == (kth_ref, est_ref) == out["ALL"]
        # the estimate is in the right ballpark (k=16 → ~25% rel. std. error)
        assert 1000 < est_ref < 4000

    def test_layout_invariance(self, spark):
        """The same logical rows produce the identical sketch under any
        partition layout — the mergeability contract."""
        data = [("a", v % 97) for v in range(500)] + [("b", v % 13) for v in range(100)]
        outs = []
        for parts in (1, 7):
            outs.append(
                sorted(
                    kmv_estimates(self._rows(spark, data, parts), "grp", "val", k=8)
                    .collect()
                )
            )
        assert outs[0] == outs[1]

    def test_partition_summaries_bounded(self, spark):
        """Pass 1 emits at most k rows per group per partition and only true
        hash values — the 'raw column never shuffles' guarantee."""
        data = [("a", v) for v in range(300)]
        rows = self._rows(spark, data, parts=3)
        summ = kmv_partition_summaries(rows, "grp", "val", k=8)
        assert summ.count() <= 3 * 8
        hv_all = {_kmv_ref_hash(v) for v in range(300)}
        assert {r["hv"] for r in summ.collect()} <= hv_all

    def test_union_sketch_built_from_summaries(self, spark):
        """'ALL' equals the k smallest distinct hashes over the union —
        computable from the per-group sketches alone."""
        data = [("a", v) for v in range(50)] + [("b", v) for v in range(25, 75)]
        out = {
            r["grp"]: r["kth_min"]
            for r in kmv_estimates(self._rows(spark, data), "grp", "val", k=8).collect()
        }
        union_kth = sorted({_kmv_ref_hash(v) for v in range(75)})[7]
        assert out["ALL"] == union_kth
