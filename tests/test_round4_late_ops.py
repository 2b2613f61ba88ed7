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

    def test_huge_node_ids(self, spark):
        """Node ids beyond 1e10 must not corrupt the degree ordering — the
        (deg, id) key is a struct, not a packed BIGINT (ADVICE r4)."""
        big = 2**62
        tri = [(big, big + 1), (big + 1, big + 2), (big, big + 2), (big + 2, 5)]
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, tri)).collect()}
        assert got == {big: 1, big + 1: 1, big + 2: 1}

    def test_random_graph_matches_bruteforce(self, spark):
        import random

        rng = random.Random(11)
        pairs = list({tuple(sorted(rng.sample(range(12), 2))) for _ in range(40)})
        got = {r["vec_id"]: r["n_tri"] for r in triangle_count(self._edges(spark, pairs)).collect()}
        assert got == self._brute(pairs)


def _kmv_ref_hash(u: int) -> int:
    return ((u % KMV_MOD + KMV_MOD) % KMV_MOD * KMV_MULT + KMV_ADD) % KMV_MOD


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

    def test_extreme_and_negative_values_stay_in_range(self, spark):
        """The pre-reduced permutation cannot overflow BIGINT or go negative
        for ANY 64-bit input (the ADVICE r4 medium finding): values above
        ~3.47e9 used to silently wrap in Spark's non-ANSI multiply and
        negative inputs produced negative hashes."""
        vals = [
            2**62, -(2**62), 2**63 - 1, -(2**63), 5_000_000_000,
            -5_000_000_000, 0, -1, KMV_MOD, KMV_MOD - 1,
        ]
        data = [("a", v) for v in vals]
        out = {
            r["grp"]: (r["kth_min"], r["est_distinct"])
            for r in kmv_estimates(self._rows(spark, data), "grp", "val", k=64).collect()
        }
        ref = {_kmv_ref_hash(v) for v in vals}
        assert all(0 <= h < KMV_MOD for h in ref)
        assert out["a"] == (max(ref), len(ref))

    def test_null_values_excluded_not_crashed(self, spark):
        """A NULL value is not a distinct value (COUNT(DISTINCT) semantics) —
        it must be filtered before the hash, not surface as a NaN hv that
        trips the range assertion with a misleading overflow message."""
        rows = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 2), ("b", None)],
            "grp string, val long",
        ).repartition(2)
        out = {
            r["grp"]: r["est_distinct"]
            for r in kmv_estimates(rows, "grp", "val", k=8).collect()
        }
        # 'b' has only NULLs -> contributes no hashes -> no per-group row
        assert out == {"a": 2, "ALL": 2}

    def test_null_group_key_kept(self, spark):
        """A NULL group key is a real group (oracle GROUP BY semantics) —
        pandas' dropna default must not silently eat it."""
        rows = spark.createDataFrame(
            [("a", 1), (None, 2), (None, 3)], "grp string, val long"
        ).repartition(2)
        out = {
            r["grp"]: r["est_distinct"]
            for r in kmv_estimates(rows, "grp", "val", k=8).collect()
        }
        assert out == {"a": 1, None: 2, "ALL": 3}

    def test_real_group_named_all_does_not_merge_into_union_arm(self, spark):
        """'ALL' as a data value is a separate grouping key from the union
        arm (boolean flag, not string sentinel) — two rows share the label
        but never merge their sketches."""
        data = [("ALL", 1), ("ALL", 2), ("b", 3)]
        rows = self._rows(spark, data, parts=2)
        got = sorted(
            (r["grp"], r["est_distinct"])
            for r in kmv_estimates(rows, "grp", "val", k=8).collect()
        )
        assert got == [("ALL", 2), ("ALL", 3), ("b", 1)]


class TestCovarianceAndWhitening:
    @staticmethod
    def _mk(spark, n=40, dim=8, seed=3, parts=4):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-2, 2) for _ in range(dim)], i % 3)
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(parts)
        return df, rows

    def test_moments_match_numpy_and_layout_invariant(self, spark):
        import numpy as np

        from pgcapture_spark.operators.similarity import embed_covariance_moments

        df, rows = self._mk(spark)
        x = np.array([[float(np.float32(v)) for v in r[1]] for r in rows])
        xq = np.floor(x * 1000 + 0.5).astype(np.int64)

        outs = []
        for parts in (1, 4):
            got = {
                (r["i"], r["j"]): r["v"]
                for r in embed_covariance_moments(
                    df.repartition(parts), dim=8, quant=1000
                ).collect()
            }
            outs.append(got)
        assert outs[0] == outs[1]  # partition layout can never leak in
        got = outs[0]
        assert got[(0, 0)] == len(rows)
        g = xq.T @ xq
        s = xq.sum(axis=0)
        for i in range(8):
            assert got[(i + 1, 0)] == s[i]
            for j in range(i, 8):
                assert got[(i + 1, j + 1)] == g[i, j]

    def test_pca_whiten_matches_numpy_reference(self, spark):
        import numpy as np

        from pgcapture_spark.operators.similarity import pca_whiten

        df, rows = self._mk(spark, n=60)
        out = pca_whiten(df, k=3, dim=8, quant=1000).collect()
        got = {r["vec_id"]: np.array(r["y"]) for r in out}

        # numpy reference over the SAME quantized covariance the operator uses
        x = np.array([[float(np.float32(v)) for v in r[1]] for r in rows])
        xq = np.floor(x * 1000 + 0.5).astype(np.int64)
        n = len(x)
        mean = xq.sum(axis=0) / n / 1000
        cov = (xq.T @ xq / n - np.outer(xq.sum(0), xq.sum(0)) / n / n) / 1e6
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:3]
        vals, vecs = vals[order], vecs[:, order]
        flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(3)])
        vecs = vecs * flip
        w = vecs / np.sqrt(np.maximum(vals, 0) + 1e-9)
        ref = (x - mean) @ w
        for idx, r in enumerate(rows):
            assert np.allclose(got[r[0]], ref[idx], rtol=1e-9, atol=1e-9)

        # whitened output really is decorrelated with ~unit variance
        y = np.stack([got[r[0]] for r in rows])
        yc = y - y.mean(axis=0)
        c = yc.T @ yc / n
        assert np.allclose(c, np.eye(3), atol=1e-2)


class TestDriftPSI:
    def test_identical_halves_score_near_zero_and_shift_scores_high(self, spark):
        """PSI sanity on constructed corpora: (a) when both halves draw the
        same distribution, PSI stays under the 0.10 'no drift' bar; (b) when
        the current half's length distribution shifts wholesale, PSI crosses
        the classic 0.2 alert threshold. Exact values are pinned by the
        DuckDB oracle; this pins the MONITOR semantics."""
        import math
        import shutil
        import tempfile

        from pgcapture_spark.queries import REGISTRY

        def run(rows):
            d = tempfile.mkdtemp(prefix="pgcs_psi_")
            try:
                spark.createDataFrame(
                    rows, "doc_id long, text string, lang string, source string, n_chars long"
                ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
                out = REGISTRY["corpus_drift_psi"].fn(spark, d).collect()
                return {r["feature"]: r for r in out}
            finally:
                shutil.rmtree(d, ignore_errors=True)

        # (a) even/odd halves identically distributed
        same = [
            (i, "t", ["en", "de"][i // 2 % 2], "s", 100 + (i // 2 % 8) * 500)
            for i in range(400)
        ]
        got = run(same)
        assert set(got) == {"len_bucket", "lang"}
        for r in got.values():
            assert abs(r["psi_nano"]) < 0.10 * 1e9
            assert r["n_ref"] == r["n_cur"] == 200

        # (b) current half (odd ids) much longer documents
        shifted = [
            (i, "t", "en", "s", 3900 if i % 2 == 1 else 100 + (i % 4) * 300)
            for i in range(400)
        ]
        got = run(shifted)
        assert got["len_bucket"]["psi_nano"] > 0.2 * 1e9
        assert abs(got["lang"]["psi_nano"]) < 0.05 * 1e9  # lang unchanged
        assert math.isfinite(got["len_bucket"]["psi_nano"])


class TestPQTraining:
    @staticmethod
    def _mk(spark, n=40, dim=8, seed=5):
        import random

        rng = random.Random(seed)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(n)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(3)
        return df, rows

    @staticmethod
    def _np_lloyd(x, k, iters):
        """Reference per-subspace Lloyd with the operator's exact contract:
        lowest-row init, (d2, label) argmin tie-break, decimal-quantized
        means, empty clusters dropped."""
        import numpy as np

        cents = [(j, x[j].copy()) for j in range(k)]
        for _ in range(iters - 1):
            asg = []
            for row in x:
                best = min((float(((row - c) ** 2).sum()), lbl) for lbl, c in cents)
                asg.append(best[1])
            cents = []
            for lbl in sorted(set(asg)):
                members = x[[i for i, a in enumerate(asg) if a == lbl]]
                q = np.floor(members * 1e9 + 0.5).astype("int64")
                cents.append((lbl, q.sum(axis=0) / 1e9 / len(members)))
        return cents

    def test_codebooks_match_numpy_reference(self, spark):
        import numpy as np

        from pgcapture_spark.operators.similarity import pq_train_codebooks

        df, rows = self._mk(spark)
        # the operator normalizes (_as_double); mirror that
        x = np.array([[float(np.float32(v)) for v in r[1]] for r in rows])
        got = pq_train_codebooks(df, m=2, k=3, iters=2, dim=8)
        assert len(got) == 2
        for s in range(2):
            ref = self._np_lloyd(x[:, s * 4 : (s + 1) * 4], k=3, iters=2)
            assert [lbl for lbl, _ in got[s]] == [lbl for lbl, _ in ref]
            for (gl, gv), (rl, rv) in zip(got[s], ref):
                assert np.allclose(gv, rv, atol=1e-12), (s, gl)

    def test_training_reduces_distortion_and_codes_cover(self, spark):
        import numpy as np

        from pgcapture_spark.operators.similarity import pq_train_encode

        df, rows = self._mk(spark, n=60)
        trained = pq_train_encode(df, m=2, k=3, iters=3, dim=8).collect()
        init_only = pq_train_encode(df, m=2, k=3, iters=1, dim=8).collect()
        assert len(trained) == 60 * 2 == len(init_only)
        # Lloyd never increases the objective: total distortion after update
        # rounds <= the init assignment's
        assert sum(r["subd2_micro"] for r in trained) <= sum(
            r["subd2_micro"] for r in init_only
        )
        codes = {r["code"] for r in trained}
        assert codes <= {0, 1, 2} and len(codes) >= 2
        subs = {r["subspace"] for r in trained}
        assert subs == {0, 1}


class TestTrainedADC:
    def test_trained_adc_finds_own_cluster(self, spark):
        """Three well-separated clusters in 8 dims: every query's trained-PQ
        ADC top-2 must come from the query's own cluster (the approximate
        distance preserves coarse geometry), and ranks are contiguous."""
        import random

        rng = random.Random(13)
        centers = [[4.0] * 8, [-4.0] * 8, [4.0] * 4 + [-4.0] * 4]
        rows = []
        for i in range(45):
            c = centers[i % 3]
            rows.append((i, [c[d] + rng.uniform(-0.3, 0.3) for d in range(8)], i % 3))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(3)

        from pgcapture_spark.operators.similarity import pq_trained_adc_topk

        out = pq_trained_adc_topk(
            df, "vec_id < 3", k=2, m=2, kc=3, iters=3, dim=8
        ).collect()
        assert len(out) == 3 * 2
        for r in out:
            assert r["neighbor_id"] % 3 == r["query_id"] % 3, r
            assert r["rank"] in (1, 2)


class TestKMVSetOps:
    def test_exact_when_small_and_estimates_when_large(self, spark):
        from pgcapture_spark.operators.kmv import (
            kmv_group_sketches,
            kmv_intersect_estimate,
        )

        # exact regime: both groups under k distinct
        data = [("a", v) for v in range(0, 30)] + [("b", v) for v in range(20, 50)]
        sk = {
            r["grp"]: list(r["mins"])
            for r in kmv_group_sketches(
                self._rows(spark, data), "grp", "val", k=64
            ).collect()
        }
        est = kmv_intersect_estimate(sk["a"], sk["b"], k=64)
        assert est["union_est"] == 50
        assert est["intersect_est"] == 10  # range(20, 30) — exact
        # estimate regime: two big overlapping ranges (50% overlap)
        big = [("a", v) for v in range(0, 4000)] + [("b", v) for v in range(2000, 6000)]
        sk = {
            r["grp"]: list(r["mins"])
            for r in kmv_group_sketches(
                self._rows(spark, big), "grp", "val", k=256
            ).collect()
        }
        est = kmv_intersect_estimate(sk["a"], sk["b"], k=256)
        # true union 6000, true intersection 2000, true jaccard 1/3;
        # k=256 → ~6% rel. std. error, assert within a generous 3-sigma band
        assert 4800 < est["union_est"] < 7200
        assert 200 < est["jaccard_milli"] < 470
        assert 1100 < est["intersect_est"] < 3000

    def test_merged_sketch_membership_is_from_inputs(self, spark):
        """The merged sketch never invents values: every hash in the merge is
        from one of the two input sketches (the subset property the estimator
        rests on)."""
        from pgcapture_spark.operators.kmv import (
            kmv_group_sketches,
            kmv_intersect_estimate,
        )

        data = [("a", v * 3) for v in range(300)] + [("b", v * 7) for v in range(300)]
        sk = {
            r["grp"]: list(r["mins"])
            for r in kmv_group_sketches(
                self._rows(spark, data), "grp", "val", k=32
            ).collect()
        }
        est = kmv_intersect_estimate(sk["a"], sk["b"], k=32)
        assert est["k_used"] == 32
        # multiples of 21 overlap: jaccard small but nonzero plausible
        assert 0 <= est["jaccard_milli"] <= 300

    _rows = staticmethod(TestKMV._rows)


class TestKMVProperties:
    """Driver-side property tests of the KMV math — no Spark session needed,
    so these run the full hypothesis budget cheaply."""

    def test_hash_is_a_permutation_on_the_field(self):
        """On [0, M) the affine map is a bijection (gcd(MULT mod M, M) = 1 —
        M is prime and MULT is not a multiple), so distinct inputs below M
        never collide: the k smallest hashes are a uniform distinct sample."""
        import math

        from pgcapture_spark.operators.kmv import KMV_MOD, KMV_MULT

        assert math.gcd(KMV_MULT % KMV_MOD, KMV_MOD) == 1
        sample = list(range(0, 3000)) + list(range(10**6, 10**6 + 3000))
        hs = {(u % KMV_MOD * KMV_MULT + 98765) % KMV_MOD for u in sample}
        assert len(hs) == len(sample)

    def test_hash_range_for_hostile_inputs(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pgcapture_spark.operators.kmv import KMV_ADD, KMV_MOD, KMV_MULT

        @settings(max_examples=300, deadline=None)
        @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
        def check(u):
            h = ((u % KMV_MOD + KMV_MOD) % KMV_MOD * KMV_MULT + KMV_ADD) % KMV_MOD
            assert 0 <= h < KMV_MOD
            # the intermediate product must fit BIGINT (the Spark-side wrap
            # guarantee): max operand is (M-1)
            assert (KMV_MOD - 1) * KMV_MULT + KMV_ADD < 2**63

        check()

    def test_set_ops_exact_regime_matches_true_sets(self):
        """When both sketches ARE the sets (< k distinct), every estimator
        output is exact for arbitrary inputs."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pgcapture_spark.operators.kmv import (
            KMV_ADD,
            KMV_MOD,
            KMV_MULT,
            kmv_intersect_estimate,
        )

        def h(u):
            return ((u % KMV_MOD + KMV_MOD) % KMV_MOD * KMV_MULT + KMV_ADD) % KMV_MOD

        @settings(max_examples=200, deadline=None)
        @given(
            st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=30),
            st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=30),
        )
        def check(sa, sb):
            k = 64
            ma, mb = sorted(h(u) for u in sa), sorted(h(u) for u in sb)
            est = kmv_intersect_estimate(ma, mb, k=k)
            assert est["union_est"] == len(sa | sb)
            assert est["intersect_est"] == len(sa & sb)
            if sa | sb:
                assert est["jaccard_milli"] == 1000 * len(sa & sb) // len(sa | sb)

        check()

    def test_set_ops_estimator_regime_statistical_bounds(self):
        """In the estimator regime the union estimate stays within a wide
        deterministic sanity band (k-1 ≤ est, est bounded by the field) and
        the Jaccard numerator is a subset count — structural invariants that
        hold for EVERY input, not just lucky ones."""
        import random

        from pgcapture_spark.operators.kmv import (
            KMV_ADD,
            KMV_MOD,
            KMV_MULT,
            kmv_intersect_estimate,
        )

        def h(u):
            return ((u % KMV_MOD + KMV_MOD) % KMV_MOD * KMV_MULT + KMV_ADD) % KMV_MOD

        rng = random.Random(7)
        for trial in range(20):
            n = rng.randrange(500, 5000)
            overlap = rng.randrange(0, n)
            sa = set(range(0, n))
            sb = set(range(n - overlap, 2 * n - overlap))
            k = 128
            ma = sorted(h(u) for u in sa)[:k]
            mb = sorted(h(u) for u in sb)[:k]
            est = kmv_intersect_estimate(ma, mb, k=k)
            true_union = len(sa | sb)
            assert est["k_used"] == k
            assert est["union_est"] >= k - 1
            # 3-sigma-ish multiplicative band for k=128 (~9% rel std error)
            assert 0.6 * true_union < est["union_est"] < 1.6 * true_union
            assert 0 <= est["jaccard_milli"] <= 1000
            assert est["intersect_est"] <= est["union_est"]
