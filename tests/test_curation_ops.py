"""Property tests for the round-3 curation operators: rule-based quality
gates, temperature mixture sampling, dataset stats, edit-distance verified
dedup, and SemDeDup-style semantic dedup.

Cross-engine value parity is covered by test_oracle_parity; these tests pin
the operator CONTRACTS (invariants the oracle comparison can't express).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pgcapture_spark.operators.dedup import editdist_verified_pairs
from pgcapture_spark.operators.similarity import semantic_dedup
from pgcapture_spark.operators.textstats import (
    corpus_stats,
    mix_sample,
    quality_rules,
)
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


class TestQualityRules:
    def test_keep_is_conjunction_of_rules(self, spark):
        out = quality_rules(_docs(spark))
        rule_cols = [c for c in out.columns if c.startswith("r_")]
        bad = out.where(
            F.col("keep")
            != F.expr(" AND ".join(rule_cols))
        )
        assert bad.count() == 0

    def test_metrics_bounded(self, spark):
        out = quality_rules(_docs(spark))
        bad = out.where(
            (F.col("frac_alpha_tokens") < 0)
            | (F.col("frac_alpha_tokens") > 1)
            | (F.col("frac_distinct_tokens") < 0)
            | (F.col("frac_distinct_tokens") > 1)
            | (F.col("symbol_ratio") < 0)
        )
        assert bad.count() == 0

    def test_covers_every_doc(self, spark):
        docs = _docs(spark)
        assert quality_rules(docs).count() == docs.count()


class TestMixSample:
    def test_deterministic(self, spark):
        docs = _docs(spark)
        a = {r["doc_id"] for r in mix_sample(docs).collect()}
        b = {r["doc_id"] for r in mix_sample(docs).collect()}
        assert a == b

    def test_rebalances_toward_uniform(self, spark):
        """Temperature alpha<1 must shrink the majority language's share."""
        docs = _docs(spark)
        before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        after = {
            r["lang"]: r["n"]
            for r in mix_sample(docs).groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        top = max(before, key=before.get)
        share_before = before[top] / sum(before.values())
        share_after = after.get(top, 0) / max(sum(after.values()), 1)
        assert share_after < share_before

    def test_rate_matches_expected_formula(self, spark):
        docs = _docs(spark)
        counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        n_total = sum(counts.values())
        wq = {la: math.floor(math.pow(n, 0.5) * 1e6 + 0.5) for la, n in counts.items()}
        w_total = sum(wq.values())
        out = mix_sample(docs).select("lang", "rate").distinct().collect()
        for r in out:
            expect = min(1.0, 0.5 * wq[r["lang"]] / w_total * n_total / counts[r["lang"]])
            assert abs(r["rate"] - expect) < 2e-6


class TestCorpusStats:
    def test_totals_consistent(self, spark):
        docs = _docs(spark)
        out = corpus_stats(docs)
        total = out.agg(F.sum("n_docs")).first()[0]
        assert total == docs.count()

    def test_median_le_p90(self, spark):
        out = corpus_stats(_docs(spark))
        assert out.where(F.col("median_tokens") > F.col("p90_tokens")).count() == 0


class TestEditdistVerify:
    def test_pairs_ordered_and_normalized(self, spark):
        out = editdist_verified_pairs(_docs(spark)).collect()
        for r in out:
            assert r["a_id"] < r["b_id"]
            assert 0.0 <= r["norm_lev"] <= 1.0
            assert r["near_dup"] == (r["norm_lev"] <= 0.8)

    def test_identical_prefixes_zero_distance(self, spark):
        docs = _docs(spark)
        # duplicate a doc under a new id: its pair must verify at lev 0
        dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        out = editdist_verified_pairs(docs.unionByName(dup))
        zero = out.where((F.col("b_id") >= 10_000_000) & (F.col("lev") == 0))
        assert zero.count() >= 1


class TestBpeTokenize:
    def test_units_bounded_by_chars(self, spark):
        from pgcapture_spark.operators.textstats import bpe_tokenize

        out = bpe_tokenize(_docs(spark), k=12)
        # merges only ever shrink: n_tokens <= units <= chars
        bad = out.where(
            (F.col("n_bpe_units") > F.col("n_chars_tok"))
            | (F.col("n_bpe_units") < F.col("n_tokens"))
        )
        assert bad.count() == 0

    def test_segmentation_joins_back_to_token(self, spark):
        from pgcapture_spark.operators.textstats import bpe_tokenize
        from pgcapture_spark.operators.textstats import with_tokens

        out = bpe_tokenize(_docs(spark), k=12).select("doc_id", "first_token_bpe")
        first = with_tokens(_docs(spark)).select(
            "doc_id", F.expr("coalesce(element_at(tokens, 1), '')").alias("tok")
        )
        j = out.join(first, "doc_id").where(
            F.expr("replace(first_token_bpe, ' ', '')") != F.col("tok")
        )
        assert j.count() == 0

    def test_merge_table_ranked(self, spark):
        from pgcapture_spark.operators.textstats import bpe_merge_table

        merges = bpe_merge_table(_docs(spark), k=12)
        assert 0 < len(merges) <= 12
        for pair, merged in merges:
            assert merged == pair.replace(" ", "")


class TestSemanticDedup:
    def test_witness_below_dropped(self, spark):
        out = semantic_dedup(_embs(spark)).collect()
        for r in out:
            assert r["witness_id"] < r["vec_id"]
            assert r["cosine"] >= 0.30 - 1e-6

    def test_exact_duplicate_always_dropped(self, spark):
        embs = _embs(spark)
        dup = embs.orderBy("vec_id").limit(1).withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000_000)
        )
        out = semantic_dedup(embs.unionByName(dup))
        hit = out.where(F.col("vec_id") >= 10_000_000)
        rows = hit.collect()
        assert len(rows) == 1
        # cosine to itself is 1.0
        assert abs(rows[0]["cosine"] - 1.0) < 1e-6


class TestLineDedup:
    def test_conservation_and_reassembly(self, spark):
        from pgcapture_spark.operators.textstats import line_dedup

        docs = _docs(spark)
        out = line_dedup(docs).cache()
        # every doc present; kept <= lines; a doc with all-unique lines is unchanged
        assert out.count() == docs.count()
        assert out.where(F.col("n_kept") > F.col("n_lines")).count() == 0
        # global invariant: total kept == number of distinct lines in the corpus
        kept_total = out.agg(F.sum("n_kept")).first()[0]
        distinct_lines = (
            line_dedup(docs)  # recompute path-independent
            .agg(F.sum("n_kept"))
            .first()[0]
        )
        assert kept_total == distinct_lines
        # reassembled text of an untouched doc round-trips exactly
        joined = out.join(docs, "doc_id").where(F.col("n_kept") == F.col("n_lines"))
        bad = joined.where(F.col("dedup_text") != F.col("text"))
        assert bad.count() == 0
        out.unpersist()

    def test_first_occurrence_wins(self, spark):
        from pgcapture_spark.operators.textstats import line_dedup

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j k")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert rows[1]["n_kept"] == 1 and rows[1]["dedup_text"] == "a b c d e f g h i j"
        # doc 2's first 10-token line duplicates doc 1's — only the tail survives
        assert rows[2]["n_kept"] == 1 and rows[2]["dedup_text"] == "k"


class TestShardPlan:
    def test_partition_of_corpus(self, spark):
        from pgcapture_spark.operators.textstats import shard_assign, shard_plan

        docs = _docs(spark)
        plan = shard_plan(docs, n_shards=8).cache()
        assert plan.agg(F.sum("n_docs")).first()[0] == docs.count()
        shards = [r["shard"] for r in plan.select("shard").collect()]
        assert all(0 <= s < 8 for s in shards)
        # deterministic: same assignment on recompute
        a1 = shard_assign(docs).select("doc_id", "shard")
        a2 = shard_assign(docs).select("doc_id", "shard")
        assert a1.exceptAll(a2).count() == 0
        plan.unpersist()
