"""Contract tests for the round-3 fourth-wave operators: substring-span
dedup, the NB quality classifier, OHLC resample (batch + streamed), rolling
z-score, bigram surprisal, funnel/retention, and pHash media near-dup.

Cross-engine value parity is covered by test_oracle_parity; these pin the
invariants the oracle comparison can't express (first-occurrence retention,
classifier seeding, candidate-generation completeness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcapture_spark.operators.multimodal import phash_neardup
from pgcapture_spark.operators.textstats import (
    bigram_surprisal,
    nb_quality_classifier,
    quality_rules,
    substring_dedup,
)
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


class TestSubstringDedup:
    def test_first_occurrence_survives_and_text_shrinks_consistently(self, spark):
        """A crafted corpus: doc B repeats doc A's opening 8-gram verbatim.
        The first occurrence (lower doc_id, earlier pos) must survive; B's
        copy is removed; token accounting is exact."""
        rows = [
            (0, "a b c d e f g h tail0 tail1"),
            (1, "prefix a b c d e f g h tail2"),
            (2, "completely different words with no overlap at all here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in substring_dedup(docs, k=8).collect()}
        # doc 0 holds the first occurrence — untouched
        assert out[0]["n_removed"] == 0
        assert out[0]["dedup_text"] == rows[0][1]
        # doc 1 loses exactly the 8 repeated tokens, keeps the rest in order
        assert out[1]["n_removed"] == 8
        assert out[1]["dedup_text"] == "prefix tail2"
        # doc 2 untouched
        assert out[2]["n_removed"] == 0
        assert out[2]["dedup_text"] == rows[2][1]

    def test_within_doc_repetition_also_collapses(self, spark):
        """The SECOND occurrence inside one doc is removed too (corpus-wide
        rank, not per-doc)."""
        text = "x1 x2 x3 x4 x5 x6 x7 x8 mid x1 x2 x3 x4 x5 x6 x7 x8"
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        row = substring_dedup(docs, k=8).collect()[0]
        assert row["n_removed"] == 8
        assert row["dedup_text"] == "x1 x2 x3 x4 x5 x6 x7 x8 mid"

    def test_token_accounting(self, spark):
        out = substring_dedup(_docs(spark), k=8)
        bad = out.where(
            (F.size(F.split("dedup_text", " "))
             != F.col("n_tokens") - F.col("n_removed"))
            & (F.col("n_removed") < F.col("n_tokens"))
        ).count()
        assert bad == 0


class TestNBQuality:
    def test_seed_labels_mostly_recovered(self, spark):
        """The classifier is trained ON the rule labels — it must agree with
        them on a large majority of docs (it smooths, not memorizes)."""
        docs = _docs(spark)
        scored = nb_quality_classifier(docs).select("doc_id", "pred_good")
        labels = quality_rules(docs).select("doc_id", "keep")
        both = scored.join(labels, on="doc_id")
        n = both.count()
        agree = both.where(F.col("pred_good") == F.col("keep")).count()
        assert agree / n >= 0.7

    def test_scores_are_exact_integers(self, spark):
        row = nb_quality_classifier(_docs(spark)).first()
        assert isinstance(row["token_llr_q"], int)
        assert isinstance(row["total_llr_q"], int)


class TestBigramSurprisal:
    def test_short_docs_drop_out(self, spark):
        docs = spark.createDataFrame(
            [(0, "solo"), (1, "two tokens"), (2, "two tokens")],
            "doc_id long, text string",
        )
        out = bigram_surprisal(docs)
        ids = {r["doc_id"] for r in out.collect()}
        assert ids == {1, 2}  # 1-token doc has no bigram positions

    def test_repeated_doc_scores_identically(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b a b"), (1, "a b a b")], "doc_id long, text string"
        )
        rows = bigram_surprisal(docs).collect()
        assert rows[0]["total_q_nats"] == rows[1]["total_q_nats"]


class TestPhashNearDup:
    def test_multiprobe_matches_bruteforce(self, spark):
        """The multi-probe candidate generation must find EXACTLY the pairs a
        brute-force Hamming<=1 self-join finds."""
        media = spark.createDataFrame(
            [(i, "image", None, bytes([i % 7] * 16), None, None, None)
             for i in range(64)],
            "media_id long, modality string, mime string, payload binary,"
            " meta_width int, meta_height int, meta_duration_ms int",
        )
        got = {
            (r["media_id"], r["other_id"])
            for r in phash_neardup(media).collect()
        }
        from pgcapture_spark.operators.multimodal import extract_features

        hashed = extract_features(media).select("media_id", "feature").collect()
        def ph(feat):
            return sum(1 << i for i in range(8) if feat[i] >= 0.5)
        hs = {r["media_id"]: ph(r["feature"]) for r in hashed}
        want = {
            (a, b)
            for a in hs for b in hs
            if a < b and bin(hs[a] ^ hs[b]).count("1") <= 1
        }
        assert got == want
        assert len(want) > 0  # the fixture (7 distinct payloads) collides

    def test_pair_ordering_and_bound(self, spark):
        import pgcapture_spark.queries  # noqa: F401 — finish registry init first
        from pgcapture_spark.querydefs.media import media_view

        out = phash_neardup(media_view(spark, SF_SMALL))
        assert out.where("media_id >= other_id").count() == 0
        assert out.where("hamming > 1").count() == 0
