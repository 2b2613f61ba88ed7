"""k-core decomposition by synchronous peeling — the density filter over
similarity graphs (mutual-kNN cores are the classic SemDeDup/community
pre-filter: a node survives the k-core iff it keeps >= k neighbors after
everything weaker is recursively removed).

Execution shape: FIXED-ROUND synchronous peeling. Every round drops ALL
nodes whose current degree < k simultaneously (degree = one union + one
hash aggregation; the edge filter = two semi-joins), so a round is two
shuffles over the SURVIVING edge list — monotonically shrinking. The round
count is a compile-time constant R shared with the oracle: both engines run
literally the same R stages, so results are comparable even mid-convergence,
and a FIXPOINT CERTIFICATE (round R+1 must drop nothing) turns "R was
enough" into a loud failure instead of a silent approximation. Peeling
converges in <= peel-depth rounds (measured 4-8 on the mutual-kNN graphs at
sf0.001-0.1; R=16 is generous headroom), NOT O(n): each round removes every
currently-underweight node at once.

Scale notes: per round the work is degree-sized; the iterative loop's
logical plan would otherwise double per round, so the surviving edge list is
lineage-cut (lazy localCheckpoint) every few rounds — the same
planning-time discipline as operators/ivm*.py. At 100 TB, R bounded rounds
= R bounded shuffles over a shrinking edge list.

Reference scope: the engine's graph family (SURVEY §2.8) alongside
triangle counting and integer PageRank (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KCORE_ROUNDS = 16


def degrees(edges: DataFrame) -> DataFrame:
    """(node, c) degrees of an undirected (a, b) edge list (a < b, deduped)."""
    both = edges.select(F.col("a").alias("node")).unionByName(
        edges.select(F.col("b").alias("node"))
    )
    return both.groupBy("node").agg(F.count("*").cast("long").alias("c"))


def kcore_peel(
    edges: DataFrame, k: int, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Peel ``edges`` (undirected, a < b, deduped) synchronously until the
    FIXPOINT (no node under-degree), bounded by ``rounds``; return the
    k-core members with their within-core degree: (node, core_degree).

    The per-round drop count doubles as the convergence certificate: the
    loop exits on the first drop-free round, whose degree frame IS the
    answer. The oracle unrolls exactly ``rounds`` stages — every stage past
    the fixpoint is the identity, so early exit here and the full unroll
    there agree by construction. Raises if ``rounds`` is exhausted first —
    the constant and the oracle's stages must then be raised together."""
    cur = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = degrees(cur).persist()
        try:
            if deg.where(F.col("c") < k).count() == 0:
                return deg.select("node", F.col("c").alias("core_degree"))
            keep = deg.where(F.col("c") >= k).select("node")
            cur = (
                cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
                .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
                .select("a", "b")
                # eager: the round is materialized anyway (the next drop
                # count), and the cut keeps every round's plan round-sized
                .localCheckpoint(eager=True)
            )
        finally:
            deg.unpersist()
    raise RuntimeError(
        f"k-core did not converge within {rounds} rounds — raise"
        " KCORE_ROUNDS and the oracle's unrolled stages together"
    )


def mutual_edges(directed: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """Undirected (a, b) edge list (a < b) keeping only MUTUAL directed
    pairs — the reciprocal-kNN filter: one self-join on the reversed pair."""
    e = directed.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return (
        e.where(F.col("a") < F.col("b"))
        .join(rev, ["a", "b"], "left_semi")
        .distinct()
    )
