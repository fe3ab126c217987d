"""Connected components via alternating large-star / small-star joins.

Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC 2014):
alternate two edge rewrites until fixpoint; converges in O(log^2 n) rounds
(in practice a handful) to a star forest where every node points at its
component's minimum id. Pure DataFrame joins/aggregations — no GraphFrames,
per BASELINE.json:6 ("iterative connected-components join").

Scale notes:
- ``localCheckpoint(eager=True)`` each round truncates the logical plan —
  without it the plan doubles per iteration and the driver OOMs on analysis.
- convergence test = (edge count, xxhash64 checksum) pair: two cheap
  aggregates, no expensive EXCEPT.
- each round is groupBy(min) + join on the same key — AQE coalesces and
  handles skewed star roots (a giant component funnels into its root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood node."""
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("_m"))
    mins = mins.withColumn("_m", F.least("_m", "a"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor set, connect all to the minimum."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("_m"))
    relinked = (
        oriented.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .unionByName(mins.select("a", F.col("_m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
    )
    return relinked


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """edges(a, b) -> labels(id, cluster_id), cluster_id = component min.

    Only ids that appear in edges are labeled; the caller unions isolated
    vertices (label = self) — see plans/pipeline.cluster_job.
    """
    e = edges.select("a", "b").where(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # xor-checksum: order-insensitive, can't overflow (ANSI-safe)
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint edge set is a star forest: (child, root) with root = min(component)
    roots = e.select(F.col("b").alias("id"), F.col("b").alias("cluster_id")).distinct()
    children = e.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
    return children.unionByName(roots).distinct()
