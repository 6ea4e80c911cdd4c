"""Distributed connected components — the cluster-resolution step a
curation pipeline runs AFTER near-dup pair generation (group candidate
pairs into duplicate clusters, keep one document per cluster; the
C4/RefinedWeb dedup shape). The reference has no graph surface; this
is an engine extension (SURVEY §2.7).

Algorithm: min-label propagation to a fixpoint — each vertex
repeatedly takes the minimum label among itself and its neighbors.
Converges in O(component diameter) rounds; near-dup clusters are
near-cliques, so 2-4 rounds in practice. Per round: one shuffle keyed
on edge source (neighbor-min aggregate) and one vertex-keyed left
join — both partition-parallel, nothing on the driver but the loop
counter and a one-number convergence probe. `localCheckpoint`
truncates lineage each round so plans don't grow exponentially; on a
real cluster use a reliable checkpoint dir (or the large-star /
small-star variant) for fault tolerance past a few hundred rounds —
irrelevant at diameter ≤ ~10.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns (id, comp): every vertex labeled with the minimum
    vertex id of its connected component. Vertices absent from any
    edge keep their own id. The convergence probe is sum(comp), which
    strictly decreases while any label can still shrink.

    ``checkpoint_dir`` switches per-round lineage truncation from
    localCheckpoint (executor-memory-pinned, lost with an executor —
    fine on local[n]) to RELIABLE checkpoints in that directory (HDFS/
    object store): on a real cluster a lost executor then costs a
    re-read of the last checkpoint instead of restarting the whole
    propagation."""
    if checkpoint_dir is not None:
        vertices.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    # checkpoint the (possibly expensive) edge plan BEFORE the
    # symmetrizing union — otherwise both union branches recompute it
    e0 = ckpt(edges.select(F.col(src).alias("es"), F.col(dst).alias("ed")))
    sym = ckpt(e0.union(e0.select(F.col("ed"), F.col("es"))))
    # propagate ONLY over vertices that appear in an edge — in a dedup
    # graph that's a tiny fraction of the corpus, so the per-round
    # joins touch |edges| rows, not |corpus|; isolated vertices join
    # back with their own id at the end (one wide pass, outside the
    # loop)
    labels = ckpt(
        sym.select(F.col("es").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    prev = labels.agg(F.sum("comp")).collect()[0][0]
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["es"] == labels["id"])
            .groupBy("ed")
            .agg(F.min("comp").alias("nbr_min"))
        )
        labels = ckpt(
            labels.join(nbr_min, labels["id"] == nbr_min["ed"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_min", F.col("comp"))
                ).alias("comp"),
            )
        )
        cur = labels.agg(F.sum("comp")).collect()[0][0]
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # wrong labels are worse than a loud failure: a component with
        # diameter > max_iters would silently carry several labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
            " — raise max_iters (component diameter exceeds it)"
        )
    return (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(labels, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
