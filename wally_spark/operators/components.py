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

from wally_spark.operators.checkpoint import free_blocks as _free_blocks
from wally_spark.operators.checkpoint import pin as _pin


def _shuffle_width(spark) -> int:
    """The cluster's own shuffle sizing knob, with a sane fallback."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _prepartition_on(spark) -> bool:
    """Whether iterative-graph edge relations are pinned pre-hash-
    partitioned on their per-round join key (spark.wally.graph
    .prepartition, default FALSE since r14).

    The r13 default-true rested on a false premise (falsified by the
    committed plans, VERDICT r13 #1): under AQE the executed plan is
    an AdaptiveSparkPlanExec whose outputPartitioning is
    UnknownPartitioning, so the LogicalRDD a localCheckpoint produces
    carries NO partitioning info — every propagation round still
    plans its own Exchange over the pinned scan (plans/r13/
    graph_pagerank_after.txt:97), and the pin-time repartition is one
    strictly ADDED exchange. The per-round edge exchanges themselves
    are canonically identical, so AQE's runtime stage cache serves
    them from one materialized shuffle regardless of this knob. The
    measured +12% local CC regression (r13) and the driver's
    dedup_clusters 0.91 / dedup_cluster_size_hist 0.88 agree. Knob
    kept for A/B only."""
    return (
        str(
            spark.conf.get("spark.wally.graph.prepartition", "false")
        ).lower()
        == "true"
    )


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
    def ckpt(df: DataFrame) -> DataFrame:
        return _pin(df, checkpoint_dir)

    # checkpoint the (possibly expensive) edge plan BEFORE the
    # symmetrizing union — otherwise both union branches recompute it
    e0 = ckpt(edges.select(F.col(src).alias("es"), F.col(dst).alias("ed")))
    # r14: prepartition default OFF — localCheckpoint under AQE does
    # NOT preserve outputPartitioning (see _prepartition_on), so the
    # pin-time repartition was a pure extra exchange. AQE's runtime
    # stage cache already serves every round's identical edge-side
    # exchange from one materialized shuffle.
    spark = edges.sparkSession
    sym_plan = e0.union(e0.select(F.col("ed"), F.col("es")))
    if _prepartition_on(spark):
        sym_plan = sym_plan.repartition(_shuffle_width(spark), "es")
    sym = ckpt(sym_plan)
    _free_blocks(e0)  # sym is materialized; the pre-union copy is dead
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
        # (measured, r6: adding a pointer-jumping join here — adopt
        # comp[comp[v]] as well — did NOT cut rounds on near-clique
        # dup graphs (diameter ≤3) and cost ~0.4 s/query in the extra
        # per-round join; deep/chain graphs should use
        # connected_components_star below, which contracts in
        # O(log² n) rounds.)
        old_labels = labels
        labels = ckpt(
            old_labels.join(nbr_min, old_labels["id"] == nbr_min["ed"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_min", F.col("comp"))
                ).alias("comp"),
            )
        )
        cur = labels.agg(F.sum("comp")).collect()[0][0]
        # the new round's labels are materialized — release the prior
        # round's blocks instead of pinning O(rounds × V) storage
        _free_blocks(old_labels)
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


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 40,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — public
    algorithm). Same contract as ``connected_components``: returns
    (id, comp) with comp = min vertex id of the component; isolated
    vertices label themselves.

    This is the DEEP-graph path: min-label propagation needs
    O(component diameter) rounds, which is fine for near-clique dedup
    clusters but pathological for chain-shaped components (a
    10k-vertex path needs 10k rounds). Star contraction halves the
    component structure every round — O(log² n) worst case, a handful
    of rounds in practice — at the cost of two edge-keyed shuffles per
    round instead of one. Per round:

      large-star: for each vertex u, connect every neighbor v > u to
        m = min(N(u) ∪ {u});
      small-star: orient edges large→small, connect every smaller
        neighbor (and u itself) to that minimum.

    Both are one groupBy + one join over the current edge set —
    partition-parallel, nothing on the driver but the convergence
    probe (edge count + order-independent hash sum; equality of both
    across a round means the edge set reached the star fixpoint).
    """
    def ckpt(df: DataFrame) -> DataFrame:
        return _pin(df, checkpoint_dir)

    def probe(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI arithmetic
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    # drop self-loops, start from the symmetrized edge set
    e0 = ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
            F.col(src) != F.col(dst)
        )
    )
    cur = ckpt(e0.union(e0.select(F.col("v"), F.col("u"))).distinct())
    _free_blocks(e0)
    prev = probe(cur)
    converged = False
    for _ in range(max_iters):
        # large-star over the symmetric neighbor lists: min includes u
        lmin = cur.groupBy("u").agg(F.min("v").alias("nm")).select(
            "u", F.least(F.col("nm"), F.col("u")).alias("m")
        )
        large = (
            cur.where(F.col("v") > F.col("u"))
            .join(lmin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # re-symmetrize for the small-star pass
        lsym = ckpt(large.union(large.select(F.col("v"), F.col("u"))))
        smin = lsym.where(F.col("v") <= F.col("u")).groupBy("u").agg(
            F.min("v").alias("m")
        )
        small = (
            lsym.where(F.col("v") <= F.col("u"))
            .join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select(F.col("u"), F.col("m")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        old_cur = cur
        cur = ckpt(small.union(small.select(F.col("v"), F.col("u"))))
        now = probe(cur)
        # this round's edges are materialized: the previous round's
        # edge set and the intra-round lsym intermediate are dead —
        # release them instead of pinning O(rounds × E) blocks
        _free_blocks(old_cur, lsym)
        if now == prev:
            converged = True
            break
        prev = now
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} rounds"
        )
    # fixpoint: every non-minimum vertex holds an edge to its
    # component minimum
    labels = cur.where(F.col("v") < F.col("u")).groupBy("u").agg(
        F.min("v").alias("comp")
    )
    return (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(labels, F.col("id") == F.col("u"), "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
