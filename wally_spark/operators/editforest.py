"""Verify-on-demand clustering for expensive-verify dedup families
(r12 verdict item 7, exploratory).

`dedup_edit_verified` prices every candidate pair through the banded
Levenshtein verifier, but the downstream consumers (`dedup_clusters`,
`dedup_keep_best`) need only the CLUSTER structure. Connectivity
needs O(docs) verified edges, not O(pairs): a spanning forest of
each cluster carries the same components as the full verified pair
set — a large win whenever the candidate -> verify PASS RATE is
high (candidates mostly true edge-dup pairs).

MEASURED REGIME (r13 A/B, recorded in BASELINE.md): on the repo's
synthetic corpora the simhash candidate net is hamming-precise but
edit-LOOSE — pass rates are 0.05% (sf0.1), 5% (sf1 dupstress) — so
the forest contracts nothing and plain full-verify + CC is cheaper
(sf1: 202.8 s vs 287.9 s for one wasted round + fallback). The
operator therefore PRE-PROBES a hash-sample of candidates and goes
straight to the exact one-pass fallback below ``bail_pass_bp``,
making it never-worse than full-verify + CC by more than the probe;
the dense-regime savings (4x+ fewer verifications on near-clique
clusters) are pinned by the synthetic test. NOT wired into
dedup_edit_verified (r12 verdict item 7: "adopt only if the win is
real" — on these corpora it is not); available for corpora whose
candidate generator is verify-tight.

``verify_on_demand_clusters`` grows that forest Boruvka-style:

  round: map pending candidate edges onto current component labels,
    drop intra-component edges WITHOUT verifying them (they cannot
    change connectivity — the saving), let every live component pick
    its deterministic minimum incident cross-component edge (a
    map-side ``min_by`` aggregate, no window — skew-safe on hub
    clusters), verify ONLY the chosen edges (prefix join +
    JVM banded Levenshtein), contract passed edges with the min-label
    connected-components operator, subtract chosen from pending.

Each round verifies at most one edge per live component; in the
dense regime the first contraction absorbs most docs into their
clusters and the bulk of the candidate mass becomes intra-component
— skipped unverified: total verified work is O(docs + tail) instead
of O(candidate pairs). In the sparse regime Boruvka degrades — each
component burns one false edge per round (measured at sf0.001: 2%
pass rate, 452 chosen -> 9 passed) — so the pre-probe skips the
loop outright below ``bail_pass_bp``, a mid-loop bail catches a
probe that sampled unluckily, and ``max_rounds`` bounds the dense
path: in every exit the remaining cross-component candidates verify
in one exact pass. EXACTNESS in all regimes: an edge is skipped only when its
endpoints are already connected by verified-passed edges, and a
failed edge is discarded exactly as the full verify discards it, so
the final components equal connected components over the complete
verified-pair relation (the equivalence the test pins); the
fallback is the exact answer at the full-verify price, never a
truncation.

Driver state per round: three scalar probes (chosen / passed /
pending counts) plus the CC operator's own convergence probes —
bounded, like every iterative operator in this package.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from wally_spark.operators.checkpoint import free_blocks, pin
from wally_spark.operators.components import connected_components


def edit_distance(pa, pb, edit_max: int):
    """Banded threshold Levenshtein with an equality short-circuit
    (r14, guide §4 "skip work decided by cheaper bounds").

    ``levenshtein(x, x, k) == 0`` always, and string equality is an
    O(n) early-exit scan vs the O(k·n) DP band — on a corpus with
    verbatim duplicates (the regime dedup targets: sf1-dupstress is
    tenfold verbatim replication) most TRUE pairs have identical
    verify prefixes, so the CASE skips the DP exactly where the
    verify mass is. Unequal pairs pay one comparison loop that exits
    at the first differing char — noise next to the DP. Semantics are
    unchanged by construction; the CASE is codegen'd JVM like the DP.
    A/B knob: spark.wally.edit.eqfast=false restores the bare DP.
    """
    pa = F.col(pa) if isinstance(pa, str) else pa
    pb = F.col(pb) if isinstance(pb, str) else pb
    lev = F.levenshtein(pa, pb, edit_max)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if (
        spark is not None
        and str(spark.conf.get("spark.wally.edit.eqfast", "true")).lower()
        == "false"
    ):
        return lev
    return F.when(pa == pb, F.lit(0)).otherwise(lev)


def verify_on_demand_clusters(
    cand: DataFrame,
    prefixes: DataFrame,
    keep_bp: int,
    edit_max: int,
    max_rounds: int = 3,
    bail_pass_bp: int = 2000,
    probe_edges: int = 2048,
) -> tuple:
    """``cand``: (doc_a, doc_b) candidate pairs (doc_a < doc_b);
    ``prefixes``: (doc_id, prefix) normalized verify texts;
    keep rule: banded ``levenshtein(pa, pb, edit_max)`` passing
    ``10000 * edit div max(len, 1) <= keep_bp`` (the
    dedup_edit_verified gate). Returns ``((doc_id, cluster) DataFrame
    over docs appearing in cand, stats dict)`` with cluster = min
    doc_id of the verified component."""
    prefixes = pin(prefixes)
    pending = pin(cand.select("doc_a", "doc_b"))
    docs = (
        pending.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pending.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    comp = pin(docs.select("doc_id", F.col("doc_id").alias("comp")))
    stats = {
        "rounds": 0,
        "candidates": pending.count(),
        "verified": 0,
        "passed": 0,
        "skipped_unverified": 0,
        "fallback_verified": 0,
        "probe_pass_bp": None,
    }

    def _verify(edges: DataFrame) -> DataFrame:
        """(doc_a, doc_b) -> passing subset, the dedup_edit_verified
        keep rule verbatim."""
        return (
            edges.join(
                prefixes.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("prefix").alias("pa"),
                ),
                "doc_a",
            )
            .join(
                prefixes.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("prefix").alias("pb"),
                ),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                edit_distance("pa", "pb", edit_max)
                .cast("bigint")
                .alias("edit"),
                F.greatest(F.length("pa"), F.length("pb"), F.lit(1))
                .cast("bigint")
                .alias("max_len"),
            )
            .where(
                (F.col("edit") >= 0)
                & (F.expr("(10000 * edit) div max_len") <= keep_bp)
            )
            .select("doc_a", "doc_b")
        )

    def _relabel(comp_df: DataFrame, passed: DataFrame) -> DataFrame:
        """Contract passed edges on the component-label graph."""
        lbl_edges = (
            passed.join(
                comp_df.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("comp").alias("ca"),
                ),
                "doc_a",
            )
            .join(
                comp_df.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("comp").alias("cb"),
                ),
                "doc_b",
            )
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        labels = connected_components(
            comp_df.select(F.col("comp").alias("id")).distinct(),
            lbl_edges,
        )
        return pin(
            comp_df.join(
                labels, comp_df["comp"] == labels["id"]
            ).select("doc_id", labels["comp"].alias("comp"))
        )

    # Pre-probe: verify a deterministic hash-sample of the candidates
    # first. When the sampled pass rate is below the bail threshold,
    # the forest cannot contract anything worth the round machinery
    # (measured: sf1 dupstress runs a 5% pass rate and the one wasted
    # round + pending rebuild cost +42% over plain full verify) — go
    # STRAIGHT to the one-pass exact fallback, making the operator
    # never-worse than full-verify + CC by more than the probe.
    n_probe = min(probe_edges, stats["candidates"])
    if n_probe:
        probe = pin(
            pending.orderBy(
                F.xxhash64("doc_a", "doc_b"), "doc_a", "doc_b"
            ).limit(n_probe)
        )
        n_probe_pass = _verify(probe).count()
        stats["probe_pass_bp"] = 10000 * n_probe_pass // n_probe
        free_blocks(probe)
        dense = 10000 * n_probe_pass >= bail_pass_bp * n_probe
    else:
        dense = False
    rounds_budget = max_rounds if dense else 0

    for _ in range(rounds_budget):
        live = (
            pending.join(
                comp.select(
                    F.col("doc_id").alias("doc_a"), F.col("comp").alias("ca")
                ),
                "doc_a",
            )
            .join(
                comp.select(
                    F.col("doc_id").alias("doc_b"), F.col("comp").alias("cb")
                ),
                "doc_b",
            )
            .where(F.col("ca") != F.col("cb"))
            .select("doc_a", "doc_b", "ca", "cb")
        )
        # Boruvka choice: every live component takes its minimum
        # incident edge in HASH order — map-side min aggregate, no
        # window, no skew. Hash order, not (doc_a, doc_b) order: the
        # id order is adversarial (measured at sf0.1 — low-id hub
        # docs with degenerate fingerprints dominate every
        # component's min id-ordered edge and fail verification,
        # 14/4915 round-1 passes on a ~90%-true candidate set); a
        # deterministic hash makes the choice an unbiased draw from
        # the component's incident candidates.
        inc = live.select(
            F.col("ca").alias("c"), "doc_a", "doc_b"
        ).unionByName(live.select(F.col("cb").alias("c"), "doc_a", "doc_b"))
        chosen = pin(
            inc.groupBy("c")
            .agg(
                F.min(
                    F.struct(
                        F.xxhash64("doc_a", "doc_b").alias("h"),
                        "doc_a",
                        "doc_b",
                    )
                ).alias("e")
            )
            .select(
                F.col("e.doc_a").alias("doc_a"),
                F.col("e.doc_b").alias("doc_b"),
            )
            .distinct()
        )
        n_chosen = chosen.count()
        if n_chosen == 0:
            free_blocks(chosen)
            break
        stats["rounds"] += 1
        stats["verified"] += n_chosen
        passed = pin(_verify(chosen))
        n_passed = passed.count()
        stats["passed"] += n_passed
        new_comp = _relabel(comp, passed)
        new_pending = pin(
            live.select("doc_a", "doc_b").join(
                chosen, ["doc_a", "doc_b"], "left_anti"
            )
        )
        free_blocks(pending, comp, chosen, passed)
        pending, comp = new_pending, new_comp
        if 10000 * n_passed < bail_pass_bp * n_chosen:
            # sparse regime: Boruvka is burning one false edge per
            # component per round — the exact fallback is cheaper
            break
    # tail fallback (round cap, sparse bail, or leftovers): verify
    # every remaining cross-component candidate in one pass — exact,
    # at the full-verify price for the tail; a no-op when the loop
    # drained every cross-component candidate
    tail = pin(
        pending.join(
            comp.select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("ca")
            ),
            "doc_a",
        )
        .join(
            comp.select(
                F.col("doc_id").alias("doc_b"), F.col("comp").alias("cb")
            ),
            "doc_b",
        )
        .where(F.col("ca") != F.col("cb"))
        .select("doc_a", "doc_b")
    )
    n_tail = tail.count()
    if n_tail:
        stats["fallback_verified"] = n_tail
        stats["verified"] += n_tail
        passed = _verify(tail)
        comp = _relabel(comp, passed)
    free_blocks(tail)

    stats["skipped_unverified"] = stats["candidates"] - stats["verified"]
    return comp.select("doc_id", F.col("comp").alias("cluster")), stats
