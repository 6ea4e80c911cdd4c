"""Event-sequence and graph-structure analytics — round-7 additions
(SURVEY §2.4 extensions over the events hypertable + co-purchase graph).

  event_transitions       per-user Markov transition matrix over event
                          types (counts + integer ppm probabilities)
  event_path_trigrams     support-thresholded 3-step behavioural paths
  sliding_distinct_users  6-hour sliding distinct-user count via a
                          bounded explode (never a range-window
                          distinct, which Spark cannot do incrementally)
  graph_kcore             K-core of the co-purchase graph by bounded
                          iterative peeling (unrolled, one lazy plan)
  text_readability        LIX readability banding in exact integer
                          arithmetic over the documents table
  events_markov_stationary (r8) stationary distribution of the
                          event-type chain — power iteration in exact
                          integer ppm over a broadcast |types|² matrix;
                          streaming face folds transitions_stream
                          counts (streaming/ops.markov_foreach_batch)

All hold full DuckDB oracles: probabilities/indices are integer
(ppm / milli) so the value hash is exact regardless of partitioning.
Reference parity: the reference's stateful sequence apps keep
per-key last-state and per-key path state on a stream
(lib/wallaroo/core/state/state.pony semantics via machida
state_computation); these are the batch faces of those shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

TRIGRAM_MIN_SUPPORT = 3  # a 3-step path must occur this often to report
SLIDE_HOURS = 6  # sliding distinct-user window width
KCORE_K = 3  # report the 3-core
KCORE_ROUNDS = 6  # bounded peel rounds (fixpoint for these graphs)
KCORE_EDGE_SUPPORT = 2  # co-purchase edge threshold (matches triangle lane)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


# --- Markov transition matrix ----------------------------------------------
@register(
    "event_transitions",
    oracle="""
WITH s AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
c AS (
  SELECT src, dst, count(*)::BIGINT AS n
  FROM s WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
       ((1000000 * n) // sum(n) OVER (PARTITION BY src))::BIGINT AS prob_ppm
FROM c
""",
    tags=("events", "sequence", "markov"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Markov transition matrix: consecutive
    (src → dst) pairs in (ts, event_id) order within each user, with
    row-normalised transition probability in exact ppm (bigint floor
    division — no float accumulation, hash-exact on any engine).

    Scale shape: ONE window keyed by user_id (per-partition state is
    one user's stream), then a 25-row aggregate; the normalising
    window runs over the |types|² matrix, not the raw events. The
    reference expresses this as a per-key state_computation holding
    the previous event (machida state API); here the sequence pairing
    is a lag/lead window Catalyst can pipeline."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.floor((F.lit(1000000) * F.col("n")) / F.sum("n").over(wsrc))
        .cast("bigint")
        .alias("prob_ppm"),
    )


# --- 3-step behavioural paths ------------------------------------------------
@register(
    "event_path_trigrams",
    oracle=f"""
WITH s AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS b,
         lead(event_type, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS c,
         user_id
  FROM events),
t AS (
  SELECT a, b, c, count(*)::BIGINT AS n,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM s WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY a, b, c)
SELECT a, b, c, n, n_users FROM t WHERE n >= {TRIGRAM_MIN_SUPPORT}
""",
    tags=("events", "sequence", "paths"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-thresholded 3-step paths (a → b → c) per user stream —
    the funnel-discovery companion to events_funnel (which checks ONE
    fixed path; this enumerates all frequent ones).

    Scale shape: the same single user-keyed window as
    event_transitions (two lead offsets share one sort), and the path
    space is |types|³ — the aggregate output is bounded by the type
    vocabulary, not the corpus. n_users is an exact distinct within a
    ≤|types|³-group aggregate."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("a"),
            F.lead("event_type", 1).over(w).alias("b"),
            F.lead("event_type", 2).over(w).alias("c"),
            "user_id",
        )
        .where(F.col("b").isNotNull() & F.col("c").isNotNull())
        .groupBy("a", "b", "c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .where(F.col("n") >= TRIGRAM_MIN_SUPPORT)
    )


# --- sliding distinct users ---------------------------------------------------
@register(
    "sliding_distinct_users",
    oracle=f"""
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
hours AS (SELECT DISTINCT h FROM uh),
ex AS (
  SELECT uh.user_id, uh.h + to_hours(t.i) AS wend
  FROM uh CROSS JOIN range({SLIDE_HOURS}) t(i))
SELECT epoch(ex.wend)::BIGINT AS wend_epoch,
       count(DISTINCT ex.user_id)::BIGINT AS n_users
FROM ex JOIN hours ON hours.h = ex.wend
GROUP BY ex.wend
""",
    tags=("events", "timeseries", "sliding", "distinct"),
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users over a trailing {SLIDE_HOURS}-hour window ending
    at each observed hour — the sliding-uniques metric every ops
    dashboard wants, computed WITHOUT a range-window distinct (which
    Spark would have to re-scan per row).

    Shape: dedup to (user, hour) first (the only full-table pass),
    then each surviving pair is exploded to the ≤{SLIDE_HOURS} window
    ends it can serve — a bounded, constant fan-out — and a single
    hash aggregate counts exact distincts per window end. The
    semi-join against observed hours prunes phantom trailing windows.
    At 100 TB the dedup is the map-side-combining heavy hitter and the
    exploded table is ≤{SLIDE_HOURS}× the DEDUPED size (users×hours),
    not the event count."""
    ev = _events(spark, sf_dir)
    uh = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    hours = uh.select("h").distinct()
    ex = uh.select(
        "user_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SLIDE_HOURS - 1}),"
                " i -> h + make_interval(0, 0, 0, 0, i, 0, 0))"
            )
        ).alias("wend"),
    )
    return (
        ex.join(hours.hint("broadcast"), ex["wend"] == hours["h"], "left_semi")
        .groupBy("wend")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .select(
            F.unix_timestamp("wend").cast("bigint").alias("wend_epoch"),
            "n_users",
        )
    )


# --- K-core decomposition ------------------------------------------------------
def _kcore_round_sql(prev: str, r: int) -> str:
    """One peel round as DuckDB CTEs: degree from the surviving edge
    set, keep vertices with degree >= K, keep edges with both ends
    kept. Pure integer set algebra — identical on any engine.
    MATERIALIZED is load-bearing: each round references the previous
    3-4×, so default CTE inlining expands the 6-round unroll to
    ~4^6 base-table scans (DuckDB then dies on open file handles)."""
    return f"""
d{r} AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT pa AS v FROM {prev} UNION ALL SELECT pb AS v FROM {prev}
  ) GROUP BY v),
k{r} AS MATERIALIZED (SELECT v FROM d{r} WHERE deg >= {KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT e.pa, e.pb FROM {prev} e
  JOIN k{r} ka ON ka.v = e.pa JOIN k{r} kb ON kb.v = e.pb)"""


@register(
    "graph_kcore",
    oracle="""
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {sup}),{rounds},
dfin AS (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT pa AS v FROM e{last} UNION ALL SELECT pb AS v FROM e{last}
  ) GROUP BY v)
SELECT v AS part, deg AS core_degree
FROM dfin WHERE deg >= {k}
""".format(
        k=KCORE_K,
        sup=KCORE_EDGE_SUPPORT,
        rounds=",".join(
            _kcore_round_sql(f"e{r - 1}", r) for r in range(1, KCORE_ROUNDS + 1)
        ),
        last=KCORE_ROUNDS,
    ),
    tags=("analytics", "graph", "kcore"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-core of the co-purchase graph (same support-thresholded
    edge set as graph_triangle_count) by {R} bounded peel rounds:
    drop vertices with degree < {K}, drop edges touching them, repeat.
    Emits each surviving vertex with its final in-core degree.

    Scale shape: the peel is unrolled into ONE lazy plan exactly as
    graph_pagerank unrolls its iterations — per round a symmetric
    union-all degree aggregate (map-side combining) and two semi-join
    filters keyed on vertex id; no collect, no driver-side vertex
    state, and the edge set only ever SHRINKS round over round. The
    edge build is pinned once (referenced by every round). Bounded
    rounds are the contract (like PR_ITERS): for support-thresholded
    co-purchase graphs the peel reaches fixpoint in far fewer rounds,
    and the oracle unrolls the identical count.

    Unlike pagerank's rank chain (linear lineage growth per round),
    each peel round references the previous edge set ~5× (degree
    union 2×, two semi-joins through the kept set), so a fully lazy
    unroll would blow up ~5^R — every round is pin()ned and the prior
    round's blocks are released, exactly the dedup_clusters protocol
    (operators/components.py). Storage stays O(current edge set),
    which only shrinks.""".format(
        K=KCORE_K, R=KCORE_ROUNDS
    )
    from wally_spark.operators.baskets import basket_pair_counts
    from wally_spark.operators.checkpoint import free_blocks, pin

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (see baskets.py)
    edges = (
        basket_pair_counts(li, "l_orderkey", "l_partkey")
        .where(F.col("c") >= KCORE_EDGE_SUPPORT)
        .select("pa", "pb")
    )
    edges = pin(edges)

    # r13 early exit (guide §1.2 step 1 — don't compute what you
    # throw away): peeling is MONOTONE, so a round that removes no
    # edge proves every later round is the identity — stop there.
    # Each round's pin materializes anyway; the count() that detects
    # the fixpoint runs over those cached blocks (near-free) and
    # replaces up to R-1 whole pin jobs of the settled set. At sf0.1
    # the peel settles after round 1: rounds 2-5 were 4 pure-overhead
    # pin jobs (measured: the lane was build 2.76 s / exec 0.05 s).
    # The bounded-rounds contract is unchanged (still at most
    # KCORE_ROUNDS; the oracle unrolls all R rounds, identical by
    # monotonicity).
    n_edges = edges.count()
    for r in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("pa").alias("v"))
            .unionAll(edges.select(F.col("pb").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )
        kept = deg.where(F.col("deg") >= KCORE_K).select("v")
        new_edges = pin(
            edges.join(
                kept.withColumnRenamed("v", "pa"), "pa", "left_semi"
            ).join(kept.withColumnRenamed("v", "pb"), "pb", "left_semi")
        )
        if r > 0:
            free_blocks(edges)  # round r-1's blocks are dead now
        edges = new_edges
        n_new = edges.count()
        if n_new == n_edges or n_new == 0:
            break  # fixpoint: no edge removed (or none left) =>
            # every later round is the identity
        n_edges = n_new
    # final degree over the settled edge set (deg above described the
    # PRE-peel set of the last round; recompute on the survivor edges
    # so vertex and degree refer to the same subgraph)
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return deg.where(F.col("deg") >= KCORE_K).select(
        F.col("v").alias("part"), F.col("deg").alias("core_degree")
    )


# --- LIX readability ----------------------------------------------------------
@register(
    "text_readability",
    oracle="""
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT
           AS n_words,
         len(list_filter(string_split(text, ' '),
                         w -> length(w) > 6))::BIGINT AS n_long,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
           AS n_sents
  FROM documents),
m AS (
  SELECT doc_id, lang, n_words, n_long, n_sents,
         CASE WHEN n_words = 0 THEN 0
              ELSE ((1000 * n_words) // n_sents
                    + (100000 * n_long) // n_words) END::BIGINT AS lix_milli
  FROM t)
SELECT doc_id, lang, n_words, n_long, n_sents, lix_milli,
       CASE WHEN lix_milli < 25000 THEN 'very_easy'
            WHEN lix_milli < 35000 THEN 'easy'
            WHEN lix_milli < 45000 THEN 'medium'
            WHEN lix_milli < 55000 THEN 'hard'
            ELSE 'very_hard' END AS band
FROM m
""",
    tags=("text", "quality", "readability"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX readability per document — words/sentence + percentage of
    long (>6 char) words, the standard language-agnostic readability
    index — in exact milli-unit integer arithmetic (bigint floor
    division both sides, so the hash is exact), banded into the usual
    five difficulty classes. Companion to text_quality's ratio gates:
    a curation mix can quota on `band` exactly like docs_length_band.

    Single documents scan, all codegen string primitives (split /
    filter / regexp_extract_all), zero UDFs, embarrassingly parallel.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    longw = F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) > 6)
    t = docs.select(
        "doc_id",
        "lang",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(longw).cast("bigint").alias("n_long"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        )
        .cast("bigint")
        .alias("n_sents"),
    )
    lix = F.when(F.col("n_words") == 0, F.lit(0)).otherwise(
        F.floor((F.lit(1000) * F.col("n_words")) / F.col("n_sents"))
        + F.floor((F.lit(100000) * F.col("n_long")) / F.col("n_words"))
    )
    m = t.withColumn("lix_milli", lix.cast("bigint"))
    band = (
        F.when(F.col("lix_milli") < 25000, "very_easy")
        .when(F.col("lix_milli") < 35000, "easy")
        .when(F.col("lix_milli") < 45000, "medium")
        .when(F.col("lix_milli") < 55000, "hard")
        .otherwise("very_hard")
    )
    return m.withColumn("band", band)


# --- decode audit / dead-letter routing ---------------------------------------
@register(
    "events_decode_audit",
    oracle="""
WITH v AS (
  SELECT event_type,
         CASE WHEN props IS NULL OR NOT json_valid(props) THEN 'malformed'
              WHEN try_cast(json_extract_string(props, '$.k') AS INTEGER)
                   IS NULL THEN 'missing_k'
              WHEN try_cast(json_extract_string(props, '$.k') AS INTEGER)
                   BETWEEN 0 AND 99 THEN 'ok'
              ELSE 'out_of_range' END AS verdict,
         event_id
  FROM events)
SELECT event_type, verdict, count(*)::BIGINT AS n,
       min(event_id)::BIGINT AS first_event_id
FROM v GROUP BY event_type, verdict
""",
    tags=("decode", "events", "quality", "dlq"),
)
def events_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue audit for the schema-on-read decode path
    (events_json_extract's operational twin): every event is routed to
    ok / malformed-JSON / missing-or-non-integer key / out-of-range,
    with per-(type, verdict) counts and the first offending event id —
    the report a production decoder keeps NEXT TO its output instead
    of silently nulling bad rows (the reference's decoder errors fail
    the pipeline; a 100 TB batch pipeline quarantines and continues).

    Single scan, codegen JSON + conditional only. from_json with a
    typed schema distinguishes unparseable JSON (null struct) from a
    parseable object missing the key (null field) — the distinction
    get_json_object alone cannot make."""
    ev = load_tables(spark, sf_dir)["events"]
    # PERMISSIVE from_json yields a struct of NULL fields (not a null
    # struct) on broken JSON — the corrupt-record column is the only
    # expression-level way to tell "unparseable" from "key absent"
    # k parsed as STRING on purpose: with a typed field, PERMISSIVE
    # mode also flags a type-mismatched k ('{"k": "x"}') as corrupt,
    # but the routing contract (and the DuckDB oracle's json_valid)
    # reserves 'malformed' for syntax errors — try_cast below owns the
    # type verdict
    parsed = F.from_json(
        "props",
        "k string, _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    # try_cast, not cast: ANSI mode (Spark 4 default) throws on a
    # non-numeric k — the DLQ must route that row, not kill the job
    k = F.get_json_object("props", "$.k").try_cast("int")
    verdict = (
        F.when(
            F.col("props").isNull() | parsed["_corrupt"].isNotNull(),
            "malformed",
        )
        .when(k.isNull(), "missing_k")
        .when(k.between(0, 99), "ok")
        .otherwise("out_of_range")
    )
    return (
        ev.select("event_type", verdict.alias("verdict"), "event_id")
        .groupBy("event_type", "verdict")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
    )


# --- part affinity (Jaccard over order sets) ----------------------------------
@register(
    "part_affinity_jaccard",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT l_partkey, count(*)::BIGINT AS n_ord FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.part_a::BIGINT AS part_a, p.part_b::BIGINT AS part_b, p.n_ab,
       ta.n_ord AS n_a, tb.n_ord AS n_b,
       ((1000000 * p.n_ab) // (ta.n_ord + tb.n_ord - p.n_ab))::BIGINT
         AS jaccard_ppm
FROM pairs p
JOIN tot ta ON ta.l_partkey = p.part_a
JOIN tot tb ON tb.l_partkey = p.part_b
ORDER BY jaccard_ppm DESC, part_a, part_b
LIMIT 50
""",
    tags=("analytics", "basket", "similarity"),
)
def part_affinity_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-affinity by exact Jaccard over order sets: |A∩B| from the
    support-thresholded co-occurrence pairs (part_cooccurrence's
    bounded O(k²)-per-order build), |A|/|B| from a per-part aggregate,
    J = n_ab / (n_a + n_b − n_ab) in exact ppm. Normalises raw
    co-occurrence by popularity — the difference between "bought
    together" and "both just popular" (basket_rules' lift cousin on
    set semantics).

    The totals join is keyed on a single part id against a
    dimension-sized aggregate; the final top-50 compiles to
    TakeOrderedAndProject on the unique (jaccard desc, a, b) key."""
    # r13: operators/baskets self-join-free pair build (identical pair
    # multiset; two exchanges instead of four, no SMJ — see baskets.py)
    from wally_spark.operators.baskets import basket_item_sets, basket_pairs

    li = load_tables(spark, sf_dir)["lineitem"]
    sets = basket_item_sets(li, "l_orderkey", "l_partkey")
    tot = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ord"))
    )
    pairs = (
        basket_pairs(sets)
        .groupBy(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    ta = tot.select(
        F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a")
    )
    tb = tot.select(
        F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b")
    )
    j = (
        pairs.join(ta, "part_a")
        .join(tb, "part_b")
        .select(
            F.col("part_a").cast("bigint").alias("part_a"),
            F.col("part_b").cast("bigint").alias("part_b"),
            "n_ab",
            "n_a",
            "n_b",
            F.floor(
                (F.lit(1000000) * F.col("n_ab"))
                / (F.col("n_a") + F.col("n_b") - F.col("n_ab"))
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
    return j.orderBy(
        F.desc("jaccard_ppm"), "part_a", "part_b"
    ).limit(50)


# --- per-user activity gaps / churn flags -------------------------------------
CHURN_IDLE_DAYS = 7


@register(
    "user_activity_gaps",
    oracle=f"""
WITH mx AS (SELECT max(ts) AS corpus_max FROM events),
g AS (
  SELECT user_id, ts, event_id,
         floor(epoch(ts) - epoch(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT AS gap_s
  FROM events)
SELECT g.user_id,
       count(*)::BIGINT AS n_events,
       count(DISTINCT date_trunc('day', g.ts))::BIGINT AS n_days_active,
       coalesce(max(g.gap_s), 0)::BIGINT AS max_gap_s,
       floor(epoch(any_value(mx.corpus_max)) - epoch(max(g.ts)))::BIGINT
         AS idle_s,
       (floor(epoch(any_value(mx.corpus_max)) - epoch(max(g.ts)))
        > {CHURN_IDLE_DAYS} * 86400) AS churned
FROM g CROSS JOIN mx
GROUP BY g.user_id
""",
    tags=("events", "sequence", "churn"),
)
def user_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile and churn flag: event count, distinct
    active days, largest intra-user gap, and idle time versus the
    corpus frontier (churned = idle > {d} days) — the lifecycle gate a
    retention pipeline computes before cohorting
    (events_cohort_retention's per-user complement).

    Gaps are floored to whole seconds PER ROW (exact under any
    partitioning, same protocol as interarrival_stats but integer);
    the corpus frontier is a 1-row aggregate broadcast-combined like
    graph_triangle_count's n_edges (allow-listed single-row
    broadcast-NL, not a data cross join).""".format(d=CHURN_IDLE_DAYS)
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        F.floor(
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        )
        .cast("bigint")
        .alias("gap_s"),
    )
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    agg = (
        g.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct(F.date_trunc("day", F.col("ts")))
            .cast("bigint")
            .alias("n_days_active"),
            F.coalesce(F.max("gap_s"), F.lit(0))
            .cast("bigint")
            .alias("max_gap_s"),
            F.floor(
                F.first("corpus_max").cast("double")
                - F.max(F.col("ts").cast("double"))
            )
            .cast("bigint")
            .alias("idle_s"),
        )
    )
    return agg.withColumn(
        "churned", F.col("idle_s") > CHURN_IDLE_DAYS * 86400
    )


# --- user event-mix entropy (bot/regularity probe) ----------------------------
@register(
    "user_event_entropy",
    oracle="""
WITH tc AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type),
h AS (
  SELECT user_id, sum(c)::BIGINT AS n_events,
         count(*)::BIGINT AS n_types,
         log2(sum(c)) - sum(c * log2(c)) / sum(c) AS ent
  FROM tc GROUP BY user_id)
SELECT user_id, n_events, n_types,
       floor(100.0 * ent)::BIGINT AS entropy_cb,
       (n_events >= 50 AND floor(100.0 * ent) < 100) AS low_entropy_heavy
FROM h
""",
    tags=("events", "sequence", "quality"),
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix, in centibits —
    the behavioural-regularity probe an abuse pipeline runs: a heavy
    user whose traffic is nearly one event type (low entropy, high
    volume) is flagged as bot-shaped. Same exact-log protocol as
    text_word_entropy: H = log2(N) − Σ c·log2(c)/N over INTEGER
    counts, floored to centibits, so the hash is engine-exact.

    Two map-side-combining aggregates keyed (user, type) then user —
    state bounded by users × |types|, no window, no skew exposure."""
    ev = load_tables(spark, sf_dir)["events"]
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    h = tc.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("ent"),
    )
    ecb = F.floor(100.0 * F.col("ent")).cast("bigint")
    return h.select(
        "user_id",
        "n_events",
        "n_types",
        ecb.alias("entropy_cb"),
        ((F.col("n_events") >= 50) & (ecb < 100)).alias("low_entropy_heavy"),
    )


# --- token-count histogram (corpus shape diagnostic) --------------------------
@register(
    "docs_token_histogram",
    oracle="""
WITH t AS (
  SELECT lang,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_tok
  FROM documents),
b AS (
  SELECT lang,
         CASE WHEN n_tok = 0 THEN -1
              ELSE floor(log2(n_tok)) END::BIGINT AS bucket_log2,
         n_tok
  FROM t)
SELECT lang, bucket_log2,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS total_tokens
FROM b GROUP BY lang, bucket_log2
""",
    tags=("text", "sampling", "histogram"),
)
def docs_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language power-of-two histogram of document token counts —
    the corpus-shape diagnostic behind packing and length-quota
    decisions (value_histogram's documents twin; docs_length_band
    quotas on fixed chars, this reports the full log₂ distribution of
    whitespace tokens). log2 of an INTEGER count is engine-identical,
    so bucket edges — and the hash — are exact. Single scan, one
    aggregate bounded by langs × ~20 buckets."""
    docs = load_tables(spark, sf_dir)["documents"]
    n_tok = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
    b = docs.select(
        "lang",
        F.when(n_tok == 0, F.lit(-1))
        .otherwise(F.floor(F.log2(n_tok)))
        .cast("bigint")
        .alias("bucket_log2"),
        n_tok.alias("n_tok"),
    )
    return b.groupBy("lang", "bucket_log2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )


# --- timed window funnel (ClickHouse windowFunnel parity) --------------------
FUNNEL_HORIZON_S = 3600  # whole funnel must complete within 1h of first view


@register(
    "events_window_funnel",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(v.t0) AS t0, min(e.ts) AS t1
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t0
    AND e.ts <= v.t0 + INTERVAL {FUNNEL_HORIZON_S} SECOND
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t1
    AND e.ts <= c.t0 + INTERVAL {FUNNEL_HORIZON_S} SECOND
  GROUP BY e.user_id
),
st AS (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS stage
  FROM u LEFT JOIN v USING (user_id)
         LEFT JOIN c USING (user_id)
         LEFT JOIN p USING (user_id)
)
SELECT s.stage::BIGINT AS stage,
       coalesce(n.n_users, 0)::BIGINT AS n_users
FROM (SELECT unnest(range(0, 4)) AS stage) s
LEFT JOIN (SELECT stage, count(*) AS n_users FROM st GROUP BY stage) n
  USING (stage)
""",
    tags=("events", "sequence", "funnel"),
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED conversion funnel (the ClickHouse ``windowFunnel``
    shape): view → later click → later purchase, every step within
    FUNNEL_HORIZON_S of the user's FIRST view. Reports, for each
    funnel depth 0–3, how many users topped out exactly there — the
    campaign-attribution report, where events_funnel's unbounded
    chain answers a different (lifetime-conversion) question.

    Scale shape: each stage is a type-filtered scan (filter pushed to
    parquet) aggregated per user, then a user-keyed join against the
    previous stage's survivor table — survivor tables shrink
    monotonically and are per-user rows, never raw events. The final
    rollup is 4 rows joined to a generated stage spine so absent
    depths report 0 (resample_1h's densify protocol).

    Reference parity: the reference builds funnels as per-key state
    machines over the keyed stream (state_computation holding
    last-stage + deadline); this is the batch face with identical
    semantics."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    u = ev.select("user_id").distinct()
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    horizon = F.expr(f"INTERVAL {FUNNEL_HORIZON_S} SECOND")
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("t0")) & (F.col("ts") <= F.col("t0") + horizon))
        .groupBy("user_id")
        .agg(F.min("t0").alias("t0"), F.min("ts").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t0") + horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    st = (
        u.join(v.select("user_id", F.lit(1).alias("s1")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("s2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("s3")), "user_id", "left")
        .select(
            F.when(F.col("s3").isNotNull(), 3)
            .when(F.col("s2").isNotNull(), 2)
            .when(F.col("s1").isNotNull(), 1)
            .otherwise(0)
            .alias("stage")
        )
    )
    spine = spark.range(4).select(F.col("id").cast("bigint").alias("stage"))
    counts = st.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        spine.join(counts.withColumn("stage", F.col("stage").cast("bigint")),
                   "stage", "left")
        .select(
            "stage",
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
        )
    )


# --- per-user burst detection ------------------------------------------------
BURST_N = 2  # events in one minute that count as a burst at test SFs


@register(
    "user_burst_minutes",
    oracle=f"""
WITH m AS (
  SELECT user_id, date_trunc('minute', ts) AS mi, count(*)::BIGINT AS n
  FROM events GROUP BY user_id, mi),
r AS (
  SELECT user_id, mi, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, mi) AS rk
  FROM m),
t AS (
  SELECT user_id, sum(n)::BIGINT AS total_events,
         count(*)::BIGINT AS n_active_minutes
  FROM m GROUP BY user_id)
SELECT r.user_id, t.total_events, t.n_active_minutes,
       r.n AS peak_events, r.mi AS peak_minute,
       (CASE WHEN r.n >= {BURST_N} THEN 1 ELSE 0 END)::BIGINT AS burst
FROM r JOIN t USING (user_id)
WHERE r.rk = 1
""",
    tags=("events", "sequence", "abuse"),
)
def user_burst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit / bot-burst audit: each user's peak events-per-minute
    (earliest minute on ties, deterministic), total activity, and a
    burst flag at BURST_N — the per-key rate check the reference runs
    as a keyed count-window alert (alerts_stateful shape) expressed as
    a batch report.

    Scale shape: two map-side-combined aggregates — (user, minute)
    then user — and the peak is a partial-aggregating max(struct(n,
    -epoch)) argmax, NEVER a per-user sort or rank window (the oracle
    ranks; the engine needn't). No windows, no joins with raw events;
    the widest shuffle carries one row per active user-minute."""
    ev = _events(spark, sf_dir)
    m = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("mi")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per_user = m.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("total_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_minutes"),
        F.max(
            F.struct(
                F.col("n").alias("n"),
                (-F.unix_timestamp("mi")).alias("negm"),
            )
        ).alias("pk"),
    )
    return per_user.select(
        "user_id",
        "total_events",
        "n_active_minutes",
        F.col("pk.n").alias("peak_events"),
        F.timestamp_seconds(-F.col("pk.negm")).alias("peak_minute"),
        F.when(F.col("pk.n") >= BURST_N, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("burst"),
    )


# --- label-propagation communities (r8) --------------------------------------
LPA_ROUNDS = 3  # synchronous rounds (bounded contract, like PR_ITERS)


def _lpa_round_sql(prev: str, r: int) -> str:
    """One synchronous LPA round as DuckDB CTEs: count neighbor labels
    through the (doubled) adjacency, then argmax by (count DESC, label
    ASC) via row_number. MATERIALIZED for the same reason as the kcore
    unroll: each round references the previous twice."""
    return f"""
c{r} AS MATERIALIZED (
  SELECT a.dst AS v, l.label, count(*)::BIGINT AS n
  FROM adj a JOIN {prev} l ON l.v = a.src GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY n DESC, label) AS rn
    FROM c{r}) WHERE rn = 1)"""


@register(
    "graph_label_prop",
    oracle="""
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {sup}),
adj AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM e0
  UNION ALL SELECT pb AS src, pa AS dst FROM e0),
l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label FROM adj),{rounds}
SELECT label AS community, count(*)::BIGINT AS n_members,
       min(v)::BIGINT AS min_part, max(v)::BIGINT AS max_part
FROM l{last} GROUP BY label
""".format(
        sup=KCORE_EDGE_SUPPORT,
        rounds=",".join(
            _lpa_round_sql(f"l{r - 1}", r) for r in range(1, LPA_ROUNDS + 1)
        ),
        last=LPA_ROUNDS,
    ),
    tags=("analytics", "graph", "communities"),
)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007) over the co-purchase graph (same support-thresholded
    edge set as graph_triangle_count / graph_kcore): every vertex
    starts as its own label; each round, a vertex adopts the most
    frequent label among its neighbors, ties broken by smallest label
    — fully deterministic, unlike the classic randomized sweep, so the
    fixed LPA_ROUNDS unroll is bit-reproducible on any engine and
    partitioning. Report: per surviving community, member count and
    the part-id range.

    Scale shape: mirrors graph_pagerank's round structure — per round
    ONE join of the label relation (|V| rows) against the doubled
    adjacency keyed on src, then a (dst, label)-keyed count (map-side
    combined) and a min-struct argmax (never a per-vertex sort at
    scale: min(struct(-n, label)) is an aggregate). Hub vertices fan
    through the same salted-join knob the triangle lane uses if a
    profile shows reducer skew. Rounds are unrolled in ONE lazy plan:
    unlike the kcore peel (which references the previous round ~5×
    and must pin every round), each LPA round consumes the previous
    label relation exactly ONCE — linear lineage, pagerank's shape —
    so only the adjacency (read by all rounds) is pinned; per-round
    pins add an eager action per round without shortening any
    recomputation (measured: same wall time, 3 fewer jobs).
    """
    from wally_spark.operators.baskets import basket_pair_counts
    from wally_spark.operators.checkpoint import pin

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (see baskets.py)
    edges = (
        basket_pair_counts(li, "l_orderkey", "l_partkey")
        .where(F.col("c") >= KCORE_EDGE_SUPPORT)
        .select("pa", "pb")
    )
    # r14: prepartition default OFF — the r13 claim was falsified
    # (VERDICT r13 #1): localCheckpoint under AQE yields
    # UnknownPartitioning, so every LPA round still plans its own
    # adjacency Exchange; AQE's runtime stage cache serves them from
    # one materialized shuffle, and the pin-time repartition was a
    # pure added exchange.
    from wally_spark.operators.components import (
        _prepartition_on,
        _shuffle_width,
    )

    adj_plan = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(
        edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    if _prepartition_on(spark):
        adj_plan = adj_plan.repartition(_shuffle_width(spark), "src")
    adj = pin(adj_plan)
    labels = adj.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    for r in range(LPA_ROUNDS):
        counts = (
            adj.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        new_labels = (
            counts.groupBy("v")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("neg_n"), F.col("label"))
                ).alias("best")
            )
            .select("v", F.col("best.label").alias("label"))
        )
        labels = new_labels
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("v").cast("bigint").alias("min_part"),
        F.max("v").cast("bigint").alias("max_part"),
    )


# --- stationary distribution of the event-type Markov chain (r8) -------------
MARKOV_ROUNDS = 6


def _markov_oracle() -> str:
    cte = """s AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
c AS (
  SELECT src, dst, count(*)::BIGINT AS n
  FROM s WHERE dst IS NOT NULL GROUP BY src, dst),
p AS (
  SELECT src, dst,
         ((1000000 * n) // sum(n) OVER (PARTITION BY src))::BIGINT AS ppm
  FROM c),
states AS (SELECT DISTINCT src AS st FROM c UNION SELECT DISTINCT dst FROM c),
nt AS (SELECT count(*)::BIGINT AS n FROM states),
pi0 AS (SELECT st, (1000000 // nt.n)::BIGINT AS v FROM states, nt)"""
    prev = "pi0"
    for r in range(1, MARKOV_ROUNDS + 1):
        cte += f""",
pi{r} AS (
  SELECT p.dst AS st, (sum(pi.v * p.ppm) // 1000000)::BIGINT AS v
  FROM {prev} pi JOIN p ON p.src = pi.st GROUP BY p.dst)"""
        prev = f"pi{r}"
    return f"""
WITH {cte}
SELECT st AS event_type, v AS pi_ppm FROM {prev}
"""


@register(
    "events_markov_stationary",
    oracle=_markov_oracle(),
    tags=("events", "sequence", "markov", "iterative"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    (event_transitions is the matrix face; this is its fixpoint): the
    long-run share of time a user stream spends in each event type,
    via MARKOV_ROUNDS synchronous power-iteration steps π·P in EXACT
    integer ppm (the graph_pagerank milli-rank convention — floor
    division per step, so the result is partitioning-independent and
    the unrolled-CTE oracle matches by construction).

    Scale shape: the transition matrix is |types|²-bounded and
    BROADCAST; each round is one broadcast join + one |types|-group
    aggregate over the π relation, all lazily composed into ONE plan —
    the heavy work (the user-keyed lead window building transitions)
    happens once. Dangling mass (a type with no outgoing edges) is
    dropped by the join each round, identically in both engines."""
    return stationary_from_transitions(
        event_transitions(spark, sf_dir).select("src", "dst", "prob_ppm")
    )


def stationary_from_transitions(transitions: DataFrame) -> DataFrame:
    """Power-iteration tail over a (src, dst, prob_ppm) transition
    relation — shared by the batch lane above and the streaming
    incremental face (streaming/ops.markov_foreach_batch recomputes
    probabilities from its merged count corpus with the identical
    formula, then calls this), so batch ≡ stream by shared code
    path."""
    tr = F.broadcast(transitions)
    states = (
        tr.select(F.col("src").alias("st"))
        .union(tr.select(F.col("dst").alias("st")))
        .distinct()
    )
    nt = states.agg(F.count(F.lit(1)).alias("n"))
    pi = states.crossJoin(F.broadcast(nt)).selectExpr(
        "st", "CAST(1000000 div n AS BIGINT) AS v"
    )
    for _ in range(MARKOV_ROUNDS):
        pi = (
            pi.join(tr, pi["st"] == tr["src"])
            .groupBy(F.col("dst").alias("st2"))
            .agg(
                F.expr("CAST(sum(v * prob_ppm) div 1000000 AS BIGINT)").alias(
                    "v"
                )
            )
            .withColumnRenamed("st2", "st")
        )
    return pi.select(F.col("st").alias("event_type"), F.col("v").alias("pi_ppm"))
