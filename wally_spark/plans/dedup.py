"""Deduplication operators over `documents` / `embeddings` — the
scale path a 100 TB pretraining pipeline needs.

Shapes:
  dedup_exact          — content-hash groupBy (one shuffle on the hash)
  dedup_minhash        — MinHash signatures → banded LSH → candidate
                         pairs via bucket join (never O(n²))
  dedup_ngram_jaccard  — exact Jaccard verification via shingle join
                         (the verify stage downstream of minhash)
  dedup_simhash        — 64-bit SimHash fingerprint via exploded
                         tokens + 64 codegen'd bit-count aggregates
  dedup_simhash_pairs  — bucket-collision candidates + exact hamming
                         verify (bit_count(xor) ≤ T)
  dedup_embedding      — embedding-cosine near-dup pairs
  dedup_clusters       — connected components over candidate pairs
                         (keep one doc per near-dup cluster)

Hashing is md5-derived so Spark and DuckDB agree bit-for-bit (minhash:
ONE md5 per shingle parsed to a 32-bit int + integer permutations);
integer / lexicographic comparisons only — no float accumulation
anywhere except the cosine queries, whose outputs floor to basis
points. All pair-generating self-joins cap bucket sizes at MAX_BUCKET
(a hot bucket is an exact-dup group — dedup_exact's job), and flag
joins against content-derived keys are salted (operators/skew.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.operators.checkpoint import pin, pin_shuffle_top
from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

N_HASHES = 8
BAND_ROWS = 2  # 4 bands of 2 rows each

_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(words) - 1, 1)),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        FROM documents)
  WHERE len(words) >= 3
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain scan: fan_out is applied INSIDE the explode/agg-heavy
    # queries (shingle/token streams) — a blanket fan_out taxes the
    # light one-shuffle queries (dedup_exact et al.) ~0.2-0.3 s of
    # pure repartition overhead at local scale for zero win
    return load_tables(spark, sf_dir)["documents"]


def shingles_of(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct 3-word shingles, exploded, for any
    DataFrame with (doc_id, text) — shared by the batch queries and the
    streaming near-dedup (streaming/ops.py)."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words")).where(F.size("words") >= 3)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("words") - 2, F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                F.element_at("words", i),
                F.element_at("words", i + 1),
                F.element_at("words", i + 2),
            ),
        )
    )
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingles_of(fan_out(_docs(spark, sf_dir), "doc_id"))


# --- exact dedup: content-hash groupBy ---
@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc,
       count(*) AS n_copies
FROM documents
GROUP BY content_hash
""",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper selection per exact content hash. At 100 TB: one shuffle
    keyed by the hash; hashes are uniform so no skew."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingle_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) MULTISET — 3-word shingles. No per-doc
    distinct: minhash is invariant to shingle multiplicity, so
    signature consumers skip that work entirely. Use ``shingles_of``
    where SET semantics matter (Jaccard).

    Two spellings, A/B-gated by ``spark.wally.shingle.hof`` (r13):
    the default array-transform HOF runs interpreted per row but adds
    ZERO shuffle — at 100 TB the alternative window spelling exchanges
    and sorts the ENTIRE token stream by doc_id (locally that exchange
    happens to be absorbed by fan_out's repartition, which is a no-op
    at scale, so the local plans undersell the window's true cost).
    Guide §2.4: remove the shuffle outright."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words")).where(F.size("words") >= 3)
    hof = (
        str(
            docs.sparkSession.conf.get("spark.wally.shingle.hof", "true")
        ).lower()
        != "false"
    )
    if hof:
        shingles = F.transform(
            F.sequence(F.lit(1), F.size("words") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("words", i),
                F.element_at("words", i + 1),
                F.element_at("words", i + 2),
            ),
        )
        return d.select("doc_id", F.explode(shingles).alias("shingle"))
    from pyspark.sql import Window

    toks = d.select("doc_id", F.posexplode("words").alias("p0", "w"))
    win = Window.partitionBy("doc_id").orderBy("p0")
    w2 = F.lead("w", 2).over(win)
    return (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ", F.col("w"), F.lead("w", 1).over(win), w2
            ).alias("shingle"),
            w2.alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .select("doc_id", "shingle")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{N_HASHES-1}) for any (doc_id, text) DataFrame —
    the corpus-resident signature the streaming near-dedup persists."""
    return shingle_stream(docs).groupBy("doc_id").agg(*_minhash_exprs())


# --- MinHash + banded LSH candidate pairs ---
# Universal-hash minhash (r6): ONE md5 per shingle, parsed to a 32-bit
# integer H, then N_HASHES permutations h_i = (a_i*H + b_i) mod P as
# pure int64 arithmetic — 8x fewer md5 evaluations than the former
# min(md5(seed:shingle)) per-seed spelling, the dominant CPU of every
# query downstream of candidates (minhash, jaccard, clusters,
# keep_best, curation_pipeline). a_i <= 1e9 and H < 2^32 keep a_i*H+b_i
# under 2^63 in BOTH engines, and DuckDB mirrors the md5-hex parse
# nibble-by-nibble, so the permuted values — and therefore the band
# keys and the candidate pair set — are engine-identical.
# LSH bucket cap: a band bucket holding B docs emits B(B-1)/2 candidate
# pairs, so one bucket of a million byte-identical docs would emit
# 5*10^11 pairs. Buckets past MAX_BUCKET are dropped from pair
# generation (they are exact/near-exact dup GROUPS — dedup_exact's
# job, run first in curation_pipeline); the cap binds only in
# pathological corpora (max observed bucket at sf0.1 is 7) and is
# mirrored in every oracle.
MAX_BUCKET = 4096
# Tighter cap for PAIR-EMITTING lanes (dedup_embedding_lsh): a bucket
# at MAX_BUCKET would still emit 4096²/2 ≈ 8.4M pairs, and the r8 sf1
# scale record measured exactly that failure — a 10-fold-duplicated
# embedding corpus grew one natural 200-member band bucket to 2000
# members (104M pair emissions corpus-wide, 843 s vs 1.5 s at sf0.1).
# When the OUTPUT is the pair list, the cap must bound emissions
# (B²/2), not just membership: buckets past PAIR_EMIT_BUCKET are
# mass-duplicate clusters — exact-dedup/clusters territory, their
# pairwise listing is redundant (every member pairs with every other).
# ≤ 32k emissions per bucket; mirrored in the oracle.
PAIR_EMIT_BUCKET = 256

MH_P = 4294967291  # largest prime < 2^32
MH_A = (1000000007, 998244353, 997001789, 911382323,
        824633702, 754974721, 663608941, 515764801)
MH_B = (12345, 67890, 111213, 141516, 171819, 202122, 232425, 262728)

# DuckDB: first 8 hex chars of md5(shingle) as an int (big-endian)
_MH_H_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(shingle), {k + 1}, 1)) - 1)"
    f" * {16 ** (7 - k)}"
    for k in range(8)
) + ")"

_MH_SIG_SQL = ", ".join(
    f"min(({MH_A[h]} * {_MH_H_SQL} + {MH_B[h]}) % {MH_P}) AS mh{h}"
    for h in range(N_HASHES)
)


def _minhash_exprs():
    """min((a_h*H + b_h) mod P) per permutation, H = first 8 md5 hex
    chars of the shingle as a 32-bit int — engine-identical integers."""
    H = F.conv(
        F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    return [
        F.min((F.lit(MH_A[h]) * H + F.lit(MH_B[h])) % MH_P).alias(f"mh{h}")
        for h in range(N_HASHES)
    ]


@register(
    "dedup_minhash",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
sigs AS (
  SELECT doc_id,
         {_MH_SIG_SQL}
  FROM exploded GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id,"
    f" mh{2*b}::VARCHAR || ':' || mh{2*b+1}::VARCHAR AS band_key FROM sigs"
    for b in range(N_HASHES // BAND_ROWS)
  )}
),
bands_k AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bsz
    FROM bands) WHERE bsz <= {MAX_BUCKET}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(DISTINCT a.band_id) AS shared_bands
FROM bands_k a JOIN bands_k b
  ON a.band_key = b.band_key AND a.band_id = b.band_id
 AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
""",
    tags=("dedup", "lsh"),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) → 4 bands × 2 rows → bucket-join candidates.
    At 100 TB the band join shuffles on band_key (uniform), so cost is
    O(candidates), not O(n²)."""
    sigs = minhash_signatures(fan_out(_docs(spark, sf_dir), "doc_id"))
    return minhash_band_candidates(sigs)


def minhash_band_candidates(sigs: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs from a (doc_id, mh0..mh7) signature
    relation — dedup_minhash's body, factored (r13) so audit lanes
    that ALSO read the signatures (minhash_estimate_audit,
    minhash_bbit_audit, minhash_containment) can pin `sigs` once and
    derive candidates from the pinned relation instead of recomputing
    the corpus shingle+minhash pass per consumer (guide §1.2 step 1:
    one corpus pass, not two). Expressions byte-identical to the
    pre-factor body — the plain dedup_minhash plan is unchanged."""
    # one explode instead of a 4-way union: the union shape makes Spark
    # recompute the signature aggregation per branch
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                # ":"-separated — bigint minhashes of different digit
                # lengths must not collide by concatenation
                F.concat_ws(
                    ":", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                ).alias("band_key"),
            )
            for b in range(N_HASHES // BAND_ROWS)
        ]
    )
    # materialize bands ONCE before the self-join: the two join
    # branches otherwise recompute the whole shingle+signature plan
    # (exchange reuse is unreliable under AQE). bands is n_docs × 4
    # short rows — far smaller than the shingle stream it derives
    # from, so pinning it is cheap at any corpus size.
    bands = pin(
        sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
            "doc_id", "b.band_id", "b.band_key"
        )
    )
    # bucket cap (MAX_BUCKET): count docs per bucket with a map-side-
    # combined aggregate (skew-proof) and drop oversized buckets before
    # the self-join — bounds pair output at B(B-1)/2 per bucket. The
    # filter join probes the pinned bands relation; a hot bucket costs
    # O(its size) here, never O(its size squared).
    sizes = bands.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    bands_k = bands.join(
        sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_id", "band_key"]
    ).select("doc_id", "band_id", "band_key")
    # r14 adjudication (VERDICT r13 #3): the r13 first-shared-band
    # rewrite was A/B'd against this pair-keyed spelling interleaved
    # at sf0.1 AND sf1 (natural + dupstress). The pair-keyed spelling
    # wins or ties EVERYWHERE once measured in one session: sf0.1
    # dedup_ngram_jaccard 1.31 vs 1.75, dup_rate_report 1.72 vs 2.10;
    # sf1-natural reps=3 dedup_minhash 2.10 vs 2.48, ngram_jaccard
    # 6.49 vs 7.33 (the r13 "win at scale" was cross-session host
    # noise; the doc-keyed aggregate + extra pin + wider self-join
    # rows cost more than the candidate-keyed dedup exchange they
    # remove at every measured scale — the bucket caps already bound
    # the candidate relation to O(docs × bands) rows, so it never
    # dwarfs the doc relation the way the theory assumed). Default is
    # the pair-keyed spelling; spark.wally.minhash.fsb=true keeps the
    # first-shared-band arm measurable. Identical pair multiset and
    # shared_bands values in both arms (r13 oracle parity covered
    # both spellings).
    _spark = sigs.sparkSession
    if (
        str(_spark.conf.get("spark.wally.minhash.fsb", "false")).lower()
        != "true"
    ):
        a0 = bands_k.alias("a")
        b0 = bands_k.alias("b")
        return (
            a0.join(
                b0,
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            # per (pair, band_id) the equi-join emits at most one row,
            # so a plain count equals count(DISTINCT band_id)
            .agg(F.count(F.lit(1)).alias("shared_bands"))
        )
    # r13 (guide §2.4 — remove the shuffle outright): the old spelling
    # deduplicated multi-band collisions with a pair-keyed groupBy — a
    # candidate-sized Exchange. Instead, fold each doc's SURVIVING band
    # keys into one array (tiny map-side-combined aggregate: n_docs ×
    # n_bands rows in, n_docs out), re-derive the band rows by
    # exploding that array so every row carries its doc's full key set
    # for free, and emit each pair ONLY from its first shared band —
    # a codegen CASE filter, no dedup shuffle. shared_bands is the
    # same null-rejecting-equality count over the two arrays (bands
    # dropped by the bucket cap are null slots, so the count equals
    # the old per-surviving-band join count exactly).
    n_bands = N_HASHES // BAND_ROWS
    # ss is pinned: the explode below feeds BOTH self-join branches,
    # and without the pin each branch would re-run the aggregate's
    # exchange (measured: doubles the lane). One row per doc — tiny.
    # r14: LAZY pin — the plan top is the doc-keyed aggregate's own
    # exchange, which AQE materializes at toRdd regardless, so the
    # eager block-write job was a pure fixed cost (sf0.1 A/B: it was
    # most of the fsb arm's 0.2-0.5 s build regression vs the
    # pair-keyed spelling; VERDICT r13 #3).
    ss = pin(bands_k.groupBy("doc_id").agg(
        F.array(
            *[
                F.max(F.when(F.col("band_id") == i, F.col("band_key")))
                for i in range(n_bands)
            ]
        ).alias("ss")
    ), eager=False)
    bke = ss.select(
        "doc_id", "ss", F.posexplode("ss").alias("band_id", "band_key")
    ).where(F.col("band_key").isNotNull())
    a = bke.alias("a")
    b_ = bke.alias("b")
    first_match = (
        "CASE "
        + " ".join(
            f"WHEN a.ss[{i}] = b.ss[{i}] THEN {i}" for i in range(n_bands)
        )
        + " END"
    )
    shared = " + ".join(
        f"(CASE WHEN a.ss[{i}] = b.ss[{i}] THEN 1 ELSE 0 END)"
        for i in range(n_bands)
    )
    return (
        a.join(
            b_,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.expr(f"a.band_id = {first_match}"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(f"CAST({shared} AS BIGINT)").alias("shared_bands"),
        )
    )


# --- exact n-gram Jaccard verification, bounded by LSH candidates ---
# SQL fragment shared by the jaccard / curation oracles: minhash bands →
# distinct candidate pairs (assumes CTEs `exploded` is in scope).
_CAND_SQL = f"""
sigs AS (
  SELECT doc_id,
         {_MH_SIG_SQL}
  FROM exploded GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id,"
    f" mh{2*b}::VARCHAR || ':' || mh{2*b+1}::VARCHAR AS band_key FROM sigs"
    for b in range(N_HASHES // BAND_ROWS)
  )}
),
bands_k AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bsz
    FROM bands) WHERE bsz <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_k a JOIN bands_k b
    ON a.band_key = b.band_key AND a.band_id = b.band_id
   AND a.doc_id < b.doc_id
)"""


def _candidate_jaccard(
    spark: SparkSession, sf_dir: str, cands: DataFrame | None = None
) -> DataFrame:
    """(doc_a, doc_b, jac_bp_expr-ready cols): exact Jaccard computed
    ONLY on minhash candidate pairs. The shingle join is keyed by the
    candidate pair, so cost is O(candidates × shingles-per-doc) — a hot
    shingle in k docs no longer produces k² rows (the round-1 full
    self-join was quadratic on hot shingles at the 100 TB target).

    ``cands`` (r13): callers that already hold the candidate pairs —
    e.g. derived from a pinned signature relation they also read for
    other columns — pass them in so the minhash chain is not rebuilt
    here (guide §1.2 step 1).

    r13 NEGATIVE result (do not retry): pinning one DISTINCT shingle
    relation and deriving signatures + sizes + both join sides from it
    (minhash over the distinct set equals minhash over the multiset —
    min is duplicate-invariant) was interleave-A/B-measured a clear
    REGRESSION: pool_filter_report +48%, lsh_recall_measured +31%,
    minhash_containment +17%, dedup_ngram_jaccard +7%. The eager
    materialization of 260k shingle strings costs more than four
    codegen recomputes of the same pass (parquet pages OS-cached,
    shingling is one whole-stage-codegen map), and pin-carrying
    callers (lsh_recall_measured) pay the shingle pass twice. The
    recompute spelling below is the measured winner."""
    if cands is None:
        cands = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        cands.join(sa_sh, "doc_a")
        .join(sb_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # sizes is doc-count-sized (unbounded at 100 TB) — no broadcast
    # hint; AQE still picks broadcast when the side is actually small.
    return shared.join(sa, "doc_a").join(sb, "doc_b")


def _jac_bp():
    return 10000.0 * F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       floor(10000.0 * inter / (sa.n + sb.n - inter))::BIGINT AS jaccard_bp
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 10000.0 * inter / (sa.n + sb.n - inter) >= 1000.0
""",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.10 over distinct 3-gram shingles, verified on
    minhash LSH candidate pairs only (the full composition a 100 TB
    pipeline runs: candidates from dedup_minhash, exact verify here).
    The md5-based minhash is deterministic, so the DuckDB oracle
    expresses the identical composition — parity stays exact."""
    jac = _candidate_jaccard(spark, sf_dir)
    return (
        jac.where(_jac_bp() >= 1000.0)
        .select("doc_a", "doc_b", F.floor(_jac_bp()).cast("bigint").alias("jaccard_bp"))
    )


# --- near-dup cluster resolution: connected components over pairs ---
@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster
FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
""",
    tags=("dedup", "clusters", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: the step AFTER candidate pairs in
    a real curation pipeline (C4/RefinedWeb keep one doc per near-dup
    cluster). Connected components over the minhash-LSH candidate
    pairs via distributed min-label propagation
    (operators/components.py); every document gets
    cluster = min(doc_id) of its component, singletons label
    themselves, and `doc_id == cluster` selects the keepers.

    The oracle expresses the same fixpoint as a recursive transitive
    closure — both engines see the identical md5-derived pair set, so
    parity is exact. Scale: per round one edge-keyed shuffle + one
    vertex-keyed join, O(diameter) rounds (near-dup clusters are
    near-cliques: 2-4), lineage truncated per round."""
    from wally_spark.operators.components import connected_components

    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    docs = _docs(spark, sf_dir).select("doc_id")
    comp = connected_components(
        docs, pairs, vertex_col="doc_id", src="doc_a", dst="doc_b"
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster")
    )


# --- SimHash: md5-per-token bit-fold, pure JVM expressions ---
# Token hash = first 8 bytes of md5 (big-endian uint64). Bit j of the
# fold is the majority vote of bit j across all token hashes. Both
# engines compute nibbles via position-in-'0123456789abcdef' so the
# arithmetic is literally identical.
_HEXPOS = "0123456789abcdef"


# shared CTE chain: (doc_id, simhash, bucket) for both simhash oracles
_SIMHASH_CTES = f"""toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), nibs AS (
  SELECT doc_id,
         list_transform(words, t -> list_transform(range(1, 17),
           k -> strpos('{_HEXPOS}', substr(md5(t), k, 1)) - 1)) AS tok_nibs
  FROM toks
), votes AS (
  SELECT doc_id,
         list_transform(range(0, 64), j -> CASE WHEN
           list_sum(list_transform(tok_nibs,
             nb -> 2 * ((nb[16 - (j // 4)] >> (j % 4)) & 1) - 1)) > 0
           THEN 1 ELSE 0 END) AS maj
  FROM nibs
), sim AS (
  SELECT doc_id,
         (list_sum(list_transform(range(0, 63),
            j -> maj[j + 1] * (1::BIGINT << j)))::HUGEINT
          - maj[64]::HUGEINT * 9223372036854775808)::BIGINT AS simhash,
         list_sum(list_transform(range(48, 64),
            j -> maj[j + 1] * (1::BIGINT << (j - 48))))::BIGINT AS bucket
  FROM votes
)"""


@register(
    "dedup_simhash",
    oracle=f"WITH {_SIMHASH_CTES}\nSELECT doc_id, simhash, bucket FROM sim",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + 16-bit prefix bucket.

    Shape: explode tokens → one md5 per token → the hash's first 8
    bytes as two 32-bit halves (hi = hex chars 1-8, lo = 9-16; the
    oracle's nibble arithmetic reads the same big-endian bits) → 64
    conditional-sum aggregates per doc. Every expression here is
    whole-stage-codegen'd (shiftright with literal offsets), and the
    groupBy partial-aggregates map-side, so the shuffle moves 65
    counters per document — not tokens. Round 1 folded a 64-wide
    vote vector through nested higher-order lambdas, which Spark
    evaluates interpreted per token (~9 s at sf0.1 vs ~1 s for this).

    At 100 TB: one scan, map-side combine, doc-keyed shuffle of fixed
    width. Majority vote for bit j = [2 * ones_j > n_tokens]; docs with
    no tokens keep all-zero bits via explode_outer + coalesce."""
    return simhash_of(
        fan_out(_docs(spark, sf_dir).select("doc_id", "text"), "doc_id")
    )


def simhash_of(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, bucket) for any (doc_id, text) relation — the
    dedup_simhash body, parameterized so the streaming edit-dedup face
    fingerprints arriving batches with the IDENTICAL expressions (same
    rationale as segment_docs / bmp_dhash)."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    toks = docs.select(
        "doc_id", F.explode_outer(words).alias("tok")
    ).withColumn("h", F.md5(F.col("tok").cast("binary")))
    # bits 32..63 live in hex chars 1-8, bits 0..31 in chars 9-16
    toks = toks.withColumn(
        "hi", F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")
    ).withColumn("lo", F.conv(F.substring("h", 9, 8), 16, 10).cast("bigint"))

    # The 64 per-bit vote counters, the 64 majority CASEs, and the two
    # weighted folds are built as SQL TEXT and parsed by a handful of
    # F.expr calls (r13): the former Column-algebra spelling issued
    # ~700 py4j round-trips (~3 ms each on this host) — 1.7-2.6 s of
    # driver-side DataFrame-BUILD time per consumer lane, 3x the
    # fingerprint's actual execution. Expression semantics are
    # unchanged operator-for-operator (shiftright & 1, coalesce 0,
    # CASE majority, bigint weights with the -2^63 top bit), so the
    # plan and results are identical; only the construction path
    # differs. Four lanes consume this builder (dedup_simhash,
    # dedup_simhash_pairs, simhash_recall_audit, dedup_edit_verified).
    def bit_sql(j: int) -> str:
        half, off = ("hi", j - 32) if j >= 32 else ("lo", j)
        return f"coalesce((shiftright({half}, {off}) & 1), 0)"

    agg = toks.groupBy("doc_id").agg(
        F.expr("count(tok) AS n"),
        *[F.expr(f"sum({bit_sql(j)}) AS c{j}") for j in range(64)],
    )
    maj_sql = [
        f"(CASE WHEN 2 * c{j} > n THEN 1 ELSE 0 END)" for j in range(64)
    ]
    # two's-complement: weight for bit 63 is -2^63
    weights_sql = [f"CAST({1 << j} AS BIGINT)" for j in range(63)] + [
        "CAST(-9223372036854775808 AS BIGINT)"
    ]
    simhash_sql = " + ".join(
        f"{m} * {w}" for m, w in zip(maj_sql, weights_sql)
    )
    bucket_sql = " + ".join(
        f"{maj_sql[j]} * CAST({1 << (j - 48)} AS BIGINT)"
        for j in range(48, 64)
    )
    return agg.select(
        "doc_id",
        F.expr(simhash_sql).alias("simhash"),
        F.expr(bucket_sql).alias("bucket"),
    )


# --- SimHash candidate pairs: banded collision + hamming verify ---
HAMMING_T = 6
# 8 bands x 8 bits: pigeonhole-EXACT for hamming <= 7 (>= HAMMING_T) —
# a pair within 7 bits cannot differ in all 8 bands, so at least one
# band value matches and the pair reaches the verifier. The r10 single
# 16-bit-prefix band MEASURED 12/78 caught at T=6 on sf0.01 (the
# simhash_recall_audit lane, r11): vocabulary-driven bit correlation
# puts most true near-dups outside the prefix. The OR-amplification is
# the mm_phash_dup move (4x16 for T=3), resized for T=6.
SIMHASH_BANDS = 8
SIMHASH_BAND_BITS = 8
_SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def simhash_band_rows(d: DataFrame) -> DataFrame:
    """(doc_id, simhash, band, bv) — one row per band of the 64-bit
    fingerprint (bv = bits [8*band, 8*band+8)). Arithmetic >> plus the
    mask reads the same bits in both engines (the mm_phash_dup oracle
    precedent for the sign-carrying top band)."""
    return d.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", SIMHASH_BAND_BITS * i).bitwiseAND(
                        F.lit(_SIMHASH_BAND_MASK)
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "bv"),
    )


# shared oracle fragment: banded, bucket-capped candidate pairs with
# exact hamming, from the `sim` CTE (requires _SIMHASH_CTES upstream)
_SIMHASH_BAND_PAIRS_SQL = f"""bnd AS (
  SELECT doc_id, simhash, band,
         (simhash >> ({SIMHASH_BAND_BITS} * band)) & {_SIMHASH_BAND_MASK}
           AS bv
  FROM sim, (SELECT unnest(range({SIMHASH_BANDS})) AS band)
),
bnd_k AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bv) AS bsz FROM bnd)
  WHERE bsz <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM bnd_k a JOIN bnd_k b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)"""


def simhash_candidate_pairs(d: DataFrame, max_hamming: int) -> DataFrame:
    """(doc_a, doc_b, hamming) candidate pairs of a (doc_id, simhash)
    relation via the 8x8-bit banding: band-explode, cap hot band
    values at MAX_BUCKET (a hot (band, bv) is a mass-dup cluster —
    dedup_exact's job), equi-join per band, collapse the multi-band
    duplicate emission with one distinct, keep hamming <= max_hamming.
    Shared by dedup_simhash_pairs (T=6, exact by pigeonhole) and
    dedup_edit_verified (T=12, a measured candidate net)."""
    b = simhash_band_rows(d)
    sizes = b.groupBy("band", "bv").agg(F.count(F.lit(1)).alias("bsz"))
    b = b.join(
        sizes.where(F.col("bsz") <= MAX_BUCKET), ["band", "bv"]
    ).select("doc_id", "simhash", "band", "bv")
    l, r = b.alias("l"), b.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
    )


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_SIMHASH_CTES},
{_SIMHASH_BAND_PAIRS_SQL}
SELECT doc_a, doc_b, hamming FROM cand
WHERE hamming <= {HAMMING_T}
""",
    tags=("dedup", "simhash", "pairs"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SimHash dedup shape: 8x8-bit bands narrow the
    candidate set — pigeonhole-EXACT at HAMMING_T=6 (a pair within 6
    bits shares at least one of the 8 band values; measured recall
    10000 bp by the simhash_recall_audit lane, vs 1538 bp for the r10
    single 16-bit prefix it replaces) — then exact hamming distance
    over the 64-bit fingerprints keeps pairs within HAMMING_T bits.
    At 100 TB the join shuffles on the (band, bv) key only (8 short
    rows per doc, the dedup_minhash band geometry), hamming is one
    codegen'd bit_count(xor) per candidate, and the multi-band
    duplicate emission collapses with one distinct."""
    # materialize once: the self-join would otherwise run the whole
    # fingerprint computation once per side; pin() upgrades to a
    # reliable checkpoint when a checkpoint dir is configured
    d = pin_shuffle_top(dedup_simhash(spark, sf_dir))
    return simhash_candidate_pairs(d, HAMMING_T)


# --- measured simhash band recall vs exact hamming ground truth (r11) -------
# Ground truth generator (r13 rework): broadcast all-pairs hamming —
# every doc pair evaluated once against bit_count(xor), the
# ann_bruteforce shape. The r11-r12 generator was a 16x4-bit
# pigeonhole band join; MEASURED at sf0.1 it emitted 43.1M banded
# pair rows (the dup-heavy corpus re-emits every near-dup cluster in
# every band) vs C(5000, 2) = 12.5M for plain all-pairs — on an audit
# corpus the "candidate generator" was 3.4x MORE work than exhaustive
# comparison, plus a 65,536-doc silent-hollowing bound (capped truth
# buckets) it needed a tripwire column for. All-pairs is smaller,
# shuffle-free (one broadcast of the bounded audit corpus), and
# exact at EVERY threshold with no hollowing regime. The quadratic
# cost is the audit's own semantics; the corpus bound is now purely
# a cost statement — `truth_n_docs` reports the broadcast size, and
# past ~100k docs the audit runs on a documented sample, as before.
_TRUTH_MAX_DOCS = 100_000  # guidance bound: n² pair evals + broadcast
SIMHASH_AUDIT_TS = (HAMMING_T, 12)  # dedup_simhash_pairs / edit_verified nets
# Candidate geometries A/B'd by the audit: the production 8x8 scheme
# and the two denser-band alternatives the r11 verdict asked to price
# (fewer/larger bands emit fewer candidate pairs but catch fewer true
# pairs at T=12 — both cover the low 60 bits, top 4 unused).
# A/B geometry columns, priced in r12 and RETIRED from the default run
# (r13, verdict cost-creep flag): b6x10 measured 6879 bp recall @ T=12
# for 2.19M emitted, b5x12 4134 bp for 834k — both below the 9000 bp
# bar, so the 8x8 production scheme stays. The conclusion is recorded
# here and in TUNING.md; carrying the losing geometries in every run
# tripled the audit's caught-column and emitted-stats mass. Flip
# SIMHASH_AUDIT_AB = True to re-derive the full A/B (oracle and Spark
# sides both generate from the same scheme table).
SIMHASH_AUDIT_AB = False
_AB_SCHEMES = (("b6x10", 6, 10), ("b5x12", 5, 12))
_AUDIT_SCHEMES = (("band8", SIMHASH_BANDS, SIMHASH_BAND_BITS),) + (
    _AB_SCHEMES if SIMHASH_AUDIT_AB else ()
)


# oracle fragments, generated from the same scheme table the Spark
# side iterates — one source of truth for the A/B geometry list
_AUDIT_CAUGHT_SQL = ",\n         ".join(
    ["CASE WHEN a.bucket = b.bucket THEN 1 ELSE 0 END AS c_prefix"]
    + [
        "CASE WHEN ("
        + " OR ".join(
            f"((a.simhash >> {bits * i}) & {(1 << bits) - 1})"
            f" = ((b.simhash >> {bits * i}) & {(1 << bits) - 1})"
            for i in range(nb)
        )
        + f") THEN 1 ELSE 0 END AS c_{nm}"
        for nm, nb, bits in _AUDIT_SCHEMES
    ]
)
_AUDIT_ROLLUP_SQL = " UNION ALL ".join(
    f"SELECT {t}::BIGINT AS t, count(*)::BIGINT AS n_true,\n       "
    + ",\n       ".join(
        f"sum(c_{nm})::BIGINT AS caught_{nm},\n       "
        f"((10000 * sum(c_{nm})) // nullif(count(*), 0))::BIGINT"
        f" AS recall_{nm}_bp"
        for nm in ["prefix"] + [s[0] for s in _AUDIT_SCHEMES]
    )
    + f"\nFROM truth WHERE hamming <= {t}"
    for t in SIMHASH_AUDIT_TS
)
_AUDIT_STATS_SQL = ",\n    ".join(
    [
        f"(SELECT coalesce(sum(bsz * (bsz - 1) // 2), 0)::BIGINT FROM"
        f" (SELECT count(*) AS bsz FROM sim GROUP BY bucket) q"
        f" WHERE bsz <= {MAX_BUCKET}) AS emitted_prefix"
    ]
    + [
        f"(SELECT coalesce(sum(bsz * (bsz - 1) // 2), 0)::BIGINT FROM"
        f" (SELECT count(*) AS bsz FROM sim,"
        f" (SELECT unnest(range({nb})) AS band)"
        f" GROUP BY band, (simhash >> ({bits} * band)) & {(1 << bits) - 1}) q"
        f" WHERE bsz <= {MAX_BUCKET}) AS emitted_{nm}"
        for nm, nb, bits in _AUDIT_SCHEMES
    ]
    + [
        "(SELECT count(*)::BIGINT FROM sim) AS truth_n_docs"
    ]
)


@register(
    "simhash_recall_audit",
    oracle=f"""
WITH {_SIMHASH_CTES},
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming,
         {_AUDIT_CAUGHT_SQL}
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max(SIMHASH_AUDIT_TS)}
),
stats AS (SELECT
    {_AUDIT_STATS_SQL})
SELECT r.*, s.* FROM ({_AUDIT_ROLLUP_SQL}) r CROSS JOIN stats s
ORDER BY t
""",
    tags=("dedup", "simhash", "audit"),
)
def simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured candidate RECALL + PRECISION/COST of the simhash
    banding schemes vs EXACT hamming ground truth — the
    lsh_recall_measured discipline applied to the simhash family
    (r10 verdict item 3; cost columns r11 verdict item 2). Truth =
    ALL pairs within hamming {TM}, generated exactly by a broadcast
    all-pairs hamming scan (r13 rework — MEASURED smaller than the
    old 16x4 pigeonhole band join on the dup-heavy corpus: 12.5M
    pair evals vs 43.1M banded emissions at sf0.1, with no
    hollow-truth bound). Each truth pair is scored CAUGHT under the
    retired 16-bit prefix bucket and the production 8x8-bit scheme,
    at T={TS[0]} (dedup_simhash_pairs) and T={TS[1]}
    (dedup_edit_verified's candidate net); the 6x10 / 5x12 geometry
    A/B columns priced in r12 are gated behind SIMHASH_AUDIT_AB.

    Cost side: `emitted_<scheme>` = sum over capped buckets of
    C(bsz, 2) — the scheme's banded-join emission mass (its shuffle
    cost and an upper bound on distinct candidates); `caught_<scheme>`
    at T is exactly the scheme's Levenshtein verify mass at that net.
    Measured at sf0.1: band8 9031 bp recall @ T=12 / 5.09M emitted;
    the r12 A/B priced b6x10 at 6879 bp / 2.19M and b5x12 at 4134 bp
    / 834k — both below the 9000 bp bar, so 8x8 stays.
    `truth_n_docs` reports the broadcast corpus size; past
    ~{TMAX:,} docs the quadratic audit runs on a documented sample
    (the truth relation is exact at ANY size — the bound is cost,
    not correctness, unlike the old capped-bucket hollowing).

    Scale shape: ONE broadcast of the bounded audit corpus (doc_id,
    simhash, bucket — ~16 B/doc) against a partitioned scan: no
    shuffle, no explode, n² cheap bit-ops spread across partitions;
    caught-ness is a pure expression over the pair's two
    fingerprints; the emitted counts are groupBy-count rollups of
    band rows (never pair materialization); ONE pinned pair relation
    feeds both threshold rollups.""".format(
        TM=max(SIMHASH_AUDIT_TS),
        TMAX=_TRUTH_MAX_DOCS,
        TS=SIMHASH_AUDIT_TS,
    )
    from functools import reduce

    d = pin_shuffle_top(dedup_simhash(spark, sf_dir))
    a = d.select("doc_id", "simhash", "bucket").alias("a")
    b = d.select("doc_id", "simhash", "bucket").alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))

    def scheme_eq(side_a, side_b, nbands, nbits):
        mask = (1 << nbits) - 1
        terms = [
            F.shiftright(side_a, nbits * i).bitwiseAND(F.lit(mask))
            == F.shiftright(side_b, nbits * i).bitwiseAND(F.lit(mask))
            for i in range(nbands)
        ]
        return reduce(lambda x, y: x | y, terms)

    caught_cols = [
        F.when(F.col("a.bucket") == F.col("b.bucket"), 1)
        .otherwise(0)
        .alias("c_prefix")
    ] + [
        F.when(
            scheme_eq(F.col("a.simhash"), F.col("b.simhash"), nb, bits), 1
        )
        .otherwise(0)
        .alias(f"c_{nm}")
        for nm, nb, bits in _AUDIT_SCHEMES
    ]
    # broadcast all-pairs truth: the bounded audit corpus (~16 B/doc)
    # broadcasts once; each partition of the probe side scans it with
    # cheap bit-ops — every pair evaluated exactly once, no shuffle
    truth = pin(
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ham <= max(SIMHASH_AUDIT_TS))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
            *caught_cols,
        )
    )
    names = ["prefix"] + [s[0] for s in _AUDIT_SCHEMES]
    rollups = [
        truth.where(F.col("hamming") <= t)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            *[
                F.sum(f"c_{nm}").cast("bigint").alias(f"caught_{nm}")
                for nm in names
            ],
        )
        .select(
            F.lit(t).cast("bigint").alias("t"),
            "n_true",
            *[
                c
                for nm in names
                for c in (
                    F.col(f"caught_{nm}"),
                    F.expr(
                        f"cast((10000 * caught_{nm}) div nullif(n_true, 0)"
                        " as bigint)"
                    ).alias(f"recall_{nm}_bp"),
                )
            ],
        )
        for t in SIMHASH_AUDIT_TS
    ]
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)

    # cost stats: one bounded row (5 scalars), crossJoined onto the
    # 2-row rollup — the 1-row-BNL shape of the allowlisted lanes
    def emitted(band_rows: DataFrame, name: str) -> DataFrame:
        bs = band_rows.groupBy("band", "bv").agg(
            F.count(F.lit(1)).alias("bsz")
        )
        return bs.where(F.col("bsz") <= MAX_BUCKET).agg(
            F.coalesce(F.sum(F.expr("bsz * (bsz - 1) div 2")), F.lit(0))
            .cast("bigint")
            .alias(name)
        )

    prefix_rows = d.select(
        F.lit(0).alias("band"), F.col("bucket").alias("bv")
    )
    stats = emitted(prefix_rows, "emitted_prefix")
    for nm, nb, bits in _AUDIT_SCHEMES:
        mask = (1 << bits) - 1
        rows = d.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftright("simhash", bits * i).bitwiseAND(
                            F.lit(mask)
                        )
                        for i in range(nb)
                    ]
                )
            ).alias("band", "bv")
        )
        stats = stats.crossJoin(emitted(rows, f"emitted_{nm}"))
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("truth_n_docs"))
    return out.crossJoin(stats.crossJoin(n_docs)).orderBy("t")


def _n_embedding_blocks(n_vectors: int, target_block_rows: int = 4096) -> int:
    """Block count for the triangle block join, sized so ONE block's
    matrix row stays small (4096 × 64 float64 ≈ 2 MB) — a fixed block
    count would concentrate the whole corpus into 8 collect_list rows
    and hit Spark's 2 GiB single-value ceiling long before 100 TB."""
    import math

    return max(8, math.ceil(n_vectors / target_block_rows))


# --- embedding-cosine near-duplicate pairs ---
@register(
    "dedup_embedding",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor(10000.0 * list_cosine_similarity(a.embedding, b.embedding))::BIGINT
         AS cos_bp
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4
""",
    tags=("dedup", "embedding"),
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine > 0.4), exact, fully
    distributed: the classic triangle block join. Vectors are hashed
    into NB blocks, each unordered block pair (a ≤ b) becomes one row
    carrying both blocks' matrices, and a numpy matmul scores the pair
    inside the task. No driver-side materialization anywhere — the
    round-1 version collect()ed the corpus to the driver, which is an
    OOM at the 100 TB target.

    Cost model: every vector is replicated NB times (once per partner
    block), tasks hold two blocks at a time; NB is derived from the
    corpus count (one scalar job) so each block's collect_list row is
    bounded at ~4096 vectors regardless of corpus size. The O(n²)
    comparison work is the semantics' own lower bound, spread evenly
    across NB(NB+1)/2 independent tasks. At 100 TB the same exact
    verify runs against LSH candidates instead — that shape is
    registered as dedup_embedding_lsh below."""
    import numpy as np
    import pandas as pd

    emb = load_tables(spark, sf_dir)["embeddings"]
    nb = _n_embedding_blocks(emb.count())
    rows = emb.select(
        "vec_id",
        "embedding",
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nb)).alias("blk"),
    )
    blocks = rows.groupBy("blk").agg(
        F.collect_list("vec_id").alias("ids"),
        F.collect_list("embedding").alias("embs"),
    )
    a = blocks.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"),
        F.col("embs").alias("embs_a"),
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"),
        F.col("embs").alias("embs_b"),
    )
    pair_rows = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def score(batches):
        empty = {
            "vec_a": np.array([], dtype=np.int64),
            "vec_b": np.array([], dtype=np.int64),
            "cos_bp": np.array([], dtype=np.int64),
        }
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(empty)
                continue
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.array([np.asarray(e, dtype=np.float64) for e in row.embs_a])
                mb = np.array([np.asarray(e, dtype=np.float64) for e in row.embs_b])
                ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
                mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
                cos = ma @ mb.T
                ai, bi = np.where(cos > 0.4)
                if row.blk_a == row.blk_b:
                    keep = ids_a[ai] < ids_b[bi]
                else:
                    keep = np.ones(len(ai), dtype=bool)
                ai, bi = ai[keep], bi[keep]
                ia, ib = ids_a[ai], ids_b[bi]
                yield pd.DataFrame(
                    {
                        "vec_a": np.minimum(ia, ib),
                        "vec_b": np.maximum(ia, ib),
                        "cos_bp": np.floor(10000.0 * cos[ai, bi]).astype(np.int64),
                    }
                )

    return pair_rows.mapInPandas(score, "vec_a bigint, vec_b bigint, cos_bp bigint")


def _embedding_lsh_oracle() -> str:
    from wally_spark.plans.similarity import _SIGS_CTE

    return f"""
WITH {_SIGS_CTE},
sigs_k AS (
  SELECT vec_id, band_id, band_sig FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_sig) AS bsz
    FROM sigs) WHERE bsz <= {PAIR_EMIT_BUCKET}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs_k a JOIN sigs_k b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       floor(10000.0 * list_cosine_similarity(a.embedding, b.embedding))::BIGINT AS cos_bp
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4
"""


_PAIR_COS_UDF = None


def _pair_cos_udf(ea, eb):
    """Arrow-batched pairwise cosine: one numpy einsum per batch instead
    of an interpreted higher-order aggregate per row (the r2 lesson —
    HOF lambdas skip whole-stage codegen). Built lazily: pandas_udf
    registration needs a live session, which executors re-importing the
    module don't have."""
    global _PAIR_COS_UDF
    if _PAIR_COS_UDF is None:
        import numpy as np
        import pandas as pd

        from pyspark.sql.types import DoubleType

        def pair_cos(a, b):
            if not len(a):
                return pd.Series([], dtype="float64")
            ma = np.array(a.tolist(), dtype=np.float64)
            mb = np.array(b.tolist(), dtype=np.float64)
            dots = np.einsum("ij,ij->i", ma, mb)
            return pd.Series(
                dots
                / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1))
            )

        _PAIR_COS_UDF = F.pandas_udf(pair_cos, DoubleType())
    return _PAIR_COS_UDF(ea, eb)


def pair_cos_scored(df: DataFrame, ka: str, kb: str, ea: str, eb: str) -> DataFrame:
    """(ka, kb, cos) from a pair relation carrying both embedding
    arrays — ONE zero-copy Arrow einsum per batch via ``mapInArrow``
    (guide §4.2): the list column's values buffer reshapes straight to
    an (n, dim) float64 matrix, where the pandas_udf route first
    materializes a per-row object array (Series.tolist() →
    np.array — measured +30% on the 810k-pair knn batch, r13). The
    cosine doubles are bit-identical to ``_pair_cos_udf``'s (same
    numpy expressions); callers keep their scalar post-expressions
    (floor/filter/nudge) in the JVM so each lane's oracle arithmetic
    stays visible at the call site. Only the four named columns cross
    the boundary (guide §4.1: mapInArrow ships every column you pass)."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        def mat(col):
            arr = (
                col.combine_chunks()
                if isinstance(col, pa.ChunkedArray)
                else col
            )
            return (
                arr.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64, copy=False)
                .reshape(len(arr), -1)
            )

        for rb in batches:
            n = rb.num_rows
            if not n:
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0), rb.column(1), pa.array([], type=pa.float64())],
                    names=[ka, kb, "cos"],
                )
                continue
            ma, mb = mat(rb.column(2)), mat(rb.column(3))
            dots = np.einsum("ij,ij->i", ma, mb)
            cos = dots / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1))
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), pa.array(cos, type=pa.float64())],
                names=[ka, kb, "cos"],
            )

    return df.select(ka, kb, ea, eb).mapInArrow(
        gen, f"{ka} bigint, {kb} bigint, cos double"
    )


# --- LSH-prefiltered embedding dedup: the 100 TB path ---
@register("dedup_embedding_lsh", oracle=_embedding_lsh_oracle(), tags=("dedup", "embedding", "lsh"))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with the hyperplane-LSH prefilter: the
    shape that replaces dedup_embedding's all-pairs block product at
    100 TB. One signature pass per side (8 bands × 4 md5-derived
    planes, shared with ann_lsh), a bucket self-join on the band key —
    O(collisions), never O(n²) — then exact cosine verifies each
    candidate pair JVM-side. Recall is the LSH OR-amplification bound:
    a cos≈0.9 pair misses a bucket with probability (1-p^4)^8 ≈ 0.2%.

    Full hash oracle: DuckDB recomputes identical band signatures
    (plans/similarity._SIGS_CTE) and the same candidate set.

    Plan shape: the candidate self-join and dedup run over NARROW
    (vec_id, band_id, band_sig) rows — embeddings join in only after
    the pair set is deduplicated, so the wide vectors never ride the
    band-join or dedup shuffles (measured 2x at sf0.1), and the cosine
    is one Arrow einsum per batch."""
    from wally_spark.plans.similarity import _banded

    emb = load_tables(spark, sf_dir)["embeddings"]
    # materialize the signature pass ONCE: a self-join recomputes each
    # branch's plan (exchange reuse is unreliable under AQE), which
    # would sign the corpus twice and double the Arrow traffic; pin()
    # upgrades to a reliable checkpoint when a checkpoint dir is set
    banded = pin(_banded(emb, "vec_id", "e").drop("e"))
    # emission-bounding bucket cap (PAIR_EMIT_BUCKET — tighter than
    # MAX_BUCKET because this lane's OUTPUT is the pair list; see the
    # constant's comment for the measured sf1 failure it prevents)
    sizes = banded.groupBy("band_id", "band_sig").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    banded = banded.join(
        sizes.where(F.col("bsz") <= PAIR_EMIT_BUCKET), ["band_id", "band_sig"]
    )
    # r13 NEGATIVE result (do not retry): the first-shared-band
    # dedup-free pair emission that wins in minhash_band_candidates
    # LOSES here (2.53 -> 3.81 s measured A/B, min-of-3): the
    # hyperplane band_sig values are wide, so carrying every vec's
    # full sig ARRAY through both sides of the self-join shuffle
    # costs more than the pair-keyed dropDuplicates it removes. Same
    # measured loss on _knn_scored (similarity.py). Kept spelling:
    a = banded.select(F.col("vec_id").alias("vec_a"), "band_id", "band_sig")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band_id", "band_sig")
    pairs = (
        a.join(b, ["band_id", "band_sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pair_cos_scored(
            pairs.join(ea, "vec_a").join(eb, "vec_b"), "vec_a", "vec_b", "ea", "eb"
        )
        .where(F.col("cos") > 0.4)
        .select(
            "vec_a",
            "vec_b",
            F.floor(10000.0 * F.col("cos")).cast("bigint").alias("cos_bp"),
        )
    )


# --- end-to-end curation pipeline: quality → language → dedup → stats ---
@register(
    "curation_pipeline",
    oracle=f"""
WITH feat AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), quality AS (
  SELECT doc_id, source FROM feat
  WHERE len(words) >= 50
    AND len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is'))) > 0
), shingled AS ({_SHINGLES_SQL}),
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
dup_pairs AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
), dups AS (
  SELECT DISTINCT doc_b AS dup_doc FROM dup_pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 10000.0 * inter / (sa.n + sb.n - inter) >= 8000.0
)
SELECT source, count(*) AS n_docs
FROM quality
WHERE doc_id NOT IN (SELECT dup_doc FROM dups)
GROUP BY source
""",
    tags=("dedup", "pipeline"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation composition a pretraining pipeline runs:
    quality gate (length + fluency) → near-dup removal (keep the
    lowest doc_id of every >=0.8-Jaccard pair) → per-source corpus
    stats. Each stage is the same operator exercised standalone by
    text_quality / dedup_ngram_jaccard; the dup stage runs on minhash
    candidates only (the bounded 100 TB shape — see
    _candidate_jaccard), mirrored exactly in the oracle."""
    docs = fan_out(_docs(spark, sf_dir), "doc_id")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in", "is")])
    quality = (
        docs.select("doc_id", "source", words.alias("words"))
        .where(
            (F.size("words") >= 50)
            & (F.size(F.filter("words", lambda w: F.array_contains(stop, w))) > 0)
        )
        .select("doc_id", "source")
    )
    dups = (
        _candidate_jaccard(spark, sf_dir)
        .where(_jac_bp() >= 8000.0)
        .select(F.col("doc_b").alias("dup_doc"))
        .distinct()
    )
    return (
        quality.join(dups, quality.doc_id == dups.dup_doc, "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "dedup_keep_best",
    oracle=f"""
WITH RECURSIVE shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
SELECT cluster, kept_doc, kept_chars, n_docs
FROM (
  SELECT c.cluster, d.doc_id AS kept_doc, d.n_chars::BIGINT AS kept_chars,
         count(*) OVER (PARTITION BY c.cluster)::BIGINT AS n_docs,
         row_number() OVER (PARTITION BY c.cluster
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
WHERE rn = 1
""",
    tags=("dedup", "clusters", "curation"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the step that turns near-dup
    clusters into a deduplicated corpus (C4/RefinedWeb keep the best
    representative, not an arbitrary one). Per cluster: keep the
    LONGEST document (ties → lowest doc_id), report cluster size.

    Spark side is the scale-right shape: one groupBy(cluster) with a
    min(struct(-n_chars, doc_id)) partial-aggregating argmax — no
    per-cluster sort, no window over the full corpus; the oracle uses
    the equivalent (readable) window formulation. Composes
    dedup_clusters, so parity covers the whole
    candidates → components → selection chain."""
    comp = dedup_clusters(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    best = (
        comp.join(docs, "doc_id")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("negc"), F.col("doc_id").alias("d")
                )
            ).alias("best"),
        )
    )
    return best.select(
        "cluster",
        F.col("best.d").alias("kept_doc"),
        (-F.col("best.negc")).cast("bigint").alias("kept_chars"),
        "n_docs",
    )


# --- corpus-health dashboard: near-dup rate per (lang, source) ---------------
@register(
    "dup_rate_report",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 10000.0 * inter / (sa.n + sb.n - inter) >= 1000.0
),
dup_docs AS (
  SELECT doc_a AS doc_id FROM verified
  UNION
  SELECT doc_b FROM verified
)
SELECT d.lang, d.source,
       count(*)::BIGINT AS n_docs,
       count(dd.doc_id)::BIGINT AS n_dup_docs,
       (10000 * count(dd.doc_id) // count(*))::BIGINT AS dup_bp
FROM documents d LEFT JOIN dup_docs dd USING (doc_id)
GROUP BY d.lang, d.source
""",
    tags=("dedup", "report", "curation"),
)
def dup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health dashboard: per (lang, source) cell, how many
    documents participate in at least one VERIFIED near-dup pair
    (minhash candidates → exact Jaccard ≥ 0.10, the dedup_ngram_jaccard
    chain) — the per-slice duplication-rate report an operator reads
    before deciding which crawl sources to down-weight. Composes the
    verified-pair plan and collapses it: doc membership is a distinct
    union of pair endpoints (tiny relative to the corpus), the rollup
    is a low-cardinality (lang, source) aggregate with map-side
    combine. Integer basis points — engine-exact."""
    verified = dedup_ngram_jaccard(spark, sf_dir)
    dup_docs = (
        verified.select(F.col("doc_a").alias("doc_id"))
        .union(verified.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return (
        docs.join(dup_docs, "doc_id", "left")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("is_dup").cast("bigint").alias("n_dup_docs"),
            F.expr("(10000 * count(is_dup)) div count(*)")
            .cast("bigint")
            .alias("dup_bp"),
        )
    )


# --- cross-source contamination -----------------------------------------------
@register(
    "cross_source_dup_report",
    oracle="""
WITH hs AS (
  SELECT DISTINCT md5(text) AS h, source FROM documents),
tot AS (SELECT source, count(*)::BIGINT AS n_hashes FROM hs GROUP BY source)
SELECT a.source AS source_a, b.source AS source_b,
       count(*)::BIGINT AS n_shared,
       any_value(ta.n_hashes) AS n_a, any_value(tb.n_hashes) AS n_b,
       ((1000000 * count(*)) // least(any_value(ta.n_hashes),
                                      any_value(tb.n_hashes)))::BIGINT
         AS overlap_ppm
FROM hs a
JOIN hs b ON a.h = b.h AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY a.source, b.source
""",
    tags=("dedup", "curation", "contamination"),
)
def cross_source_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct content hashes appear in BOTH, normalised by the
    smaller side (overlap coefficient, exact ppm) — the report that
    decides whether two crawl feeds are the same corpus relabeled
    (dup_rate_report is per-source; this is the between-sources face,
    the check run before mixing feeds into a pretraining corpus).

    Scale shape: one (hash, source) dedup keyed by uniform md5, a
    hash-keyed self-join whose per-hash fanout is bounded by the
    SOURCE vocabulary (≤|sources| rows per hash, not doc count), and
    a |sources|²-bounded aggregate. Totals join keys on source — a
    dimension-sized side."""
    docs = _docs(spark, sf_dir)
    hs = docs.select(
        F.md5(F.col("text").cast("binary")).alias("h"), "source"
    ).distinct()
    tot = hs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hashes")
    )
    a = hs.select(F.col("h"), F.col("source").alias("source_a"))
    b = hs.select(F.col("h"), F.col("source").alias("source_b"))
    pairs = (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("n_hashes").alias("n_a")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("n_hashes").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.floor(
                (F.lit(1000000) * F.col("n_shared"))
                / F.least(F.col("n_a"), F.col("n_b"))
            )
            .cast("bigint")
            .alias("overlap_ppm"),
        )
    )


# --- sketch-accuracy audit ----------------------------------------------------
@register(
    "minhash_estimate_audit",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
est AS (
  SELECT c.doc_a, c.doc_b,
         ((10000 * ({" + ".join(
             f"CASE WHEN sa.mh{h} = sb.mh{h} THEN 1 ELSE 0 END"
             for h in range(N_HASHES))})) // {N_HASHES})::BIGINT AS est_bp
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
)
SELECT e.doc_a, e.doc_b, e.est_bp,
       floor(10000.0 * coalesce(s.inter, 0)
             / (za.n + zb.n - coalesce(s.inter, 0)))::BIGINT AS exact_bp,
       (e.est_bp
        - floor(10000.0 * coalesce(s.inter, 0)
                / (za.n + zb.n - coalesce(s.inter, 0))))::BIGINT AS err_bp
FROM est e
LEFT JOIN shared s ON s.doc_a = e.doc_a AND s.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
""",
    tags=("dedup", "lsh", "audit"),
)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: per LSH candidate pair, the MinHash
    Jaccard estimate (matching components / {N_HASHES}, exact integer
    bp) NEXT TO the exact set-Jaccard and the signed error — the
    calibration report that justifies (or retunes) N_HASHES/band
    shape before trusting the sketch at 100 TB, where exact verify of
    EVERY pair is unaffordable and only a sampled audit like this one
    runs. Every ingredient is the registered deterministic machinery
    (md5 universal-hash signatures, MAX_BUCKET-capped candidates,
    pair-keyed exact verify), so the audit itself holds a full oracle.

    candidates with NO shared shingle (possible: banding matches on
    signature collisions) audit as exact_bp=0 via the left join —
    exactly the false-positive rows the report exists to count."""
    # r13 (guide §1.2 step 1): pin the signature relation ONCE and
    # derive both the candidate pairs and the estimate columns from
    # it — the old spelling ran the corpus shingle+minhash aggregate
    # twice (once inside dedup_minhash, once for `est`). sigs is
    # n_docs × 9 narrow columns — cheap to pin at any corpus size.
    sigs = pin_shuffle_top(minhash_signatures(fan_out(_docs(spark, sf_dir), "doc_id")))
    cands = pin_shuffle_top(minhash_band_candidates(sigs).select("doc_a", "doc_b"))
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"a{h}") for h in range(N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"b{h}") for h in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(N_HASHES)
    )
    est = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor((10000 * matches) / N_HASHES)
            .cast("bigint")
            .alias("est_bp"),
        )
    )
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        cands.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    exact_bp = F.floor(
        10000.0
        * F.coalesce(F.col("inter"), F.lit(0))
        / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0)))
    ).cast("bigint")
    return (
        est.join(shared, ["doc_a", "doc_b"], "left")
        # za/zb are doc-count-sized (unbounded at 100 TB): shuffle
        # join on the pair key; AQE broadcasts when genuinely small.
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_bp",
            exact_bp.alias("exact_bp"),
            (F.col("est_bp") - exact_bp).cast("bigint").alias("err_bp"),
        )
    )


# --- vocabulary growth curve (Heap's law, r12) --------------------------------
_VG_DECILE = (
    "(((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1)"
    " * 16 + "
    "(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1))"
    " * 10) // 256"
)


@register(
    "tokenizer_vocab_growth",
    oracle=f"""
WITH dw AS (
  SELECT doc_id, {_VG_DECILE} AS decile,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS word
  FROM documents
),
per AS (
  SELECT decile, count(*)::BIGINT AS n_tokens FROM dw GROUP BY decile
),
docs_per AS (
  SELECT {_VG_DECILE} AS decile, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY decile
),
firsts AS (
  SELECT min(decile) AS decile FROM dw GROUP BY word
),
news AS (
  SELECT decile, count(*)::BIGINT AS new_words FROM firsts GROUP BY decile
),
spine AS (SELECT unnest(range(10))::BIGINT AS decile)
SELECT s.decile,
       coalesce(d.n_docs, 0)::BIGINT AS n_docs,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(n.new_words, 0)::BIGINT AS new_words,
       sum(coalesce(d.n_docs, 0)) OVER w::BIGINT AS n_docs_cum,
       sum(coalesce(p.n_tokens, 0)) OVER w::BIGINT AS n_tokens_cum,
       sum(coalesce(n.new_words, 0)) OVER w::BIGINT AS vocab_cum
FROM spine s
LEFT JOIN docs_per d USING (decile)
LEFT JOIN per p USING (decile)
LEFT JOIN news n USING (decile)
WINDOW w AS (ORDER BY s.decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY s.decile
""",
    tags=("text", "curation", "tokenizer", "audit"),
)
def tokenizer_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heap's law): the corpus ordered into
    ten deterministic md5(doc_id) deciles, and per decile the token
    mass plus the count of words seen for the FIRST time — the
    cumulative (n_tokens_cum, vocab_cum) pairs are the V = K * N^beta
    curve whose flattening (or failure to flatten) tells a corpus
    owner whether more crawl still buys vocabulary diversity, and
    sizes the token id table before a tokenizer freeze.

    Scale shape: one explode + two uniform groupBys (decile has 10
    values but each group is a partial-aggregated count; the word
    first-decile groupBy keys on the word — uniform); the running
    sums window over a LITERAL 10-row spine. Empty corpora yield ten
    zero rows."""
    docs = _docs(spark, sf_dir)
    decile = (
        (
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string").cast("binary")),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("bigint")
            * 10
        )
        / 256
    ).cast("bigint")
    dw = docs.select(
        decile.alias("decile"), F.explode(_wg_words()).alias("word")
    )
    per = dw.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    docs_per = docs.select(decile.alias("decile")).groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    news = (
        dw.groupBy("word")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_words"))
    )
    from pyspark.sql import Window

    spine = spark.range(0, 10).select(
        F.col("id").cast("bigint").alias("decile")
    )
    w = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(docs_per, "decile", "left")
        .join(per, "decile", "left")
        .join(news, "decile", "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            F.coalesce("new_words", F.lit(0))
            .cast("bigint")
            .alias("new_words"),
        )
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            "new_words",
            F.sum("n_docs").over(w).cast("bigint").alias("n_docs_cum"),
            F.sum("n_tokens").over(w).cast("bigint").alias("n_tokens_cum"),
            F.sum("new_words").over(w).cast("bigint").alias("vocab_cum"),
        )
        .orderBy("decile")
    )


def _wg_words():
    return F.filter(F.split(F.lower("text"), " "), lambda x: x != "")


# --- Bloom pre-screen audit (r12) --------------------------------------------
BLOOM_M = 16384  # filter bits
BLOOM_K = 4  # hash functions
_BLOOM_NIB = "strpos('0123456789abcdef', substr(h, 1, 1)) - 1"


def _bloom_bit_sql(i: int) -> str:
    # first 4 md5 hex chars as a 16-bit int, folded into [0, BLOOM_M)
    return (
        f"(((strpos('0123456789abcdef', substr(md5(h || ':{i}'), 1, 1)) - 1)"
        f" * 4096 + "
        f"(strpos('0123456789abcdef', substr(md5(h || ':{i}'), 2, 1)) - 1)"
        f" * 256 + "
        f"(strpos('0123456789abcdef', substr(md5(h || ':{i}'), 3, 1)) - 1)"
        f" * 16 + "
        f"(strpos('0123456789abcdef', substr(md5(h || ':{i}'), 4, 1)) - 1))"
        f" % {BLOOM_M})"
    )


@register(
    "bloom_dedup_audit",
    oracle=f"""
WITH contents AS (SELECT DISTINCT md5(text) AS h FROM documents),
ha AS (SELECT h FROM contents WHERE {_BLOOM_NIB} < 8),
hb AS (SELECT h FROM contents WHERE {_BLOOM_NIB} >= 8),
abits AS (
  SELECT DISTINCT bit FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_bit_sql(i)} AS bit FROM ha" for i in range(BLOOM_K))})
),
bprobe AS (
  {" UNION ALL ".join(f"SELECT h, {_bloom_bit_sql(i)} AS bit FROM hb" for i in range(BLOOM_K))}
),
fp AS (
  SELECT p.h FROM bprobe p JOIN abits a ON p.bit = a.bit
  GROUP BY p.h HAVING count(*) = {BLOOM_K}
),
stats AS (
  SELECT (SELECT count(*) FROM ha)::BIGINT AS n_inserted,
         (SELECT count(*) FROM hb)::BIGINT AS n_probed,
         (SELECT count(*) FROM abits)::BIGINT AS bits_set,
         (SELECT count(*) FROM fp)::BIGINT AS fp_count
)
SELECT n_inserted, n_probed, bits_set, fp_count,
       ((10000 * fp_count) // nullif(n_probed, 0))::BIGINT AS fpr_bp,
       floor(10000.0 * ((bits_set / {BLOOM_M}.0) * (bits_set / {BLOOM_M}.0)
              * (bits_set / {BLOOM_M}.0) * (bits_set / {BLOOM_M}.0)))
         ::BIGINT AS expected_bp
FROM stats
""",
    tags=("dedup", "bloom", "audit"),
)
def bloom_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-screen false-positive audit — the measurement behind
    using an m-bit/k-hash Bloom filter as the cheap first pass of
    exact dedup at 100 TB (probe the filter before paying the
    content-hash shuffle; a false positive only costs a redundant
    exact check, never a lost document). Deterministic construction:
    distinct content hashes split into md5-parity halves, half A's
    {K} bit positions (md5(h:i) nibbles mod {M}) set the filter, half
    B (disjoint by construction) probes it; a probe whose {K} bits
    are all set is a measured false positive. ``expected_bp`` is the
    load-factor prediction (bits_set/m)^k computed in EXACT integer
    arithmetic (bits_set^4 < 2^63), so both engines agree
    bit-for-bit — the measured-vs-predicted pair is the m/k sizing
    decision.

    Scale shape: bits relations are content-count-sized with a
    {M}-row distinct filter side (broadcastable); the probe is one
    uniform equi-join on bit ids; everything aggregates to one
    row.""".format(K=BLOOM_K, M=BLOOM_M)
    docs = _docs(spark, sf_dir)
    contents = docs.select(
        F.md5(F.col("text").cast("binary")).alias("h")
    ).distinct()
    nib = F.conv(F.substring("h", 1, 1), 16, 10).cast("int")
    ha = contents.where(nib < 8)
    hb = contents.where(nib >= 8)

    def bits_of(rel: DataFrame) -> DataFrame:
        return rel.select(
            "h",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.col("h"), F.lit(f":{i}")
                                        ).cast("binary")
                                    ),
                                    1,
                                    4,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % BLOOM_M
                        )
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("bit"),
        )

    abits = bits_of(ha).select("bit").distinct()
    fp = (
        bits_of(hb)
        .join(F.broadcast(abits), "bit")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("k_hit"))
        .where(F.col("k_hit") == BLOOM_K)
    )
    stats = (
        ha.agg(F.count(F.lit(1)).cast("bigint").alias("n_inserted"))
        .crossJoin(
            hb.agg(F.count(F.lit(1)).cast("bigint").alias("n_probed"))
        )
        .crossJoin(
            abits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
        )
        .crossJoin(
            fp.agg(F.count(F.lit(1)).cast("bigint").alias("fp_count"))
        )
    )
    # expected = floor(10000 * (bits_set/m)^4). 10000*b^4 overflows
    # int64 once b > ~5500 (found by the sf0.1 sweep under ANSI mode),
    # so compute in doubles: b/2^14 is EXACT in binary FP and each
    # multiply is correctly rounded, so both engines agree given the
    # identical op order spelled out here.
    return stats.select(
        "n_inserted",
        "n_probed",
        "bits_set",
        "fp_count",
        F.expr("cast((10000 * fp_count) div nullif(n_probed, 0) as bigint)")
        .alias("fpr_bp"),
        F.expr(
            f"cast(floor(10000.0 * ((bits_set / {BLOOM_M}.0)"
            f" * (bits_set / {BLOOM_M}.0) * (bits_set / {BLOOM_M}.0)"
            f" * (bits_set / {BLOOM_M}.0))) as bigint)"
        ).alias("expected_bp"),
    )


# --- b-bit minhash accuracy audit (r12) --------------------------------------
BBIT = 4  # bits kept per signature component (Li & König 2010)
_BBIT_MASK = (1 << BBIT) - 1


@register(
    "minhash_bbit_audit",
    oracle=f"""
WITH shingled AS ({{SHINGLES}}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{{CAND}},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
est AS (
  SELECT c.doc_a, c.doc_b,
         ((10000 * ({{FULL_MATCHES}})) // {N_HASHES})::BIGINT
           AS est_full_bp,
         (CASE WHEN {1 << BBIT} * ({{BBIT_MATCHES}}) <= {N_HASHES} THEN 0
               ELSE (10000 * ({1 << BBIT} * ({{BBIT_MATCHES}})
                              - {N_HASHES}))
                    // {N_HASHES * ((1 << BBIT) - 1)}
          END)::BIGINT AS est_b4_bp
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
)
SELECT e.doc_a, e.doc_b,
       floor(10000.0 * coalesce(s.inter, 0)
             / (za.n + zb.n - coalesce(s.inter, 0)))::BIGINT AS exact_bp,
       e.est_full_bp, e.est_b4_bp,
       (e.est_full_bp
        - floor(10000.0 * coalesce(s.inter, 0)
                / (za.n + zb.n - coalesce(s.inter, 0))))::BIGINT
         AS err_full_bp,
       (e.est_b4_bp
        - floor(10000.0 * coalesce(s.inter, 0)
                / (za.n + zb.n - coalesce(s.inter, 0))))::BIGINT
         AS err_b4_bp
FROM est e
LEFT JOIN shared s ON s.doc_a = e.doc_a AND s.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
""".format(
        SHINGLES=_SHINGLES_SQL,
        CAND=_CAND_SQL,
        FULL_MATCHES=" + ".join(
            f"CASE WHEN sa.mh{h} = sb.mh{h} THEN 1 ELSE 0 END"
            for h in range(N_HASHES)
        ),
        BBIT_MATCHES=" + ".join(
            f"CASE WHEN (sa.mh{h} % {1 << BBIT}) = (sb.mh{h} % {1 << BBIT})"
            " THEN 1 ELSE 0 END"
            for h in range(N_HASHES)
        ),
    ),
    tags=("dedup", "lsh", "audit"),
)
def minhash_bbit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit MinHash accuracy audit (Li & Konig 2010): per LSH
    candidate pair, the Jaccard estimate from FULL {N}-component
    signatures next to the estimate from only the LOW {B} BITS of
    each component — the 16x-smaller sketch a 100 TB signature store
    actually ships — with both signed errors against the exact
    set-Jaccard. The b-bit collision rate c relates to Jaccard J by
    E[c] = J + (1 - J)/2^b, so the unbiased estimate is
    (c - 2^-b) / (1 - 2^-b), computed here in exact integer bp
    (floored, clamped at 0) so both engines agree bit-for-bit.

    Same scale shape as minhash_estimate_audit: candidates are the
    MAX_BUCKET-capped banded pairs, exact verify is pair-keyed, the
    sketch comparisons are pure integer expressions per pair.""".format(
        N=N_HASHES, B=BBIT
    )
    # r13: one pinned signature pass feeds candidates AND both sketch
    # estimates (see minhash_estimate_audit — same restructure).
    sigs = pin_shuffle_top(minhash_signatures(fan_out(_docs(spark, sf_dir), "doc_id")))
    cands = pin_shuffle_top(minhash_band_candidates(sigs).select("doc_a", "doc_b"))
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"a{h}") for h in range(N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"b{h}") for h in range(N_HASHES)],
    )
    full_matches = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(N_HASHES)
    )
    bbit_matches = sum(
        F.when(
            F.col(f"a{h}") % (1 << BBIT) == F.col(f"b{h}") % (1 << BBIT), 1
        ).otherwise(0)
        for h in range(N_HASHES)
    )
    est = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor((10000 * full_matches) / N_HASHES)
            .cast("bigint")
            .alias("est_full_bp"),
            # unbiased b-bit estimate, exact integer bp:
            # floor(10000 * (c - 2^-b) / (1 - 2^-b)), c = mb/N
            #   = floor(10000 * (mb*2^b - N) / (N*(2^b - 1)));
            # clamped to 0 BEFORE dividing so floor vs trunc can
            # never disagree across engines on a negative numerator
            F.when(bbit_matches * (1 << BBIT) <= F.lit(N_HASHES), 0)
            .otherwise(
                F.floor(
                    (10000 * (bbit_matches * (1 << BBIT) - N_HASHES))
                    / (N_HASHES * ((1 << BBIT) - 1))
                )
            )
            .cast("bigint")
            .alias("est_b4_bp"),
        )
    )
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        cands.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    exact_bp = F.floor(
        10000.0
        * F.coalesce(F.col("inter"), F.lit(0))
        / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0)))
    ).cast("bigint")
    return (
        est.join(shared, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            exact_bp.alias("exact_bp"),
            "est_full_bp",
            "est_b4_bp",
            (F.col("est_full_bp") - exact_bp)
            .cast("bigint")
            .alias("err_full_bp"),
            (F.col("est_b4_bp") - exact_bp)
            .cast("bigint")
            .alias("err_b4_bp"),
        )
    )


# --- containment (asymmetric Jaccard) on LSH candidates (r8) -----------------
CONTAIN_T_BP = 7000  # flag pairs where the smaller doc is mostly contained


@register(
    "minhash_containment",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       ((10000 * inter) // least(sa.n, sb.n))::BIGINT AS containment_bp,
       floor(10000.0 * inter / (sa.n + sb.n - inter))::BIGINT AS jaccard_bp,
       (((10000 * inter) // least(sa.n, sb.n)) >= {CONTAIN_T_BP}
        AND 10000.0 * inter / (sa.n + sb.n - inter) < 1000.0) AS subset_dup
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE (10000 * inter) // least(sa.n, sb.n) >= {CONTAIN_T_BP}
""",
    tags=("dedup", "containment"),
)
def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder CONTAINMENT on LSH candidate pairs — |A∩B| / min(|A|,|B|):
    catches subset duplication (one doc embedded inside a larger one),
    which symmetric Jaccard misses by construction (a 100-shingle doc
    inside a 10,000-shingle doc has Jaccard ≤ 1% but containment 100%).
    subset_dup marks exactly those pairs: high containment, Jaccard
    below the dedup_ngram_jaccard keep threshold.

    Scale shape: identical candidate generation to dedup_ngram_jaccard
    (banded MinHash LSH, MAX_BUCKET-capped buckets — never all-pairs);
    the exact intersection join is keyed by candidate pair. Integer
    containment (10000·inter div min-size); the Jaccard column reuses
    the float path already proven hash-exact."""
    jac = _candidate_jaccard(spark, sf_dir)
    contain_bp = F.expr("CAST((10000 * inter) div least(na, nb) AS BIGINT)")
    return (
        jac.where(contain_bp >= CONTAIN_T_BP)
        .select(
            "doc_a",
            "doc_b",
            contain_bp.alias("containment_bp"),
            F.floor(_jac_bp()).cast("bigint").alias("jaccard_bp"),
            (
                (contain_bp >= CONTAIN_T_BP) & (_jac_bp() < 1000.0)
            ).alias("subset_dup"),
        )
    )


# --- winnowing fingerprint dedup (r9) ----------------------------------------
# MOSS-style winnowing (Schleimer, Wilkerson, Aiken, SIGMOD'03): hash
# every k-gram (k=4 words), slide a w=4 window over consecutive gram
# hashes, select each window's MINIMUM — the selected-fingerprint set
# is guaranteed to share a fingerprint with any other doc that shares
# a (k+w-1)-word run, making it a span-sensitive near-dup detector
# (between dedup_minhash's whole-doc Jaccard and dedup_substring's
# exact spans). Selection is a pure window-min over integers, so both
# engines derive the identical set.
WINNOW_K = 4  # words per gram
WINNOW_W = 4  # grams per winnowing window
WINNOW_MIN_SHARED = 2

_WINNOW_CTES = f"""w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        >= {WINNOW_K}
), g AS (
  SELECT doc_id, unnest(range(1, greatest(len(words) - {WINNOW_K - 2}, 1)))
           AS pos,
         words
  FROM w
), gh AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5({" || ' ' || ".join(
             f"words[pos + {k}]" for k in range(WINNOW_K))}), 1, 8))::BIGINT
           AS h
  FROM g
), winmin AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS fp,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS wn
  FROM gh
), fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE wn = {WINNOW_W}
), nfp AS (SELECT doc_id, count(*)::BIGINT AS n FROM fps GROUP BY 1),
fps_k AS (
  SELECT doc_id, fp FROM (
    SELECT *, count(*) OVER (PARTITION BY fp) AS bsz FROM fps)
  WHERE bsz <= {PAIR_EMIT_BUCKET}
)"""


def winnow_fingerprints(docs):
    """(doc_id, fp) DISTINCT winnowing-selected fingerprints for any
    (doc_id, text) DataFrame — the shared selector of the batch
    ``dedup_winnowing`` lane and the streaming
    winnowdedup_against_corpus face: 4-word-gram md5 hashes, min over
    each 4-gram window (codegen posexplode + lead + window min; two
    doc-keyed window passes on one Exchange)."""
    from pyspark.sql import Window as W

    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words")).where(
        F.size("words") >= WINNOW_K
    )
    toks = d.select("doc_id", F.posexplode("words").alias("p0", "w0"))
    win = W.partitionBy("doc_id").orderBy("p0")
    lead_cols = [F.col("w0")] + [
        F.lead("w0", k).over(win) for k in range(1, WINNOW_K)
    ]
    last = F.lead("w0", WINNOW_K - 1).over(win)
    grams = (
        toks.select(
            "doc_id",
            F.col("p0").alias("pos"),
            F.concat_ws(" ", *lead_cols).alias("gram"),
            last.alias("wlast"),
        )
        .where(F.col("wlast").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5(F.col("gram").cast("binary")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    w4 = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    return (
        grams.select(
            "doc_id",
            F.min("h").over(w4).alias("fp"),
            F.count(F.lit(1)).over(w4).alias("wn"),
        )
        .where(F.col("wn") == WINNOW_W)
        .select("doc_id", "fp")
        .distinct()
    )


@register(
    "dedup_winnowing",
    oracle=f"""
WITH {_WINNOW_CTES},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared_fp
  FROM fps_k a JOIN fps_k b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {WINNOW_MIN_SHARED})
SELECT doc_a, doc_b, n_shared_fp,
       ((10000 * n_shared_fp) // least(na.n, nb.n))::BIGINT AS overlap_bp
FROM pairs
JOIN nfp na ON na.doc_id = doc_a
JOIN nfp nb ON nb.doc_id = doc_b
""",
    tags=("dedup", "winnowing", "fingerprint"),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (the MOSS fingerprinting algorithm):
    4-word-gram hashes → per-window minima (w=4) → distinct selected
    fingerprints per doc → inverted-index pairs sharing >= 2
    fingerprints, scored by shared-fingerprint count and containment
    (bp of the smaller doc's fingerprint set). Span-sensitive where
    minhash is whole-doc: two docs sharing one long paragraph light up
    here even when their global Jaccard is tiny.

    Scale shape: gram hashing is codegen (posexplode + lead, the
    shingle_stream discipline); winnowing is a doc-keyed window min
    (one shuffle, reused for the distinct); the inverted index joins
    on the uniform fingerprint key with the PAIR_EMIT_BUCKET emission
    cap (a fingerprint held by B docs emits B²/2 pairs — past the cap
    it is a mass-dup group, dedup_exact territory). Never all-pairs.

    Reference parity: stateful dedup-window computations
    (machida/lib/wallaroo state_computation; ref dedup examples) as a
    published-fingerprint batch lane.

    The selected-fingerprint relation is PINNED: it is small (distinct
    minima) but expensive to derive (posexplode + two window passes),
    and three consumers read it (sizes, bucket cap, pair join) — the
    A/B measured 1.85 s lazy vs 1.28 s pinned at sf0.1 (contrast
    embedding_kcenter, where pinning the CHEAP-to-derive comps lost)."""
    from wally_spark.operators.checkpoint import pin_shuffle_top

    fps = pin_shuffle_top(winnow_fingerprints(fan_out(_docs(spark, sf_dir), "doc_id")))
    nfp = fps.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from pyspark.sql import Window as W
    bucketed = fps.withColumn(
        "bsz", F.count(F.lit(1)).over(W.partitionBy("fp"))
    ).where(F.col("bsz") <= PAIR_EMIT_BUCKET)
    a = bucketed.select(F.col("doc_id").alias("doc_a"), "fp")
    b = bucketed.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
        .where(F.col("n_shared_fp") >= WINNOW_MIN_SHARED)
    )
    na = nfp.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = nfp.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "n_shared_fp",
            "CAST((10000 * n_shared_fp) div least(na, nb) AS BIGINT)"
            " AS overlap_bp",
        )
    )


# --- LSH band-configuration tuning curve (r9) ---------------------------------
# For each (bands b, rows-per-band r) split of the 8 minhashes, the
# measured candidate mass the config WOULD generate (sum over buckets
# of C(n,2) — a count, never an emission) next to the theoretical
# s-curve collision probability at Jaccard 0.8: 1-(1-0.8^r)^b,
# precomputed in Python and embedded as the same literal in both
# engines. This is the capacity-planning readout for choosing
# BAND_ROWS before a 100 TB dedup run.
_LSH_CONFIGS = ((8, 1, 1000), (4, 2, 983), (2, 4, 651), (1, 8, 168))


def _lsh_cfg_band_sql(b: int, r: int, p_milli: int) -> str:
    selects = []
    for j in range(b):
        key = " || ':' || ".join(
            f"mh{j * r + k}::VARCHAR" for k in range(r)
        )
        selects.append(
            f"SELECT doc_id, 'b{b}r{r}' AS cfg, {p_milli} AS p_milli,"
            f" {j} AS band_id, {key} AS band_key FROM sigs"
        )
    return " UNION ALL ".join(selects)


@register(
    "lsh_tuning_curve",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
sigs AS (
  SELECT doc_id, {_MH_SIG_SQL} FROM exploded GROUP BY doc_id
),
allbands AS (
  {" UNION ALL ".join(_lsh_cfg_band_sql(b, r, p) for b, r, p in _LSH_CONFIGS)}
),
buckets AS (
  SELECT cfg, p_milli, band_id, band_key, count(*)::BIGINT AS n
  FROM allbands GROUP BY 1, 2, 3, 4)
SELECT cfg,
       max(p_milli)::BIGINT AS p_at_s80_milli,
       count(*)::BIGINT AS n_buckets,
       sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_multi_buckets,
       sum(n * (n - 1) // 2)::BIGINT AS candidate_pairs,
       max(n)::BIGINT AS max_bucket
FROM buckets GROUP BY cfg ORDER BY cfg
""",
    tags=("dedup", "lsh", "tuning"),
)
def lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-configuration tuner — before a 100 TB near-dedup run,
    the question is which (bands, rows-per-band) split of the minhash
    signature to use. For every split of the 8 hashes (8×1, 4×2, 2×4,
    1×8) this measures, on the actual corpus: bucket count,
    multi-occupancy buckets, the candidate-pair MASS the config would
    emit (Σ C(n,2) — computed as a count over bucket sizes, never by
    materializing pairs), and the largest bucket, next to the
    theoretical s-curve collision probability at Jaccard 0.8
    (1-(1-0.8^r)^b, a Python-precomputed literal identical in both
    engines). Read: b8r1 recalls everything but floods candidates;
    b1r8 is precise but misses; the measured mass quantifies the
    trade on THIS corpus.

    Scale shape: ONE signature pass (the shared minhash chain), each
    doc fans out to exactly Σb = 15 (cfg, band, key) rows, one
    uniform-key count, and a 4-row rollup. The expensive thing a naive
    tuner does — emitting candidate pairs per config — never happens."""
    sigs = minhash_signatures(fan_out(_docs(spark, sf_dir), "doc_id"))
    entries = []
    for b, r, p in _LSH_CONFIGS:
        for j in range(b):
            key = F.concat_ws(
                ":", *[F.col(f"mh{j * r + k}").cast("string") for k in range(r)]
            )
            entries.append(
                F.struct(
                    F.lit(f"b{b}r{r}").alias("cfg"),
                    F.lit(p).alias("p_milli"),
                    F.lit(j).alias("band_id"),
                    key.alias("band_key"),
                )
            )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "e.cfg", "e.p_milli", "e.band_id", "e.band_key")
    buckets = bands.groupBy("cfg", "p_milli", "band_id", "band_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        buckets.groupBy("cfg")
        .agg(
            F.max("p_milli").cast("bigint").alias("p_at_s80_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_multi_buckets"),
            F.sum(F.expr("n * (n - 1) div 2"))
            .cast("bigint")
            .alias("candidate_pairs"),
            F.max("n").cast("bigint").alias("max_bucket"),
        )
        .orderBy("cfg")
    )


# --- duplicate-cluster size histogram (r9) ------------------------------------
@register(
    "dedup_cluster_size_hist",
    oracle=f"""
WITH RECURSIVE shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
lab AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id),
cs AS (SELECT cluster, count(*)::BIGINT AS sz FROM lab GROUP BY 1),
t AS (SELECT sum(sz)::BIGINT AS total FROM cs)
SELECT sz AS cluster_size,
       count(*)::BIGINT AS n_clusters,
       (sz * count(*))::BIGINT AS n_docs,
       ((10000 * sz * count(*)) // max(total))::BIGINT AS docs_share_bp
FROM cs, t GROUP BY sz ORDER BY sz
""",
    tags=("dedup", "clusters", "report"),
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the curation KPI behind
    dedup_clusters: how much of the corpus sits in singletons vs
    2-clusters vs mass-dup groups (size, cluster count, doc mass,
    corpus share bp). The shape every dedup paper reports (C4,
    RefinedWeb, Gopher dedup sections) and the number that decides
    whether near-dedup is worth a 100 TB pass at all.

    Scale shape: rides the dedup_clusters component labels (min-label
    propagation, O(diameter) rounds), then two bounded aggregates —
    cluster → size (uniform key), size → histogram (|distinct sizes|
    rows). The scalar total is a 1-row broadcast."""
    comp = dedup_clusters(spark, sf_dir)
    cs = comp.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    t = cs.agg(F.sum("sz").cast("bigint").alias("total"))
    return (
        cs.groupBy("sz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "sz AS cluster_size",
            "n_clusters",
            "CAST(sz * n_clusters AS BIGINT) AS n_docs",
            "CAST((10000 * sz * n_clusters) div total AS BIGINT)"
            " AS docs_share_bp",
        )
        .orderBy("cluster_size")
    )


# --- measured LSH recall vs exact-Jaccard ground truth (r9) -------------------
LSH_TRUTH_BP = 3000  # "true near-dup" = exact Jaccard >= 0.30


@register(
    "lsh_recall_measured",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN exploded a ON a.doc_id = c.doc_a
  JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
t AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes za ON za.doc_id = doc_a
  JOIN sizes zb ON zb.doc_id = doc_b
  WHERE 10000.0 * inter / (za.n + zb.n - inter) >= {LSH_TRUTH_BP}.0)

SELECT 'b8r1' AS cfg,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN ((sa.mh0 = sb.mh0) OR (sa.mh1 = sb.mh1) OR (sa.mh2 = sb.mh2) OR (sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4) OR (sa.mh5 = sb.mh5) OR (sa.mh6 = sb.mh6) OR (sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END)::BIGINT AS caught,
       ((10000 * sum(CASE WHEN ((sa.mh0 = sb.mh0) OR (sa.mh1 = sb.mh1) OR (sa.mh2 = sb.mh2) OR (sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4) OR (sa.mh5 = sb.mh5) OR (sa.mh6 = sb.mh6) OR (sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END))
        // nullif(count(*), 0))::BIGINT AS recall_bp
FROM t JOIN sigs sa ON sa.doc_id = t.doc_a
       JOIN sigs sb ON sb.doc_id = t.doc_b
UNION ALL
SELECT 'b4r2' AS cfg,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1) OR (sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5) OR (sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END)::BIGINT AS caught,
       ((10000 * sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1) OR (sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5) OR (sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END))
        // nullif(count(*), 0))::BIGINT AS recall_bp
FROM t JOIN sigs sa ON sa.doc_id = t.doc_a
       JOIN sigs sb ON sb.doc_id = t.doc_b
UNION ALL
SELECT 'b2r4' AS cfg,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1 AND sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5 AND sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END)::BIGINT AS caught,
       ((10000 * sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1 AND sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3) OR (sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5 AND sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END))
        // nullif(count(*), 0))::BIGINT AS recall_bp
FROM t JOIN sigs sa ON sa.doc_id = t.doc_a
       JOIN sigs sb ON sb.doc_id = t.doc_b
UNION ALL
SELECT 'b1r8' AS cfg,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1 AND sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3 AND sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5 AND sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END)::BIGINT AS caught,
       ((10000 * sum(CASE WHEN ((sa.mh0 = sb.mh0 AND sa.mh1 = sb.mh1 AND sa.mh2 = sb.mh2 AND sa.mh3 = sb.mh3 AND sa.mh4 = sb.mh4 AND sa.mh5 = sb.mh5 AND sa.mh6 = sb.mh6 AND sa.mh7 = sb.mh7)) THEN 1 ELSE 0 END))
        // nullif(count(*), 0))::BIGINT AS recall_bp
FROM t JOIN sigs sa ON sa.doc_id = t.doc_a
       JOIN sigs sb ON sb.doc_id = t.doc_b
ORDER BY cfg
""",
    tags=("dedup", "lsh", "tuning"),
)
def lsh_recall_measured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall per band configuration — the empirical
    complement of lsh_tuning_curve's theoretical s-curve: ground truth
    is the exact-Jaccard >= 0.30 pairs (verified on the production
    config's candidate set, the dedup_ngram_jaccard composition), and
    each (b, r) split of the 8 minhashes is CAUGHT on a pair iff some
    band's hashes all agree — a pure expression over the pair's two
    signatures, no per-config re-bucketing, no extra pair joins. Reads
    as: b8r1 catches all (any single-hash agreement is implied by the
    candidate definition), b1r8 only the near-identical tail.

    Caveat documented: truth is relative to the default config's
    candidates (a recall-of-candidates measure); the theoretical curve
    covers what no candidate generator saw.

    Scale shape: the truth set is candidate-bounded; two uniform
    doc-keyed signature joins attach (mh0..mh7) per side; ONE
    aggregate computes all four configs' conditional sums; a 4-row
    stack unpivots. Int64-safe throughout."""
    # r13: ONE pinned signature pass feeds the candidate generator and
    # both per-side signature joins — the old spelling ran the corpus
    # shingle+minhash aggregate three times (cands chain, sa, sb).
    sigs = pin_shuffle_top(minhash_signatures(fan_out(_docs(spark, sf_dir), "doc_id")))
    jac = _candidate_jaccard(
        spark,
        sf_dir,
        cands=minhash_band_candidates(sigs).select("doc_a", "doc_b"),
    )
    t = jac.where(_jac_bp() >= float(LSH_TRUTH_BP)).select("doc_a", "doc_b")
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"amh{h}") for h in range(N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"bmh{h}") for h in range(N_HASHES)],
    )
    j = t.join(sa, "doc_a").join(sb, "doc_b")

    def caught(b, r):
        bands = []
        for jj in range(b):
            conj = " AND ".join(
                f"amh{jj * r + k} = bmh{jj * r + k}" for k in range(r)
            )
            bands.append(f"({conj})")
        return "(" + " OR ".join(bands) + ")"

    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_true")]
    for b, r in ((8, 1), (4, 2), (2, 4), (1, 8)):
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {caught(b, r)} THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias(f"c_b{b}r{r}")
        )
    one = j.agg(*aggs)
    stacked = one.selectExpr(
        "stack(4, "
        + ", ".join(
            f"'b{b}r{r}', c_b{b}r{r}" for b, r in ((8, 1), (4, 2), (2, 4), (1, 8))
        )
        + ") AS (cfg, caught)",
        "n_true",
    )
    return stacked.selectExpr(
        "cfg",
        "n_true",
        "caught",
        "CAST((10000 * caught) div nullif(n_true, 0) AS BIGINT) AS recall_bp",
    ).orderBy("cfg")
