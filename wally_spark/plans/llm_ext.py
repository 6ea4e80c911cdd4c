"""LLM training-data lanes, round 10 — mixture diagnostics, feature
selection, curriculum ordering, featurizer audit, edit-distance dedup
verification, and span-corruption manifests.

The reference engine has no text surface (machida computations are
generic — machida/lib/wallaroo/__init__.py:270 `computation_multi`);
these extend SURVEY §2.6 with the steps a pretraining-data pipeline
runs between curation and the training reader:

  token_source_mi       — token↔source mutual information (the
                          feature-selection table behind NB / DSIR
                          style quality classifiers)
  source_token_kl       — per-source unigram KL vs the corpus mix
                          (distribution-shift report for mixture
                          reweighting)
  curriculum_schedule   — quality-ordered curriculum phases cut by
                          CUMULATIVE TOKEN MASS (not doc count), via
                          the distributed two-phase prefix sum
  feature_hash_audit    — hashing-trick featurizer collision audit
                          (vocab → 2^b buckets, per-bucket collision
                          and mass profile)
  dedup_edit_verified   — SimHash-banded candidates VERIFIED by exact
                          Levenshtein on normalized prefixes (the
                          edit-distance dedup modality; minhash/
                          simhash/winnowing lanes stop at hamming or
                          Jaccard)
  span_corruption_manifest — deterministic T5-style span-masking
                          manifest (per-doc mask counts a denoising
                          reader consumes)

Float protocol: every log-family statistic is computed from INTEGER
counts with an identical double expression tree on both engines, then
QUANTIZED PER TERM (floor to micro/millibits) BEFORE any summation —
integer sums are order-independent, so the hash is exact under any
partitioning (the per-term variant of the exact-log protocol in
user_event_entropy / text_word_entropy). Everything else is bigint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.operators.checkpoint import pin, pin_shuffle_top
from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

MI_TOP_K = 15  # discriminative tokens reported per source
MI_MIN_JOINT = 5  # joint-count floor: kills one-off noise rows
CURRICULUM_PHASES = 4
FEATURE_BUCKETS = 1024  # 2^10 hashing-trick feature space
EDIT_CAND_HAMMING = 12  # candidate net (looser than dedup_simhash_pairs)
EDIT_PREFIX_CHARS = 200  # Levenshtein cost guard: O(200²) per pair, fixed
EDIT_KEEP_BP = 2500  # keep pairs with ≤ 25% prefix edit distance
# max edit any kept pair can have: 25% of the longest possible prefix —
# the sound band for the threshold Levenshtein (returns -1 past it)
_EDIT_MAX = EDIT_PREFIX_CHARS * EDIT_KEEP_BP // 10000
SPAN_BLOCK = 3  # T5 mean-span analogue: fixed 3-token blocks
SPAN_MASK_PCT = 15  # per-block mask probability (deterministic hash)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


# --- shared token joint-count core --------------------------------------------
# (source, token, c) whitespace-token joint counts; marginals derive
# from it so every consumer sees the SAME integer base relation.
_JOINT_SQL = """
  SELECT source, tok AS token, count(*)::BIGINT AS c
  FROM (SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                          w -> w <> '')) AS tok
        FROM documents)
  GROUP BY source, tok
"""


def token_joint(docs: DataFrame) -> DataFrame:
    """(source, token, c): the unigram joint-count table. One exploded
    scan, one map-side-combining aggregate keyed (source, token) —
    shuffle moves counts, not tokens. fan_out spreads the pre-explode
    scan at local scale only (no-op at 100 TB)."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    return (
        fan_out(docs.select("doc_id", "source", "text"), "doc_id")
        .select("source", F.explode(words).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


# identical double expression on both engines: ratio first, then log2.
# c is cast to double BEFORE multiplying so the bigint product can
# never overflow at corpus scale (N ~ 1e13 tokens × c would pass 2^63).
def _lift_log2(c, num_n, den_a, den_b):
    return F.log2(
        (c.cast("double") * num_n) / (den_a.cast("double") * den_b)
    )


@register(
    "token_source_mi",
    oracle=f"""
WITH joint AS ({_JOINT_SQL}),
ct AS (SELECT token, sum(c)::BIGINT AS ct FROM joint GROUP BY token),
cs AS (SELECT source, sum(c)::BIGINT AS cs FROM joint GROUP BY source),
n AS (SELECT sum(c)::BIGINT AS n FROM joint),
contrib AS (
  SELECT j.source, j.token, j.c,
         floor(1000000.0 * (j.c::DOUBLE / n.n)
               * log2((j.c::DOUBLE * n.n) / (ct.ct::DOUBLE * cs.cs))
               )::BIGINT AS mi_ub
  FROM joint j JOIN ct USING (token) JOIN cs USING (source), n
  WHERE j.c >= {MI_MIN_JOINT}
),
r AS (
  SELECT source, token, c, mi_ub,
         row_number() OVER (PARTITION BY source
                            ORDER BY mi_ub DESC, token) AS rk
  FROM contrib
)
SELECT source, rk::BIGINT AS rk, token, c, mi_ub
FROM r WHERE rk <= {MI_TOP_K}
""",
    tags=("text", "llm", "feature-selection"),
)
def token_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} most source-discriminative tokens per source by
    pointwise mutual-information CONTRIBUTION (c/N · log2 lift) — the
    feature-selection table a quality/NB classifier (doc_nb_classifier,
    dsir_importance) is built from: tokens whose presence most
    identifies a source.

    Contributions are floored to micro-bits per (source, token) row —
    a pure per-row function of four integer counts, so ranking and
    hash are engine-exact (ties break on token). Shape: the joint
    aggregate, a token-keyed marginal join (shuffle on token — the
    uniform key; no skew exposure), a broadcast of the |sources|-row
    and 1-row marginals, then a per-source top-K window over rows
    already filtered to c ≥ {M} — the window input is vocab-bounded,
    never corpus-bounded.""".format(K=MI_TOP_K, M=MI_MIN_JOINT)
    # marginals must come from the UNfiltered joint for the terms to
    # be true MI contributions (c ≥ MIN only shrinks the REPORT);
    # pin: 4 consumers (ct, cs, n, report rows) of one exploded scan.
    full = pin(token_joint(_docs(spark, sf_dir)))
    ct = full.groupBy("token").agg(F.sum("c").cast("bigint").alias("ct"))
    cs = full.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs"))
    n = full.agg(F.sum("c").cast("bigint").alias("n"))
    joint = full.where(F.col("c") >= MI_MIN_JOINT)
    contrib = (
        joint.join(ct, "token")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "token",
            "c",
            F.floor(
                1000000.0
                * (F.col("c").cast("double") / F.col("n"))
                * _lift_log2(F.col("c"), F.col("n"), F.col("ct"), F.col("cs"))
            )
            .cast("bigint")
            .alias("mi_ub"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("mi_ub").desc(), F.col("token")
    )
    return (
        contrib.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= MI_TOP_K)
        .select("source", "rk", "token", "c", "mi_ub")
    )


@register(
    "source_token_kl",
    oracle=f"""
WITH joint AS ({_JOINT_SQL}),
ct AS (SELECT token, sum(c)::BIGINT AS ct FROM joint GROUP BY token),
cs AS (SELECT source, sum(c)::BIGINT AS cs FROM joint GROUP BY source),
n AS (SELECT sum(c)::BIGINT AS n FROM joint),
terms AS (
  SELECT j.source, j.token,
         floor(1000000.0 * (j.c::DOUBLE / cs.cs)
               * log2((j.c::DOUBLE * n.n) / (cs.cs::DOUBLE * ct.ct))
               )::BIGINT AS term_ub
  FROM joint j JOIN ct USING (token) JOIN cs USING (source), n
),
tops AS (
  SELECT source, token AS top_token, term_ub AS top_ub,
         row_number() OVER (PARTITION BY source
                            ORDER BY term_ub DESC, token) AS rk
  FROM terms
)
SELECT s.source, cs.cs AS n_tokens, s.vocab, s.kl_ub, t.top_token, t.top_ub
FROM (SELECT source, count(*)::BIGINT AS vocab,
             sum(term_ub)::BIGINT AS kl_ub
      FROM terms GROUP BY source) s
JOIN cs USING (source)
JOIN tops t ON t.source = s.source AND t.rk = 1
""",
    tags=("text", "llm", "mixture"),
)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram distribution shift: KL(source ‖ corpus) in
    quantized micro-bits, plus the single most over-represented token
    — the mixture-reweighting diagnostic (DoReMi / DSIR family) that
    says WHICH slice of the mix drifted and WHAT drives it.

    KL = Σ_t (c/N_s)·log2((c·N)/(N_s·c_t)). Each term is floored to
    micro-bits BEFORE the per-source sum, so the sum is an integer
    reduction — order-independent, hash-exact — rather than a float
    accumulation whose value depends on partitioning (quantization
    error ≤ 1e-6 bits per vocab term, documented). Same joint-count
    core and token-keyed marginal join as token_source_mi; the
    per-source rollup is |sources|-bounded."""
    return kl_report_from_joint(pin(token_joint(_docs(spark, sf_dir))))


def kl_terms_from_joint(joint: DataFrame) -> DataFrame:
    """(source, token, term_ub): micro-bit-quantized KL terms from any
    (source, token, c) joint-count relation — shared verbatim by the
    batch lane and the incremental streaming face so their float
    expression trees are literally identical."""
    ct = joint.groupBy("token").agg(F.sum("c").cast("bigint").alias("ct"))
    cs = joint.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs"))
    n = joint.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        joint.join(ct, "token")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "token",
            F.floor(
                1000000.0
                * (F.col("c").cast("double") / F.col("cs"))
                * _lift_log2(F.col("c"), F.col("n"), F.col("cs"), F.col("ct"))
            )
            .cast("bigint")
            .alias("term_ub"),
        )
    )


def kl_report_from_joint(joint: DataFrame) -> DataFrame:
    """The full source_token_kl report from a (source, token, c)
    relation. Callers pass a pinned/materialized joint when it is
    expensive to derive (the batch lane's exploded scan) — the plan
    reads it for marginals, terms, rollup, and argmax."""
    cs = joint.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs"))
    terms = pin(kl_terms_from_joint(joint))  # 2 consumers: rollup+argmax
    roll = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("term_ub").cast("bigint").alias("kl_ub"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("term_ub").desc(), F.col("token")
    )
    top = (
        terms.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "source",
            F.col("token").alias("top_token"),
            F.col("term_ub").alias("top_ub"),
        )
    )
    return (
        roll.join(F.broadcast(cs), "source")
        .join(F.broadcast(top), "source")
        .select(
            "source",
            F.col("cs").alias("n_tokens"),
            "vocab",
            "kl_ub",
            "top_token",
            "top_ub",
        )
    )


@register(
    "curriculum_schedule",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         len(words)::BIGINT AS n_tok,
         (10000 * len(list_distinct(words)) // len(words))::BIGINT
           AS score_bp
  FROM (SELECT doc_id, source,
               list_filter(string_split(lower(text), ' '), w -> w <> '')
                 AS words
        FROM documents)
  WHERE len(words) >= 1
),
c AS (
  SELECT *,
         coalesce(sum(n_tok) OVER (ORDER BY score_bp DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum_excl,
         sum(n_tok) OVER () AS total
  FROM d
)
SELECT doc_id, source, n_tok, score_bp,
       (1 + ({CURRICULUM_PHASES} * cum_excl) // total)::BIGINT AS phase
FROM c
""",
    tags=("llm", "sampling", "curriculum"),
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: order the corpus by a quality score
    (lexical diversity in basis points — distinct/total tokens, the
    cheap integer-exact proxy; swap in any integer score) and cut it
    into {P} phases of EQUAL TOKEN MASS, so phase 1 is the
    highest-quality quarter of the TOKENS, not of the docs — the form
    a curriculum dataloader actually consumes.

    The cumulative token sum over a global order is the classic
    single-task window trap; this runs the two-phase distributed
    prefix sum instead (operators/prefix.bucket_offsets): score_bp has
    a bounded integer domain (0..10000), so bucket = 10000 − score_bp
    IS the global order, per-bucket token totals prefix-sum on the
    driver (10001 longs), and a per-bucket window (orderBy doc_id)
    finishes exactly — fully partition-parallel, no global sort.
    Phase = 1 + (P·cum_excl) div total: pure bigint, engine-exact.""".format(
        P=CURRICULUM_PHASES
    )
    from wally_spark.operators.prefix import bucket_offsets

    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = (
        docs.select("doc_id", "source", words.alias("words"))
        .where(F.size("words") >= 1)
        .select(
            "doc_id",
            "source",
            F.size("words").cast("bigint").alias("n_tok"),
            F.expr(
                "cast(10000 * size(array_distinct(words)) div size(words)"
                " as bigint)"
            ).alias("score_bp"),
        )
        .withColumn(
            "bucket", (10000 - F.col("score_bp")).cast("int")
        )
    )
    d = pin(d)  # 2 actions: bucket census + output (determinism pin)
    offs = bucket_offsets(spark, d, "bucket", "n_tok", 10001)
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        d.withColumn("cum_in", F.sum("n_tok").over(w))
        .join(F.broadcast(offs), "bucket")
        .select(
            "doc_id",
            "source",
            "n_tok",
            "score_bp",
            (
                1
                + F.expr(
                    f"({CURRICULUM_PHASES} * (bucket_off + cum_in - n_tok))"
                    " div total"
                )
            )
            .cast("bigint")
            .alias("phase"),
        )
    )
    return out


# DuckDB-side parse of the first 8 hex chars of an md5 as a uint32 —
# the same nibble arithmetic as dedup_simhash's oracle.
def _hex8_sql(expr: str) -> str:
    return (
        "list_sum(list_transform(range(1, 9), k ->"
        f" (strpos('0123456789abcdef', substr({expr}, k, 1)) - 1)::BIGINT"
        " * (1::BIGINT << (4 * (8 - k)))))"
    )


@register(
    "feature_hash_audit",
    oracle=f"""
WITH joint AS ({_JOINT_SQL}),
vocab AS (SELECT token, sum(c)::BIGINT AS ct FROM joint GROUP BY token),
h AS (
  SELECT token, ct,
         ({_hex8_sql("md5(token)")} % {FEATURE_BUCKETS})::BIGINT
           AS feature_id
  FROM vocab
),
r AS (
  SELECT feature_id, token, ct,
         row_number() OVER (PARTITION BY feature_id
                            ORDER BY ct DESC, token) AS rk
  FROM h
)
SELECT feature_id,
       count(*)::BIGINT AS n_tokens,
       sum(ct)::BIGINT AS total_count,
       max(CASE WHEN rk = 1 THEN token END) AS top_token,
       max(CASE WHEN rk = 1 THEN ct END)::BIGINT AS top_count,
       (10000 * max(CASE WHEN rk = 1 THEN ct END) // sum(ct))::BIGINT
         AS top_share_bp
FROM r GROUP BY feature_id
""",
    tags=("text", "llm", "featurizer"),
)
def feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer audit: project the corpus vocabulary
    into {B} hash buckets (feature id = md5(token) mod {B} — the
    standard trick behind linear quality classifiers at vocabulary
    scale) and report each bucket's collision profile: distinct tokens
    sharing it, total mass, and the dominant token with its share.
    High-mass buckets whose top share is low are the collisions that
    blur the classifier — the audit says whether 2^b is big enough
    BEFORE training.

    Shape: the joint aggregate folds to a vocab table (token-keyed,
    map-side combined), one md5 per DISTINCT token (never per
    occurrence), then a {B}-bounded aggregate with an argmax window
    over vocab-bounded rows. Output is exactly ≤ {B} rows regardless
    of corpus size.""".format(B=FEATURE_BUCKETS)
    vocab = (
        token_joint(_docs(spark, sf_dir))
        .groupBy("token")
        .agg(F.sum("c").cast("bigint").alias("ct"))
    )
    h = vocab.select(
        "token",
        "ct",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("token").cast("binary")), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(FEATURE_BUCKETS),
        ).alias("feature_id"),
    )
    w = Window.partitionBy("feature_id").orderBy(
        F.col("ct").desc(), F.col("token")
    )
    r = h.withColumn("rk", F.row_number().over(w))
    return r.groupBy("feature_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("ct").cast("bigint").alias("total_count"),
        F.max(F.when(F.col("rk") == 1, F.col("token"))).alias("top_token"),
        F.max(F.when(F.col("rk") == 1, F.col("ct")))
        .cast("bigint")
        .alias("top_count"),
        F.expr(
            "cast(10000 * max(CASE WHEN rk = 1 THEN ct END)"
            " div sum(ct) as bigint)"
        ).alias("top_share_bp"),
    )


@register(
    "span_corruption_manifest",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           ::BIGINT AS n_tok
  FROM documents
),
b AS (
  SELECT doc_id, n_tok,
         list_filter(range(0, ((n_tok + {SPAN_BLOCK} - 1)
                               // {SPAN_BLOCK})::BIGINT),
           blk -> ({_hex8_sql("md5(doc_id::VARCHAR || ':' || blk::VARCHAR)")}
                   % 100) < {SPAN_MASK_PCT}) AS masked
  FROM d WHERE n_tok >= 1
)
SELECT doc_id, n_tok,
       len(masked)::BIGINT AS n_spans,
       coalesce(list_sum(list_transform(masked,
         blk -> least({SPAN_BLOCK}::BIGINT, n_tok - blk * {SPAN_BLOCK}))),
         0)::BIGINT AS n_masked,
       (10000 * coalesce(list_sum(list_transform(masked,
          blk -> least({SPAN_BLOCK}::BIGINT, n_tok - blk * {SPAN_BLOCK}))),
          0) // n_tok)::BIGINT AS mask_bp
FROM b
""",
    tags=("llm", "training", "masking"),
)
def span_corruption_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption manifest: tokens group
    into fixed {L}-token blocks and each block masks independently
    with probability {P}% — decided by md5(doc_id, block), so every
    engine, every rerun, and every shard of a distributed read
    reconstructs the SAME mask without storing it. Per doc: token
    count, masked-span count (= sentinel count the denoising reader
    emits), masked-token count, and the mask rate in basis points.
    (Real T5 samples span lengths ~Geometric(1/3); the fixed-block
    form keeps the mask a pure per-position function — the property
    that makes it free to recompute anywhere — and is documented as
    the deliberate difference.)

    Shape: one scan; the block list is a per-row higher-order
    transform over ceil(n/{L}) elements (bounded md5s per doc — never
    an explode, so no shuffle grows with mask density), then pure
    integer arithmetic. Fully partition-parallel at any scale.""".format(
        L=SPAN_BLOCK, P=SPAN_MASK_PCT
    )
    docs = _docs(spark, sf_dir)
    n_tok = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    ).cast("bigint")
    d = docs.select("doc_id", n_tok.alias("n_tok")).where(
        F.col("n_tok") >= 1
    )
    blk_hash = lambda blk: F.pmod(  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        blk.cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    masked = F.filter(
        F.sequence(
            F.lit(0).cast("bigint"),
            F.expr(f"cast((n_tok + {SPAN_BLOCK - 1}) div {SPAN_BLOCK} as bigint) - 1"),
        ),
        lambda blk: blk_hash(blk) < SPAN_MASK_PCT,
    )
    b = d.select("doc_id", "n_tok", masked.alias("masked"))
    span_tokens = F.aggregate(
        "masked",
        F.lit(0).cast("bigint"),
        lambda acc, blk: acc
        + F.least(
            F.lit(SPAN_BLOCK).cast("bigint"),
            F.col("n_tok") - blk * SPAN_BLOCK,
        ),
    )
    counted = b.select(
        "doc_id",
        "n_tok",
        F.size("masked").cast("bigint").alias("n_spans"),
        span_tokens.alias("n_masked"),
    )
    return counted.withColumn(
        "mask_bp",
        F.expr("cast((10000 * n_masked) div n_tok as bigint)"),
    )


@register(
    "dedup_edit_verified",
    oracle=f"""
WITH {{SIMHASH_CTES}},
{{BAND_PAIRS}},
v AS (
  SELECT c.doc_a, c.doc_b, c.hamming,
         levenshtein(substr(lower(da.text), 1, {EDIT_PREFIX_CHARS}),
                     substr(lower(db.text), 1, {EDIT_PREFIX_CHARS}))
           ::BIGINT AS edit,
         greatest(length(substr(lower(da.text), 1, {EDIT_PREFIX_CHARS})),
                  length(substr(lower(db.text), 1, {EDIT_PREFIX_CHARS})),
                  1)
           ::BIGINT AS max_len
  FROM cand c
  JOIN documents da ON da.doc_id = c.doc_a
  JOIN documents db ON db.doc_id = c.doc_b
  WHERE c.hamming <= {EDIT_CAND_HAMMING}
)
SELECT doc_a, doc_b, hamming, edit,
       ((10000 * edit) // max_len)::BIGINT AS edit_bp
FROM v WHERE (10000 * edit) // max_len <= {EDIT_KEEP_BP}
""",
    tags=("dedup", "llm", "edit-distance"),
)
def dedup_edit_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-verified near-dup pairs — the dedup modality the
    minhash/simhash/winnowing lanes stop short of: SimHash banding
    proposes candidates (hamming ≤ {H}, looser than
    dedup_simhash_pairs' {T} so near-dups the random-hump boundary
    would clip still reach the verifier), then EXACT Levenshtein over
    normalized {C}-char prefixes confirms them (keep ≤ {B} bp of the
    longer prefix). Banding bounds the candidate count; the prefix cap
    bounds each verification at O({C}²) — the two dials that keep an
    O(n²) metric runnable at 100 TB.

    Shape: the pinned fingerprint relation band-explodes into the
    8x8-bit scheme (simhash_candidate_pairs — pigeonhole-exact to
    hamming 7, MEASURED 9075 bp candidate recall at T={H} by the
    simhash_recall_audit lane vs 113 bp for the r10 single 16-bit
    prefix; MAX_BUCKET-capped like every pair generator in
    plans/dedup.py), candidates then join `documents` TWICE on doc_id
    to fetch prefixes — uniform keys, and only candidate rows pay the
    text transfer. Levenshtein runs JVM-side (codegen'd), never in
    Python.""".format(
        H=EDIT_CAND_HAMMING,
        T=6,
        C=EDIT_PREFIX_CHARS,
        B=EDIT_KEEP_BP,
    )
    from wally_spark.operators.editforest import (
        edit_distance as _edit_distance,
    )
    from wally_spark.plans.dedup import (
        dedup_simhash,
        simhash_candidate_pairs,
    )

    d = pin_shuffle_top(dedup_simhash(spark, sf_dir))
    cand = simhash_candidate_pairs(d, EDIT_CAND_HAMMING)
    # Spread the verify stage across the full cluster width: the
    # candidate relation is BYTES-small (3 longs/row) so AQE coalesces
    # the distinct's output to a handful of partitions, and the
    # broadcast prefix joins + Levenshtein inherit that width — at
    # sf0.1 the 538k-candidate verify ran on 5 of 32 cores (12.5 s).
    # An explicit round-robin exchange (AQE never coalesces a
    # user-specified width) costs one tiny shuffle and puts the
    # CPU-bound DP on every core: 12.5 -> 5.5 s measured. The conf
    # value is the cluster's own sizing knob, so this holds at 100 TB.
    try:
        _width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        _width = spark.sparkContext.defaultParallelism
    cand = cand.repartition(_width)
    prefix = F.substring(F.lower("text"), 1, EDIT_PREFIX_CHARS)
    docs = _docs(spark, sf_dir).select(
        "doc_id", prefix.alias("prefix")
    )
    joined = (
        cand.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
            ),
            "doc_b",
        )
        # length-difference pre-filter (r11 advice): |la-lb| lower-
        # bounds edit, and integer div is monotone in the numerator,
        # so every pair dropped here fails the edit_bp keep gate too —
        # the Levenshtein call is skipped outright. Prunes ~7% at
        # sf0.1; stronger cheap bounds don't exist for this corpus
        # (char-bag L1/2 also prunes 7% and costs more than it saves —
        # measured, see BASELINE.md round-12).
        .where(
            F.expr(
                "(10000 * abs(length(pa) - length(pb)))"
                " div greatest(length(pa), length(pb), 1)"
                f" <= {EDIT_KEEP_BP}"
            )
        )
        .select("doc_a", "doc_b", "hamming", "pa", "pb")
    )
    # The verify kernel. r14 (guide §4.2): the banded JVM levenshtein
    # was ~86 s of the ~110 s sf1 lane (~102 µs per pair-core —
    # UTF8String walks UTF-8 bytes per char access inside the DP, and
    # 99%+ of candidates run the whole band only to prove edit > k).
    # The default routes whole Arrow batches through a compiled C
    # kernel (operators/editkernel: same banded DP + early abandon on
    # pre-decoded UTF-32 code points, ~11 µs/pair single-core,
    # result-identical — unit-gated against F.levenshtein on random
    # unicode). Only the five needed columns cross the boundary.
    # Knob: spark.wally.edit.kernel=jvm keeps the JVM expression
    # (also the automatic fallback when no C compiler exists on the
    # driver host).
    kernel = str(
        spark.conf.get("spark.wally.edit.kernel", "native")
    ).lower()
    if kernel == "native":
        from wally_spark.operators.editkernel import load_kernel

        if load_kernel() is None:
            kernel = "jvm"
    if kernel == "native":
        _k = int(_EDIT_MAX)

        def _verify_batches(it):
            import numpy as np
            import pyarrow as _pa
            import pyarrow.compute as _pc

            from wally_spark.operators.editkernel import lev_batch_np

            for batch in it:
                pa_c = batch.column(3)
                pb_c = batch.column(4)
                edit = lev_batch_np(pa_c, pb_c, _k)
                max_len = np.maximum(
                    np.maximum(
                        _pc.utf8_length(pa_c)
                        .cast(_pa.int64())
                        .to_numpy(zero_copy_only=False),
                        _pc.utf8_length(pb_c)
                        .cast(_pa.int64())
                        .to_numpy(zero_copy_only=False),
                    ),
                    1,
                )
                yield _pa.RecordBatch.from_arrays(
                    [
                        batch.column(0),
                        batch.column(1),
                        batch.column(2),
                        _pa.array(edit, type=_pa.int64()),
                        _pa.array(max_len, type=_pa.int64()),
                    ],
                    names=["doc_a", "doc_b", "hamming", "edit", "max_len"],
                )

        v = joined.mapInArrow(
            _verify_batches,
            "doc_a long, doc_b long, hamming long, edit long, max_len long",
        )
    else:
        v = joined.select(
            "doc_a",
            "doc_b",
            "hamming",
            # banded Levenshtein: any KEPT pair has edit <= 25% of a
            # <= 200-char prefix, i.e. <= _EDIT_MAX, so the threshold
            # variant (O(k*n) diagonal band, not O(n^2) full DP) is
            # result-identical on kept rows; rows past the band return
            # -1 and the edit >= 0 guard drops them — they could never
            # satisfy edit_bp <= EDIT_KEEP_BP anyway. 8x8 banding
            # multiplied true candidates ~20x (by design — measured
            # 9075 bp recall); this keeps the verify linear in the
            # band, 46.9 -> ~7 s at sf0.1. r14: equality short-circuit
            # (operators/editforest.edit_distance) skips the DP for
            # identical prefixes — the dominant true-pair case on
            # duplicate-heavy corpora.
            _edit_distance("pa", "pb", _EDIT_MAX).cast("bigint").alias("edit"),
            # floor at 1: two empty prefixes (zero-token docs DO get
            # all-zero simhashes and pair in bucket 0) have edit 0 /
            # max_len 0 — without the floor the oracle's integer div
            # raises while Spark's div yields NULL (r10 advice). An
            # empty-vs-empty pair scores 0 bp, i.e. a dup, as it is.
            F.greatest(F.length("pa"), F.length("pb"), F.lit(1))
            .cast("bigint")
            .alias("max_len"),
        )
    return (
        v.where(
            (F.col("edit") >= 0)
            & (F.expr("(10000 * edit) div max_len") <= EDIT_KEEP_BP)
        )
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            "edit",
            F.expr("cast((10000 * edit) div max_len as bigint)").alias(
                "edit_bp"
            ),
        )
    )


# late-bind the shared simhash CTE chain into the oracle (avoids a
# circular import at module load; dedup.py registers first)
def _finalize_edit_oracle() -> None:
    from wally_spark.plans.dedup import (
        _SIMHASH_BAND_PAIRS_SQL,
        _SIMHASH_CTES,
    )
    from wally_spark.plans.registry import REGISTRY, QueryDef

    qd = REGISTRY["dedup_edit_verified"]
    REGISTRY["dedup_edit_verified"] = QueryDef(
        qd.name,
        qd.spark_fn,
        qd.oracle.format(
            SIMHASH_CTES=_SIMHASH_CTES, BAND_PAIRS=_SIMHASH_BAND_PAIRS_SQL
        ),
        qd.tags,
    )


_finalize_edit_oracle()


DECON_COS_BP = 4000  # flag threshold (basis points of cosine)
DECON_HOLD_MOD = 10  # vec_id % 10 == 7 -> designated holdout vector
DECON_HOLD_REM = 7   # (mirrors decontaminate_holdout's doc split)


@register(
    "decontaminate_embedding",
    oracle=f"""
WITH hold AS (
  SELECT vec_id AS h_vec,
         list_transform(embedding,
           x -> floor(1000000.0 * x::DOUBLE)::BIGINT) AS he
  FROM embeddings
  WHERE vec_id % {DECON_HOLD_MOD} = {DECON_HOLD_REM}),
train AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> floor(1000000.0 * x::DOUBLE)::BIGINT) AS e
  FROM embeddings
  WHERE vec_id % {DECON_HOLD_MOD} <> {DECON_HOLD_REM}),
dots AS (
  SELECT t.vec_id, h.h_vec,
         list_sum(list_transform(range(1, len(t.e) + 1),
           i -> t.e[i] * h.he[i]))::BIGINT AS dot,
         list_sum(list_transform(t.e, x -> x * x))::BIGINT AS ssa,
         list_sum(list_transform(h.he, x -> x * x))::BIGINT AS ssb
  FROM train t CROSS JOIN hold h),
scored0 AS (
  SELECT vec_id, h_vec,
         CASE WHEN ssa = 0 OR ssb = 0 THEN 0
              ELSE floor(10000.0 * (dot / (sqrt(ssa) * sqrt(ssb))))::BIGINT
         END AS cos_bp
  FROM dots),
scored AS (
  SELECT vec_id, h_vec, cos_bp,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY cos_bp DESC, h_vec) AS rk
  FROM scored0)
SELECT vec_id, h_vec AS best_h_vec, cos_bp AS best_cos_bp,
       cos_bp >= {DECON_COS_BP} AS contaminated
FROM scored WHERE rk = 1
""",
    tags=("llm", "embedding", "decontamination"),
)
def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic twin
    of decontaminate_holdout (5-gram exact) and decontaminate_minhash
    (near-verbatim): every TRAIN vector reports its best cosine
    against the designated HOLDOUT set and a contaminated flag at
    {T} bp — the screen that catches paraphrased eval leakage the
    n-gram lanes cannot see (SemDeDup/Phi-style decontamination).

    Scale shape: holdout sets are eval-suite-sized (bounded), so the
    holdout side BROADCASTS and the train side never shuffles — one
    linear scan regardless of corpus size, the same join geometry as
    ann_bruteforce — here as a literal sc.broadcast of the holdout
    MATRIX with ONE numpy float64 product per Arrow batch (the
    _pair_cos_udf lesson: interpreted HOF folds cost ~4× — the first
    spelling of this lane read 4.29 s at sf0.1, this one 1.06 s), and
    the candidate pairs NEVER materialize as rows: the argmax runs
    inside the batch. The driver collect is the holdout set — bounded
    by construction, the centroids/codebooks class.

    Engine-exactness protocol (r10 advice): components quantize to
    integer MICROS first (floor(1e6·x), exact in both engines), the
    dot and sums-of-squares are then int64 arithmetic — associative,
    so numpy's blocked matmul and DuckDB's sequential fold CANNOT
    diverge — and the only float ops left are a fixed 4-op IEEE
    sequence (sqrt, mul, div, floor over integers < 2^53), each
    correctly rounded identically everywhere. Zero-norm vectors
    (possible post-quantization) score cos_bp = 0 on both sides; an
    EMPTY holdout short-circuits to an empty result (the oracle's
    cross join is empty too).""".format(T=DECON_COS_BP)
    import numpy as np
    import pandas as pd

    from wally_spark.operators.matrix import collect_id_matrix

    emb = load_tables(spark, sf_dir)["embeddings"]
    is_hold = F.col("vec_id") % DECON_HOLD_MOD == DECON_HOLD_REM
    # bounded by construction: the holdout is an eval suite, not a
    # corpus slice, in production (here the synthetic %10 split)
    h_ids, h_mat = collect_id_matrix(
        emb.where(is_hold), "vec_id", "embedding"
    )
    schema = (
        "vec_id bigint, best_h_vec bigint, best_cos_bp bigint,"
        " contaminated boolean"
    )
    if not h_ids:  # empty holdout: nothing to screen against
        return spark.createDataFrame([], schema)
    h_q = np.floor(1e6 * h_mat).astype(np.int64)
    h_ss = (h_q * h_q).sum(axis=1)  # int64 sums of squares
    bc = spark.sparkContext.broadcast((h_ids, h_q, h_ss))

    train = fan_out(
        emb.where(~is_hold).select("vec_id", "embedding"), "vec_id"
    )

    def score(batches):
        ids, hq, hss = bc.value
        ids_arr = np.array(ids, dtype=np.int64)
        hn = np.sqrt(hss.astype(np.float64))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.floor(
                1e6 * np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ).astype(np.int64)
            dot = m @ hq.T  # exact int64 matmul
            ssa = (m * m).sum(axis=1)
            denom = np.outer(np.sqrt(ssa.astype(np.float64)), hn)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dot.astype(np.float64) / denom, 0.0)
            bp = np.floor(10000.0 * cos).astype(np.int64)
            best = np.argmax(bp, axis=1)  # first max = smallest h_vec
            best_bp = bp[np.arange(len(m)), best]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "best_h_vec": ids_arr[best],
                    "best_cos_bp": best_bp,
                    "contaminated": best_bp >= DECON_COS_BP,
                }
            )

    return train.mapInPandas(score, schema)


MRL_DIMS = (8, 16, 32, 64)  # prefix dims audited (last = full)
MRL_N_QUERIES = 8           # probe set (ann_bruteforce's convention)


def _mrl_cos_bp_sql(k: int) -> str:
    """Floored-bp cosine over the first k QUANTIZED (integer-micro)
    components — decontaminate_embedding's engine-exact spelling on
    slices: int64 dot / sums-of-squares (associative), then the fixed
    sqrt·mul·div·floor IEEE tail; zero-norm prefixes score 0."""
    dot = (
        f"list_sum(list_transform(range(1, {k} + 1),"
        " i -> c.e[i] * q.e[i]))::BIGINT"
    )
    ssc = (
        f"list_sum(list_transform(range(1, {k} + 1),"
        " i -> c.e[i] * c.e[i]))::BIGINT"
    )
    ssq = (
        f"list_sum(list_transform(range(1, {k} + 1),"
        " i -> q.e[i] * q.e[i]))::BIGINT"
    )
    return (
        f"CASE WHEN {ssc} = 0 OR {ssq} = 0 THEN 0 "
        f"ELSE floor(10000.0 * ({dot} / (sqrt({ssc}) * sqrt({ssq}))))"
        "::BIGINT END"
    )


@register(
    "embedding_matryoshka_recall",
    oracle="""WITH qe AS (
  SELECT vec_id, list_transform(embedding,
           x -> floor(1000000.0 * x::DOUBLE)::BIGINT) AS e
  FROM embeddings),
"""
    + ",\n".join(
        f"""d{k} AS (
  SELECT query_id, {k} AS dim, neighbor_id, cos_bp FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_mrl_cos_bp_sql(k)} AS cos_bp,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_mrl_cos_bp_sql(k)} DESC, c.vec_id)
             AS rk
    FROM qe q JOIN qe c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {MRL_N_QUERIES})
  WHERE rk = 1)"""
        for k in MRL_DIMS
    )
    + f""",
u AS ({' UNION ALL '.join(f'SELECT * FROM d{k}' for k in MRL_DIMS)})
SELECT u.query_id, u.dim::BIGINT AS dim, u.neighbor_id AS top1_id,
       u.cos_bp AS top1_cos_bp,
       (u.neighbor_id = f.neighbor_id) AS agree_full
FROM u JOIN d{MRL_DIMS[-1]} f USING (query_id)
""",
    tags=("llm", "embedding", "matryoshka"),
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: for each probe query and each
    PREFIX dimensionality {D}, the exact top-1 cosine neighbor over
    the corpus and whether it AGREES with the full-dimension answer —
    the measurement behind choosing the cheapest representation size
    (MRL-style truncation; an ANN index over 16 of 64 dims is 4×
    cheaper to store and probe, IF top-1 survives).

    Distributed argmax, pairs never shuffle: queries broadcast
    (sc.broadcast of an {Q}×dim float64 matrix — bounded), each Arrow
    batch computes ALL prefix-dim cosines with one einsum per dim via
    cumulative slicing and emits only its per-(query, dim) BATCH
    WINNER (≤ {Q}×|dims| rows per batch), then one tiny max_by
    aggregate picks the global winner — corpus rows never leave their
    batch. Floored-bp scoring with neighbor-id tiebreak (numpy
    first-max on id-sorted... batch rows, then max_by struct(bp, -id))
    keeps the argmax engine-exact via decontaminate_embedding's
    integer-micro quantization protocol: int64 dot/sums-of-squares
    (associative, so blocked matmul ≡ sequential fold), then a fixed
    correctly-rounded IEEE tail; zero-norm prefixes score 0 on both
    engines, and an empty probe panel short-circuits.""".format(
        D=list(MRL_DIMS), Q=MRL_N_QUERIES
    )
    import numpy as np
    import pandas as pd

    from wally_spark.operators.matrix import collect_id_matrix

    emb = load_tables(spark, sf_dir)["embeddings"]
    # bounded by construction: a fixed probe panel of MRL_N_QUERIES
    q_ids, q_mat = collect_id_matrix(
        emb.where(F.col("vec_id") < MRL_N_QUERIES), "vec_id", "embedding"
    )
    out_schema = (
        "query_id bigint, dim bigint, top1_id bigint,"
        " top1_cos_bp bigint, agree_full boolean"
    )
    if not q_ids:  # empty probe panel: nothing to audit
        return spark.createDataFrame([], out_schema)
    bc = spark.sparkContext.broadcast(
        (q_ids, np.floor(1e6 * q_mat).astype(np.int64))
    )

    corpus = fan_out(emb.select("vec_id", "embedding"), "vec_id")
    schema = "query_id bigint, dim bigint, neighbor_id bigint, cos_bp bigint"

    def batch_winners(batches):
        ids, qm = bc.value
        ids_arr = np.array(ids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            # sort by vec_id so numpy first-max argmax = id tiebreak
            pdf = pdf.sort_values("vec_id")
            m = np.floor(
                1e6 * np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ).astype(np.int64)
            nid = pdf["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for k in MRL_DIMS:
                mk, qk = m[:, :k], qm[:, :k]
                dot = mk @ qk.T  # exact int64 matmul
                denom = np.outer(
                    np.sqrt((mk * mk).sum(axis=1).astype(np.float64)),
                    np.sqrt((qk * qk).sum(axis=1).astype(np.float64)),
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(
                        denom > 0, dot.astype(np.float64) / denom, 0.0
                    )
                bp = np.floor(10000.0 * cos).astype(np.int64)
                bp[np.isin(nid, ids_arr)[:, None]
                   & (nid[:, None] == ids_arr[None, :])] = np.iinfo(
                    np.int64
                ).min  # self-match excluded
                best = np.argmax(bp, axis=0)
                for j, qid in enumerate(ids):
                    out.append((qid, k, int(nid[best[j]]), int(bp[best[j], j])))
            yield pd.DataFrame(
                out, columns=["query_id", "dim", "neighbor_id", "cos_bp"]
            )

    winners = corpus.mapInPandas(batch_winners, schema)
    # pin: top1 feeds BOTH the report and the full-dim reference join —
    # without it the whole corpus einsum pipeline runs twice
    # (A/B-measured 4.32 -> 1.38 s at sf0.1)
    top1 = pin(winners.groupBy("query_id", "dim").agg(
        F.max_by(
            "neighbor_id",
            F.struct(F.col("cos_bp"), (-F.col("neighbor_id")).alias("nn")),
        ).alias("top1_id"),
        F.max("cos_bp").alias("top1_cos_bp"),
    ))
    full = top1.where(F.col("dim") == MRL_DIMS[-1]).select(
        "query_id", F.col("top1_id").alias("full_id")
    )
    return top1.join(F.broadcast(full), "query_id").select(
        "query_id",
        "dim",
        "top1_id",
        "top1_cos_bp",
        (F.col("top1_id") == F.col("full_id")).alias("agree_full"),
    )
