"""Deterministic sampling / splitting over `documents` — the data-
mixing ops a training pipeline runs when composing a corpus:

  sample_stratified — exact per-stratum fractions (not sampleBy's
    Bernoulli approximation): rank docs inside each (lang) stratum by
    a content-independent hash order and keep the top ceil(frac·n).
    Deterministic, so reruns and engines agree bit-for-bit, and the
    sample is stable under corpus append-only growth of OTHER strata.
  split_train_holdout — hash-based train/holdout assignment (the
    leakage-safe alternative to random splits: a document's side is a
    pure function of its id, so re-ingestion can't migrate it).

Scale: both are one window / one projection over the scan — rank is
per-stratum (shuffle keyed on lang, partial nothing), assignment is
stateless. 100 TB-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

FRAC = 0.2  # per-stratum sample fraction
HOLDOUT_PCT = 10  # % of docs in the holdout split


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


@register(
    "sample_stratified",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT doc_id, lang, rn::BIGINT AS rank_in_stratum
FROM ranked WHERE rn <= ceil({FRAC} * n)
""",
    tags=("sampling", "curation"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {FRAC:.0%}-per-language sample in md5(doc_id) hash order —
    deterministic where df.sampleBy is Bernoulli-approximate."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    wn = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.col("rn") <= F.ceil(FRAC * F.col("n")))
        .select("doc_id", "lang", F.col("rn").cast("bigint").alias("rank_in_stratum"))
    )


@register(
    "split_train_holdout",
    oracle=f"""
SELECT CASE WHEN list_sum(list_transform(range(1, 9),
         k -> (strpos('0123456789abcdef',
                      substr(md5(doc_id::VARCHAR), k, 1)) - 1)::BIGINT
              * (1::BIGINT << (4 * (8 - k)))))::BIGINT % 100
            < {HOLDOUT_PCT}
            THEN 'holdout' ELSE 'train' END AS split,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY split
""",
    tags=("sampling", "split"),
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned train/holdout split summary. Native 64-bit string
    hashes differ between engines, so BOTH sides derive the bucket
    from md5's first 8 hex chars as a shared 32-bit integer (Spark:
    conv(substr, 16, 10); DuckDB: nibble arithmetic) — identical
    assignment everywhere, so a document can never migrate splits on
    re-ingestion."""
    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint") % 100
    split = F.when(bucket < HOLDOUT_PCT, "holdout").otherwise("train")
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


CHUNK = 512  # tokens per training context window
N_PREFIX_BUCKETS = 256  # ordered hash-prefix buckets for the prefix sum


@register(
    "pack_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_tokens,
         md5(doc_id::VARCHAR) AS h
  FROM documents
), ordered AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
  FROM toks
)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       (off0 // {CHUNK})::BIGINT AS first_chunk,
       ((off0 + n_tokens - 1) // {CHUNK})::BIGINT AS last_chunk,
       ((off0 + n_tokens - 1) // {CHUNK} - off0 // {CHUNK} + 1)::BIGINT
         AS n_chunks
FROM ordered WHERE n_tokens > 0
""",
    tags=("packing", "curation"),
)
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing assignment: documents are
    concatenated in deterministic md5(doc_id) order and cut into
    CHUNK-token context windows; each doc learns its global token
    offset and the chunk range it lands in.

    The global offset is an EXCLUSIVE PREFIX SUM over the whole
    corpus. A naive `Window.orderBy(...)` with no partition collapses
    to ONE task — the classic global-window scale trap. This plan runs
    the distributed two-phase prefix sum instead: (1) docs fall into
    N_PREFIX_BUCKETS ordered hash-prefix buckets (the bucket id is the
    first byte of the same md5 that defines the global order, so
    bucket order ⊆ global order); (2) per-bucket token totals — a few
    hundred longs — come to the driver and prefix-sum there; (3) each
    bucket's offset is joined back (broadcast) and a per-bucket window
    finishes the cumsum in parallel. At 100 TB every stage is
    partition-parallel; driver state is N_PREFIX_BUCKETS longs."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    toks = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_tokens"),
        h.alias("h"),
    ).withColumn(
        "bucket", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    from wally_spark.operators.prefix import bucket_offsets

    boff = bucket_offsets(spark, toks, "bucket", "n_tokens", N_PREFIX_BUCKETS)
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off0 = F.col("bucket_off") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    # `div` (integral division), not floor(a/b): bigint `/` rounds
    # through doubles, which past ~2^53 total tokens — inside the
    # 100 TB target — can cross an integer boundary and disagree with
    # the oracle's exact `//`
    return (
        toks.join(F.broadcast(boff), "bucket")
        .withColumn("off0", off0)
        .where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"off0 div {CHUNK}").cast("bigint").alias("first_chunk"),
            F.expr(f"(off0 + n_tokens - 1) div {CHUNK}")
            .cast("bigint")
            .alias("last_chunk"),
            F.expr(
                f"(off0 + n_tokens - 1) div {CHUNK} - off0 div {CHUNK} + 1"
            )
            .cast("bigint")
            .alias("n_chunks"),
        )
    )


K_PPS = 50  # sample points


@register(
    "sample_pps",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, n_chars, md5(doc_id::VARCHAR) AS h FROM documents
), ordered AS (
  SELECT doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0,
         sum(n_chars) OVER () AS total
  FROM toks
)
SELECT doc_id, n_chars,
       (least({K_PPS}, ({K_PPS} * (off0 + n_chars) + total - 1) // total)
        - least({K_PPS}, ({K_PPS} * off0 + total - 1) // total))::BIGINT
         AS n_hits
FROM ordered
WHERE least({K_PPS}, ({K_PPS} * (off0 + n_chars) + total - 1) // total)
      > least({K_PPS}, ({K_PPS} * off0 + total - 1) // total)
""",
    tags=("sampling", "pps"),
)
def sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sampling (probability proportional to size):
    K_PPS evenly-spaced points over the total n_chars mass, in the
    same deterministic md5(doc_id) order pack_chunks uses; a doc is
    drawn once per point inside its [off0, off0+n_chars) interval —
    exact integer arithmetic, so both engines select the identical
    sample (no float pow, the cross-engine trap in weighted-key
    designs). The global offsets reuse the distributed two-phase
    prefix sum (operators/prefix.py) — no single-task window.

    n_hits > 1 marks docs heavier than one sampling stride, the
    standard PPS multiplicity."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    base = docs.select("doc_id", "n_chars", h.alias("h")).withColumn(
        "bucket", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )

    from wally_spark.operators.prefix import bucket_offsets

    boff = bucket_offsets(spark, base, "bucket", "n_chars", N_PREFIX_BUCKETS)
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # `total` rides on the broadcast offset rows — NOT a global
    # unpartitioned window, which would plan SinglePartition
    withoff = base.join(F.broadcast(boff), "bucket").withColumn(
        "off0",
        F.col("bucket_off") + F.sum("n_chars").over(w) - F.col("n_chars"),
    )
    # `div`, not floor(/): see pack_chunks — double rounding breaks
    # the "identical sample in both engines" guarantee at huge totals
    def pts_lt(x):
        return F.least(
            F.lit(K_PPS).cast("bigint"),
            F.expr(f"({K_PPS} * ({x}) + total - 1) div total"),
        )

    hits = pts_lt("off0 + n_chars") - pts_lt("off0")
    return (
        withoff.withColumn("n_hits", hits.cast("bigint"))
        .where(F.col("n_hits") > 0)
        .select("doc_id", "n_chars", "n_hits")
    )


TAU = 0.7  # temperature exponent for mix rebalancing
KEEP_TOTAL = 200  # target kept docs across all languages


@register(
    "sample_temperature",
    oracle=f"""
WITH mass AS (
  SELECT lang, sum(n_chars)::BIGINT AS total_chars, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY lang
),
tot AS (
  SELECT sum(pow(total_chars, {TAU})) AS z FROM mass
),
quota AS (
  SELECT lang, total_chars, n_docs,
         floor({KEEP_TOTAL} * pow(total_chars, {TAU}) / z)::BIGINT AS quota
  FROM mass, tot
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents
)
SELECT q.lang, q.total_chars, q.quota,
       count(r.doc_id)::BIGINT AS n_kept
FROM quota q LEFT JOIN ranked r ON r.lang = q.lang AND r.rn <= q.quota
GROUP BY q.lang, q.total_chars, q.quota
""",
    tags=("sampling", "curation", "mix"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing — the multilingual-mix
    resampling step (share^TAU renormalization flattens dominant
    languages; TAU=1 keeps natural proportions, TAU→0 approaches
    uniform). Per-language char mass → temperature weights → integer
    doc quotas → deterministic hash-order selection, reporting the
    per-language (mass, quota, kept) mix table.

    Float discipline: the only float step is pow/division inside ONE
    floor to an integer quota; selection and counts are exact integer
    arithmetic after that. Scale shape: the mix table is n_langs rows
    (broadcast 1-row normalizer, allow-listed); the selection window
    uses the same two-phase hot-cell pre-prune as lang_source_quota —
    phase 1 bounds every (partition, lang) slice to the KEEP_TOTAL
    ceiling, so no task ever sorts a whole language."""
    docs = _docs(spark, sf_dir)
    mass = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    tot = mass.agg(F.sum(F.pow("total_chars", F.lit(TAU))).alias("z"))
    quota = mass.crossJoin(F.broadcast(tot)).select(
        "lang",
        "total_chars",
        F.floor(KEEP_TOTAL * F.pow("total_chars", F.lit(TAU)) / F.col("z"))
        .cast("bigint")
        .alias("quota"),
    )
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w1 = Window.partitionBy("__pid", "lang").orderBy(h, "doc_id")
    pre = (
        docs.select("doc_id", "lang", F.spark_partition_id().alias("__pid"))
        .withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= KEEP_TOTAL)
        .drop("__pid", "__rn1")
    )
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    ranked = pre.withColumn("rn", F.row_number().over(w))
    kept = ranked.join(F.broadcast(quota), "lang").where(
        F.col("rn") <= F.col("quota")
    )
    return (
        quota.join(
            kept.groupBy("lang").agg(F.count(F.lit(1)).alias("k")), "lang", "left"
        )
        .select(
            "lang",
            "total_chars",
            "quota",
            F.coalesce("k", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


# --- deterministic corpus shuffle + shard manifest --------------------------
N_SHARDS = 8


@register(
    "corpus_shard_manifest",
    oracle=f"""
WITH r AS (
  SELECT doc_id,
         md5('shuffle:' || doc_id) AS rank,
         strpos('0123456789abcdef',
                substr(md5('shuffle:' || doc_id), 1, 1)) - 1 AS nib,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_tokens
  FROM documents
)
SELECT (nib % {N_SHARDS})::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens,
       min(rank) AS rank_min,
       max(rank) AS rank_max
FROM r GROUP BY 1
""",
    tags=("sampling", "export"),
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle + balanced shard manifest —
    the EXPORT step a training pipeline ends with: every document gets
    a content-independent pseudorandom rank (md5 of its id), the first
    rank nibble assigns one of N_SHARDS shards, and the manifest
    reports per-shard doc/token totals plus the shard's rank range
    (training readers stream each shard in rank order — a bit-stable
    shuffle that reruns and engines reproduce exactly, unlike
    rand()-seeded orderings that move with partitioning).

    At 100 TB: one stateless projection over the scan + one shard-keyed
    aggregate (map-side combined, {N_SHARDS} groups). The actual
    export is `df.repartitionByRange("shard", "rank")` + a partitioned
    parquet write — the manifest IS the verification artifact for it.
    Uniformity: md5 nibbles are uniform, so shards balance to ±O(√n)
    docs with no skew handling needed."""
    docs = _docs(spark, sf_dir)
    rank = F.md5(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")).cast("binary")
    )
    nib = (
        F.instr(F.lit("0123456789abcdef"), F.substring(rank, 1, 1)) - 1
    )
    n_tokens = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
    r = docs.select(
        (nib % N_SHARDS).cast("bigint").alias("shard"),
        rank.alias("rank"),
        n_tokens.alias("n_tokens"),
    )
    return r.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("rank").alias("rank_min"),
        F.max("rank").alias("rank_max"),
    )


# --- token-budget allocation (r8) --------------------------------------------
MIX_BUDGET = 10_000_000  # total training-token budget to allocate


@register(
    "token_budget_allocation",
    oracle=f"""
WITH t AS (
  SELECT lang, source,
         sum(len(list_filter(string_split(lower(text), ' '), w -> w <> '')))
           ::BIGINT AS tokens
  FROM documents GROUP BY lang, source
),
w AS (
  SELECT lang, source, tokens,
         floor(sqrt(tokens::DOUBLE))::BIGINT AS weight
  FROM t
),
tot AS (SELECT sum(weight)::BIGINT AS total_w FROM w)
SELECT w.lang, w.source, w.tokens, w.weight,
       ({MIX_BUDGET} * w.weight // tot.total_w)::BIGINT AS target_tokens,
       ((1000 * ({MIX_BUDGET} * w.weight // tot.total_w))
         // nullif(w.tokens, 0))::BIGINT AS epochs_milli
FROM w, tot
""",
    tags=("sampling", "curation", "mixing"),
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budget allocator — the step that turns per-slice
    token counts into a concrete sampling plan (the mixing recipe
    behind multilingual/multi-source corpora, e.g. the sqrt/temperature
    reweighting of mC4 and XLM-R): each (lang, source) slice gets a
    share of MIX_BUDGET proportional to sqrt(tokens) — temperature
    tau=0.5 upweights tail slices — reported with its integer target
    and the repeat factor (epochs) in exact millis. epochs > 1000 milli
    flags slices the budget would force to repeat — the dashboard a mix
    designer reads before launching a run.

    Integer-exact everywhere the engines could drift: the ONLY float
    op is sqrt (correctly-rounded IEEE on both engines, floored to a
    bigint weight immediately); shares and epochs are bigint floor
    divisions of exact sums, so the hash matches under any
    partitioning. Scale shape: token counting inline in one documents
    scan (no explode — only counts leave it), a (lang, source)-bounded
    aggregate, one 1-row total broadcast back with a crossJoin (the
    bounded-scalar pattern, never a global window), one projection."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    t = (
        docs.select("lang", "source", F.size(words).cast("bigint").alias("nw"))
        .groupBy("lang", "source")
        .agg(F.sum("nw").alias("tokens"))
    )
    w = t.select(
        "lang",
        "source",
        "tokens",
        F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("bigint").alias(
            "weight"
        ),
    )
    tot = w.agg(F.sum("weight").cast("bigint").alias("total_w"))
    target = F.expr(f"{MIX_BUDGET} * weight div total_w")
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "tokens",
        "weight",
        target.cast("bigint").alias("target_tokens"),
        F.expr(
            f"(1000 * ({MIX_BUDGET} * weight div total_w)) div nullif(tokens, 0)"
        )
        .cast("bigint")
        .alias("epochs_milli"),
    )


# --- deterministic k-fold assignment + balance audit (r8) --------------------
K_FOLDS = 5

_FOLD_DUCK = """list_sum(list_transform(range(1, 9),
         k -> (strpos('0123456789abcdef',
                      substr(md5(doc_id::VARCHAR), k, 1)) - 1)::BIGINT
              * (1::BIGINT << (4 * (8 - k)))))::BIGINT"""


@register(
    "sample_kfold_assign",
    oracle=f"""
WITH f AS (
  SELECT {_FOLD_DUCK} % {K_FOLDS} AS fold, lang, source, n_chars
  FROM documents),
per AS (
  SELECT fold, count(*)::BIGINT AS n_docs,
         count(DISTINCT lang)::BIGINT AS n_langs,
         count(DISTINCT source)::BIGINT AS n_sources,
         sum(n_chars)::BIGINT AS total_chars
  FROM f GROUP BY fold),
t AS (SELECT sum(n_docs)::BIGINT AS total FROM per)
SELECT fold, n_docs, n_langs, n_sources, total_chars,
       (((10000 * n_docs) // total) - 10000 // {K_FOLDS})::BIGINT AS dev_bp
FROM per, t
""",
    tags=("sampling", "split", "cv"),
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment + balance
    audit: fold = md5-derived 32-bit bucket mod K_FOLDS (the
    split_train_holdout hash convention — identical assignment in
    every engine, so a document can never migrate folds between the
    trainer and the evaluator). Per fold: size, language/source
    coverage, char mass, and the signed share-deviation bp vs the exact
    1/K share (positive-operand integer divisions only, so floor and
    truncate agree across engines) (uniform md5 nibbles bound it at ±O(1/√n)).

    Scale shape: fold assignment is pure expression work in the scan;
    ONE K-group map-side-combined aggregate (the two DISTINCTs expand
    to a partial-distinct pass on the same partitioning); the scalar
    total broadcasts onto K rows."""
    docs = _docs(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % K_FOLDS
    )
    per = docs.groupBy(fold.alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    t = per.agg(F.sum("n_docs").alias("total"))
    return per.crossJoin(F.broadcast(t)).selectExpr(
        "fold", "n_docs", "n_langs", "n_sources", "total_chars",
        f"CAST((10000 * n_docs) div total - 10000 div {K_FOLDS}"
        f" AS BIGINT) AS dev_bp",
    )


# --- deterministic reservoir sample per stratum (r9) -------------------------
RESERVOIR_K = 8
_RES_SALTS = 32


@register(
    "sample_reservoir",
    oracle=f"""
SELECT lang, rk, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS rk
  FROM documents)
WHERE rk <= {RESERVOIR_K}
ORDER BY lang, rk
""",
    tags=("sampling", "reservoir"),
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir sample — K docs per language stratum,
    seed-free and replayable: rank by the md5 of the doc id (a fixed
    uniform permutation — Algorithm-R's uniformity without mutable
    state, so batch reruns and audits reproduce the identical sample)
    and keep the first K. The streaming equivalent is trivially this
    same rule applied incrementally (min-K by hash is a semigroup).

    Scale shape: two-phase exact top-K — a first row_number window
    over (lang, 32-way doc-hash salt) keeps K per salt, so a hot
    stratum fans across 32 reducers and the second, per-stratum window
    ranks at most 32·K survivors (bounded input, never the stratum).
    The oracle spells the single-window form — identical rows because
    per-salt top-K is a superset of the stratum top-K."""
    d = _docs(spark, sf_dir).select(
        "lang",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(_RES_SALTS)).alias("salt"),
    )
    w1 = Window.partitionBy("lang", "salt").orderBy("hkey", "doc_id")
    survivors = (
        d.withColumn("lrk", F.row_number().over(w1))
        .where(F.col("lrk") <= RESERVOIR_K)
        .select("lang", "doc_id", "hkey")
    )
    w2 = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("lang", F.col("rk").cast("bigint").alias("rk"), "doc_id")
        .orderBy("lang", "rk")
    )


# --- repetition-aware mixing schedule (r11) -----------------------------------
# Diminishing-returns discounting for repeated epochs (the
# data-constrained-scaling shape: early repeats are nearly as good as
# fresh data, value decays geometrically after): epoch e of a slice's
# UNIQUE tokens is worth REPEAT_DECAY_MILLI/1000 of epoch e-1, and
# scheduling stops at MAX_REPEAT epochs. Exact integer millis: the
# per-epoch value/cumulative tables are precomputed with the same
# multiply-then-floor recurrence both engines would use, then inlined
# as array literals, so there is nothing to drift.
REPEAT_DECAY_MILLI = 700
MAX_REPEAT = 5
_EPOCH_VALUE_MILLI = (1000, 700, 490, 343, 240)  # v[e] = v[e-1]*700//1000
_EPOCH_CUM_MILLI = (0, 1000, 1700, 2190, 2533, 2773)  # prefix sums of v


def _repetition_mixing_oracle() -> str:
    from wally_spark.plans.dedup import _CAND_SQL, _SHINGLES_SQL

    v_arr = "[" + ", ".join(str(x) for x in _EPOCH_VALUE_MILLI + (0,)) + "]"
    cum_arr = "[" + ", ".join(str(x) for x in _EPOCH_CUM_MILLI) + "]"
    return f"""
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
),
dup AS (
  SELECT d.lang, d.source,
         (10000 * count(dd.doc_id) // count(*))::BIGINT AS dup_bp
  FROM documents d LEFT JOIN dup_docs dd USING (doc_id)
  GROUP BY d.lang, d.source
),
t AS (
  SELECT lang, source,
         sum(len(list_filter(string_split(lower(text), ' '), w -> w <> '')))
           ::BIGINT AS tokens
  FROM documents GROUP BY lang, source
),
w AS (
  SELECT lang, source, tokens,
         floor(sqrt(tokens::DOUBLE))::BIGINT AS weight
  FROM t
),
tot AS (SELECT sum(weight)::BIGINT AS total_w FROM w),
alloc AS (
  SELECT w.lang, w.source, w.tokens,
         ({MIX_BUDGET} * w.weight // tot.total_w)::BIGINT AS target_tokens
  FROM w, tot
),
base AS (
  SELECT a.lang, a.source, a.tokens, a.target_tokens,
         ((a.tokens * (10000 - d.dup_bp)) // 10000)::BIGINT AS unique_tokens
  FROM alloc a JOIN dup d USING (lang, source)
),
sched AS (
  SELECT *,
         CASE WHEN unique_tokens = 0 THEN NULL
              ELSE ((1000 * target_tokens) // unique_tokens)::BIGINT
         END AS epochs_needed_milli,
         CASE WHEN unique_tokens = 0 THEN 0
              ELSE least((target_tokens + unique_tokens - 1)
                           // unique_tokens, {MAX_REPEAT})
         END::BIGINT AS epochs_scheduled
  FROM base
),
drawn AS (
  SELECT *,
         least(target_tokens, unique_tokens * epochs_scheduled)::BIGINT
           AS scheduled_tokens
  FROM sched
),
split_ AS (
  SELECT *,
         CASE WHEN unique_tokens = 0 THEN 0
              ELSE scheduled_tokens // unique_tokens END::BIGINT AS full_ep,
         CASE WHEN unique_tokens = 0 THEN 0
              ELSE scheduled_tokens % unique_tokens END::BIGINT AS rem
  FROM drawn
)
SELECT lang, source, tokens, unique_tokens, target_tokens,
       epochs_needed_milli, epochs_scheduled, scheduled_tokens,
       ((unique_tokens * ({cum_arr}[full_ep + 1])
         + rem * ({v_arr}[full_ep + 1])) // 1000)::BIGINT
         AS effective_tokens,
       CASE WHEN target_tokens = 0 THEN NULL
            ELSE (10000 * ((unique_tokens * ({cum_arr}[full_ep + 1])
                            + rem * ({v_arr}[full_ep + 1])) // 1000))
                 // target_tokens
       END::BIGINT AS utility_bp
FROM split_
"""


@register(
    "repetition_mixing_schedule",
    oracle=_repetition_mixing_oracle(),
    tags=("sampling", "curation", "mixing", "repetition"),
)
def repetition_mixing_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware mixing schedule — the decision report a
    data-constrained 100 TB run emits (r10 verdict item 7, the
    Muennighoff scaling shape): token_budget_allocation says how many
    tokens each (lang, source) slice SHOULD contribute; dup_rate_report
    says how much of the slice is near-duplicate mass; this lane turns
    both into a per-slice repeat-factor schedule with
    diminishing-returns discounting:

      unique_tokens  = tokens discounted by the verified near-dup rate
      epochs_needed  = target / unique (exact millis)
      epochs_scheduled = ceil(target / unique) capped at MAX_REPEAT
                       (={MR}: repeats past the cap are ~worthless)
      scheduled_tokens = what the run will actually draw
      effective_tokens = unique·Σv[1..full] + rem·v[full+1], where
                       epoch e's value decays v[e]=v[e-1]·{RD}‰ —
                       the integer-milli geometric discount
      utility_bp     = effective/target — the column a mix designer
                       sorts by to find slices whose budget should be
                       REALLOCATED to fresher sources.

    Engine-exactness: the decay tables are precomputed integers
    inlined as array literals in BOTH plans; everything else is bigint
    floor arithmetic over exact sums — hash-exact under any
    partitioning. Scale shape: composes two already-bounded rollups
    ((lang, source) cells) with one equi-join; the dup verification
    chain is the capped minhash candidate plan (plans/dedup.py), and
    nothing here adds a shuffle class beyond it.""".format(
        MR=MAX_REPEAT, RD=REPEAT_DECAY_MILLI
    )
    from wally_spark.plans.dedup import dup_rate_report

    alloc = token_budget_allocation(spark, sf_dir).select(
        "lang", "source", "tokens", "target_tokens"
    )
    dup = dup_rate_report(spark, sf_dir).select("lang", "source", "dup_bp")
    base = alloc.join(dup, ["lang", "source"]).withColumn(
        "unique_tokens",
        F.expr("(tokens * (10000 - dup_bp)) div 10000").cast("bigint"),
    )
    sched = base.select(
        "*",
        F.expr(
            "CASE WHEN unique_tokens = 0 THEN NULL"
            " ELSE (1000 * target_tokens) div unique_tokens END"
        )
        .cast("bigint")
        .alias("epochs_needed_milli"),
        F.expr(
            "CASE WHEN unique_tokens = 0 THEN 0"
            " ELSE least((target_tokens + unique_tokens - 1)"
            f" div unique_tokens, {MAX_REPEAT}) END"
        )
        .cast("bigint")
        .alias("epochs_scheduled"),
    ).withColumn(
        "scheduled_tokens",
        F.expr("least(target_tokens, unique_tokens * epochs_scheduled)")
        .cast("bigint"),
    )
    split = sched.select(
        "*",
        F.expr(
            "CASE WHEN unique_tokens = 0 THEN 0"
            " ELSE scheduled_tokens div unique_tokens END"
        )
        .cast("bigint")
        .alias("full_ep"),
        F.expr(
            "CASE WHEN unique_tokens = 0 THEN 0"
            " ELSE scheduled_tokens % unique_tokens END"
        )
        .cast("bigint")
        .alias("rem"),
    )
    v_arr = "array(" + ", ".join(
        str(x) for x in _EPOCH_VALUE_MILLI + (0,)
    ) + ")"
    cum_arr = "array(" + ", ".join(str(x) for x in _EPOCH_CUM_MILLI) + ")"
    eff = (
        f"(unique_tokens * element_at({cum_arr}, cast(full_ep + 1 as int))"
        f" + rem * element_at({v_arr}, cast(full_ep + 1 as int))) div 1000"
    )
    return split.select(
        "lang",
        "source",
        "tokens",
        "unique_tokens",
        "target_tokens",
        "epochs_needed_milli",
        "epochs_scheduled",
        "scheduled_tokens",
        F.expr(eff).cast("bigint").alias("effective_tokens"),
        F.expr(
            "CASE WHEN target_tokens = 0 THEN NULL"
            f" ELSE (10000 * ({eff})) div target_tokens END"
        )
        .cast("bigint")
        .alias("utility_bp"),
    )
