"""Text-analysis operators over the `documents` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, winnowing fingerprints).

Float discipline: ratio outputs are emitted as ``floor(1e4 * ratio)``
basis points — ``floor`` of an IEEE double is engine-identical,
whereas ``round`` of a ratio can land on an exact .xx5 midpoint where
decimal-string and binary rounding disagree.

All hot-path expressions are built-in functions (JVM codegen); no
Python UDFs in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_STOP_EN = ("the", "a", "of", "and", "to", "in", "is")
_STOP_DE = ("der", "die", "das", "und", "ist", "ein")
_STOP_FR = ("le", "la", "les", "et", "est", "un")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain scan; explode-heavy queries wrap _fan_out explicitly
    return load_tables(spark, sf_dir)["documents"]


def _fan_out(df: DataFrame) -> DataFrame:
    """Shared small-scan redistribution — see tables.fan_out."""
    return fan_out(df, "doc_id")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --- token counting: whitespace + BPE-ish regex ---
@register(
    "text_tokens",
    oracle=f"""
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens,
       length(text) AS n_chars
FROM documents
""",
    tags=("text",),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_BPE_RE}', 0)"))
        .cast("bigint")
        .alias("bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# --- quality scoring: length/punct/stopword signals ---
@register(
    "text_quality",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
           AS n_punct
  FROM documents
)
SELECT doc_id, n_chars,
       len(words) AS n_tokens,
       floor(10000.0 * n_punct / n_chars)::BIGINT AS punct_bp,
       floor(10000.0 * len(list_filter(words, w -> w IN ({_sql_list(_STOP_EN)})))
             / len(words))::BIGINT AS stopword_bp,
       floor(10000.0 * len(list_distinct(words)) / len(words))::BIGINT
         AS distinct_bp
FROM feat
""",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals a pretraining pipeline filters on: punctuation
    density, stopword ratio (fluency proxy), lexical diversity."""
    docs = _fan_out(_docs(spark, sf_dir))
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    stop_arr = F.array(*[F.lit(w) for w in _STOP_EN])
    d = docs.select(
        "doc_id",
        words.alias("words"),
        F.length("text").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
        ).alias("n_punct"),
    )
    n_tokens = F.size("words")
    stop_cnt = F.size(F.filter("words", lambda w: F.array_contains(stop_arr, w)))
    return d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.floor(10000.0 * F.col("n_punct") / F.col("n_chars"))
        .cast("bigint")
        .alias("punct_bp"),
        F.floor(10000.0 * stop_cnt / n_tokens).cast("bigint").alias("stopword_bp"),
        F.floor(10000.0 * F.size(F.array_distinct("words")) / n_tokens)
        .cast("bigint")
        .alias("distinct_bp"),
    )


# --- language ID: stopword-hit heuristic with deterministic argmax ---
@register(
    "text_langid",
    oracle=f"""
WITH feat AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), hits AS (
  SELECT doc_id, lang,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_EN)}))) AS en_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_DE)}))) AS de_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_FR)}))) AS fr_hits
  FROM feat
)
SELECT doc_id, lang, en_hits, de_hits, fr_hits,
       CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'
            WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
            WHEN de_hits >= fr_hits THEN 'de'
            ELSE 'fr' END AS predicted
FROM hits
""",
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")

    def hits(stop):
        arr = F.array(*[F.lit(w) for w in stop])
        return F.size(F.filter("words", lambda w: F.array_contains(arr, w)))

    d = docs.select("doc_id", "lang", words.alias("words")).select(
        "doc_id",
        "lang",
        hits(_STOP_EN).cast("bigint").alias("en_hits"),
        hits(_STOP_DE).cast("bigint").alias("de_hits"),
        hits(_STOP_FR).cast("bigint").alias("fr_hits"),
    )
    return d.select(
        "doc_id",
        "lang",
        "en_hits",
        "de_hits",
        "fr_hits",
        F.when(
            (F.col("en_hits") == 0) & (F.col("de_hits") == 0) & (F.col("fr_hits") == 0),
            "unknown",
        )
        .when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits")),
            "en",
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
        .alias("predicted"),
    )


# --- winnowing fingerprint: min over rolling 8-token window hashes ---
@register(
    "text_fingerprint",
    oracle="""
WITH toks AS (
  SELECT doc_id, u.s.pos AS pos,
         ('0x' || substr(md5(u.s.word), 1, 8))::BIGINT AS th
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             list_filter(string_split(lower(text), ' '), w -> w <> ''),
             (w, i) -> {'pos': i, 'word': w})) AS s
    FROM documents) u
), winsum AS (
  SELECT doc_id, pos,
         sum(th) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wh,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wn
  FROM toks
)
SELECT doc_id, min(wh)::BIGINT AS fingerprint, count(*) AS n_windows
FROM winsum WHERE wn = 8
GROUP BY doc_id
""",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style doc fingerprint: token hashes → rolling 8-token
    window sums → per-doc min. Integer arithmetic end to end, so it is
    exactly reproducible across engines and cluster sizes."""
    from pyspark.sql import Window

    docs = _fan_out(_docs(spark, sf_dir))
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    toks = (
        docs.select("doc_id", F.posexplode(words).alias("pos", "word"))
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("th"),
        )
    )
    w8 = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 7)
    winsum = toks.select(
        "doc_id",
        F.sum("th").over(w8).alias("wh"),
        F.count(F.lit(1)).over(w8).alias("wn"),
    ).where(F.col("wn") == 8)
    return winsum.groupBy("doc_id").agg(
        F.min("wh").cast("bigint").alias("fingerprint"),
        F.count(F.lit(1)).alias("n_windows"),
    )


# --- normalized exact dedup (C4-style fuzzy-exact stage) ---
@register(
    "dedup_normalized",
    oracle="""
SELECT md5(norm) AS norm_hash, min(doc_id) AS keeper_doc, count(*) AS n_copies
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents)
GROUP BY norm_hash
""",
    tags=("text", "dedup"),
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after normalization (lowercase, strip punctuation,
    collapse whitespace) — the cheap pre-pass pipelines run before
    near-dup detection; same one-shuffle shape as dedup_exact."""
    docs = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        docs.select("doc_id", norm.alias("norm"))
        .groupBy(F.md5(F.col("norm").cast("binary")).alias("norm_hash"))
        .agg(F.min("doc_id").alias("keeper_doc"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- char-trigram language ID (profiles learned from the corpus) ---
@register(
    "text_langid_ngram",
    oracle="""
WITH trigrams AS (
  SELECT doc_id, lang, u.tg AS tg
  FROM (
    SELECT doc_id, lang,
           unnest(list_distinct(list_transform(
             range(1, greatest(length(lower(text)) - 1, 1)),
             i -> substring(lower(text), i, 3)))) AS tg
    FROM documents WHERE length(text) >= 3) u(doc_id, lang, tg)
), profiles AS (
  SELECT lang, tg FROM (
    SELECT lang, tg, count(*) AS c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, tg) AS rk
    FROM trigrams
    WHERE substring(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')
    GROUP BY lang, tg)
  WHERE rk <= 20
), scores AS (
  SELECT t.doc_id, p.lang AS cand, count(*) AS overlap
  FROM trigrams t JOIN profiles p ON t.tg = p.tg
  GROUP BY t.doc_id, p.lang
)
SELECT doc_id, cand AS predicted, overlap FROM (
  SELECT doc_id, cand, overlap,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY overlap DESC, cand) AS rk
  FROM scores)
WHERE rk = 1
""",
    tags=("text", "langid"),
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID: per-language top-20 trigram
    profiles are LEARNED FROM A DETERMINISTIC ¼ SAMPLE of the labeled
    corpus (md5(doc_id) first nibble in 0-3 — engine-replicable, so the
    oracle samples identically), then each doc takes the argmax-overlap
    language. Profile learning over a sample is the 100 TB shape: the
    profiles converge with corpus size, so the learning pass prunes to
    the sample BEFORE exploding (a quarter of the text scanned) and the
    scoring pass recomputes trigrams from the raw scan. Two scans of
    source text (1.25x total) beat materializing a corpus-sized trigram
    intermediate pinned in executor storage — the profiles themselves
    are tiny (20 trigrams x n_langs) and broadcast."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # length >= 3 on BOTH sides: for 1-2 char docs Spark's sequence
    # bound emits one short 'trigram' while DuckDB's range emits none.
    # Trigrams via codegen explode + substring(col, col) rather than a
    # transform/array_distinct HOF pair (interpreted per character —
    # ~7 s of the round-1 9 s at sf0.1). Emits RAW occurrences; each
    # caller decides where dedup happens (learning: per-doc
    # dropDuplicates over the sampled quarter; scoring: map-side
    # distinct-count after the broadcast profile join).
    def trigrams(d: DataFrame, *extra: str) -> DataFrame:
        return (
            d.where(F.length("text") >= 3)
            .select("doc_id", *extra, F.lower("text").alias("lt"))
            .select(
                "doc_id",
                *extra,
                F.explode(F.sequence(F.lit(1), F.length("lt") - 2)).alias("i"),
                "lt",
            )
            .select(
                "doc_id",
                *extra,
                F.substring("lt", F.col("i"), F.lit(3)).alias("tg"),
            )
        )

    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    wlang = Window.partitionBy("lang").orderBy(F.desc("c"), "tg")
    profiles = (
        # profile counts are DOC frequencies, so the learning side still
        # dedups per doc — but that shuffle covers only the sampled
        # quarter's trigrams
        trigrams(_fan_out(docs.where(sampled)), "lang")
        .dropDuplicates(["doc_id", "tg"])
        .groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(wlang))
        .where(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand"), "tg")
    )
    # scoring side: NO corpus-wide dedup shuffle (r5's bill carried
    # ~|text| rows). Raw trigram occurrences join the broadcast
    # profiles first — discarding every non-profile trigram in-task —
    # then DISTINCT matched trigrams are counted per (doc, lang): the
    # distinct-aggregate's map-side partial dedup collapses each doc
    # inside its scan partition, so the only scoring shuffle carries
    # ≤ 20 × n_langs rows per doc.
    scores = (
        trigrams(_fan_out(docs))
        .join(F.broadcast(profiles), "tg")
        .groupBy("doc_id", "cand")
        .agg(F.count_distinct("tg").alias("overlap"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.desc("overlap"), "cand")
    return (
        scores.withColumn("rk", F.row_number().over(wdoc))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("predicted"), "overlap")
    )


# --- classifier audit: langid confusion matrix -------------------------------
@register(
    "langid_confusion",
    oracle=f"""
WITH feat AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), hits AS (
  SELECT doc_id, lang,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_EN)}))) AS en_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_DE)}))) AS de_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_FR)}))) AS fr_hits
  FROM feat
), pred AS (
  SELECT lang AS actual,
         CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'
              WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
              WHEN de_hits >= fr_hits THEN 'de'
              ELSE 'fr' END AS predicted
  FROM hits
)
SELECT actual, predicted, count(*) AS n_docs
FROM pred GROUP BY actual, predicted
""",
    tags=("text", "langid", "audit"),
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier audit: the (actual x predicted) confusion matrix of
    the stopword langid over the whole corpus — the precision/recall
    dashboard a pipeline checks before trusting a filter at scale.
    Composes the text_langid plan and collapses it to one tiny
    aggregate: per-doc work identical, the confusion rollup is a
    low-cardinality (langs x langs) groupBy with map-side combine —
    the shuffle carries a handful of counters per task regardless of
    corpus size."""
    return (
        text_langid(spark, sf_dir)
        .select(F.col("lang").alias("actual"), "predicted")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- tokenizer fertility report ---------------------------------------------
@register(
    "tokenizer_fertility",
    oracle=f"""
WITH t AS (
  SELECT lang, source,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           ::BIGINT AS ws,
         len(regexp_extract_all(lower(text), '{_BPE_RE}'))::BIGINT AS bpe,
         length(text)::BIGINT AS chars
  FROM documents)
SELECT lang, source,
       count(*)::BIGINT AS n_docs,
       sum(ws)::BIGINT AS ws_tokens,
       sum(bpe)::BIGINT AS bpe_tokens,
       sum(chars)::BIGINT AS n_chars,
       ((1000 * sum(bpe)) // nullif(sum(ws), 0))::BIGINT AS fertility_milli,
       ((1000 * sum(chars)) // nullif(sum(bpe), 0))::BIGINT
         AS chars_per_tok_milli
FROM t GROUP BY lang, source
""",
    tags=("text", "tokenizer", "report"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility dashboard per (lang, source): BPE-ish
    subword tokens per whitespace word and characters per subword
    token, in exact integer millis — the compression diagnostic that
    tells a training pipeline which corpus slices blow up its token
    budget (fertility is THE reported metric when sizing multilingual
    tokenizers). Shares text_tokens' two tokenizers so per-doc counts
    and this rollup can never disagree.

    Scale shape: one documents scan, token counting inline in the
    scan stage (no explode — only counts leave it), one aggregate
    bounded by langs × sources. Ratios by bigint floor division AFTER
    the sums, so the hash is exact under any partitioning."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    t = docs.select(
        "lang",
        "source",
        F.size(words).cast("bigint").alias("ws"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_BPE_RE}', 0)"))
        .cast("bigint")
        .alias("bpe"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        # nullif'd divisors (ADVICE r7): an all-empty/whitespace slice
        # yields NULL here AND in the oracle (DuckDB's integer // would
        # otherwise raise where Spark nulls) — agree by construction.
        F.floor((1000 * F.sum("bpe")) / F.nullif(F.sum("ws"), F.lit(0)))
        .cast("bigint")
        .alias("fertility_milli"),
        F.floor((1000 * F.sum("chars")) / F.nullif(F.sum("bpe"), F.lit(0)))
        .cast("bigint")
        .alias("chars_per_tok_milli"),
    )


# --- character-class / script mix -------------------------------------------
@register(
    "text_script_mix",
    oracle="""
WITH c AS (
  SELECT lang,
         length(text)::BIGINT AS chars,
         (length(text) - length(regexp_replace(lower(text), '[a-z]', '', 'g')))
           ::BIGINT AS letters,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           ::BIGINT AS digits,
         (length(text) - length(regexp_replace(text, ' ', '', 'g')))
           ::BIGINT AS spaces
  FROM documents)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(chars)::BIGINT AS n_chars,
       ((1000 * sum(letters)) // nullif(sum(chars), 0))::BIGINT AS letter_milli,
       ((1000 * sum(digits)) // nullif(sum(chars), 0))::BIGINT AS digit_milli,
       ((1000 * sum(spaces)) // nullif(sum(chars), 0))::BIGINT AS space_milli,
       ((1000 * (sum(chars) - sum(letters) - sum(digits) - sum(spaces)))
         // nullif(sum(chars), 0))::BIGINT AS other_milli
FROM c GROUP BY lang
""",
    tags=("text", "quality", "report"),
)
def text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per language: ASCII-letter, digit,
    space, and other-character mass in exact integer millis — the
    script-consistency probe a multilingual pipeline uses to catch
    mislabeled or transliterated slices (a 'zh' shard that is mostly
    ASCII letters is mislabeled or romanized; a slice heavy in
    'other' needs encoding review before tokenizer training).

    Counts are length-difference against a class-stripped copy —
    three codegen regexp_replaces per row, one scan, no explode, an
    aggregate bounded by |langs|; shares by bigint floor division
    after the sums (hash-exact)."""
    docs = _docs(spark, sf_dir)
    def stripped(col, pat):
        return F.length(col) - F.length(F.regexp_replace(col, pat, ""))
    c = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("chars"),
        stripped(F.lower("text"), "[a-z]").cast("bigint").alias("letters"),
        stripped(F.col("text"), "[0-9]").cast("bigint").alias("digits"),
        stripped(F.col("text"), " ").cast("bigint").alias("spaces"),
    )
    o = (
        F.sum("chars") - F.sum("letters") - F.sum("digits") - F.sum("spaces")
    )
    # nullif'd divisor (ADVICE r7): a lang slice of only empty texts
    # yields NULL ratios in both engine and oracle instead of a DuckDB
    # division-by-zero error — agree by construction.
    d = F.nullif(F.sum("chars"), F.lit(0))
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.floor((1000 * F.sum("letters")) / d)
        .cast("bigint")
        .alias("letter_milli"),
        F.floor((1000 * F.sum("digits")) / d)
        .cast("bigint")
        .alias("digit_milli"),
        F.floor((1000 * F.sum("spaces")) / d)
        .cast("bigint")
        .alias("space_milli"),
        F.floor((1000 * o) / d).cast("bigint").alias("other_milli"),
    )


# --- classifier-agreement audit (r8) -----------------------------------------
def langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix between the two language-ID classifiers
    (stopword-hit text_langid vs trigram-profile text_langid_ngram) —
    the cross-validation a pipeline runs before trusting either as a
    routing gate: cells off the diagonal are docs the classifiers
    dispute (route to review or a heavier model), and a diagonal cell
    collapsing under a profile update is the regression alarm. Counts
    are per (stopword prediction, ngram prediction) over the docs both
    classifiers scored.

    Scale shape: composes the two registered lanes unchanged (both are
    single-scan + bounded-broadcast plans) and adds one doc_id join +
    a |langs|²-bounded aggregate. Oracle: the two lanes' oracles as
    CTE subqueries — the audit can never drift from what it grades."""
    a = text_langid(spark, sf_dir).select("doc_id", F.col("predicted").alias("pred_stop"))
    b = text_langid_ngram(spark, sf_dir).select(
        "doc_id", F.col("predicted").alias("pred_ngram")
    )
    return (
        a.join(b, "doc_id")
        .groupBy("pred_stop", "pred_ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


from wally_spark.plans.registry import REGISTRY as _REG  # noqa: E402

register(
    "langid_agreement",
    oracle=f"""
WITH stopw AS (SELECT doc_id, predicted AS pred_stop
               FROM ({_REG['text_langid'].oracle}) t),
ngramw AS (SELECT doc_id, predicted AS pred_ngram
           FROM ({_REG['text_langid_ngram'].oracle}) t)
SELECT s.pred_stop, n.pred_ngram, count(*)::BIGINT AS n_docs
FROM stopw s JOIN ngramw n ON s.doc_id = n.doc_id
GROUP BY s.pred_stop, n.pred_ngram
""",
    tags=("text", "langid", "report"),
)(langid_agreement)


# --- vocabulary Simpson diversity (r8) ---------------------------------------
@register(
    "docs_vocab_simpson",
    oracle="""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                    w -> w <> '')) AS tok
  FROM documents),
tc AS (SELECT source, tok, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2)
SELECT source,
       sum(n)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_distinct,
       ((1000000 * sum(n * (n - 1))) // nullif(sum(n) * (sum(n) - 1), 0))
         ::BIGINT AS simpson_ppm,
       ((10000 * max(n)) // sum(n))::BIGINT AS top_token_bp
FROM tc GROUP BY source
""",
    tags=("text", "quality", "diversity"),
)
def docs_vocab_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary concentration — Simpson's index in ppm
    (probability two random tokens coincide: Σn_t(n_t−1)/N(N−1),
    computed EXACTLY in integers) plus the single-heaviest-token share
    bp. A template-farm source shows simpson_ppm and top_token_bp far
    above organic prose; the lane is the scalar summary a curation
    pipeline thresholds before paying for per-doc repetition scoring
    (text_repetition is the per-doc face).

    Scale shape: explode → ONE (source, token)-keyed map-side-combined
    count → |sources|-bounded rollup. Uniform token keys; no windows;
    output bounded by the source catalog."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("tok"),
    )
    tc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return tc.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.expr(
            "CAST((1000000 * sum(n * (n - 1)))"
            " div nullif(sum(n) * (sum(n) - 1), 0) AS BIGINT)"
        ).alias("simpson_ppm"),
        F.expr("CAST((10000 * max(n)) div sum(n) AS BIGINT)").alias(
            "top_token_bp"
        ),
    )


# --- language-ID confidence margin (r8) --------------------------------------
@register(
    "text_langid_margin",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), hits AS (
  SELECT doc_id,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_EN)}))) AS en_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_DE)}))) AS de_hits,
         len(list_filter(words, w -> w IN ({_sql_list(_STOP_FR)}))) AS fr_hits
  FROM feat
), scored AS (
  SELECT CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'
              WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
              WHEN de_hits >= fr_hits THEN 'de'
              ELSE 'fr' END AS predicted,
         greatest(en_hits, de_hits, fr_hits)
           - (en_hits + de_hits + fr_hits
              - greatest(en_hits, de_hits, fr_hits)
              - least(en_hits, de_hits, fr_hits)) AS margin
  FROM hits
)
SELECT predicted,
       CASE WHEN margin = 0 THEN 'ambiguous'
            WHEN margin <= 2 THEN 'weak'
            WHEN margin <= 5 THEN 'moderate'
            ELSE 'strong' END AS confidence,
       count(*)::BIGINT AS n_docs,
       min(margin)::BIGINT AS min_margin,
       max(margin)::BIGINT AS max_margin
FROM scored GROUP BY 1, 2
""",
    tags=("text", "langid", "quality"),
)
def text_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFIDENCE report — the margin between the best and
    second-best stopword-hit score (text_langid's scoring): a
    production langid gate routes margin-0 ('ambiguous') docs to a
    heavier classifier rather than trusting the argmax, and this lane
    sizes that routing decision per predicted language × confidence
    band. Margin is best − median of the three counters (exact
    integers; least/greatest identities avoid any sort).

    Scale shape: same ONE codegen scan as text_langid (stopword
    membership over the token array — no explode, no join), then a
    bounded (languages × 4 bands) aggregate. Nothing but expression
    work touches the corpus."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")

    def hits(stop):
        arr = F.array(*[F.lit(w) for w in stop])
        return F.size(F.filter("words", lambda w: F.array_contains(arr, w)))

    d = docs.select("doc_id", words.alias("words")).select(
        hits(_STOP_EN).cast("bigint").alias("en_hits"),
        hits(_STOP_DE).cast("bigint").alias("de_hits"),
        hits(_STOP_FR).cast("bigint").alias("fr_hits"),
    )
    scored = d.selectExpr(
        "CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'"
        " WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'"
        " WHEN de_hits >= fr_hits THEN 'de'"
        " ELSE 'fr' END AS predicted",
        "greatest(en_hits, de_hits, fr_hits)"
        " - (en_hits + de_hits + fr_hits"
        "    - greatest(en_hits, de_hits, fr_hits)"
        "    - least(en_hits, de_hits, fr_hits)) AS margin",
    )
    return scored.groupBy(
        "predicted",
        F.expr(
            "CASE WHEN margin = 0 THEN 'ambiguous'"
            " WHEN margin <= 2 THEN 'weak'"
            " WHEN margin <= 5 THEN 'moderate'"
            " ELSE 'strong' END"
        ).alias("confidence"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("margin").cast("bigint").alias("min_margin"),
        F.max("margin").cast("bigint").alias("max_margin"),
    )


# --- sentence segmentation profile (r8) --------------------------------------
@register(
    "text_sentence_stats",
    oracle="""
WITH d AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '[.!?]+'),
                         s -> trim(s) <> '')) AS n_sent,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_words
  FROM documents)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_sent)::BIGINT AS n_sentences,
       ((1000 * sum(n_sent)) // count(*))::BIGINT AS sent_per_doc_milli,
       ((1000 * sum(n_words)) // nullif(sum(n_sent), 0))::BIGINT
         AS words_per_sent_milli
FROM d GROUP BY source
""",
    tags=("text", "quality", "sentences"),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-segmentation profile per source — mean sentences per
    doc and words per sentence (milli precision, exact integer
    division): the Gopher-style structural signal that separates
    prose (long docs, moderate sentence length) from listings and
    keyword-stuffed spam (few terminators → absurd words-per-sentence)
    before any heavier scoring runs. Sentences = non-empty spans
    between [.!?]+ runs, identically regex-split in both engines.

    Scale shape: pure expression work in the scan (regex split +
    array filter, no explode), ONE |sources|-bounded map-side-combined
    aggregate."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "source",
        F.size(
            F.filter(
                F.split("text", "[.!?]+"), lambda s: F.trim(s) != ""
            )
        ).alias("n_sent"),
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("n_words"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_sent").cast("bigint").alias("n_sentences"),
        F.expr("CAST((1000 * sum(n_sent)) div count(1) AS BIGINT)").alias(
            "sent_per_doc_milli"
        ),
        F.expr(
            "CAST((1000 * sum(n_words)) div nullif(sum(n_sent), 0) AS BIGINT)"
        ).alias("words_per_sent_milli"),
    )


# --- OOV rate under a frequency-capped vocab, per (lang, source) (r9) --------
OOV_MIN_FREQ = 5


@register(
    "oov_rate_by_source",
    oracle=f"""
WITH w AS (
  SELECT lang, source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS term
  FROM documents),
f AS (SELECT term, count(*)::BIGINT AS c FROM w GROUP BY 1)
SELECT lang, source,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN c < {OOV_MIN_FREQ} THEN 1 ELSE 0 END)::BIGINT
         AS oov_tokens,
       ((10000 * sum(CASE WHEN c < {OOV_MIN_FREQ} THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS oov_bp,
       count(DISTINCT CASE WHEN c < {OOV_MIN_FREQ} THEN term END)::BIGINT
         AS oov_types
FROM w JOIN f USING (term)
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("text", "tokenizer", "vocab"),
)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per (lang, source) under a
    frequency-capped vocabulary (corpus frequency >= {OOV_MIN_FREQ}
    keeps a term in-vocab) — the "which slices will the tokenizer
    serve badly" report that vocab_coverage_curve's global curve
    can't answer: token mass, OOV token mass, OOV rate in basis
    points, and distinct OOV types per slice.

    Scale shape: one token explode (fan_out first), a term-keyed
    frequency aggregate, then a term-keyed equi-join back onto the
    stream — both uniform-key shuffles (hot terms are by definition
    in-vocab, so the join skew ceiling is the OOV tail, which is flat);
    the rollup is |lang×source|-bounded. The vocab is corpus-sized so
    it is NEVER broadcast; AQE may still pick broadcast at small SF."""
    docs = fan_out(_docs(spark, sf_dir), "doc_id")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    w = docs.select(
        "lang", "source", F.explode(words).alias("term")
    )
    f = w.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    oov = F.when(F.col("c") < OOV_MIN_FREQ, 1).otherwise(0)
    return (
        w.join(f, "term")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("oov_tokens"),
            F.expr(
                f"(10000 * sum(case when c < {OOV_MIN_FREQ} then 1 else 0"
                " end)) div count(1)"
            )
            .cast("bigint")
            .alias("oov_bp"),
            F.countDistinct(
                F.when(F.col("c") < OOV_MIN_FREQ, F.col("term"))
            )
            .cast("bigint")
            .alias("oov_types"),
        )
        .orderBy("lang", "source")
    )
