"""Corpus-quality and windowed-dedup operators — round-3 extensions to
the training-data surface (SURVEY §2.6; engine extensions in the spirit
of machida computations, machida/lib/wallaroo/__init__.py:270).

  text_boilerplate      shared-shingle (boilerplate) fraction per doc
  docs_length_band      per-language p05–p95 length-band filter summary
  lang_source_quota     quota sampling: cap docs per (lang, source) cell
  events_dedup_hourly   within-window duplicate collapse over events
  event_value_hour_corr Pearson corr(value, hour-of-day) per event type
  text_pii_scrub        regex PII detection + redaction counts (r5)
  corpus_mix_report     per-(lang, source) corpus share dashboard (r5)
  events_benford        (r8) Benford first-digit DQ audit — shared
                        literal expectation table; streaming face keeps
                        a 9-row digit-count corpus
                        (streaming/ops.benford_foreach_batch)

All have full DuckDB oracles. Fractions are integer basis points;
the correlation is rounded to 4 dp on both sides (registry convention
for float aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

BOILER_N = 5  # shingle width (words); dedup.py owns the 3-gram surface
BOILER_DF = 2  # a shingle seen in >= this many docs is boilerplate
QUOTA = 8  # max docs kept per (lang, source) cell
BAND_LO, BAND_HI = 0.05, 0.95

_SHINGLE5_SQL = f"""
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(words) - {BOILER_N - 2}, 1)),
           i -> {" || ' ' || ".join(f"words[i+{k}]" for k in range(BOILER_N))}
         )) AS shingles
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        FROM documents)
  WHERE len(words) >= {BOILER_N}
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain scan; the shingle-heavy queries below fan_out explicitly
    return load_tables(spark, sf_dir)["documents"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


def _shingles5(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct 5-word shingles, exploded."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words")).where(
        F.size("words") >= BOILER_N
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("words") - (BOILER_N - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(
                " ", *[F.element_at("words", i + k) for k in range(BOILER_N)]
            ),
        )
    )
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


@register(
    "text_boilerplate",
    oracle=f"""
WITH shingled AS ({_SHINGLE5_SQL}),
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
df AS (SELECT shingle, count(*) AS df FROM exploded GROUP BY shingle),
per_doc AS (
  SELECT e.doc_id,
         count(*) AS n_shingles,
         sum(CASE WHEN df.df >= {BOILER_DF} THEN 1 ELSE 0 END) AS n_boiler
  FROM exploded e JOIN df ON df.shingle = e.shingle
  GROUP BY e.doc_id)
SELECT doc_id, n_shingles::BIGINT AS n_shingles, n_boiler::BIGINT AS n_boiler,
       (10000 * n_boiler // n_shingles)::BIGINT AS boiler_bp
FROM per_doc
""",
    tags=("text", "curation"),
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: a 5-word shingle appearing in >= BOILER_DF
    distinct docs is 'boilerplate' (shared header/footer/template text);
    each doc reports how much of it is boilerplate, in basis points.

    Scale shape: the only heavy shuffle is the doc-frequency groupBy
    (map-side combined, shingle-keyed). The boilerplate SET (df >=
    threshold) is orders of magnitude smaller than the shingle stream,
    so the membership join back is AQE-broadcast at test SF and falls
    back to a shuffle join if a 100 TB corpus makes the set large —
    expressed as a plain join so the planner decides. Per-doc totals
    are a partial-aggregated doc-keyed count, never a full-width sort.
    """
    ex = _shingles5(fan_out(_docs(spark, sf_dir), "doc_id"))
    boilers = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= BOILER_DF)
        .select("shingle", F.lit(1).alias("is_boiler"))
    )
    # one pass over the shingle stream computes BOTH totals and the
    # boilerplate count: left-join the (unique-keyed) boiler set as a
    # flag, then a single doc-keyed aggregate — count(*) is the shingle
    # total, count(flag) skips nulls so it is exactly the inner-join
    # match count. Two text scans total (df + this one) instead of the
    # three the totals/membership/boiler-count split paid. The flag
    # join is SALTED: a boilerplate shingle appears in millions of
    # docs at 100 TB (that is what makes it boilerplate), and a plain
    # shingle-keyed join would concentrate all those occurrences in
    # one task.
    from wally_spark.operators.skew import salted_join

    return (
        salted_join(ex, boilers, "shingle", n_salts=8, how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count("is_boiler").cast("bigint").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            (10000 * F.col("n_boiler") / F.col("n_shingles"))
            .cast("bigint")
            .alias("boiler_bp"),
        )
    )


@register(
    "docs_length_band",
    oracle=f"""
WITH bands AS (
  SELECT lang,
         quantile_cont(n_chars, {BAND_LO}) AS lo,
         quantile_cont(n_chars, {BAND_HI}) AS hi,
         count(*) AS n_total
  FROM documents GROUP BY lang)
SELECT b.lang,
       b.n_total::BIGINT AS n_total,
       sum(CASE WHEN d.n_chars >= b.lo AND d.n_chars <= b.hi
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(b.lo, 2) AS lo,
       round(b.hi, 2) AS hi
FROM documents d JOIN bands b ON b.lang = d.lang
GROUP BY b.lang, b.n_total, b.lo, b.hi
""",
    tags=("text", "curation"),
)
def docs_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-band quality filter: per language, docs outside the
    [p05, p95] character-length band are outliers (truncated fragments
    or concatenation blowups); reports kept counts and the band.

    Exact percentiles per language are a single partial-aggregating
    groupBy over a low-cardinality key; the band table is broadcast
    back. At 100 TB swap `percentile` for `percentile_approx` — same
    plan shape, sketch-mergeable (documented, not default, so the
    oracle stays exact)."""
    docs = _docs(spark, sf_dir)
    bands = docs.groupBy("lang").agg(
        F.expr(f"percentile(n_chars, {BAND_LO})").alias("lo"),
        F.expr(f"percentile(n_chars, {BAND_HI})").alias("hi"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        docs.join(F.broadcast(bands), "lang")
        .groupBy("lang", "n_total", "lo", "hi")
        .agg(
            F.sum(
                F.when(
                    (F.col("n_chars") >= F.col("lo"))
                    & (F.col("n_chars") <= F.col("hi")),
                    1,
                ).otherwise(0)
            ).alias("n_kept")
        )
        .select(
            "lang",
            F.col("n_total").cast("bigint").alias("n_total"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.round("lo", 2).alias("lo"),
            F.round("hi", 2).alias("hi"),
        )
    )


@register(
    "lang_source_quota",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents)
SELECT doc_id, lang, source, rn::BIGINT AS rank_in_cell
FROM ranked WHERE rn <= {QUOTA}
""",
    tags=("sampling", "curation"),
)
def lang_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling: keep at most QUOTA docs per (lang, source) cell,
    chosen in md5(doc_id) hash order — the language/domain-balancing
    step of a pretraining mix (caps dominant crawls instead of taking a
    proportional fraction like sample_stratified).

    Two-phase so a hot cell never funnels its full mass through one
    task: phase 1 windows on (input partition id, cell) — the hot
    cell's rows are spread across all scan partitions, so each task
    sorts a bounded slice and keeps at most QUOTA of them; phase 2 runs
    the original global cell window over the survivors, whose size per
    cell is now <= QUOTA x n_partitions regardless of raw cell mass.
    Any row in the global top-QUOTA of its cell is in the top-QUOTA of
    its own partition's slice, so the answer is identical to the
    single-window plan (same trick as operators/prefix.py)."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w1 = Window.partitionBy("__pid", "lang", "source").orderBy(h, "doc_id")
    pre = (
        docs.select(
            "doc_id", "lang", "source", F.spark_partition_id().alias("__pid")
        )
        .withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= QUOTA)
        .drop("__pid", "__rn1")
    )
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        pre.select(
            "doc_id", "lang", "source", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= QUOTA)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("rn").cast("bigint").alias("rank_in_cell"),
        )
    )


@register(
    "events_dedup_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       (count(*) - count(DISTINCT user_id))::BIGINT AS n_dups
FROM events
GROUP BY 1, 2
""",
    tags=("events", "dedup", "windows"),
)
def events_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup summary: within each 1-hour tumbling window and
    event type, collapse repeat events from the same user; reports raw
    vs deduplicated counts (the batch twin of the watermark-bounded
    streaming dedup in streaming/ops.py).

    distinct-within-group runs as partial aggregation on (hour, type,
    user) then a rollup — two map-side-combining shuffles, no global
    distinct. Scale-safe at any window count."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "hour",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_users").cast("bigint").alias("n_users"),
            (F.col("n_events") - F.col("n_users"))
            .cast("bigint")
            .alias("n_dups"),
        )
    )


@register(
    "event_value_hour_corr",
    oracle="""
SELECT event_type,
       round(corr(value, hour(ts)), 4) AS corr_value_hour,
       count(*)::BIGINT AS n
FROM events
GROUP BY event_type
""",
    tags=("events", "analytics"),
)
def event_value_hour_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between event value and hour-of-day per
    event type — the diurnal-signal probe of a metrics pipeline.
    `corr` is a codegen co-moment aggregate (single shuffle, partial
    merge); rounded to 4 dp on both sides per registry convention."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", F.hour("ts")), 4).alias("corr_value_hour"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# PII patterns kept engine-portable: the same source string compiles
# identically under Java regex (Spark) and RE2 (DuckDB).
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"555-[0-9]{3}"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH synth AS (
  SELECT doc_id,
         text
           || repeat(' u' || doc_id || '@example.com', doc_id % 3)
           || repeat(' 555-' || lpad((doc_id % 100)::VARCHAR, 3, '0'),
                     doc_id % 2) AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t, '{PII_PHONE}'))::BIGINT AS n_phones,
       length(regexp_replace(regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                             '{PII_PHONE}', '<PHONE>', 'g'))::BIGINT
         AS clean_len
FROM synth
""",
    tags=("text", "pii", "curation"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction pass — the scrub step every training
    corpus runs before packing. The synthetic corpus carries no PII, so
    each doc first gets DETERMINISTIC synthetic emails/phone numbers
    appended (doc_id arithmetic both engines reproduce exactly), then
    the scrub counts matches and measures the redacted length. All
    codegen string expressions (regexp_count / regexp_replace) — one
    scan, no shuffle, no UDF; at 100 TB this runs at parquet-scan
    speed."""
    docs = _docs(spark, sf_dir)
    synth = F.concat(
        F.col("text"),
        F.repeat(
            F.concat(F.lit(" u"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
            (F.col("doc_id") % 3).cast("int"),
        ),
        F.repeat(
            F.concat(
                F.lit(" 555-"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 3, "0"),
            ),
            (F.col("doc_id") % 2).cast("int"),
        ),
    )
    d = docs.select("doc_id", synth.alias("t"))
    return d.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count("t", F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
        F.length(
            F.regexp_replace(
                F.regexp_replace("t", PII_EMAIL, "<EMAIL>"),
                PII_PHONE,
                "<PHONE>",
            )
        )
        .cast("bigint")
        .alias("clean_len"),
    )


@register(
    "corpus_mix_report",
    oracle="""
SELECT lang, source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       ((10000 * sum(n_chars)::BIGINT)
        // (SELECT sum(n_chars)::BIGINT FROM documents))::BIGINT AS share_bp
FROM documents
GROUP BY lang, source
""",
    tags=("curation", "analytics"),
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mix dashboard: per (lang, source) cell, document
    count, character mass, and exact integer basis-point share of the
    corpus. One partial-aggregating shuffle for the cells; the grand
    total is a 1-row aggregate combined via broadcast (allow-listed in
    test_no_cartesian_anywhere) — no global single-task window. The
    share uses integral division (`div`) so both engines compute the
    identical bigint."""
    docs = _docs(spark, sf_dir)
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    grand = docs.agg(F.sum("n_chars").alias("grand"))
    return (
        cells.crossJoin(F.broadcast(grand))
        .select(
            "lang",
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("total_chars").cast("bigint").alias("total_chars"),
            F.expr("10000 * total_chars div grand").cast("bigint").alias("share_bp"),
        )
    )


# --- Gopher/RedPajama rule-filter bundle (r7) -------------------------------
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3, 10  # mean word length bounds
# Stopword presence rule: >= 2 distinct hits. The published Gopher list
# is (the, be, to, of, and, that, have, with); 'a'/'in'/'is' are added
# so the rule discriminates on corpora with a constrained vocabulary —
# the rule SHAPE (distinct-hit threshold over a broadcast-literal list)
# is what transfers.
GOPHER_STOPS = ("the", "a", "and", "of", "to", "in", "is", "with")
GOPHER_MIN_STOPS = 2


def _gopher_feat_sql(carry: str = "") -> str:
    """Oracle twin of ``_gopher_feat``: the base+feat CTE prefix;
    ``carry`` is a column-list suffix like ``, source``."""
    return f"""
WITH base AS (
  SELECT doc_id{carry},
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words,
         string_split(text, chr(10)) AS lines,
         len(text) - len(replace(text, '#', '')) AS n_hash,
         (len(text) - len(replace(text, '...', ''))) // 3 AS n_ell
  FROM documents
),
feat AS (
  SELECT doc_id{carry},
         len(words)::BIGINT AS n_words,
         (SELECT coalesce(sum(len(w)), 0) FROM unnest(words) AS t(w))::BIGINT AS n_word_chars,
         len(list_filter(words, w -> regexp_matches(w, '[a-z]')))::BIGINT AS n_alpha,
         ({" + ".join(f"CASE WHEN list_contains(words, '{s}') THEN 1 ELSE 0 END" for s in GOPHER_STOPS)})::BIGINT AS n_stops,
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))::BIGINT AS n_bullet,
         len(list_filter(lines, l -> ends_with(rtrim(l), '...')))::BIGINT AS n_ell_lines,
         (n_hash + n_ell)::BIGINT AS n_symbols
  FROM base
)
"""


_G_RULES_SQL = {
    "r_word_count": f"(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})",
    "r_mean_word_len": f"({GOPHER_MIN_MWL} * n_words <= n_word_chars"
    f" AND n_word_chars <= {GOPHER_MAX_MWL} * n_words)",
    "r_symbol_ratio": "(10 * n_symbols < n_words)",
    "r_bullet_lines": "(10 * n_bullet < 9 * n_lines)",
    "r_ellipsis_lines": "(10 * n_ell_lines < 3 * n_lines)",
    "r_alpha_words": "(5 * n_alpha > 4 * n_words)",
    "r_stopwords": f"(n_stops >= {GOPHER_MIN_STOPS})",
}
_G_VERDICT_SQL = "(" + " AND ".join(_G_RULES_SQL.values()) + ")"


def _gopher_feat(docs: DataFrame, *carry: str) -> DataFrame:
    """Per-doc Gopher rule features in one codegen scan; ``carry``
    names extra document columns to thread through (e.g. ``source``
    for the sweep rollup) without a later join."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    lines = F.split("text", "\n")
    base = docs.select(
        "doc_id",
        *carry,
        words.alias("words"),
        lines.alias("lines"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))).alias("n_hash"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))) / F.lit(3)
        ).cast("bigint").alias("n_ell"),
    )
    return base.select(
        "doc_id",
        *carry,
        F.size("words").cast("bigint").alias("n_words"),
        F.aggregate(
            "words", F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("n_word_chars"),
        F.size(F.filter("words", lambda w: w.rlike("[a-z]"))).cast("bigint").alias("n_alpha"),
        sum(
            (F.array_contains("words", s).cast("bigint") for s in GOPHER_STOPS),
            F.lit(0).cast("bigint"),
        ).alias("n_stops"),
        F.size("lines").cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                "lines",
                lambda l: F.ltrim(l).startswith("-") | F.ltrim(l).startswith("*"),
            )
        ).cast("bigint").alias("n_bullet"),
        F.size(F.filter("lines", lambda l: F.rtrim(l).endswith("...")))
        .cast("bigint")
        .alias("n_ell_lines"),
        (F.col("n_hash") + F.col("n_ell")).cast("bigint").alias("n_symbols"),
    )


def _gopher_rule_cols() -> dict[str, F.Column]:
    """Rule name → boolean Column over the _gopher_feat schema. All
    integer arithmetic (ratio thresholds cross-multiplied)."""
    r_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mwl = (F.lit(GOPHER_MIN_MWL) * F.col("n_words") <= F.col("n_word_chars")) & (
        F.col("n_word_chars") <= F.lit(GOPHER_MAX_MWL) * F.col("n_words")
    )
    r_sym = F.lit(10) * F.col("n_symbols") < F.col("n_words")
    r_bul = F.lit(10) * F.col("n_bullet") < F.lit(9) * F.col("n_lines")
    r_ell = F.lit(10) * F.col("n_ell_lines") < F.lit(3) * F.col("n_lines")
    r_alp = F.lit(5) * F.col("n_alpha") > F.lit(4) * F.col("n_words")
    r_stp = F.col("n_stops") >= GOPHER_MIN_STOPS
    return {
        "r_word_count": r_wc,
        "r_mean_word_len": r_mwl,
        "r_symbol_ratio": r_sym,
        "r_bullet_lines": r_bul,
        "r_ellipsis_lines": r_ell,
        "r_alpha_words": r_alp,
        "r_stopwords": r_stp,
    }


@register(
    "gopher_rules",
    oracle=f"""
{_gopher_feat_sql()}
SELECT doc_id, n_words,
       {", ".join(f"{e} AS {n}" for n, e in _G_RULES_SQL.items())},
       {_G_VERDICT_SQL} AS verdict
FROM feat
""",
    tags=("text", "curation", "quality"),
)
def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RedPajama-style rule-filter bundle (Rae et al. 2021 §A1.1;
    RedPajama-Data quality signals): the standard public pretraining
    quality rules — word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    alphabetic-word fraction, stopword presence — evaluated in ONE
    document scan emitting a boolean per rule plus the conjunction
    verdict. The per-rule booleans are the point: a mix dashboard
    slices WHICH rule kills a source, not just how many docs die.

    Scale shape: a single codegen pass — split once into words/lines,
    every rule is integer arithmetic over counts (no floats: ratio
    thresholds are cross-multiplied, e.g. ``10 * symbols < words`` is
    ``symbols/words < 0.1``), zero UDFs, zero joins, zero shuffles.
    Symbol counts use the length-difference idiom (len - len(replace))
    so the whole bundle stays inside whole-stage codegen. At 100 TB
    this runs at parquet-scan speed with full column pruning
    (doc_id, text only)."""
    feat = _gopher_feat(_docs(spark, sf_dir))
    rules = _gopher_rule_cols()
    verdict = None
    for c in rules.values():
        verdict = c if verdict is None else (verdict & c)
    return feat.select(
        "doc_id",
        "n_words",
        *[c.alias(n) for n, c in rules.items()],
        verdict.alias("verdict"),
    )


@register(
    "quality_rule_sweep",
    oracle=f"""
{_gopher_feat_sql(", source")}
SELECT source, k, count(*)::BIGINT AS n_docs
FROM (
  SELECT source,
         ({" + ".join(f"CASE WHEN {e} THEN 1 ELSE 0 END" for e in _G_RULES_SQL.values())})::BIGINT AS k
  FROM feat
)
GROUP BY source, k
""",
    tags=("text", "curation", "quality"),
)
def quality_rule_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-severity calibration sweep: for each source, the
    distribution of documents over "number of Gopher rules passed"
    (0..7) — the table that tells a mix designer whether a source dies
    on ONE rule (fixable threshold) or fails broadly (drop the
    source), and what the keep-rate would be at any strictness
    cutoff, without re-running the filter per candidate threshold.

    Scale shape: the same single-scan codegen feature pass as
    gopher_rules (shared ``_gopher_feat``, ``source`` threaded through
    the scan so no join re-attaches it), then one low-cardinality
    (source, k) aggregate — map-side combined, output bounded by
    n_sources × 8 regardless of corpus mass."""
    feat = _gopher_feat(_docs(spark, sf_dir), "source")
    rules = _gopher_rule_cols()
    k = None
    for c in rules.values():
        k = c.cast("bigint") if k is None else (k + c.cast("bigint"))
    return (
        feat.select("source", k.alias("k"))
        .groupBy("source", "k")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- host-level curation rollup (r7) ----------------------------------------
HOST_DUP_BP = 2000  # downweight a host when >= 20% of its docs are dups
HOST_FP_CHARS = 120  # prefix-fingerprint width for the dup identity


@register(
    "host_curation_report",
    oracle=f"""
WITH d AS (
  SELECT doc_id, n_chars,
         source || '-h' || substr(md5(doc_id::VARCHAR), 1, 1) AS host,
         md5(substr(text, 1, {HOST_FP_CHARS})) AS h
  FROM documents
),
dups AS (
  SELECT h FROM d GROUP BY h HAVING count(*) >= 2
),
flagged AS (
  SELECT d.host, d.n_chars,
         CASE WHEN dups.h IS NULL THEN 0 ELSE 1 END AS is_dup
  FROM d LEFT JOIN dups ON d.h = dups.h
)
SELECT host,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars,
       sum(is_dup)::BIGINT AS n_dup_docs,
       (10000 * sum(is_dup) // count(*))::BIGINT AS dup_bp,
       (10000 * sum(is_dup) // count(*) >= {HOST_DUP_BP}) AS downweight
FROM flagged
GROUP BY host
""",
    tags=("curation", "dedup", "quality"),
)
def host_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host/domain-level curation rollup — the per-host down-weighting
    step real pretraining mixes run (CCNet, RefinedWeb): a host whose
    pages are mostly duplicated content (mirrors, boilerplate farms)
    gets its sampling weight cut regardless of per-doc quality. Per
    host: doc count, char mass, docs in >= 1 dup group by PREFIX
    FINGERPRINT (md5 of the first HOST_FP_CHARS chars — corpus-wide,
    not host-local, because a mirror duplicates someone else's
    content; the prefix identity catches tail-edited near-copies that
    exact-hash misses, and at 100 TB it is one bounded md5 per doc
    regardless of doc length), integer basis-point dup rate, and the
    downweight verdict. The host is derived deterministically from (source,
    md5(doc_id) nibble) because the synthetic documents table carries
    no URL column; with a real crawl, substitute the parsed hostname —
    the plan shape is identical.

    Scale shape: one md5 per doc; the dup-group relation is a
    hash-keyed aggregate (map-side combined, uniform key — no skew),
    joined back on the same uniform hash; then one low-cardinality
    host rollup. Two shuffles total, both on uniform keys; basis
    points via integral division so both engines emit identical
    bigints."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            "source",
            F.lit("-h"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        ).alias("host"),
        F.md5(F.substring("text", 1, HOST_FP_CHARS)).alias("h"),
    )
    dups = d.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    flagged = d.join(
        dups.select("h", F.lit(1).alias("is_dup")), "h", "left"
    ).select("host", "n_chars", F.coalesce("is_dup", F.lit(0)).alias("is_dup"))
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
        F.expr("10000 * sum(is_dup) div count(1)").cast("bigint").alias("dup_bp"),
        (F.expr("10000 * sum(is_dup) div count(1)") >= HOST_DUP_BP).alias(
            "downweight"
        ),
    )


# --- term-blocklist content filter (r8) ---------------------------------------
# (term, severity): severity 2 = hard (any occurrence drops the doc),
# severity 1 = soft (drops only when > SOFT_BP of the doc's words).
BLOCK_TERMS = (("crash", 2), ("slow", 1), ("fast", 1))
SOFT_BP = 100  # soft-term mass threshold: 1% of words

_BLOCK_TERMS_SQL = ", ".join(f"('{t}', {s})" for t, s in BLOCK_TERMS)


@register(
    "blocklist_terms_filter",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                    w -> w <> '')) AS word
  FROM documents
),
terms (term, severity) AS (VALUES {_BLOCK_TERMS_SQL}),
hits AS (
  SELECT t.doc_id,
         count(*) AS n_hits,
         sum(CASE WHEN terms.severity = 2 THEN 1 ELSE 0 END) AS n_hard
  FROM tok t JOIN terms ON t.word = terms.term
  GROUP BY t.doc_id
),
base AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id)
SELECT base.doc_id,
       base.n_words::BIGINT AS n_words,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
       coalesce(hits.n_hard, 0)::BIGINT AS n_hard_hits,
       (coalesce(hits.n_hard, 0) > 0
        OR 10000 * coalesce(hits.n_hits, 0) > {SOFT_BP} * base.n_words)
         AS drop_doc
FROM base LEFT JOIN hits ON hits.doc_id = base.doc_id
""",
    tags=("text", "quality", "curation"),
)
def blocklist_terms_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist content filter — the C4 "bad words" gate (Raffel
    et al. 2020 §2.2 drop any page containing a listed word; real
    pipelines soften that to a mass threshold): HARD terms drop a
    document on any occurrence, SOFT terms only when they exceed
    SOFT_BP of the document's words (cross-multiplied integer
    comparison — no float). Reports per-doc hit counts and the
    verdict, so threshold changes can be replayed from the report
    without rescanning.

    Scale shape: the term list is dimension-sized (thousands of terms
    in production) and BROADCAST; tokens join it map-side and collapse
    to per-doc counts before the doc_id shuffle (map-side combine), so
    a blocklisted-word-heavy corpus still ships one row per doc. The
    word-count base reuses the same exploded pass."""
    docs = _docs(spark, sf_dir)
    terms = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(BLOCK_TERMS), "term string, severity int"
        )
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("word"),
    )
    hits = (
        tok.join(terms, tok["word"] == terms["term"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum((F.col("severity") == 2).cast("bigint")).alias("n_hard"),
        )
    )
    base = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.coalesce("n_hard", F.lit(0)).cast("bigint").alias("n_hard_hits"),
        (
            (F.coalesce("n_hard", F.lit(0)) > 0)
            | (
                10000 * F.coalesce("n_hits", F.lit(0))
                > SOFT_BP * F.col("n_words")
            )
        ).alias("drop_doc"),
    )


# --- quality × duplication contingency (r8) -----------------------------------
def quality_dup_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency of the Gopher quality verdict against exact-dup
    membership — the table behind the classic curation question "are
    our duplicates mostly junk, or are we about to dedup away good
    text?" (the C4-vs-Gopher ordering debate is exactly about which
    gate to run first; this measures the interaction on YOUR corpus
    instead of assuming). Cells: (verdict, is_dup) → docs and char
    mass.

    Scale shape: reuses the single-scan gopher feature pass and the
    uniform md5 dup-group aggregate, joined on doc_id (both sides one
    row per doc), output bounded at 4 cells. Oracle composes the
    registered gopher oracle as a CTE — the audit can never drift from
    the gate it measures."""
    feat = _gopher_feat(_docs(spark, sf_dir), "n_chars")
    rules = _gopher_rule_cols()
    verdict = None
    for c in rules.values():
        verdict = c if verdict is None else (verdict & c)
    v = feat.select("doc_id", "n_chars", verdict.alias("verdict"))
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    dups = d.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    flagged = d.join(dups.select("h", F.lit(True).alias("dup")), "h", "left").select(
        "doc_id", F.coalesce("dup", F.lit(False)).alias("is_dup")
    )
    return (
        v.join(flagged, "doc_id")
        .groupBy("verdict", "is_dup")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


from wally_spark.plans.registry import REGISTRY as _REG  # noqa: E402

register(
    "quality_dup_contingency",
    oracle=f"""
WITH gq AS (SELECT doc_id, verdict FROM ({_REG['gopher_rules'].oracle}) t),
d AS (SELECT doc_id, n_chars, md5(text) AS h FROM documents),
dupg AS (SELECT h FROM d GROUP BY h HAVING count(*) >= 2)
SELECT gq.verdict,
       (dupg.h IS NOT NULL) AS is_dup,
       count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS n_chars
FROM gq JOIN d ON d.doc_id = gq.doc_id
LEFT JOIN dupg ON dupg.h = d.h
GROUP BY gq.verdict, (dupg.h IS NOT NULL)
""",
    tags=("text", "quality", "dedup", "report"),
)(quality_dup_contingency)


# --- Benford first-digit DQ audit (r8) ---------------------------------------
# floor(10000 * log10(1 + 1/d)) for d = 1..9 — shared literals so both
# engines cite the same expected distribution.
_BENFORD_BP = (3010, 1760, 1249, 969, 791, 669, 579, 511, 457)
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in enumerate(_BENFORD_BP, start=1)
) + " END"


def events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over event values — the classic
    fabricated-data / instrumentation-bug detector (a synthetic or
    capped metric shows a flat or spiked leading-digit histogram where
    organic magnitudes follow log10(1+1/d)). Per digit 1-9: observed
    count, observed share bp, the Benford expectation bp (shared
    literal table), and the signed deviation.

    Scale shape: ONE codegen scan — the leading digit of the integer
    cents value is pure string/arithmetic expression work — feeding a
    9-group map-side-combined aggregate; output is exactly 9 rows at
    any corpus size. The global total joins back as a 1-row broadcast
    (crossJoin of a scalar aggregate, the user_churn_features
    convention)."""
    return benford_from_counts(benford_digit_counts(_events(spark, sf_dir)))


def benford_digit_counts(events_df: DataFrame) -> DataFrame:
    """(digit, n) leading-digit counts — ASSOCIATIVE, so the streaming
    face (streaming/ops.benford_foreach_batch) persists per-batch
    partials and folds by sum."""
    return (
        events_df.selectExpr(
            "CAST(substring(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT) AS digit"
        )
        .where(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def benford_from_counts(counts: DataFrame) -> DataFrame:
    """Scoring tail shared by the batch lane and the streaming face."""
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .selectExpr(
            "digit",
            "n",
            "CAST((10000 * n) div total AS BIGINT) AS observed_bp",
            f"CAST({_BENFORD_CASE} AS BIGINT) AS expected_bp",
            f"CAST((10000 * n) div total - ({_BENFORD_CASE}) AS BIGINT)"
            " AS delta_bp",
        )
    )


register(
    "events_benford",
    oracle=f"""
WITH e AS (
  SELECT CAST(substring(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM events),
c AS (
  SELECT digit, count(*)::BIGINT AS n FROM e WHERE digit >= 1 GROUP BY digit),
t AS (SELECT sum(n)::BIGINT AS total FROM c)
SELECT digit, n,
       ((10000 * n) // total)::BIGINT AS observed_bp,
       ({_BENFORD_CASE})::BIGINT AS expected_bp,
       ((10000 * n) // total - ({_BENFORD_CASE}))::BIGINT AS delta_bp
FROM c, t
""",
    tags=("events", "quality", "dq"),
)(events_benford)


# --- per-source length-concentration Gini (r9) -------------------------------
@register(
    "source_length_gini",
    oracle="""
WITH r AS (
  SELECT source, n_chars::BIGINT AS x,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS i
  FROM documents)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(x)::BIGINT AS total_chars,
       ((10000 * (2 * sum(i * x) - (count(*) + 1) * sum(x)))
        // nullif(count(*) * sum(x), 0))::BIGINT AS gini_bp
FROM r GROUP BY source
ORDER BY source
""",
    tags=("quality", "mix", "report"),
)
def source_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length concentration (Gini coefficient in
    basis points) — the mix-health diagnostic that distinguishes a
    source of uniform articles (G≈0) from one where a few megadocs
    carry all the token mass (G→1; such sources skew every
    tokens-per-doc budget downstream). Exact integers via the sorted
    rank identity G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), ascending rank
    with deterministic (n_chars, doc_id) tie-break.

    Scale shape: one row_number window per source (the per-key rank
    pattern of events_value_ranks) feeding a source-bounded moment
    aggregate; integer division after the sums, nullif'd for an
    all-empty source. int64 bound: Σi·xᵢ ≤ n²·max_chars — safe to
    ~10⁶ docs/source at 1 MB docs; shard megasources upstream of
    that (the lane's own report flags them)."""
    r = _docs(spark, sf_dir).select(
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("bigint")
        .alias("i"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("x").cast("bigint").alias("total_chars"),
            F.expr(
                "CAST((10000 * (2 * sum(i * x) - (count(1) + 1) * sum(x)))"
                " div nullif(count(1) * sum(x), 0) AS BIGINT)"
            ).alias("gini_bp"),
        )
        .orderBy("source")
    )
