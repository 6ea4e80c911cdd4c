"""Web-corpus curation lanes — line/paragraph-granular dedup (the
CCNet shape) and URL-level filtering/canonicalization (r7 verdict item
5). The reference engine has no text surface (machida computations are
generic); these extend SURVEY §2.6 in the spirit of
machida/lib/wallaroo/__init__.py:270 `computation_multi`.

The synthetic documents table carries no URL column, so the URL lanes
derive one deterministically from (source, md5(doc_id) nibble) — the
same convention as host_curation_report (plans/quality.py) — with
per-nibble scheme/case/query variants so canonicalization has real
work to do. With a real crawl, substitute the stored URL; every plan
shape is unchanged.

All scores integer-exact (basis points via bigint division); every
query has a full DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

SEG_N = 10  # words per dedup segment ("line" in a newline-free corpus)
CATALOG_K = 20  # boilerplate-catalog size


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


def _words_col():
    return F.filter(F.split(F.lower("text"), " "), lambda w: w != "")


# Shared SQL: (doc_id, source, p, h, nw) — one row per SEG_N-word
# segment, identified by md5 of its space-joined words. Documents are
# segmented GREEDILY from position 1 (trailing partial kept), the line
# analogue for a corpus without newlines; with newline-structured text,
# split on newline instead — identical downstream plan.
_SEGMENTS_SQL = f"""
  SELECT doc_id, source, i AS p,
         md5(array_to_string(
           list_slice(words, (i-1)*{SEG_N}+1, least(i*{SEG_N}, len(words))),
           ' ')) AS h,
         (least(i*{SEG_N}, len(words)) - (i-1)*{SEG_N})::BIGINT AS nw
  FROM (SELECT doc_id, source,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        FROM documents) w,
       unnest(range(1, (len(words) + {SEG_N} - 1) // {SEG_N} + 1)) AS t(i)
  WHERE len(words) >= 1
"""


def segment_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, source, p, h, nw): SEG_N-word segments with md5
    identity — built with ONE transform over a per-doc index sequence
    (no token-level explode: only ceil(len/SEG_N) rows leave the scan,
    each carrying a bounded md5). Tolerates a missing ``source``
    column (the streaming lane's batches need not carry one)."""
    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit(""))
    d = docs.select("doc_id", "source", _words_col().alias("words")).where(
        F.size("words") >= 1
    )
    seg = F.transform(
        F.sequence(
            F.lit(1),
            F.expr(f"cast((size(words) + {SEG_N - 1}) div {SEG_N} as int)"),
        ),
        lambda i: F.struct(
            i.alias("p"),
            F.md5(
                F.array_join(
                    F.slice("words", (i - 1) * SEG_N + 1, SEG_N), " "
                )
            ).alias("h"),
            F.size(F.slice("words", (i - 1) * SEG_N + 1, SEG_N))
            .cast("bigint")
            .alias("nw"),
        ),
    )
    return d.select(
        "doc_id", "source", F.explode(seg).alias("s")
    ).select("doc_id", "source", "s.p", "s.h", "s.nw")


@register(
    "dedup_lines",
    oracle=f"""
WITH seg AS ({_SEGMENTS_SQL}),
r AS (
  SELECT doc_id, nw,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
  FROM seg
)
SELECT doc_id,
       count(*)::BIGINT AS n_segs,
       sum(nw)::BIGINT AS n_words,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped_segs,
       sum(CASE WHEN rn > 1 THEN nw ELSE 0 END)::BIGINT AS dropped_words,
       (10000 * sum(CASE WHEN rn > 1 THEN nw ELSE 0 END) // sum(nw))::BIGINT
         AS drop_bp
FROM r GROUP BY doc_id
""",
    tags=("dedup", "curation", "web"),
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/paragraph-granular corpus dedup — the CCNet shape (Wenzek
    et al. 2020): every SEG_N-word segment keeps only its FIRST corpus
    occurrence (first = lowest (doc_id, position)); later occurrences
    are dropped wherever they appear. Catches the boilerplate
    paragraphs, license blocks, and navigation chrome that doc-level
    dedup keeps (the doc differs, the paragraph doesn't). Per doc:
    segment count, word mass, dropped segments/words, and the
    basis-point drop rate — the per-doc summary a CCNet-style rewrite
    pass consumes.

    Scale shape: segmentation emits ceil(len/SEG_N) rows per doc (no
    token explode); first-occurrence resolution is a TWO-PHASE
    min(struct(doc_id, p)) aggregate on the segment hash — map-side
    combined, so a million-occurrence boilerplate segment costs one
    row per upstream task in the shuffle, never O(occurrences) — and
    the flag returns through a SALTED join (hot segments are this
    operator's target; their occurrences scatter across salts instead
    of one reducer). One doc-keyed aggregate finishes. No windows over
    unbounded partitions. The oracle spells first-occurrence as a
    per-hash row_number window — fine at oracle scale, rejected for
    the engine (hot hash = one task)."""
    return line_dedup_report(segment_docs(fan_out(_docs(spark, sf_dir), "doc_id")))


def line_dedup_report(ex: DataFrame) -> DataFrame:
    """dedup_lines' core over pre-built segments (segment_docs):
    first-occurrence flags via two-phase min(struct) + salted join,
    per-doc drop report. Shared with the streaming persistent-corpus
    lane (streaming/ops.linededup_against_corpus_foreach_batch)."""
    from wally_spark.operators.skew import salted_join

    firsts = ex.groupBy("h").agg(
        F.min(F.struct("doc_id", "p")).alias("first")
    )
    flagged = salted_join(ex, firsts, "h", n_salts=8).withColumn(
        "dropped",
        (F.struct("doc_id", "p") != F.col("first")).cast("bigint"),
    )
    return _line_report(flagged)


def _line_report(flagged: DataFrame) -> DataFrame:
    """(doc_id, nw, dropped) segment flags → per-doc drop report."""
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("dropped").cast("bigint").alias("n_dropped_segs"),
        F.sum(F.col("dropped") * F.col("nw"))
        .cast("bigint")
        .alias("dropped_words"),
        F.expr("10000 * sum(dropped * nw) div sum(nw)")
        .cast("bigint")
        .alias("drop_bp"),
    )


@register(
    "line_dup_catalog",
    oracle=f"""
WITH seg AS ({_SEGMENTS_SQL})
SELECT h AS seg_hash,
       count(*)::BIGINT AS n_occurrences,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(DISTINCT source)::BIGINT AS n_sources
FROM seg
GROUP BY h
HAVING count(*) >= 2
ORDER BY n_occurrences DESC, seg_hash
LIMIT {CATALOG_K}
""",
    tags=("dedup", "curation", "web", "report"),
)
def line_dup_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate catalog: the CATALOG_K most-repeated segments
    corpus-wide with occurrence, document, and source spread — the
    artifact a curation team actually reads (is the top repeat a
    license header spanning 40 sources, or one site's nav bar?) and
    the natural blocklist seed for dedup_lines' next run.

    Scale shape: one map-side-combined aggregate on the segment hash
    (count + two count-distincts, each two-phase), then a global top-K
    by TakeOrdered (never a full sort). Deterministic tiebreak on the
    hash itself."""
    ex = segment_docs(fan_out(_docs(spark, sf_dir), "doc_id"))
    return (
        ex.groupBy(F.col("h").alias("seg_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .where(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), "seg_hash")
        .limit(CATALOG_K)
    )


# --- URL lanes ---------------------------------------------------------------
# Robots-style path-prefix rules keyed by the synthetic host nibble:
# nibbles 0-3 block everything under /p/; 4-7 block /p/1* but re-allow
# /p/12* (longest-prefix precedence, allow wins rank ties by the +1);
# 8-f carry no rule (default allow). rank = 2*len(prefix) + allow.
_RULES = (
    [(n, "/p/", False) for n in "0123"]
    + [(n, "/p/1", False) for n in "4567"]
    + [(n, "/p/12", True) for n in "4567"]
)

_RULES_SQL = ", ".join(
    f"('{n}', '{p}', {'true' if a else 'false'})" for n, p, a in _RULES
)


@register(
    "url_blocklist",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         substr(md5(doc_id::VARCHAR), 1, 1) AS nib,
         '/p/' || doc_id::VARCHAR AS path
  FROM documents
),
r (nib, prefix, allow) AS (VALUES {_RULES_SQL}),
m AS (
  SELECT d.doc_id, d.source,
         coalesce(
           arg_max(r.allow, 2 * length(r.prefix)
                            + CASE WHEN r.allow THEN 1 ELSE 0 END),
           true) AS allowed
  FROM d LEFT JOIN r
    ON r.nib = d.nib AND starts_with(d.path, r.prefix)
  GROUP BY d.doc_id, d.source
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN allowed THEN 0 ELSE 1 END)::BIGINT AS n_blocked,
       (10000 * sum(CASE WHEN allowed THEN 0 ELSE 1 END) // count(*))::BIGINT
         AS blocked_bp
FROM m GROUP BY source
""",
    tags=("curation", "web", "quality"),
)
def url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL blocklist / robots-style filter — the crawl-hygiene gate
    every web-corpus pipeline runs before content ever reaches quality
    scoring (RefinedWeb §3.1 "URL filtering"): per-host path-prefix
    rules with robots.txt precedence (the LONGEST matching prefix
    wins; an allow rule beats a block rule of equal length), default
    allow when no rule matches. Reports per-source document and
    blocked counts in basis points — the mix-impact summary a curation
    run checks before committing a blocklist change. Composes with
    host_curation_report (same synthetic host derivation).

    Scale shape: the rule set is dimension-sized (thousands of rules
    for a real blocklist) and BROADCAST; matching is an equi-join on
    the host nibble plus a startswith residual, precedence is ONE
    two-phase max(struct(rank, allow)) aggregate per doc (rank =
    2*len + allow, unique per matched rule set — no window), then a
    source-bounded rollup. One shuffle on doc_id, one on source."""
    docs = _docs(spark, sf_dir)
    rules = F.broadcast(
        docs.sparkSession.createDataFrame(
            _RULES, "nib string, prefix string, allow boolean"
        )
    )
    d = docs.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("nib"),
        F.concat(F.lit("/p/"), F.col("doc_id").cast("string")).alias("path"),
    )
    m = (
        d.join(
            rules,
            (d["nib"] == rules["nib"])
            & F.col("path").startswith(rules["prefix"]),
            "left",
        )
        .groupBy("doc_id", "source")
        .agg(
            F.coalesce(
                F.max(
                    F.struct(
                        (2 * F.length("prefix") + F.col("allow").cast("int"))
                        .alias("rank"),
                        F.col("allow"),
                    )
                )["allow"],
                F.lit(True),
            ).alias("allowed")
        )
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((~F.col("allowed")).cast("bigint"))
        .cast("bigint")
        .alias("n_blocked"),
        F.expr(
            "10000 * sum(cast(not allowed as bigint)) div count(1)"
        )
        .cast("bigint")
        .alias("blocked_bp"),
    )


# Tracking query parameters stripped by canonicalization — the public
# canonical-URL convention (utm_* campaign tags, click identifiers).
_TRACKING_RE = "^(utm_[a-z]+|ref|fbclid|gclid)="


def canonical_url_col(raw):
    """Canonical form of a raw-URL column — lowercase scheme/host/path,
    fragment dropped, trailing slash dropped, tracking query params
    (utm_*, ref, fbclid, gclid) stripped while content-bearing params
    survive. Pure per-row string codegen; shared by the batch
    ``url_canonical_dedup`` lane and the streaming corpus face
    (streaming/ops.urldedup_against_corpus_foreach_batch) so the two
    can never canonicalize differently."""
    no_frag = F.split(raw, "#")[0]
    base = F.regexp_replace(F.lower(F.split(no_frag, "\\?")[0]), "/$", "")
    qs = F.coalesce(F.try_element_at(F.split(no_frag, "\\?"), F.lit(2)), F.lit(""))
    kept_params = F.array_join(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        ),
        "&",
    )
    return F.concat(
        base,
        F.coalesce(
            F.concat(F.lit("?"), F.nullif(kept_params, F.lit(""))),
            F.lit(""),
        ),
    )


def url_keeper_report(canon: DataFrame) -> DataFrame:
    """Keeper resolution over a (doc_id, canon_url) frame: two-phase
    min/count aggregate on canon_url joined back on the same uniform
    key — the batch lane's exact tail, shared with the streaming
    equivalence test."""
    groups = canon.groupBy("canon_url").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_aliases"),
    )
    return canon.join(groups, "canon_url").select(
        "doc_id",
        "canon_url",
        (F.col("doc_id") == F.col("keep_id")).alias("keeper"),
        "n_aliases",
    )


@register(
    "url_canonical_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         substr(md5(doc_id::VARCHAR), 1, 1) AS nib,
         (doc_id % 97)::VARCHAR AS page
  FROM documents
),
raw AS (
  SELECT doc_id, source,
         (CASE WHEN nib BETWEEN '0' AND '7' THEN 'https' ELSE 'HTTPS' END)
         || '://'
         || (CASE WHEN nib IN ('1','3','5','7','9','b','d','f')
                  THEN upper(source) ELSE source END) || '.example.com'
         || '/page/' || page
         || (CASE WHEN nib IN ('0','8') THEN '/' ELSE '' END)
         || (CASE WHEN nib IN ('2','3','a','b')
                  THEN '?utm_source=feed&id=' || page
                  WHEN nib IN ('4','5','c','d')
                  THEN '?ref=' || doc_id::VARCHAR
                  ELSE '' END)
         || (CASE WHEN nib IN ('6','7','e','f') THEN '#sec' ELSE '' END)
           AS raw_url
  FROM d
),
canon AS (
  SELECT doc_id, source, raw_url,
         regexp_replace(
           lower(string_split(string_split(raw_url, '#')[1], '?')[1]),
           '/$', '')
         || coalesce('?' || nullif(array_to_string(list_filter(
              string_split(
                coalesce(string_split(string_split(raw_url, '#')[1], '?')[2],
                          ''),
                '&'),
              p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')),
              '&'), ''), '') AS canon_url
  FROM raw
)
SELECT doc_id, canon_url,
       (doc_id = min(doc_id) OVER (PARTITION BY canon_url)) AS keeper,
       count(*) OVER (PARTITION BY canon_url)::BIGINT AS n_aliases
FROM canon
""",
    tags=("dedup", "curation", "web"),
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the recrawl-collapse step (the
    same page fetched as http/HTTPS, with utm_* campaign tags, with a
    fragment, or with a trailing slash is ONE document): lowercase
    scheme+host+path, drop the fragment, drop a trailing slash, strip
    TRACKING query params (utm_*, ref, fbclid, gclid) while KEEPING
    content-bearing ones (?id= survives), then keep the lowest doc_id
    per canonical URL. Emits every doc with its canonical form, keeper
    verdict, and alias-group size — the rewrite map a crawl-merge job
    applies.

    Scale shape: canonicalization is pure per-row string codegen (two
    splits, one filter-rejoin, one regexp) in the scan; keeper
    resolution is a two-phase min aggregate on canon_url joined back
    on the same uniform key (alias groups are recrawl-bounded — a few
    variants per page, never corpus-sized); no windows. The oracle
    spells keeper as a window — oracle-scale only."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("nib"),
        (F.col("doc_id") % 97).cast("string").alias("page"),
    )
    nib = F.col("nib")
    raw = d.select(
        "doc_id",
        F.concat(
            F.when(nib.between("0", "7"), "https").otherwise("HTTPS"),
            F.lit("://"),
            F.when(
                nib.isin(*"13579bdf"), F.upper("source")
            ).otherwise(F.col("source")),
            F.lit(".example.com/page/"),
            F.col("page"),
            F.when(nib.isin("0", "8"), "/").otherwise(""),
            F.when(
                nib.isin(*"23ab"),
                F.concat(F.lit("?utm_source=feed&id="), F.col("page")),
            )
            .when(
                nib.isin(*"45cd"),
                F.concat(F.lit("?ref="), F.col("doc_id").cast("string")),
            )
            .otherwise(""),
            F.when(nib.isin(*"67ef"), "#sec").otherwise(""),
        ).alias("raw_url"),
    )
    canon = raw.select(
        "doc_id", canonical_url_col(F.col("raw_url")).alias("canon_url")
    )
    return url_keeper_report(canon)


# --- corpus novelty curve (r8) -----------------------------------------------
NOVELTY_SLICES = 10  # crawl-order slices


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH bounds AS (
  SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
ds AS (
  SELECT doc_id,
         ((doc_id - mn) * {NOVELTY_SLICES} // (mx - mn + 1))::BIGINT AS slice
  FROM documents, bounds),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(words) - 1, 1)),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        FROM documents)
  WHERE len(words) >= 3),
pairs AS (
  SELECT DISTINCT s.shingle, d.slice
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled) s
  JOIN ds d USING (doc_id)),
firsts AS (
  SELECT shingle, min(slice) AS s0 FROM pairs GROUP BY shingle),
per_slice AS (
  SELECT slice, count(*)::BIGINT AS n_shingles FROM pairs GROUP BY slice),
new_per_slice AS (
  SELECT s0 AS slice, count(*)::BIGINT AS n_new FROM firsts GROUP BY s0),
docs_per_slice AS (
  SELECT slice, count(*)::BIGINT AS n_docs FROM ds GROUP BY slice)
SELECT d.slice, d.n_docs, p.n_shingles,
       coalesce(n.n_new, 0)::BIGINT AS n_new,
       ((10000 * coalesce(n.n_new, 0)) // p.n_shingles)::BIGINT AS novelty_bp
FROM docs_per_slice d
JOIN per_slice p ON p.slice = d.slice
LEFT JOIN new_per_slice n ON n.slice = d.slice
""",
    tags=("curation", "web", "novelty"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve — the diminishing-returns report for data
    collection: order the corpus by doc_id ("crawl order"), cut it
    into NOVELTY_SLICES equal-width id slices, and for each slice
    report how many of its distinct 3-word shingles appear here for
    the FIRST time (no earlier slice contains them). A flattening
    novelty_bp curve says the next crawl increment mostly re-collects
    known text — the signal to stop paying for a source (same shingle
    vocabulary as dedup_minhash, so the curve is consistent with what
    the near-dedup stack will later remove).

    Scale shape: slice assignment is a broadcast of ONE scalar
    min/max row; shingle work is distinct (shingle, slice) pairs —
    a hash shuffle keyed by the (uniform) shingle — then a
    shingle-keyed min and three |slices|-bounded aggregates joined
    broadcast. No windows, no per-doc sorts; the heavy relation is
    touched exactly twice (pairs → per-slice count, pairs → firsts),
    both map-side combined."""
    from wally_spark.plans.dedup import shingles_of

    docs = _docs(spark, sf_dir)
    bounds = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    ds = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "text",
        F.expr(
            f"cast((doc_id - mn) * {NOVELTY_SLICES} div (mx - mn + 1) as bigint)"
        ).alias("slice"),
    )
    pairs = (
        shingles_of(ds.select("doc_id", "text"))
        .join(ds.select("doc_id", "slice"), "doc_id")
        .select("shingle", "slice")
        .distinct()
    )
    firsts = pairs.groupBy("shingle").agg(F.min("slice").alias("s0"))
    per_slice = pairs.groupBy("slice").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    new_per_slice = firsts.groupBy(F.col("s0").alias("slice")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    docs_per_slice = ds.groupBy("slice").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        docs_per_slice.join(per_slice, "slice")
        .join(F.broadcast(new_per_slice), "slice", "left")
        .select(
            "slice",
            "n_docs",
            "n_shingles",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.floor(
                (10000 * F.coalesce("n_new", F.lit(0))) / F.col("n_shingles")
            )
            .cast("bigint")
            .alias("novelty_bp"),
        )
    )
