"""Corpus search & lexical-statistics operators — round-7 extensions to
the text surface (SURVEY §2.6; companions to tfidf_top_terms in
analytics.py).

  bm25_rank       Okapi BM25 top-10 documents for a fixed query
  token_pmi       top-20 bigram collocations by pointwise mutual info
  ngram_coverage  5-gram heavy hitters + corpus coverage share
  zipf_slope      per-language Zipf rank-frequency log-log slope

All four have full DuckDB oracles. Per-term float contributions are
integerized (floor ppm / milli) BEFORE any multi-row sum, so every
aggregate the hash sees is associative bigint arithmetic; ln() on
identical double inputs agrees between the engines (tfidf_top_terms
precedent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

BM25_QUERY = ("spark", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
PMI_MIN_COUNT = 5
PMI_TOPK = 20
COV_N = 5  # n-gram width for the coverage report
COV_TOPK = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


def _words(docs: DataFrame, *extra: str) -> DataFrame:
    """(doc_id, term) exploded lowercase words, empties dropped."""
    return docs.select(
        "doc_id",
        *extra,
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("term"),
    )


_WORDS_SQL = """
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                    w -> w <> '')) AS term
  FROM documents
"""


# --- Okapi BM25 -------------------------------------------------------------
_Q_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "bm25_rank",
    oracle=f"""
WITH words AS ({_WORDS_SQL}),
dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS total_w FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS f FROM words
  WHERE term IN ({_Q_IN}) GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS dfreq FROM words
  WHERE term IN ({_Q_IN}) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         floor(1000000 * ln(1 + (s.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5))
               * (tf.f * {BM25_K1 + 1})
               / (tf.f + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl.dl
                                      / (s.total_w / s.n_docs))))::BIGINT AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
)
SELECT doc_id, sum(c)::BIGINT AS score_ppm
FROM contrib GROUP BY doc_id
ORDER BY score_ppm DESC, doc_id LIMIT {BM25_TOPK}
""",
    tags=("search", "text", "ranking"),
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed query — the classic
    probabilistic retrieval score (Robertson/Sparck Jones; k1=1.2,
    b=0.75): per query term, idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    Each term's contribution is floored to integer ppm BEFORE the
    per-doc sum, so the score is an associative bigint sum — hash-exact
    under any shuffle order (a 3-double sum is already order-sensitive
    at the ulp).

    Scale shape: tf is filtered to the query's terms at the explode
    (predicate on the generator output — the shuffled relation carries
    only query-term hits, not the corpus vocabulary); df and the
    (n_docs, total_w) stats are broadcast-sized; the ranking is a
    distributed TakeOrderedAndProject top-k, never a global sort."""
    docs = _docs(spark, sf_dir)
    words = _words(docs)
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_w"),
    )
    hits = words.where(F.col("term").isin(*BM25_QUERY))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("f"))
    df_t = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("dfreq"))
    avgdl = F.col("total_w") / F.col("n_docs")
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                1000000
                * idf
                * (F.col("f") * (BM25_K1 + 1))
                / (
                    F.col("f")
                    + BM25_K1 * ((1 - BM25_B) + BM25_B * F.col("dl") / avgdl)
                )
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c").cast("bigint").alias("score_ppm"))
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(BM25_TOPK)
    )


# --- PMI collocations -------------------------------------------------------
@register(
    "token_pmi",
    oracle=f"""
WITH w AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
big AS (
  SELECT b[1] AS w1, b[2] AS w2, count(*) AS c_xy
  FROM (SELECT unnest(list_transform(range(1, len(words)),
                                     i -> [words[i], words[i + 1]])) AS b
        FROM w WHERE len(words) >= 2)
  GROUP BY w1, w2
),
uni AS (
  SELECT term, count(*) AS c FROM ({_WORDS_SQL}) GROUP BY term
),
tot AS (
  SELECT (SELECT sum(c)::BIGINT FROM uni) AS tu,
         (SELECT sum(c_xy)::BIGINT FROM big) AS tb
)
SELECT b.w1, b.w2, b.c_xy::BIGINT AS c_xy,
       floor(1000 * ln(b.c_xy / (1.0 * t.tb) * t.tu / u1.c * t.tu / u2.c))
         ::BIGINT AS pmi_milli
FROM big b
JOIN uni u1 ON u1.term = b.w1
JOIN uni u2 ON u2.term = b.w2
CROSS JOIN tot t
WHERE b.c_xy >= {PMI_MIN_COUNT}
ORDER BY pmi_milli DESC, b.w1, b.w2 LIMIT {PMI_TOPK}
""",
    tags=("search", "text", "collocation"),
)
def token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information —
    PMI = ln(p(x,y) / (p(x)p(y))), the standard collocation-extraction
    score (Church & Hanks 1990) a tokenizer/phrase-mining pass runs
    over a pretraining corpus. Low-count bigrams (< PMI_MIN_COUNT) are
    dropped first — PMI's known pathology is inflating hapax pairs.

    Exactness: the score is computed in a fixed left-to-right chain of
    IEEE double ops (c_xy/tb · tu/c_x · tu/c_y) — deterministic,
    identical in both engines — then floored to integer milli-nats;
    no float accumulations cross rows. Scale shape: bigram and unigram
    counts are map-side-combined aggregates on uniform keys; the two
    unigram probes are broadcast joins (vocabulary-sized — cap or
    count-threshold the vocab at open-web scale); totals are a 1-row
    broadcast side; the final ranking is a distributed top-k."""
    docs = _docs(spark, sf_dir)
    w = docs.select(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("words")
    )
    bigrams = (
        w.where(F.size("words") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.struct(
                        F.element_at("words", i).alias("w1"),
                        F.element_at("words", (i + 1).cast("int")).alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = _words(docs).groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = big.agg(F.sum("c_xy").cast("bigint").alias("tb")).crossJoin(
        F.broadcast(uni.agg(F.sum("c").cast("bigint").alias("tu")))
    )
    pmi = (
        F.col("c_xy")
        / (1.0 * F.col("tb"))
        * F.col("tu")
        / F.col("c1")
        * F.col("tu")
        / F.col("c2")
    )
    return (
        big.where(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(F.broadcast(uni.withColumnRenamed("c", "c1")), F.col("w1") == F.col("term"))
        .drop("term")
        .join(F.broadcast(uni.withColumnRenamed("c", "c2")), F.col("w2") == F.col("term"))
        .drop("term")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.floor(1000 * F.log(pmi)).cast("bigint").alias("pmi_milli"),
        )
        .orderBy(F.desc("pmi_milli"), "w1", "w2")
        .limit(PMI_TOPK)
    )


# --- n-gram heavy hitters / coverage ---------------------------------------
@register(
    "ngram_coverage",
    oracle=f"""
WITH w AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(
           range(1, len(words) - {COV_N - 2}),
           i -> {" || ' ' || ".join(f"words[i+{k}]" for k in range(COV_N))}
         )) AS gram
  FROM w WHERE len(words) >= {COV_N}
),
counts AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
tot AS (
  SELECT sum(greatest(len(words) - {COV_N - 1}, 0))::BIGINT AS total FROM w
)
SELECT c.gram, c.c::BIGINT AS c,
       floor(1000000 * (c.c / (1.0 * t.total)))::BIGINT AS coverage_ppm
FROM counts c CROSS JOIN tot t
ORDER BY c DESC, gram LIMIT {COV_TOPK}
""",
    tags=("search", "text", "heavy-hitters"),
)
def ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus 5-gram heavy hitters: the top-20 most repeated 5-word
    sequences with their share (ppm) of ALL 5-gram occurrences — the
    "what boilerplate dominates this crawl" report that motivates the
    dedup_substring pass (a license header's coverage share is the
    fraction of corpus positions it wastes).

    Scale shape: gram expansion is a flat generator (non-distinct, so
    skew lands in the count aggregate where map-side combine absorbs
    it — a hot gram costs one partial row per task); the occurrence
    total is computed from document lengths (one row per doc, no
    second gram expansion); ranking is a distributed top-k. The exact
    count here is the audit twin of a count-min/SpaceSaving sketch at
    100 TB."""
    docs = _docs(spark, sf_dir)
    w = docs.select(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("words")
    )
    grams = w.where(F.size("words") >= COV_N).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - (COV_N - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("words", (i + k).cast("int")) for k in range(COV_N)],
                ),
            )
        ).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    tot = w.agg(
        F.sum(F.greatest(F.size("words") - (COV_N - 1), F.lit(0)))
        .cast("bigint")
        .alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "gram",
            F.col("c").cast("bigint").alias("c"),
            F.floor(1000000 * (F.col("c") / (1.0 * F.col("total"))))
            .cast("bigint")
            .alias("coverage_ppm"),
        )
        .orderBy(F.desc("c"), "gram")
        .limit(COV_TOPK)
    )


# --- Zipf rank-frequency slope ----------------------------------------------
@register(
    "zipf_slope",
    oracle=f"""
WITH counts AS (
  SELECT lang, term, count(*) AS c
  FROM (SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
                                        w -> w <> '')) AS term
        FROM documents)
  GROUP BY lang, term
),
pts AS (
  SELECT lang,
         floor(1000 * ln(row_number() OVER (PARTITION BY lang
                                            ORDER BY c DESC, term)))::BIGINT AS x,
         floor(1000 * ln(c))::BIGINT AS y
  FROM counts
),
sums AS (
  SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
  FROM pts GROUP BY lang
)
SELECT lang, n AS n_terms,
       floor(1000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx))::BIGINT
         AS slope_milli
FROM sums
""",
    tags=("search", "text", "stats"),
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf's-law fit: the least-squares slope of
    ln(frequency) against ln(rank) over the language's term
    distribution (natural text sits near −1; a slope far off flags
    synthetic/spam segments — a corpus-quality diagnostic at the
    language granularity).

    Exactness: rank and frequency logs are floored to integer
    milli-nats per term, so the regression moments (sx, sy, sxx, sxy)
    are associative bigint sums and the slope is ONE deterministic
    double division at the end. Scale shape: term counts map-side
    combine; the rank window partitions by language over the
    vocabulary-sized aggregate (bounded by vocabulary, not corpus
    mass — cap the vocab by count threshold at open-web scale, which
    also keeps the bigint moments within range)."""
    docs = _docs(spark, sf_dir)
    counts = (
        _words(docs, "lang")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("c"), "term")
    pts = counts.select(
        "lang",
        F.floor(1000 * F.log(F.row_number().over(w_rank))).cast("bigint").alias("x"),
        F.floor(1000 * F.log("c")).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    slope = (
        1000.0
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return sums.select(
        "lang",
        F.col("n").alias("n_terms"),
        F.floor(slope).cast("bigint").alias("slope_milli"),
    )


# --- vocabulary coverage curve (r9) ------------------------------------------
COVERAGE_THRESHOLDS = (1, 2, 4, 8, 16, 32, 64, 128)


@register(
    "vocab_coverage_curve",
    oracle="WITH tok AS (\n"
    "  SELECT unnest(list_filter(string_split(lower(text), ' '),"
    " x -> x <> '')) AS word FROM documents),\n"
    "wc AS (SELECT word, count(*)::BIGINT AS c FROM tok GROUP BY word),\n"
    "tot AS (SELECT sum(c)::BIGINT AS total FROM wc)\n"
    + "\nUNION ALL\n".join(
        f"""SELECT {f}::BIGINT AS min_count,
       (SELECT count(*) FROM wc WHERE c >= {f})::BIGINT AS n_vocab,
       (SELECT coalesce(sum(c), 0) FROM wc WHERE c >= {f})::BIGINT
         AS covered_tokens,
       ((10000 * (SELECT coalesce(sum(c), 0) FROM wc WHERE c >= {f}))
        // (SELECT total FROM tot))::BIGINT AS coverage_bp"""
        for f in COVERAGE_THRESHOLDS
    )
    + "\nORDER BY min_count",
    tags=("text", "tokenizer", "vocab"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve — the vocab-sizing question every
    tokenizer build answers first ("a vocab of words seen >= f times
    covers X% of corpus tokens"): for each frequency threshold, the
    surviving vocabulary size, the token mass it covers, and coverage
    in basis points. Read with zipf_slope (same module): together they
    say how fat the tail a byte-fallback tokenizer must absorb.

    Scale shape: corpus collapses to (word, count) ONCE (map-side
    combined); all eight thresholds evaluate as conditional integer
    sums in ONE aggregate over the vocab (no per-threshold scans, no
    global word ordering — threshold coverage needs no rank, which is
    what keeps this exact AND distributed); the 8-row unpivot is a
    stack over the 1-row aggregate. Division after the sums."""
    tok = _docs(spark, sf_dir).select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("word")
    )
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    aggs = [F.sum("c").cast("bigint").alias("total")]
    for f in COVERAGE_THRESHOLDS:
        aggs.append(
            F.count(F.when(F.col("c") >= f, 1)).cast("bigint").alias(f"nv_{f}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("c") >= f, F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias(f"cov_{f}")
        )
    one = wc.agg(*aggs)
    stack = ", ".join(
        f"{f}L, nv_{f}, cov_{f}" for f in COVERAGE_THRESHOLDS
    )
    return one.selectExpr(
        f"stack({len(COVERAGE_THRESHOLDS)}, {stack})"
        " AS (min_count, n_vocab, covered_tokens)",
        "total",
    ).selectExpr(
        "min_count",
        "n_vocab",
        "covered_tokens",
        "CAST((10000 * covered_tokens) div total AS BIGINT) AS coverage_bp",
    ).orderBy("min_count")


# --- Kneser-Ney smoothed bigram LM (r9) --------------------------------------
# Interpolated KN with absolute discount D = 3/4 kept RATIONAL so both
# engines agree bit-for-bit:
#   P_KN(w2|w1) = max(c-D,0)/c(w1.) + D*N1+(w1.)/c(w1.) * N1+(.w2)/T
# with c >= 1 in the emitted rows, max(c-D,0) = c - 3/4, so
#   P_KN * 1000 = 1000*((4c-3)*T + 3*nfol*nprec) / (4*cw1*T)
# — one exact integer floor-division. int64 bound: (4c-3)*T*1000 with
# c <= 10^6 and T <= 10^7 needs 4*10^16 < 2^63 (safe through ~sf100;
# past that, divide by T first at the cost of 1 milli ulp).
KN_TOPK = 40


@register(
    "text_lm_kneser_ney",
    oracle=f"""
WITH w AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents),
big AS (
  SELECT b[1] AS w1, b[2] AS w2, count(*)::BIGINT AS c_xy
  FROM (SELECT unnest(list_transform(range(1, len(words)),
                                     i -> [words[i], words[i + 1]])) AS b
        FROM w WHERE len(words) >= 2)
  GROUP BY w1, w2),
pre AS (
  SELECT w1, sum(c_xy)::BIGINT AS c_w1, count(*)::BIGINT AS nfol
  FROM big GROUP BY 1),
fol AS (SELECT w2, count(*)::BIGINT AS nprec FROM big GROUP BY 1),
t AS (SELECT count(*)::BIGINT AS bt FROM big)
SELECT w1, w2, c_xy, c_w1, nfol, nprec,
       ((1000 * ((4 * c_xy - 3) * bt + 3 * nfol * nprec))
        // (4 * c_w1 * bt))::BIGINT AS pkn_milli,
       ((3000 * nfol) // (4 * c_w1))::BIGINT AS lambda_milli,
       ((1000 * nprec) // bt)::BIGINT AS pcont_milli
FROM big JOIN pre USING (w1) JOIN fol USING (w2), t
ORDER BY c_xy DESC, w1, w2
LIMIT {KN_TOPK}
""",
    tags=("text", "lm", "ngram"),
)
def text_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (the modified-counts smoothing
    behind KenLM and every production n-gram LM) over the corpus, kept
    EXACT: with discount D = 3/4 rational, P_KN(w2|w1), the backoff
    weight lambda(w1) = D*N1+(w1.)/c(w1.), and the continuation
    probability N1+(.w2)/|bigram types| are all single integer
    floor-divisions in millis — no floats, no libm, engine-identical.
    Emits the top-{KN_TOPK} bigrams by count with their counts,
    prefix mass, follower/preceder fan-outs, and all three
    probabilities. text_lm_bigram is MLE-shaped; this is the smoothed
    estimator a real LM deploys (unseen-bigram mass redistributed by
    continuation counts).

    Scale shape: the bigram stream is codegen (posexplode + lead);
    counts aggregate on the uniform (w1,w2) key; the prefix/follower
    tables ride w1- and w2-keyed joins (uniform); the 1-row type total
    broadcasts; the readout is TakeOrdered top-{KN_TOPK}, never a
    global sort."""
    from pyspark.sql import Window as W

    docs = fan_out(_docs(spark, sf_dir), "doc_id")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words")).where(F.size("words") >= 2)
    toks = d.select("doc_id", F.posexplode("words").alias("p0", "w"))
    win = W.partitionBy("doc_id").orderBy("p0")
    nxt = F.lead("w", 1).over(win)
    big = (
        toks.select(F.col("w").alias("w1"), nxt.alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
    )
    pre = big.groupBy("w1").agg(
        F.sum("c_xy").cast("bigint").alias("c_w1"),
        F.count(F.lit(1)).cast("bigint").alias("nfol"),
    )
    fol = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("nprec")
    )
    t = big.agg(F.count(F.lit(1)).cast("bigint").alias("bt"))
    return (
        big.join(pre, "w1")
        .join(fol, "w2")
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "w1",
            "w2",
            "c_xy",
            "c_w1",
            "nfol",
            "nprec",
            "CAST((1000 * ((4 * c_xy - 3) * bt + 3 * nfol * nprec))"
            " div (4 * c_w1 * bt) AS BIGINT) AS pkn_milli",
            "CAST((3000 * nfol) div (4 * c_w1) AS BIGINT) AS lambda_milli",
            "CAST((1000 * nprec) div bt AS BIGINT) AS pcont_milli",
        )
        .orderBy(F.desc("c_xy"), "w1", "w2")
        .limit(KN_TOPK)
    )
