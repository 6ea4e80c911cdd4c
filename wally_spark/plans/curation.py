"""Corpus-curation analysis operators over `documents` — the quality /
contamination / packing surface a pretraining-data pipeline runs beyond
dedup (SURVEY §2.6 extensions; the reference has no text surface, these
are engine extensions in the spirit of machida's computations:
machida/lib/wallaroo/__init__.py:270 `computation_multi`).

All scores are integer-exact (basis points via bigint division, counts)
except the entropy query, whose float is floored to centibits the same
way cosine scores floor to basis points. Every query has a full DuckDB
oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import fan_out, load_tables

CHUNK = 64
STRIDE = 48
HOLDOUT_MOD = 10  # doc_id % 10 == 7 -> designated benchmark/holdout doc
SHINGLE_N = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(load_tables(spark, sf_dir)["documents"], "doc_id")


def _words_col():
    return F.filter(F.split(F.lower("text"), " "), lambda w: w != "")


@register(
    "text_repetition",
    oracle="""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT doc_id, unnest(words) AS word FROM w),
wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
topw AS (SELECT doc_id, max(c) AS topc, sum(c) AS n_words FROM wc GROUP BY doc_id),
tri AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(words) - 1, 1)),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS tris
  FROM w WHERE len(words) >= 3
)
SELECT t.doc_id,
       topw.n_words::BIGINT AS n_words,
       ((10000 * len(list_distinct(t.tris))) // len(t.tris))::BIGINT AS distinct_tri_bp,
       ((10000 * topw.topc) // topw.n_words)::BIGINT AS top_word_share_bp
FROM tri t JOIN topw ON t.doc_id = topw.doc_id
""",
    tags=("text", "curation", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring — the boilerplate/spam gate (C4-style): the
    distinct-trigram ratio catches copy-paste loops, the top-word share
    catches keyword stuffing. Integer basis points (bigint div) so both
    engines agree exactly. One explode+groupBy for word counts (codegen,
    map-side combine) joined to a no-shuffle array pass for trigram
    distinctness."""
    docs = _docs(spark, sf_dir).select("doc_id", _words_col().alias("words"))
    tok = docs.select("doc_id", F.explode("words").alias("word"))
    wc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    topw = wc.groupBy("doc_id").agg(
        F.max("c").alias("topc"), F.sum("c").alias("n_words")
    )
    tris = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("words") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("words", i),
            F.element_at("words", i + 1),
            F.element_at("words", i + 2),
        ),
    )
    tri = (
        docs.where(F.size("words") >= 3)
        .select("doc_id", tris.alias("tris"))
        .select(
            "doc_id",
            F.size("tris").cast("bigint").alias("n_tris"),
            F.size(F.array_distinct("tris")).cast("bigint").alias("n_distinct"),
        )
    )
    return tri.join(topw, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.expr("(10000 * n_distinct) div n_tris").alias("distinct_tri_bp"),
        F.expr("(10000 * topc) div n_words").alias("top_word_share_bp"),
    )


@register(
    "text_word_entropy",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
h AS (
  SELECT doc_id, sum(c)::BIGINT AS n_words,
         log2(sum(c)) - sum(c * log2(c)) / sum(c) AS ent
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_words, floor(100.0 * ent)::BIGINT AS entropy_cb
FROM h
""",
    tags=("text", "curation", "quality"),
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-distribution entropy — the cheap perplexity
    proxy for quality filtering (low entropy = repetitive/templated
    text). Computed from grouped counts as H = log2(N) - Σ c·log2(c)/N
    so both engines take logs of INTEGERS (identical doubles) and only
    the final sum is float, floored to centibits like cosine floors to
    basis points. One explode + two codegen aggregations."""
    tok = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_words_col()).alias("word"))
    )
    wc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            (
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
            ).alias("ent"),
        )
        .select(
            "doc_id",
            "n_words",
            F.floor(100.0 * F.col("ent")).cast("bigint").alias("entropy_cb"),
        )
    )


_SHINGLE5_SQL = f"""
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(words) - {SHINGLE_N - 2}, 1)),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
                words[i+3] || ' ' || words[i+4])) AS shingles
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
        FROM documents)
  WHERE len(words) >= {SHINGLE_N}
"""


@register(
    "decontaminate_holdout",
    oracle=f"""
WITH sh AS ({_SHINGLE5_SQL}),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
hold AS (SELECT shingle, doc_id AS h_doc FROM ex WHERE doc_id % {HOLDOUT_MOD} = 7),
train AS (SELECT doc_id, shingle FROM ex WHERE doc_id % {HOLDOUT_MOD} <> 7)
SELECT t.doc_id,
       count(DISTINCT t.shingle) AS n_shared_shingles,
       count(DISTINCT h.h_doc) AS n_holdout_docs
FROM train t JOIN hold h ON t.shingle = h.shingle
GROUP BY t.doc_id
""",
    tags=("text", "curation", "contamination"),
)
def decontaminate_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — find training documents that share
    5-gram shingles with a designated holdout/benchmark subset (here
    doc_id ≡ 7 mod 10; in production the eval suites). The join is
    shingle-keyed (uniform hash, one shuffle) and the holdout side is a
    small fraction, so at 100 TB the candidate side broadcasts or
    bucket-joins; never an all-pairs document comparison."""
    docs = _docs(spark, sf_dir).select("doc_id", _words_col().alias("words"))
    sh5 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("words") - (SHINGLE_N - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at("words", i + k) for k in range(SHINGLE_N)],
            ),
        )
    )
    ex = (
        docs.where(F.size("words") >= SHINGLE_N)
        .select("doc_id", F.explode(sh5).alias("shingle"))
    )
    hold = ex.where(F.col("doc_id") % HOLDOUT_MOD == 7).select(
        "shingle", F.col("doc_id").alias("h_doc")
    )
    train = ex.where(F.col("doc_id") % HOLDOUT_MOD != 7)
    return (
        train.join(hold, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("h_doc").alias("n_holdout_docs"),
        )
    )


# --- minhash-band decontamination twin (r10) ----------------------------------
# The Gopher appendix (Rae et al. 2021 §A2) decontaminates by n-gram
# MinHash overlap against the eval suites rather than exact shingle
# intersection — the band-candidate variant catches near-verbatim
# contamination (light edits, whitespace drift) the exact 5-gram join
# (decontaminate_holdout) misses, at candidate cost instead of
# all-shingles cost.
DECON_T_BP = 5000  # >= 4/8 matching minhashes flags contamination


def _decon_minhash_oracle() -> str:
    from wally_spark.plans.dedup import (
        _MH_SIG_SQL,
        _SHINGLES_SQL,
        BAND_ROWS,
        MAX_BUCKET,
        N_HASHES,
    )

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id,"
        f" mh{2 * b}::VARCHAR || ':' || mh{2 * b + 1}::VARCHAR AS band_key"
        " FROM sigs"
        for b in range(N_HASHES // BAND_ROWS)
    )
    return f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
sigs AS (SELECT doc_id, {_MH_SIG_SQL} FROM exploded GROUP BY doc_id),
bands AS ({bands_union}),
bands_k AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bsz
    FROM bands) WHERE bsz <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, h.doc_id AS h_doc
  FROM bands_k t JOIN bands_k h
    ON t.band_key = h.band_key AND t.band_id = h.band_id
  WHERE t.doc_id % {HOLDOUT_MOD} <> 7 AND h.doc_id % {HOLDOUT_MOD} = 7
),
m AS (
  SELECT c.doc_id, c.h_doc,
         ({" + ".join(
             f"CASE WHEN st.mh{h} = sh.mh{h} THEN 1 ELSE 0 END"
             for h in range(N_HASHES)
         )})::BIGINT AS matches
  FROM cand c JOIN sigs st ON st.doc_id = c.doc_id
              JOIN sigs sh ON sh.doc_id = c.h_doc
)
SELECT doc_id,
       count(*)::BIGINT AS n_holdout_cands,
       max(matches)::BIGINT AS best_matches,
       ((10000 * max(matches)) // {N_HASHES})::BIGINT AS best_est_bp,
       (max(matches) * 10000 >= {DECON_T_BP} * {N_HASHES}) AS contaminated
FROM m GROUP BY doc_id
"""


@register(
    "decontaminate_minhash",
    oracle=_decon_minhash_oracle(),
    tags=("text", "curation", "contamination", "lsh"),
)
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-band decontamination — decontaminate_holdout's
    near-verbatim twin: training docs that collide with any holdout
    doc (doc_id ≡ 7 mod {HOLDOUT_MOD}) in a minhash band bucket are
    candidates; each reports its holdout-candidate count, its best
    matching-minhash count / estimated Jaccard (exact integer bp), and
    the contaminated flag at DECON_T_BP. Exact 5-gram overlap misses a
    holdout doc pasted with light edits; the signature estimate
    doesn't.

    Scale shape: dedup_minhash's banding discipline verbatim (band_key
    shuffle uniform, MAX_BUCKET cap mirrored in the oracle), except
    the join is train × holdout instead of a self-join — the holdout
    side is eval-suite-sized, so at 100 TB the candidate check costs
    O(collisions), and the signature re-join is two uniform doc-keyed
    probes. No shingle-level join at all (that is the exact lane's
    cost)."""
    from wally_spark.operators.checkpoint import pin, pin_shuffle_top
    from wally_spark.plans.dedup import (
        BAND_ROWS,
        MAX_BUCKET,
        N_HASHES,
        _docs as _ddocs,
        minhash_signatures,
    )

    sigs = pin_shuffle_top(
        minhash_signatures(fan_out(_ddocs(spark, sf_dir), "doc_id"))
    )  # consumed by the band explode + both signature re-joins
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    ":", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                ).alias("band_key"),
            )
            for b in range(N_HASHES // BAND_ROWS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    sizes = bands.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    bands_k = bands.join(
        sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_id", "band_key"]
    ).select("doc_id", "band_id", "band_key")
    tr = bands_k.where(F.col("doc_id") % HOLDOUT_MOD != 7)
    ho = bands_k.where(F.col("doc_id") % HOLDOUT_MOD == 7).select(
        F.col("doc_id").alias("h_doc"), "band_id", "band_key"
    )
    cand = (
        tr.join(ho, ["band_id", "band_key"])
        .select("doc_id", "h_doc")
        .distinct()
    )
    st = sigs.select(
        "doc_id", *[F.col(f"mh{h}").alias(f"t{h}") for h in range(N_HASHES)]
    )
    sh = sigs.select(
        F.col("doc_id").alias("h_doc"),
        *[F.col(f"mh{h}").alias(f"h{h}") for h in range(N_HASHES)],
    )
    matches = sum(
        (
            F.when(F.col(f"t{h}") == F.col(f"h{h}"), 1).otherwise(0)
            for h in range(N_HASHES)
        ),
        F.lit(0),
    ).cast("bigint")
    m = cand.join(st, "doc_id").join(sh, "h_doc").select(
        "doc_id", matches.alias("matches")
    )
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_holdout_cands"),
        F.max("matches").cast("bigint").alias("best_matches"),
        F.expr(f"(10000 * max(matches)) div {N_HASHES}")
        .cast("bigint")
        .alias("best_est_bp"),
        (F.max("matches") * 10000 >= DECON_T_BP * N_HASHES).alias(
            "contaminated"
        ),
    )


@register(
    "chunk_overlap",
    oracle=f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id, u.k AS chunk_idx, u.n_tokens, u.first_word, u.last_word
FROM (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (len(words) - 1) // {STRIDE} + 1),
           k -> {{'k': k,
                 'n_tokens': least({CHUNK}, len(words) - k * {STRIDE})::BIGINT,
                 'first_word': words[k * {STRIDE} + 1],
                 'last_word': words[least(k * {STRIDE} + {CHUNK}, len(words))]}})) AS u
  FROM w WHERE len(words) > 0)
""",
    tags=("text", "curation", "packing"),
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (context-window packing for
    long documents: {CHUNK}-token chunks every {STRIDE} tokens, so
    consecutive chunks share {CHUNK}-{STRIDE} tokens). Pure per-row
    array expressions — no shuffle at all; the chunk fan-out happens in
    the scan stage, which is the right 100 TB shape (the companion
    cross-document packer is pack_chunks)."""
    docs = _docs(spark, sf_dir).select("doc_id", _words_col().alias("words"))
    n = F.size("words")
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / STRIDE).cast("int")),
        lambda k: F.struct(
            k.cast("bigint").alias("k"),
            F.least(F.lit(CHUNK), n - k * STRIDE).cast("bigint").alias("n_tokens"),
            F.element_at("words", k * STRIDE + 1).alias("first_word"),
            F.element_at("words", F.least(k * STRIDE + CHUNK, n)).alias("last_word"),
        ),
    )
    return (
        docs.where(n > 0)
        .select("doc_id", F.explode(chunks).alias("u"))
        .select(
            "doc_id",
            F.col("u.k").alias("chunk_idx"),
            F.col("u.n_tokens").alias("n_tokens"),
            F.col("u.first_word").alias("first_word"),
            F.col("u.last_word").alias("last_word"),
        )
    )


@register(
    "vocab_bigrams",
    oracle="""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, greatest(len(words), 1)),
                               i -> words[i] || ' ' || words[i+1])) AS bigram
  FROM w WHERE len(words) >= 2
)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
    tags=("text", "curation", "vocab"),
)
def vocab_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams — the vocabulary/LM-statistics pass
    (tokenizer training, stopword discovery). Explode + codegen count
    with map-side combine; the final top-k is a 20-row total order, the
    only driver-sized piece. Deterministic tie-break on the bigram."""
    docs = _docs(spark, sf_dir).select(_words_col().alias("words"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("words") - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.element_at("words", i), F.element_at("words", i + 1)
        ),
    )
    return (
        docs.where(F.size("words") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# LM vocabulary cap: the model keeps the top-V words by sample count
# (ties broken by word) plus an explicit UNK bucket holding ALL
# remaining probability mass. At 100 TB an uncapped vocabulary is
# 10^8-10^9 distinct tokens — far past broadcast limits and a driver
# OOM; the cap bounds the broadcast at V rows FOREVER, and a
# frequency-thresholded vocab + UNK is also the statistically standard
# CCNet/KenLM shape. V is tiny here because the synthetic corpus has
# only ~31 distinct words — V=16 makes the cap provably BIND at every
# test SF (so the driver checks the top-V tie-break and the UNK mass
# arithmetic, not a no-op); production would use V ≈ 2^17.
LM_VOCAB = 16


@register(
    "text_lm_perplexity",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
train AS (
  SELECT word, count(*) AS c FROM tok
  WHERE substring(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')
  GROUP BY word
),
tot AS (
  SELECT sum(c)::BIGINT AS t_all FROM train
),
top AS (
  SELECT word, c FROM (
    SELECT word, c, row_number() OVER (ORDER BY c DESC, word) AS rk
    FROM train) WHERE rk <= {LM_VOCAB}
),
stats AS (
  SELECT (SELECT t_all FROM tot) AS t_all,
         sum(c)::BIGINT AS t_top, count(*)::BIGINT AS v_top
  FROM top
),
probs AS (
  SELECT word,
         floor(1000.0 * ln((c + 1)::DOUBLE / (t_all + v_top + 1)))::BIGINT AS mnat
  FROM top, stats
),
scored AS (
  SELECT tok.doc_id,
         count(*) AS n_tokens,
         sum(CASE WHEN p.mnat IS NULL THEN 0 ELSE p.mnat END)::BIGINT AS seen_mnat,
         sum(CASE WHEN p.mnat IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unk
  FROM tok LEFT JOIN probs p USING (word)
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens,
       (-(seen_mnat + n_unk *
          floor(1000.0 * ln((t_all - t_top + 1)::DOUBLE / (t_all + v_top + 1)))::BIGINT
         ))::BIGINT AS nll_mnat,
       ((-(seen_mnat + n_unk *
          floor(1000.0 * ln((t_all - t_top + 1)::DOUBLE / (t_all + v_top + 1)))::BIGINT))
        // n_tokens)::BIGINT AS mnat_per_token
FROM scored, stats
""",
    tags=("text", "curation", "quality", "lm"),
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM perplexity filter: train Laplace-smoothed
    word probabilities on the deterministic md5-quarter sample (the
    same engine-replicable sample text_langid_ngram learns from), cap
    the vocabulary at the LM_VOCAB most frequent words — every other
    token maps to an UNK bucket carrying the remaining count mass —
    then score every document's negative log-likelihood. The standard
    quality gate that drops gibberish/outlier docs before packing.

    Float discipline: each word's log-probability is floored ONCE to
    integer milli-nats (log of a ratio of exact integers — identical
    doubles in both engines), and everything after is exact bigint
    arithmetic (sums, counts, integral division for the per-token
    score), so the result is engine- and partitioning-independent.
    Scale shape: the top-V selection is a TakeOrdered (per-partition
    top-V, single bounded merge — never a global sort), the broadcast
    LM is ≤ LM_VOCAB rows BY CONSTRUCTION regardless of corpus size
    (the r5 verdict's last scale-killer: the uncapped vocab broadcast);
    scoring is one explode + broadcast left-join + per-doc aggregate —
    one shuffle keyed doc_id; the 1-row stats combines are broadcast
    (allow-listed). Model build factored as _ppl_model (r13) so
    pool_filter_report's merged token-gate pass shares the identical
    expressions."""
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(_words_col()).alias("word"))
    probs, stats = _ppl_model(docs)
    scored = (
        tok.join(F.broadcast(probs), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("mnat", F.lit(0))).cast("bigint").alias("seen_mnat"),
            F.sum(F.when(F.col("mnat").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
        )
    )
    unk_mnat = F.floor(
        1000.0
        * F.log(
            (F.col("t_all") - F.col("t_top") + 1).cast("double")
            / (F.col("t_all") + F.col("v_top") + 1).cast("double")
        )
    ).cast("bigint")
    nll = -(F.col("seen_mnat") + F.col("n_unk") * unk_mnat)
    return scored.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "n_tokens",
        nll.cast("bigint").alias("nll_mnat"),
        F.expr(
            "CAST(-(seen_mnat + n_unk * CAST(floor(1000.0 * ln("
            "CAST(t_all - t_top + 1 AS DOUBLE) / CAST(t_all + v_top + 1 AS DOUBLE)"
            ")) AS BIGINT)) DIV n_tokens AS BIGINT)"
        ).alias("mnat_per_token"),
    )


def _ppl_model(docs: DataFrame):
    """(probs, stats) of the CCNet-style unigram LM — the model half
    of text_lm_perplexity, factored so pool_filter_report's merged
    scoring pass builds the IDENTICAL broadcast (same expressions,
    same integer-milli-nat floor) without re-spelling it. probs is
    (word, mnat), ≤ LM_VOCAB rows by construction; stats is the 1-row
    (t_top, v_top, t_all) combine both consumers fold the UNK mass
    from."""
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    train = (
        docs.where(sampled)
        .select("doc_id", F.explode(_words_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _ppl_model_from_counts(train)


def _ppl_model_from_counts(train: DataFrame):
    """Model math of _ppl_model over a prebuilt (word, c) training
    count relation — factored (r14) so pool_filter_report can feed it
    the NB gate's per-class counts (c = c1 + c0 is exactly count(*)
    over the same sampled token stream), sharing ONE corpus-sample
    explode+aggregate between the two model builds instead of two.
    Expressions below are byte-identical to the pre-factor spelling,
    so text_lm_perplexity's plan is unchanged."""
    tot = train.agg(F.sum("c").cast("bigint").alias("t_all"))
    # TakeOrderedAndProject: bounded top-V with a total tie-break, no
    # global sort at any corpus size
    top = train.orderBy(F.desc("c"), "word").limit(LM_VOCAB)
    stats = top.agg(
        F.sum("c").cast("bigint").alias("t_top"),
        F.count(F.lit(1)).cast("bigint").alias("v_top"),
    ).crossJoin(F.broadcast(tot))
    denom = (F.col("t_all") + F.col("v_top") + 1).cast("double")
    probs = top.crossJoin(F.broadcast(stats)).select(
        "word",
        F.floor(1000.0 * F.log((F.col("c") + 1).cast("double") / denom))
        .cast("bigint")
        .alias("mnat"),
    )
    return probs, stats


# --- ExactSubstr-style duplicated-span report -------------------------------
ANCHOR_N = 10  # duplicated-substring anchor width (words)


@register(
    "dedup_substring",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, len(words) AS n_words,
         list_transform(
           range(1, len(words) - {ANCHOR_N} + 2),
           i -> md5({" || ' ' || ".join(f"words[i+{k}]" for k in range(10))})
         ) AS grams
  FROM w WHERE len(words) >= {ANCHOR_N}
),
ex AS (
  SELECT doc_id, n_words,
         unnest(range(1, len(grams) + 1)) AS p,
         unnest(grams) AS gram
  FROM g
),
dup_grams AS (
  SELECT gram FROM ex GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
dup_pos AS (
  SELECT e.doc_id, e.n_words, e.p,
         CASE WHEN lag(e.p) OVER (PARTITION BY e.doc_id ORDER BY e.p)
                   IS NULL THEN 0
              WHEN e.p - lag(e.p) OVER (PARTITION BY e.doc_id ORDER BY e.p)
                   <= {ANCHOR_N - 1} THEN 0
              ELSE 1 END AS brk
  FROM ex e JOIN dup_grams d ON d.gram = e.gram
),
islands AS (
  SELECT doc_id, n_words, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM dup_pos
),
spans AS (
  SELECT doc_id, n_words, island,
         max(p) - min(p) + {ANCHOR_N} AS span_tokens
  FROM islands GROUP BY doc_id, n_words, island
),
per_doc AS (
  SELECT doc_id, n_words,
         count(*) AS n_spans, sum(span_tokens) AS dup_tokens
  FROM spans GROUP BY doc_id, n_words
)
SELECT g.doc_id,
       coalesce(p.n_spans, 0)::BIGINT AS n_spans,
       coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       (10000 * coalesce(p.dup_tokens, 0) // g.n_words)::BIGINT AS dup_bp
FROM g LEFT JOIN per_doc p ON p.doc_id = g.doc_id
""",
    tags=("dedup", "curation", "text"),
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SPAN report — the ExactSubstr dedup shape (Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): find runs of text that appear verbatim in more than one
    document and report, per doc, how many maximal duplicated spans it
    has and how many tokens they cover. Minhash/SimHash answer "are
    these DOCS near-dups"; this answers "which PASSAGES are copies" —
    the operator that catches licenses, boilerplate paragraphs, and
    wholesale quotation that doc-level dedup keeps.

    Plan (all codegen, no UDFs, no higher-order lambdas): posexplode
    words once, build each position's ANCHOR_N-word window with
    lead() over the per-doc order (the sort reuses the fan_out
    partitioning and is bounded by doc length), one xxhash64 per
    position; a position is duplicated when its anchor gram occurs in
    >= 2 DISTINCT docs (two-phase min/max aggregate + SALTED flag join
    — hot grams are this operator's TARGET, so both sides are
    engineered for them, see inline note);
    duplicated positions closer than ANCHOR_N words merge into
    maximal spans via gaps-and-islands (lag + running sum windows,
    partitioned per doc). Span token ranges of DIFFERENT islands are
    disjoint by construction (gap > ANCHOR_N - 1), so
    dup_tokens <= n_words always. (The array-transform spelling of the
    expansion — kept for the streaming corpus variant, which registers
    gram ARRAYS — measured 2x slower here: Spark evaluates
    higher-order lambdas interpreted, the simhash round-1 lesson.)

    At 100 TB: one map-side-combined shuffle keyed on gram hash (one
    row per distinct gram per upstream task — a billion-occurrence
    gram costs the same as a rare one), one salted gram-keyed flag
    join (hot-gram positions scatter across salts), one doc-keyed
    window — linear in corpus size with no hot-key task. Reference
    basis: machida computations have no text surface; this extends
    SURVEY §2.6 (engine extension)."""
    return substring_dup_report(spark, sf_dir, exact_gram=False)


def substring_dup_report(
    spark: SparkSession, sf_dir: str, exact_gram: bool = False
) -> DataFrame:
    """dedup_substring's plan with a selectable gram identity:
    ``exact_gram=False`` (the registered default) keys grams by
    xxhash64 — 8-byte shuffle keys, ~4x cheaper to hash, birthday
    collisions expected past ~2^32 distinct grams (each marks one
    spurious extra span, never a miss); ``exact_gram=True`` keys by
    the full 128-bit md5 — collision-free in practice, for
    exactness-critical corpora, at the documented hash + 32-char
    shuffle-key cost. Identical plan shape either way (the key is
    only an equality handle through the agg and salted join)."""
    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", _words_col().alias("words")).where(
        F.size("words") >= ANCHOR_N
    )
    toks = d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.posexplode("words").alias("p0", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p0")
    gram_words = [F.col("w")] + [
        F.lead("w", k).over(wdoc) for k in range(1, ANCHOR_N)
    ]
    gram_text = F.concat_ws(" ", *gram_words)
    gram_key = F.md5(gram_text) if exact_gram else F.xxhash64(gram_text)
    ex = toks.select(
        "doc_id",
        "n_words",
        (F.col("p0") + 1).alias("p"),
        gram_key.alias("gram"),
    ).where(F.col("p") <= F.col("n_words") - (ANCHOR_N - 1))
    # ">= 2 distinct docs" ⟺ min(doc_id) != max(doc_id), computed as a
    # TWO-PHASE aggregate (map-side combine: each upstream task emits
    # one row per distinct gram, so a hot gram — a license paragraph
    # repeated across millions of docs, the exact thing this operator
    # hunts — costs O(distinct grams) in the shuffle, never O(its
    # occurrences)). Positions get their duplicated flag back through a
    # SALTED join (operators/skew.salted_join): the dup-gram set
    # replicates across 8 salts and a hot gram's positions scatter
    # instead of concentrating in one task. A gram-partitioned window
    # spelling measured identical locally but concentrates every
    # occurrence of a hot gram in one partition at scale — rejected.
    # (The oracle keeps the count(DISTINCT) spelling; both predicates
    # select exactly the positions whose gram spans >= 2 docs.)
    from wally_spark.operators.skew import salted_join

    dup_grams = (
        ex.groupBy("gram")
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
        .where(F.col("d_min") != F.col("d_max"))
        .select("gram")
    )
    dup_pos = salted_join(ex, dup_grams, "gram", n_salts=8).select(
        "doc_id", "n_words", "p"
    )
    base = d.select("doc_id", F.size("words").alias("n_words"))
    return _span_merge(dup_pos, base)


def anchor_gram_docs(docs: DataFrame, exact_gram: bool = False) -> DataFrame:
    """(doc_id, n_words, grams): 1-based sliding ANCHOR_N-word anchor
    grams per doc (docs shorter than ANCHOR_N are excluded — they
    cannot contain a duplicated span). Used by the streaming
    persistent-corpus variant (streaming/ops.py), which registers gram
    ARRAYS; the batch query builds the same positions with codegen
    lead() windows instead (see dedup_substring).

    greatest(…, 1) keeps the sequence ascending and slice/array_join
    tolerate short arrays: the optimizer may evaluate this projection
    on rows the size filter will drop (projection collapse), so the
    expression itself must be total. For every row that SURVIVES the
    filter, slice(words, i, N) is exactly N words — identical bytes to
    the oracle's windowed concat."""
    words = _words_col()
    d = docs.select("doc_id", words.alias("words")).where(
        F.size("words") >= ANCHOR_N
    )
    # xxhash64, not md5: the gram value never reaches the output (it is
    # only an equality key for the dup-gram agg/join), so the cheapest
    # collision-resistant-enough hash wins — a bigint computes ~4x
    # faster than md5's 32-char hex and shuffles 8 bytes instead of
    # ~48. The oracle keeps md5; both select the same duplicated
    # POSITIONS because equal windows hash equal under either function.
    # Collision bound: a 64-bit key makes birthday collisions EXPECTED
    # past ~2^32 distinct grams (certainly at 100 TB); each collision
    # falsely marks one unrelated position per colliding doc as
    # duplicated — acceptable for dedup (a rare extra span, never a
    # miss), but it means position parity with the md5 oracle is
    # statistical at that scale, not exact. ``exact_gram=True`` opts
    # into the full 128-bit md5 identity (collision-free in practice)
    # at the documented ~4x hash + 32-char shuffle-key cost — for
    # exactness-critical corpora (r7 verdict item 4).
    def key_of(text_col):
        return F.md5(text_col) if exact_gram else F.xxhash64(text_col)

    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("words") - (ANCHOR_N - 1), F.lit(1))
        ),
        lambda i: key_of(F.array_join(F.slice("words", i, ANCHOR_N), " ")),
    )
    return d.select(
        "doc_id", F.size("words").alias("n_words"), grams.alias("grams")
    )


def explode_anchor_grams(base: DataFrame) -> DataFrame:
    """(doc_id, n_words, p, gram) — one row per anchor position."""
    return base.select(
        "doc_id",
        "n_words",
        F.posexplode("grams").alias("p0", "gram"),
    ).select("doc_id", "n_words", (F.col("p0") + 1).alias("p"), "gram")


def substring_span_report(
    ex: DataFrame, dup_grams: DataFrame, base: DataFrame
) -> DataFrame:
    """Gaps-and-islands span merge over duplicated anchor positions →
    per-doc (n_spans, dup_tokens, dup_bp). ``dup_grams`` defines what
    counts as duplicated (persistent-corpus membership in the
    streaming variant; the batch query builds its dup_grams with a
    skew-proof two-phase aggregate). The flag join is SALTED like the
    batch query's: a hot gram's positions scatter across salts instead
    of concentrating in one task."""
    from wally_spark.operators.skew import salted_join

    return _span_merge(salted_join(ex, dup_grams, "gram", n_salts=8), base)


def _span_merge(dup_pos: DataFrame, base: DataFrame) -> DataFrame:
    """(doc_id, n_words, p) duplicated positions → per-doc span report."""
    wp = Window.partitionBy("doc_id").orderBy("p")
    dup_pos = dup_pos.withColumn(
        "brk",
        F.when(F.lag("p").over(wp).isNull(), F.lit(0))
        .when(F.col("p") - F.lag("p").over(wp) <= ANCHOR_N - 1, F.lit(0))
        .otherwise(F.lit(1)),
    )
    islands = dup_pos.withColumn(
        "island",
        F.sum("brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "n_words", "island").agg(
        (F.max("p") - F.min("p") + ANCHOR_N).alias("span_tokens")
    )
    per_doc = spans.groupBy("doc_id", "n_words").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    return (
        base.select("doc_id", "n_words")
        .join(per_doc.select("doc_id", "n_spans", "dup_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            (
                10000 * F.coalesce("dup_tokens", F.lit(0)) / F.col("n_words")
            )
            .cast("bigint")
            .alias("dup_bp"),
        )
    )


# --- Naive-Bayes document classifier (the fastText-quality-gate shape) ------
NB_VOCAB = 16  # binding at every test SF, like LM_VOCAB (prod: ~2^17)


# Shared by doc_nb_classifier and nb_calibration (byte-identical SQL).
_NB_ORACLE = f"""
WITH tok AS (
  SELECT d.doc_id,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         unnest(list_filter(string_split(lower(d.text), ' '), x -> x <> '')) AS word
  FROM documents d
),
train AS (
  SELECT word, sum(y)::BIGINT AS c1, sum(1 - y)::BIGINT AS c0
  FROM tok
  WHERE substring(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')
  GROUP BY word
),
tot AS (
  SELECT sum(c1)::BIGINT AS t1, sum(c0)::BIGINT AS t0 FROM train
),
top AS (
  SELECT word, c1, c0 FROM (
    SELECT word, c1, c0,
           row_number() OVER (ORDER BY c1 + c0 DESC, word) AS rk
    FROM train) WHERE rk <= {NB_VOCAB}
),
stats AS (
  SELECT (SELECT t1 FROM tot) AS t1, (SELECT t0 FROM tot) AS t0,
         sum(c1)::BIGINT AS t1_top, sum(c0)::BIGINT AS t0_top,
         count(*)::BIGINT AS v_top
  FROM top
),
weights AS (
  SELECT word,
         (floor(1000.0 * ln((c1 + 1)::DOUBLE / (t1 + v_top + 1)))
          - floor(1000.0 * ln((c0 + 1)::DOUBLE / (t0 + v_top + 1))))::BIGINT AS w
  FROM top, stats
),
priors AS (
  SELECT floor(1000.0 * ln(
           (sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)::DOUBLE
           / (sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) + 1)))::BIGINT AS pw
  FROM documents
  WHERE substring(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')
),
scored AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN w.w IS NULL THEN 0 ELSE w.w END)::BIGINT AS seen_w,
         sum(CASE WHEN w.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unk
  FROM tok t LEFT JOIN weights w USING (word)
  GROUP BY t.doc_id
)
SELECT s.doc_id, s.n_tokens,
       (pw + seen_w + n_unk *
        (floor(1000.0 * ln((t1 - t1_top + 1)::DOUBLE / (t1 + v_top + 1)))
         - floor(1000.0 * ln((t0 - t0_top + 1)::DOUBLE / (t0 + v_top + 1))))::BIGINT
       )::BIGINT AS score_mnat,
       CASE WHEN (pw + seen_w + n_unk *
        (floor(1000.0 * ln((t1 - t1_top + 1)::DOUBLE / (t1 + v_top + 1)))
         - floor(1000.0 * ln((t0 - t0_top + 1)::DOUBLE / (t0 + v_top + 1))))::BIGINT
       ) > 0 THEN 1 ELSE 0 END::BIGINT AS pred_en,
       (CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS is_en
FROM scored s JOIN documents d USING (doc_id), stats, priors
"""


@register(
    "doc_nb_classifier",
    oracle=_NB_ORACLE,
    tags=("text", "curation", "classifier"),
)
def doc_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes document classifier — the fastText-
    style quality/domain-gate shape every large corpus pipeline runs
    (CCNet's lang/quality filter, Llama-style wiki-reference
    classifiers): train per-token log-odds on a deterministic labeled
    sample, score every document with one broadcast join + aggregate,
    emit (score, prediction, actual) so downstream can threshold or
    audit precision. Label here is lang='en' — the in-corpus
    stand-in for any metadata-derived supervision.

    Closed-form training (one groupBy over the md5-quarter sample's
    tokens — no iteration), vocabulary capped at the NB_VOCAB most
    frequent sample words + an UNK bucket carrying the remaining count
    mass per class (the text_lm_perplexity cap: broadcast bounded at V
    rows forever). Float discipline: each class log-probability is
    floored ONCE to integer milli-nats, everything downstream is exact
    bigint arithmetic — engine- and partitioning-independent.

    Scale shape: training = one token-keyed aggregate over a quarter
    sample + TakeOrdered top-V (never a global sort); scoring = explode
    + broadcast left-join + one doc-keyed aggregate; priors/stats are
    1-row broadcast combines (allow-listed). One corpus-sized shuffle
    total, keyed doc_id."""
    docs = _docs(spark, sf_dir)
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    weights, stats, priors = nb_model(
        nb_token_counts(docs.where(sampled)), nb_doc_counts(docs.where(sampled))
    )
    tok = docs.select("doc_id", F.explode(_words_col()).alias("word"))
    score = F.col("pw") + F.col("seen_w") + F.col("n_unk") * _nb_unk_w()
    return (
        nb_scored_counts(tok, weights)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(priors))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            score.cast("bigint").alias("score_mnat"),
            F.when(score > 0, 1).otherwise(0).cast("bigint").alias("pred_en"),
            F.when(F.col("lang") == "en", 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_en"),
        )
    )


def _nb_y():
    return F.when(F.col("lang") == "en", 1).otherwise(0)


def _nb_mnat(num, den):
    # floored ONCE to integer milli-nats; everything downstream bigint
    return F.floor(
        1000.0 * F.log(num.cast("double") / den.cast("double"))
    ).cast("bigint")


def nb_token_counts(docs: DataFrame) -> DataFrame:
    """(word, c1, c0) per-class token counts for any (doc_id, lang,
    text) DataFrame — one word-keyed aggregate, map-side combined.
    Mergeable across batches by summing (the streaming lane persists
    per-batch counts and folds them)."""
    return (
        docs.select("doc_id", _nb_y().alias("y"), F.explode(_words_col()).alias("word"))
        .groupBy("word")
        .agg(
            F.sum("y").cast("bigint").alias("c1"),
            F.sum(1 - F.col("y")).cast("bigint").alias("c0"),
        )
    )


def nb_doc_counts(docs: DataFrame) -> DataFrame:
    """1-row (n1, n0) class doc counts — the prior's input, mergeable
    across batches by summing."""
    y = _nb_y()
    return docs.agg(
        F.sum(y).cast("bigint").alias("n1"),
        F.sum(1 - y).cast("bigint").alias("n0"),
    )


def nb_model(train: DataFrame, doc_counts: DataFrame):
    """(weights, stats, priors) from merged (word, c1, c0) counts and
    1-row (n1, n0): top-NB_VOCAB vocabulary + UNK mass per class,
    integer milli-nat log-odds. weights ≤ NB_VOCAB rows by
    construction; stats/priors are 1-row broadcast combines."""
    tot = train.agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c0").cast("bigint").alias("t0"),
    )
    top = train.orderBy(F.desc(F.col("c1") + F.col("c0")), "word").limit(NB_VOCAB)
    stats = top.agg(
        F.sum("c1").cast("bigint").alias("t1_top"),
        F.sum("c0").cast("bigint").alias("t0_top"),
        F.count(F.lit(1)).cast("bigint").alias("v_top"),
    ).crossJoin(F.broadcast(tot))
    d1 = F.col("t1") + F.col("v_top") + 1
    d0 = F.col("t0") + F.col("v_top") + 1
    weights = top.crossJoin(F.broadcast(stats)).select(
        "word",
        (_nb_mnat(F.col("c1") + 1, d1) - _nb_mnat(F.col("c0") + 1, d0)).alias("w"),
    )
    priors = doc_counts.select(
        _nb_mnat(F.col("n1") + 1, F.col("n0") + 1).alias("pw")
    )
    return weights, stats, priors


def _nb_unk_w():
    """UNK log-odds expression — requires stats columns in scope."""
    d1 = F.col("t1") + F.col("v_top") + 1
    d0 = F.col("t0") + F.col("v_top") + 1
    return _nb_mnat(F.col("t1") - F.col("t1_top") + 1, d1) - _nb_mnat(
        F.col("t0") - F.col("t0_top") + 1, d0
    )


def nb_scored_counts(tok: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, seen_w, n_unk) from a (doc_id, word) token
    stream and the broadcast weight table — one doc-keyed aggregate."""
    return (
        tok.join(F.broadcast(weights), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("w", F.lit(0))).cast("bigint").alias("seen_w"),
            F.sum(F.when(F.col("w").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
        )
    )


# --- BPE merge-pair counting (tokenizer training, round 1) ------------------
BPE_TOP = 32  # merge candidates reported


@register(
    "bpe_merge_pairs",
    oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
wc AS (
  SELECT word, count(*) AS c FROM tok GROUP BY word
),
pairs AS (
  SELECT unnest(list_transform(range(1, greatest(len(word), 2)),
                i -> substr(word, i, 2))) AS pair,
         c
  FROM wc WHERE len(word) >= 2
),
agg AS (
  SELECT pair, sum(c)::BIGINT AS pair_count FROM pairs GROUP BY pair
)
SELECT row_number() OVER (ORDER BY pair_count DESC, pair) AS rank,
       pair, pair_count
FROM agg ORDER BY pair_count DESC, pair LIMIT {BPE_TOP}
""",
    tags=("text", "curation", "tokenizer"),
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first merge round: count adjacent
    character pairs across the corpus weighted by word frequency and
    rank the top merge candidates — the inner loop of byte-pair
    encoding (Sennrich et al. 2016) that corpus pipelines run to fit a
    tokenizer before packing. One round is the representative shape:
    later rounds re-run the same count over the merged symbol stream.

    Scale shape: the corpus token stream collapses to (word, count)
    FIRST (one word-keyed aggregate, map-side combined — the word
    relation is the vocabulary, bounded far below the corpus), then
    pair explosion runs over distinct words only: pair counting is
    O(vocab x word_len), independent of corpus duplication. Top-K is a
    TakeOrdered (per-partition top-K + bounded merge, never a global
    sort); the rank window runs on K rows. Exact integer counts —
    engine-identical."""
    tok = _docs(spark, sf_dir).select(F.explode(_words_col()).alias("word"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(word) - 1, 1)),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "c",
        )
    )
    agg = pairs.groupBy("pair").agg(F.sum("c").cast("bigint").alias("pair_count"))
    top = agg.orderBy(F.desc("pair_count"), "pair").limit(BPE_TOP)
    rank_w = Window.orderBy(F.desc("pair_count"), "pair")
    return top.select(
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
        "pair",
        "pair_count",
    )


# --- multi-round BPE merges (tokenizer training, rounds 1..R) ---------------
BPE_ROUNDS = 4
# Symbol-boundary delimiter for the per-word symbol string. Assumed
# absent from word text (words are whitespace-split; \x01 never occurs
# in natural text). Both engines use the identical representation, so
# parity holds regardless.
_BPE_D = "\x01"


def _bpe_oracle() -> str:
    """Unrolled-CTE oracle: v<r> is the per-word symbol string after r
    merges, p<r>/t<r> the round-r pair counts / winning pair. The merge
    is string replace of the delimiter-bounded pair — literal replace
    scans left-to-right non-overlapping, exactly BPE's greedy merge
    order."""
    d, dd = "chr(1)", "chr(1)||chr(1)"
    parts = [
        """tok AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
wc AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
v0 AS (
  SELECT {d} || array_to_string(
           list_transform(range(1, len(word)+1), i -> substr(word, i, 1)),
           {dd}) || {d} AS s, c
  FROM wc
)""".format(d=d, dd=dd)
    ]
    for r in range(BPE_ROUNDS):
        parts.append(
            """p{r} AS (
  SELECT u.a AS a, u.b AS b, sum(c)::BIGINT AS cnt
  FROM (
    SELECT list_transform(range(1, len(sy)), i -> {{'a': sy[i], 'b': sy[i+1]}}) AS ps, c
    FROM (SELECT string_split(substr(s, 2, len(s)-2), {dd}) AS sy, c FROM v{r})
  ), unnest(ps) AS t(u)
  GROUP BY u.a, u.b
),
t{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)""".format(
                r=r, dd=dd
            )
        )
        if r < BPE_ROUNDS - 1:
            parts.append(
                """v{n} AS (
  SELECT replace(s, {d}||a||{dd}||b||{d}, {d}||a||b||{d}) AS s, c
  FROM v{r} CROSS JOIN t{r}
)""".format(r=r, n=r + 1, d=d, dd=dd)
            )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r + 1}::BIGINT AS merge_round, a AS pair_a, b AS pair_b,"
        f" a||b AS merged, cnt AS pair_count FROM t{r}"
        for r in range(BPE_ROUNDS)
    )
    return (
        "WITH " + ",\n".join(parts) + "\nSELECT * FROM (\n" + unions
        + "\n) ORDER BY merge_round"
    )


@register(
    "bpe_merges_r4",
    oracle=_bpe_oracle(),
    tags=("text", "curation", "tokenizer"),
)
def bpe_merges_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, ROUNDS 1..4 of the real merge loop
    (Sennrich et al. 2016): each round counts adjacent SYMBOL pairs
    over the vocabulary (weighted by word frequency), applies the
    single most frequent pair as a merge to every word's symbol
    sequence, and re-counts — the genuinely iterative step
    ``bpe_merge_pairs`` only runs once. Output: one row per round with
    the winning pair and its count (ties broken lexicographically, so
    both engines pick the identical merge).

    Representation: each word's symbol sequence is a \\x01-delimited
    string (symbols doubly separated, ends capped), so the merge step
    is a LITERAL string replace of the bounded pair — replace scans
    left-to-right non-overlapping, which IS BPE's greedy merge order
    ([a,a,a] + merge(a,a) -> [aa, a]). No per-row loops, no UDFs.

    Scale shape (the graph_pagerank unrolling pattern,
    analytics_ext.py:173): the corpus collapses to the (word, count)
    vocabulary ONCE — every later round is O(vocab x word_len),
    independent of corpus size. Per round: one explode + map-side-
    combined pair aggregate, a TakeOrdered(1) for the winner, and a
    1-row broadcast cross join to apply the merge. The vocabulary is
    pinned per round (operators/checkpoint.pin) because each round's
    vocab feeds BOTH the pair count and the merge — without pinning
    the lazy plan doubles per round; blocks release as rounds retire
    (free_blocks), so pinned storage stays O(1 round). Winning-pair
    frames are 1 row each. Empty corpus => empty vocab => LIMIT 1
    yields zero rows => empty result, no NULL poison."""
    from wally_spark.operators.checkpoint import pin

    d = _BPE_D
    tok = _docs(spark, sf_dir).select(F.explode(_words_col()).alias("word"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    s0 = F.concat(
        F.lit(d),
        F.array_join(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            d + d,
        ),
        F.lit(d),
    )
    vocab = pin(wc.select(s0.alias("s"), "c"))
    # r13: the per-round winner comes back as a literal (see
    # _bpe_replay_winners) — the output relation is then a pure
    # driver-side literal table instead of a union of four pinned
    # 1-row frames.
    winners = _bpe_replay_winners(vocab)
    return spark.createDataFrame(
        [
            (r + 1, a, b, a + b, cnt)
            for r, (a, b, cnt) in enumerate(winners)
        ],
        "merge_round bigint, pair_a string, pair_b string, "
        "merged string, pair_count bigint",
    ).orderBy("merge_round")


# --- BPE tokenizer APPLY (r9) ------------------------------------------------
def _bpe_vchain_parts() -> list:
    """The unrolled-CTE v-chain: replays the identical BPE_ROUNDS
    training (same CTE text as ``_bpe_oracle`` but with ``word``
    carried through and the LAST winner also applied, yielding v{R} —
    the fully-merged vocabulary). Shared by the bpe_encode and
    bpe_encode_ids oracles."""
    d, dd = "chr(1)", "chr(1)||chr(1)"
    parts = [
        """tok AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
wc AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
v0 AS (
  SELECT word,
         {d} || array_to_string(
           list_transform(range(1, len(word)+1), i -> substr(word, i, 1)),
           {dd}) || {d} AS s, c
  FROM wc
)""".format(d=d, dd=dd)
    ]
    for r in range(BPE_ROUNDS):
        parts.append(
            """p{r} AS (
  SELECT u.a AS a, u.b AS b, sum(c)::BIGINT AS cnt
  FROM (
    SELECT list_transform(range(1, len(sy)), i -> {{'a': sy[i], 'b': sy[i+1]}}) AS ps, c
    FROM (SELECT string_split(substr(s, 2, len(s)-2), {dd}) AS sy, c FROM v{r})
  ), unnest(ps) AS t(u)
  GROUP BY u.a, u.b
),
t{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
v{n} AS (
  SELECT word, replace(s, {d}||a||{dd}||b||{d}, {d}||a||b||{d}) AS s, c
  FROM v{r} CROSS JOIN t{r}
)""".format(r=r, n=r + 1, dd=dd, d=d)
        )
    return parts


def _bpe_encode_oracle() -> str:
    """Oracle for ``bpe_encode``: the v-chain, then every document
    word joined against its encoded symbol count."""
    dd = "chr(1)||chr(1)"
    parts = _bpe_vchain_parts()
    return (
        "WITH " + ",\n".join(parts) + f""",
syms AS (
  SELECT word, length(word)::BIGINT AS n_chars,
         len(string_split(substr(s, 2, len(s)-2), {dd}))::BIGINT AS n_syms
  FROM v{BPE_ROUNDS}
),
dtok AS (
  SELECT lang, source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS word
  FROM documents
),
enc AS (
  SELECT lang, source, count(*)::BIGINT AS n_words,
         sum(n_chars)::BIGINT AS n_sym0, sum(n_syms)::BIGINT AS n_tokens
  FROM dtok JOIN syms USING (word) GROUP BY lang, source
),
slices AS (
  SELECT lang, source, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY lang, source
)
SELECT s.lang, s.source, s.n_docs,
       coalesce(e.n_words, 0)::BIGINT AS n_words,
       coalesce(e.n_sym0, 0)::BIGINT AS n_sym0,
       coalesce(e.n_tokens, 0)::BIGINT AS n_tokens,
       ((1000 * e.n_tokens) // nullif(e.n_words, 0))::BIGINT
         AS fertility_milli,
       ((1000 * e.n_tokens) // nullif(e.n_sym0, 0))::BIGINT
         AS compression_milli
FROM slices s LEFT JOIN enc e USING (lang, source)
ORDER BY s.lang, s.source"""
    )


def _bpe_encoded_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the BPE_ROUNDS training loop (the bpe_merges_r4
    discipline) and return the fully-merged ``(word, s, c)``
    vocabulary, pinned — shared by ``bpe_encode`` (the token-budget
    ledger) and ``bpe_encode_ids`` (the token-id export). All merge
    work runs on the vocab only — O(vocab × word_len) per round,
    corpus-size independent — with 1-row broadcast winners and
    per-round pin/free."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(F.explode(_words_col()).alias("word"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    return _bpe_encoded_vocab_from_wc(wc)


def _bpe_replay_winners(vocab: DataFrame) -> list:
    """Run the BPE_ROUNDS merge loop over a pinned ``(…, s, c)``
    symbol-string vocabulary, returning the list of winning
    ``(a, b, cnt)`` rounds (shorter than BPE_ROUNDS iff some round had
    no pair — after which the oracle's ``CROSS JOIN t{r}`` empties the
    vocabulary, reproduced by ``_bpe_apply_winners``).

    r13 shape: each round's winner (ORDER BY cnt DESC, a, b LIMIT 1 —
    deterministic) is a ONE-row relation; it comes back to the driver
    through the bounded ``operators/matrix.collect_rows`` route and
    re-enters the next round's plan as LITERALS. The former spelling
    pinned the winner and broadcast it into a crossJoin: 2 eager-pin
    jobs + a broadcast build per round, all for one row. Literal
    winners need 1 job per round (the count itself) and let the merged
    vocabulary stay a LAZY chain of literal `replace`s over the single
    pinned base — no per-round materialization at all. Winners and
    therefore results are bit-identical; only the plumbing of one row
    differs."""
    from wally_spark.operators.matrix import collect_rows

    d = _BPE_D
    winners = []
    for _ in range(BPE_ROUNDS):
        syms = vocab.select(
            F.split(F.expr("substring(s, 2, length(s)-2)"), d + d).alias("sy"),
            "c",
        ).where(F.size("sy") >= 2)
        pairs = syms.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sy)-1),"
                    " i -> struct(element_at(sy, i) AS a, element_at(sy, i+1) AS b))"
                )
            ).alias("p"),
            "c",
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "c")
        agg = pairs.groupBy("a", "b").agg(F.sum("c").cast("bigint").alias("cnt"))
        # bound = 1 by construction (LIMIT 1)
        rows = collect_rows(agg.orderBy(F.desc("cnt"), "a", "b").limit(1), 1)
        if not rows:
            break
        a, b = rows[0]["a"], rows[0]["b"]
        winners.append((a, b, rows[0]["cnt"]))
        vocab = vocab.withColumn(
            "s", F.replace("s", F.lit(d + a + d + d + b + d), F.lit(d + a + b + d))
        )
    return winners


def _bpe_apply_winners(vocab: DataFrame, winners: list, rounds: int) -> DataFrame:
    """Apply a literal merge list to a symbol-string vocabulary —
    nested `replace`s, plus the oracle's empty-vocabulary semantics:
    if training stopped early (no pair in some round ≤ rounds), the
    reference CROSS JOIN against the empty winner relation empties the
    vocabulary, so mirror that exactly."""
    d = _BPE_D
    if len(winners) < rounds:
        return vocab.where(F.lit(False))
    s = F.col("s")
    for a, b, _ in winners[:rounds]:
        s = F.replace(s, F.lit(d + a + d + d + b + d), F.lit(d + a + b + d))
    return vocab.withColumn("s", s)


def _bpe_encoded_vocab_from_wc(wc: DataFrame) -> DataFrame:
    """The BPE_ROUNDS merge replay over a given (word, c) vocabulary —
    factored out (winner-for-winner identical to the r10 body) so the
    streaming attention-manifest face can train on the FOLDED corpus
    vocabulary instead of a parquet directory."""
    from wally_spark.operators.checkpoint import pin

    d = _BPE_D
    s0 = F.concat(
        F.lit(d),
        F.array_join(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            d + d,
        ),
        F.lit(d),
    )
    vocab = pin(wc.select("word", s0.alias("s"), "c"))
    winners = _bpe_replay_winners(vocab)
    return _bpe_apply_winners(vocab, winners, BPE_ROUNDS)


@register(
    "bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "curation", "tokenizer"),
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the missing half of the tokenizer
    story (``bpe_merges_r4`` trains the merge table; this lane encodes
    the corpus with it): replays the identical 4-round training loop,
    applies ALL four winning merges to the word vocabulary, then
    charges every document word its post-merge symbol count. Output is
    the per-(lang, source) token-budget ledger — words, pre-merge
    symbols (= characters), post-merge BPE tokens, fertility
    (tokens/word) and compression (tokens/char) in exact integer milli
    — the number a pipeline actually bills against a token budget
    after tokenizer training (ref surface: computation_multi over
    decoded text, machida/lib/wallaroo/__init__.py:270).

    Scale shape (the bpe_merges_r4 discipline, curation.py:1076): the
    corpus collapses to the (word, count) vocabulary ONCE; all four
    merge applications run on the vocab (O(vocab × word_len) each,
    independent of corpus size) with 1-row broadcast winners and
    per-round pin/free so lineage stays linear. ENCODING never touches
    symbol strings corpus-side: documents explode to words, the join
    against the encoded vocab is a uniform word-keyed equi-join (the
    vocab is NOT broadcast — unbounded at 100 TB), and only integer
    counts aggregate out, bounded by |langs| × |sources|. Fertility /
    compression divide AFTER the sums with nullif'd divisors (empty
    slices yield NULL in both engines)."""
    d = _BPE_D
    docs = _docs(spark, sf_dir)
    vocab = _bpe_encoded_vocab(spark, sf_dir)
    per_word = vocab.select(
        "word",
        F.length("word").cast("bigint").alias("n_chars"),
        F.size(F.split(F.expr("substring(s, 2, length(s)-2)"), d + d))
        .cast("bigint")
        .alias("n_syms"),
    )
    dtok = docs.select("lang", "source", F.explode(_words_col()).alias("word"))
    enc = (
        dtok.join(per_word, "word")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_chars").cast("bigint").alias("n_sym0"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
        )
    )
    slices = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        slices.join(enc, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "n_docs",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_sym0", F.lit(0)).cast("bigint").alias("n_sym0"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.floor((1000 * F.col("n_tokens")) / F.nullif("n_words", F.lit(0)))
            .cast("bigint")
            .alias("fertility_milli"),
            F.floor((1000 * F.col("n_tokens")) / F.nullif("n_sym0", F.lit(0)))
            .cast("bigint")
            .alias("compression_milli"),
        )
        .orderBy("lang", "source")
    )


# --- BPE token-id export (r10) ------------------------------------------------
IDS_CHUNK = 512  # tokens per exported context window (pack_chunks' CHUNK)


def _bpe_layout_sql() -> str:
    """CTE chain for the packed-corpus COORDINATE SYSTEM (continues
    the v-chain): per-word symbol lists, per-doc token totals, and the
    md5(doc_id)-ordered global prefix sum — everything needed to place
    any doc's tokens on the packed axis. Shared by the bpe_encode_ids
    and pack_attention_boundaries oracles."""
    dd = "chr(1)||chr(1)"
    return """wsyms AS (
  SELECT word, string_split(substr(s, 2, len(s)-2), {dd}) AS sy
  FROM v{R}
),
wdocs AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
dw AS (
  SELECT doc_id, u.p AS wpos, u.w AS word
  FROM (SELECT doc_id, list_transform(range(1, len(words)+1),
          i -> {{'p': i, 'w': words[i]}}) AS ps FROM wdocs),
       unnest(ps) AS t(u)
),
dwoff AS (
  SELECT doc_id, wpos, sy,
         coalesce(sum(len(sy)) OVER (PARTITION BY doc_id ORDER BY wpos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS woff
  FROM dw JOIN wsyms USING (word)
),
doctot AS (
  SELECT doc_id, sum(len(sy))::BIGINT AS n_tokens,
         md5(doc_id::VARCHAR) AS h
  FROM dwoff GROUP BY doc_id
),
goff AS (
  SELECT doc_id,
         coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
  FROM doctot
)""".format(dd=dd, R=BPE_ROUNDS)


def _bpe_token_layout(spark: SparkSession, sf_dir: str):
    """(wsyms, pinned word-level join, doc layout) — the packed-corpus
    COORDINATE SYSTEM shared by bpe_encode_ids and
    pack_attention_boundaries: per-word symbol lists from the replayed
    merge table, the pinned (doc_id, wpos, sy) relation (explode +
    vocab equi-join — expensive, two consumers: the dedup_winnowing
    pin rule, A/B-measured r10), and the (doc_id, n_tokens, off0) doc
    layout whose off0 is the distributed two-phase prefix sum in
    md5(doc_id) order (operators/prefix.bucket_offsets — driver state
    is N_PREFIX_BUCKETS longs, never a global single-task window).
    Expressions are byte-identical to the ones bpe_encode_ids carried
    since r10 (plan-identical factoring)."""
    from wally_spark.operators.checkpoint import pin as _pin

    d = _BPE_D
    dd = d + d
    docs = _docs(spark, sf_dir)
    vocab = _bpe_encoded_vocab(spark, sf_dir)
    wsyms = vocab.select(
        "word",
        F.split(F.expr("substring(s, 2, length(s)-2)"), dd).alias("sy"),
    )
    dw = docs.select(
        "doc_id", F.posexplode(_words_col()).alias("wpos", "word")
    )
    dwj = _pin(dw.join(wsyms, "word"))
    doctot = dwj.groupBy("doc_id").agg(
        F.sum(F.size("sy")).cast("bigint").alias("n_tokens")
    )
    return wsyms, dwj, _layout_from_doctot(spark, doctot)


def _layout_from_doctot(spark: SparkSession, doctot: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) -> (doc_id, n_tokens, off0): the md5(doc_id)
    packing order + the distributed two-phase prefix sum — factored
    (expressions byte-identical to the r11 body) so the streaming
    attention-manifest face shares the exact coordinate system."""
    from wally_spark.operators.prefix import bucket_offsets
    from wally_spark.plans.sampling import N_PREFIX_BUCKETS

    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    doctot = doctot.select("doc_id", "n_tokens", h.alias("h")).withColumn(
        "bucket", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    boff = bucket_offsets(spark, doctot, "bucket", "n_tokens", N_PREFIX_BUCKETS)
    wb = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        doctot.join(F.broadcast(boff), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("bucket_off")
                + F.sum("n_tokens").over(wb)
                - F.col("n_tokens")
            )
            .cast("bigint")
            .alias("off0"),
        )
    )


def _bpe_ids_oracle() -> str:
    """Oracle for ``bpe_encode_ids``: the v-chain, the shared layout
    CTEs, then dense token ids (row_number over the sorted distinct
    symbol set), per-token global positions, and the per-chunk
    manifest."""
    dd = "chr(1)||chr(1)"
    parts = _bpe_vchain_parts()
    tail = """,
{LAYOUT},
tokvocab AS (
  SELECT sym, (row_number() OVER (ORDER BY sym) - 1)::BIGINT AS token_id
  FROM (SELECT DISTINCT unnest(sy) AS sym FROM wsyms)
),
dtoks0 AS (
  SELECT doc_id, woff + u.p - 1 AS tpos, u.s AS sym
  FROM (SELECT doc_id, woff, list_transform(range(1, len(sy)+1),
          i -> {{'p': i, 's': sy[i]}}) AS ps FROM dwoff),
       unnest(ps) AS t(u)
),
dtoks AS (
  SELECT d.doc_id, g.off0 + d.tpos AS gpos, d.sym
  FROM dtoks0 d JOIN goff g USING (doc_id)
)
SELECT (gpos // {K})::BIGINT AS chunk_id,
       count(*)::BIGINT AS n_tokens,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       sum(t.token_id * ((gpos % {K}) + 1))::BIGINT AS ids_checksum,
       arg_min(t.token_id, gpos)::BIGINT AS first_token_id,
       arg_max(t.token_id, gpos)::BIGINT AS last_token_id
FROM dtoks JOIN tokvocab t USING (sym)
GROUP BY 1 ORDER BY 1""".format(
        dd=dd, R=BPE_ROUNDS, K=IDS_CHUNK, LAYOUT=_bpe_layout_sql()
    )
    return "WITH " + ",\n".join(parts) + tail


@register(
    "bpe_encode_ids",
    oracle=_bpe_ids_oracle(),
    tags=("text", "curation", "tokenizer", "packing"),
)
def bpe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-ID export — the last link of the tokenizer→training-
    reader chain (r9 verdict #4): ``bpe_merges_r4`` trains the merge
    table, ``bpe_encode`` charges token budgets, and THIS lane emits
    what a training reader actually consumes — the corpus as
    IDS_CHUNK-token context windows over real token ids. Documents
    concatenate in the same deterministic md5(doc_id) order
    pack_chunks uses; every BPE symbol gets a dense token id (rank in
    the sorted final symbol vocabulary); output is the per-chunk
    manifest (token count, contributing docs, an exact position-
    weighted id checksum that pins the full sequence, first/last id).
    Reconciliation contracts (tested): Σ chunk n_tokens == Σ
    bpe_encode n_tokens; every chunk except the last holds exactly
    IDS_CHUNK tokens with contiguous ids from 0 (the pack_chunks
    boundary rule applied to BPE-token mass); a sequential Python
    BPE encoder reproduces the checksums byte-for-byte.

    Scale shape: merges replay on the (word, count) vocab only
    (_bpe_encoded_vocab — corpus-size independent); token ids come
    from a symbol-vocab window BOUNDED by |alphabet| + merge rounds
    (broadcast after); per-doc positions are an exclusive prefix sum
    over the doc-keyed word window (per-doc bounded); the GLOBAL
    offset is the distributed two-phase prefix sum pack_chunks uses
    (operators/prefix.bucket_offsets — driver state is
    N_PREFIX_BUCKETS longs, never a global single-task window); the
    encode join is the uniform word-keyed equi-join (vocab never
    broadcast); the manifest aggregate is chunk-keyed, uniform by
    construction (every chunk holds exactly IDS_CHUNK tokens).
    Ref surface: computation_multi emitting encoded records,
    machida/lib/wallaroo/__init__.py:473."""
    wsyms, dwj, layout = _bpe_token_layout(spark, sf_dir)
    # dense ids over the FINAL symbol vocabulary: bounded by
    # |alphabet| + BPE_ROUNDS, so the global window is a few hundred
    # rows and the id table broadcasts
    tokvocab = (
        wsyms.select(F.explode("sy").alias("sym"))
        .distinct()
        .select(
            "sym",
            (F.row_number().over(Window.orderBy("sym")) - 1)
            .cast("bigint")
            .alias("token_id"),
        )
    )
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("wpos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dwoff = dwj.select(
        "doc_id",
        "sy",
        (F.sum(F.size("sy")).over(wdoc) - F.size("sy"))
        .cast("bigint")
        .alias("woff"),
    )
    goff = layout.select("doc_id", "off0")
    # r13 (guide §3.3 "explode before a join multiplies the shuffle"):
    # attach the doc-level global offset BEFORE the symbol posexplode —
    # the doc-keyed join then carries one row per word occurrence
    # instead of one per token (~3x fewer join rows at any scale);
    # gpos = off0 + woff + spos is associative, rows identical.
    toks = (
        dwoff.join(goff, "doc_id")
        .select(
            "doc_id",
            (F.col("off0") + F.col("woff")).alias("base"),
            F.posexplode("sy").alias("spos", "sym"),
        )
        .select(
            "doc_id",
            "sym",
            (F.col("base") + F.col("spos")).alias("gpos"),
        )
    )
    return (
        toks.join(F.broadcast(tokvocab), "sym")
        .groupBy(
            F.expr(f"gpos div {IDS_CHUNK}").cast("bigint").alias("chunk_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum(F.col("token_id") * (F.col("gpos") % IDS_CHUNK + 1))
            .cast("bigint")
            .alias("ids_checksum"),
            F.min_by("token_id", "gpos").cast("bigint").alias("first_token_id"),
            F.max_by("token_id", "gpos").cast("bigint").alias("last_token_id"),
        )
        .orderBy("chunk_id")
    )


def _pack_attention_oracle() -> str:
    """Oracle for ``pack_attention_boundaries``: the v-chain + layout
    CTEs, then every doc's span exploded to the chunks it touches and
    a per-chunk boundary rollup."""
    parts = _bpe_vchain_parts()
    tail = """,
{LAYOUT},
spans AS (
  SELECT g.doc_id, g.off0, d.n_tokens,
         (g.off0 // {K})::BIGINT AS c0,
         ((g.off0 + d.n_tokens - 1) // {K})::BIGINT AS c1
  FROM goff g JOIN doctot d USING (doc_id)
  WHERE d.n_tokens > 0
),
dc AS (
  SELECT doc_id, off0, n_tokens, c0, u AS chunk_id
  FROM spans, unnest(range(c0, c1 + 1)) AS t(u)
)
SELECT chunk_id::BIGINT AS chunk_id,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN chunk_id = c0 THEN 1 ELSE 0 END)::BIGINT
         AS n_boundaries,
       coalesce(sum(CASE WHEN chunk_id = c0
                         THEN off0 - chunk_id * {K} + 1 END), 0)::BIGINT
         AS boundary_off_sum1,
       min(CASE WHEN chunk_id = c0 THEN off0 - chunk_id * {K} END)::BIGINT
         AS first_boundary_off,
       max(CASE WHEN chunk_id = c0 THEN off0 - chunk_id * {K} END)::BIGINT
         AS last_boundary_off,
       max(CASE WHEN off0 < chunk_id * {K} THEN 1 ELSE 0 END)::BIGINT
         AS carry_in,
       max(CASE WHEN off0 + n_tokens > (chunk_id + 1) * {K}
                THEN 1 ELSE 0 END)::BIGINT AS carry_out
FROM dc GROUP BY chunk_id ORDER BY chunk_id""".format(
        K=IDS_CHUNK, LAYOUT=_bpe_layout_sql()
    )
    return "WITH " + ",\n".join(parts) + tail


@register(
    "pack_attention_boundaries",
    oracle=_pack_attention_oracle(),
    tags=("text", "curation", "packing", "attention"),
)
def pack_attention_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attention-boundary manifest — the EOD-token contract a training
    reader needs when packed sequences cross documents (r10 verdict
    item 6, the missing link after bpe_encode_ids): for every
    IDS_CHUNK-token context window, WHERE inside the window new
    documents start (the attention-reset offsets: n_boundaries, their
    1-based offset sum pinning the set, first/last offset) and whether
    the window starts/ends mid-document (carry_in / carry_out — a
    carry_in window must NOT reset attention at position 0; a
    carry_out window's tail tokens attend into the next window's
    head under sliding-window packing).

    Derivation shares bpe_encode_ids' coordinate system verbatim
    (_bpe_token_layout: same merge replay, same md5(doc_id) packing
    order, same two-phase prefix sum), so the two manifests reconcile
    by construction: per-chunk n_docs here == bpe_encode_ids' n_docs,
    Σ n_boundaries == the tokenized doc count, and carry_out(c) ==
    carry_in(c+1) (tested).

    Scale shape: docs never explode to tokens here — each doc emits
    ONE row per chunk it touches (corpus tokens / IDS_CHUNK + n_docs
    rows total), the rollup groups on chunk_id (uniform by
    construction), and the layout's prefix sum is the bounded
    two-phase bucket scheme. No new shuffle class."""
    _, _, layout = _bpe_token_layout(spark, sf_dir)
    return attention_manifest_from_layout(layout)


def attention_manifest_from_layout(layout: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, off0) -> the per-chunk boundary manifest —
    factored (expressions byte-identical to the r11 body) so the
    streaming attention-manifest face republishes the exact batch
    derivation over its persistent layout."""
    K = IDS_CHUNK
    spans = layout.where(F.col("n_tokens") > 0).select(
        "doc_id",
        "off0",
        "n_tokens",
        F.expr(f"off0 div {K}").alias("c0"),
        F.expr(f"(off0 + n_tokens - 1) div {K}").alias("c1"),
    )
    dc = spans.select(
        "doc_id",
        "off0",
        "n_tokens",
        "c0",
        F.explode(F.sequence("c0", "c1")).alias("chunk_id"),
    )
    starts = F.col("chunk_id") == F.col("c0")
    boff_in = F.col("off0") - F.col("chunk_id") * K
    return (
        dc.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(starts.cast("int")).cast("bigint").alias("n_boundaries"),
            F.coalesce(F.sum(F.when(starts, boff_in + 1)), F.lit(0))
            .cast("bigint")
            .alias("boundary_off_sum1"),
            F.min(F.when(starts, boff_in))
            .cast("bigint")
            .alias("first_boundary_off"),
            F.max(F.when(starts, boff_in))
            .cast("bigint")
            .alias("last_boundary_off"),
            F.max((F.col("off0") < F.col("chunk_id") * K).cast("int"))
            .cast("bigint")
            .alias("carry_in"),
            F.max(
                (
                    F.col("off0") + F.col("n_tokens")
                    > (F.col("chunk_id") + 1) * K
                ).cast("int")
            )
            .cast("bigint")
            .alias("carry_out"),
        )
        .orderBy("chunk_id")
    )


def _pack_bestfit_oracle() -> str:
    """Oracle for ``pack_bestfit_report``: the v-chain + layout CTEs,
    then item-sequential best-fit-decreasing as a recursive CTE whose
    state is the list of open-bin remaining capacities (bounded by the
    item count — the driver checks at sf0.01; the Spark side runs the
    equivalent bulk histogram algorithm, operators/packing.py)."""
    parts = _bpe_vchain_parts()
    tail = """,
{LAYOUT},
items AS (
  SELECT n_tokens % {K} AS l,
         row_number() OVER (ORDER BY n_tokens % {K} DESC, h, doc_id) AS rn
  FROM doctot WHERE n_tokens % {K} > 0
),
pack AS (
  SELECT 0::BIGINT AS rn, []::BIGINT[] AS caps
  UNION ALL
  SELECT p.rn + 1,
    CASE WHEN list_min(list_filter(p.caps, c -> c >= i.l)) IS NULL
         THEN list_append(p.caps, {K} - i.l)
         ELSE list_append(
                list_concat(
                  list_slice(p.caps, 1,
                    list_position(p.caps,
                      list_min(list_filter(p.caps, c -> c >= i.l))) - 1),
                  list_slice(p.caps,
                    list_position(p.caps,
                      list_min(list_filter(p.caps, c -> c >= i.l))) + 1,
                    len(p.caps))),
                list_min(list_filter(p.caps, c -> c >= i.l)) - i.l)
    END
  FROM pack p JOIN items i ON i.rn = p.rn + 1
),
bfagg AS (
  SELECT len(caps)::BIGINT AS loop_bins,
         coalesce(list_sum(caps), 0)::BIGINT AS loop_pad
  FROM pack WHERE rn = (SELECT count(*) FROM items)
),
tot AS (
  SELECT count(*)::BIGINT AS n_docs,
         coalesce(sum(n_tokens), 0)::BIGINT AS n_tokens,
         coalesce(sum(n_tokens // {K}), 0)::BIGINT AS full_bins,
         coalesce(sum((n_tokens + {K} - 1) // {K} - 1), 0)::BIGINT
           AS split_bf,
         coalesce(sum(CASE WHEN n_tokens % {K} > 0 THEN 1 ELSE 0 END), 0)
           ::BIGINT AS n_items
  FROM doctot WHERE n_tokens > 0
),
csplit AS (
  SELECT coalesce(sum((g.off0 + d.n_tokens - 1) // {K} - g.off0 // {K}), 0)
           ::BIGINT AS split_c
  FROM doctot d JOIN goff g USING (doc_id) WHERE d.n_tokens > 0
)
SELECT 'bestfit' AS strategy, t.n_docs, t.n_items,
       (t.full_bins + b.loop_bins)::BIGINT AS n_bins, t.n_tokens,
       b.loop_pad AS padding_tokens,
       ((10000 * b.loop_pad)
        // nullif((t.full_bins + b.loop_bins) * {K}, 0))::BIGINT
         AS waste_bp,
       t.split_bf AS split_events
FROM tot t CROSS JOIN bfagg b
UNION ALL
SELECT 'concat', t.n_docs, t.n_docs,
       ((t.n_tokens + {K} - 1) // {K})::BIGINT, t.n_tokens,
       (({K} - t.n_tokens % {K}) % {K})::BIGINT,
       ((10000 * (({K} - t.n_tokens % {K}) % {K}))
        // nullif(((t.n_tokens + {K} - 1) // {K}) * {K}, 0))::BIGINT,
       c.split_c
FROM tot t CROSS JOIN csplit c
ORDER BY strategy""".format(K=IDS_CHUNK, LAYOUT=_bpe_layout_sql())
    return "WITH RECURSIVE " + ",\n".join(parts) + tail


@register(
    "pack_bestfit_report",
    oracle=_pack_bestfit_oracle(),
    tags=("text", "curation", "packing", "iterative"),
)
def pack_bestfit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency A/B — the measurement that decides a real
    training-reader layout (r11 verdict item 6): concat-and-chunk
    (bpe_encode_ids / pack_chunks' strategy: documents concatenated in
    md5(doc_id) order, cut every IDS_CHUNK tokens) versus greedy
    best-fit-decreasing bin packing (docs longer than a window
    pre-split into full windows + a remainder item; items then packed
    largest-first into the fullest window that fits — the
    no-cross-contamination layout of Krell et al. 2021's sequence-
    packing family). Per strategy: window count, padding tokens,
    waste_bp, and split_events (times a document is cut mid-stream ==
    windows that start mid-document, the carry_in count of
    pack_attention_boundaries' coordinate system).

    Reconciliation contracts (tested): n_tokens equals
    Σ bpe_encode_ids chunk n_tokens; concat's n_bins equals
    bpe_encode_ids' chunk count; concat's split_events equals
    Σ (c1 - c0) over pack_attention_boundaries' spans; bestfit packs
    with no more bins than concat... plus padding only in open bins.

    Scale shape: BFD is sequential per ITEM but exact over the
    (length, count) HISTOGRAM, which is bounded by IDS_CHUNK rows
    regardless of corpus size — operators/packing.py runs the bulk
    cascade over that bounded relation (the kmeans-centroids driver
    contract); everything else is one agg over the shared
    _bpe_token_layout doc layout. Tagged iterative for the plan gate
    (driver loop builds literal scalars, not a plan)."""
    from wally_spark.operators.checkpoint import pin
    from wally_spark.operators.packing import bestfit_pack_stats

    K = IDS_CHUNK
    _, _, layout = _bpe_token_layout(spark, sf_dir)
    lay = pin(layout.where(F.col("n_tokens") > 0))
    hist = (
        lay.select(F.expr(f"n_tokens % {K}").alias("l"))
        .where(F.col("l") > 0)
        .groupBy("l")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    loop_bins, loop_pad = bestfit_pack_stats(hist, K)
    tot = lay.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
        F.coalesce(F.sum(F.expr(f"n_tokens div {K}")), F.lit(0))
        .cast("bigint")
        .alias("full_bins"),
        F.coalesce(
            F.sum(F.expr(f"(n_tokens + {K} - 1) div {K} - 1")), F.lit(0)
        )
        .cast("bigint")
        .alias("split_bf"),
        F.coalesce(
            F.sum(F.expr(f"case when n_tokens % {K} > 0 then 1 else 0 end")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_items"),
        F.coalesce(
            F.sum(
                F.expr(
                    f"(off0 + n_tokens - 1) div {K} - off0 div {K}"
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("split_c"),
    )
    bf = tot.select(
        F.lit("bestfit").alias("strategy"),
        "n_docs",
        "n_items",
        (F.col("full_bins") + F.lit(loop_bins))
        .cast("bigint")
        .alias("n_bins"),
        "n_tokens",
        F.lit(loop_pad).cast("bigint").alias("padding_tokens"),
        F.expr(
            f"cast((10000 * {loop_pad}) div"
            f" nullif((full_bins + {loop_bins}) * {K}, 0) as bigint)"
        ).alias("waste_bp"),
        F.col("split_bf").alias("split_events"),
    )
    cc = tot.select(
        F.lit("concat").alias("strategy"),
        "n_docs",
        F.col("n_docs").alias("n_items"),
        F.expr(f"cast((n_tokens + {K} - 1) div {K} as bigint)").alias(
            "n_bins"
        ),
        "n_tokens",
        F.expr(f"cast(({K} - n_tokens % {K}) % {K} as bigint)").alias(
            "padding_tokens"
        ),
        F.expr(
            f"cast((10000 * (({K} - n_tokens % {K}) % {K})) div"
            f" nullif(((n_tokens + {K} - 1) div {K}) * {K}, 0) as bigint)"
        ).alias("waste_bp"),
        F.col("split_c").alias("split_events"),
    )
    return bf.unionByName(cc).orderBy("strategy")


def _bpe_decode_oracle() -> str:
    """Oracle for ``bpe_decode_check``: the v-chain + layout CTEs (for
    dw/wsyms), the dense id table, then every token encoded id->symbol
    AND decoded back symbol<-id through the SAME table before the
    per-doc reconstruction — the id table is traversed both ways, so a
    drifted row breaks the md5 equality."""
    parts = _bpe_vchain_parts()
    tail = """,
{LAYOUT},
tokvocab AS (
  SELECT sym, (row_number() OVER (ORDER BY sym) - 1)::BIGINT AS token_id
  FROM (SELECT DISTINCT unnest(sy) AS sym FROM wsyms)
),
tok2 AS (
  SELECT doc_id, wpos, u.p AS spos, u.s AS sym
  FROM (SELECT doc_id, wpos,
               list_transform(range(1, len(sy)+1),
                              i -> {{'p': i, 's': sy[i]}}) AS ps
        FROM dw JOIN wsyms USING (word)),
       unnest(ps) AS t(u)
),
dec AS (
  SELECT t2.doc_id, t2.wpos, t2.spos, inv.sym AS dsym
  FROM tok2 t2
  JOIN tokvocab enc ON t2.sym = enc.sym
  JOIN tokvocab inv ON enc.token_id = inv.token_id
),
docdec AS (
  SELECT doc_id,
         string_agg(CASE WHEN spos = 1 AND wpos > 1
                         THEN ' ' || dsym ELSE dsym END,
                    '' ORDER BY wpos, spos) AS decoded,
         count(*)::BIGINT AS n_tokens
  FROM dec GROUP BY doc_id
),
verdicts AS (
  SELECT d.lang, d.source,
         CASE WHEN md5(coalesce(x.decoded, '')) =
                   md5(array_to_string(
                     list_filter(string_split(lower(d.text), ' '),
                                 w -> w <> ''), ' '))
              THEN 1 ELSE 0 END AS ok,
         coalesce(x.n_tokens, 0) AS n_tokens
  FROM documents d LEFT JOIN docdec x USING (doc_id)
)
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(ok)::BIGINT AS n_ok,
       sum(n_tokens)::BIGINT AS n_tokens
FROM verdicts GROUP BY lang, source
ORDER BY lang, source""".format(LAYOUT=_bpe_layout_sql())
    return "WITH " + ",\n".join(parts) + tail


def decode_check_report(
    docs_meta: DataFrame, wsyms: DataFrame, dwj: DataFrame
) -> DataFrame:
    """The encode->decode->reconstruct->verify report body shared
    VERBATIM by the batch ``bpe_decode_check`` lane and the streaming
    ``decode_check_foreach_batch`` face (r12 verdict item 5):
    ``docs_meta`` is (doc_id, lang, source, norm_md5), ``wsyms`` the
    corpus vocabulary's per-word symbol lists, ``dwj`` the ordered
    (doc_id, wpos, sy) stream. Expressions byte-identical to the r12
    lane body (the factoring rule: the lane re-enters the driver
    window anyway)."""
    tokvocab = (
        wsyms.select(F.explode("sy").alias("sym"))
        .distinct()
        .select(
            "sym",
            (F.row_number().over(Window.orderBy("sym")) - 1)
            .cast("bigint")
            .alias("token_id"),
        )
    )
    inv = tokvocab.select(
        F.col("token_id").alias("tid"), F.col("sym").alias("dsym")
    )
    toks = dwj.select(
        "doc_id", "wpos", F.posexplode("sy").alias("spos0", "sym")
    ).select("doc_id", "wpos", (F.col("spos0") + 1).alias("spos"), "sym")
    dec = (
        toks.join(F.broadcast(tokvocab), "sym")
        .join(F.broadcast(inv), F.col("token_id") == F.col("tid"))
        .select(
            "doc_id",
            "wpos",
            "spos",
            # dw's wpos is 0-based (posexplode); the oracle's is
            # 1-based — only the very first word skips the separator
            F.when(
                (F.col("spos") == 1) & (F.col("wpos") > 0),
                F.concat(F.lit(" "), F.col("dsym")),
            )
            .otherwise(F.col("dsym"))
            .alias("piece"),
        )
    )
    docdec = dec.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("wpos", "spos", "piece"))
                ),
                lambda x: x["piece"],
            ),
        ).alias("decoded"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )
    verdicts = docs_meta.join(docdec, "doc_id", "left").select(
        "lang",
        "source",
        F.when(
            F.md5(F.coalesce(F.col("decoded"), F.lit("")).cast("binary"))
            == F.col("norm_md5"),
            1,
        )
        .otherwise(0)
        .alias("ok"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
    )
    return (
        verdicts.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ok").cast("bigint").alias("n_ok"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang", "source")
    )



@register(
    "bpe_decode_check",
    oracle=_bpe_decode_oracle(),
    tags=("text", "curation", "tokenizer"),
)
def bpe_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip integrity — the check that catches
    id-table drift bpe_encode_ids' positional checksum can't LOCALIZE
    (r11 verdict item 7): every token is encoded symbol -> dense id
    and decoded back id -> symbol through the same table (both joins
    are real, so one drifted row breaks the equality), documents are
    reconstructed from the decoded stream in (word, symbol) order, and
    md5(decoded) is compared against md5 of the normalized original
    (lowercased, whitespace-collapsed — exactly the corpus the
    tokenizer saw). Exported as the per-(lang, source) integrity
    report a corpus owner monitors: n_docs / n_ok / token mass. Empty
    documents round-trip to the empty string and count ok.

    Scale shape: the decode is two broadcast joins against the
    BOUNDED id table (|alphabet| + merge rounds); reconstruction is
    one per-doc ordered concat (per-doc bounded, the same aggregation
    class as the text lanes' word lists); the report rollup groups on
    the low-cardinality (lang, source)."""
    wsyms, dwj, _ = _bpe_token_layout(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.concat_ws(" ", _words_col()).cast("binary")).alias(
            "norm_md5"
        ),
    )
    return decode_check_report(docs, wsyms, dwj)


def _pack_contamination_oracle() -> str:
    parts = _bpe_vchain_parts()
    tail = """,
{LAYOUT},
spans AS (
  SELECT g.doc_id, d2.lang, d2.source,
         (g.off0 // {K})::BIGINT AS c0,
         ((g.off0 + d.n_tokens - 1) // {K})::BIGINT AS c1
  FROM goff g JOIN doctot d USING (doc_id)
  JOIN documents d2 USING (doc_id)
  WHERE d.n_tokens > 0
),
dc AS (
  SELECT doc_id, lang, source, u AS chunk_id
  FROM spans, unnest(range(c0, c1 + 1)) AS t(u)
)
SELECT chunk_id::BIGINT AS chunk_id,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT source)::BIGINT AS n_sources,
       count(DISTINCT lang)::BIGINT AS n_langs,
       (CASE WHEN count(DISTINCT source) > 1 THEN 1 ELSE 0 END)::BIGINT
         AS cross_source,
       (CASE WHEN count(DISTINCT lang) > 1 THEN 1 ELSE 0 END)::BIGINT
         AS cross_lang
FROM dc GROUP BY chunk_id ORDER BY chunk_id""".format(
        K=IDS_CHUNK, LAYOUT=_bpe_layout_sql()
    )
    return "WITH " + ",\n".join(parts) + tail


@register(
    "pack_contamination_report",
    oracle=_pack_contamination_oracle(),
    tags=("text", "curation", "packing", "attention"),
)
def pack_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-contamination manifest for concat-and-chunk packing: per
    IDS_CHUNK context window, how many documents, SOURCES, and
    LANGUAGES contribute tokens, with cross_source / cross_lang flags
    — the packing artifact a training run inherits when attention is
    NOT reset at document boundaries (the measurement motivating the
    no-cross-contamination layouts pack_bestfit_report prices, and the
    mask pack_attention_boundaries exports). A window flagged
    cross_lang under causal attention lets, e.g., German tokens attend
    into an unrelated English document.

    Same coordinate system as bpe_encode_ids (_bpe_token_layout), so
    per-chunk n_docs reconciles with pack_attention_boundaries'
    n_docs column exactly (tested). Scale shape: one row per (doc,
    touched chunk) — never per token; distinct-counts group on
    chunk_id, uniform by construction."""
    _, _, layout = _bpe_token_layout(spark, sf_dir)
    K = IDS_CHUNK
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    spans = (
        layout.where(F.col("n_tokens") > 0)
        .join(docs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.expr(f"off0 div {K}").alias("c0"),
            F.expr(f"(off0 + n_tokens - 1) div {K}").alias("c1"),
        )
    )
    dc = spans.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.sequence("c0", "c1")).alias("chunk_id"),
    )
    return (
        dc.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.when(F.countDistinct("source") > 1, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("cross_source"),
            F.when(F.countDistinct("lang") > 1, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("cross_lang"),
        )
        .orderBy("chunk_id")
    )


def _bpe_half_parts(tag: str, cond: str) -> list:
    """The bpe_merges_r4 unrolled chain, CTE names suffixed ``_tag``
    and the token stream filtered by ``cond`` — the per-half trainer
    for bpe_merge_stability."""
    d, dd = "chr(1)", "chr(1)||chr(1)"
    parts = [
        """tok_{g} AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents WHERE {cond}
),
wc_{g} AS (SELECT word, count(*) AS c FROM tok_{g} GROUP BY word),
v0_{g} AS (
  SELECT {d} || array_to_string(
           list_transform(range(1, len(word)+1), i -> substr(word, i, 1)),
           {dd}) || {d} AS s, c
  FROM wc_{g}
)""".format(g=tag, cond=cond, d=d, dd=dd)
    ]
    for r in range(BPE_ROUNDS):
        parts.append(
            """p{r}_{g} AS (
  SELECT u.a AS a, u.b AS b, sum(c)::BIGINT AS cnt
  FROM (
    SELECT list_transform(range(1, len(sy)), i -> {{'a': sy[i], 'b': sy[i+1]}}) AS ps, c
    FROM (SELECT string_split(substr(s, 2, len(s)-2), {dd}) AS sy, c FROM v{r}_{g})
  ), unnest(ps) AS t(u)
  GROUP BY u.a, u.b
),
t{r}_{g} AS (SELECT a, b, cnt FROM p{r}_{g} ORDER BY cnt DESC, a, b LIMIT 1)""".format(
                r=r, g=tag, dd=dd
            )
        )
        if r < BPE_ROUNDS - 1:
            parts.append(
                """v{n}_{g} AS (
  SELECT replace(s, {d}||a||{dd}||b||{d}, {d}||a||b||{d}) AS s, c
  FROM v{r}_{g} CROSS JOIN t{r}_{g}
)""".format(r=r, n=r + 1, g=tag, d=d, dd=dd)
            )
    return parts


_HALF_NIB = "strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1"


def _bpe_stability_oracle() -> str:
    parts = (
        _bpe_half_parts("h0", f"{_HALF_NIB} < 8")
        + _bpe_half_parts("h1", f"{_HALF_NIB} >= 8")
    )
    wins = ",\n".join(
        "wins_{g} AS ({u})".format(
            g=g,
            u="\nUNION ALL\n".join(
                f"SELECT {r + 1}::BIGINT AS merge_round, a||b AS merged,"
                f" cnt FROM t{r}_{g}"
                for r in range(BPE_ROUNDS)
            ),
        )
        for g in ("h0", "h1")
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + ",\n"
        + wins
        + f""",
spine AS (SELECT (unnest(range({BPE_ROUNDS})) + 1)::BIGINT AS merge_round)
SELECT s.merge_round,
       wa.merged AS h0_merged, wa.cnt::BIGINT AS h0_count,
       wb.merged AS h1_merged, wb.cnt::BIGINT AS h1_count,
       (CASE WHEN wa.merged IS NOT NULL AND wa.merged = wb.merged
             THEN 1 ELSE 0 END)::BIGINT AS agree
FROM spine s
LEFT JOIN wins_h0 wa USING (merge_round)
LEFT JOIN wins_h1 wb USING (merge_round)
ORDER BY s.merge_round"""
    )


@register(
    "bpe_merge_stability",
    oracle=_bpe_stability_oracle(),
    tags=("text", "curation", "tokenizer"),
)
def bpe_merge_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training robustness, measured: split the corpus into
    deterministic md5(doc_id) halves, train the BPE_ROUNDS merge loop
    independently on each, and report round-by-round whether the two
    halves pick the SAME winning merge (with both winners and counts).
    Early-round disagreement means the tokenizer a pipeline trains is
    an artifact of which shard of the crawl it saw — the go/no-go
    number before freezing a merge table (the same halves discipline
    as split_train_holdout).

    Scale shape: each half collapses to its (word, count) vocabulary
    once; every round is O(vocab x word_len) corpus-size independent
    with a 1-row pinned winner (the bpe_merges_r4 loop, run twice);
    the report is BPE_ROUNDS rows off a literal spine, so empty
    corpora/halves yield NULL winners, never a crash."""
    from wally_spark.operators.checkpoint import pin

    d = _BPE_D
    docs = _docs(spark, sf_dir)
    nib = F.conv(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
        ),
        16,
        10,
    ).cast("int")

    def winners(half_docs: DataFrame) -> DataFrame:
        # the bpe_merges_r4 loop (r13 literal-winner spelling via
        # _bpe_replay_winners: one counting job per round, no pinned
        # 1-row frames) — run once per half
        tok = half_docs.select(F.explode(_words_col()).alias("word"))
        wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
        s0 = F.concat(
            F.lit(d),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                ),
                d + d,
            ),
            F.lit(d),
        )
        vocab = pin(wc.select(s0.alias("s"), "c"))
        ws = _bpe_replay_winners(vocab)
        return spark.createDataFrame(
            [(r + 1, a + b, cnt) for r, (a, b, cnt) in enumerate(ws)],
            "merge_round bigint, merged string, cnt bigint",
        )

    wa = winners(docs.where(nib < 8)).select(
        "merge_round",
        F.col("merged").alias("h0_merged"),
        F.col("cnt").alias("h0_count"),
    )
    wb = winners(docs.where(nib >= 8)).select(
        "merge_round",
        F.col("merged").alias("h1_merged"),
        F.col("cnt").alias("h1_count"),
    )
    spine = spark.range(1, BPE_ROUNDS + 1).select(
        F.col("id").cast("bigint").alias("merge_round")
    )
    return (
        spine.join(wa, "merge_round", "left")
        .join(wb, "merge_round", "left")
        .select(
            "merge_round",
            "h0_merged",
            F.col("h0_count").cast("bigint").alias("h0_count"),
            "h1_merged",
            F.col("h1_count").cast("bigint").alias("h1_count"),
            F.when(
                F.col("h0_merged").isNotNull()
                & (F.col("h0_merged") == F.col("h1_merged")),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("agree"),
        )
        .orderBy("merge_round")
    )


# --- DSIR importance resampling (r7) ----------------------------------------
DSIR_BUCKETS = 512  # hashed n-gram feature space
DSIR_TARGET_LANG = "en"  # the "target distribution" seed slice

_DSIR_BUCKET_SQL = "((" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(f), {k + 1}, 1)) - 1)"
    f" * {16 ** (7 - k)}"
    for k in range(8)
) + f") % {DSIR_BUCKETS})"


@register(
    "dsir_importance",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
feats AS (
  SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b, count(*) AS c
  FROM (
    SELECT doc_id, lang, unnest(words) AS f FROM w
    UNION ALL
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(words)),
                                 i -> words[i] || ' ' || words[i+1])) AS f
    FROM w WHERE len(words) >= 2
  )
  GROUP BY doc_id, lang, b
),
r_counts AS (SELECT b, sum(c) AS rc FROM feats GROUP BY b),
t_counts AS (
  SELECT b, sum(c) AS tc FROM feats WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
),
totals AS (
  SELECT sum(c) AS rt,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN c ELSE 0 END) AS tt
  FROM feats
),
dw AS (
  SELECT r.b,
         floor(1000.0 * ln((coalesce(t.tc, 0) + 1.0) / (totals.tt + {DSIR_BUCKETS}.0)))::BIGINT
         - floor(1000.0 * ln((r.rc + 1.0) / (totals.rt + {DSIR_BUCKETS}.0)))::BIGINT AS w_mnat
  FROM r_counts r LEFT JOIN t_counts t ON r.b = t.b CROSS JOIN totals
)
SELECT f.doc_id,
       sum(f.c)::BIGINT AS n_feats,
       sum(f.c * dw.w_mnat)::BIGINT AS score_mnat,
       (sum(f.c * dw.w_mnat) > 0) AS selected
FROM feats f JOIN dw ON f.b = dw.b
GROUP BY f.doc_id
""",
    tags=("text", "curation", "sampling"),
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every document by how much more likely it is under a
    TARGET distribution (here the DSIR_TARGET_LANG slice, standing in
    for a high-quality seed corpus) than under the RAW corpus distribution,
    using bag-of-hashed-ngrams (unigram + bigram) models. Per doc:
    score = sum over features of count x (log th_target - log th_raw),
    Laplace-smoothed; ``selected`` marks positive-importance docs (the
    deterministic variant of the paper's Gumbel-noise resampling).

    Float discipline: each feature's log-likelihood ratio floors ONCE
    to integer milli-nats (the text_lm_perplexity / doc_nb_classifier
    convention), after which per-doc scoring is exact bigint
    arithmetic — partition- and engine-independent.

    Scale shape: features hash into DSIR_BUCKETS buckets (md5 first-8-
    hex ints, engine-identical), so BOTH language models live in ONE
    bounded relation (DSIR_BUCKETS rows) regardless of corpus size —
    it broadcasts to the scoring join. One explode + (doc, bucket)
    aggregate, two bounded model aggregates, one broadcast join back,
    one doc-keyed sum. No vocabulary blowup, no driver state."""
    docs = _docs(spark, sf_dir)
    w = docs.select("doc_id", "lang", _words_col().alias("words"))
    uni = w.select("doc_id", "lang", F.explode("words").alias("f"))
    bi = w.where(F.size("words") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1),"
                " i -> concat(element_at(words, i), ' ', element_at(words, i+1)))"
            )
        ).alias("f"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("bigint"),
        F.lit(DSIR_BUCKETS),
    )
    feats = (
        uni.unionByName(bi)
        .select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from wally_spark.operators.checkpoint import pin

    feats = pin(feats)  # feeds the two model aggs AND the scoring join
    is_t = F.col("lang") == DSIR_TARGET_LANG
    r_counts = feats.groupBy("b").agg(F.sum("c").alias("rc"))
    t_counts = feats.where(is_t).groupBy("b").agg(F.sum("c").alias("tc"))
    totals = feats.agg(
        F.sum("c").alias("rt"),
        F.sum(F.when(is_t, F.col("c")).otherwise(0)).alias("tt"),
    )
    dw = (
        r_counts.join(t_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.floor(
                    1000.0
                    * F.log(
                        (F.coalesce("tc", F.lit(0)) + 1.0)
                        / (F.col("tt") + float(DSIR_BUCKETS))
                    )
                ).cast("bigint")
                - F.floor(
                    1000.0
                    * F.log((F.col("rc") + 1.0) / (F.col("rt") + float(DSIR_BUCKETS)))
                ).cast("bigint")
            ).alias("w_mnat"),
        )
    )
    return (
        feats.join(F.broadcast(dw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("w_mnat")).cast("bigint").alias("score_mnat"),
            (F.sum(F.col("c") * F.col("w_mnat")) > 0).alias("selected"),
        )
    )


# --- bigram-LM perplexity (r7) ----------------------------------------------
BG_VOCAB = 64  # top-B bigram table; everything else is the UNK bucket


@register(
    "text_lm_bigram",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
),
bg AS (
  SELECT doc_id, b.x AS x, b.y AS y
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                                     i -> {{'x': words[i], 'y': words[i + 1]}})) AS b
        FROM w WHERE len(words) >= 2)
),
train_bg AS (
  SELECT x, y, count(*) AS c FROM bg
  WHERE substring(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')
  GROUP BY x, y
),
ctx AS (SELECT x, sum(c)::BIGINT AS cx FROM train_bg GROUP BY x),
tt AS (SELECT sum(c)::BIGINT AS t_bi FROM train_bg),
top AS (
  SELECT x, y, c FROM (
    SELECT x, y, c, row_number() OVER (ORDER BY c DESC, x, y) AS rk
    FROM train_bg) WHERE rk <= {BG_VOCAB}
),
probs AS (
  SELECT t.x, t.y,
         floor(1000.0 * ln((t.c + 1)::DOUBLE / (ctx.cx + {BG_VOCAB} + 1)))
           ::BIGINT AS mnat
  FROM top t JOIN ctx ON ctx.x = t.x
),
unk AS (SELECT floor(1000.0 * ln(1.0 / (t_bi + 1)))::BIGINT AS unk_mnat FROM tt),
scored AS (
  SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
         sum(CASE WHEN p.mnat IS NULL THEN 0 ELSE p.mnat END)::BIGINT AS seen,
         sum(CASE WHEN p.mnat IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unk
  FROM bg LEFT JOIN probs p USING (x, y)
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams,
       (-(seen + n_unk * unk_mnat))::BIGINT AS nll_mnat,
       ((-(seen + n_unk * unk_mnat)) // n_bigrams)::BIGINT AS mnat_per_bigram
FROM scored, unk
""",
    tags=("text", "curation", "quality", "lm"),
)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity gate — the context-aware upgrade of
    text_lm_perplexity (CCNet uses a 5-gram KenLM; the plan shape of
    any fixed-order n-gram LM is this one): train Laplace-smoothed
    bigram probabilities over the deterministic md5-quarter sample,
    cap the table at the BG_VOCAB most frequent bigrams (TakeOrdered,
    broadcast bounded BY CONSTRUCTION), map every other bigram to one
    UNK log-mass derived from the training total, and score each doc's
    negative log-likelihood per bigram. A doc scoring far above the
    corpus's typical mnat_per_bigram reads as shuffled/gibberish text
    even when its unigram distribution looks normal — exactly what the
    bigram order adds.

    Float discipline: identical to the unigram lane — every
    log-probability floors ONCE to integer milli-nats (log of a ratio
    of exact integers), then pure bigint sums and integral division.
    Scale shape: bigram expansion is a flat generator collapsed by
    map-side combine; context counts ride the same aggregate; scoring
    is one explode + broadcast left-join + doc-keyed aggregate (one
    shuffle); the 1-row training-total combine is broadcast."""
    docs = _docs(spark, sf_dir)

    def bigrams_of(d):
        w = d.select("doc_id", _words_col().alias("words")).where(
            F.size("words") >= 2
        )
        return w.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.struct(
                        F.element_at("words", i).alias("x"),
                        F.element_at("words", (i + 1).cast("int")).alias("y"),
                    ),
                )
            ).alias("b"),
        ).select("doc_id", "b.x", "b.y")

    bg = bigrams_of(docs)
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    train = (
        bigrams_of(docs.where(sampled))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = train.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    tt = train.agg(F.sum("c").cast("bigint").alias("t_bi"))
    top = train.orderBy(F.desc("c"), "x", "y").limit(BG_VOCAB)
    probs = top.join(F.broadcast(ctx), "x").select(
        "x",
        "y",
        F.floor(
            1000.0
            * F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("cx") + BG_VOCAB + 1)
            )
        )
        .cast("bigint")
        .alias("mnat"),
    )
    unk = tt.select(
        F.floor(1000.0 * F.log(1.0 / (F.col("t_bi") + 1)))
        .cast("bigint")
        .alias("unk_mnat")
    )
    scored = (
        bg.join(F.broadcast(probs), ["x", "y"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.coalesce("mnat", F.lit(0))).cast("bigint").alias("seen"),
            F.sum(F.when(F.col("mnat").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
        )
    )
    return scored.crossJoin(F.broadcast(unk)).select(
        "doc_id",
        "n_bigrams",
        (-(F.col("seen") + F.col("n_unk") * F.col("unk_mnat")))
        .cast("bigint")
        .alias("nll_mnat"),
        F.expr("(-(seen + n_unk * unk_mnat)) div n_bigrams")
        .cast("bigint")
        .alias("mnat_per_bigram"),
    )


# --- NB score calibration (reliability diagram) ------------------------------
NB_CAL_BAND = 500  # milli-nat score band width


@register(
    "nb_calibration",
    oracle=f"""
WITH base AS ({_NB_ORACLE}),
b AS (
  SELECT floor(score_mnat / {NB_CAL_BAND}.0)::BIGINT AS band,
         pred_en, is_en
  FROM base)
SELECT band, (band * {NB_CAL_BAND})::BIGINT AS lo_mnat,
       count(*)::BIGINT AS n_docs,
       sum(pred_en)::BIGINT AS n_pred_en,
       sum(is_en)::BIGINT AS n_en,
       floor(10000.0 * sum(is_en) / count(*))::BIGINT AS en_rate_bp
FROM b GROUP BY band
""",
    tags=("text", "curation", "classifier"),
)
def nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the NB quality gate: documents bucketed
    by NB_CAL_BAND-wide score bands, each band reporting doc count,
    positive-prediction count, actual-label count, and the realized
    label rate in exact basis points — the calibration audit that
    decides where to put a production filter threshold (a classifier
    can rank well and still be miscalibrated; thresholds must be set
    on THIS curve, not on raw scores).

    Composes the doc_nb_classifier plan unchanged (same training
    sample, vocabulary cap, and integer milli-nat scoring — the oracle
    embeds that lane's SQL verbatim) and adds one band-keyed aggregate
    bounded by the score range / NB_CAL_BAND, so the only new cost is
    a ~10-row rollup. Integer floor arithmetic end to end."""
    base = doc_nb_classifier(spark, sf_dir)
    band = F.floor(F.col("score_mnat") / float(NB_CAL_BAND)).cast("bigint")
    return (
        base.select(
            band.alias("band"),
            "pred_en",
            "is_en",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pred_en").cast("bigint").alias("n_pred_en"),
            F.sum("is_en").cast("bigint").alias("n_en"),
            F.floor(10000.0 * F.sum("is_en") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("en_rate_bp"),
        )
        .select(
            "band",
            (F.col("band") * NB_CAL_BAND).cast("bigint").alias("lo_mnat"),
            "n_docs",
            "n_pred_en",
            "n_en",
            "en_rate_bp",
        )
    )


# --- DataComp-style pool filter with per-rule ablation (r10) -------------------
# Composes the four standing per-doc gates — Gopher rule bundle, NB
# quality classifier, unigram-LM perplexity, near-dup verdict — into
# the one report a pool designer reads: per source, how many docs
# survive ALL gates, how many each gate kills, and how many each gate
# kills ALONE (the ablation column: what relaxing that one gate would
# recover). DataComp (Gadre et al. 2023) and FineWeb publish exactly
# this table per filter candidate.
PPL_MAX_MNAT = 2300  # keep docs at or below this unigram NLL/token

from wally_spark.plans.quality import (  # noqa: E402
    _G_VERDICT_SQL,
    _gopher_feat_sql,
)
from wally_spark.plans.registry import REGISTRY as _REG  # noqa: E402


def _pool_filter_oracle() -> str:
    from wally_spark.plans.dedup import _CAND_SQL
    from wally_spark.plans.dedup import _SHINGLES_SQL as _SH3_SQL

    ppl_oracle = _REG["text_lm_perplexity"].oracle
    keep = "g_ok AND nb_ok AND ppl_ok AND dup_ok"
    only = {
        "gopher": "NOT g_ok AND nb_ok AND ppl_ok AND dup_ok",
        "nb": "g_ok AND NOT nb_ok AND ppl_ok AND dup_ok",
        "ppl": "g_ok AND nb_ok AND NOT ppl_ok AND dup_ok",
        "dup": "g_ok AND nb_ok AND ppl_ok AND NOT dup_ok",
    }
    return f"""
WITH g AS (
  SELECT doc_id, v AS ok FROM (
    {_gopher_feat_sql()}
    SELECT doc_id, {_G_VERDICT_SQL} AS v FROM feat)
),
nb AS (SELECT doc_id, (pred_en = 1) AS ok FROM ({_NB_ORACLE})),
ppl AS (
  SELECT doc_id, (mnat_per_token <= {PPL_MAX_MNAT}) AS ok
  FROM ({ppl_oracle})
),
dupl AS (
  SELECT DISTINCT doc_b AS doc_id FROM (
    WITH shingled AS ({_SH3_SQL}),
    exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
    {_CAND_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
    dup_pairs AS (
      SELECT c.doc_a, c.doc_b, count(*) AS inter
      FROM cand c
      JOIN exploded a ON a.doc_id = c.doc_a
      JOIN exploded b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT dp.doc_b
    FROM dup_pairs dp JOIN sizes sa ON sa.doc_id = dp.doc_a
                      JOIN sizes sb ON sb.doc_id = dp.doc_b
    WHERE 10000.0 * inter / (sa.n + sb.n - inter) >= 8000.0)
),
v AS (
  SELECT d.doc_id, d.source,
         coalesce(g.ok, FALSE) AS g_ok,
         coalesce(nb.ok, FALSE) AS nb_ok,
         coalesce(ppl.ok, FALSE) AS ppl_ok,
         (dupl.doc_id IS NULL) AS dup_ok
  FROM documents d
  LEFT JOIN g ON g.doc_id = d.doc_id
  LEFT JOIN nb ON nb.doc_id = d.doc_id
  LEFT JOIN ppl ON ppl.doc_id = d.doc_id
  LEFT JOIN dupl ON dupl.doc_id = d.doc_id
)
SELECT source,
  count(*)::BIGINT AS n_pool,
  sum(CASE WHEN {keep} THEN 1 ELSE 0 END)::BIGINT AS n_keep,
  ((10000 * sum(CASE WHEN {keep} THEN 1 ELSE 0 END)) // count(*))::BIGINT
    AS keep_bp,
  sum(CASE WHEN NOT g_ok THEN 1 ELSE 0 END)::BIGINT AS n_fail_gopher,
  sum(CASE WHEN NOT nb_ok THEN 1 ELSE 0 END)::BIGINT AS n_fail_nb,
  sum(CASE WHEN NOT ppl_ok THEN 1 ELSE 0 END)::BIGINT AS n_fail_ppl,
  sum(CASE WHEN NOT dup_ok THEN 1 ELSE 0 END)::BIGINT AS n_fail_dup,
  sum(CASE WHEN {only["gopher"]} THEN 1 ELSE 0 END)::BIGINT AS n_only_gopher,
  sum(CASE WHEN {only["nb"]} THEN 1 ELSE 0 END)::BIGINT AS n_only_nb,
  sum(CASE WHEN {only["ppl"]} THEN 1 ELSE 0 END)::BIGINT AS n_only_ppl,
  sum(CASE WHEN {only["dup"]} THEN 1 ELSE 0 END)::BIGINT AS n_only_dup
FROM v GROUP BY source ORDER BY source
"""


@register(
    "pool_filter_report",
    oracle=_pool_filter_oracle(),
    tags=("text", "curation", "pipeline", "quality"),
)
def pool_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataComp-style pool-filter ablation report: every document is
    judged by the four standing gates — gopher_rules' conjunction, the
    NB quality classifier (pred_en), the unigram-LM perplexity cut
    (<= PPL_MAX_MNAT mnat/token), and the near-dup verdict
    (curation_pipeline's >= 0.8-Jaccard loser rule) — then rolled up
    per source: pool size, survivors of ALL gates (+ keep_bp), kills
    per gate, and kills attributable to EACH GATE ALONE (the ablation
    signal: what dropping that gate would recover). Docs with no
    tokens fail the token-based gates (NULL → FALSE) in both engines.

    Scale shape: composition over the gates' own plan shapes (gopher:
    one codegen scan; NB + perplexity: ONE shared explode +
    bounded-broadcast model joins + a single doc-keyed aggregate —
    the two token-gate scoring passes are merged, r13; dup:
    minhash-banded candidates only), stitched by three uniform
    doc-keyed left joins and collapsed to a |sources|-bounded rollup.
    No new shuffle class beyond the gates themselves."""
    return pool_rollup(_pool_doc_verdicts(spark, sf_dir))


def _pool_doc_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id is implicit in construction; returns source + the four
    per-doc gate booleans) — the pool_filter_report body before its
    rollup, factored so the streaming poolgate face and the
    equivalence tests judge documents with the IDENTICAL gate
    expressions. Returns one row per document with g_ok/nb_ok/ppl_ok/
    dup_ok (token-less docs coalesce to False on the token gates in
    both engines)."""
    from wally_spark.plans.dedup import _candidate_jaccard, _jac_bp

    corpus = _docs(spark, sf_dir)
    # r14 (guide §2.4 — remove the shuffle outright): the gopher gate
    # is a stateless row-wise rule bundle, so computing it INLINE on
    # the same scan that supplies (doc_id, source) deletes the
    # corpus-sized docs⋈gopher equi-join (two exchanges + SMJ/SHJ of
    # two corpus-sized relations) and one full document scan. The
    # verdict expression is the gopher_rules lane's own conjunction
    # over _gopher_feat (the streaming poolgate face already computes
    # it this way), so g_raw is bit-identical per doc.
    # Knob: spark.wally.pool.inlinegopher=false restores the join.
    if (
        str(
            spark.conf.get("spark.wally.pool.inlinegopher", "true")
        ).lower()
        == "false"
    ):
        docs_g = (
            corpus.select("doc_id", "source")
            .join(
                _REG["gopher_rules"]
                .spark_fn(spark, sf_dir)
                .select("doc_id", F.col("verdict").alias("g_raw")),
                "doc_id",
                "left",
            )
        )
    else:
        from wally_spark.plans.quality import (
            _gopher_feat,
            _gopher_rule_cols,
        )

        _rules = _gopher_rule_cols()
        _verdict = None
        for _c in _rules.values():
            _verdict = _c if _verdict is None else (_verdict & _c)
        docs_g = _gopher_feat(corpus, "source").select(
            "doc_id", "source", _verdict.alias("g_raw")
        )
    # NB + perplexity gates in ONE corpus pass (r13): both lanes score
    # as explode + bounded-broadcast model join + doc-keyed aggregate,
    # so the report folds them into a single token stream with two
    # broadcast joins and ONE doc-keyed aggregate (full-corpus
    # scan+explode+shuffle 2x -> 1x). The models are the lanes' own
    # factored builds (nb_model / _ppl_model) and every downstream
    # gate expression is the standalone lane's exact integer
    # milli-nat arithmetic, so the booleans are bit-identical.
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    # r14 (guide §6.1 scan reuse): the NB and PPL models train on the
    # SAME sampled corpus, and PPL's per-word count is exactly the NB
    # per-class counts summed (c1 + c0 = count(*) over the same token
    # rows) — so ONE explode+word-aggregate feeds both model builds
    # (was: two independent sampled-corpus scans+explodes+shuffles).
    # Same (word, c) multiset ⇒ same TakeOrdered top-V ⇒ bit-identical
    # probs/stats; oracle parity re-verified.
    # (A/B knob: spark.wally.pool.sharedcounts=false restores the
    # independent per-model builds for same-session measurement.)
    ncounts = nb_token_counts(corpus.where(sampled))
    weights, nstats, priors = nb_model(
        ncounts,
        nb_doc_counts(corpus.where(sampled)),
    )
    if (
        str(
            spark.conf.get("spark.wally.pool.sharedcounts", "true")
        ).lower()
        == "false"
    ):
        probs, pstats = _ppl_model(corpus)
    else:
        probs, pstats = _ppl_model_from_counts(
            ncounts.select(
                "word", (F.col("c1") + F.col("c0")).cast("bigint").alias("c")
            )
        )
    tok = corpus.select("doc_id", F.explode(_words_col()).alias("word"))
    per_doc = (
        tok.join(F.broadcast(weights), "word", "left")
        .join(F.broadcast(probs), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("w", F.lit(0))).cast("bigint").alias("seen_w"),
            F.sum(F.when(F.col("w").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
            F.sum(F.coalesce("mnat", F.lit(0))).cast("bigint").alias("seen_mnat"),
            F.sum(F.when(F.col("mnat").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("ppl_unk"),
        )
    )
    nb_score = F.col("pw") + F.col("seen_w") + F.col("n_unk") * _nb_unk_w()
    scored = (
        per_doc.crossJoin(F.broadcast(nstats))
        .crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            "n_tokens",
            "seen_mnat",
            "ppl_unk",
            (nb_score > 0).alias("nb_raw"),
        )
        .crossJoin(F.broadcast(pstats))
        .select(
            "doc_id",
            "nb_raw",
            (
                F.expr(
                    "CAST(-(seen_mnat + ppl_unk * CAST(floor(1000.0 * ln("
                    "CAST(t_all - t_top + 1 AS DOUBLE) / CAST(t_all + v_top + 1 AS DOUBLE)"
                    ")) AS BIGINT)) DIV n_tokens AS BIGINT)"
                )
                <= PPL_MAX_MNAT
            ).alias("ppl_raw"),
        )
    )
    dups = (
        _candidate_jaccard(spark, sf_dir)
        .where(_jac_bp() >= 8000.0)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        docs_g
        .join(scored, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("g_raw", F.lit(False)).alias("g_ok"),
            F.coalesce("nb_raw", F.lit(False)).alias("nb_ok"),
            F.coalesce("ppl_raw", F.lit(False)).alias("ppl_ok"),
            F.col("is_dup").isNull().alias("dup_ok"),
        )
    )


def pool_rollup(v: DataFrame) -> DataFrame:
    """The per-source ablation rollup over a (source, g_ok, nb_ok,
    ppl_ok, dup_ok) verdict relation — pool_filter_report's aggregate,
    factored so the streaming poolgate face folds its verdict ledger
    through the IDENTICAL expressions."""
    keep = "g_ok AND nb_ok AND ppl_ok AND dup_ok"
    return (
        v.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pool"),
            F.expr(f"sum(CASE WHEN {keep} THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_keep"),
            F.expr(
                f"(10000 * sum(CASE WHEN {keep} THEN 1 ELSE 0 END))"
                " div count(1)"
            )
            .cast("bigint")
            .alias("keep_bp"),
            F.expr("sum(CASE WHEN NOT g_ok THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_fail_gopher"),
            F.expr("sum(CASE WHEN NOT nb_ok THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_fail_nb"),
            F.expr("sum(CASE WHEN NOT ppl_ok THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_fail_ppl"),
            F.expr("sum(CASE WHEN NOT dup_ok THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_fail_dup"),
            F.expr(
                "sum(CASE WHEN NOT g_ok AND nb_ok AND ppl_ok AND dup_ok"
                " THEN 1 ELSE 0 END)"
            )
            .cast("bigint")
            .alias("n_only_gopher"),
            F.expr(
                "sum(CASE WHEN g_ok AND NOT nb_ok AND ppl_ok AND dup_ok"
                " THEN 1 ELSE 0 END)"
            )
            .cast("bigint")
            .alias("n_only_nb"),
            F.expr(
                "sum(CASE WHEN g_ok AND nb_ok AND NOT ppl_ok AND dup_ok"
                " THEN 1 ELSE 0 END)"
            )
            .cast("bigint")
            .alias("n_only_ppl"),
            F.expr(
                "sum(CASE WHEN g_ok AND nb_ok AND ppl_ok AND NOT dup_ok"
                " THEN 1 ELSE 0 END)"
            )
            .cast("bigint")
            .alias("n_only_dup"),
        )
        .orderBy("source")
    )
