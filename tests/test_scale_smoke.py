"""Scale smoke (opt-in: WALLY_SCALE_SMOKE=1): synthesizes a ~6M-row
events table (10× sf0.1) in a temp dir and runs the window/state
headliners on it. Guards against operators that secretly don't scale
(driver-side loops, per-row python, O(n²) joins) — wall time is
asserted loosely; the real signal is completing at all with flat
memory."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("WALLY_SCALE_SMOKE") != "1",
    reason="set WALLY_SCALE_SMOKE=1 to run the 10x scale smoke",
)


@pytest.fixture(scope="module")
def big_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "events")
    n = 6_000_000
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1704067200_000000) + (F.col("id") % 2_592_000) * 1_000_000)
            ).alias("ts"),
            (F.xxhash64("id") % 10_000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")]),
                (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 49000 / 100.0 + 0.01).alias("value"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


def _timed(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_sliding_window_at_10x(spark, big_events):
    dt = _timed(
        big_events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    assert dt < 120, f"sliding window at 10x took {dt:.1f}s"


def test_running_state_at_10x(spark, big_events):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dt = _timed(
        big_events.withColumn("running", F.sum("value").over(w)).where(
            F.col("running") > 100000
        )
    )
    assert dt < 180, f"running state at 10x took {dt:.1f}s"


def test_session_gaps_at_10x(spark, big_events):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        big_events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts").cast("double") - F.col("prev").cast("double") > 600),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(wrun))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    dt = _timed(sess)
    assert dt < 180, f"sessionization at 10x took {dt:.1f}s"


def test_minhash_lsh_at_100x_docs(spark, tmp_path_factory):
    """50k synthetic docs (100x sf0.1's 5000) through the banded
    MinHash path: cost must stay O(docs × shingles), not O(docs²)."""
    vocab = [f"w{i}" for i in range(30)]
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(120)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in vocab]),
                    (F.abs(F.xxhash64(F.col("id"), i)) % 30 + 1).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select("doc_id", words.alias("words"))
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
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")).cast("binary"))
            ).alias(f"mh{h}")
            for h in range(8)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat(F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.band_key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    dt = _timed(pairs)
    assert dt < 300, f"minhash LSH at 100x took {dt:.1f}s"


def test_candidate_jaccard_at_100x_docs(spark, tmp_path_factory):
    """Registered dedup_ngram_jaccard at 100× docs WITH a hot-shingle
    block: 800 docs share a common prefix, which under the round-1 full
    shingle self-join alone contributes ~640k×8 join rows from the hot
    shingles; the candidate-bounded path must stay O(candidates)."""
    sf_dir = str(tmp_path_factory.mktemp("jacscale"))
    vocab = F.array(*[F.lit(f"w{i}") for i in range(5000)])
    rand_words = F.transform(
        F.sequence(F.lit(1), F.lit(120)),
        lambda i: F.element_at(
            vocab, (F.abs(F.xxhash64(F.col("doc_id"), i)) % 5000 + 1).cast("int")
        ),
    )
    hot = F.concat_ws(" ", *[F.lit(f"hot{i}") for i in range(10)])
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 800,
            F.concat(hot, F.lit(" "), F.concat_ws(" ", rand_words)),
        )
        .otherwise(F.concat_ws(" ", rand_words))
        .alias("text"),
        F.lit("synth").alias("source"),
    )
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    t0 = time.perf_counter()
    REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    dt = time.perf_counter() - t0
    assert dt < 300, f"candidate-bounded jaccard at 100x took {dt:.1f}s"


def test_blocked_embedding_pairs_at_5x(spark, tmp_path_factory):
    """Registered dedup_embedding (triangle block join) at 5× sf0.1
    vectors: 10k×10k cosines must run as distributed block matmuls with
    no driver materialization (collect() is banned by test_plans)."""
    sf_dir = str(tmp_path_factory.mktemp("embscale"))
    emb = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.abs(F.xxhash64(F.col("id"), i)) % 2000).cast("float") / 1000.0
                - 1.0
            ),
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    t0 = time.perf_counter()
    REGISTRY["dedup_embedding"].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    assert dt < 300, f"blocked embedding pairs at 5x took {dt:.1f}s"


def test_connected_components_at_scale(spark):
    """1M vertices / 600k-edge graph (mixed chains + cliques):
    propagation stays partition-parallel, rounds bounded by diameter."""
    from wally_spark.operators.components import connected_components

    vertices = spark.range(1_000_000).select(F.col("id"))
    # chains of length 5: (i -> i+1) unless i % 5 == 4; plus skips
    edges = (
        spark.range(750_000)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .where(F.col("id") % 5 != 4)
    )
    t0 = time.perf_counter()
    out = connected_components(vertices, edges)
    n_comp = out.select("comp").distinct().count()
    dt = time.perf_counter() - t0
    # 150k chain components + 250k singletons
    assert n_comp == 400_000
    assert dt < 300, f"connected components at 1M took {dt:.1f}s"


def test_star_components_deep_chain_at_scale(spark):
    """A SINGLE 100k-vertex path — the adversarial shape for label
    propagation (diameter 100k ⇒ 100k rounds, i.e. never finishes).
    Star contraction must label it in its logarithmic round budget."""
    from wally_spark.operators.components import connected_components_star

    n = 100_000
    vertices = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.perf_counter()
    out = connected_components_star(vertices, edges, max_iters=40)
    comps = out.select("comp").distinct().count()
    dt = time.perf_counter() - t0
    assert comps == 1
    assert dt < 300, f"star CC on a 100k path took {dt:.1f}s"


def test_zorder_pruning_at_scale(spark, big_events, tmp_path_factory):
    """Z-order write at 6M rows with the skewed value column: both
    dimensions must still prune after equi-depth ranking (the r5 fix);
    measured from real parquet footers, not a claim."""
    import pyarrow.parquet as pq

    from wally_spark.operators.layout import write_zordered

    out = str(tmp_path_factory.mktemp("zscale") / "z")
    ev = big_events.select("event_id", "user_id", "value")
    t0 = time.perf_counter()
    write_zordered(ev, ["user_id", "value"], out, n_files=32)
    dt = time.perf_counter() - t0

    def hit_fraction(col, lo, hi):
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        hits = 0
        for f in files:
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            idx = md.schema.names.index(col)
            st = [md.row_group(r).column(idx).statistics for r in range(md.num_row_groups)]
            if any(not (s.max < lo or s.min > hi) for s in st):
                hits += 1
        return hits / max(len(files), 1)

    # with 32 files the curve gives user_id 4 equi-depth slices and
    # value 8. user_id here is SIGNED (xxhash64 % n keeps sign), so the
    # [0, 0.1*max] band starts exactly at the median — a slice
    # boundary — and legitimately touches 2 of 4 u-slices (files on
    # both sides really contain band rows): bound 2/4 + merge slack.
    # The value band (10% of a uniform range ⊂ one-ish of 8 slices)
    # must prune much harder.
    stats = ev.agg(F.max("user_id"), F.max("value")).collect()[0]
    assert hit_fraction("user_id", 0, stats[0] * 0.1) <= 0.6
    assert hit_fraction("value", 0, stats[1] * 0.1) <= 0.35
    assert dt < 300, f"z-order write at 6M rows took {dt:.1f}s"


def test_prefix_sum_packing_at_100x_docs(spark, tmp_path_factory):
    """pack_chunks at 100× docs: the two-phase prefix sum must stay
    partition-parallel (no single-task global window) and exactly
    tile the corpus."""
    sf_dir = str(tmp_path_factory.mktemp("packscale"))
    words = F.transform(
        F.sequence(F.lit(1), (F.abs(F.xxhash64("id")) % 200 + 1).cast("int")),
        lambda i: F.lit("w"),
    )
    spark.range(500_000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    t0 = time.perf_counter()
    out = REGISTRY["pack_chunks"].spark_fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_tokens").alias("tot"), F.max("last_chunk").alias("mx")
    ).collect()[0]
    dt = time.perf_counter() - t0
    # chunks exactly tile the concatenated corpus
    assert agg["mx"] == (agg["tot"] - 1) // 512
    assert dt < 300, f"prefix-sum packing at 100x took {dt:.1f}s"


def test_dedup_clusters_at_10x_docs(spark, tmp_path_factory):
    """Registered dedup_clusters at 10× sf0.1 docs with planted dup
    groups: minhash candidates + min-label propagation must stay
    partition-parallel and converge in O(diameter) rounds."""
    sf_dir = str(tmp_path_factory.mktemp("ccscale"))
    vocab = F.array(*[F.lit(f"w{i}") for i in range(5000)])
    # groups of 5: same word sequence per group -> exact near-dup cliques
    rand_words = F.transform(
        F.sequence(F.lit(1), F.lit(120)),
        lambda i: F.element_at(
            vocab, (F.abs(F.xxhash64(F.col("id") / 5, i)) % 5000 + 1).cast("int")
        ),
    )
    spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", rand_words).alias("text"),
        F.lit("synth").alias("source"),
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    t0 = time.perf_counter()
    out = REGISTRY["dedup_clusters"].spark_fn(spark, sf_dir)
    n = out.count()
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 300, f"dedup_clusters at 10x took {dt:.1f}s"


def test_ann_ivf_at_10x_vectors(spark, tmp_path_factory):
    """Registered ann_ivf at 10× sf0.1 vectors: k-means driver state
    stays k×dim, assignment is Arrow-batch matmul, probe join touches
    N_PROBE/N_CELLS of the corpus."""
    sf_dir = str(tmp_path_factory.mktemp("ivfscale"))
    emb = spark.range(5_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.abs(F.xxhash64(F.col("id"), i)) % 2000).cast("float") / 1000.0
                - 1.0
            ),
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    t0 = time.perf_counter()
    out = REGISTRY["ann_ivf"].spark_fn(spark, sf_dir)
    n = out.count()
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 300, f"ann_ivf at 10x took {dt:.1f}s"


def test_global_ntile_at_10x(spark, big_events):
    """The distributed exact ntile over 6M raw rows (not a per-user
    aggregate): must complete partition-parallel and produce exactly
    the ntile bucket sizes (n % k leading tiles one row larger) — the
    at-volume proof that rank = bucket offset + intra-bucket rank is
    globally consistent."""
    from wally_spark.operators.prefix import global_ntile

    t0 = time.perf_counter()
    tiled = global_ntile(
        big_events, F.col("value"), ["event_id"], 4, "q", "event_id"
    )
    sizes = {
        r["q"]: r["n"]
        for r in tiled.groupBy("q").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    dt = time.perf_counter() - t0
    n = sum(sizes.values())
    qq, rem = divmod(n, 4)
    want = {t: qq + (1 if t <= rem else 0) for t in range(1, 5)}
    assert sizes == want, (sizes, want)
    assert dt < 180, f"global ntile at 10x took {dt:.1f}s"
