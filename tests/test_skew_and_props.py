"""Skew helpers and property-based codec tests (SURVEY §5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL
from wally_spark.operators.skew import salted_agg, salted_join
from wally_spark.tables import load_tables


def test_salted_agg_matches_plain(spark):
    ev = load_tables(spark, SF_SMALL)["events"]
    plain = ev.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("total"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        ev,
        "event_type",
        {"total": (F.sum("value"), "sum"), "n": (F.count(F.lit(1)), "sum")},
    ).select("event_type", F.round("total", 2).alias("total"), "n")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain(spark):
    ev = load_tables(spark, SF_SMALL)["events"]
    dims = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 3.0), ("signup", 4.0), ("error", 5.0)],
        "event_type string, weight double",
    )
    plain = ev.join(dims, "event_type").agg(
        F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("t")
    )
    salted = salted_join(ev, dims, "event_type", n_salts=8).agg(
        F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("t")
    )
    assert plain.collect() == salted.collect()
    # left mode: unmatched skewed-side rows survive with nulls, and no
    # match duplicates (each left row carries exactly one salt)
    dims_partial = dims.where(F.col("event_type") != "view")
    plain_l = (
        ev.join(dims_partial, "event_type", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("weight").alias("matched"),
        )
    )
    salted_l = (
        salted_join(ev, dims_partial, "event_type", n_salts=8, how="left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("weight").alias("matched"),
        )
    )
    assert plain_l.collect() == salted_l.collect()


@settings(max_examples=25, deadline=None)
@given(
    t=st.integers(min_value=0, max_value=2**62),
    key=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
    ),
    payload=st.binary(max_size=200),
)
def test_frame_codec_property(spark_global, t, key, payload):
    """encode→decode is identity for arbitrary (time, key, payload)."""
    import pyspark.sql.functions as F

    from wally_spark.functions import decode_frame, encode_frame

    spark = spark_global
    df = spark.createDataFrame([(t, key, bytearray(payload))], "t long, k string, p binary")
    out = (
        df.select(encode_frame(F.col("t"), F.col("k"), F.col("p")).alias("frame"))
        .select(decode_frame(F.col("frame")).alias("d"))
        .select("d.event_time_ms", "d.key", "d.payload")
        .collect()[0]
    )
    assert out["event_time_ms"] == t
    assert out["key"] == key
    assert bytes(out["payload"] or b"") == payload


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=100),    # ts (s)
            st.booleans(),                               # is_left
        ),
        min_size=1,
        max_size=40,
    )
)
def test_asof_join_property(spark_global, data):
    """asof_join == brute-force most-recent-match on random inputs."""
    from datetime import datetime, timezone

    from wally_spark.operators.asof import asof_join

    def dt(sec):
        return datetime.fromtimestamp(sec, timezone.utc).replace(tzinfo=None)

    spark = spark_global
    left_rows = [
        (i, k, float(ts)) for i, (k, ts, is_l) in enumerate(data) if is_l
    ]
    right_rows = [
        (i, k, float(ts), float(i * 10)) for i, (k, ts, is_l) in enumerate(data) if not is_l
    ]
    if not left_rows:
        return
    # dedupe right per (key, ts) keeping max id (mirrors operator contract)
    best = {}
    for i, k, ts, v in right_rows:
        if (k, ts) not in best or i > best[(k, ts)][0]:
            best[(k, ts)] = (i, v)
    right_rows = [(i, k, ts, v) for (k, ts), (i, v) in best.items()]

    left = spark.createDataFrame(
        [(i, k, dt(ts)) for i, k, ts in left_rows],
        "id long, key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, k, dt(ts), v) for i, k, ts, v in right_rows],
        "rid long, key long, ts timestamp, val double",
    )
    got = {
        r["id"]: r["asof_val"]
        for r in asof_join(left, right, on="key", ts="ts", right_cols=("val",)).collect()
    }
    for i, k, ts in left_rows:
        cands = [(rts, v) for (_, rk, rts, v) in right_rows if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, got[i], want)


def test_connected_components_chain_and_singletons(spark):
    """A 5-vertex chain (diameter forces several propagation rounds),
    a separate 2-clique, and a singleton: labels are the component-min
    everywhere."""
    from wally_spark.operators.components import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (6, 7)], "src long, dst long"
    )
    got = {
        (r["id"], r["comp"])
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (6, 6), (7, 6),
        (8, 8),
    }


def test_star_components_match_min_label(spark):
    """Large-star/small-star and min-label propagation agree on a
    random sparse graph (same contract, different round complexity)."""
    from wally_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    n = 400
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    # deterministic pseudo-random sparse edges
    rows = [
        (i, (i * 7919 + 13) % n)
        for i in range(0, n, 3)
        if i != (i * 7919 + 13) % n
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    a = {(r["id"], r["comp"]) for r in connected_components(vertices, edges).collect()}
    b = {
        (r["id"], r["comp"])
        for r in connected_components_star(vertices, edges).collect()
    }
    assert a == b


def test_star_components_deep_chain(spark):
    """A 150-vertex path — the chain shape where min-label needs
    O(diameter)=150 rounds — converges in the star variant's
    logarithmic round budget and labels every vertex with the chain
    minimum."""
    from wally_spark.operators.components import connected_components_star

    n = 150
    vertices = spark.createDataFrame([(i,) for i in range(n + 2)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        (r["id"], r["comp"])
        for r in connected_components_star(
            vertices, edges, max_iters=15
        ).collect()
    }
    want = {(i, 0) for i in range(n)} | {(n, n), (n + 1, n + 1)}
    assert got == want


def test_hll_sketch_within_tolerance(spark):
    """Merged daily HLL sketches estimate distinct users within 5% of
    exact, per event_type — the gate for the rows-only sketch query."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_MED
    from wally_spark.plans import REGISTRY
    from wally_spark.tables import load_tables

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"].spark_fn(spark, SF_MED).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_tables(spark, SF_MED)["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) / n < 0.05, (t, approx[t], n)


def test_approx_quantiles_rank_error(spark):
    """approx_percentile estimates must sit within 1% relative rank of
    the true quantile per event_type — the gate for the rows-only
    sketch query."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_MED
    from wally_spark.plans import REGISTRY
    from wally_spark.tables import load_tables

    approx = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"])
        for r in REGISTRY["approx_quantiles_by_type"].spark_fn(spark, SF_MED).collect()
    }
    ev = load_tables(spark, SF_MED)["events"]
    for etype, (a50, a95) in approx.items():
        vals = sorted(
            r["value"] for r in ev.where(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        for a, q in ((a50, 0.5), (a95, 0.95)):
            import bisect

            rank = bisect.bisect_right(vals, a) / n
            assert abs(rank - q) <= 0.01 + 1.0 / n, (etype, q, rank)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable
    checkpoints; labels must be identical to the localCheckpoint path
    and checkpoint files must actually land in the directory."""
    import os

    import pyspark.sql.functions as F

    from wally_spark.operators.components import connected_components

    vertices = spark.range(200).select(F.col("id"))
    edges = (
        spark.range(150)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .where(F.col("id") % 3 != 2)
    )
    ckdir = str(tmp_path / "cc_ckpt")
    base = {
        (r.id, r.comp) for r in connected_components(vertices, edges).collect()
    }
    reliable = {
        (r.id, r.comp)
        for r in connected_components(
            vertices, edges, checkpoint_dir=ckdir
        ).collect()
    }
    assert base == reliable
    assert any(files for _, _, files in os.walk(ckdir)), "no checkpoint files written"


def test_pin_honors_session_checkpoint_conf(spark, tmp_path):
    """pin() (the shared lineage-pinning helper every multi-consumer
    plan uses) upgrades from localCheckpoint to RELIABLE checkpoints
    when spark.wally.checkpointDir is set — results identical, files
    in the configured directory."""
    import os

    from wally_spark.operators.checkpoint import pin

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    local_rows = sorted(tuple(r) for r in pin(df).collect())
    ckdir = str(tmp_path / "pin_ckpt")
    spark.conf.set("spark.wally.checkpointDir", ckdir)
    try:
        reliable = pin(df)
        assert sorted(tuple(r) for r in reliable.collect()) == local_rows
        assert any(files for _, _, files in os.walk(ckdir)), (
            "no checkpoint files written"
        )
    finally:
        spark.conf.unset("spark.wally.checkpointDir")


def test_pagerank_partitioning_independent(spark):
    """graph_pagerank's claim is exact integer arithmetic — the answer
    must be bit-identical under different shuffle partition counts
    (float damping would drift with accumulation order)."""
    from wally_spark.plans.analytics_ext import graph_pagerank

    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(tuple(r) for r in graph_pagerank(spark, sf).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(tuple(r) for r in graph_pagerank(spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    assert len(a) > 0


def test_bpe_merges_match_sequential_reference(spark, tmp_path):
    """bpe_merges_r4 must agree with a straightforward single-process
    BPE trainer (Sennrich-style: count symbol pairs over the (word,
    count) vocab, apply the best merge left-to-right non-overlapping,
    repeat) on a corpus engineered so round k's winner EXISTS ONLY
    after round k-1's merge — proving the rounds actually iterate on
    the merged symbol stream rather than re-ranking round 1 counts."""
    docs = [
        (1, "abab abab abab cdcd"),
        (2, "abab cdcd cdcd xyz"),
        (3, "ababab cdc xyz xyz"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    # independent reference
    from collections import Counter

    wc = Counter()
    for _, t in docs:
        for w in t.lower().split():
            if w:
                wc[w] += 1
    vocab = {tuple(w): c for w, c in wc.items()}
    expect = []
    from wally_spark.plans.curation import BPE_ROUNDS

    for rnd in range(1, BPE_ROUNDS + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, a, b, a + b, cnt))
        merged = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        vocab = merged

    from wally_spark.plans import REGISTRY

    got = [tuple(r) for r in REGISTRY["bpe_merges_r4"].spark_fn(spark, sf_dir).collect()]
    assert got == expect, (got, expect)
    # the fixture must actually exercise iteration: a round-2+ winner
    # contains a round-1 merged symbol
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _, _ in expect[1:]), expect


def test_bpe_encode_matches_sequential_encoder(spark, tmp_path):
    """bpe_encode must agree with a single-process encode: train the
    same 4 merges sequentially, apply them greedily to every word, and
    charge each doc slice the resulting token counts. Same engineered
    corpus as the trainer test, so round-k merges only exist after
    round k-1 — an encoder that re-applies round-1 merges (or skips
    the 4th) diverges."""
    docs = [
        (1, "abab abab abab cdcd", "en", "web"),
        (2, "abab cdcd cdcd xyz", "en", "web"),
        (3, "ababab cdc xyz xyz", "fr", "book"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from collections import Counter

    from wally_spark.plans.curation import BPE_ROUNDS

    wc = Counter()
    for _, t, _, _ in docs:
        for w in t.lower().split():
            if w:
                wc[w] += 1
    vocab = {tuple(w): c for w, c in wc.items()}
    words = {tuple(w): tuple(w) for w in wc}  # original -> current syms
    for _ in range(BPE_ROUNDS):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        vocab = Counter()
        for w, syms in words.items():
            words[w] = merge(syms)
            vocab[words[w]] = vocab.get(words[w], 0) + wc["".join(w)]
    n_syms = {"".join(w): len(s) for w, s in words.items()}

    expect = {}
    for _, t, lg, s in docs:
        ws = [w for w in t.lower().split() if w]
        nd, nw, n0, nt = expect.get((lg, s), (0, 0, 0, 0))
        expect[(lg, s)] = (
            nd + 1,
            nw + len(ws),
            n0 + sum(len(w) for w in ws),
            nt + sum(n_syms[w] for w in ws),
        )

    from wally_spark.plans import REGISTRY

    got = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["n_words"], r["n_sym0"], r["n_tokens"],
            r["fertility_milli"], r["compression_milli"],
        )
        for r in REGISTRY["bpe_encode"].spark_fn(spark, sf_dir).collect()
    }
    for k, (nd, nw, n0, nt) in expect.items():
        assert got[k] == (nd, nw, n0, nt, 1000 * nt // nw, 1000 * nt // n0), (
            k, got[k], expect[k],
        )
        # merges must actually compress: tokens strictly between word
        # count (full-word merge ceiling) and raw symbol count
        assert nw <= nt < n0, (k, got[k])


def test_bpe_encode_ids_matches_sequential_encoder(spark, tmp_path):
    """bpe_encode_ids must agree with a single-process pipeline: train
    the 4 merges sequentially, encode every word, assign dense ids by
    sorted symbol, concatenate docs in (md5(doc_id), doc_id) order,
    cut IDS_CHUNK-token windows, and compute each chunk's manifest —
    including the position-weighted checksum that pins the exact id
    SEQUENCE. Also the reconciliation contracts from the r9 verdict:
    chunk token totals == bpe_encode's ledger totals, and the chunk
    boundary math is pack_chunks' rule over BPE-token mass (all
    chunks full except the last, ids contiguous from 0)."""
    import hashlib
    from collections import Counter

    from wally_spark.plans.curation import BPE_ROUNDS, IDS_CHUNK

    base = ["abab abab abab cdcd", "abab cdcd cdcd xyz", "ababab cdc xyz xyz"]
    docs = [
        (i, (base[i % 3] + " ") * 30 + "tail" + str(i), "en", "web")
        for i in range(1, 11)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    # sequential trainer + encoder (the bpe_encode test's reference)
    wc = Counter()
    for _, t, _, _ in docs:
        for w in t.lower().split():
            if w:
                wc[w] += 1
    vocab = {tuple(w): c for w, c in wc.items()}
    words = {tuple(w): tuple(w) for w in wc}
    for _ in range(BPE_ROUNDS):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        vocab = Counter()
        for w, syms in words.items():
            words[w] = merge(syms)
            vocab[words[w]] = vocab.get(words[w], 0) + wc["".join(w)]
    enc = {"".join(w): s for w, s in words.items()}

    # dense ids over the sorted final symbol set
    all_syms = sorted({s for syms in enc.values() for s in syms})
    tid = {s: i for i, s in enumerate(all_syms)}

    # global stream in (md5(doc_id), doc_id) order
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i, *_ in docs
    )
    texts = {i: t for i, t, _, _ in docs}
    stream = []  # (doc_id, token_id)
    for _, i in order:
        for w in texts[i].lower().split():
            if w:
                stream.extend((i, tid[s]) for s in enc[w])

    expect = {}
    for gpos, (doc_id, token_id) in enumerate(stream):
        cid = gpos // IDS_CHUNK
        st = expect.setdefault(cid, [0, set(), 0, None, None])
        st[0] += 1
        st[1].add(doc_id)
        st[2] += token_id * ((gpos % IDS_CHUNK) + 1)
        if st[3] is None:
            st[3] = token_id
        st[4] = token_id

    from wally_spark.plans import REGISTRY

    got = {
        r["chunk_id"]: (
            r["n_tokens"], r["n_docs"], r["ids_checksum"],
            r["first_token_id"], r["last_token_id"],
        )
        for r in REGISTRY["bpe_encode_ids"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {
        cid: (n, len(ds), ck, ft, lt)
        for cid, (n, ds, ck, ft, lt) in expect.items()
    }

    # reconciliation: ledger totals and packing boundary rule
    total = sum(n for n, *_ in got.values())
    ledger = sum(
        r["n_tokens"]
        for r in REGISTRY["bpe_encode"].spark_fn(spark, sf_dir).collect()
    )
    assert total == ledger and total == len(stream)
    cids = sorted(got)
    assert cids == list(range(len(cids)))  # contiguous from 0
    assert len(cids) > 2  # fixture actually spans several chunks
    assert all(got[c][0] == IDS_CHUNK for c in cids[:-1])  # full chunks
    assert 0 < got[cids[-1]][0] <= IDS_CHUNK


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile (two-phase distributed) must equal F.ntile over a
    single global window bit-for-bit — including the uneven-bucket
    rule (n % k leading tiles one row larger) and DESC-via-negation —
    across sizes that cover n < k, n % k != 0, and heavy ties."""
    from pyspark.sql import Window

    from wally_spark.operators.prefix import global_ntile

    for n, k in ((3, 4), (17, 4), (64, 4), (101, 7)):
        rows = [(f"u{i:04d}", (i * 7) % 10, float(i % 3)) for i in range(n)]
        df = spark.createDataFrame(rows, "uid string, v int, w double")
        for sort_key, order in (
            (F.col("v"), [F.col("v").asc(), "uid"]),
            (-F.col("v"), [F.col("v").desc(), "uid"]),
            (F.col("w"), [F.col("w").asc(), "uid"]),  # 3-value tie storm
            # degenerate: every sort key identical -> one bucket holds
            # all rows, ranks come purely from the tiebreak
            (F.col("v") * 0, [F.lit(0).asc(), "uid"]),
        ):
            expect = {
                r["uid"]: r["t"]
                for r in df.select(
                    "uid", F.ntile(k).over(Window.orderBy(*order)).alias("t")
                ).collect()
            }
            got = {
                r["uid"]: r["t"]
                for r in global_ntile(
                    df, sort_key, ["uid"], k, "t", "uid", n_buckets=8
                )
                .select("uid", "t")
                .collect()
            }
            assert got == expect, (n, k, str(sort_key))


def test_global_ntile_empty_sample_and_col_collision(spark):
    """r7 ADVICE hardening of global_ntile_multi: (1) an over-stated
    total_rows shrinks the hash-sample fraction to ~0 — empty cuts must
    trigger a full-relation retry, never a silent collapse of every row
    into bucket 0 (the single-partition window the operator exists to
    avoid); (2) caller columns named like the working _gb<i> columns
    must survive untouched (withColumn would silently replace them)."""
    from pyspark.sql import Window

    from wally_spark.operators.prefix import global_ntile, global_ntile_multi

    n, k = 200, 4
    rows = [(f"u{i:04d}", (i * 7) % 97, i % 5) for i in range(n)]
    df = spark.createDataFrame(rows, "uid string, v int, _gb0 int")
    expect = {
        r["uid"]: r["t"]
        for r in df.select(
            "uid", F.ntile(k).over(Window.orderBy(F.col("v").asc(), "uid")).alias("t")
        ).collect()
    }

    # (1) absurd total_rows → sample frac ~1e-7 → zero sampled rows →
    # retry path; result still exact, and buckets still spread (no
    # all-rows-in-bucket-0 collapse)
    out = global_ntile(
        df.drop("_gb0"),
        F.col("v"),
        ["uid"],
        k,
        "t",
        "uid",
        n_buckets=8,
        total_rows=10**11,
    )
    got = {r["uid"]: r["t"] for r in out.select("uid", "t").collect()}
    assert got == expect

    # (2) caller-owned _gb0 column: values preserved, ntile exact
    out2 = global_ntile_multi(
        df, [(F.col("v"), ["uid"], "t")], k, "uid", n_buckets=8
    )
    res = {r["uid"]: (r["t"], r["_gb0"]) for r in out2.collect()}
    for i in range(n):
        uid = f"u{i:04d}"
        assert res[uid] == (expect[uid], i % 5), uid


def test_pack_attention_boundaries_reconciles(spark, tmp_path):
    """pack_attention_boundaries must agree with boundaries derived
    from the sequential packed stream (the bpe_encode_ids test's
    reference pipeline) and satisfy its reconciliation contracts:
    per-chunk n_docs equals bpe_encode_ids' n_docs, Σ n_boundaries
    equals the tokenized doc count, and carry_out(c) == carry_in(c+1)
    with the first chunk never carrying in and the last never out."""
    import hashlib
    from collections import Counter

    from wally_spark.plans import REGISTRY
    from wally_spark.plans.curation import BPE_ROUNDS, IDS_CHUNK

    base = ["abab abab abab cdcd", "abab cdcd cdcd xyz", "ababab cdc xyz xyz"]
    docs = [
        (i, (base[i % 3] + " ") * 30 + "tail" + str(i), "en", "web")
        for i in range(1, 11)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    # sequential trainer/encoder (as in the bpe_encode_ids test)
    wc = Counter()
    for _, t, _, _ in docs:
        for w in t.lower().split():
            if w:
                wc[w] += 1
    vocab = {tuple(w): c for w, c in wc.items()}
    words = {tuple(w): tuple(w) for w in wc}
    for _ in range(BPE_ROUNDS):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        vocab = Counter()
        for w, syms in words.items():
            words[w] = merge(syms)
            vocab[words[w]] = vocab.get(words[w], 0) + wc["".join(w)]
    enc = {"".join(w): s for w, s in words.items()}

    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i, *_ in docs
    )
    texts = {i: t for i, t, _, _ in docs}
    stream = []  # doc_id per token, in packed order
    for _, i in order:
        for w in texts[i].lower().split():
            if w:
                stream.extend([i] * len(enc[w]))

    # expected boundary manifest from the sequential stream
    expect = {}
    for gpos, doc_id in enumerate(stream):
        cid = gpos // IDS_CHUNK
        off = gpos % IDS_CHUNK
        st = expect.setdefault(cid, {"docs": set(), "starts": []})
        st["docs"].add(doc_id)
        if gpos == 0 or stream[gpos - 1] != doc_id:
            st["starts"].append(off)
    rows = {}
    for cid, st in expect.items():
        starts = st["starts"]
        rows[cid] = (
            len(st["docs"]),
            len(starts),
            sum(o + 1 for o in starts),
            min(starts) if starts else None,
            max(starts) if starts else None,
            0 if (starts and starts[0] == 0) else 1,
        )

    got = {
        r["chunk_id"]: r
        for r in REGISTRY["pack_attention_boundaries"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert {
        cid: (
            r["n_docs"], r["n_boundaries"], r["boundary_off_sum1"],
            r["first_boundary_off"], r["last_boundary_off"], r["carry_in"],
        )
        for cid, r in got.items()
    } == rows

    # reconciliation vs bpe_encode_ids and the carry chain
    ids = {
        r["chunk_id"]: r["n_docs"]
        for r in REGISTRY["bpe_encode_ids"].spark_fn(spark, sf_dir).collect()
    }
    assert {c: r["n_docs"] for c, r in got.items()} == ids
    assert sum(r["n_boundaries"] for r in got.values()) == len(docs)
    cids = sorted(got)
    assert got[cids[0]]["carry_in"] == 0
    assert got[cids[-1]]["carry_out"] == 0
    for c_prev, c_next in zip(cids, cids[1:]):
        assert got[c_prev]["carry_out"] == got[c_next]["carry_in"]


def test_simhash_band_pigeonhole_property():
    """Pure-arithmetic property behind the 8x8-bit banding: ANY pair
    of 64-bit fingerprints within hamming SIMHASH_BANDS-1 shares at
    least one band value, and the audit lane's 16x4-bit truth bands
    are exact to hamming 15 — checked over randomized fingerprints
    including the signed top band (two's-complement simhash)."""
    import random

    from wally_spark.plans.dedup import (
        _SIMHASH_BAND_MASK,
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
    )

    rng = random.Random(20260816)

    def to_signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    def bands(h, nb, bits):
        mask = (1 << bits) - 1
        return [((h >> (bits * i)) & mask) for i in range(nb)]

    for _ in range(2000):
        a = rng.getrandbits(64)
        k = rng.randrange(0, 16)
        flips = rng.sample(range(64), k)
        b = a
        for f in flips:
            b ^= 1 << f
        sa, sb = to_signed(a), to_signed(b)
        # arithmetic >> + mask reads the same bits regardless of sign
        assert bands(sa & ((1 << 64) - 1), 8, 8) == bands(
            a, SIMHASH_BANDS, SIMHASH_BAND_BITS
        )
        share8 = any(
            x == y
            for x, y in zip(
                bands(a, SIMHASH_BANDS, SIMHASH_BAND_BITS),
                bands(b, SIMHASH_BANDS, SIMHASH_BAND_BITS),
            )
        )
        share16x4 = any(
            x == y for x, y in zip(bands(a, 16, 4), bands(b, 16, 4))
        )
        if k <= SIMHASH_BANDS - 1:
            assert share8, (hex(a), hex(b), k)
        if k <= 15:
            assert share16x4, (hex(a), hex(b), k)


@given(
    st.lists(
        st.tuples(st.integers(1, 64), st.integers(1, 40)),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_bestfit_histogram_equals_item_bfd(hist):
    """The bulk histogram BFD (operators/packing.py) must equal a
    naive item-by-item best-fit-decreasing simulator on the same
    items: same bin count, same total padding."""
    from wally_spark.operators.packing import bestfit_pack_histogram

    capacity = 64
    # collapse duplicate lengths the way a groupBy would
    agg = {}
    for length, n in hist:
        agg[length] = agg.get(length, 0) + n
    items = sorted(
        (length for length, n in agg.items() for _ in range(n)),
        reverse=True,
    )
    bins = []  # remaining capacities
    for l in items:
        fits = [c for c in bins if c >= l]
        if fits:
            bins[bins.index(min(fits))] = min(fits) - l
        else:
            bins.append(capacity - l)
    got = bestfit_pack_histogram(list(agg.items()), capacity)
    assert got == (len(bins), sum(bins)), (items, got, bins)


def test_pack_bestfit_report_reconciles(spark, tmp_path):
    """pack_bestfit_report must reconcile with bpe_encode_ids and
    pack_attention_boundaries on the same corpus: equal total token
    mass, concat's n_bins == the chunk count, concat's split_events ==
    the mid-document window starts (Σ carry_in), bestfit's padding
    consistent with its bin count, and a document longer than one
    window forcing bestfit split_events > 0."""
    from wally_spark.plans import REGISTRY
    from wally_spark.plans.curation import IDS_CHUNK

    base = ["abab abab abab cdcd", "abab cdcd cdcd xyz", "ababab cdc xyz"]
    docs = [
        (i, (base[i % 3] + " ") * (10 + 25 * (i % 4)) + "t" + str(i), "en", "w")
        for i in range(1, 13)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rep = {
        r["strategy"]: r
        for r in REGISTRY["pack_bestfit_report"].spark_fn(spark, sf_dir).collect()
    }
    ids = REGISTRY["bpe_encode_ids"].spark_fn(spark, sf_dir).collect()
    att = REGISTRY["pack_attention_boundaries"].spark_fn(spark, sf_dir).collect()

    total_tokens = sum(r["n_tokens"] for r in ids)
    assert rep["concat"]["n_tokens"] == total_tokens
    assert rep["bestfit"]["n_tokens"] == total_tokens
    assert rep["concat"]["n_bins"] == len(ids)
    assert rep["concat"]["split_events"] == sum(r["carry_in"] for r in att)
    assert rep["concat"]["padding_tokens"] == (
        -total_tokens
    ) % IDS_CHUNK
    # bestfit invariants: padding = bins*K - tokens, no doc is ever
    # cut unless it is longer than a window
    bf = rep["bestfit"]
    assert bf["padding_tokens"] == bf["n_bins"] * IDS_CHUNK - total_tokens
    # at least one base doc repeated 85x crosses a window
    assert bf["split_events"] > 0
    assert bf["n_docs"] == rep["concat"]["n_docs"] == 12


def test_bpe_decode_check_sequential_agreement(spark, tmp_path):
    """bpe_decode_check must agree with a sequential Python
    encode->decode round-trip: same per-(lang, source) token mass,
    and every document whose normalized text survives the round trip
    counts ok (all of them — the id table is consistent by
    construction; the lane's value is localizing WHERE a drifted
    table would break)."""
    from collections import Counter

    from wally_spark.plans import REGISTRY
    from wally_spark.plans.curation import BPE_ROUNDS

    base = ["abab abab abab cdcd", "abab cdcd  cdcd xyz", "ababab cdc xyz"]
    docs = [
        (i, (base[i % 3] + " ") * (3 + i % 5) + "t" + str(i),
         "en" if i % 2 else "de", "s" + str(i % 2))
        for i in range(1, 9)
    ] + [(9, "", "en", "s1")]  # empty doc round-trips to empty
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    # sequential trainer (the bpe_encode_ids test's reference)
    wc = Counter()
    for _, t, _, _ in docs:
        for w in t.lower().split():
            if w:
                wc[w] += 1
    words = {tuple(w): tuple(w) for w in wc}
    for _ in range(BPE_ROUNDS):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc["".join(w)]
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        words = {w: merge(syms) for w, syms in words.items()}
    enc = {"".join(w): s for w, s in words.items()}
    id_of = {s: i for i, s in enumerate(
        sorted({s for syms in words.values() for s in syms}))}
    sym_of = {i: s for s, i in id_of.items()}

    expect = {}
    for i, t, lg, src in docs:
        ws = [w for w in t.lower().split() if w]
        ids = [id_of[s] for w in ws for s in enc[w]]
        decoded_words, cur = [], []
        # rebuild words from the decoded stream using the known splits
        k = 0
        for w in ws:
            n = len(enc[w])
            cur = [sym_of[x] for x in ids[k : k + n]]
            decoded_words.append("".join(cur))
            k += n
        ok = " ".join(decoded_words) == " ".join(ws)
        st = expect.setdefault((lg, src), [0, 0, 0])
        st[0] += 1
        st[1] += 1 if ok else 0
        st[2] += len(ids)

    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["n_ok"], r["n_tokens"])
        for r in REGISTRY["bpe_decode_check"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}
    # integrity: every doc round-trips
    assert all(nd == nok for nd, nok, _ in got.values())


def test_pack_contamination_reconciles_with_boundaries(spark, tmp_path):
    """pack_contamination_report shares pack_attention_boundaries'
    coordinate system: identical chunk spine and per-chunk n_docs; a
    single-source corpus has zero cross_source windows while mixed
    languages surface as cross_lang exactly where docs meet."""
    from wally_spark.plans import REGISTRY

    base = ["abab abab abab cdcd", "abab cdcd cdcd xyz", "ababab cdc xyz"]
    docs = [
        (i, (base[i % 3] + " ") * (15 + 10 * (i % 3)) + "t" + str(i),
         "en" if i % 3 else "de", "web")
        for i in range(1, 9)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = {
        r["chunk_id"]: r
        for r in REGISTRY["pack_contamination_report"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    att = {
        r["chunk_id"]: r
        for r in REGISTRY["pack_attention_boundaries"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(con) == set(att)
    for cid, r in con.items():
        assert r["n_docs"] == att[cid]["n_docs"], cid
        assert r["cross_source"] == 0  # single source corpus
        assert r["n_langs"] >= 1 and (r["cross_lang"] == (r["n_langs"] > 1))
    # languages are mixed in the corpus, so SOME window must be mixed
    assert any(r["cross_lang"] for r in con.values())


def test_simhash_audit_ab_gate_rederivable():
    """r13: the 6x10/5x12 geometry A/B left the default audit run
    (priced and rejected in r12 — cost-creep cap), gated behind
    SIMHASH_AUDIT_AB. The gate must stay LIVE: re-executing the module
    with the flag flipped must regenerate a DuckDB-runnable oracle
    whose A/B columns appear and whose shared columns (n_true, band8
    recall) are unchanged from the default geometry set."""
    import duckdb

    from tests.conftest import SF_SMALL

    src = open("wally_spark/plans/dedup.py").read()
    src = src.replace("SIMHASH_AUDIT_AB = False", "SIMHASH_AUDIT_AB = True")
    ns = {}
    import wally_spark.plans.registry as reg

    real = reg.register

    captured = {}

    def fake_register(name, oracle=None, tags=()):
        def deco(f):
            captured[name] = oracle
            return f

        return deco

    reg.register = fake_register
    try:
        exec(compile(src, "dedup_ab.py", "exec"), ns)
    finally:
        reg.register = real
    sql = captured["simhash_recall_audit"]
    assert "c_b6x10" in sql and "c_b5x12" in sql and "emitted_b5x12" in sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_SMALL}/documents.parquet')"
    )
    try:
        rows = con.execute(sql).fetchall()
        cols = [d[0] for d in con.execute(f"DESCRIBE ({sql})").fetchall()]
    finally:
        con.close()
    by = [dict(zip(cols, r)) for r in rows]
    assert {r["t"] for r in by} == {6, 12}

    from wally_spark.plans import REGISTRY

    default_sql = REGISTRY["simhash_recall_audit"].oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_SMALL}/documents.parquet')"
    )
    try:
        drows = con.execute(default_sql).fetchall()
        dcols = [
            d[0] for d in con.execute(f"DESCRIBE ({default_sql})").fetchall()
        ]
    finally:
        con.close()
    dby = {r["t"]: r for r in (dict(zip(dcols, x)) for x in drows)}
    for r in by:
        base = dby[r["t"]]
        for shared in ("n_true", "caught_band8", "recall_band8_bp",
                       "emitted_band8", "truth_n_docs"):
            assert r[shared] == base[shared], (shared, r, base)
