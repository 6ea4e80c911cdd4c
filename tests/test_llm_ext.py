"""Targeted semantics tests for the round-10 LLM-pipeline lanes
(plans/llm_ext.py) — Python reference recomputations on planted or
small corpora, plus the scale-shape gates the oracle can't see."""

from __future__ import annotations

import hashlib
import math

from tests.conftest import SF_MED, SF_SMALL


def _hex8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_curriculum_phases_cut_token_mass(spark):
    """Phases must cut CUMULATIVE TOKEN MASS (not doc count): replay
    the quality order sequentially in Python and check every doc's
    phase, and that each phase's token mass is within one max-doc of
    the ideal quarter."""
    from wally_spark.plans import REGISTRY

    rows = REGISTRY["curriculum_schedule"].spark_fn(spark, SF_MED).collect()
    assert rows
    docs = sorted(rows, key=lambda r: (-r["score_bp"], r["doc_id"]))
    total = sum(r["n_tok"] for r in docs)
    cum = 0
    mass = {1: 0, 2: 0, 3: 0, 4: 0}
    for r in docs:
        want = 1 + (4 * cum) // total
        assert r["phase"] == want, (r, want, cum, total)
        cum += r["n_tok"]
        mass[want] += r["n_tok"]
    max_doc = max(r["n_tok"] for r in docs)
    for p in (1, 2, 3, 4):
        assert abs(mass[p] - total / 4) <= max_doc, (p, mass, total)


def test_curriculum_no_global_window(spark):
    """The cumulative token sum must run as the two-phase bucket
    prefix sum — never a single-partition global window."""
    from wally_spark.plans import REGISTRY

    df = REGISTRY["curriculum_schedule"].spark_fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-bucket cumsum survives


def test_span_corruption_matches_hash_rule(spark):
    """Per-doc mask counts must equal a Python replay of the
    md5(doc_id:block) % 100 < 15 rule — the determinism that lets any
    shard of a distributed read reconstruct the mask."""
    from wally_spark.plans import REGISTRY

    rows = REGISTRY["span_corruption_manifest"].spark_fn(spark, SF_SMALL)
    got = {r["doc_id"]: r for r in rows.collect()}
    assert got
    for doc_id, r in got.items():
        n = r["n_tok"]
        masked = [
            b
            for b in range((n + 2) // 3)
            if _hex8(f"{doc_id}:{b}") % 100 < 15
        ]
        n_masked = sum(min(3, n - 3 * b) for b in masked)
        assert r["n_spans"] == len(masked), (doc_id, r)
        assert r["n_masked"] == n_masked, (doc_id, r)
        assert r["mask_bp"] == (10000 * n_masked) // n


def test_dedup_edit_verified_planted_pairs(spark, tmp_path):
    """A near-dup differing by one word inside the 200-char prefix
    must pass the verifier with a small positive edit; a same-bucket
    doc rewritten beyond 25% prefix edit must be rejected."""
    # repeated ODD-size (11) token vocabulary → every SimHash bit's
    # vote is 20 × (a ±1 sum over 11 tokens), which can never be zero,
    # so every margin is ≥ 20 and ONE substituted occurrence (vote
    # shift ±2) cannot flip any bit — bucket and fingerprint survive
    base = " ".join(f"tok{i % 11}" for i in range(220))
    words = base.split()
    words[7] = "tokX"  # inside the 200-char verify prefix
    near = " ".join(words)
    far = " ".join(f"zzz{i % 10} qqq{i % 10}" for i in range(100))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, near, "en", "s", len(near)),
            (3, far, "en", "s", len(far)),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    rows = REGISTRY["dedup_edit_verified"].spark_fn(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in pairs, rows
    r = pairs[(1, 2)]
    assert 0 < r["edit"] <= 4 and r["edit_bp"] <= 2500
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_token_source_mi_python_reference(spark, tmp_path):
    """MI contributions and per-source ranking must match an exact
    Python recomputation on a tiny corpus with known counts."""
    docs = [
        (1, "alpha alpha beta", "s1"),
        (2, "alpha beta beta gamma", "s1"),
        (3, "gamma gamma gamma delta", "s2"),
        (4, "delta delta gamma gamma", "s2"),
    ]
    # lift every joint count over the MI_MIN_JOINT floor
    docs = [(i, ((d + " ") * 5).strip(), s) for i, d, s in docs]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, d, "en", s, len(d)) for i, d, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    rows = REGISTRY["token_source_mi"].spark_fn(spark, sf_dir).collect()
    assert rows

    joint: dict = {}
    for _, text, src in docs:
        for tok in text.lower().split():
            if tok:
                joint[(src, tok)] = joint.get((src, tok), 0) + 1
    n = sum(joint.values())
    ct: dict = {}
    cs: dict = {}
    for (s, t), c in joint.items():
        ct[t] = ct.get(t, 0) + c
        cs[s] = cs.get(s, 0) + c
    want = {}
    for (s, t), c in joint.items():
        if c >= 5:
            contrib = (c / n) * math.log2((c * n) / (ct[t] * cs[s]))
            want[(s, t)] = (c, math.floor(1_000_000 * contrib))
    for r in rows:
        assert (r["source"], r["token"]) in want, r
        c, ub = want[(r["source"], r["token"])]
        assert (r["c"], r["mi_ub"]) == (c, ub), (r, c, ub)
    # ranking: per source, rk follows (mi_ub desc, token asc)
    for src in {s for s, _ in want}:
        ordered = sorted(
            ((t, ub) for (s, t), (_, ub) in want.items() if s == src),
            key=lambda x: (-x[1], x[0]),
        )[:15]
        got = sorted(
            ((r["rk"], r["token"]) for r in rows if r["source"] == src)
        )
        assert [t for _, t in got] == [t for t, _ in ordered], (src, got)


def test_source_token_kl_identity_source_is_small(spark, tmp_path):
    """A source whose unigram mix equals the corpus mix must score
    KL ≈ 0; a skewed source must score strictly higher."""
    balanced = ("aa bb cc dd " * 10).strip()
    skewed = ("aa " * 39).strip() + " bb"
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, balanced, "en", "mix", len(balanced)),
            (2, balanced, "en", "same", len(balanced)),
            (3, skewed, "en", "skew", len(skewed)),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from wally_spark.plans import REGISTRY

    rows = {
        r["source"]: r
        for r in REGISTRY["source_token_kl"].spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"mix", "same", "skew"}
    # mix and same share the corpus-balanced distribution; skew doesn't
    assert rows["skew"]["kl_ub"] > rows["mix"]["kl_ub"]
    assert rows["skew"]["top_token"] == "aa"
    assert rows["mix"]["n_tokens"] == 40 and rows["mix"]["vocab"] == 4


def test_feature_hash_audit_python_reference(spark):
    """Bucket assignment and collision profile must match a Python
    md5-mod recomputation over the sf0.001 vocabulary."""
    import duckdb

    from wally_spark.plans import REGISTRY

    rows = REGISTRY["feature_hash_audit"].spark_fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    vocab = con.execute(
        "SELECT tok, count(*) FROM (SELECT unnest(list_filter("
        "string_split(lower(text), ' '), w -> w <> '')) AS tok FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')) GROUP BY tok"
    ).fetchall()
    con.close()
    buckets: dict = {}
    for tok, ct in vocab:
        fid = _hex8(tok) % 1024
        buckets.setdefault(fid, []).append((tok, ct))
    assert len(rows) == len(buckets)
    for r in rows:
        toks = buckets[r["feature_id"]]
        assert r["n_tokens"] == len(toks)
        assert r["total_count"] == sum(c for _, c in toks)
        top = sorted(toks, key=lambda x: (-x[1], x[0]))[0]
        assert (r["top_token"], r["top_count"]) == top


def test_unpivot_and_frame_lane_plan_shapes(spark):
    """lineitem_charges_unpivot: Generate in the scan stage feeding a
    partial aggregate — exactly ONE Exchange. customer_first_last_orders:
    one customer-keyed window — one Exchange, no SinglePartition."""
    from wally_spark.plans import REGISTRY

    p = (
        REGISTRY["lineitem_charges_unpivot"]
        .spark_fn(spark, SF_MED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1 and "Generate" in p, p
    assert "SinglePartition" not in p

    p = (
        REGISTRY["customer_first_last_orders"]
        .spark_fn(spark, SF_MED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1 and "Window" in p, p
    assert "SinglePartition" not in p


def test_decontaminate_embedding_planted_leak(spark, tmp_path):
    """A train vector that IS a holdout vector (paraphrase-free leak)
    must flag contaminated with best_cos_bp ~10000 and point at the
    right holdout id; an orthogonal vector must not flag."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 16
    hold_vec = rng.standard_normal(dim)
    orth = rng.standard_normal(dim)
    orth -= orth.dot(hold_vec) / hold_vec.dot(hold_vec) * hold_vec
    rows = [
        (7, [float(x) for x in hold_vec], 0),     # holdout (7 % 10 == 7)
        (3, [float(x) for x in hold_vec], 0),     # train leak of 7
        (4, [float(x) for x in orth], 0),         # train, orthogonal
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    got = {
        r["vec_id"]: r
        for r in REGISTRY["decontaminate_embedding"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == {3, 4}
    assert got[3]["best_h_vec"] == 7 and got[3]["contaminated"]
    assert got[3]["best_cos_bp"] >= 9999
    assert not got[4]["contaminated"] and abs(got[4]["best_cos_bp"]) < 200


def test_matryoshka_recall_detects_truncation_flip(spark, tmp_path):
    """A corpus where the full-dim top-1 differs from the 8-dim top-1
    must show agree_full=False at dim 8 and True at dim 64."""
    import numpy as np

    dim = 64
    q = np.zeros(dim); q[0] = 1.0; q[32] = 1.0
    # a: off-query mass INSIDE the first 8 dims hurts its truncated
    # cosine (0.894 vs b's 0.995) but the dim-32 component wins the
    # full comparison (0.936 vs 0.703)
    a = np.zeros(dim); a[0] = 1.0; a[1] = 0.5; a[32] = 0.9
    b = np.zeros(dim); b[0] = 1.0; b[1] = 0.1       # 8-dim winner
    noise = np.full(dim, 0.01)
    rows = [
        (0, q), (100, a), (101, b), (102, noise),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    got = {
        (r["query_id"], r["dim"]): r
        for r in REGISTRY["embedding_matryoshka_recall"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got[(0, 64)]["top1_id"] == 100 and got[(0, 64)]["agree_full"]
    assert got[(0, 8)]["top1_id"] == 101 and not got[(0, 8)]["agree_full"]


def test_kl_and_curriculum_partitioning_invariance(spark, tmp_path):
    """The quantize-before-sum contract: source_token_kl and
    curriculum_schedule must return IDENTICAL rows regardless of
    input partitioning (1 vs 16 shuffled partitions) — the property
    the per-term micro-bit floor and the two-phase prefix sum exist
    to guarantee."""
    import duckdb

    from tests.conftest import SF_SMALL
    from wally_spark.plans import REGISTRY

    # same table content, radically different physical layout
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    docs.coalesce(1).write.parquet(f"{one}/documents.parquet")
    docs.repartition(16).write.parquet(f"{many}/documents.parquet")
    con = duckdb.connect()
    for t in ("embeddings",):
        for d in (one, many):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet'))"
                f" TO '{d}/{t}.parquet' (FORMAT parquet)"
            )
    con.close()

    for name in ("source_token_kl", "curriculum_schedule", "token_source_mi"):
        a = sorted(
            tuple(r) for r in REGISTRY[name].spark_fn(spark, one).collect()
        )
        b = sorted(
            tuple(r) for r in REGISTRY[name].spark_fn(spark, many).collect()
        )
        assert a == b, (name, a[:3], b[:3])


def test_embedding_lanes_empty_holdout_and_zero_norm(spark, tmp_path):
    """r10 advice / r11 item 4: a non-empty TRAIN with an EMPTY
    holdout (or an empty probe panel) must short-circuit to an empty
    result rather than an empty-axis numpy error; an all-zero vector
    must score cos_bp 0 (not NaN / div-by-zero); and BOTH lanes must
    still match their DuckDB oracles cell-for-cell on these shapes —
    the oracle's cross join and CASE guard mirror the short-circuit."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMALL
    from tests.oracle import compare
    from wally_spark.plans import REGISTRY
    from wally_spark.tables import TABLES

    sf_dir = str(tmp_path)
    # single-FILE parquet (not Spark's directory layout) so the DuckDB
    # oracle views resolve: empty mirrors of every other table
    con = duckdb.connect()
    for t in TABLES:
        if t != "embeddings":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
                f" LIMIT 0) TO '{sf_dir}/{t}.parquet' (FORMAT parquet)"
            )
    con.close()

    dim = 64
    rng = np.random.default_rng(11)

    def write(rows):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([i for i, _ in rows], pa.int64()),
                    "embedding": pa.array(
                        [[float(x) for x in v] for _, v in rows],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * len(rows), pa.int32()),
                }
            ),
            f"{sf_dir}/embeddings.parquet",
        )

    # case 1: no vec_id % 10 == 7 (empty holdout) and no vec_id < 8
    # (empty matryoshka probe panel) — both lanes must return 0 rows
    write([(10, rng.standard_normal(dim)), (11, rng.standard_normal(dim)),
           (12, np.zeros(dim))])
    for name in ("decontaminate_embedding", "embedding_matryoshka_recall"):
        assert REGISTRY[name].spark_fn(spark, sf_dir).count() == 0
        compare(spark, name, sf_dir)

    # case 2: zero-norm vectors on both sides of both lanes
    hold = rng.standard_normal(dim)
    write([
        (7, hold),                      # holdout
        (0, np.zeros(dim)),             # zero-norm probe (vec_id < 8)
        (3, np.zeros(dim)),             # zero-norm train vector
        (4, hold),                      # train leak
        (100, rng.standard_normal(dim)),
    ])
    got = {
        r["vec_id"]: r
        for r in REGISTRY["decontaminate_embedding"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got[3]["best_cos_bp"] == 0 and not got[3]["contaminated"]
    assert got[4]["contaminated"] and got[4]["best_cos_bp"] >= 9999
    for name in ("decontaminate_embedding", "embedding_matryoshka_recall"):
        compare(spark, name, sf_dir)
