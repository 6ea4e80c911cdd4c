from __future__ import annotations

from tests.conftest import SF_MED


def test_quantized_ann_recall(spark):
    """int8-quantized top-5 must recall >= 0.8 of the exact top-5."""
    from wally_spark.plans import REGISTRY

    exact = REGISTRY["ann_bruteforce"].spark_fn(spark, SF_MED).collect()
    quant = REGISTRY["ann_quantized"].spark_fn(spark, SF_MED).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    quant_sets = {}
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(exact_sets) == set(quant_sets)
    recalls = [
        len(exact_sets[q] & quant_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_lsh_ann_recall_on_planted_near_dups(spark, tmp_path):
    """Banded LSH (8x4 OR-amplification) must recall >= 0.8 of the
    true near-dups (cos >= 0.8) — the regime LSH exists for. The
    driver tables' embeddings are near-uniform (top cos ~0.4, where
    hyperplane LSH makes no recall promise), so this plants them:
    queries 0..9 are noisy copies of corpus vectors 100..109."""
    import numpy as np

    rng = np.random.default_rng(42)
    corpus = rng.standard_normal((500, 64))
    corpus[:10] = corpus[100:110] + 0.05 * rng.standard_normal((10, 64))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]], 0) for i in range(500)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    exact = REGISTRY["ann_bruteforce"].spark_fn(spark, sf_dir).collect()
    lsh = REGISTRY["ann_lsh"].spark_fn(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact if r["cos_bp"] >= 8000}
    assert len(want) >= 10, "fixture must contain the planted near-dups"
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    recall = len(want & got) / len(want)
    assert recall >= 0.8, f"LSH recall {recall:.2f} on {len(want)} near-dup pairs"


def test_embedding_kmeans_gates(spark):
    """Determinism, full cluster coverage, and assignment quality for
    the iterative k-means (rows-only oracle, so the gates live here)."""
    from wally_spark.plans import REGISTRY

    a = REGISTRY["embedding_kmeans"].spark_fn(spark, SF_MED).collect()
    b = REGISTRY["embedding_kmeans"].spark_fn(spark, SF_MED).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    clusters = {r["cluster"] for r in a}
    assert clusters == set(range(8))  # every cluster populated
    # every vector is assigned exactly once
    assert len(a) == len({r["vec_id"] for r in a})


def test_embedding_kmeans_matches_numpy_reference(spark):
    """The distributed Lloyd's run agrees EXACTLY with a
    single-process integer-grid numpy reference (same init: K lowest
    vec_ids; same ITERS; same GRID lattice) — integer sums make the
    agreement independent of accumulation order. Also checks the
    Lloyd's guarantee (non-increasing inertia) along the reference
    trajectory."""
    import numpy as np

    import wally_spark.plans.embeddings as E
    from wally_spark.plans import REGISTRY

    rows = sorted(
        E._emb(spark, SF_MED).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in rows])
    raw = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = np.floor(raw * E.GRID + 0.5).astype(np.int64)
    cents = m[: E.K].copy()

    def dists(c):
        return (m * m).sum(1, keepdims=True) - 2 * (m @ c.T) + (c * c).sum(1)

    prev = None
    for _ in range(E.ITERS):
        best = dists(cents).argmin(1)
        nxt = cents.copy()
        for k in range(E.K):
            if (best == k).any():
                # floor-div of exact integer sums — matches both the
                # Spark driver's Python // and the oracle's
                # nonnegative-remainder identity
                nxt[k] = m[best == k].sum(0) // (best == k).sum()
        cents = nxt
        cur = dists(cents).min(1).sum()
        # floor-divided integer means sit within one lattice unit of
        # the true means, so monotonicity holds up to O(GRID) per
        # vector — a ~1e-6 relative slack at this lattice scale
        assert prev is None or cur <= prev * 1.0001
        prev = cur
    d = dists(cents)
    best = d.argmin(1)
    ref = {
        int(i): (
            int(b),
            int(np.floor(10000.0 * (np.sqrt(float(dd)) / E.GRID))),
        )
        for i, b, dd in zip(ids, best, d[np.arange(len(m)), best])
    }

    got = {
        r["vec_id"]: (r["cluster"], r["dist_bp"])
        for r in REGISTRY["embedding_kmeans"].spark_fn(spark, SF_MED).collect()
    }
    assert got == ref


def test_ivf_ann_recall_on_planted_near_dups(spark, tmp_path):
    """IVF (k-means cells, N_PROBE=3 of 16) must recall >= 0.8 of the
    true near-dups — same planted fixture as the LSH gate: a near-dup
    lands in the query's own cell (or an adjacent probed one)."""
    import numpy as np

    rng = np.random.default_rng(42)
    corpus = rng.standard_normal((500, 64))
    corpus[:10] = corpus[100:110] + 0.05 * rng.standard_normal((10, 64))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]], 0) for i in range(500)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    exact = REGISTRY["ann_bruteforce"].spark_fn(spark, sf_dir).collect()
    ivf = REGISTRY["ann_ivf"].spark_fn(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact if r["cos_bp"] >= 8000}
    assert len(want) >= 10
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(want & got) / len(want)
    assert recall >= 0.8, f"IVF recall {recall:.2f} on {len(want)} near-dup pairs"


def test_embedding_block_count_bounded():
    """dedup_embedding's collect_list rows must stay ~4096 vectors no
    matter the corpus size (Spark's 2 GiB single-value ceiling)."""
    from wally_spark.plans.dedup import _n_embedding_blocks

    assert _n_embedding_blocks(500) == 8
    assert _n_embedding_blocks(1_000_000) == 245
    # 100M vectors -> every block still ~4096 rows (~2 MB matrix)
    nb = _n_embedding_blocks(100_000_000)
    assert 100_000_000 / nb <= 4096


def test_dedup_embedding_lsh_subset_of_exact(spark):
    """LSH-prefiltered pairs are a subset of the exact all-pairs result
    with identical cosine values, and recall on the planted high-cosine
    near-dups is total at this scale."""
    from wally_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.vec_a, r.vec_b): r.cos_bp
        for r in REGISTRY["dedup_embedding"].spark_fn(spark, sf).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cos_bp
        for r in REGISTRY["dedup_embedding_lsh"].spark_fn(spark, sf).collect()
    }
    assert set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())
    strong = {k for k, v in exact.items() if v >= 8000}  # cos >= 0.8
    assert strong <= set(lsh)


def test_pq_ann_recall(spark):
    """ADC-ranked PQ candidates must recover most of the exact top-5
    (codebooks quantize 64 dims to 8 bytes; recall>=0.5 at this
    compression on random vectors, exactness is the re-rank's job)."""
    from wally_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_bruteforce"].spark_fn(spark, sf).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq"].spark_fn(spark, sf).collect()
    }
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.5, f"PQ recall {recall:.2f}"


def test_semantic_dedup_planted_duplicates(spark, tmp_path):
    """SemDeDup semantics on a planted fixture: near-identical vector
    groups must (a) land in one cluster, (b) resolve to exactly one
    kept representative (the lowest vec_id), with every dropped member
    pointing at an earlier cluster-mate via dup_of; far-apart vectors
    must all be kept."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    rows = []
    vid = 0
    # 8 well-separated seeds, each with a 3-member near-identical group
    for g in range(8):
        seed = base[g] * 10.0
        for _ in range(3):
            rows.append((vid, [float(x) for x in seed + 0.01 * rng.standard_normal(64)], 0))
            vid += 1
    # plus 16 singletons far from everything
    for s in range(16):
        rows.append((vid, [float(x) for x in base[20 + s] * 10.0], 0))
        vid += 1
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    from wally_spark.plans import REGISTRY

    out = {r["vec_id"]: r for r in REGISTRY["semantic_dedup"].spark_fn(spark, sf_dir).collect()}
    assert len(out) == vid
    for g in range(8):
        ids = [3 * g, 3 * g + 1, 3 * g + 2]
        clusters = {out[i]["cluster"] for i in ids}
        assert len(clusters) == 1, f"group {g} split across clusters {clusters}"
        kept = [i for i in ids if out[i]["keep"]]
        assert kept == [ids[0]], f"group {g}: kept {kept}"
        for i in ids[1:]:
            assert out[i]["dup_of"] in ids and out[i]["dup_of"] < i
    # far-apart singletons survive even when sharing a cluster
    for i in range(24, vid):
        assert out[i]["keep"] and out[i]["dup_of"] is None, out[i]
    # determinism
    again = {r["vec_id"]: tuple(r) for r in REGISTRY["semantic_dedup"].spark_fn(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in out.items()} == again
