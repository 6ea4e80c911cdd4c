"""tokenizer_unigram_lm: the distributed hard-EM Viterbi trainer must
agree with a SEQUENTIAL pure-Python implementation of the same
algorithm (the bpe lanes' agreement discipline), and its plan must be
vocabulary-bounded — no UDF, no unpartitioned window, no collect."""

from collections import Counter
from math import floor, log

import duckdb

from tests.conftest import SF_SMALL
from wally_spark.plans.unigram import (
    UNI_K_MAX,
    UNI_L_MAX,
    UNI_V_MULTI,
    _INF,
)


def _seq_unigram(texts):
    """Sequential reference: identical arithmetic to both engines."""
    wc = Counter(
        w
        for t in texts
        for w in (t or "").lower().split(" ")
        if w and len(w) <= UNI_L_MAX
    )
    seed = Counter()
    for w, c in wc.items():
        for j in range(len(w)):
            for k in range(1, UNI_K_MAX + 1):
                if j + k <= len(w):
                    seed[w[j : j + k]] += c
    vocab = {p: f for p, f in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in seed.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:UNI_V_MULTI]
    vocab.update(dict(multi))

    def costs(v):
        tf = sum(v.values())
        return {p: floor(1000.0 * log(tf / f)) for p, f in v.items()}

    def viterbi(w, cost):
        L = len(w)
        best = [0] + [None] * L
        for i in range(1, L + 1):
            cands = []
            for k in range(1, UNI_K_MAX + 1):
                if k <= i:
                    p = w[i - k : i]
                    cands.append(
                        best[i - k] + cost[p] if p in cost else _INF
                    )
                else:
                    cands.append(_INF)
            best[i] = min(cands)
        pos, pieces = L, []
        while pos > 0:
            advanced = False
            for k in range(1, UNI_K_MAX + 1):
                if k <= pos:
                    p = w[pos - k : pos]
                    if p in cost and best[pos - k] + cost[p] == best[pos]:
                        pieces.append(p)
                        pos -= k
                        advanced = True
                        break
            assert advanced, (w, pos)
        return best[L], pieces

    def round_metrics(cost, rnd):
        n_words = sum(wc.values())
        n_chars = sum(c * len(w) for w, c in wc.items())
        n_tokens = 0
        corpus_cost = 0
        usage = Counter()
        for w, c in wc.items():
            b, ps = viterbi(w, cost)
            n_tokens += c * len(ps)
            corpus_cost += c * b
            for p in ps:
                usage[p] += c
        return (
            {
                "round": rnd,
                "vocab_size": len(cost),
                "n_tokens": n_tokens,
                "corpus_cost_mnat": corpus_cost,
                "fertility_milli": (1000 * n_tokens) // n_words,
                "chars_per_token_milli": (1000 * n_chars) // n_tokens,
            },
            usage,
        )

    c0 = costs(vocab)
    m1, usage = round_metrics(c0, 1)
    c1 = costs(dict(usage))
    m2, _ = round_metrics(c1, 2)
    return [m1, m2]


def test_unigram_matches_sequential_reference(spark):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_SMALL}/documents.parquet')"
        ).fetchall()
    ]
    expected = _seq_unigram(texts)

    from wally_spark.plans import REGISTRY

    got = [
        r.asDict()
        for r in REGISTRY["tokenizer_unigram_lm"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    ]
    assert got == expected


def test_unigram_plan_is_vocab_bounded(spark):
    """No Python UDF (the DP is JVM higher-order functions), no
    unpartitioned window, and the vocabulary joins are broadcasts —
    the lane's cost stays O(distinct words), not O(corpus)."""
    from wally_spark.plans import REGISTRY

    df = REGISTRY["tokenizer_unigram_lm"].spark_fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "windowspecdefinition" not in plan.lower()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_fertility_reconciles_with_training_metrics(spark):
    """unigram_fertility_by_source's per-group token mass must sum to
    EXACTLY tokenizer_unigram_lm's round-2 corpus n_tokens (same
    trained chain, same round-2 segmentation) — the reconciliation
    that catches a drifted per-word token relation."""
    from wally_spark.plans import REGISTRY

    fert = REGISTRY["unigram_fertility_by_source"].spark_fn(
        spark, SF_SMALL
    ).collect()
    metrics = {
        r["round"]: r
        for r in REGISTRY["tokenizer_unigram_lm"].spark_fn(
            spark, SF_SMALL
        ).collect()
    }
    assert sum(r["n_tokens"] for r in fert) == metrics[2]["n_tokens"]
    assert sum(r["n_words"] for r in fert) > 0
    for r in fert:
        if r["n_words"]:
            assert r["fertility_milli"] == 1000 * r["n_tokens"] // r["n_words"]
