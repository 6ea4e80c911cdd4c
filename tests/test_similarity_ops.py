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
