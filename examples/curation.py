"""Training-data curation walk-through on wally_spark — the §2.6
surface end to end over the `documents` / `embeddings` tables:

  1. corpus health     dup_rate_report, corpus_mix_report
  2. dedup             exact → minhash near-dup clusters → keep-best
                       → edit-distance-verified pairs
  3. quality gates     NB classifier, LM perplexity, boilerplate,
                       composed pool-filter ablation
  4. decontamination   5-gram exact / minhash near-verbatim /
                       embedding-space (paraphrase) screens
  5. mixture + order   per-source KL drift, discriminative tokens,
                       token-mass curriculum phases
  6. tokenizer prep    bpe_merge_pairs → token-id export
  7. packing/export    pack_chunks, span-corruption manifest

Run: python examples/curation.py [--sf-dir /root/testdata/sf0.01]
Each step prints a small head() — the point is the composition, not
the output volume. All steps are registered queries, so the same
plans are oracle-checked by tests/test_oracle_parity.py.
"""

import argparse
import os
import sys

# runnable from anywhere: the repo root holds wally_spark/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from wally_spark.plans import REGISTRY
    from wally_spark.session import get_spark

    spark = get_spark("wally_spark-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    steps = [
        ("corpus mix", "corpus_mix_report"),
        ("near-dup rate by slice", "dup_rate_report"),
        ("exact dedup keepers", "dedup_exact"),
        ("near-dup clusters", "dedup_clusters"),
        ("canonical doc per cluster", "dedup_keep_best"),
        ("edit-verified near-dup pairs", "dedup_edit_verified"),
        ("NB quality classifier", "doc_nb_classifier"),
        ("LM perplexity filter", "text_lm_perplexity"),
        ("boilerplate fraction", "text_boilerplate"),
        ("pool-filter ablation", "pool_filter_report"),
        ("5-gram decontamination", "decontaminate_holdout"),
        ("near-verbatim decontamination", "decontaminate_minhash"),
        ("embedding-space decontamination", "decontaminate_embedding"),
        ("per-source KL mixture drift", "source_token_kl"),
        ("source-discriminative tokens", "token_source_mi"),
        ("token-mass curriculum phases", "curriculum_schedule"),
        ("BPE merge candidates", "bpe_merge_pairs"),
        ("token-id export manifest", "bpe_encode_ids"),
        ("packed training chunks", "pack_chunks"),
        ("span-corruption manifest", "span_corruption_manifest"),
    ]
    for label, name in steps:
        df = REGISTRY[name].spark_fn(spark, args.sf_dir)
        print(f"\n=== {label} ({name}) ===")
        df.show(5, truncate=80)


if __name__ == "__main__":
    main()
