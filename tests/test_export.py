"""Shard-export round trip: corpus_shard_manifest is the verification
artifact for the real export write — prove they agree.

The export path a training pipeline runs: assign (shard, rank), range-
repartition so each output task owns whole shards, write parquet
partitioned by shard. The manifest (computed independently as one
aggregate) must match what landed on disk exactly — doc counts, token
totals, and shard disjointness/coverage.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL

from wally_spark.plans.sampling import N_SHARDS, corpus_shard_manifest
from wally_spark.tables import load_tables


def test_shard_export_matches_manifest(spark, tmp_path):
    docs = load_tables(spark, SF_SMALL)["documents"]
    rank = F.md5(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")).cast("binary")
    )
    shard = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(rank, 1, 1)) - 1)
        % N_SHARDS
    ).cast("bigint")
    out = str(tmp_path / "export")
    (
        docs.select("doc_id", "text", shard.alias("shard"), rank.alias("rank"))
        .repartitionByRange(N_SHARDS, "shard", "rank")
        .sortWithinPartitions("shard", "rank")
        .write.partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    manifest = {
        r["shard"]: (r["n_docs"], r["n_tokens"])
        for r in corpus_shard_manifest(spark, SF_SMALL).collect()
    }
    n_tokens = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
    written = {
        r["shard"]: (r["n"], r["t"])
        for r in back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(n_tokens).cast("bigint").alias("t"),
        )
        .collect()
    }
    assert written == manifest
    # disjoint + complete: every doc landed exactly once
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # rank order within each written file (what a training reader
    # streams): check physical row order per file via pyarrow
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{out}/shard=*/*.parquet")
    assert files, "no shard files written"
    for f in files:
        ranks = pq.read_table(f, columns=["rank"])["rank"].to_pylist()
        assert ranks == sorted(ranks), f"unsorted rows in {f}"
