"""minhash_band_candidates internals (r13 first-shared-band rewrite):
the dedup-free pair emission must agree with the classic band
self-join + pair-keyed count(DISTINCT band) spelling — each candidate
pair exactly once, shared_bands = number of shared SURVIVING bands."""

from __future__ import annotations

import pyspark.sql.functions as F

from wally_spark.plans.dedup import BAND_ROWS, N_HASHES, minhash_band_candidates


def _sigs(spark, rows):
    cols = ["doc_id"] + [f"mh{i}" for i in range(N_HASHES)]
    return spark.createDataFrame(rows, cols)


def _reference_pairs(spark, sigs):
    """The pre-r13 spelling: band rows, bucket cap, self-join, pair
    groupBy counting distinct shared bands."""
    n_bands = N_HASHES // BAND_ROWS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"mh{b * BAND_ROWS + r}").cast("string")
                                for r in range(BAND_ROWS)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.band_key")
    from wally_spark.plans.dedup import MAX_BUCKET

    sizes = bands.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    bands_k = bands.join(
        sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_id", "band_key"]
    ).select("doc_id", "band_id", "band_key")
    a, b = bands_k.alias("a"), bands_k.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.countDistinct("a.band_id").alias("shared_bands"))
    )


def test_first_shared_band_matches_reference(spark):
    # docs 1/2 share bands 0 and 2; docs 1/3 share band 3 only;
    # docs 2/3 share nothing; doc 4 shares nothing with anyone
    rows = [
        (1, 10, 11, 20, 21, 30, 31, 40, 41),
        (2, 10, 11, 25, 26, 30, 31, 45, 46),
        (3, 12, 13, 27, 28, 32, 33, 40, 41),
        (4, 90, 91, 92, 93, 94, 95, 96, 97),
    ]
    sigs = _sigs(spark, rows)
    got = sorted(map(tuple, minhash_band_candidates(sigs).collect()))
    ref = sorted(map(tuple, _reference_pairs(spark, sigs).collect()))
    assert got == ref == [(1, 2, 2), (1, 3, 1)]


def test_no_duplicate_pair_rows(spark):
    # identical signatures share ALL 4 bands -> must still emit ONE row
    rows = [
        (1, 1, 2, 3, 4, 5, 6, 7, 8),
        (2, 1, 2, 3, 4, 5, 6, 7, 8),
        (3, 1, 2, 3, 4, 5, 6, 7, 8),
    ]
    out = minhash_band_candidates(_sigs(spark, rows)).collect()
    assert sorted((r.doc_a, r.doc_b, r.shared_bands) for r in out) == [
        (1, 2, 4),
        (1, 3, 4),
        (2, 3, 4),
    ]


def test_empty_signatures(spark):
    schema = ", ".join(
        ["doc_id LONG"] + [f"mh{i} LONG" for i in range(N_HASHES)]
    )
    out = minhash_band_candidates(spark.createDataFrame([], schema))
    assert out.count() == 0
