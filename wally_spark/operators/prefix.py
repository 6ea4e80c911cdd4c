"""Distributed two-phase prefix sum — the scale-safe replacement for a
global `Window.orderBy(...)` cumulative sum, which Spark executes as a
SINGLE task (the classic global-window trap).

Phase 1: per-bucket value totals (buckets must be ordered consistently
with the global sort order — e.g. a prefix of the ordering hash).
Phase 2: the bucket totals — n_buckets longs, bounded driver state —
prefix-sum on the driver and broadcast back; a per-bucket window
finishes the cumsum fully in parallel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def bucket_offsets(
    spark: SparkSession,
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """(bucket, bucket_off, total): exclusive prefix sum of per-bucket
    totals in bucket order, plus the grand total on every row (so
    callers needing it avoid a single-partition global window).
    Driver state is n_buckets longs."""
    tot = {
        r["b"]: r["t"]
        for r in df.groupBy(F.col(bucket_col).alias("b"))
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    run = 0
    offs = []
    for b in range(n_buckets):
        offs.append((b, run))
        run += tot.get(b, 0)
    return spark.createDataFrame(
        [(b, off, run) for b, off in offs],
        f"{bucket_col} int, bucket_off long, total long",
    )


# Deterministic-sample size target for global_ntile's bucket cuts: the
# cut VALUES only shape bucket balance, never the result, so ~300 rows
# per bucket is plenty (balance noise ~ sqrt) — but the sample
# predicate must be a pure function of the data (no RNG) so every job
# in the plan sees identical buckets.
NTILE_SAMPLE_TARGET = 20_000


def global_ntile_multi(
    df: DataFrame,
    specs: list,
    k: int,
    id_col: str,
    n_buckets: int = 64,
    total_rows: int | None = None,
) -> DataFrame:
    """EXACT ``ntile(k)`` over one or more global orders, each
    ``(sort_key ASC, *tiebreaks ASC)``, without a single-partition
    window — the scale-safe form of the classic RFM/quartile scoring
    windows. ``specs`` is a list of ``(sort_key, tiebreaks, out_col)``.

    A bare ``F.ntile(k).over(Window.orderBy(...))`` plans ONE task
    holding every row (the global-window trap; see module docstring).
    This runs the two-phase design instead, AMORTIZED across specs —
    exactly TWO driver actions total regardless of how many orders are
    scored (plus an optional count when ``total_rows`` is absent):

    1. cut values: a DETERMINISTIC hash-sample of ``id_col`` (md5
       prefix < fraction, fraction sized from an exact count — no
       RNG) yields ~NTILE_SAMPLE_TARGET rows; ONE aggregate computes
       exact percentiles of every spec's sort_key over the sample and
       the ``n_buckets - 1`` cuts per spec return to the DRIVER and
       re-enter the plan as literals (specs × n_buckets doubles), so
       later jobs never re-run the sampling scan.
    2. bucket = #cuts strictly below the row's sort_key — an
       order-consistent, value-pure function (equal keys can never
       straddle a bucket; the double cast is monotone, so bucket
       membership stays order-consistent for any numeric key), so
       per-bucket ``row_number`` over the ORIGINAL sort-key expression
       (exact — never the double) plus the prefix-summed bucket
       row-counts is the exact global rank, fully partition-parallel.
       The per-(spec, bucket) counts come from ONE exploded aggregate
       job; the prefix runs on the driver (specs × n_buckets longs)
       and returns as LITERAL offset arrays indexed by bucket id — no
       join at all.
    3. the rank maps to its tile with ntile's uneven-bucket rule
       (first ``n % k`` tiles get one extra row), with n/k arithmetic
       folded driver-side (n is exact, from the counts job).

    The only shuffles are the per-spec bucket-partitioned rank windows
    — inherent to ranking under distinct orders. Cut skew from heavy
    sort-key ties degrades balance, never exactness: ties share a
    bucket by construction. Sort keys must be non-null, non-NaN
    numeric column expressions (negate for DESC). The tile arithmetic
    runs rank/(q+1) through doubles — exact while n < 2^52, i.e. any
    physically storable row count.

    ``df`` must be DETERMINISTIC across jobs (the bucket census and
    the output run as separate actions): pin() any upstream lineage
    containing sampling/rand or growing sources before calling."""
    sks = [sort_key.cast("double") for sort_key, _, _ in specs]
    hash_frac = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 32))
    if total_rows is None:
        # one scalar action to size the sample fraction; callers that
        # know the row count should pass it in
        total_rows = df.count()
    frac = min(1.0, NTILE_SAMPLE_TARGET / max(1, total_rows))
    # Wide literal constructs in this operator (the percentile
    # fraction array, the per-spec 63-CASE bucket expression, the
    # 64-literal offset arrays) are built as SQL TEXT parsed by one
    # F.expr each (r13): the Column-algebra spelling cost ~300 py4j
    # round-trips PER SPEC (~1 s/spec of driver-side build time on
    # this host, 3 specs in user_rfm_segments), dwarfing the actual
    # execution. Parsed trees and results are identical — and
    # exactness never depended on the cut values anyway (they only
    # shape bucket balance; see step 2 of the docstring).
    fracs = F.expr(
        "array({})".format(
            ", ".join(
                f"CAST('{i / n_buckets!r}' AS DOUBLE)"
                for i in range(1, n_buckets)
            )
        )
    )
    def _sample_cuts(sample_frac: float) -> list[list[float]]:
        src = df if sample_frac >= 1.0 else df.where(hash_frac < F.lit(sample_frac))
        row = src.agg(
            *[
                F.percentile(sk, fracs).alias(f"_cuts{i}")
                for i, sk in enumerate(sks)
            ]
        ).collect()[0]
        return [list(row[f"_cuts{i}"] or []) for i in range(len(sks))]

    cuts = _sample_cuts(frac)
    if frac < 1.0 and any(not c for c in cuts) and n_buckets > 1:
        # The hash sample came back empty (over-stated total_rows, or a
        # pathologically small id domain): empty cuts would silently
        # collapse every row into bucket 0 — the single-partition window
        # this operator exists to avoid. Retry over the full relation;
        # correctness never depended on the sample, only balance does.
        cuts = _sample_cuts(1.0)

    # Working-column names must not collide with caller columns —
    # withColumn silently REPLACES same-named columns, which would both
    # corrupt bucketing and drop the caller's column on the final drop.
    gb_prefix = "_gb"
    while any(c.startswith(gb_prefix) for c in df.columns):
        gb_prefix += "_"
    gb = [f"{gb_prefix}{i}" for i in range(len(sks))]
    skc = [f"{gb_prefix}s{i}" for i in range(len(sks))]

    def _dlit(c) -> str:
        # exact SQL double literal: repr round-trips finite doubles;
        # Spark's string->double cast accepts 'Infinity' spellings
        v = float(c)
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"

    # literal cut comparisons — codegen-friendly (no interpreted HOF),
    # and bucket assignment cannot drift between jobs; one parsed
    # expression per spec instead of 63 Column ops (see note above)
    bucketed = df.select(
        "*", *[sk.alias(skc[i]) for i, sk in enumerate(sks)]
    ).select(
        "*",
        *[
            F.expr(
                "CAST({} AS INT)".format(
                    " + ".join(
                        f"(CASE WHEN {skc[i]} > {_dlit(c)} THEN 1 ELSE 0 END)"
                        for c in cuts[i]
                    )
                    or "0"
                )
            ).alias(gb[i])
            for i in range(len(sks))
        ],
    )

    # ONE job for every spec's per-bucket counts: explode each row into
    # (spec dim, bucket) and aggregate — specs × n_buckets output rows.
    ex = bucketed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("dim"), F.col(gb[i]).alias("b")
                    )
                    for i in range(len(sks))
                ]
            )
        ).alias("s")
    ).select("s.dim", "s.b")
    cnt = {
        (r["dim"], r["b"]): r["c"]
        for r in ex.groupBy("dim", "b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offs: list[list[int]] = []
    n = 0
    for i in range(len(sks)):
        run = 0
        per = []
        for b in range(n_buckets):
            per.append(run)
            run += cnt.get((i, b), 0)
        offs.append(per)
        n = run  # identical for every dim: each row counts once per dim

    from pyspark.sql import Window

    out = bucketed
    q, rem = divmod(n, k)
    cutr = rem * (q + 1)
    for i, (sort_key, tiebreaks, out_col) in enumerate(specs):
        # rank by the ORIGINAL key expression: the double cast is for
        # bucketing only — bigints past 2^53 would collapse under it
        rn = F.row_number().over(
            Window.partitionBy(gb[i]).orderBy(sort_key.asc(), *tiebreaks)
        )
        # literal offset lookup (n_buckets longs) — no join; one
        # parsed array instead of 64 F.lit round-trips
        off_arr = F.expr(
            "element_at(array({}), {} + 1)".format(
                ", ".join(f"{o}L" for o in offs[i]), gb[i]
            )
        )
        r = (off_arr + rn).cast("long")
        if n < k:
            tile = r  # every tile holds at most one row
        else:
            tile = F.when(
                r <= cutr, F.floor((r - 1) / (q + 1)) + 1
            ).otherwise(rem + F.floor((r - cutr - 1) / q) + 1)
        out = out.withColumn(out_col, tile.cast("long"))
    return out.drop(*gb, *skc)


def global_ntile(
    df: DataFrame,
    sort_key,
    tiebreaks: list,
    k: int,
    out_col: str,
    id_col: str,
    n_buckets: int = 64,
    total_rows: int | None = None,
) -> DataFrame:
    """Single-order convenience wrapper over ``global_ntile_multi``."""
    return global_ntile_multi(
        df,
        [(sort_key, tiebreaks, out_col)],
        k,
        id_col,
        n_buckets=n_buckets,
        total_rows=total_rows,
    )
