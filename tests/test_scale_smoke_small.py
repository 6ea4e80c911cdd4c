"""Always-on miniatures of the opt-in scale smokes
(test_scale_smoke.py, WALLY_SCALE_SMOKE=1): the same adversarial
SHAPES — a deep chain for star contraction, a skewed dimension for
z-order equi-depth ranking — at sizes that fit a ~30 s CI budget, so
the r5 fixes those smokes guard cannot regress silently between
opt-in runs."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def test_star_components_deep_chain_small(spark):
    """A single 5k-vertex path: diameter 5k means min-label propagation
    would need 5k rounds — star contraction must finish inside its
    logarithmic round budget and produce one component."""
    from wally_spark.operators.components import connected_components_star

    n = 5_000
    vertices = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components_star(vertices, edges, max_iters=40)
    assert out.select("comp").distinct().count() == 1


def test_zorder_pruning_small(spark, tmp_path):
    """Z-order write at 200k rows with a heavily skewed value column:
    both dimensions must still prune, measured from real parquet
    footers (the r5 equi-depth rank rewrite's guarantee)."""
    import pyarrow.parquet as pq

    from wally_spark.operators.layout import write_zordered

    ev = spark.range(200_000).select(
        F.col("id").alias("event_id"),
        (F.xxhash64("id") % 10_000).alias("user_id"),
        # skew: 90% of values in [0, 1), a long tail to 490
        F.when(
            F.abs(F.xxhash64("id", F.lit(1))) % 10 < 9,
            (F.abs(F.xxhash64("id", F.lit(2))) % 1000) / 1000.0,
        )
        .otherwise((F.abs(F.xxhash64("id", F.lit(3))) % 49000) / 100.0 + 0.01)
        .alias("value"),
    )
    out = str(tmp_path / "z")
    write_zordered(ev, ["user_id", "value"], out, n_files=16)

    def hit_fraction(col, lo, hi):
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        hits = 0
        for f in files:
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            idx = md.schema.names.index(col)
            st = [
                md.row_group(r).column(idx).statistics
                for r in range(md.num_row_groups)
            ]
            if any(not (s.max < lo or s.min > hi) for s in st):
                hits += 1
        return hits / max(len(files), 1)

    stats = ev.agg(F.max("user_id"), F.max("value")).collect()[0]
    # user_id is signed, so [0, 0.1*max] starts at the median slice
    # boundary (see the 10x smoke's rationale). For value, the HEAD
    # holds 90% of the mass (every file legitimately contains head
    # rows), so the pruning probe is the thin TAIL [0.5*max, max]
    # (~5% of rows): under equi-depth ranking that is one-ish slice
    # and must prune hard — under naive value-range ranking the head
    # spike collapses the curve and the tail smears across every file.
    assert hit_fraction("user_id", 0, stats[0] * 0.1) <= 0.75
    assert hit_fraction("value", stats[1] * 0.5, stats[1]) <= 0.5
