"""Scale smoke (opt-in: WALLY_SCALE_SMOKE=1): synthesizes a ~6M-row
events table (10× sf0.1) in a temp dir and runs the window/state
headliners on it. Guards against operators that secretly don't scale
(driver-side loops, per-row python, O(n²) joins) — wall time is
asserted loosely; the real signal is completing at all with flat
memory."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("WALLY_SCALE_SMOKE") != "1",
    reason="set WALLY_SCALE_SMOKE=1 to run the 10x scale smoke",
)


@pytest.fixture(scope="module")
def big_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "events")
    n = 6_000_000
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1704067200_000000) + (F.col("id") % 2_592_000) * 1_000_000)
            ).alias("ts"),
            (F.xxhash64("id") % 10_000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")]),
                (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 49000 / 100.0 + 0.01).alias("value"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


def _timed(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_sliding_window_at_10x(spark, big_events):
    dt = _timed(
        big_events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    assert dt < 120, f"sliding window at 10x took {dt:.1f}s"


def test_running_state_at_10x(spark, big_events):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dt = _timed(
        big_events.withColumn("running", F.sum("value").over(w)).where(
            F.col("running") > 100000
        )
    )
    assert dt < 180, f"running state at 10x took {dt:.1f}s"


def test_session_gaps_at_10x(spark, big_events):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        big_events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts").cast("double") - F.col("prev").cast("double") > 600),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(wrun))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    dt = _timed(sess)
    assert dt < 180, f"sessionization at 10x took {dt:.1f}s"
