"""Stream/batch equivalence: running the SAME logical pipeline over
the events table as a bounded file stream produces exactly the batch
answer. This is the engine's replacement for the reference's
determinism guarantees (resilience tests in lib/wallaroo): correctness
does not depend on how the data is micro-batched."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wally_spark.tables import load_tables


def _events_stream(spark, tmp_path):
    ev = load_tables(spark, SF_SMALL)["events"]
    src = f"{tmp_path}/events_stream_src"
    # several files → several micro-batches; timestamps normalized to µs
    ev.repartition(4).write.mode("overwrite").parquet(src)
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        ev,
    )


def _run_complete(df, spark):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_window_equivalence(spark, tmp_path):
    sdf, ev = _events_stream(spark, tmp_path)
    stream_out = _run_complete(
        sdf.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
        ),
        spark,
    ).select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    batch_out = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )
    assert sorted(map(tuple, stream_out.collect())) == sorted(
        map(tuple, batch_out.collect())
    )


def test_global_agg_equivalence(spark, tmp_path):
    sdf, ev = _events_stream(spark, tmp_path)
    stream_out = _run_complete(
        sdf.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
        ),
        spark,
    )
    batch_out = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    assert sorted(map(tuple, stream_out.collect())) == sorted(
        map(tuple, batch_out.collect())
    )
