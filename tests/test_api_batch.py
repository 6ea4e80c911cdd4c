"""The Wallaroo-style pipeline API, batch-compiled, against directly
written DataFrame equivalents."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL
from wally_spark import api
from wally_spark.sinks import ReturnSink
from wally_spark.sources import DataFrameSource, GenSourceConfig
from wally_spark.tables import load_tables


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF_SMALL)["events"]


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stateless_exprs_computation(spark, events):
    """celsius app shape: two chained expression computations."""
    to_f = api.computation(
        "to_fahrenheit",
        exprs={
            "event_id": F.col("event_id"),
            "fahrenheit": F.round(F.col("value") * 1.8 + 32.0, 2),
        },
    )
    p = (
        api.source("celsius", DataFrameSource("celsius", events))
        .to(to_f)
        .to_sink(ReturnSink())
    )
    out = api.build_application("celsius", p).run_batch(spark)
    expected = events.select(
        "event_id", F.round(F.col("value") * 1.8 + 32.0, 2).alias("fahrenheit")
    )
    assert _rows(out, "event_id", "fahrenheit") == _rows(
        expected, "event_id", "fahrenheit"
    )


def test_rowpath_filter_computation(spark, events):
    """alerts_stateless shape: row-level python filter."""

    @api.computation("big_values", schema="event_id bigint, value double")
    def big_values(rec):
        if rec.value > 450.0:
            return {"event_id": rec.event_id, "value": rec.value}
        return None

    p = (
        api.source("alerts", DataFrameSource("alerts", events))
        .to(big_values)
        .to_sink(api and ReturnSink())
    )
    out = api.build_application("alerts", p).run_batch(spark)
    expected = events.where(F.col("value") > 450).select("event_id", "value")
    assert _rows(out, "event_id", "value") == _rows(expected, "event_id", "value")


def test_computation_multi_word_count(spark):
    docs = load_tables(spark, SF_SMALL)["documents"]

    @api.computation_multi("split", schema="word string")
    def split(rec):
        return [{"word": w} for w in rec.text.lower().split(" ") if w]

    class CountAgg(api.Aggregation):
        output_schema = "word string, cnt bigint"

        def initial_accumulator(self):
            return {"n": 0}

        def update(self, data, acc):
            acc["n"] += 1

        def combine(self, a, b):
            return {"n": a["n"] + b["n"]}

        def output(self, key, acc):
            return {"word": key, "cnt": acc["n"]}

    # split -> key_by word -> per-key state count (via state_computation)
    class WordState:
        def __init__(self):
            self.n = 0

    @api.state_computation("count", WordState, schema="word string, running bigint")
    def count(rec, state):
        state.n += 1
        return {"word": rec.word, "running": state.n}

    p = (
        api.source("wc", DataFrameSource("wc", docs))
        .to(split)
        .key_by("word")
        .to(count)
        .to_sink(ReturnSink())
    )
    out = api.build_application("wc", p).run_batch(spark)
    # final running count per word == group count
    final = out.groupBy("word").agg(F.max("running").alias("cnt"))
    expected = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    assert _rows(final, "word", "cnt") == _rows(expected, "word", "count")


def test_range_windows_fast_path(spark, events):
    class SumAgg(api.Aggregation):
        def initial_accumulator(self):
            return 0.0

        def update(self, data, acc):
            return acc + data.value

        def combine(self, a, b):
            return a + b

        def output(self, key, acc):
            return {"total": acc}

        def spark_agg(self):
            return {"total": F.round(F.sum("value"), 2)}

    p = (
        api.source("w", DataFrameSource("w", events))
        .key_by("event_type")
        .to(api.range_windows(api.hours(1)).over(SumAgg))
        .to_sink(ReturnSink())
    )
    out = api.build_application("w", p).run_batch(spark)
    expected = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("event_type").alias("__key"),
            F.col("w.start").alias("window_start"),
            "total",
        )
    )
    assert _rows(out, "__key", "window_start", "total") == _rows(
        expected, "__key", "window_start", "total"
    )


def test_range_windows_python_path_sliding(spark, events):
    class SumAgg(api.Aggregation):
        output_schema = "total double, n bigint"

        def initial_accumulator(self):
            return {"t": 0.0, "n": 0}

        def update(self, data, acc):
            acc["t"] += data.value
            acc["n"] += 1

        def combine(self, a, b):
            return {"t": a["t"] + b["t"], "n": a["n"] + b["n"]}

        def output(self, key, acc):
            return {"total": round(acc["t"], 2), "n": acc["n"]}

    p = (
        api.source("w", DataFrameSource("w", events))
        .key_by("event_type")
        .to(
            api.range_windows(api.hours(1))
            .with_slide(api.minutes(15))
            .over(SumAgg)
        )
        .to_sink(ReturnSink())
    )
    out = api.build_application("w", p).run_batch(spark)
    expected = (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("event_type").alias("__key"),
            F.col("w.start").alias("window_start"),
            "total",
            "n",
        )
    )
    assert _rows(out, "__key", "window_start", "total", "n") == _rows(
        expected, "__key", "window_start", "total", "n"
    )


def test_count_windows_batch(spark, events):
    class SumAgg(api.Aggregation):
        output_schema = "total double, n bigint"

        def initial_accumulator(self):
            return {"t": 0.0, "n": 0}

        def update(self, data, acc):
            acc["t"] += data.value
            acc["n"] += 1

        def combine(self, a, b):
            return {"t": a["t"] + b["t"], "n": a["n"] + b["n"]}

        def output(self, key, acc):
            return {"total": round(acc["t"], 2), "n": acc["n"]}

    p = (
        api.source("cw", DataFrameSource("cw", events))
        .key_by("user_id")
        .to(api.count_windows(20).over(SumAgg))
        .to_sink(ReturnSink())
    )
    out = api.build_application("cw", p).run_batch(spark)
    assert out.where(F.col("n") != 20).count() == 0
    # total fired windows = sum of floor(count/20) per user
    per_user = events.groupBy("user_id").count().collect()
    assert out.count() == sum(r["count"] // 20 for r in per_user)


def test_merge_and_collect(spark, events):
    a = api.source(
        "purchases", DataFrameSource("purchases", events)
    ).to(
        api.computation(
            "sel",
            exprs={
                "_where": F.col("event_type") == "purchase",
                "amount": F.col("value"),
            },
        )
    )
    b = api.source("signups", DataFrameSource("signups", events)).to(
        api.computation(
            "sel2",
            exprs={
                "_where": F.col("event_type") == "signup",
                "amount": F.col("value") * 10.0,
            },
        )
    )
    merged = a.merge(b).to_sink(ReturnSink())
    out = api.build_application("m", merged).run_batch(spark)
    n_expected = events.where(F.col("event_type").isin("purchase", "signup")).count()
    assert out.count() == n_expected


def test_key_extractor_callable(spark, events):
    ext = api.key_extractor(lambda rec: f"u{rec.user_id % 7}")
    p = (
        api.source("k", DataFrameSource("k", events))
        .key_by(ext)
        .to(
            api.computation(
                "ident", exprs={"__key": F.col("__key"), "user_id": F.col("user_id")}
            )
        )
        .to_sink(ReturnSink())
    )
    out = api.build_application("k", p).run_batch(spark)
    bad = out.where(F.col("__key") != F.concat(F.lit("u"), (F.col("user_id") % 7))).count()
    assert bad == 0


def test_gen_source_batch(spark):
    class Gen:
        def initial_value(self):
            return {"n": 1}

        def apply(self, last):
            return {"n": last["n"] + 1}

    p = (
        api.source("gen", GenSourceConfig("gen", Gen(), n_batch=50))
        .to(api.computation("sq", exprs={"n": F.col("n"), "sq": F.col("n") * F.col("n")}))
        .to_sink(ReturnSink())
    )
    out = api.build_application("gen", p).run_batch(spark)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows[0] == (1, 1) and rows[-1] == (50, 2500) and len(rows) == 50


def test_build_application_requires_sink():
    p = api.source("s", DataFrameSource("s", None))
    with pytest.raises(api.WallyParameterError):
        api.build_application("bad", p)


def test_session_windows_batch(spark, events):
    class SumAgg(api.Aggregation):
        def initial_accumulator(self):
            return 0.0

        def update(self, data, acc):
            return acc + data.value

        def combine(self, a, b):
            return a + b

        def output(self, key, acc):
            return {"total": acc}

        def spark_agg(self):
            return {"total": F.round(F.sum("value"), 2), "n": F.count(F.lit(1))}

    p = (
        api.source("sw", DataFrameSource("sw", events))
        .key_by("user_id")
        .to(api.session_windows(api.minutes(10)).over(SumAgg))
        .to_sink(ReturnSink())
    )
    out = api.build_application("sw", p).run_batch(spark)
    expected = (
        events.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.round(F.sum("value"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == expected.count()
    assert out.agg(F.round(F.sum("total"), 0)).collect()[0][0] == \
        expected.agg(F.round(F.sum("total"), 0)).collect()[0][0]


def test_to_sinks_multiplex(spark, events, tmp_path):
    from wally_spark.sinks import ParquetSink

    s1 = ParquetSink(f"{tmp_path}/s1")
    s2 = ParquetSink(f"{tmp_path}/s2")
    p = (
        api.source("m", DataFrameSource("m", events))
        .to(api.computation("sel", exprs={"event_id": F.col("event_id")}))
        .to_sinks([s1, s2])
    )
    api.build_application("m", p).run_batch(spark)
    n = events.count()
    assert spark.read.parquet(f"{tmp_path}/s1").count() == n
    assert spark.read.parquet(f"{tmp_path}/s2").count() == n


def test_post_window_computation_chain(spark, events):
    """window → stateless computation → sink (alerts_windowed shape:
    the aggregation's output flows through further stages)."""

    class SumAgg(api.Aggregation):
        def initial_accumulator(self):
            return 0.0

        def update(self, data, acc):
            return acc + data.value

        def combine(self, a, b):
            return a + b

        def output(self, key, acc):
            return {"total": acc}

        def spark_agg(self):
            return {"total": F.round(F.sum("value"), 2)}

    alert = api.computation(
        "alert",
        exprs={
            "_where": F.col("total") > 400,
            "user": F.col("__key"),
            "window_start": F.col("window_start"),
            "alert_total": F.col("total"),
        },
    )
    p = (
        api.source("w", DataFrameSource("w", events))
        .key_by("user_id")
        .to(api.range_windows(api.hours(1)).over(SumAgg))
        .to(alert)
        .to_sink(ReturnSink())
    )
    out = api.build_application("w", p).run_batch(spark)
    # the key column survives stateless stages (keying persists, like
    # the reference's key_by scope)
    assert out.columns == ["__key", "user", "window_start", "alert_total"]
    assert out.where(F.col("alert_total") <= 400).count() == 0
    expected = (
        events.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("t"))
        .where(F.col("t") > 400)
        .count()
    )
    assert out.count() == expected


def test_register_views_sql_surface(spark):
    """Raw spark.sql over the registered views — same names as the
    oracle's DuckDB views — with pushdown reaching the parquet scan."""
    from wally_spark.tables import register_views

    register_views(spark, SF_SMALL)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT l_orderkey) AS o FROM lineitem"
    ).collect()[0]
    li = load_tables(spark, SF_SMALL)["lineitem"]
    assert got["n"] == li.count()
    assert got["o"] == li.select("l_orderkey").distinct().count()
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]
