"""Batch compiler: Pipeline stages → one DataFrame plan.

Every stage lowers to declarative DataFrame ops so Catalyst sees the
whole program (pushdown through stateless stages, broadcast of merged
dims, AQE on the keyed shuffles). Python-path stages are Arrow-batched
islands inside the plan."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.api import (
    Computation,
    CountWindows,
    KeyExtractor,
    Pipeline,
    RangeWindows,
    WallyParameterError,
)
from wally_spark.operators.rowpath import add_key_column, run_rowpath
from wally_spark.operators.stateful import KEY_COL, run_state_batch
from wally_spark.operators.windows import count_windows_batch, range_windows_batch


def _apply_stateless(df: DataFrame, comp: Computation) -> DataFrame:
    if comp.exprs is not None:
        exprs = dict(comp.exprs)
        cond = exprs.pop("_where", None)
        if cond is not None:
            df = df.where(cond)
        if exprs:
            keep = (
                [F.col(KEY_COL)]
                if KEY_COL in df.columns and KEY_COL not in exprs
                else []
            )
            df = df.select(*keep, *[c.alias(n) for n, c in exprs.items()])
        return df
    schema = comp.schema
    if schema is not None and KEY_COL in df.columns and KEY_COL not in schema:
        schema = schema + f", {KEY_COL} string"
    return run_rowpath(df, comp.fn, comp.is_multi, schema)


def compile_batch(
    spark: SparkSession, pipeline: Pipeline, override_sources: dict[str, DataFrame]
) -> DataFrame:
    df: DataFrame | None = None
    result = None
    for stage in pipeline.stages:
        kind = stage[0]
        if kind == "source":
            _, name, cfg = stage
            df = override_sources.get(name) or cfg.read_batch(spark)
        elif kind == "key_by":
            ext: KeyExtractor = stage[1]
            if ext.col is not None:
                df = df.withColumn(KEY_COL, F.col(ext.col).cast("string"))
            else:
                df = add_key_column(df, ext.fn, KEY_COL)
        elif kind == "collect":
            df = df.withColumn(KEY_COL, F.lit(""))
        elif kind == "to":
            df = _apply_stateless(df, stage[1])
        elif kind == "to_state":
            comp = stage[1]
            if KEY_COL not in df.columns:
                raise WallyParameterError("state computation requires key_by first")
            if comp.schema is None:
                raise WallyParameterError("batch state computation needs schema=")
            df = run_state_batch(df, comp, f"{KEY_COL} string, " + comp.schema)
        elif kind == "to_range_windows":
            win: RangeWindows = stage[1]
            if KEY_COL not in df.columns:
                df = df.withColumn(KEY_COL, F.lit(""))
            df = range_windows_batch(df, win)
        elif kind == "to_session_windows":
            from wally_spark.operators.windows import session_windows_op

            if KEY_COL not in df.columns:
                df = df.withColumn(KEY_COL, F.lit(""))
            df = session_windows_op(df, stage[1], streaming=False)
        elif kind == "to_count_windows":
            win: CountWindows = stage[1]
            if KEY_COL not in df.columns:
                df = df.withColumn(KEY_COL, F.lit(""))
            df = count_windows_batch(df, win)
        elif kind == "merge":
            other = compile_batch(spark, stage[1], override_sources)
            df = df.unionByName(other, allowMissingColumns=False)
        elif kind == "to_sink":
            result = stage[1].write_batch(df)
        elif kind == "to_sinks":
            for cfg in stage[1]:
                result = cfg.write_batch(df)
        else:
            raise WallyParameterError(f"unknown stage {kind}")
    return result if result is not None else df
