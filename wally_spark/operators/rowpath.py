"""Row-level Python computation path: Arrow-batched mapInPandas.

This is the slow path by design (SURVEY §6) — used only when a
computation can't be expressed as Column expressions. Rows cross to
Python as Arrow batches, the user function sees attribute-style
records, outputs are rebuilt into Arrow batches. No per-row py4j
round-trips, no driver involvement."""

from __future__ import annotations

from types import SimpleNamespace

import pandas as pd
from pyspark.sql import DataFrame


def _rows(pdf: pd.DataFrame):
    for t in pdf.itertuples(index=False):
        yield SimpleNamespace(**t._asdict())


def run_rowpath(df: DataFrame, fn, is_multi: bool, schema: str | None) -> DataFrame:
    """Apply fn(record)->dict|None (or ->list[dict] when multi)."""
    out_schema = schema or df.schema

    def runner(batches):
        for pdf in batches:
            out = []
            for rec in _rows(pdf):
                res = fn(rec)
                if res is None:
                    continue
                if is_multi:
                    out.extend(r if isinstance(r, dict) else vars(r) for r in res)
                else:
                    out.append(res if isinstance(res, dict) else vars(res))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in _schema_cols(out_schema)}
            )

    return df.mapInPandas(runner, out_schema)


def _schema_cols(schema) -> list[str]:
    if isinstance(schema, str):
        return [p.strip().split()[0] for p in schema.split(",")]
    return schema.names


def add_key_column(df: DataFrame, fn, key_col: str) -> DataFrame:
    """Computed-key path for @key_extractor callables."""
    from pyspark.sql.types import StringType, StructField, StructType

    def runner(batches):
        for pdf in batches:
            keys = [str(fn(rec)) for rec in _rows(pdf)]
            pdf = pdf.copy()
            pdf[key_col] = keys
            yield pdf

    # fresh StructType: .add would mutate the DataFrame's cached schema
    schema = StructType(list(df.schema.fields) + [StructField(key_col, StringType())])
    return df.mapInPandas(runner, schema)
