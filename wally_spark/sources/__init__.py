"""Source configs — the engine's counterpart of the reference's
TCPSourceConfig / GenSourceConfig / Kafka parsers / file connectors
(machida/__init__.py:512-598, experimental/connectors.py).

Each config reads as a batch DataFrame and/or a streaming DataFrame;
decoding is schema-on-read (parquet/csv/json) or a decoder expression
applied to the raw bytes/lines (socket/kafka), replacing the
reference's framed byte decoders.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class SourceConfig:
    name: str

    def read_batch(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(f"{type(self).__name__} is streaming-only")

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(f"{type(self).__name__} is batch-only")


@dataclass
class ParquetSourceConfig(SourceConfig):
    """Columnar file source (batch + file-stream)."""

    name: str
    path: str
    # streaming file source needs a schema; inferred from the batch path
    def read_batch(self, spark):
        from wally_spark.tables import _read

        return _read(spark, self.path)

    def read_stream(self, spark):
        from wally_spark.tables import _read

        schema = _read(spark, self.path).schema
        return spark.readStream.schema(schema).parquet(self.path)


@dataclass
class CSVSourceConfig(SourceConfig):
    name: str
    path: str
    options: dict[str, str] = field(default_factory=lambda: {"header": "true"})

    def read_batch(self, spark):
        return spark.read.options(**self.options).csv(self.path)

    def read_stream(self, spark):
        schema = spark.read.options(**self.options).csv(self.path).schema
        return spark.readStream.schema(schema).options(**self.options).csv(self.path)


@dataclass
class JSONSourceConfig(SourceConfig):
    name: str
    path: str

    def read_batch(self, spark):
        return spark.read.json(self.path)

    def read_stream(self, spark):
        schema = spark.read.json(self.path).schema
        return spark.readStream.schema(schema).json(self.path)


@dataclass
class ORCSourceConfig(SourceConfig):
    """ORC columnar file source (batch + file-stream) — built into
    Spark like parquet; the interchange format warehouse-side Hive/Trino
    deployments hand over."""

    name: str
    path: str

    def read_batch(self, spark):
        return spark.read.orc(self.path)

    def read_stream(self, spark):
        schema = spark.read.orc(self.path).schema
        return spark.readStream.schema(schema).orc(self.path)


@dataclass
class AvroSourceConfig(SourceConfig):
    """Avro row-file source (batch + file-stream). Spark treats Avro
    as an external module (`org.apache.spark:spark-avro`); this config
    works wherever the deployment ships that jar — the sandbox does
    not, so the round-trip test env-gates on a write probe (the Kafka
    contract-test convention)."""

    name: str
    path: str

    def read_batch(self, spark):
        return spark.read.format("avro").load(self.path)

    def read_stream(self, spark):
        schema = spark.read.format("avro").load(self.path).schema
        return (
            spark.readStream.schema(schema).format("avro").load(self.path)
        )


@dataclass
class GenSourceConfig(SourceConfig):
    """Reference GenSourceConfig (machida/__init__.py:528): an object
    with initial_value()/apply(last) generating the stream. Streaming:
    the rate source drives ``apply`` per tick via an expression or
    row-path computation; batch: materializes ``n_batch`` values."""

    name: str
    gen_instance: Any
    rows_per_second: int = 100
    n_batch: int = 1000

    def read_batch(self, spark):
        vals, v = [], self.gen_instance.initial_value()
        vals.append(v)
        for _ in range(self.n_batch - 1):
            v = self.gen_instance.apply(v)
            vals.append(v)
        rows = [v if isinstance(v, dict) else {"value": v} for v in vals]
        return spark.createDataFrame(rows)

    def read_stream(self, spark):
        """Rate source drives the generator. If the gen object provides
        ``value_at(n)`` (a pure function of the sequence index — the
        Spark-first generator contract, parallelizable across
        executors), each rate tick n is mapped through it. A gen with
        only sequential ``apply`` state can't be distributed; then the
        raw rate rows (timestamp, value) are returned and the caller's
        first computation decodes them."""
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .load()
        )
        value_at = getattr(self.gen_instance, "value_at", None)
        if value_at is None:
            return rate

        import pandas as pd

        sample = [value_at(i) for i in range(4)]
        sample_rows = [v if isinstance(v, dict) else {"value": v} for v in sample]
        schema = spark.createDataFrame(sample_rows).schema

        def gen_rows(batches):
            for pdf in batches:
                rows = [
                    v if isinstance(v, dict) else {"value": v}
                    for v in (value_at(int(n)) for n in pdf["value"])
                ]
                yield pd.DataFrame(rows) if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in schema.fields}
                )

        return rate.mapInPandas(gen_rows, schema)


@dataclass
class SocketSourceConfig(SourceConfig):
    """TCPSourceConfig analog: line-framed text over a socket; the
    ``decoder`` is a dict of column → Column expression over `value`
    (the raw line), replacing byte-frame decoders."""

    name: str
    host: str
    port: int
    decoder: dict[str, Any] | None = None

    def read_stream(self, spark):
        df = (
            spark.readStream.format("socket")
            .option("host", self.host)
            .option("port", str(self.port))
            .load()
        )
        if self.decoder:
            df = df.select(*[expr.alias(c) for c, expr in self.decoder.items()])
        return df


@dataclass
class KafkaSourceConfig(SourceConfig):
    """Kafka source (reference: CustomKafkaSourceCLIParser). Config
    builder only in this container (no broker); `.read_stream` wires
    the standard kafka format options."""

    name: str
    topic: str
    brokers: str  # host:port,host:port
    starting_offsets: str = "earliest"
    decoder: dict[str, Any] | None = None

    def reader_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.brokers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
        }

    def read_stream(self, spark):
        df = spark.readStream.format("kafka")
        for k, v in self.reader_options().items():
            df = df.option(k, v)
        out = df.load().select(
            F.col("key").cast("string"),
            F.col("value").cast("string"),
            "timestamp",
        )
        if self.decoder:
            out = out.select(
                *[expr.alias(c) for c, expr in self.decoder.items()]
            )
        return out

    def read_batch(self, spark):
        """Bounded read of the topic (spark.read.format('kafka')) —
        batch queries reject startingOffsets=latest, so 'latest' falls
        back to earliest here. Same projection/decoder contract as
        read_stream."""
        df = spark.read.format("kafka")
        for k, v in self.reader_options().items():
            if k == "startingOffsets" and v == "latest":
                v = "earliest"
            df = df.option(k, v)
        out = df.load().select(
            F.col("key").cast("string"),
            F.col("value").cast("string"),
            "timestamp",
        )
        if self.decoder:
            out = out.select(
                *[expr.alias(c) for c, expr in self.decoder.items()]
            )
        return out


@dataclass
class DataFrameSource(SourceConfig):
    """Adapter for tests / embedding: wrap an existing DataFrame."""

    name: str
    df: DataFrame

    def read_batch(self, spark):
        return self.df

    def read_stream(self, spark):
        if not self.df.isStreaming:
            raise ValueError("DataFrameSource.read_stream needs a streaming DF")
        return self.df
