"""Load the driver-generated parquet tables (TESTDATA.md).

Column pruning / predicate pushdown reach the parquet scan because we
hand back the raw reader output (no caching, no materialization).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

# Columns stored as TIMESTAMP(NANOS) in the test parquet (see _read).
NANOS_TS_COLS = frozenset({"ts"})

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor where
# they follow TPC-H scaling (region/nation are constant-size; the rest
# grow linearly but stay far below fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def _read(spark: SparkSession, path: str) -> DataFrame:
    # Test parquet stores TIMESTAMP(NANOS); this conf lets the vectorized
    # reader surface them (as TIMESTAMP_NTZ on Spark 4.1). Set at runtime
    # so it applies under any caller-provided SparkSession. Cast NTZ →
    # TIMESTAMP (session TZ is UTC) so downstream interval arithmetic and
    # unix_timestamp behave uniformly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif f.name in NANOS_TS_COLS and isinstance(f.dataType, LongType):
            # TIMESTAMP(NANOS) column surfaced as epoch-nanos long by the
            # nanosAsLong conf: convert to TIMESTAMP at micros precision
            # (same floor-truncation DuckDB applies reading ns parquet).
            df = df.withColumn(
                f.name, F.timestamp_micros((F.col(f.name) / 1000).cast("long"))
            )
    return df


# fan_out partition-count memo (r14): df.rdd.getNumPartitions() runs
# the FULL physical planning of the input per call (tens of ms of
# driver time × ~28 call sites). Every fan_out input is, by contract,
# a narrow projection/filter of a parquet scan, and scan splits are
# computed from file sizes + session conf — never from the read
# schema or pushed filters — so the count is a pure function of
# (session, input file set) and can be probed once.
_NPART_MEMO: dict[tuple[int, tuple[str, ...]], int] = {}


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Redistribute a scan across the cluster ONLY when it yields
    fewer partitions than cores — the local small-file case (one
    parquet row group → one task), where a downstream explode /
    Arrow-batched UDF / wide aggregate would otherwise run on a single
    core. At 100 TB the scan already has ≥ cores partitions and this
    is a NO-OP — no shuffle is ever added at scale; when it does fire,
    the shuffle carries the cheap pre-explode rows, never the derived
    stream. Keyed by the table's id column so a downstream
    groupBy(key) can reuse the partitioning (exchange elided when
    spark.sql.shuffle.partitions matches). Predicate pushdown and
    column pruning pass through RepartitionByExpression, so scans stay
    pruned (asserted in tests/test_plans.py).

    CONTRACT: the input must be a narrow projection/filter of a file
    scan (every call site is) — the partition-count memo assumes the
    count is determined by the scanned files alone."""
    sc = df.sparkSession.sparkContext
    memo_key = None
    n = None
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    memo_on = (
        str(
            df.sparkSession.conf.get("spark.wally.fanout.memo", "true")
        ).lower()
        != "false"
    )
    if files and memo_on:
        memo_key = (id(df.sparkSession), files)
        n = _NPART_MEMO.get(memo_key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if memo_key is not None:
            _NPART_MEMO[memo_key] = n
    if n < sc.defaultParallelism:
        if keys:
            return df.repartition(sc.defaultParallelism, *keys)
        return df.repartition(sc.defaultParallelism)
    return df


class _LazyTables(dict):
    """Reads a table's parquet footer only on first access, and keeps
    the DataFrame (an immutable logical plan) for reuse — a query
    touching 2 of the 10 tables pays for 2 schema reads, not 10."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, t: str) -> DataFrame:
        if t not in TABLES:
            raise KeyError(t)
        df = _read(self._spark, f"{self._sf_dir}/{t}.parquet")
        self[t] = df
        return df


_CACHE: dict[tuple[int, str], _LazyTables] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = _LazyTables(spark, sf_dir)
    return _CACHE[key]


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple = TABLES
) -> None:
    """Expose the corpus as temp views so users can query with raw
    ``spark.sql`` — the Spark-side mirror of the DuckDB views the
    correctness oracle runs against (same names, same nanos-timestamp
    handling). Views wrap the lazy reader output, so pushdown and
    pruning still reach the scans."""
    t = load_tables(spark, sf_dir)
    for name in tables:
        t[name].createOrReplaceTempView(name)


def dataset_tag(spark: SparkSession, sf_dir: str, tables: tuple = TABLES) -> str:
    """8-hex tag folding sf_dir AND a cheap data fingerprint (per-file
    length + mtime via the Hadoop FileSystem API, so object-store paths
    work too). Session-cached derived tables (bucketed facts, the ANN
    index) key on this instead of the path alone: regenerating the data
    under sf_dir changes the tag and forces a rebuild, instead of
    silently serving results from the old data."""
    import hashlib

    jvm = spark._jvm
    h = hashlib.md5(sf_dir.encode())
    for t in tables:
        p = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/{t}.parquet")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            st = fs.getFileStatus(p)
            h.update(f"{t}:{st.getLen()}:{st.getModificationTime()}".encode())
    return h.hexdigest()[:8]
