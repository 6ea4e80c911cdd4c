"""Multimodal-column plumbing: opaque `binary` payloads with typed
metadata, decoded by Arrow-batched Pandas UDFs via mapInPandas.

The container has no image/audio codecs, so the decode itself is a
deterministic fake (first bytes → dimensions) with the REAL Spark
plumbing — binary column, schema, batching, partition-parallel UDF —
exercised end to end and oracle-checked (the fake decode is md5-based
so DuckDB reproduces it from hex). Real codec integration points are
in ``wally_spark.operators.multimodal``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables


@register(
    "mm_image_meta",
    oracle="""
SELECT doc_id,
       (('0x' || substr(md5(text), 1, 2))::INT % 64) * 16 + 64 AS width,
       (('0x' || substr(md5(text), 3, 2))::INT % 64) * 16 + 64 AS height,
       16 AS n_bytes
FROM documents
""",
    tags=("multimodal",),
)
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque image payload (md5 digest bytes of the
    text), then decode width/height metadata from the bytes inside an
    Arrow-batched Pandas UDF — the exact shape a real image-metadata
    extractor (PIL/ffprobe) takes at 100 TB: mapInPandas, no driver
    involvement, binary column never leaves the executors."""
    import pandas as pd

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select(
        "doc_id", F.unhex(F.md5(F.col("text").cast("binary"))).alias("payload")
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", IntegerType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [(b[0] % 64) * 16 + 64 for b in payload],
                    "height": [(b[1] % 64) * 16 + 64 for b in payload],
                    "n_bytes": [len(b) for b in payload],
                }
            )

    return payloads.mapInPandas(decode, schema)
