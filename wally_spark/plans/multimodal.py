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
from wally_spark.tables import fan_out, load_tables


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
            # NULL payloads (extraction failures) must not kill the
            # task: emit NULL dims / 0 bytes, same contract as the
            # header decoder (operators/multimodal.py)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [
                        None if b is None else (b[0] % 64) * 16 + 64
                        for b in payload
                    ],
                    "height": [
                        None if b is None else (b[1] % 64) * 16 + 64
                        for b in payload
                    ],
                    "n_bytes": [0 if b is None else len(b) for b in payload],
                }
            )

    return payloads.mapInPandas(decode, schema)


@register(
    "mm_image_header",
    oracle="""
SELECT doc_id, 'png' AS fmt,
       (64 + doc_id % 512)::INT AS width,
       (64 + (doc_id * 31) % 512)::INT AS height,
       29 AS n_bytes
FROM documents
""",
    tags=("multimodal",),
)
def mm_image_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-parse metadata extraction through the REAL operator
    (operators/multimodal.decode_image_header_meta): each doc gets a
    VALID PNG signature+IHDR payload (dimensions derived from doc_id,
    so DuckDB predicts them arithmetically), and the operator reads the
    format and dimensions back out of the raw bytes — no codec library,
    which is exactly how a 100 TB metadata pass runs (headers only,
    pixels never decoded, payloads never leave executors)."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = (F.lit(64) + F.col("doc_id") % 512).cast("int")
    h = (F.lit(64) + (F.col("doc_id") * 31) % 512).cast("int")
    hdr = F.concat(
        F.lit("89504e470d0a1a0a"),  # PNG signature
        F.lit("0000000d49484452"),  # IHDR chunk length + type
        F.format_string("%08x", w),
        F.format_string("%08x", h),
        F.lit("0806000000"),  # bit depth, color type, compression...
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))

    from wally_spark.operators.multimodal import decode_image_header_meta

    return decode_image_header_meta(payloads)


@register(
    "mm_frame_sample",
    oracle="""
WITH c AS (
  SELECT doc_id, md5(text) AS m1 FROM documents
), c3 AS (
  SELECT doc_id, m1, md5(md5(m1)) AS m3 FROM c
)
SELECT doc_id, 0::BIGINT AS frame_idx, m1 AS frame_hex FROM c3
UNION ALL
SELECT doc_id, 2::BIGINT, m3 FROM c3
""",
    tags=("multimodal", "video"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the REAL operator
    (operators/multimodal.sample_frames): a 64-byte fake 'video' per
    doc (an md5 chain, so DuckDB reproduces every frame from hex) is
    split into 16-byte frames and every 2nd frame kept — the exact
    mapInPandas batch shape an ffmpeg/pyav sampler has at 100 TB
    (payloads never leave executors, output is frames-per-row)."""
    docs = load_tables(spark, sf_dir)["documents"]
    m1 = F.md5(F.col("text").cast("binary"))
    m2 = F.md5(m1.cast("binary"))
    m3 = F.md5(m2.cast("binary"))
    m4 = F.md5(m3.cast("binary"))
    payload = F.unhex(F.concat(m1, m2, m3, m4))  # 64 'video' bytes
    pf = docs.select("doc_id", payload.alias("payload"))

    from wally_spark.operators.multimodal import sample_frames

    frames = sample_frames(pf, frame_bytes=16, every_nth=2)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


THUMB_MAX_SIDE = 128


@register(
    "mm_thumbnail",
    oracle=f"""
WITH dims AS (
  SELECT doc_id,
         (64 + doc_id % 512)::INT AS w,
         (64 + (doc_id * 31) % 512)::INT AS h
  FROM documents
)
SELECT doc_id, 'png' AS fmt, w AS in_w, h AS in_h,
       (CASE WHEN w <= {THUMB_MAX_SIDE} AND h <= {THUMB_MAX_SIDE} THEN w
             WHEN w >= h THEN {THUMB_MAX_SIDE}
             ELSE greatest(1, (w * {THUMB_MAX_SIDE}) // h) END)::INT AS out_w,
       (CASE WHEN w <= {THUMB_MAX_SIDE} AND h <= {THUMB_MAX_SIDE} THEN h
             WHEN w >= h THEN greatest(1, (h * {THUMB_MAX_SIDE}) // w)
             ELSE {THUMB_MAX_SIDE} END)::INT AS out_h,
       ((CASE WHEN w <= {THUMB_MAX_SIDE} AND h <= {THUMB_MAX_SIDE} THEN w
              WHEN w >= h THEN {THUMB_MAX_SIDE}
              ELSE greatest(1, (w * {THUMB_MAX_SIDE}) // h) END)::BIGINT
        * (CASE WHEN w <= {THUMB_MAX_SIDE} AND h <= {THUMB_MAX_SIDE} THEN h
                WHEN w >= h THEN greatest(1, (h * {THUMB_MAX_SIDE}) // w)
                ELSE {THUMB_MAX_SIDE} END))::BIGINT AS n_bytes
FROM dims
""",
    tags=("multimodal",),
)
def mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass through the REAL operator
    (operators/multimodal.thumbnail_images): each doc's synthetic PNG
    header (same payloads as mm_image_header, dims arithmetic from
    doc_id so DuckDB predicts them) flows through the Arrow-batched
    thumbnail operator, which header-parses input dimensions and
    computes the aspect-preserving integer output box — PIL.thumbnail
    semantics without a codec. At 100 TB this is the metadata half of
    a thumbnailing job; the pixel half swaps into the same mapInPandas
    body when codecs exist (operators/multimodal.py docstring)."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = (F.lit(64) + F.col("doc_id") % 512).cast("int")
    h = (F.lit(64) + (F.col("doc_id") * 31) % 512).cast("int")
    hdr = F.concat(
        F.lit("89504e470d0a1a0a"),
        F.lit("0000000d49484452"),
        F.format_string("%08x", w),
        F.format_string("%08x", h),
        F.lit("0806000000"),
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))

    from wally_spark.operators.multimodal import thumbnail_images

    return thumbnail_images(payloads, THUMB_MAX_SIDE)


_HEXD = "0123456789abcdef"


@register(
    "mm_byte_stats",
    oracle=f"""
WITH m AS (SELECT doc_id, md5(text) AS x FROM documents),
b AS (
  SELECT doc_id,
         list_transform(range(0, 16), i ->
             (strpos('{_HEXD}', substr(x, 2*i + 1, 1)) - 1) * 16
           + (strpos('{_HEXD}', substr(x, 2*i + 2, 1)) - 1)) AS bytes,
         list_transform(range(0, 16), i ->
             strpos('{_HEXD}', substr(x, 2*i + 1, 1)) - 1) AS his
  FROM m
),
c AS (
  SELECT doc_id, bytes, his,
         list_transform(range(0, 16),
                        v -> len(list_filter(his, q -> q = v))) AS counts
  FROM b
)
SELECT doc_id,
       16::BIGINT AS n_bytes,
       ((1000 * list_sum(bytes)) // 16)::BIGINT AS mean_milli,
       len(list_distinct(bytes))::BIGINT AS n_distinct,
       (list_position(counts, list_max(counts)) - 1)::BIGINT AS hi_mode
FROM c
""",
    tags=("multimodal", "features"),
)
def mm_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the REAL operator
    (operators/multimodal.byte_stats): one vectorized numpy pass per
    Arrow batch computes per-payload byte statistics (count, exact
    milli-mean, distinct values, modal high nibble with lowest-value
    tie-break). The payloads are md5(text) bytes, so DuckDB recomputes
    every statistic from the hex digest with pure integer arithmetic —
    a hash-exact oracle for a featurizer UDF, the same contract a CLIP
    embedder or MFCC extractor plugs into at 100 TB (payloads never
    leave executors; narrow typed rows come back)."""
    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select(
        "doc_id", F.unhex(F.md5(F.col("text").cast("binary"))).alias("payload")
    )

    from wally_spark.operators.multimodal import byte_stats

    return byte_stats(payloads)


# --- audio: RIFF/WAVE header metadata (r7) ----------------------------------
def _le16(col):
    h = F.format_string("%04x", col.cast("int"))
    return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))


def _le32(col):
    h = F.format_string("%08x", col.cast("int"))
    return F.concat(
        F.substring(h, 7, 2),
        F.substring(h, 5, 2),
        F.substring(h, 3, 2),
        F.substring(h, 1, 2),
    )


@register(
    "mm_wav_header",
    oracle="""
SELECT doc_id, 'wav' AS fmt,
       (1 + doc_id % 2)::INT AS channels,
       (8000 * (1 + doc_id % 6))::INT AS sample_rate,
       16 AS bits,
       (500 * (1 + doc_id % 5))::BIGINT AS duration_ms,
       44 AS n_bytes
FROM documents
""",
    tags=("multimodal", "audio"),
)
def mm_wav_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-metadata extraction through the REAL RIFF/WAVE chunk
    walker (operators/multimodal.parse_wav_header): each doc gets a
    VALID canonical 44-byte PCM WAV header (fields derived from doc_id
    so DuckDB predicts them arithmetically — data sized to an exact
    half-second multiple so duration_ms is integer by construction),
    and the operator walks RIFF chunks to read channels / sample rate
    / bit depth / duration back out of the little-endian bytes. Same
    100 TB contract as mm_image_header: headers only, samples never
    decoded, payloads never leave executors, Arrow-batched
    mapInPandas."""
    docs = load_tables(spark, sf_dir)["documents"]
    c = (1 + F.col("doc_id") % 2).cast("int")
    sr = (8000 * (1 + F.col("doc_id") % 6)).cast("int")
    ba = (c * 2).cast("int")
    br = (sr * ba).cast("int")
    ds = ((br / 2).cast("int") * (1 + F.col("doc_id") % 5)).cast("int")
    hdr = F.concat(
        F.lit("52494646"),  # "RIFF"
        _le32(ds + 36),
        F.lit("57415645"),  # "WAVE"
        F.lit("666d7420"),  # "fmt "
        _le32(F.lit(16)),
        _le16(F.lit(1)),  # PCM
        _le16(c),
        _le32(sr),
        _le32(br),
        _le16(ba),
        _le16(F.lit(16)),  # bits
        F.lit("64617461"),  # "data"
        _le32(ds),
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))

    from wally_spark.operators.multimodal import decode_wav_header_meta

    return decode_wav_header_meta(payloads)


@register(
    "mm_pcm_stats",
    oracle="""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, (8 + doc_id % 9)::INT),
                        i -> ((doc_id * 31 + i * 97) % 4096) - 2048) AS vs
  FROM documents
)
SELECT doc_id,
       len(vs)::BIGINT AS n_samples,
       list_sum(list_transform(vs, v -> v * v))::BIGINT AS sumsq,
       list_max(list_transform(vs, v -> abs(v)))::BIGINT AS peak_abs,
       list_sum(list_transform(range(0, (len(vs) - 1)::INT),
                i -> CASE WHEN (vs[i + 1] < 0) <> (vs[i + 2] < 0)
                     THEN 1 ELSE 0 END))::BIGINT AS zero_cross
FROM s
""",
    tags=("multimodal", "audio", "features"),
)
def mm_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-level audio feature extraction through the REAL decoder
    (operators/multimodal.pcm_sample_stats): each doc gets a valid
    mono 16-bit 8 kHz WAV whose PCM samples are derived from doc_id
    (sample_i = ((doc_id·31 + i·97) mod 4096) − 2048, 8–16 samples),
    and the operator chunk-walks to the data chunk, reinterprets the
    little-endian int16 block with numpy, and emits exact integer
    energy / peak / zero-crossing statistics. DuckDB recomputes every
    statistic arithmetically from doc_id — a hash-exact oracle for a
    sample-decoding featurizer UDF (the step mm_wav_header's
    headers-only contract deliberately skips). All-bigint outputs: no
    sqrt, no float, partitioning-independent.

    Scale shape: payload synthesis is codegen string ops; the decode
    is one vectorized numpy pass per Arrow batch; output is a narrow
    5-column row per payload — map-only, zero shuffles.

    Reference parity: decoder→computation over framed binary payloads
    (machida/lib/wallaroo/__init__.py decoder protocol;
    examples/python/celsius_connectors float32 wire decode) recast as
    an audio-sample column."""
    docs = load_tables(spark, sf_dir)["documents"]
    n = (8 + F.col("doc_id") % 9).cast("int")
    sr = F.lit(8000)
    ds = (n * 2).cast("int")
    hdr = F.concat(
        F.lit("52494646"),  # "RIFF"
        _le32(ds + 36),
        F.lit("57415645"),  # "WAVE"
        F.lit("666d7420"),  # "fmt "
        _le32(F.lit(16)),
        _le16(F.lit(1)),  # PCM
        _le16(F.lit(1)),  # mono
        _le32(sr),
        _le32(sr * 2),  # byte rate
        _le16(F.lit(2)),  # block align
        _le16(F.lit(16)),  # bits
        F.lit("64617461"),  # "data"
        _le32(ds),
    )
    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: _le16(
                F.pmod(
                    (F.col("doc_id") * 31 + i * 97) % 4096 - 2048,
                    F.lit(65536),
                )
            ),
        ),
        "",
    )
    payloads = docs.select(
        "doc_id", F.unhex(F.concat(hdr, data_hex)).alias("payload")
    )

    from wally_spark.operators.multimodal import pcm_sample_stats

    return pcm_sample_stats(payloads)


# --- video: ISO-BMFF (MP4) container metadata (r8) ---------------------------
def _be32(col):
    return F.format_string("%08x", col.cast("int"))


@register(
    "mm_mp4_boxes",
    oracle="""
SELECT doc_id,
       3::INT AS n_boxes,
       'isom' AS major_brand,
       (1000 * (1 + doc_id % 4))::BIGINT AS timescale,
       (1000 * (1 + doc_id % 7))::BIGINT AS duration_ms,
       (16 + doc_id % 64)::BIGINT AS mdat_bytes
FROM documents
""",
    tags=("multimodal", "video"),
)
def mm_mp4_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-container metadata through the REAL ISO-BMFF box walker
    (operators/multimodal.parse_mp4_boxes): each doc gets a valid
    minimal MP4 — ftyp(isom) + moov(mvhd) + mdat — with timescale,
    duration, and mdat size derived from doc_id (duration an exact
    timescale multiple so duration_ms is integer by construction), and
    the operator walks big-endian box sizes, recurses into moov for
    the mvhd fields, and SKIPS mdat by size (payload bytes never
    inspected — the 100 TB metadata-pass contract; frame decode sits
    behind an optional ffmpeg import, same swap contract as the image
    lanes). Arrow-batched mapInPandas, map-only, zero shuffles.

    Reference parity: decoder→computation over framed binary payloads
    (machida/lib/wallaroo/__init__.py decoder protocol) recast as a
    video-container column."""
    docs = load_tables(spark, sf_dir)["documents"]
    ts = (1000 * (1 + F.col("doc_id") % 4)).cast("int")
    dur = (ts * (1 + F.col("doc_id") % 7)).cast("int")
    n = (16 + F.col("doc_id") % 64).cast("int")
    mvhd = F.concat(
        _be32(F.lit(108)),
        F.lit("6d766864"),  # "mvhd"
        F.lit("00000000"),  # version 0 + flags
        F.lit("00000000"), F.lit("00000000"),  # ctime, mtime
        _be32(ts),
        _be32(dur),
        F.lit("00010000"),  # rate 1.0
        F.lit("0100"),  # volume 1.0
        F.lit("0000"), F.lit("0" * 16),  # reserved
        # unity matrix
        F.lit("000100000000000000000000"),
        F.lit("000000000001000000000000"),
        F.lit("000000000000000040000000"),
        F.lit("0" * 48),  # pre_defined[6]
        _be32(F.lit(1)),  # next_track_id
    )
    payload_hex = F.concat(
        _be32(F.lit(20)), F.lit("66747970"),  # ftyp
        F.lit("69736f6d"),  # major brand "isom"
        _be32(F.lit(512)),  # minor version
        F.lit("6d703431"),  # compatible brand "mp41"
        _be32(F.lit(116)), F.lit("6d6f6f76"), mvhd,  # moov
        _be32(n + 8), F.lit("6d646174"),  # mdat
        F.repeat(F.lit("00"), n),
    )
    payloads = docs.select("doc_id", F.unhex(payload_hex).alias("payload"))

    from wally_spark.operators.multimodal import decode_mp4_boxes_meta

    return decode_mp4_boxes_meta(payloads)


# --- exact binary-blob dedup (r8) --------------------------------------------
_BLOB_FMTS = ("img", "aud", "vid", "txt")


@register(
    "mm_binary_dup",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         md5(md5(text) || lower(hex(substr(text, 1, 48)::BLOB))) AS h,
         (16 + octet_length(substr(text, 1, 48)::BLOB))::BIGINT AS nb,
         CASE ((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 4)
           {" ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(_BLOB_FMTS))}
         END AS fmt
  FROM documents),
per_hash AS (
  SELECT fmt, h, count(*)::BIGINT AS n, any_value(nb) AS nb
  FROM p GROUP BY fmt, h)
SELECT fmt,
       sum(n)::BIGINT AS n_blobs,
       count(*)::BIGINT AS n_distinct,
       sum(n * nb)::BIGINT AS bytes_total,
       sum((n - 1) * nb)::BIGINT AS dup_bytes,
       ((10000 * sum((n - 1) * nb)) // sum(n * nb))::BIGINT AS dup_bp
FROM per_hash GROUP BY fmt
""",
    tags=("multimodal", "dedup"),
)
def mm_binary_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over an opaque BINARY column — the first pass every
    multimodal corpus runs (identical image/audio files recrawled
    under different ids): synthesize a per-doc payload (md5 digest
    bytes + the first 48 UTF-8 bytes of the text, so byte length
    varies and duplicate TEXT produces duplicate BYTES), then hash the
    raw bytes EXECUTOR-SIDE in an Arrow-batched mapInPandas — the
    100 TB shape: the blob never leaves its executor, only the
    16-byte digest, format tag, and length shuffle. Per container
    format (derived from the first payload nibble, content-stable
    across copies): blob count, distinct count, byte mass, duplicated
    byte mass, and the dup rate in basis points — the report that
    sizes how much storage a binary-level dedup pass reclaims.

    The blob identity key is md5 over the LOWERCASE HEX of the bytes
    (not the raw bytes) so the DuckDB oracle — whose md5 only takes
    VARCHAR — can reproduce it exactly; hex encoding is bijective, so
    dup semantics are unchanged (same convention as the ExactSubstr
    gram keys, plans/curation.py)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    payloads = fan_out(
        docs.select(
            "doc_id",
            F.concat(
                F.unhex(F.md5(F.col("text").cast("binary"))),
                F.substring("text", 1, 48).cast("binary"),
            ).alias("payload"),
        ),
        "doc_id",
    )
    schema = StructType(
        [
            StructField("fmt", StringType()),
            StructField("h", StringType()),
            StructField("nb", LongType()),
        ]
    )

    def digest(batches):
        for pdf in batches:
            blobs = pdf["payload"]
            # NULL payloads (extraction failures — e.g. null source
            # text) must not kill the task: same contract as the other
            # decoders (NULL features, 0 bytes)
            yield pd.DataFrame(
                {
                    "fmt": [
                        None if b is None else _BLOB_FMTS[(b[0] >> 4) % 4]
                        for b in blobs
                    ],
                    "h": [
                        None
                        if b is None
                        else hashlib.md5(b.hex().encode()).hexdigest()
                        for b in blobs
                    ],
                    "nb": [0 if b is None else len(b) for b in blobs],
                }
            )

    hashed = payloads.mapInPandas(digest, schema)
    per_hash = hashed.groupBy("fmt", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.first("nb").alias("nb"),
    )
    return per_hash.groupBy("fmt").agg(
        F.sum("n").cast("bigint").alias("n_blobs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("n") * F.col("nb")).cast("bigint").alias("bytes_total"),
        F.sum((F.col("n") - 1) * F.col("nb")).cast("bigint").alias("dup_bytes"),
        F.floor(
            (10000 * F.sum((F.col("n") - 1) * F.col("nb")))
            / F.sum(F.col("n") * F.col("nb"))
        )
        .cast("bigint")
        .alias("dup_bp"),
    )


# --- animated-GIF container walk (r8) ----------------------------------------
GIF_MAX_FRAMES = 4


def _gif_le16(expr: str) -> str:
    """Little-endian u16 hex for a SQL int expression (shared builder)."""
    return f"format_string('%02x%02x', ({expr}) % 256, ({expr}) div 256)"


@register(
    "mm_gif_anim_stats",
    oracle=f"""
SELECT doc_id, 'gif89a' AS fmt,
       (16 + doc_id % 256)::INT AS width,
       (16 + (doc_id * 7) % 256)::INT AS height,
       (1 + doc_id % {GIF_MAX_FRAMES})::INT AS n_frames,
       list_sum(list_transform(range(0, 1 + doc_id % {GIF_MAX_FRAMES}),
                               f -> 10 + (doc_id + f) % 20))::BIGINT
         AS total_delay_cs,
       (14 + 25 * (1 + doc_id % {GIF_MAX_FRAMES}))::INT AS n_bytes
FROM documents
""",
    tags=("multimodal",),
)
def mm_gif_anim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF audit through the REAL block walker
    (operators/multimodal.parse_gif_blocks): each doc gets a VALID
    multi-frame GIF89a — logical screen descriptor, per-frame Graphic
    Control Extension (little-endian centisecond delay), image
    descriptor, LZW sub-block chain, trailer — with frame count,
    delays, and dimensions derived from doc_id so DuckDB predicts
    every output arithmetically. The operator walks the actual
    container grammar byte-by-byte (sub-block chains, color-table
    flags), exactly what a frame-count/duration curation filter does
    at 100 TB without decoding pixels.

    Scale shape: payload synthesis is pure expression work; the walk
    is Arrow-batched mapInPandas (payloads never leave executors);
    output is one row per doc."""
    docs = load_tables(spark, sf_dir)["documents"]
    frames = "".join(
        f"""CASE WHEN {f} < 1 + doc_id % {GIF_MAX_FRAMES} THEN concat(
            '21f90400', {_gif_le16(f"10 + (doc_id + {f}) % 20")}, '0000',
            '2c', '00000000',
            {_gif_le16("16 + doc_id % 256")},
            {_gif_le16("(16 + (doc_id * 7) % 256)")},
            '00', '08', '04deadbeef', '00') ELSE '' END, """
        for f in range(GIF_MAX_FRAMES)
    )
    payload_hex = f"""concat(
        '474946383961',
        {_gif_le16("16 + doc_id % 256")},
        {_gif_le16("(16 + (doc_id * 7) % 256)")},
        '000000',
        {frames}
        '3b')"""
    payloads = docs.selectExpr(
        "doc_id", f"unhex({payload_hex}) AS payload"
    )

    from wally_spark.operators.multimodal import gif_anim_stats

    return gif_anim_stats(payloads)


# --- perceptual image near-dup (dHash over decoded BMP pixels, r9) -----------
# dHash bit (r, c) compares sampled pixels k = r*9+c and k+1; 4 bands of
# 16 bits give the pigeonhole guarantee: any pair within PHASH_HAM_T=3
# bits shares at least one identical band, so banding loses NO pair
# under the threshold (same argument as dedup_simhash_pairs' prefix
# bucket, made exact).
PHASH_HAM_T = 3
_PHASH_ROWS, _PHASH_COLS = 8, 9


def _phash_g_sql(k: int, engine: str) -> str:
    """Sampled gray value k (0..71): the first md5 byte of the word at
    1-based index 1 + (k*n_words) div 72 — a deterministic 'render'
    whose pixels are STABLE under word substitution (a changed word
    perturbs only the cells that sample it; word order and count
    otherwise preserved), which is exactly the locality a perceptual
    hash needs, while unrelated docs get i.i.d.-uniform bytes (md5) so
    background hamming concentrates near 32/64. Both engines read the
    identical hex pair: Spark md5 over the UTF-8 bytes == DuckDB md5
    over the VARCHAR (the repo-wide convention, plans/dedup.py)."""
    if engine == "spark":
        return (
            f"conv(substr(md5(cast(element_at(w, cast(1 + (({k} * n) div 72)"
            " as int)) as binary)), 1, 2), 16, 10)"
        )
    return f"('0x' || substr(md5(w[1 + (({k} * n) // 72)]), 1, 2))::INT"


def _phash_dhash_sql(engine: str) -> str:
    """The 64-bit dHash as one integer expression over a projected
    word array ``w`` / word count ``n``: bit (r,c) set iff g(r*9+c) >
    g(r*9+c+1), weight 2^(r*8+c); bit 63 carries the negative
    two's-complement weight so the value is an exact BIGINT in both
    engines. (Spark's conv() yields a STRING — comparisons go through
    the same ::INT-equivalent cast on both sides.)"""
    terms = []
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            k = r * _PHASH_COLS + c
            bit = r * 8 + c
            w = str(1 << bit) if bit < 63 else "-9223372036854775808"
            ga, gb = _phash_g_sql(k, engine), _phash_g_sql(k + 1, engine)
            if engine == "spark":
                ga, gb = f"cast({ga} as int)", f"cast({gb} as int)"
            terms.append(f"CASE WHEN {ga} > {gb} THEN {w} ELSE 0 END")
    return "(" + "\n + ".join(terms) + ")"


def _phash_bmp_hex_sql() -> str:
    """Spark SQL hex string for a REAL 9x8 24bpp bottom-up BMP whose
    gray pixels are the sampled character codes — 54-byte header
    (file size 278, data offset 54, BITMAPINFOHEADER 40, 9x8, 1 plane,
    24 bpp, BI_RGB, image size 224) + 8 rows of 9 BGR pixels padded to
    a 28-byte stride."""
    hdr = (
        "424d"          # 'BM'
        "16010000"      # file size 278 LE
        "00000000"      # reserved
        "36000000"      # pixel data offset 54
        "28000000"      # BITMAPINFOHEADER size 40
        "09000000"      # width 9
        "08000000"      # height 8 (positive => bottom-up)
        "0100" "1800"   # 1 plane, 24 bpp
        "00000000"      # BI_RGB
        "e0000000"      # image size 224
        "00000000" "00000000"  # x/y pixels-per-metre
        "00000000" "00000000"  # colors used / important
    )
    parts = [f"'{hdr}'"]
    for r in reversed(range(_PHASH_ROWS)):  # bottom-up row order
        for c in range(_PHASH_COLS):
            k = r * _PHASH_COLS + c
            # the sampled gray value IS two lowercase md5 hex chars —
            # emit them directly as the pixel byte, tripled for BGR
            parts.append(
                f"repeat(substr(md5(cast(element_at(w, cast(1 + (({k} * n)"
                " div 72) as int)) as binary)), 1, 2), 3)"
            )
        parts.append("'00'")  # stride pad 27 -> 28
    return "concat(" + ", ".join(parts) + ")"


from wally_spark.plans.dedup import PAIR_EMIT_BUCKET  # noqa: E402


@register(
    "mm_phash_dup",
    oracle=f"""
WITH wd AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
d AS (
  SELECT doc_id, {_phash_dhash_sql('duckdb')} AS dhash
  FROM (SELECT doc_id, w, len(w) AS n FROM wd WHERE len(w) >= 1)
),
b AS (
  SELECT doc_id, dhash, band, (dhash >> (16 * band)) & 65535 AS bv
  FROM d, (SELECT unnest([0, 1, 2, 3]) AS band)
),
bk AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bv) AS bsz FROM b)
  WHERE bsz <= {PAIR_EMIT_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, x.doc_id AS doc_b,
       bit_count(xor(a.dhash, x.dhash))::BIGINT AS hamming
FROM bk a JOIN bk x
  ON a.band = x.band AND a.bv = x.bv AND a.doc_id < x.doc_id
WHERE bit_count(xor(a.dhash, x.dhash)) <= {PHASH_HAM_T}
ORDER BY doc_a, doc_b
""",
    tags=("multimodal", "dedup", "phash"),
)
def mm_phash_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup — the lane ``mm_binary_dup`` cannot
    cover (byte-identical only; real multimodal curation must catch
    re-encoded/renamed images whose PIXELS survive): every doc gets a
    REAL 9x8 24bpp BMP rendered from its content, the decoder
    (operators/multimodal.parse_bmp_gray — full header/stride/
    bottom-up parse, no codec lib) recovers the pixels EXECUTOR-SIDE
    inside Arrow-batched mapInPandas, and a 64-bit dHash (bit = left
    pixel brighter than right) is the only thing that leaves the
    executor. Near-dup pairs come from 4x16-bit hamming bands —
    pigeonhole-EXACT for the threshold (hamming <= 3 implies one
    identical band), never all-pairs — then exact bit_count(xor)
    verification, exactly the dedup_simhash_pairs discipline.

    The render samples 72 evenly-spaced WORDS and maps each to its
    first md5 byte: word substitutions perturb only the cells that
    sample them (small hamming — the perceptual-locality property),
    while unrelated docs get uniform bytes (background hamming ~32,
    so false pairs are vanishing). At 100 TB: payloads never shuffle
    (8-byte fingerprints do), band buckets over PAIR_EMIT_BUCKET are
    dropped from pair EMISSION (mass-dup clusters are dedup_exact's
    job — the r8 sf1 lesson, plans/dedup.py:155), hamming is one
    codegen bit_count per candidate, and the multi-band duplicate
    emission collapses with one distinct. The DuckDB oracle reproduces
    the fingerprints arithmetically from the same sampled md5 bytes,
    so the whole render -> decode -> hash -> band -> verify chain is
    checked end-to-end."""
    from wally_spark.operators.checkpoint import pin
    from wally_spark.operators.multimodal import bmp_dhash

    docs = fan_out(load_tables(spark, sf_dir)["documents"], "doc_id")
    payloads = (
        docs.where(F.col("text").isNotNull())
        .selectExpr(
            "doc_id",
            "filter(split(lower(text), ' '), x -> x != '') AS w",
        )
        .withColumn("n", F.size("w"))
        .where(F.col("n") >= 1)
        .selectExpr("doc_id", f"unhex({_phash_bmp_hex_sql()}) AS payload")
    )
    d = pin(bmp_dhash(payloads).where(F.col("dhash").isNotNull()))
    b = d.select(
        "doc_id",
        "dhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("dhash", 16 * i).bitwiseAND(F.lit(65535))
                    for i in range(4)
                ]
            )
        ).alias("band", "bv"),
    )
    sizes = b.groupBy("band", "bv").agg(F.count(F.lit(1)).alias("bsz"))
    bk = b.join(
        sizes.where(F.col("bsz") <= PAIR_EMIT_BUCKET), ["band", "bv"]
    ).select("doc_id", "dhash", "band", "bv")
    a, x = bk.alias("a"), bk.alias("x")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("x.dhash")))
    return (
        a.join(
            x,
            (F.col("a.band") == F.col("x.band"))
            & (F.col("a.bv") == F.col("x.bv"))
            & (F.col("a.doc_id") < F.col("x.doc_id")),
        )
        .where(ham <= PHASH_HAM_T)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("x.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# --- PNG chunk-walk audit (r9) -----------------------------------------------
@register(
    "mm_png_chunks",
    oracle="""
SELECT doc_id, 'png' AS fmt,
       (64 + doc_id % 512)::INT AS width,
       (64 + (doc_id * 31) % 512)::INT AS height,
       (2 + (1 + doc_id % 3)
          + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::INT AS n_chunks,
       (1 + doc_id % 3)::INT AS n_idat,
       ((1 + doc_id % 3) * (8 + doc_id % 16))::BIGINT AS idat_bytes,
       true AS has_iend,
       (8 + 25 + (1 + doc_id % 3) * (12 + (8 + doc_id % 16))
          + CASE WHEN doc_id % 2 = 0 THEN 17 ELSE 0 END + 12)::INT
         AS n_bytes
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal", "container"),
)
def mm_png_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG container audit through the REAL chunk walker
    (operators/multimodal.parse_png_chunks): each doc gets a VALID
    multi-chunk PNG (IHDR + 1-3 IDATs of doc-derived length + an
    optional tEXt + IEND, dimensions the mm_image_header convention),
    and the walker recovers dimensions, the chunk census, IDAT byte
    mass, and trailer presence from the raw bytes — the
    structural-integrity features (truncated download = no IEND,
    empty shell = zero IDAT) a multimodal curation pass filters on
    without inflating a single pixel.

    Scale shape: payload synthesis is pure hex codegen in the scan;
    the walk is Arrow-batched mapInPandas (payloads never leave
    executors, only the fixed-width feature row shuffles); output is
    one row per doc. The DuckDB oracle predicts every feature
    arithmetically from doc_id, so walker bugs (off-by-one chunk
    stride, CRC skip) surface as hash mismatches."""
    from wally_spark.operators.multimodal import png_chunk_stats

    docs = load_tables(spark, sf_dir)["documents"]
    k = F.lit(1) + F.col("doc_id") % 3
    idat_len = (F.lit(8) + F.col("doc_id") % 16).cast("int")
    w = (F.lit(64) + F.col("doc_id") % 512).cast("int")
    h = (F.lit(64) + (F.col("doc_id") * 31) % 512).cast("int")
    idat_chunk = F.concat(
        F.format_string("%08x", idat_len),
        F.lit("49444154"),
        F.repeat(F.lit("00"), idat_len),
        F.lit("00000000"),
    )
    hdr = F.concat(
        F.lit("89504e470d0a1a0a"),           # signature
        F.lit("0000000d49484452"),           # IHDR length + type
        F.format_string("%08x", w),
        F.format_string("%08x", h),
        F.lit("0806000000"),                 # depth/color/etc
        F.lit("00000000"),                   # IHDR CRC (uncheck'd)
        F.repeat(idat_chunk, k.cast("int")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("0000000574455874" + "00" * 5 + "00000000"),
        ).otherwise(F.lit("")),
        F.lit("0000000049454e4400000000"),   # IEND
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))
    return png_chunk_stats(payloads).orderBy("doc_id")


# --- JPEG marker-segment audit (r9) ------------------------------------------
@register(
    "mm_jpeg_segments",
    oracle="""
SELECT doc_id, 'jpeg' AS fmt,
       (7 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::INT AS n_segments,
       (16 + (doc_id * 7) % 240)::INT AS width,
       (16 + doc_id % 240)::INT AS height,
       (1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::INT AS n_app,
       (4 + doc_id % 7)::INT AS com_payload,
       (doc_id % 9)::INT AS scan_bytes,
       true AS has_eoi,
       (122 + doc_id % 7 + doc_id % 9
        + CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 0 END)::INT AS n_bytes
FROM documents ORDER BY doc_id
""",
    tags=("multimodal", "image"),
)
def mm_jpeg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG container audit through the REAL marker-segment walker
    (operators/multimodal.parse_jpeg_segments): each doc gets a VALID
    multi-segment JPEG — SOI, JFIF APP0, an optional Exif APP1, a COM
    comment of doc-derived length, a DQT, an SOF0 carrying doc-derived
    dimensions, an SOS followed by doc-derived entropy bytes, EOI —
    and the walker recovers the segment census, dimensions, APPn
    count, comment mass, scan byte count, and trailer presence from
    raw bytes, honoring 0xFF00 stuffing / RST semantics in the scan.
    mm_image_header reads only SOF dims; this is the full structural
    audit (truncated scan = no EOI) for the dominant web image format.

    Scale shape: payload synthesis is pure hex codegen in the scan;
    the walk is Arrow-batched mapInPandas (payloads never leave
    executors); one fixed-width feature row out per doc. The oracle
    predicts every feature arithmetically from doc_id, so walker bugs
    (length-field misread, scan overrun) surface as hash mismatches."""
    from wally_spark.operators.multimodal import jpeg_segment_stats

    docs = load_tables(spark, sf_dir)["documents"]
    com_n = (F.col("doc_id") % 7).cast("int")
    scan_n = (F.col("doc_id") % 9).cast("int")
    h = (F.lit(16) + F.col("doc_id") % 240).cast("int")
    w = (F.lit(16) + (F.col("doc_id") * 7) % 240).cast("int")

    def be16(col):
        return F.format_string("%04x", col.cast("int"))

    hdr = F.concat(
        F.lit("ffd8"),                                   # SOI
        F.lit("ffe0" + "0010" + "4a46494600"             # APP0 JFIF\0
              + "0101" + "00" + "0001" + "0001" + "0000"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("ffe1" + "0008" + "457869660000"),     # APP1 Exif\0\0
        ).otherwise(F.lit("")),
        F.lit("fffe"),                                   # COM
        be16(F.lit(6) + com_n),
        F.lit("636f6d6d"),                               # 'comm'
        F.repeat(F.lit("78"), com_n),
        F.lit("ffdb" + "0043" + "00"),                   # DQT
        F.repeat(F.lit("10"), F.lit(64)),
        F.lit("ffc0" + "000b" + "08"),                   # SOF0
        be16(h),
        be16(w),
        F.lit("01" + "01" + "11" + "00"),
        F.lit("ffda" + "0008" + "01" + "01" + "00" + "003f00"),  # SOS
        F.repeat(F.lit("55"), scan_n),                   # entropy bytes
        F.lit("ffd9"),                                   # EOI
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))
    return jpeg_segment_stats(payloads).orderBy("doc_id")


# --- PCM silence / clipping audit (r9) ---------------------------------------
@register(
    "mm_pcm_silence",
    oracle="""
WITH s AS (
  SELECT doc_id, (12 + doc_id % 8)::BIGINT AS n,
         (doc_id % 5)::BIGINT AS lead0, (doc_id % 3)::BIGINT AS trail0
  FROM documents),
v AS (
  SELECT doc_id, n, i,
         CASE WHEN i < lead0 OR i >= n - trail0 THEN 0
              WHEN (doc_id * 7 + i) % 6 = 0 THEN 0
              WHEN ((doc_id * 13 + i * 31) % 4096) - 2048 = 0 THEN 7
              ELSE ((doc_id * 13 + i * 31) % 4096) - 2048 END AS val
  FROM (SELECT doc_id, n, lead0, trail0, unnest(range(0, n)) AS i FROM s)),
z AS (
  SELECT doc_id, n, i, val,
         CASE WHEN val = 0 THEN 1 ELSE 0 END AS isz,
         row_number() OVER (PARTITION BY doc_id ORDER BY i)
         - row_number() OVER (PARTITION BY doc_id, (val = 0) ORDER BY i)
           AS grp
  FROM v),
runs AS (
  SELECT doc_id, count(*)::BIGINT AS runlen
  FROM z WHERE isz = 1 GROUP BY doc_id, grp),
lzr AS (SELECT doc_id, max(runlen)::BIGINT AS longest FROM runs GROUP BY 1),
agg AS (
  SELECT doc_id, max(n)::BIGINT AS n_samples,
         sum(isz)::BIGINT AS n_silent,
         min(CASE WHEN isz = 0 THEN i END) AS first_nz,
         max(CASE WHEN isz = 0 THEN i END) AS last_nz,
         sum(CASE WHEN abs(val) >= 2000 THEN 1 ELSE 0 END)::BIGINT
           AS n_clipped
  FROM z GROUP BY doc_id)
SELECT a.doc_id, a.n_samples, a.n_silent,
       coalesce(l.longest, 0)::BIGINT AS longest_zero_run,
       (CASE WHEN a.first_nz IS NULL THEN a.n_samples
             ELSE a.first_nz END)::BIGINT AS lead_silence,
       (CASE WHEN a.last_nz IS NULL THEN a.n_samples
             ELSE a.n_samples - 1 - a.last_nz END)::BIGINT AS trail_silence,
       a.n_clipped
FROM agg a LEFT JOIN lzr l USING (doc_id)
ORDER BY a.doc_id
""",
    tags=("multimodal", "audio", "quality"),
)
def mm_pcm_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence / clipping audit through the REAL sample decoder
    (operators/multimodal.pcm_silence_stats): each doc gets a valid
    mono 16-bit WAV whose samples encode doc-derived leading silence,
    trailing silence, periodic mid-stream dropouts, and near-full-scale
    peaks; the decoder chunk-walks to the data block, reinterprets
    little-endian int16 with numpy, and emits the trim-and-filter
    features (zero census, longest dead-air run, lead/trail silence,
    clip count at |v| >= 2000). mm_pcm_stats measures energy; this is
    the run-length structure — the features that decide trimming and
    reject dead-air/clipped uploads.

    The oracle rebuilds the sample stream arithmetically from doc_id
    and derives the run lengths with gaps-and-islands windows — a
    hash-exact check on a numpy run-length decoder.

    Scale shape: map-only (synthesis codegen, decode one vectorized
    numpy pass per Arrow batch, no shuffle)."""
    docs = load_tables(spark, sf_dir)["documents"]
    n = (12 + F.col("doc_id") % 8).cast("int")
    lead0 = F.col("doc_id") % 5
    trail0 = F.col("doc_id") % 3
    sr = F.lit(8000)
    ds = (n * 2).cast("int")
    hdr = F.concat(
        F.lit("52494646"),
        _le32(ds + 36),
        F.lit("57415645"),
        F.lit("666d7420"),
        _le32(F.lit(16)),
        _le16(F.lit(1)),
        _le16(F.lit(1)),
        _le32(sr),
        _le32(sr * 2),
        _le16(F.lit(2)),
        _le16(F.lit(16)),
        F.lit("64617461"),
        _le32(ds),
    )
    m = lambda i: (F.col("doc_id") * 13 + i * 31) % 4096 - 2048  # noqa: E731
    val = lambda i: (  # noqa: E731
        F.when((i < lead0) | (i >= n - trail0), 0)
        .when((F.col("doc_id") * 7 + i) % 6 == 0, 0)
        .when(m(i) == 0, 7)
        .otherwise(m(i))
    )
    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: _le16(F.pmod(val(i), F.lit(65536))),
        ),
        "",
    )
    payloads = docs.select(
        "doc_id", F.unhex(F.concat(hdr, data_hex)).alias("payload")
    )
    from wally_spark.operators.multimodal import pcm_silence_stats

    return pcm_silence_stats(payloads).orderBy("doc_id")


# --- ZIP bundle audit (r10) ----------------------------------------------------
@register(
    "mm_zip_entries",
    oracle="""
SELECT doc_id, 'zip' AS fmt,
       (1 + doc_id % 3)::INT AS n_entries,
       (1 + doc_id % 3)::INT AS n_local_ok,
       ((1 + doc_id % 3) * (4 + doc_id % 11))::BIGINT AS total_usize,
       (4 * (1 + doc_id % 3))::INT AS name_bytes,
       (50 * (1 + doc_id % 3))::INT AS cd_size,
       true AS has_eocd,
       ((1 + doc_id % 3) * (38 + doc_id % 11)
        + 50 * (1 + doc_id % 3) + 22)::INT AS n_bytes
FROM documents ORDER BY doc_id
""",
    tags=("multimodal", "container", "archive"),
)
def mm_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP bundle audit through the REAL central-directory walker
    (operators/multimodal.parse_zip_entries): each doc gets a VALID
    stored-method ZIP — 1-3 local-file entries of doc-derived size, a
    central directory whose offsets genuinely point at the local
    headers, and an EOCD record — and the walker recovers the entry
    census, the local-header offset cross-check, uncompressed/name
    mass, and EOCD presence from raw bytes. Crawled corpora arrive as
    bundles (ZIP/tarballs); no-EOCD = truncated download and
    n_local_ok < n_entries = spliced archive are the two gate
    signals, both surfaced without extracting an entry.

    Scale shape: payload synthesis is pure hex codegen in the scan
    (little-endian fields kept single-byte by construction so the hex
    spelling is trivially exact); the walk is Arrow-batched
    mapInPandas (payloads never leave executors); one fixed-width
    feature row out per doc. The oracle predicts every feature
    arithmetically from doc_id, so walker bugs (46-byte stride
    misread, offset check off-by-one) surface as hash mismatches."""
    from wally_spark.operators.multimodal import zip_entry_stats

    docs = load_tables(spark, sf_dir)["documents"]
    k_m = F.col("doc_id") % 3            # entries = 1 + k_m
    d = (F.lit(4) + F.col("doc_id") % 11).cast("int")  # entry data bytes

    def le16(col):
        return F.concat(F.format_string("%02x", col.cast("int")), F.lit("00"))

    def le32(col):
        return F.concat(
            F.format_string("%02x", col.cast("int")), F.lit("000000")
        )

    # local file header (30B) + name "data" (4B) + stored data (d B)
    local = F.concat(
        F.lit("504b0304" + "1400" + "0000" + "0000" + "0000" + "0000"
              + "00000000"),
        le32(d), le32(d),
        F.lit("0400" + "0000" + "64617461"),
        F.repeat(F.lit("aa"), d),
    )

    def cd_entry(i):
        off = (F.lit(i) * (F.lit(34) + d)).cast("int")
        return F.concat(
            F.lit("504b0102" + "1400" + "1400" + "0000" + "0000" + "0000"
                  + "0000" + "00000000"),
            le32(d), le32(d),
            F.lit("0400" + "0000" + "0000" + "0000" + "0000" + "00000000"),
            le32(off),
            F.lit("64617461"),
        )

    k = (F.lit(1) + k_m).cast("int")
    hdr = F.concat(
        F.repeat(local, k),
        cd_entry(0),
        F.when(k_m >= 1, cd_entry(1)).otherwise(F.lit("")),
        F.when(k_m >= 2, cd_entry(2)).otherwise(F.lit("")),
        F.lit("504b0506" + "0000" + "0000"),
        le16(k), le16(k),
        le32(F.lit(50) * k),
        le32(k * (F.lit(34) + d)),
        F.lit("0000"),
    )
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))
    return zip_entry_stats(payloads).orderBy("doc_id")


# --- tar / WebDataset bundle audit (r10) ----------------------------------------
@register(
    "mm_tar_members",
    oracle="""
SELECT doc_id, 'tar' AS fmt,
       (1 + doc_id % 2)::INT AS n_members,
       (1 + doc_id % 2)::INT AS n_cksum_ok,
       ((1 + doc_id % 2) * (1 + doc_id % 9))::BIGINT AS total_size,
       (1 + doc_id % 2)::INT AS name_bytes,
       true AS has_terminator,
       ((1 + doc_id % 2) * 1024 + 1024)::INT AS n_bytes
FROM documents ORDER BY doc_id
""",
    tags=("multimodal", "container", "archive"),
)
def mm_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tar bundle audit through the REAL ustar header walker
    (operators/multimodal.parse_tar_members) — the WebDataset shard
    shape a training reader streams: each doc gets a VALID ustar
    archive (1-2 members of doc-derived size with SPEC-CORRECT header
    checksums, data blocks, and the two-zero-block terminator), and
    the walker recovers the member census, the checksum verification
    count, payload/name mass, and terminator presence from raw bytes,
    skipping member data by the recorded octal size — headers-only
    cost. No terminator = truncated shard, n_cksum_ok < n_members =
    corrupted headers: the two WebDataset-ingest gate signals.

    Scale shape: payload synthesis is pure codegen (text fields hex'd
    via F.hex of format_string — including the %011o octal size and
    the %06o checksum, whose value folds to a literal-plus-branch on
    the data length); Arrow-batched mapInPandas walk; one fixed-width
    feature row per doc. The oracle predicts every feature
    arithmetically from doc_id, so walker bugs (512-stride misread,
    checksum-field spacing) surface as hash mismatches."""
    from wally_spark.operators.multimodal import tar_member_stats

    docs = load_tables(spark, sf_dir)["documents"]
    k = (F.lit(1) + F.col("doc_id") % 2).cast("int")
    d = (F.lit(1) + F.col("doc_id") % 9).cast("int")
    # spec checksum: constant header mass 2618 (name 'm', mode/uid/gid,
    # mtime, magic, version, typeflag, checksum-as-spaces) + the octal
    # size field's digit mass (11 digits + NUL)
    cksum = F.lit(2618) + F.when(d < 8, 528 + d).otherwise(521 + d)
    header = F.concat(
        F.lit("6d" + "00" * 99),                       # name[100] = "m"
        F.hex(F.lit("0000644")), F.lit("00"),          # mode[8]
        F.hex(F.lit("0000000")), F.lit("00"),          # uid[8]
        F.hex(F.lit("0000000")), F.lit("00"),          # gid[8]
        F.hex(F.format_string("%011o", d)), F.lit("00"),   # size[12]
        F.hex(F.lit("00000000000")), F.lit("00"),      # mtime[12]
        F.hex(F.format_string("%06o", cksum.cast("int"))),
        F.lit("0020"),                                 # chksum[8]
        F.lit("30"),                                   # typeflag '0'
        F.lit("00" * 100),                             # linkname[100]
        F.lit("757374617200"),                         # magic "ustar\\0"
        F.lit("3030"),                                 # version "00"
        F.lit("00" * 247),                             # uname..prefix+pad
    )
    member = F.concat(
        header, F.repeat(F.lit("bb"), d), F.repeat(F.lit("00"), 512 - d)
    )
    hdr = F.concat(F.repeat(member, k), F.repeat(F.lit("00"), 1024))
    payloads = docs.select("doc_id", F.unhex(hdr).alias("payload"))
    return tar_member_stats(payloads).orderBy("doc_id")
