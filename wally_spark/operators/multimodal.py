"""Multimodal decode operators: binary columns → typed features via
Arrow-batched mapInPandas.

The container ships no image/audio/video codecs, so the real decoders
are integration stubs (NotImplementedError with the intended library
call) while ``fake_decode_meta`` provides the deterministic test path
used by plans/multimodal.py. The Spark-side plumbing — binary column,
schema, batching, partition-parallel UDF, no driver involvement — is
identical for real and fake decoders: swap the per-batch function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "doc_id bigint, width int, height int, n_bytes int"
IMAGE_HEADER_SCHEMA = "doc_id bigint, fmt string, width int, height int, n_bytes int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"

# JPEG start-of-frame markers (C4/C8/CC are tables/extensions, not SOF)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(b: bytes) -> tuple[str, int | None, int | None]:
    """Extract (format, width, height) from raw image bytes by header
    parsing alone — PNG, BMP, GIF, JPEG — no codec library. At 100 TB
    the metadata pass NEVER fully decodes pixels; reading dimensions
    from the first bytes of each payload is the real production shape,
    and it needs no optional dependency. Unknown formats return
    ('unknown', None, None) rather than raising, so one corrupt payload
    cannot kill a partition."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 26 and b[:2] == b"BM":
        # width/height are signed; negative height means top-down rows,
        # so both are normalized with abs()
        return (
            "bmp",
            abs(int.from_bytes(b[18:22], "little", signed=True)),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            # spec-legal 0xFF fill bytes may pad before the marker byte
            while i + 9 < len(b) and b[i + 1] == 0xFF:
                i += 1
            marker, seglen = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            if seglen < 2:
                break
            i += 2 + seglen
    return ("unknown", None, None)


def decode_image_header_meta(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Dependency-free REAL decoder: image format + dimensions parsed
    from payload headers inside an Arrow-batched mapInPandas — the
    production metadata-extraction path (full pixel decode stays in
    ``decode_image_meta`` behind the optional PIL import)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads must degrade to ('unknown', None, None), not
            # kill the task
            raws = [bytes(b) if b is not None else b"" for b in pdf[payload_col]]
            parsed = [parse_image_header(b) for b in raws]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [f for f, _, _ in parsed],
                    "width": pd.array([w for _, w, _ in parsed], dtype="Int32"),
                    "height": pd.array([h for _, _, h in parsed], dtype="Int32"),
                    "n_bytes": [len(b) for b in raws],
                }
            )

    return df.mapInPandas(decode, IMAGE_HEADER_SCHEMA)


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real path: PIL.Image.open over each binary payload. Fails fast
    at plan construction when the codec is unavailable."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec unavailable in this environment; real impl: "
            "PIL.Image.open(io.BytesIO(b)).size per payload"
        ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import PIL.Image as Image

        for pdf in batches:
            sizes = [Image.open(io.BytesIO(b)).size for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [w for w, _ in sizes],
                    "height": [h for _, h in sizes],
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def fake_decode_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decoder: dimensions derived from the
    first payload bytes (same batching/schema as the real path)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            p = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [(b[0] % 64) * 16 + 64 for b in p],
                    "height": [(b[1] % 64) * 16 + 64 for b in p],
                    "n_bytes": [len(b) for b in p],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int, every_nth: int, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampler for fixed-size-frame video payloads: splits the
    binary into frames, keeps every Nth. Real codecs replace the
    splitter with ffmpeg/pyav iteration; batch shape is identical."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:  # bad row, not a dead task
                    continue
                n = len(payload) // frame_bytes
                for i in range(0, n, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(decode, FRAME_SCHEMA)
