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
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


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
                n = len(payload) // frame_bytes
                for i in range(0, n, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(decode, FRAME_SCHEMA)
