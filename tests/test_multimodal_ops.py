from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL
from wally_spark.operators.multimodal import (
    decode_image_header_meta,
    decode_image_meta,
    fake_decode_meta,
    parse_image_header,
    sample_frames,
)
from wally_spark.tables import load_tables


@pytest.fixture(scope="module")
def payloads(spark):
    docs = load_tables(spark, SF_SMALL)["documents"]
    # 32-byte fake payload per doc (two md5 digests)
    return docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.md5(F.col("text").cast("binary"))),
            F.unhex(F.md5(F.reverse("text").cast("binary"))),
        ).alias("payload"),
    )


def test_fake_decode_meta(spark, payloads):
    out = fake_decode_meta(payloads)
    rows = out.collect()
    assert len(rows) == payloads.count()
    assert all(64 <= r["width"] <= 1072 and r["n_bytes"] == 32 for r in rows)


def test_real_decoder_is_explicit_stub(spark, payloads):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: real decoder active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image_meta(payloads)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
    )


def _bmp(w: int, h: int) -> bytes:
    return (
        b"BM"
        + bytes(16)
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + bytes(4)
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes(4)


def _jpeg(w: int, h: int) -> bytes:
    # SOI, then an APP0 segment to skip, then SOF0 carrying dimensions
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + bytes(14)
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes(10)
    )
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_formats():
    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_bmp(1024, 768)) == ("bmp", 1024, 768)
    # bottom-up BMPs store negative height; magnitude is the dimension
    assert parse_image_header(_bmp(64, -32)) == ("bmp", 64, 32)
    assert parse_image_header(_bmp(-64, 32)) == ("bmp", 64, 32)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_header(b"\x00garbage") == ("unknown", None, None)
    assert parse_image_header(b"") == ("unknown", None, None)


def test_parse_jpeg_fill_bytes():
    """Spec-legal 0xFF padding before a marker must not desync the
    segment walk (it used to read the fill byte as the marker and the
    marker bytes as a length)."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + bytes(14)
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (1080).to_bytes(2, "big")
        + (1920).to_bytes(2, "big")
        + bytes(10)
    )
    padded = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0
    assert parse_image_header(padded) == ("jpeg", 1920, 1080)
    # zero-length segment must terminate the walk, not loop
    assert parse_image_header(
        b"\xff\xd8" + b"\xff\xe0\x00\x00" + bytes(8)
    ) == ("unknown", None, None)


def test_decode_image_header_meta_null_payload(spark):
    """A NULL binary payload degrades to ('unknown', NULL, NULL, 0)
    instead of killing the task (r5 ADVICE)."""
    df = spark.createDataFrame(
        [(1, _png(8, 9)), (2, None)], "doc_id bigint, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_image_header_meta(df).collect()}
    assert (out[1]["fmt"], out[1]["width"]) == ("png", 8)
    assert out[2]["fmt"] == "unknown"
    assert out[2]["width"] is None and out[2]["height"] is None
    assert out[2]["n_bytes"] == 0


def test_decode_image_header_meta(spark):
    rows = [
        (1, _png(100, 50)),
        (2, _jpeg(640, 480)),
        (3, _gif(10, 20)),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in decode_image_header_meta(df).collect()}
    assert (out[1]["fmt"], out[1]["width"], out[1]["height"]) == ("png", 100, 50)
    assert (out[2]["fmt"], out[2]["width"], out[2]["height"]) == ("jpeg", 640, 480)
    assert (out[3]["fmt"], out[3]["width"], out[3]["height"]) == ("gif", 10, 20)
    assert out[4]["fmt"] == "unknown" and out[4]["width"] is None
    assert out[2]["n_bytes"] == len(_jpeg(640, 480))


def test_real_pil_decode_when_available(spark, tmp_path):
    """Exercises the PIL-backed full-decode path; env-gated on the
    optional dependency (the fake path stays the default)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id bigint, payload binary"
    )
    row = decode_image_meta(df).collect()[0]
    assert (row["width"], row["height"]) == (37, 21)


def test_sample_frames(spark, payloads):
    # 32-byte payload → 4 frames of 8 bytes; keep every 2nd → idx 0, 2
    out = sample_frames(payloads, frame_bytes=8, every_nth=2)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per_doc)
    one = out.where(F.col("frame_idx") == 2).limit(1).collect()[0]
    assert len(one["frame"]) == 8
