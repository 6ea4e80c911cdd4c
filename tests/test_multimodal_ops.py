from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL
from wally_spark.operators.multimodal import (
    decode_image_meta,
    fake_decode_meta,
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


def test_sample_frames(spark, payloads):
    # 32-byte payload → 4 frames of 8 bytes; keep every 2nd → idx 0, 2
    out = sample_frames(payloads, frame_bytes=8, every_nth=2)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per_doc)
    one = out.where(F.col("frame_idx") == 2).limit(1).collect()[0]
    assert len(one["frame"]) == 8
