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


def test_thumbnail_box_semantics():
    from wally_spark.operators.multimodal import thumbnail_box

    assert thumbnail_box(100, 100, 128) == (100, 100)  # never upscale
    assert thumbnail_box(128, 128, 128) == (128, 128)
    assert thumbnail_box(512, 256, 128) == (128, 64)
    assert thumbnail_box(256, 512, 128) == (64, 128)
    assert thumbnail_box(10000, 10, 128) == (128, 1)  # 1-pixel floor
    assert thumbnail_box(10, 10000, 128) == (1, 128)
    assert thumbnail_box(575, 64, 128) == (128, 14)  # floor division


def test_thumbnail_operator_bad_payloads(spark):
    """Corrupt and NULL payloads degrade to ('unknown', NULLs, 0)
    instead of killing the partition."""
    from wally_spark.operators.multimodal import thumbnail_images

    df = spark.createDataFrame(
        [(1, bytes([0xDE, 0xAD])), (2, None)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in thumbnail_images(df, 128).collect()}
    for i in (1, 2):
        assert rows[i]["fmt"] == "unknown"
        assert rows[i]["out_w"] is None and rows[i]["n_bytes"] == 0


def test_byte_stats_exact(spark):
    """byte_stats matches a hand computation, including the
    lowest-nibble mode tie-break and empty/NULL payloads."""
    from wally_spark.operators.multimodal import byte_stats

    p1 = bytes([0x10, 0x1F, 0x21, 0x2F])  # hi nibbles 1,1,2,2 -> mode 1
    df = spark.createDataFrame(
        [(1, p1), (2, b""), (3, None)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in byte_stats(df).collect()}
    s = sum(p1)
    assert rows[1]["n_bytes"] == 4
    assert rows[1]["mean_milli"] == 1000 * s // 4
    assert rows[1]["n_distinct"] == 4
    assert rows[1]["hi_mode"] == 1
    for i in (2, 3):
        assert (rows[i]["n_bytes"], rows[i]["mean_milli"],
                rows[i]["n_distinct"], rows[i]["hi_mode"]) == (0, 0, 0, 0)


def test_parse_wav_header_roundtrip_and_chunk_walk():
    """The RIFF walker reads canonical headers AND files whose fmt
    chunk sits after a LIST chunk; garbage degrades to 'unknown'."""
    import struct

    from wally_spark.operators.multimodal import parse_wav_header

    def wav(channels, sr, bits, data, extra_chunks=b""):
        ba = channels * bits // 8
        fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * ba, ba, bits)
        body = extra_chunks
        body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    b = wav(2, 44100, 16, b"\x00" * 44100 * 4)  # exactly 1 s stereo
    assert parse_wav_header(b) == ("wav", 2, 44100, 16, 1000)
    # LIST chunk (odd length → word-aligned skip over its pad byte)
    # before fmt — real writers pad odd chunks with one zero byte
    b2 = wav(
        1, 8000, 16, b"\x00" * 8000,
        extra_chunks=b"LIST\x05\x00\x00\x00INFOx\x00",
    )
    assert parse_wav_header(b2) == ("wav", 1, 8000, 16, 500)
    assert parse_wav_header(b"\x00\x01\x02") == ("unknown", None, None, None, None)
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00AVI ") == (
        "unknown", None, None, None, None,
    )


def test_pcm_sample_stats_exact(spark):
    """pcm_sample_stats decodes int16 PCM through the chunk walker and
    matches a hand computation; non-WAV / NULL payloads emit zeros."""
    import struct

    from wally_spark.operators.multimodal import (
        pcm_sample_stats,
        wav_data_chunk,
    )

    def wav(samples, extra_chunks=b""):
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = extra_chunks
        body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    samples = [100, -200, 300, 0, -1]
    # LIST chunk before fmt exercises the walk, like the header test
    payload = wav(samples, extra_chunks=b"LIST\x05\x00\x00\x00INFOx\x00")
    assert wav_data_chunk(payload) == struct.pack("<5h", *samples)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"nope")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in pcm_sample_stats(df).collect()}
    r = rows[1]
    assert r["n_samples"] == 5
    assert r["sumsq"] == sum(s * s for s in samples)
    assert r["peak_abs"] == 300
    # sign flips: +100→-200, -200→+300, +300→0(pos), 0→-1 = 3 crossings
    assert r["zero_cross"] == 3
    for bad in (2, 3):
        assert tuple(rows[bad])[1:] == (0, 0, 0, 0)


# --- GIF block walker (r8) ---------------------------------------------------
def _gif_anim(w: int, h: int, delays, gct_bits=None, lct_bits=None) -> bytes:
    """Build a conforming animated GIF89a: optional global color
    table, one GCE+image-descriptor pair per delay, optional local
    color tables, trailer."""
    import struct

    flags = 0x80 | (gct_bits - 1) if gct_bits else 0
    b = b"GIF89a" + struct.pack("<HH", w, h) + bytes([flags, 0, 0])
    if gct_bits:
        b += b"\x01\x02\x03" * (1 << gct_bits)
    for d in delays:
        b += bytes([0x21, 0xF9, 4, 0, d & 0xFF, d >> 8, 0, 0])
        idflags = 0x80 | (lct_bits - 1) if lct_bits else 0
        b += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([idflags])
        if lct_bits:
            b += b"\x04\x05\x06" * (1 << lct_bits)
        b += bytes([8, 3]) + b"abc" + b"\x00"
    return b + b"\x3b"


def test_parse_gif_blocks_structures():
    from wally_spark.operators.multimodal import parse_gif_blocks

    assert parse_gif_blocks(_gif_anim(320, 200, [10, 25])) == (
        "gif89a", 320, 200, 2, 35,
    )
    # color tables (global and local) are skipped by their flag bits
    assert parse_gif_blocks(_gif_anim(64, 64, [7], gct_bits=3)) == (
        "gif89a", 64, 64, 1, 7,
    )
    assert parse_gif_blocks(_gif_anim(64, 64, [7, 9], lct_bits=2)) == (
        "gif89a", 64, 64, 2, 16,
    )
    # non-GCE extensions (e.g. 0xFF application/NETSCAPE loop) are
    # walked over without contributing delay
    loop = b"GIF89a" + bytes([4, 0, 4, 0, 0, 0, 0])
    loop += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    loop += bytes([0x2C]) + b"\x00" * 8 + bytes([0, 8, 1]) + b"x" + b"\x00"
    loop += b"\x3b"
    assert parse_gif_blocks(loop) == ("gif89a", 4, 4, 1, 0)


def test_parse_gif_blocks_never_raises():
    """Fuzz: arbitrary bytes (including truncations of valid GIFs)
    must return None or a well-typed tuple — never raise; one corrupt
    payload must never kill a partition."""
    import random

    from wally_spark.operators.multimodal import parse_gif_blocks

    rng = random.Random(8)
    valid = _gif_anim(100, 50, [1, 2, 3], gct_bits=2)
    cases = [bytes()] + [valid[:i] for i in range(0, len(valid), 7)]
    cases += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        for _ in range(300)
    ]
    cases += [b"GIF89a" + bytes(rng.randrange(256) for _ in range(30))
              for _ in range(100)]
    for c in cases:
        out = parse_gif_blocks(c)
        if out is not None:
            fmt, w, h, nf, delay = out
            assert fmt in ("gif87a", "gif89a")
            assert 0 <= w < 65536 and 0 <= h < 65536
            assert nf >= 0 and delay >= 0


def _mk_bmp(px):
    """9x8 24bpp bottom-up BMP from a top-down gray pixel matrix."""
    import struct

    w, h = 9, 8
    stride = (w * 3 + 3) // 4 * 4
    data = b""
    for r in range(h - 1, -1, -1):
        row = b"".join(bytes([px[r][c]] * 3) for c in range(w))
        data += row + b"\x00" * (stride - len(row))
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
        + data
    )


def test_bmp_dhash_near_dup_pixels(spark):
    """Operator-level perceptual semantics: a one-pixel brightness
    tweak to a real BMP must move the dHash by at most 2 bits (the two
    comparisons that pixel participates in), while an inverted-gradient
    image sits far away — byte-identical hashing could never pass
    this."""
    from wally_spark.operators.multimodal import bmp_dhash, parse_bmp_gray

    base = [[(10 + 7 * ((r + c) % 5)) for c in range(9)] for r in range(8)]
    tweak = [row[:] for row in base]
    tweak[3][4] += 9  # re-encode-style local change
    far = [[80 - p for p in row] for row in base]
    assert parse_bmp_gray(_mk_bmp(base)) == base  # decoder exactness
    df = spark.createDataFrame(
        [(1, _mk_bmp(base)), (2, _mk_bmp(tweak)), (3, _mk_bmp(far))],
        "doc_id long, payload binary",
    )
    h = {r["doc_id"]: r["dhash"] for r in bmp_dhash(df).collect()}
    near = bin((h[1] ^ h[2]) & (2**64 - 1)).count("1")
    far_d = bin((h[1] ^ h[3]) & (2**64 - 1)).count("1")
    assert 1 <= near <= 2, (near, h)
    assert far_d > 20, (far_d, h)


def test_mm_phash_dup_finds_planted_near_pair(spark, tmp_path):
    """End-to-end planted semantics for mm_phash_dup: doc 2 is doc 1
    with ONE word substituted (a near dup, NOT byte-identical — its
    BMP differs in exactly one pixel), doc 3 is unrelated text. The
    pair list must contain (1, 2) at hamming 1-2 (the two comparisons
    the changed pixel participates in) and nothing involving doc 3."""
    # exactly 72 words => sample k reads word k+1: a 1-word edit moves
    # exactly one pixel
    import hashlib

    def byte(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:2], 16)

    wa = [f"w{i}" for i in range(72)]

    def ham_after_sub(sub):
        g = [byte(w) for w in wa]
        h = g[:]
        h[10] = byte(sub)
        flips = 0
        for k in (9, 10):  # the two comparisons pixel 10 participates in
            if (g[k] > g[k + 1]) != (h[k] > h[k + 1]):
                flips += 1
        return flips

    # pick a substitute whose md5 byte actually flips a comparison, so
    # the planted pair sits at hamming 1-2 (near, NOT identical-hash)
    sub = next(f"s{i}" for i in range(500) if ham_after_sub(f"s{i}") >= 1)
    wb = wa[:]
    wb[10] = sub
    wc = [f"z{i}q" for i in range(72)]
    rows = [(1, " ".join(wa), "en", "s0", 0), (2, " ".join(wb), "en", "s0", 0),
            (3, " ".join(wc), "en", "s0", 0)]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")

    from wally_spark.plans import REGISTRY

    pairs = [tuple(r) for r in REGISTRY["mm_phash_dup"].spark_fn(spark, out).collect()]
    near = [p for p in pairs if p[0] == 1 and p[1] == 2]
    assert len(near) == 1 and 1 <= near[2 - 2][2] <= 2, pairs
    assert not any(3 in (p[0], p[1]) for p in pairs), pairs


# --- r9: JPEG segment walker --------------------------------------------------
def _mk_jpeg(app1=False, com_n=3, h=100, w=200, scan_n=5, eoi=True):
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    if app1:
        out += b"\xff\xe1" + (8).to_bytes(2, "big") + b"Exif\x00\x00"
    out += b"\xff\xfe" + (6 + com_n).to_bytes(2, "big") + b"comm" + b"x" * com_n
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x10" * 64
    out += (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00"
    )
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    out += b"\x55" * scan_n
    if eoi:
        out += b"\xff\xd9"
    return bytes(out)


def test_parse_jpeg_segments_structures():
    from wally_spark.operators.multimodal import parse_jpeg_segments

    ns, w, h, na, cp, sb, eoi = parse_jpeg_segments(_mk_jpeg())
    assert (ns, w, h, na, cp, sb, eoi) == (7, 200, 100, 1, 7, 5, True)
    ns2, _, _, na2, *_ = parse_jpeg_segments(_mk_jpeg(app1=True))
    assert (ns2, na2) == (8, 2)
    # stuffed 0xFF00 inside the scan is NOT a marker
    j = _mk_jpeg(scan_n=0)
    stuffed = j[:-2] + b"\x55\xff\x00\x55" + j[-2:]
    assert parse_jpeg_segments(stuffed)[5] == 4  # scan_bytes
    # truncated scan (no EOI) is REPORTED, not rejected; garbage is
    # rejected, never raises
    trunc = parse_jpeg_segments(_mk_jpeg(eoi=False))
    assert trunc[6] is False and trunc[5] == 5  # has_eoi, scan_bytes
    assert parse_jpeg_segments(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg_segments(b"\xff\xd8\x00\x01") is None


def test_parse_jpeg_progressive_and_standalone_markers():
    """Real-world JPEG shapes the r9 walker misreported as invalid
    (r10 advice): progressive/multi-scan streams (DHT + a second SOS
    after the first scan), TEM/RST standalone markers without length
    fields, and 0xFF fill bytes before markers."""
    from wally_spark.operators.multimodal import parse_jpeg_segments

    base = _mk_jpeg(scan_n=5, eoi=False)  # ends inside the first scan
    # progressive tail: DHT then a second SOS with its own scan + EOI
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    sos2 = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    prog = base + dht + sos2 + b"\x66" * 7 + b"\xff\xd9"
    parsed = parse_jpeg_segments(prog)
    assert parsed is not None
    ns, w, h, na, cp, sb, eoi = parsed
    assert (w, h, eoi) == (200, 100, True)
    assert sb == 5 + 7  # scan bytes accumulate across scans
    assert ns == 6 + 3  # SOI..SOS base segs + DHT + SOS2 + EOI

    # standalone TEM between header segments; fill bytes before SOF
    tem = b"\xff\x01"
    fill = b"\xff\xff\xff"
    j2 = _mk_jpeg()
    # splice TEM + fill right before the SOS marker
    sos_at = j2.index(b"\xff\xda")
    spliced = j2[:sos_at] + tem + fill + j2[sos_at:]
    p2 = parse_jpeg_segments(spliced)
    assert p2 is not None and p2[6] is True and p2[1] == 200
    assert p2[0] == 8  # TEM counted as a segment

    # in-scan RST markers stay inside the scan byte count
    j3 = _mk_jpeg(scan_n=0, eoi=False)
    rst_scan = j3 + b"\x11\x22\xff\xd0\x33\x44" + b"\xff\xd9"
    p3 = parse_jpeg_segments(rst_scan)
    assert p3 is not None and p3[6] is True and p3[5] == 6


def test_pcm_silence_stats_exact(spark):
    """Handcrafted sample stream: [0,0,5,0,0,0,-2500,7,0] => 9 samples,
    6 silent, longest zero run 3, lead 2, trail 1, one clip."""
    import struct

    samples = [0, 0, 5, 0, 0, 0, -2500, 7, 0]
    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    from wally_spark.operators.multimodal import pcm_silence_stats

    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    row = pcm_silence_stats(df).collect()[0]
    assert (
        row.n_samples, row.n_silent, row.longest_zero_run,
        row.lead_silence, row.trail_silence, row.n_clipped,
    ) == (9, 6, 3, 2, 1, 1)


def test_dedup_winnowing_planted_pair(spark, tmp_path):
    """Two docs sharing a 30-word run must share winnowing fingerprints
    (the (k+w-1)-word-run guarantee, k=w=4); an unrelated doc must not
    pair with either."""
    shared = " ".join(f"run{i}" for i in range(30))
    rows = [
        (1, "alpha beta " + shared + " gamma", "en", "s0", 0),
        (2, "delta " + shared + " epsilon zeta", "en", "s0", 0),
        (3, " ".join(f"unrel{i}" for i in range(40)), "en", "s0", 0),
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")

    from wally_spark.plans import REGISTRY

    pairs = [
        tuple(r)
        for r in REGISTRY["dedup_winnowing"].spark_fn(spark, out).collect()
    ]
    ab = [p for p in pairs if (p[0], p[1]) == (1, 2)]
    assert len(ab) == 1 and ab[0][2] >= 2, pairs
    assert not any(3 in (p[0], p[1]) for p in pairs), pairs


def test_parse_zip_entries_agrees_with_stdlib_zipfile():
    """The walker must agree with archives Python's own zipfile
    writes (entry census, uncompressed mass, name mass), including
    deflated entries, and report None for a truncated EOCD."""
    import io
    import zipfile

    from wally_spark.operators.multimodal import parse_zip_entries

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", b"hello world")
        z.writestr("dir/b.bin", b"\x00" * 100)
        z.writestr("c", b"x")
    b = buf.getvalue()
    ne, nok, usize, names, cds, eocd = parse_zip_entries(b)
    assert (ne, nok, usize, names, eocd) == (3, 3, 112, 15, True)
    assert parse_zip_entries(b[:-3]) is None  # truncated EOCD
    assert parse_zip_entries(b"PK\x03\x04 not an archive") is None

    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("big.txt", b"ab" * 500)
    ne, nok, usize, _, _, _ = parse_zip_entries(buf2.getvalue())
    assert (ne, nok, usize) == (1, 1, 1000)


def test_parse_zip_entries_flags_spliced_offsets():
    """An archive whose central directory points at a wrong local
    offset must show n_local_ok < n_entries — the spliced-archive
    cross-check."""
    import io
    import zipfile

    from wally_spark.operators.multimodal import parse_zip_entries

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a", b"12345")
    b = bytearray(buf.getvalue())
    # corrupt the local header signature the CD points at (offset 0)
    b[0] = 0x00
    ne, nok, usize, _, _, _ = parse_zip_entries(bytes(b))
    assert ne == 1 and nok == 0 and usize == 5


def test_parse_tar_members_agrees_with_stdlib_tarfile():
    """The walker must agree with archives Python's own tarfile
    writes (member census, checksum verification, size/name mass,
    terminator), flag truncation, and reject non-tar bytes."""
    import io
    import tarfile

    from wally_spark.operators.multimodal import parse_tar_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in [
            ("a.txt", b"hello"),
            ("dir/b.bin", b"\x01" * 700),
            ("c", b""),
        ]:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))
    b = buf.getvalue()
    assert parse_tar_members(b) == (3, 3, 705, 15, True)
    # cut after the first member: census continues, terminator absent
    assert parse_tar_members(b[:1024]) == (1, 1, 5, 5, False)
    assert parse_tar_members(b"\x01" + b"\x00" * 600) is None

    # corrupt one checksum digit: member still walks, cksum_ok drops
    bad = bytearray(b)
    bad[148] = ord("7") if bad[148] != ord("7") else ord("1")
    nm, nok, ts, _, term = parse_tar_members(bytes(bad))
    assert (nm, ts, term) == (3, 705, True) and nok == 2


def test_parse_tar_members_rejects_negative_size_header():
    """A crafted ustar header whose size field parses negative
    (b"-1000" -> -512) used to make the member stride zero, so the
    walk never advanced — an infinite loop that wedges the executor
    task (r10 advice). Negative sizes are impossible by spec: the
    walker must return None (first member) or stop the census."""
    from wally_spark.operators.multimodal import parse_tar_members

    block = bytearray(512)
    block[0:4] = b"evil"                 # name
    block[124:136] = b"-1000".ljust(12, b"\x00")   # size: negative octal
    block[148:156] = b"        "         # checksum (mismatch is fine)
    block[257:262] = b"ustar"
    assert parse_tar_members(bytes(block) + b"\x00" * 1024) is None

    # as a LATER member it must stop the walk, not loop on it
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        ti = tarfile.TarInfo("ok.txt")
        ti.size = 5
        t.addfile(ti, io.BytesIO(b"hello"))
    b = bytearray(buf.getvalue())
    b[1024 : 1024 + 512] = block         # splice after the valid member
    assert parse_tar_members(bytes(b)) == (1, 1, 5, 6, False)


def test_archive_walkers_never_crash_on_arbitrary_bytes():
    """Fuzz: the ZIP/tar walkers must return a tuple or None on ANY
    byte stream — crawled bundles are hostile input; a walker that
    raises kills the whole Arrow batch. Random bytes, truncations of
    valid archives, bit-flips inside valid archives, and
    signature-bearing garbage."""
    import io
    import random
    import tarfile
    import zipfile

    from wally_spark.operators.multimodal import (
        parse_tar_members,
        parse_zip_entries,
    )

    rng = random.Random(20260816)

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_STORED) as z:
        for i in range(4):
            z.writestr(f"m{i}", bytes(rng.randrange(256) for _ in range(50)))
    zb = zbuf.getvalue()
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for i in range(3):
            ti = tarfile.TarInfo(f"m{i}")
            ti.size = 40
            t.addfile(ti, io.BytesIO(b"\x07" * 40))
    tb = tbuf.getvalue()

    cases = []
    for _ in range(200):
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300))))
    for base in (zb, tb):
        for _ in range(100):
            cases.append(base[: rng.randrange(0, len(base) + 1)])
        for _ in range(100):
            m = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
            cases.append(bytes(m))
    cases += [
        b"PK\x05\x06" + b"\x00" * 3,          # EOCD sig, short record
        b"PK\x05\x06" + b"\xff" * 18,         # EOCD with absurd offsets
        b"PK\x01\x02" * 30,                    # CD sigs, no EOCD
        b"ustar" * 200,                        # magic soup, no header
        b"\x00" * 1536,                        # all-terminator tar
    ]
    for b in cases:
        for fn in (parse_zip_entries, parse_tar_members):
            out = fn(b)
            assert out is None or (
                isinstance(out, tuple) and len(out) in (5, 6)
            ), (fn.__name__, out, b[:40])
