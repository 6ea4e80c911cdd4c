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
WAV_HEADER_SCHEMA = (
    "doc_id bigint, fmt string, channels int, sample_rate int, "
    "bits int, duration_ms bigint, n_bytes int"
)

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


def parse_wav_header(
    b: bytes,
) -> tuple[str, int | None, int | None, int | None, int | None]:
    """Extract (format, channels, sample_rate, bits, duration_ms) from
    a RIFF/WAVE payload by chunk-walking the header — no audio library.
    Same production contract as ``parse_image_header``: the metadata
    pass reads the first bytes only (samples never decoded), and a
    corrupt payload returns ('unknown', None, ...) instead of raising.
    Walks the chunk list (not a fixed 44-byte layout) so files with a
    LIST/INFO chunk before ``fmt `` still parse."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return ("unknown", None, None, None, None)
    channels = sample_rate = bits = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            if i + 24 <= len(b):
                bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if channels is None:
        return ("unknown", None, None, None, None)
    duration_ms = (
        data_size * 1000 // byte_rate
        if data_size is not None and byte_rate
        else None
    )
    return ("wav", channels, sample_rate, bits, duration_ms)


def decode_wav_header_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Dependency-free REAL audio-metadata decoder: RIFF/WAVE header
    fields parsed inside an Arrow-batched mapInPandas — the audio face
    of ``decode_image_header_meta`` (full sample decode would sit
    behind an optional soundfile/wave import, same swap contract)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(b) if b is not None else b"" for b in pdf[payload_col]]
            parsed = [parse_wav_header(b) for b in raws]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [p[0] for p in parsed],
                    "channels": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array(
                        [p[2] for p in parsed], dtype="Int32"
                    ),
                    "bits": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "duration_ms": pd.array(
                        [p[4] for p in parsed], dtype="Int64"
                    ),
                    "n_bytes": [len(b) for b in raws],
                }
            )

    return df.mapInPandas(decode, WAV_HEADER_SCHEMA)


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


THUMB_SCHEMA = (
    "doc_id bigint, fmt string, in_w int, in_h int,"
    " out_w int, out_h int, n_bytes bigint"
)


def thumbnail_box(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail dimensions (PIL.Image.thumbnail
    semantics, integer-exact): never upscale; the longer side shrinks
    to ``max_side``, the shorter side scales by floor division with a
    1-pixel floor."""
    if w <= max_side and h <= max_side:
        return (w, h)
    if w >= h:
        return (max_side, max(1, (h * max_side) // w))
    return (max(1, (w * max_side) // h), max_side)


def thumbnail_images(
    df: DataFrame, max_side: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize pass over binary image payloads: header-parse the input
    dimensions (no codec needed — see parse_image_header), compute the
    aspect-preserving output box, and report the thumbnail metadata
    plus its decoded size. The Arrow batch shape, partition-parallel
    execution, and null-safety are exactly the production resize pass;
    a deployment with codecs swaps the body for
    ``PIL.Image.open(...).thumbnail((max_side, max_side))`` + re-encode
    and the plumbing is unchanged (same pattern as decode_image_meta's
    optional-PIL full-decode path). Bad or NULL payloads degrade to
    ('unknown', NULLs, 0) — one corrupt row cannot kill a partition."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, iw, ih, ow, oh, nb = [], [], [], [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b) if b is not None else b""
                fmt, w, h = parse_image_header(raw)
                if w is None or h is None:
                    fmts.append(fmt)
                    iw.append(None); ih.append(None)
                    ow.append(None); oh.append(None)
                    nb.append(0)
                    continue
                tw, th = thumbnail_box(w, h, max_side)
                fmts.append(fmt)
                iw.append(w); ih.append(h)
                ow.append(tw); oh.append(th)
                nb.append(tw * th)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": fmts,
                    "in_w": pd.array(iw, dtype="Int32"),
                    "in_h": pd.array(ih, dtype="Int32"),
                    "out_w": pd.array(ow, dtype="Int32"),
                    "out_h": pd.array(oh, dtype="Int32"),
                    "n_bytes": nb,
                }
            )

    return df.mapInPandas(decode, THUMB_SCHEMA)


BYTE_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_milli bigint,"
    " n_distinct bigint, hi_mode bigint"
)


def byte_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature extraction over opaque binary payloads: per-payload byte
    statistics (count, mean in exact millis, distinct byte values, and
    the modal high nibble, ties → lowest) via one numpy pass per Arrow
    batch. The shape a real featurizer (CLIP embedding, audio MFCC,
    perceptual hash) has at 100 TB: payloads stay on executors, one
    vectorized pass per batch, a narrow typed row out. All-integer
    outputs so an engine-exact oracle exists. NULL/empty payloads emit
    zero counts instead of dying."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n, mean_m, dist, mode = [], [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b) if b is not None else b""
                if not raw:
                    n.append(0); mean_m.append(0); dist.append(0); mode.append(0)
                    continue
                a = np.frombuffer(raw, dtype=np.uint8)
                n.append(len(a))
                mean_m.append(int(1000 * int(a.sum(dtype=np.int64)) // len(a)))
                dist.append(int(len(np.unique(a))))
                hi = np.bincount(a >> 4, minlength=16)
                mode.append(int(hi.argmax()))  # first max = lowest nibble
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "mean_milli": mean_m,
                    "n_distinct": dist,
                    "hi_mode": mode,
                }
            )

    return df.mapInPandas(extract, BYTE_STATS_SCHEMA)


PCM_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, sumsq bigint, peak_abs bigint, "
    "zero_cross bigint"
)


def wav_data_chunk(b: bytes) -> bytes | None:
    """Return the raw bytes of the first ``data`` chunk of a RIFF/WAVE
    payload (the PCM samples), or None when the payload is not a WAV or
    carries no data chunk. Shares the chunk-walk rules of
    ``parse_wav_header`` (word-aligned chunks, LIST-before-fmt safe)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"data":
            return b[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)
    return None


def pcm_sample_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio feature extraction: chunk-walk each WAV payload to
    its ``data`` chunk, reinterpret as little-endian int16 PCM
    (``np.frombuffer``), and emit exact integer sample statistics —
    count, energy (sum of squares), peak amplitude, and sign-change
    (zero-crossing) count, the classic voice-activity / silence-trim
    features. Energy stays a bigint sum (no sqrt, no float) so an
    engine-exact oracle exists; the RMS a consumer wants is one
    driver-side sqrt away. Same 100 TB contract as ``byte_stats``:
    payloads never leave executors, one vectorized numpy pass per Arrow
    batch, a narrow typed row out. Non-WAV / empty payloads emit zero
    rows of stats instead of dying (the DLQ lane's job is elsewhere).

    Reference parity: the decode half of a celsius-style bytes→values
    computation (machida decoder + stateless computation,
    examples/python/celsius_connectors) applied to an audio payload
    column."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, ss, pk, zc = [], [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b) if b is not None else b""
                data = wav_data_chunk(raw)
                if not data or len(data) < 2:
                    ns.append(0); ss.append(0); pk.append(0); zc.append(0)
                    continue
                a = np.frombuffer(
                    data[: len(data) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                ns.append(int(len(a)))
                ss.append(int((a * a).sum()))
                pk.append(int(np.abs(a).max()))
                zc.append(
                    int(((a[:-1] < 0) != (a[1:] < 0)).sum())
                    if len(a) > 1
                    else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": ns,
                    "sumsq": ss,
                    "peak_abs": pk,
                    "zero_cross": zc,
                }
            )

    return df.mapInPandas(extract, PCM_STATS_SCHEMA)


MP4_BOXES_SCHEMA = (
    "doc_id bigint, n_boxes int, major_brand string, timescale bigint, "
    "duration_ms bigint, mdat_bytes bigint"
)


def parse_mp4_boxes(
    b: bytes,
) -> tuple[int | None, str | None, int | None, int | None, int | None]:
    """Extract (n_top_level_boxes, major_brand, timescale, duration_ms,
    mdat_bytes) from an ISO-BMFF (MP4/MOV) payload by walking the box
    tree — no video library, headers only (mdat is SKIPPED by size, its
    bytes never inspected: the 100 TB metadata-pass contract). Reads
    ftyp's major brand, recurses into moov for the mvhd timescale and
    duration (version 0 and 1 layouts), and sums mdat payload sizes.
    size==1 boxes carry a 64-bit largesize; size==0 means
    to-end-of-file. A corrupt payload returns Nones instead of
    raising, same contract as the image/wav parsers."""
    n_boxes = 0
    brand = None
    timescale = duration = None
    mdat_bytes = 0
    saw_mdat = False

    def walk_children(lo: int, hi: int):
        nonlocal timescale, duration
        j = lo
        while j + 8 <= hi:
            csize = int.from_bytes(b[j : j + 4], "big")
            ctype = b[j + 4 : j + 8]
            body = j + 8
            if csize == 1:
                if j + 16 > hi:
                    return
                csize = int.from_bytes(b[j + 8 : j + 16], "big")
                body = j + 16
            elif csize == 0:
                csize = hi - j
            if csize < 8 or j + csize > hi:
                return
            if ctype == b"mvhd" and body + 4 <= hi:
                ver = b[body]
                if ver == 1 and body + 28 <= hi:
                    timescale = int.from_bytes(b[body + 20 : body + 24], "big")
                    duration = int.from_bytes(b[body + 24 : body + 32], "big")
                elif ver == 0 and body + 20 <= hi:
                    timescale = int.from_bytes(b[body + 12 : body + 16], "big")
                    duration = int.from_bytes(b[body + 16 : body + 20], "big")
            j += csize

    i = 0
    n = len(b)
    while i + 8 <= n:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > n:
                break
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:
            size = n - i
        if size < 8 or i + size > n:
            break
        n_boxes += 1
        if btype == b"ftyp" and body + 4 <= n:
            brand = b[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            walk_children(body, i + size)
        elif btype == b"mdat":
            mdat_bytes += size - (body - i)
            saw_mdat = True
        i += size
    if n_boxes == 0:
        return (None, None, None, None, None)
    duration_ms = (
        duration * 1000 // timescale if timescale and duration is not None
        else None
    )
    return (
        n_boxes,
        brand,
        timescale,
        duration_ms,
        mdat_bytes if saw_mdat else None,
    )


def decode_mp4_boxes_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Dependency-free REAL container-metadata decoder: ISO-BMFF box
    walk inside an Arrow-batched mapInPandas — the video face of
    ``decode_wav_header_meta`` (frame decode would sit behind an
    optional ffmpeg/pyav import, same swap contract)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(v) if v is not None else b"" for v in pdf[payload_col]]
            parsed = [parse_mp4_boxes(v) for v in raws]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_boxes": pd.array([p[0] for p in parsed], dtype="Int32"),
                    "major_brand": [p[1] for p in parsed],
                    "timescale": pd.array([p[2] for p in parsed], dtype="Int64"),
                    "duration_ms": pd.array(
                        [p[3] for p in parsed], dtype="Int64"
                    ),
                    "mdat_bytes": pd.array(
                        [p[4] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(decode, MP4_BOXES_SCHEMA)


GIF_ANIM_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "n_frames int, total_delay_cs bigint, n_bytes int"
)


def parse_gif_blocks(b: bytes) -> tuple[str, int, int, int, int] | None:
    """Walk a GIF's block structure — the REAL container grammar, no
    codec: signature + logical screen descriptor (little-endian dims,
    global color table skipped by its flag), then the block stream:
    0x21 extensions (sub-block chains; Graphic Control Extensions
    contribute their little-endian delay), 0x2C image descriptors
    (local color table skipped by flag, LZW min-code byte, pixel
    sub-block chain skipped) — until the 0x3B trailer. Returns (fmt,
    width, height, n_frames, total_delay_cs), or None for payloads
    that are not a GIF / are truncated mid-block (the caller emits
    NULL features; a corrupt payload must never kill a partition)."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    fmt = "gif8" + b[4:6].decode("ascii")
    width = b[6] | (b[7] << 8)
    height = b[8] | (b[9] << 8)
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (1 << ((flags & 0x07) + 1))
    n_frames = 0
    total_delay_cs = 0
    try:
        while True:
            intro = b[pos]
            pos += 1
            if intro == 0x3B:  # trailer
                return (fmt, width, height, n_frames, total_delay_cs)
            if intro == 0x21:  # extension: label + sub-block chain
                label = b[pos]
                pos += 1
                first = True
                while True:
                    blen = b[pos]
                    pos += 1
                    if blen == 0:
                        break
                    if label == 0xF9 and first and blen >= 3:
                        total_delay_cs += b[pos + 1] | (b[pos + 2] << 8)
                    first = False
                    pos += blen
            elif intro == 0x2C:  # image descriptor
                idflags = b[pos + 8]
                pos += 9
                if idflags & 0x80:  # local color table
                    pos += 3 * (1 << ((idflags & 0x07) + 1))
                pos += 1  # LZW minimum code size
                while True:  # pixel data sub-blocks
                    blen = b[pos]
                    pos += 1
                    if blen == 0:
                        break
                    pos += blen
                n_frames += 1
            else:  # unknown introducer: not a conforming stream
                return None
    except IndexError:  # truncated mid-block
        return None


def gif_anim_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Animated-GIF container audit over an opaque binary column:
    frame count, summed frame delay, dimensions — the features a
    multimodal curation pass filters on (single-frame 'animations',
    zero-delay spinners, absurd frame counts) without ever decoding a
    pixel. Arrow-batched mapInPandas; payloads stay on executors."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                parsed = None if b is None else parse_gif_blocks(bytes(b))
                if parsed is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 0 if b is None else len(b)))
                else:
                    fmt, w, h, nf, delay = parsed
                    rows.append((doc_id, fmt, w, h, nf, delay, len(b)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "n_frames", "total_delay_cs", "n_bytes",
                ],
            )

    return df.mapInPandas(walk, GIF_ANIM_SCHEMA)


# --- perceptual hash (dHash) over decoded BMP pixels (r9) -------------------
BMP_DHASH_SCHEMA = "doc_id bigint, dhash bigint"


def parse_bmp_gray(b: bytes):
    """REAL 24-bit BMP decode to a grayscale pixel matrix (list of
    top-down rows) — file header offset, BITMAPINFOHEADER dims/bpp,
    4-byte row stride, bottom-up (or top-down for negative height) row
    order — no codec library, because uncompressed BMP needs none.
    Returns None for anything that is not a plain 24bpp BI_RGB bitmap
    (corrupt, truncated, compressed): one bad payload must down-rank,
    not kill the partition. Gray = integer mean of B,G,R."""
    if b is None or len(b) < 54 or b[:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    if int.from_bytes(b[14:18], "little") < 40:  # BITMAPINFOHEADER
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp != 24 or w <= 0 or h == 0:
        return None
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(b) < off + stride * h:
        return None
    rows = []
    for r in range(h):
        phys = r if top_down else h - 1 - r
        base = off + phys * stride
        rows.append(
            [
                (b[base + 3 * c] + b[base + 3 * c + 1] + b[base + 3 * c + 2]) // 3
                for c in range(w)
            ]
        )
    return rows


def dhash64(gray) -> int:
    """64-bit difference hash over a grayscale matrix: bit (r, c) set
    iff pixel[r][c] > pixel[r][c+1], weight 2^(r*8+c), rows/cols capped
    at 8 (the canonical 9x8 dHash uses all 64). Two's-complement int64
    so the value round-trips Spark's BIGINT exactly."""
    hh = min(len(gray), 8)
    ww = min(len(gray[0]) - 1, 8) if gray else 0
    v = 0
    for r in range(hh):
        row = gray[r]
        for c in range(ww):
            if row[c] > row[c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


def bmp_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """dHash fingerprints for a BMP binary column: Arrow-batched
    mapInPandas decodes pixels EXECUTOR-SIDE and only the 8-byte
    fingerprint shuffles — the 100 TB shape for perceptual image dedup
    (payload never moves; undecodable payloads yield NULL dhash)."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                gray = None if b is None else parse_bmp_gray(bytes(b))
                rows.append((doc_id, None if gray is None else dhash64(gray)))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash"])

    return df.mapInPandas(hash_batches, BMP_DHASH_SCHEMA)


# --- PNG chunk walker (r9) ---------------------------------------------------
PNG_CHUNKS_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, n_chunks int, "
    "n_idat int, idat_bytes bigint, has_iend boolean, n_bytes int"
)


def parse_png_chunks(b: bytes):
    """Walk a PNG's chunk list — (length, type, data, CRC) records
    after the 8-byte signature — without decompressing a pixel:
    returns (width, height, n_chunks, n_idat, idat_bytes, has_iend)
    or None if the stream is not a structurally valid PNG prefix.
    Truncated/corrupt streams return None (down-rank, don't kill the
    partition); CRCs are counted, not verified (a 100 TB audit pass
    leaves CRC checks to the decode stage)."""
    if b is None or len(b) < 16 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    width = height = None
    n_chunks = n_idat = 0
    idat_bytes = 0
    has_iend = False
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        if pos + 8 + ln + 4 > len(b):
            return None  # truncated chunk
        if n_chunks == 0:
            if typ != b"IHDR" or ln < 13:
                return None
            width = int.from_bytes(b[pos + 8:pos + 12], "big")
            height = int.from_bytes(b[pos + 12:pos + 16], "big")
        if typ == b"IDAT":
            n_idat += 1
            idat_bytes += ln
        n_chunks += 1
        pos += 8 + ln + 4
        if typ == b"IEND":
            has_iend = True
            break
    if width is None:
        return None
    return width, height, n_chunks, n_idat, idat_bytes, has_iend


def png_chunk_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-level PNG audit over an opaque binary column:
    dimensions, chunk census, IDAT mass, IEND presence — the
    structural-integrity features a multimodal curation pass filters
    on (no trailer => truncated download; zero IDAT => empty shell)
    without decompressing anything. Arrow-batched mapInPandas;
    payloads stay on executors."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                parsed = None if b is None else parse_png_chunks(bytes(b))
                if parsed is None:
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         0 if b is None else len(b))
                    )
                else:
                    w, h, nc, ni, ib, iend = parsed
                    rows.append(
                        (doc_id, "png", w, h, nc, ni, ib, iend, len(b))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height", "n_chunks",
                    "n_idat", "idat_bytes", "has_iend", "n_bytes",
                ],
            )

    return df.mapInPandas(walk, PNG_CHUNKS_SCHEMA)


JPEG_SEGMENTS_SCHEMA = (
    "doc_id bigint, fmt string, n_segments int, width int, height int, "
    "n_app int, com_payload int, scan_bytes int, has_eoi boolean, n_bytes int"
)


def parse_jpeg_segments(b: bytes):
    """Walk a JPEG's marker-segment list — SOI, APPn, COM, DQT, SOFn,
    SOS, EOI — without entropy-decoding a single MCU: returns
    (n_segments, width, height, n_app, com_payload_bytes, scan_bytes,
    has_eoi) or None if the stream is not a structurally valid JPEG
    prefix. After an SOS the walker skips entropy-coded bytes (honoring
    0xFF00 stuffing and in-scan RST markers) until the next real
    marker, then RESUMES header-mode parsing — so progressive and
    multi-scan streams (DHT/SOS after the first scan) parse instead of
    being misreported as invalid, and scan_bytes accumulates across
    scans (r10 advice fix). Spec-legal 0xFF fill bytes before a marker
    are skipped; TEM (0x01) and RST outside a scan are standalone
    markers with no length field. The structural truncation check a
    100 TB curation pass needs, at header cost."""
    if b is None or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    n_segments = 1  # SOI
    width = height = None
    n_app = 0
    com_payload = 0
    scan_bytes = 0
    has_eoi = False
    pos = 2
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            return None
        # spec-legal fill: any run of 0xFF bytes precedes the marker id
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(b):
            break
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            has_eoi = True
            n_segments += 1
            pos += 2
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / standalone RST between segments: no length field
            n_segments += 1
            pos += 2
            continue
        if pos + 4 > len(b):
            return None
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        if pos + 2 + ln > len(b) or ln < 2:
            return None
        if 0xE0 <= marker <= 0xEF:
            n_app += 1
        elif marker == 0xFE:
            com_payload += ln - 2
        elif marker in _JPEG_SOF:
            if ln >= 7:
                height = int.from_bytes(b[pos + 5:pos + 7], "big")
                width = int.from_bytes(b[pos + 7:pos + 9], "big")
        n_segments += 1
        pos += 2 + ln
        if marker == 0xDA:  # SOS: skip entropy-coded data to next marker
            scan_start = pos
            ended_at_marker = False
            while pos + 1 < len(b):
                if (
                    b[pos] == 0xFF
                    and b[pos + 1] != 0x00
                    and b[pos + 1] != 0xFF
                    and not 0xD0 <= b[pos + 1] <= 0xD7
                ):
                    ended_at_marker = True
                    break
                pos += 1
            if ended_at_marker:
                scan_bytes += pos - scan_start
                continue  # resume header mode: EOI, DHT, next SOS, ...
            # truncated download: REPORT it (has_eoi=False) — the
            # audit lane's whole point — rather than rejecting
            scan_bytes += len(b) - scan_start
            break
    if width is None:
        return None
    return n_segments, width, height, n_app, com_payload, scan_bytes, has_eoi


def jpeg_segment_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-level JPEG audit over an opaque binary column — the
    mm_png_chunks contract for the other dominant web-image format:
    marker-segment census, SOF dimensions, APPn/COM metadata mass,
    entropy-scan byte count, EOI (truncation) check. Arrow-batched
    mapInPandas; payloads stay on executors."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                parsed = None if b is None else parse_jpeg_segments(bytes(b))
                if parsed is None:
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         None, 0 if b is None else len(b))
                    )
                else:
                    ns, w, h, na, cp, sb, eoi = parsed
                    rows.append(
                        (doc_id, "jpeg", ns, w, h, na, cp, sb, eoi, len(b))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_segments", "width", "height",
                    "n_app", "com_payload", "scan_bytes", "has_eoi",
                    "n_bytes",
                ],
            )

    return df.mapInPandas(walk, JPEG_SEGMENTS_SCHEMA)


PCM_SILENCE_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_silent bigint, "
    "longest_zero_run bigint, lead_silence bigint, trail_silence bigint, "
    "n_clipped bigint"
)


def pcm_silence_stats(
    df: DataFrame, payload_col: str = "payload", clip_abs: int = 2000
) -> DataFrame:
    """Silence / clipping audit over WAV payloads — the trim-and-filter
    features an audio curation pass runs before feature extraction:
    exact zero-sample census, longest all-zero run, leading/trailing
    silence lengths, and |sample| >= clip_abs clip counts, all integer
    (engine-exact oracle territory). One vectorized numpy pass per
    Arrow batch; payloads never leave executors."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "n_samples", "n_silent", "longest_zero_run",
                "lead_silence", "trail_silence", "n_clipped",
            )}
            for b in pdf[payload_col]:
                raw = bytes(b) if b is not None else b""
                data = wav_data_chunk(raw)
                if not data or len(data) < 2:
                    for k in out:
                        out[k].append(0)
                    continue
                a = np.frombuffer(
                    data[: len(data) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                z = a == 0
                n = len(a)
                nz = np.flatnonzero(~z)
                if len(nz) == 0:
                    lead, trail, longest = n, n, n
                else:
                    lead = int(nz[0])
                    trail = int(n - 1 - nz[-1])
                    # longest zero run: split indices of zeros by gaps
                    zi = np.flatnonzero(z)
                    if len(zi) == 0:
                        longest = 0
                    else:
                        breaks = np.flatnonzero(np.diff(zi) > 1)
                        runs = np.split(zi, breaks + 1)
                        longest = max(len(r) for r in runs)
                out["n_samples"].append(n)
                out["n_silent"].append(int(z.sum()))
                out["longest_zero_run"].append(int(longest))
                out["lead_silence"].append(int(lead))
                out["trail_silence"].append(int(trail))
                out["n_clipped"].append(int((np.abs(a) >= clip_abs).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **out})

    return df.mapInPandas(extract, PCM_SILENCE_SCHEMA)


ZIP_ENTRIES_SCHEMA = (
    "doc_id bigint, fmt string, n_entries int, n_local_ok int, "
    "total_usize bigint, name_bytes int, cd_size int, has_eocd boolean, "
    "n_bytes int"
)


def parse_zip_entries(b: bytes):
    """Walk a ZIP archive's END-OF-CENTRAL-DIRECTORY + central
    directory — the index a reader trusts — without inflating a single
    entry: returns (n_entries, n_local_ok, total_usize, name_bytes,
    cd_size, has_eocd) or None if the stream has no EOCD record (the
    structural signature of a truncated bundle download). n_local_ok
    counts entries whose recorded local-header offset really points at
    a PK\\x03\\x04 signature — the cross-check that catches spliced or
    offset-shifted archives. Walks strictly by recorded lengths
    (fnlen/extralen/commentlen), stops cleanly at the first
    out-of-bounds or non-PK\\x01\\x02 position, never allocates entry
    data."""
    import struct

    if b is None or len(b) < 22:
        return None
    eocd = b.rfind(b"PK\x05\x06")
    if eocd < 0 or eocd + 22 > len(b):
        return None
    _sig, _dsk, _cdsk, _ndsk, _ntot, cd_size, cd_off, _clen = struct.unpack(
        "<IHHHHIIH", b[eocd : eocd + 22]
    )
    n_entries = n_local_ok = 0
    total_usize = 0
    name_bytes = 0
    pos = cd_off
    while pos + 46 <= len(b) and b[pos : pos + 4] == b"PK\x01\x02":
        (
            _vm, _vn, _flags, _method, _t, _d, _crc, _csize, usize,
            fnlen, extralen, cmtlen, _edsk, _iattr, _eattr, lofs,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", b[pos + 4 : pos + 46])
        n_entries += 1
        total_usize += usize
        name_bytes += fnlen
        if lofs + 4 <= len(b) and b[lofs : lofs + 4] == b"PK\x03\x04":
            n_local_ok += 1
        pos += 46 + fnlen + extralen + cmtlen
    return (n_entries, n_local_ok, total_usize, name_bytes, cd_size, True)


def zip_entry_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Archive-bundle audit over an opaque binary column: entry census,
    local-header cross-check, uncompressed mass, name mass, central
    directory size, EOCD presence — the features a curation pass needs
    before deciding whether a crawled bundle is worth extracting.
    Arrow-batched mapInPandas; payloads stay on executors."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                parsed = None if b is None else parse_zip_entries(bytes(b))
                if parsed is None:
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         0 if b is None else len(b))
                    )
                else:
                    ne, nok, us, nb_, cds, eocd = parsed
                    rows.append(
                        (doc_id, "zip", ne, nok, us, nb_, cds, eocd, len(b))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_entries", "n_local_ok",
                    "total_usize", "name_bytes", "cd_size", "has_eocd",
                    "n_bytes",
                ],
            )

    return df.mapInPandas(walk, ZIP_ENTRIES_SCHEMA)


TAR_MEMBERS_SCHEMA = (
    "doc_id bigint, fmt string, n_members int, n_cksum_ok int, "
    "total_size bigint, name_bytes int, has_terminator boolean, n_bytes int"
)


def parse_tar_members(b: bytes):
    """Walk a (us)tar archive's 512-byte header blocks — the
    WebDataset bundle shape — without reading member data: returns
    (n_members, n_cksum_ok, total_size, name_bytes, has_terminator)
    or None if the first block is not a plausible tar header.
    n_cksum_ok counts members whose recorded header checksum matches
    the spec sum (header bytes with the checksum field read as eight
    spaces) — the corruption signal tar readers trust; member data is
    skipped by the recorded octal size, so cost is headers-only.
    has_terminator = the two zero blocks a complete archive ends
    with (absent = truncated bundle)."""
    if b is None or len(b) < 512:
        return None

    def _octal(field: bytes) -> int | None:
        s = field.split(b"\x00")[0].strip(b" ")
        if not s:
            return 0
        try:
            v = int(s, 8)
        except ValueError:
            return None
        # A signed field (b"-1000" -> -512) would make the member
        # stride zero or negative and wedge the walk forever; sizes
        # and checksums are non-negative by spec, so reject.
        return None if v < 0 else v

    n_members = n_cksum_ok = 0
    total_size = 0
    name_bytes = 0
    pos = 0
    has_terminator = False
    while pos + 512 <= len(b):
        block = b[pos : pos + 512]
        if block == b"\x00" * 512:
            has_terminator = (
                pos + 1024 <= len(b)
                and b[pos + 512 : pos + 1024] == b"\x00" * 512
            )
            break
        if block[257:262] != b"ustar":
            return None if n_members == 0 else (
                n_members, n_cksum_ok, total_size, name_bytes, False
            )
        size = _octal(block[124:136])
        if size is None:
            # Unparseable or negative size: can't compute the member
            # stride. First block -> not a tar; later -> report the
            # census walked so far (same contract as a magic break).
            return None if n_members == 0 else (
                n_members, n_cksum_ok, total_size, name_bytes, False
            )
        recorded = _octal(block[148:156])
        actual = (
            sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        )
        n_members += 1
        if recorded == actual:
            n_cksum_ok += 1
        total_size += size
        name_bytes += len(block[:100].split(b"\x00")[0])
        pos += 512 + ((size + 511) // 512) * 512
    if n_members == 0:
        return None
    return (n_members, n_cksum_ok, total_size, name_bytes, has_terminator)


def tar_member_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Tar-bundle audit over an opaque binary column: member census,
    spec-checksum verification count, payload/name mass, terminator
    presence — the WebDataset-ingest gate (no terminator = truncated
    shard; n_cksum_ok < n_members = corrupted headers). Arrow-batched
    mapInPandas; payloads stay on executors."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                parsed = None if b is None else parse_tar_members(bytes(b))
                if parsed is None:
                    rows.append(
                        (doc_id, None, None, None, None, None, None,
                         0 if b is None else len(b))
                    )
                else:
                    nm, nok, ts, nb_, term = parsed
                    rows.append(
                        (doc_id, "tar", nm, nok, ts, nb_, term, len(b))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_members", "n_cksum_ok",
                    "total_size", "name_bytes", "has_terminator", "n_bytes",
                ],
            )

    return df.mapInPandas(walk, TAR_MEMBERS_SCHEMA)
