"""Multimodal (image/audio/video) column plumbing.

Media ride through the pipeline as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas iterators over ``mapInPandas`` — the only sane
shape at 100 TB (no driver involvement, batch-columnar transfer, media
libs imported once per executor, partition-parallel).

**Metadata decode is real for every container with a parseable
header**: :func:`image_header_decode` (PNG/JPEG/GIF dimensions),
:func:`audio_header_decode` (WAV sample rate/channels/duration),
:func:`video_header_decode` (MP4/MOV dimensions + duration from the
moov box) — all pure-stdlib byte parsing, no codec library. Only
*content* decode (pixels, compressed-audio samples, video frames)
remains **stubbed** (codec libraries are not in this environment):
``decode_fn=None`` selects a deterministic fake decoder so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and tested; pass a real ``decode_fn`` (ffmpeg/torchaudio
based) in production, or use :func:`real_decode_stub` to see the
integration point raise ``NotImplementedError``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, binary_col: str = "data", media_type: str = "image", fmt: str = "bin"
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (sizes
    filled; codec-derived fields left NULL until decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


def real_decode_stub(data: bytes, fmt: str) -> dict[str, Any]:
    """The production integration point for **audio/video** (image
    metadata has a real pure-Python decoder: :func:`image_header_decode`).
    Replace with an ffmpeg/torchaudio call returning
    {width, height, duration_ms, features}."""
    raise NotImplementedError(
        "audio/video codecs are not available in this environment; "
        "pass decode_fn= with a real decoder in production"
    )


def parse_image_header(data: bytes) -> tuple[int, int, str] | None:
    """(width, height, format) from PNG / JPEG / GIF container headers —
    pure stdlib byte parsing, no codec library. Returns None if the bytes
    match none of the three containers."""
    # PNG: 8-byte signature, then the IHDR chunk: width/height are the
    # first two big-endian u32s of its payload (offsets 16..24). The
    # chunk type is verified — nonstandard files (e.g. Apple CgBI before
    # IHDR) must not have arbitrary payload bytes read as dimensions.
    if (
        data[:8] == b"\x89PNG\r\n\x1a\n"
        and len(data) >= 24
        and data[12:16] == b"IHDR"
    ):
        return (
            int.from_bytes(data[16:20], "big"),
            int.from_bytes(data[20:24], "big"),
            "png",
        )
    # GIF: 'GIF87a'/'GIF89a', logical-screen width/height little-endian
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        return (
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
            "gif",
        )
    # JPEG: walk the marker segments to the first SOFn frame header,
    # whose payload is [precision u8, height u16, width u16, ...]
    if data[:2] == b"\xff\xd8":
        i, n = 2, len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            # standalone markers (no length field)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
                i += 2 if marker != 0xFF else 1
                continue
            if marker == 0xD9:  # EOI
                break
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
            if is_sof:
                return (
                    int.from_bytes(data[i + 7 : i + 9], "big"),
                    int.from_bytes(data[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            i += 2 + seg_len
    return None


def image_header_decode(data: bytes, fmt: str) -> dict[str, Any]:
    """Real image-metadata decode_fn (PNG/JPEG/GIF width/height from the
    container header, stdlib-only — no codec dependency). Raises on
    unrecognized bytes, mirroring a codec failure."""
    meta = parse_image_header(data or b"")
    if meta is None:
        raise ValueError(f"unrecognized image container (fmt hint: {fmt})")
    w, h, _ = meta
    return {"width": w, "height": h, "duration_ms": None, "features": None}


def parse_wav_header(data: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, duration_ms) from a
    RIFF/WAVE container — pure byte walking over the chunk list, no
    codec library. Returns None if the bytes are not a WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    rate = channels = bits = None
    data_size = None
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            channels = int.from_bytes(data[i + 10 : i + 12], "little")
            rate = int.from_bytes(data[i + 12 : i + 16], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size & 1)
    if not rate or not channels or not bits or data_size is None:
        return None
    frames = data_size // (channels * (bits // 8))
    return rate, channels, bits, int(frames * 1000 // rate)


def audio_header_decode(data: bytes, fmt: str) -> dict[str, Any]:
    """Real audio-metadata decode_fn for WAV (sample rate, channels,
    duration from the RIFF header, stdlib-only). Compressed formats
    (mp3/ogg/flac) still need a codec library — those raise, mirroring
    :func:`real_decode_stub`'s integration point."""
    meta = parse_wav_header(data or b"")
    if meta is None:
        raise ValueError(f"not a RIFF/WAVE container (fmt hint: {fmt})")
    rate, channels, _bits, duration_ms = meta
    return {
        "width": rate,  # sample_rate rides the width slot of DECODED_SCHEMA
        "height": channels,  # channel count rides the height slot
        "duration_ms": duration_ms,
        "features": None,
    }


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for ISO-BMFF boxes
    in data[start:end] — handles 64-bit largesize and stops on corrupt
    (non-advancing / overflowing) sizes."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i : i + 4], "big")
        btype = data[i + 4 : i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(data[i + 8 : i + 16], "big")
            payload = i + 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, payload, i + size
        i += size


def parse_mp4_header(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, duration_ms) from an MP4/MOV (ISO base media)
    container — walks the box tree to ``moov/mvhd`` (timescale +
    duration) and the first ``trak/tkhd`` with nonzero dimensions
    (16.16 fixed-point). Pure stdlib; no codec. None if the bytes are
    not ISO-BMFF or carry no movie header."""
    if len(data) < 12 or data[4:8] not in (b"ftyp", b"moov", b"mdat", b"wide"):
        return None
    duration_ms = None
    width = height = 0
    for btype, p, q in _walk_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ityp, ip, iq in _walk_boxes(data, p, q):
            if ityp == b"mvhd" and iq - ip >= 20:
                ver = data[ip]
                if ver == 1 and iq - ip >= 28:
                    timescale = int.from_bytes(data[ip + 20 : ip + 24], "big")
                    duration = int.from_bytes(data[ip + 24 : ip + 32], "big")
                else:
                    timescale = int.from_bytes(data[ip + 12 : ip + 16], "big")
                    duration = int.from_bytes(data[ip + 16 : ip + 20], "big")
                if timescale:
                    duration_ms = duration * 1000 // timescale
            elif ityp == b"trak" and not (width and height):
                for ttyp, tp, tq in _walk_boxes(data, ip, iq):
                    if ttyp != b"tkhd":
                        continue
                    off = 88 if data[tp] == 1 else 76
                    if tq - tp >= off + 8:
                        w = int.from_bytes(data[tp + off : tp + off + 4], "big")
                        h = int.from_bytes(
                            data[tp + off + 4 : tp + off + 8], "big"
                        )
                        if w and h:  # audio tracks carry 0x0
                            width, height = w >> 16, h >> 16
    if duration_ms is None:
        return None
    return width or None, height or None, duration_ms


def video_header_decode(data: bytes, fmt: str) -> dict[str, Any]:
    """Real video-metadata decode_fn for MP4/MOV (dimensions + duration
    from the moov box, stdlib-only). Frame/pixel decode still needs a
    codec — that remains :func:`real_decode_stub`'s integration point."""
    meta = parse_mp4_header(data or b"")
    if meta is None:
        raise ValueError(f"not an ISO-BMFF (mp4/mov) container (fmt hint: {fmt})")
    w, h, duration_ms = meta
    return {
        "width": w,
        "height": h,
        "duration_ms": duration_ms,
        "features": None,
    }


def _fake_decode(data: bytes, fmt: str) -> dict[str, Any]:
    """Deterministic fake decoder: derives pseudo-dimensions and a fixed-
    length feature vector purely from the bytes, so tests exercise the
    full plumbing with stable outputs."""
    import hashlib

    h = hashlib.sha256(data or b"").digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "duration_ms": int.from_bytes(h[2:4], "big"),
        "features": [round(b / 255.0, 6) for b in h[:8]],
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "data",
    fmt_col: str | None = None,
    decode_fn: Callable[[bytes, str], dict[str, Any]] | None = None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media via an Arrow-batched partition map.

    One output row per input row: (media_id, width, height, duration_ms,
    features). ``decode_fn=None`` → deterministic fake (tests); pass the
    real codec fn in production.
    """
    import pandas as pd

    fn = decode_fn or _fake_decode
    cols = [id_col, binary_col] + ([fmt_col] if fmt_col else [])
    src = df.select(*cols)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            # zip over column arrays, not iterrows (~5-10x faster per
            # batch; matters when the codec per-row cost is small, as with
            # header-only image decode)
            ids = pdf[id_col].to_numpy()
            datas = pdf[binary_col].to_numpy()
            fmts = (
                pdf[fmt_col].astype(str).to_numpy()
                if fmt_col
                else ["bin"] * len(pdf)
            )
            out = []
            for mid, data, fmt in zip(ids, datas, fmts):
                d = fn(bytes(data) if data is not None else b"", fmt)
                out.append(
                    (
                        int(mid),
                        d.get("width"),
                        d.get("height"),
                        d.get("duration_ms"),
                        d.get("features"),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "duration_ms", "features"]
            )

    return src.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Expand each video row into one row per sampled frame timestamp —
    pure column ops (`sequence` + `explode`), no decode needed. The
    downstream frame decode then runs per-frame-row via
    :func:`decode_media` with a frame-extracting decode_fn."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col).cast("long") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing + image near-dup
# ---------------------------------------------------------------------------


def _fake_pixels(data: bytes, fmt: str):
    """Deterministic fake pixel decoder: a 16x16 grayscale grid derived
    purely from the bytes (sha256-stretched), so tests exercise the full
    hash pipeline with stable outputs. Production passes a PIL/ffmpeg
    ``pixels_fn`` returning a 2-D uint8 array."""
    import hashlib

    import numpy as np

    out = b""
    seed = data or b""
    while len(out) < 256:
        seed = hashlib.sha256(seed).digest()
        out += seed
    return np.frombuffer(out[:256], dtype=np.uint8).reshape(16, 16)


def _ahash_one(px, hash_size: int) -> int:
    """Average-hash of one grayscale array: mean-pool to
    ``hash_size``² cells, set bit i when cell i > grid mean. Row-major
    bit order, bit 0 = MSB cell — the standard aHash layout."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    h, w = px.shape
    # integral mean-pool: trim to a multiple of hash_size, then average
    # each block (deterministic; no interpolation kernels to disagree on)
    th, tw = h - h % hash_size, w - w % hash_size
    px = px[:th, :tw]
    bh, bw = th // hash_size, tw // hash_size
    pooled = px.reshape(hash_size, bh, hash_size, bw).mean(axis=(1, 3))
    bits = (pooled > pooled.mean()).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    # two's-complement into a signed 64-bit long for the fp column
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "data",
    fmt_col: str | None = None,
    pixels_fn: Callable[[bytes, str], Any] | None = None,
    hash_size: int = 8,
) -> DataFrame:
    """(media_id, ahash): 64-bit average perceptual hash per image —
    robust to re-encoding/resize, the standard cheap near-dup signal for
    image corpora. Arrow-batched ``mapInPandas`` (same scale shape as
    :func:`decode_media`); ``pixels_fn=None`` selects the deterministic
    fake decoder so plumbing is testable without codec libraries."""
    import pandas as pd

    fn = pixels_fn or _fake_pixels
    cols = [id_col, binary_col] + ([fmt_col] if fmt_col else [])
    src = df.select(*cols)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            datas = pdf[binary_col].to_numpy()
            fmts = (
                pdf[fmt_col].astype(str).to_numpy()
                if fmt_col
                else ["bin"] * len(pdf)
            )
            out = [
                (
                    int(mid),
                    _ahash_one(
                        fn(bytes(d) if d is not None else b"", fmt), hash_size
                    ),
                )
                for mid, d, fmt in zip(ids, datas, fmts)
            ]
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return src.mapInPandas(
        batches, "media_id long, ahash long"
    )


def image_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "data",
    fmt_col: str | None = None,
    pixels_fn: Callable[[bytes, str], Any] | None = None,
    max_hamming: int = 5,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual aHash + the exact Hamming
    banding engine (``dedup.hamming_pairs`` — no false negatives at the
    fingerprint level). The image-corpus dedup composition: decode once,
    block by fingerprint bands, verify with bit_count — the corpus is
    never self-joined on raw bytes. Output: (id_a, id_b, hamming)."""
    from .dedup import hamming_pairs

    fp = image_ahash(df, id_col, binary_col, fmt_col, pixels_fn)
    return hamming_pairs(fp, "media_id", "ahash", max_hamming)
