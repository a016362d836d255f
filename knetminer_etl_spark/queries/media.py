"""Oracle-paired multimodal (image/audio/video) near-dup queries.

The problem with oracle-checking media operators is the codec boundary:
DuckDB cannot decode PNG/WAV/MP4 bytes. These queries close it **by
construction**: the media corpus is synthesized executor-side from the
``documents`` table with pure-integer pixel/sample formulas, encoded
through the library's REAL codecs (``png_encode``, ``wav_encode``, the
ISO-BMFF container writer below), then pushed through the production
decode → fingerprint → banded-pair pipeline. The DuckDB oracle
recomputes the fingerprints straight from the same integer formulas and
brute-forces the pairs — so a defect anywhere in the Spark path (codec
round-trip, aHash pooling, acoustic featurization, band blocking,
verification, frame voting) diverges from the oracle.

Determinism across engines is engineered, not hoped for:

* **aHash bits are integer-exact.** Pixels are ints; a pooled cell
  exceeds the grid mean iff ``64 * block_sum > total_sum`` — the same
  integer comparison numpy's float64 path resolves exactly (sums < 2^24
  are exact doubles), so the 64-bit hash is bit-identical in both
  engines and Hamming distances agree exactly.
* **Audio fingerprints are selection-robust.** Near-dup audio twins are
  volume-scaled ×2 copies; the acoustic fingerprint is volume-invariant
  through exact power-of-two float scaling, so a twin's fingerprint is
  bit-identical to its original's *within each engine* and the pair
  verifies at cosine ≈ 1.0 → round 6 → 1.0 on both sides. Non-dup
  cosines sit below ~0.97 by construction (frame loud/quiet bit
  patterns), far from the 0.99 threshold, so last-ulp summation-order
  differences between numpy and DuckDB can never flip a pair decision.
  Sign-LSH blocking has recall exactly 1 for the emitted pairs: they
  have bit-identical fingerprints, hence identical band buckets.
* **Video frame identity is keyed through the container.** The frame
  decoder hook recovers a per-video key from the 8-byte payload of a
  trailing ISO-BMFF ``free`` box (production would seek real frames);
  frame timestamps come from the REAL ``mvhd`` duration parse, so a
  duration/timescale bug shifts the sampled grid and breaks the oracle.

These are extension operators (the reference pipeline is
tabular-only); scale shape notes live on the operators themselves
(operators/multimodal.py)."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..runtime import catalog as CAT

QUERIES: dict = {}
ORACLES: dict = {}

_MULT = 2654435761  # Knuth multiplicative-hash constant, fits BIGINT math
_TWIN = 10_000_000  # planted-duplicate id offset (matches embedding queries)


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CAT.read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# images: synth pixels -> REAL PNG encode/decode -> aHash -> banded pairs
# ---------------------------------------------------------------------------


def _md5_byte(s: str) -> int:
    """First byte of md5(s) — the registry's cross-engine deterministic
    hash primitive (DuckDB: ('0x' || substr(md5(s), 1, 2))::INT).
    Arithmetic-only pixel formulas collapse mod 256 (every key residue
    class shares an image, pair volume O(n^2/256)); md5 gives genuinely
    independent grids per key."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:2], 16)


def _image_pixels(media_id: int) -> "np.ndarray":
    """16x16 uint8 md5-derived grid per key; twins (id >= _TWIN)
    perturb the top-left 2x2 patch by +128 mod 256 — enough to flip a
    few aHash bits, never all of them."""
    key = media_id - _TWIN if media_id >= _TWIN else media_id
    px = np.fromiter(
        (_md5_byte(f"{key}-{pos}") for pos in range(256)),
        dtype=np.int64,
        count=256,
    ).reshape(16, 16)
    if media_id >= _TWIN:
        px = px.copy()
        px[:2, :2] = (px[:2, :2] + 128) % 256
    return px.astype(np.uint8)


def _image_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _doc_ids(spark, sf_dir)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                rows.append((did, MM.png_encode(_image_pixels(did))))
                if did % 10 == 0:
                    tid = did + _TWIN
                    rows.append((tid, MM.png_encode(_image_pixels(tid))))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return docs.mapInPandas(gen, "media_id long, data binary")


def media_image_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic 16x16 PNGs (REAL stdlib codec both ways)
    -> perceptual aHash -> exact pigeonhole Hamming banding. The oracle
    recomputes every hash with integer arithmetic and brute-forces all
    pairs — the banding is exact, so the sets must be equal."""
    corpus = _image_corpus(spark, sf_dir)
    return MM.image_dup_pairs(
        corpus,
        pixels_fn=lambda data, fmt: MM.png_pixels(data),
        max_hamming=5,
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# pooled cell (R,C) covers pixels rows {2R,2R+1} x cols {2C,2C+1}; bit
# blk = R*8+C is set iff 64*block_sum > total_sum (integer-exact twin of
# numpy's mean comparison). Row-major bit 0 = MSB => two's-complement
# value = -(2^63)*bit0 + sum(bit_i * 2^(63-i)).
MEDIA_IMAGE_DUP_PAIRS_SQL = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS key, FALSE AS twin FROM documents
  UNION ALL
  SELECT doc_id + {_TWIN}, doc_id, TRUE FROM documents WHERE doc_id % 10 = 0
),
px AS (
  SELECT media_id, (r.r // 2) * 8 + (c.c // 2) AS blk,
         CASE WHEN twin AND r.r < 2 AND c.c < 2
              THEN (('0x' || substr(md5(key::VARCHAR || '-' ||
                         (r.r * 16 + c.c)::VARCHAR), 1, 2))::INT + 128) % 256
              ELSE ('0x' || substr(md5(key::VARCHAR || '-' ||
                        (r.r * 16 + c.c)::VARCHAR), 1, 2))::INT
         END AS p
  FROM ids, generate_series(0, 15) AS r(r), generate_series(0, 15) AS c(c)
),
blocks AS (SELECT media_id, blk, sum(p) AS bs FROM px GROUP BY 1, 2),
tot AS (SELECT media_id, sum(bs) AS total FROM blocks GROUP BY 1),
fp AS (
  SELECT b.media_id,
         CAST(sum(CASE WHEN 64 * b.bs > t.total THEN
                    CASE WHEN b.blk = 0 THEN -9223372036854775808
                         ELSE (1::BIGINT << (63 - b.blk)) END
                  ELSE 0 END) AS BIGINT) AS h
  FROM blocks b JOIN tot t USING (media_id)
  GROUP BY b.media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.media_id < b.media_id
WHERE bit_count(xor(a.h, b.h)) <= 5
"""

QUERIES["media_image_dup_pairs"] = media_image_dup_pairs
ORACLES["media_image_dup_pairs"] = MEDIA_IMAGE_DUP_PAIRS_SQL


def media_image_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image ingestion: the base images are the prior corpus
    (their aHash band index persisted conceptually as
    ``hamming_band_rows``), the twins arrive as the NEW batch —
    ``incremental_hamming_pairs`` bands only the batch, equi-joins the
    index, and must emit exactly the pairs a full-corpus run emits for
    pairs involving the batch (the blocking is exact and deterministic,
    so prior ∪ incremental == full; pinned operator-level in
    tests/test_streaming_media.py). Oracle = the brute-force scan
    restricted to pairs with a twin side."""
    from knetminer_etl_spark.operators.dedup import (
        hamming_band_rows,
        incremental_hamming_pairs,
    )
    from knetminer_etl_spark.operators.multimodal import image_ahash

    corpus = _image_corpus(spark, sf_dir)
    fp = image_ahash(
        corpus, pixels_fn=lambda data, fmt: MM.png_pixels(data)
    ).localCheckpoint(eager=True)
    old_index = hamming_band_rows(
        fp.filter(F.col("media_id") < _TWIN), "media_id", "ahash", 5
    )
    new_fp = fp.filter(F.col("media_id") >= _TWIN)
    return incremental_hamming_pairs(
        new_fp, old_index, id_col="media_id", fp_col="ahash", max_hamming=5
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


MEDIA_IMAGE_INCREMENTAL_SQL = MEDIA_IMAGE_DUP_PAIRS_SQL.replace(
    "WHERE bit_count(xor(a.h, b.h)) <= 5",
    f"WHERE bit_count(xor(a.h, b.h)) <= 5 AND b.media_id >= {_TWIN}",
)
assert f"AND b.media_id >= {_TWIN}" in MEDIA_IMAGE_INCREMENTAL_SQL

QUERIES["media_image_incremental"] = media_image_incremental
ORACLES["media_image_incremental"] = MEDIA_IMAGE_INCREMENTAL_SQL


# ---------------------------------------------------------------------------
# audio: synth PCM -> REAL WAV encode/decode -> acoustic fp -> LSH pairs
# ---------------------------------------------------------------------------

_AUDIO_N = 2048  # 16 frames x 128 samples; /32768 keeps all x exact dyadic
_AMP_LOUD = 8000.0
_AMP_QUIET = 50.0


def _audio_wave(media_id: int) -> "np.ndarray":
    """2048 float samples in [-1, 1]. Frame f (128 samples) is 'loud'
    iff bit f of key*_MULT is set: loud frames alternate sign every
    sample (zcr=1), quiet frames every 16 (zcr=7/127) — the 16-bit
    loud pattern is the id's acoustic identity. Twins (id >= _TWIN)
    play the SAME pattern at exactly 2x volume: the volume-invariant
    fingerprint comes out bit-identical."""
    key = media_id - _TWIN if media_id >= _TWIN else media_id
    scale = 2.0 if media_id >= _TWIN else 1.0
    i = np.arange(_AUDIO_N, dtype=np.int64)
    f = i // 128
    j = i % 128
    loud = ((key * _MULT) >> f) & 1
    amp = np.where(loud == 1, _AMP_LOUD, _AMP_QUIET)
    sign = np.where(
        loud == 1,
        np.where(j % 2 == 0, 1.0, -1.0),
        np.where((j // 16) % 2 == 0, 1.0, -1.0),
    )
    return amp * sign * scale / 32768.0


def _audio_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _doc_ids(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                rows.append((did, MM.wav_encode(_audio_wave(did))))
                if did % 20 == 0:
                    tid = did + _TWIN
                    rows.append((tid, MM.wav_encode(_audio_wave(tid))))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return docs.mapInPandas(gen, "media_id long, data binary")


def media_audio_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic 16-bit PCM WAVs (REAL stdlib codec both
    ways) -> acoustic fingerprint -> sign-LSH banded cosine pairs at
    0.99. Emitted pairs are exact-volume-scaled twins (and pattern
    collisions), whose fingerprints are bit-identical within each
    engine: cosine rounds to 1.0 on both sides, and LSH recall is
    exactly 1 for identical fingerprints. Non-dup cosines stay below
    ~0.97 by construction — order-of-summation ulps cannot flip any
    decision."""
    corpus = _audio_corpus(spark, sf_dir)
    return MM.audio_dup_pairs(corpus, threshold=0.99)


# The oracle recomputes the fingerprint pipeline from the sample
# formula: per-frame rms (all |x| equal within a frame -> sums exact),
# zcr via lag(), rms-block L2 normalization, final L2 normalization,
# then brute-force pair cosines. All divisions/sqrts are single
# correctly-rounded IEEE ops — identical in both engines.
MEDIA_AUDIO_DUP_PAIRS_SQL = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS key, 1.0 AS scale
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + {_TWIN}, doc_id, 2.0
  FROM documents WHERE doc_id % 20 = 0
),
samp AS (
  SELECT media_id, i.i // 128 AS f, i.i % 128 AS j,
         (CASE WHEN ((key * {_MULT}) >> (i.i // 128)) & 1 = 1
               THEN {_AMP_LOUD} ELSE {_AMP_QUIET} END)
         * (CASE WHEN ((key * {_MULT}) >> (i.i // 128)) & 1 = 1
                 THEN CASE WHEN (i.i % 128) % 2 = 0 THEN 1.0 ELSE -1.0 END
                 ELSE CASE WHEN ((i.i % 128) // 16) % 2 = 0
                           THEN 1.0 ELSE -1.0 END END)
         * scale / 32768.0 AS x
  FROM ids, generate_series(0, {_AUDIO_N - 1}) AS i(i)
),
flagged AS (
  SELECT media_id, f, x,
         CASE WHEN lag(x) OVER (PARTITION BY media_id, f ORDER BY j)
                   IS NOT NULL
               AND (x < 0) <> (lag(x) OVER (PARTITION BY media_id, f
                                            ORDER BY j) < 0)
              THEN 1 ELSE 0 END AS flip
  FROM samp
),
frames AS (
  SELECT media_id, f,
         sqrt(sum(x * x) / 128.0) AS rms,
         sum(flip) / 127.0 AS zcr
  FROM flagged GROUP BY media_id, f
),
rn AS (SELECT media_id, sqrt(sum(rms * rms)) AS n1 FROM frames GROUP BY 1),
pre AS (
  SELECT fr.media_id, fr.f AS dim, fr.rms / rn.n1 AS v
  FROM frames fr JOIN rn USING (media_id)
  UNION ALL
  SELECT media_id, f + 16, zcr FROM frames
),
n2 AS (SELECT media_id, sqrt(sum(v * v)) AS n2 FROM pre GROUP BY 1),
fp AS (
  SELECT pre.media_id, dim, v / n2.n2 AS v
  FROM pre JOIN n2 USING (media_id)
),
nrm AS (SELECT media_id, sqrt(sum(v * v)) AS n FROM fp GROUP BY 1),
dots AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b, sum(a.v * b.v) AS dot
  FROM fp a JOIN fp b ON a.dim = b.dim AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(d.dot / (na.n * nb.n), 6) AS cosine
FROM dots d
JOIN nrm na ON na.media_id = d.id_a
JOIN nrm nb ON nb.media_id = d.id_b
WHERE round(d.dot / (na.n * nb.n), 6) >= 0.99
"""

QUERIES["media_audio_dup_pairs"] = media_audio_dup_pairs
ORACLES["media_audio_dup_pairs"] = MEDIA_AUDIO_DUP_PAIRS_SQL


# ---------------------------------------------------------------------------
# video: synth MP4 (REAL mvhd duration parse) -> frame aHash -> voting
# ---------------------------------------------------------------------------


def _iso_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_container(duration_ms: int, key: int = 0) -> bytes:
    """Minimal spec-shaped ISO-BMFF container: ftyp + moov/mvhd (v0,
    timescale 1000 -> duration field IS milliseconds) + a trailing
    ``free`` box whose 8-byte payload carries the per-video key for the
    frame-decoder hook (production decoders seek real frames; the hook
    boundary is the same). The key rides in box CONTENT, not length —
    a length encoding would make container size O(key), which OOM'd
    the Python workers on the synthetic 10x sweep's ~9e7 ids."""
    mvhd = (
        b"\x00" * 4
        + b"\x00" * 8
        + (1000).to_bytes(4, "big")
        + int(duration_ms).to_bytes(4, "big")
        + b"\x00" * 80
    )
    moov = _iso_box(b"moov", _iso_box(b"mvhd", mvhd))
    return (
        _iso_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + moov
        + _iso_box(b"free", int(key).to_bytes(8, "big"))
    )


def _video_duration_ms(key: int) -> int:
    return (3 + key % 7) * 1000 + 500  # 4..10 sampled frames at 1 fps


def _video_frame_pixels(data: bytes, ts_ms: int) -> "np.ndarray":
    """Frame-decoder hook: 16x16 uint8 grid from (video key, frame ts).
    The key rides in the container's trailing free-box payload (the
    last 8 bytes); pixels are the image formula plus a per-second
    term."""
    key = int.from_bytes(bytes(data)[-8:], "big")
    tsk = int(ts_ms) // 1000
    return (
        np.fromiter(
            (_md5_byte(f"{key}-{tsk}-{pos}") for pos in range(256)),
            dtype=np.int64,
            count=256,
        )
        .reshape(16, 16)
        .astype(np.uint8)
    )


def _video_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _doc_ids(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                rows.append(
                    (did, _mp4_container(_video_duration_ms(did), key=did))
                )
                if did % 40 == 0:
                    # a TRIM of the same content: first 3 of its frames
                    rows.append(
                        (did + _TWIN, _mp4_container(2500, key=did))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return docs.mapInPandas(gen, "media_id long, data binary")


def media_video_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic MP4 containers (REAL mvhd duration parse
    drives the 1 fps frame grid) -> per-frame aHash -> pigeonhole frame
    banding -> per-side frame voting. Twins are trims (first 3 frames
    of the original): frac_b = 1.0 >= 0.5 emits the pair with
    frac_a = 3/n_a. The oracle brute-forces the frame Hamming scan and
    recomputes both sides' distinct matched-frame counts."""
    corpus = _video_corpus(spark, sf_dir)
    return MM.video_dup_pairs(
        corpus,
        frame_pixels_fn=_video_frame_pixels,
        max_hamming=2,
        min_match_frac=0.5,
    ).select("id_a", "id_b", "matched_frames", "frac_a", "frac_b")


MEDIA_VIDEO_DUP_PAIRS_SQL = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS key, 4 + doc_id % 7 AS nf
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {_TWIN}, doc_id, 3
  FROM documents WHERE doc_id % 40 = 0
),
px AS (
  SELECT media_id, k.k AS tsk, (r.r // 2) * 8 + (c.c // 2) AS blk,
         ('0x' || substr(md5(key::VARCHAR || '-' || k.k::VARCHAR || '-' ||
              (r.r * 16 + c.c)::VARCHAR), 1, 2))::INT AS p
  FROM ids,
       generate_series(0, 9) AS k(k),
       generate_series(0, 15) AS r(r),
       generate_series(0, 15) AS c(c)
  WHERE k.k < nf
),
blocks AS (
  SELECT media_id, tsk, blk, sum(p) AS bs FROM px GROUP BY 1, 2, 3
),
tot AS (
  SELECT media_id, tsk, sum(bs) AS total FROM blocks GROUP BY 1, 2
),
fh AS (
  SELECT b.media_id, b.tsk,
         CAST(sum(CASE WHEN 64 * b.bs > t.total THEN
                    CASE WHEN b.blk = 0 THEN -9223372036854775808
                         ELSE (1::BIGINT << (63 - b.blk)) END
                  ELSE 0 END) AS BIGINT) AS h
  FROM blocks b JOIN tot t USING (media_id, tsk)
  GROUP BY 1, 2
),
matched AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b,
         count(DISTINCT a.tsk) AS matched_frames,
         count(DISTINCT b.tsk) AS matched_b
  FROM fh a JOIN fh b
    ON a.media_id < b.media_id
   AND bit_count(xor(a.h, b.h)) <= 2
  GROUP BY 1, 2
)
SELECT m.id_a, m.id_b, m.matched_frames,
       m.matched_frames / ia.nf AS frac_a,
       m.matched_b / ib.nf AS frac_b
FROM matched m
JOIN ids ia ON ia.media_id = m.id_a
JOIN ids ib ON ib.media_id = m.id_b
WHERE GREATEST(m.matched_frames / ia.nf, m.matched_b / ib.nf) >= 0.5
"""

QUERIES["media_video_dup_pairs"] = media_video_dup_pairs
ORACLES["media_video_dup_pairs"] = MEDIA_VIDEO_DUP_PAIRS_SQL


def media_video_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental video ingestion: the originals are the prior corpus
    (frame band index + per-video frame counts persisted), the trim
    twins arrive as the NEW batch — ``incremental_video_pairs`` hashes
    only the batch's frames, votes against the index (which carries
    hash + timestamp, so verification is index-local) and must emit
    exactly the full run's pairs involving the batch. Oracle = the
    brute-force frame scan restricted to twin-side pairs."""
    from knetminer_etl_spark.operators.multimodal import (
        incremental_video_pairs,
        video_frame_band_rows,
        video_frame_hashes,
    )

    corpus = _video_corpus(spark, sf_dir)
    frames = video_frame_hashes(
        corpus, frame_pixels_fn=_video_frame_pixels
    ).filter(F.col("ahash").isNotNull()).localCheckpoint(eager=True)
    old = frames.filter(F.col("media_id") < _TWIN)
    new = frames.filter(F.col("media_id") >= _TWIN)
    return incremental_video_pairs(
        new,
        video_frame_band_rows(old, 2),
        old.groupBy("media_id").agg(F.count("*").alias("n_frames")),
        max_hamming=2,
        min_match_frac=0.5,
    ).select("id_a", "id_b", "matched_frames", "frac_a", "frac_b")


MEDIA_VIDEO_INCREMENTAL_SQL = MEDIA_VIDEO_DUP_PAIRS_SQL.replace(
    "WHERE GREATEST(m.matched_frames / ia.nf, m.matched_b / ib.nf) >= 0.5",
    "WHERE GREATEST(m.matched_frames / ia.nf, m.matched_b / ib.nf) >= 0.5\n"
    f"  AND m.id_b >= {_TWIN}",
)
assert f"AND m.id_b >= {_TWIN}" in MEDIA_VIDEO_INCREMENTAL_SQL

QUERIES["media_video_incremental"] = media_video_incremental
ORACLES["media_video_incremental"] = MEDIA_VIDEO_INCREMENTAL_SQL
