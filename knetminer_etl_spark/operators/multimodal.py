"""Multimodal (image/audio/video) column plumbing.

Media ride through the pipeline as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas iterators over ``mapInPandas`` — the only sane
shape at 100 TB (no driver involvement, batch-columnar transfer, media
libs imported once per executor, partition-parallel).

The actual codec calls are **stubbed** (image/audio libraries are not in
this environment): ``decode_fn=None`` selects a deterministic fake
decoder so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested; pass a real ``decode_fn`` (e.g. PIL /
torchaudio based) in production, or use :func:`real_decode_stub` to see
the intended integration point raise ``NotImplementedError``.
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
    """The production integration point. Replace with a PIL/ffmpeg/
    torchaudio call returning {width, height, duration_ms, features}."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "pass decode_fn= with a real decoder in production"
    )


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
            out = []
            for _, row in pdf.iterrows():
                fmt = str(row[fmt_col]) if fmt_col else "bin"
                data = row[binary_col]
                d = fn(bytes(data) if data is not None else b"", fmt)
                out.append(
                    (
                        int(row[id_col]),
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
