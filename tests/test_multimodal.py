from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import multimodal as MM


@pytest.fixture()
def media(spark):
    return spark.range(8).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("blob-"), F.col("id").cast("string")), "utf-8").alias(
            "data"
        ),
    )


class TestPlumbing:
    def test_attach_meta(self, spark, media):
        got = MM.attach_media_meta(media, media_type="image", fmt="png").first()
        assert got["media_meta"]["media_type"] == "image"
        assert got["media_meta"]["n_bytes"] == len(b"blob-0")
        assert got["media_meta"]["width"] is None  # codec fields null pre-decode

    def test_fake_decode_deterministic(self, spark, media):
        a = {r["media_id"]: r.asDict() for r in MM.decode_media(media).collect()}
        b = {r["media_id"]: r.asDict() for r in MM.decode_media(media).collect()}
        assert a == b
        assert all(len(v["features"]) == 8 for v in a.values())
        assert all(16 <= v["width"] < 80 for v in a.values())

    def test_real_stub_raises(self, spark, media):
        from py4j.protocol import Py4JJavaError

        df = MM.decode_media(media, decode_fn=MM.real_decode_stub)
        with pytest.raises(Exception) as ei:
            df.collect()
        assert "NotImplementedError" in str(ei.value) or "media codecs" in str(ei.value)

    def test_null_binary_handled(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "media_id long, data binary"
        )
        got = MM.decode_media(df).first()
        assert got["width"] is not None  # fake decoder hashes empty bytes

    def test_real_image_header_decode(self, spark):
        """Real PNG/JPEG/GIF bytes through the real (stdlib) image
        metadata decoder — the image decode path is no longer a stub."""
        import struct
        import zlib

        def make_png(w, h):
            def chunk(typ, payload):
                return (
                    struct.pack(">I", len(payload))
                    + typ
                    + payload
                    + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        def make_jpeg(w, h):
            app0 = (
                b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
                + struct.pack(">HH", 1, 1) + b"\x00\x00"
            )
            sof0 = (
                b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
            )
            return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

        def make_gif(w, h):
            return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

        # pure parser first
        assert MM.parse_image_header(make_png(640, 480)) == (640, 480, "png")
        assert MM.parse_image_header(make_jpeg(31, 17)) == (31, 17, "jpeg")
        assert MM.parse_image_header(make_gif(12, 34)) == (12, 34, "gif")
        assert MM.parse_image_header(b"not an image") is None
        # signature-valid but first chunk is not IHDR (e.g. Apple CgBI):
        # must refuse rather than read chunk payload as dimensions
        bogus = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 4) + b"CgBI" + b"\x00" * 12
        assert MM.parse_image_header(bogus) is None

        # and through the Spark pipeline
        df = spark.createDataFrame(
            [(1, bytearray(make_png(640, 480))), (2, bytearray(make_jpeg(31, 17))),
             (3, bytearray(make_gif(12, 34)))],
            "media_id long, data binary",
        )
        got = {
            r["media_id"]: (r["width"], r["height"])
            for r in MM.decode_media(df, decode_fn=MM.image_header_decode).collect()
        }
        assert got == {1: (640, 480), 2: (31, 17), 3: (12, 34)}

    def test_frame_sample_plan(self, spark):
        df = spark.createDataFrame(
            [(1, 3500), (2, 0)], "media_id long, duration_ms long"
        )
        got = MM.frame_sample_plan(df, every_ms=1000).collect()
        by_id: dict[int, list[int]] = {}
        for r in got:
            by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
        assert sorted(by_id[1]) == [0, 1000, 2000, 3000]
        assert by_id[2] == [0]


class TestWavDecode:
    @staticmethod
    def _wav_bytes(rate=8000, channels=2, n_frames=4000):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * channels * n_frames)
        return buf.getvalue()

    def test_parse_wav_header(self):
        data = self._wav_bytes(rate=16000, channels=1, n_frames=16000)
        assert MM.parse_wav_header(data) == (16000, 1, 16, 1000)
        assert MM.parse_wav_header(b"not a wav") is None

    def test_decode_media_with_wav(self, spark):
        rows = [(1, self._wav_bytes(8000, 2, 4000)), (2, self._wav_bytes(44100, 1, 44100))]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        got = {
            r["media_id"]: r
            for r in MM.decode_media(df, decode_fn=MM.audio_header_decode).collect()
        }
        assert got[1]["width"] == 8000 and got[1]["height"] == 2
        assert got[1]["duration_ms"] == 500  # 4000 frames @ 8 kHz
        assert got[2]["duration_ms"] == 1000

    def test_non_wav_raises(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([(1, b"\xff\xd8junk")], "media_id long, data binary")
        with _pytest.raises(Exception):
            MM.decode_media(df, decode_fn=MM.audio_header_decode).collect()
