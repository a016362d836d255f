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


class TestMp4Decode:
    @staticmethod
    def _box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    @classmethod
    def _mp4_bytes(
        cls, width=640, height=360, timescale=1000, duration=2500, v1=False
    ) -> bytes:
        if v1:
            mvhd = (
                b"\x01" + b"\x00" * 3 + b"\x00" * 16
                + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
                + b"\x00" * 80
            )
            tk_off = 88
            tkhd_head = b"\x01" + b"\x00" * 3
        else:
            mvhd = (
                b"\x00" * 4 + b"\x00" * 8
                + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
                + b"\x00" * 80
            )
            tk_off = 76
            tkhd_head = b"\x00" * 4
        tkhd_v = (
            tkhd_head
            + b"\x00" * (tk_off - 4)
            + (width << 16).to_bytes(4, "big")
            + (height << 16).to_bytes(4, "big")
        )
        tkhd_a = tkhd_head + b"\x00" * (tk_off - 4) + b"\x00" * 8  # audio 0x0
        moov = cls._box(
            b"moov",
            cls._box(b"mvhd", mvhd)
            + cls._box(b"trak", cls._box(b"tkhd", tkhd_a))  # audio first
            + cls._box(b"trak", cls._box(b"tkhd", tkhd_v)),
        )
        return cls._box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov

    def test_parse_mp4_header_v0_and_v1(self):
        assert MM.parse_mp4_header(self._mp4_bytes()) == (640, 360, 2500)
        assert MM.parse_mp4_header(
            self._mp4_bytes(1920, 1080, 90000, 90000 * 7, v1=True)
        ) == (1920, 1080, 7000)
        assert MM.parse_mp4_header(b"RIFFxxxxWAVE") is None
        assert MM.parse_mp4_header(b"") is None

    def test_corrupt_box_sizes_dont_loop_or_crash(self):
        data = self._mp4_bytes()
        # truncated mid-moov: must terminate without raising (result may
        # legitimately be None — the mvhd got cut off)
        out = MM.parse_mp4_header(data[: len(data) // 2])
        assert out is None or isinstance(out, tuple)
        # first box size overflowing the buffer: walker must stop
        bad = bytearray(data)
        bad[0:4] = (2**31).to_bytes(4, "big")
        assert MM.parse_mp4_header(bytes(bad)) is None

    def test_decode_media_with_mp4(self, spark):
        rows = [
            (1, self._mp4_bytes(640, 360, 1000, 2500)),
            (2, self._mp4_bytes(1280, 720, 600, 1200, v1=True)),
        ]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        got = {
            r["media_id"]: r
            for r in MM.decode_media(df, decode_fn=MM.video_header_decode).collect()
        }
        assert (got[1]["width"], got[1]["height"]) == (640, 360)
        assert got[1]["duration_ms"] == 2500
        assert got[2]["duration_ms"] == 2000  # 1200/600 ticks = 2 s

    def test_frame_sample_composes_with_mp4_duration(self, spark):
        df = spark.createDataFrame(
            [(1, self._mp4_bytes(duration=3500))], "media_id long, data binary"
        )
        decoded = MM.decode_media(df, decode_fn=MM.video_header_decode)
        frames = MM.frame_sample_plan(decoded, every_ms=1000)
        assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]


class TestImageHash:
    def test_ahash_deterministic_and_distinct(self, spark):
        from knetminer_etl_spark.operators.multimodal import image_ahash

        rows = [(1, b"image-one"), (2, b"image-one"), (3, b"other-bytes")]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
        assert got[1] == got[2]  # same bytes -> same hash
        assert got[1] != got[3]

    def test_ahash_known_grid(self, spark):
        """Hand-checked 8x8 grid: top half bright -> top 32 bits set."""
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import image_ahash

        def grid_fn(data, fmt):
            px = np.zeros((8, 8), dtype=np.uint8)
            px[:4, :] = 200
            return px

        df = spark.createDataFrame([(1, b"x")], "media_id long, data binary")
        h = image_ahash(df, pixels_fn=grid_fn).first()["ahash"]
        assert h == -(1 << 63) + ((1 << 63) - (1 << 32))  # 0xFFFFFFFF00000000 signed

    def test_mean_pool_resizes_larger_images(self, spark):
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import image_ahash

        def big_fn(data, fmt):  # 32x32 with the same bright-top pattern
            px = np.zeros((32, 32), dtype=np.uint8)
            px[:16, :] = 200
            return px

        def small_fn(data, fmt):
            px = np.zeros((8, 8), dtype=np.uint8)
            px[:4, :] = 200
            return px

        df = spark.createDataFrame([(1, b"x")], "media_id long, data binary")
        assert (
            image_ahash(df, pixels_fn=big_fn).first()["ahash"]
            == image_ahash(df, pixels_fn=small_fn).first()["ahash"]
        )

    def test_image_dup_pairs_finds_near_duplicates(self, spark):
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import image_dup_pairs

        base = np.zeros((8, 8), dtype=np.uint8)
        base[:4, :] = 200

        def fn(data, fmt):
            px = base.copy()
            if data == b"near":  # flip 2 cells -> hamming 2
                px[0, 0] = 0
                px[7, 7] = 200
            if data == b"far":  # inverted -> hamming ~64
                px = 200 - px
            return px

        rows = [(1, b"orig"), (2, b"orig"), (3, b"near"), (4, b"far")]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_dup_pairs(df, pixels_fn=fn, max_hamming=5).collect()
        }
        assert pairs[(1, 2)] == 0
        assert pairs[(1, 3)] == 2 and pairs[(2, 3)] == 2
        assert not any(4 in p for p in pairs)


class TestRealPngCodec:
    """Real PNG content decode (stdlib zlib codec) through the full
    perceptual-hash pipeline — no codec library, no fakes."""

    def _img(self, seed: int, h: int = 24, w: int = 32):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    def test_encode_decode_roundtrip_gray_and_rgb(self):
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import (
            png_encode,
            png_pixels,
        )

        g = self._img(1)
        assert np.array_equal(png_pixels(png_encode(g)), g)
        rgb = np.stack([self._img(2), self._img(3), self._img(4)], axis=-1)
        assert np.array_equal(png_pixels(png_encode(rgb)), rgb)

    def test_decoder_reconstructs_all_filter_types(self):
        """Hand-build a PNG whose scanlines use filters 1-4 (Sub, Up,
        Average, Paeth) and check reconstruction against the original."""
        import struct
        import zlib

        import numpy as np

        from knetminer_etl_spark.operators.multimodal import png_pixels

        img = self._img(7, h=5, w=8)

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        raw = bytearray()
        for r, ft in enumerate([0, 1, 2, 3, 4]):
            raw.append(ft)
            for x in range(img.shape[1]):
                cur = int(img[r, x])
                a = int(img[r, x - 1]) if x else 0
                b = int(img[r - 1, x]) if r else 0
                c = int(img[r - 1, x - 1]) if r and x else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ft]
                raw.append((cur - pred) & 0xFF)

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(png_pixels(data), img)

    def test_header_parser_agrees_with_codec(self):
        from knetminer_etl_spark.operators.multimodal import (
            parse_image_header,
            png_encode,
        )

        data = png_encode(self._img(5, h=17, w=23))
        assert parse_image_header(data) == (23, 17, "png")

    def test_real_png_through_ahash_and_dup_pairs(self, spark):
        """Real PNG bytes → auto_pixels (stdlib codec) → aHash →
        banded Hamming near-dup pairs, end to end in Spark."""
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import (
            auto_pixels,
            image_dup_pairs,
            png_encode,
        )

        base = self._img(11, h=64, w=64)
        # near-dup: mild uniform brightness shift (aHash-invariant-ish)
        shifted = np.clip(base.astype(np.int16) + 6, 0, 255).astype(np.uint8)
        other = self._img(99, h=64, w=64)
        df = spark.createDataFrame(
            [
                (1, bytearray(png_encode(base))),
                (2, bytearray(png_encode(shifted))),
                (3, bytearray(png_encode(other))),
            ],
            "media_id long, data binary",
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in image_dup_pairs(
                df, pixels_fn=auto_pixels, max_hamming=5
            ).collect()
        }
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_pil_pixels_gated(self):
        """Pillow path: decodes when PIL is installed, raises a guiding
        ImportError when not — either way auto_pixels stays usable."""
        import numpy as np

        from knetminer_etl_spark.operators.multimodal import (
            auto_pixels,
            pil_pixels,
            png_encode,
        )

        img = self._img(21)
        data = png_encode(img)
        try:
            import PIL  # noqa: F401

            assert np.array_equal(pil_pixels(data), img)
        except ImportError:
            import pytest as _pytest

            with _pytest.raises(ImportError, match="media"):
                pil_pixels(data)
        # auto_pixels always real for PNG regardless of PIL
        assert np.array_equal(auto_pixels(data), img)


class TestPcmAudio:
    """Real WAV PCM decode + fingerprint + near-dup."""

    @staticmethod
    def _tone(freq, rate=8000, sec=0.5, amp=0.5):
        import numpy as np

        t = np.arange(int(rate * sec)) / rate
        return amp * np.sin(2 * np.pi * freq * t)

    def test_roundtrip_16bit(self):
        import numpy as np

        x = self._tone(440)
        data = MM.wav_encode(x, 8000)
        dec = MM.wav_samples(data)
        assert dec is not None
        y, rate = dec
        assert rate == 8000 and len(y) == len(x)
        assert float(np.abs(y - x).max()) < 1.0 / 32000  # 16-bit quantization

    def test_stereo_mixes_to_mono(self):
        import numpy as np

        left, right = self._tone(440), self._tone(880)
        data = MM.wav_encode(np.stack([left, right], axis=1), 8000)
        y, _ = MM.wav_samples(data)
        assert float(np.abs(y - (left + right) / 2).max()) < 1e-3

    def test_sample_widths_and_float(self):
        # hand-build 8-bit and float32 containers; decoder must handle both
        import numpy as np

        x = self._tone(200, sec=0.1)
        pcm8 = (np.clip(np.rint(x * 128 + 128), 0, 255)).astype(np.uint8)
        raw = pcm8.tobytes()
        fmt = (
            b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
            + (8000).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (8).to_bytes(2, "little")
        )
        body = b"WAVE" + fmt + b"data" + len(raw).to_bytes(4, "little") + raw
        y, rate = MM.wav_samples(b"RIFF" + len(body).to_bytes(4, "little") + body)
        assert rate == 8000 and float(np.abs(y - x).max()) < 1.0 / 100

        rawf = x.astype("<f4").tobytes()
        fmtf = (
            b"fmt " + (16).to_bytes(4, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
            + (32000).to_bytes(4, "little") + (4).to_bytes(2, "little")
            + (32).to_bytes(2, "little")
        )
        bodyf = b"WAVE" + fmtf + b"data" + len(rawf).to_bytes(4, "little") + rawf
        yf, _ = MM.wav_samples(b"RIFF" + len(bodyf).to_bytes(4, "little") + bodyf)
        assert float(np.abs(yf - x).max()) < 1e-6

    def test_not_wav_returns_none(self):
        assert MM.wav_samples(b"") is None
        assert MM.wav_samples(b"RIFFxxxxJUNK") is None
        assert MM.wav_samples(b"\x89PNG\r\n\x1a\n" + b"0" * 64) is None

    def test_fingerprint_unit_norm_and_volume_invariant(self):
        import numpy as np

        x = self._tone(330)
        a = np.asarray(MM._audio_fp_one(x))
        b = np.asarray(MM._audio_fp_one(0.5 * x))
        assert len(a) == 32 and abs(float(a @ a) - 1.0) < 1e-9
        assert float(a @ b) > 0.999  # scaling barely moves the direction

    def test_spark_fingerprints_match_driver(self, spark):
        import numpy as np

        rows = [
            (i, bytearray(MM.wav_encode(self._tone(200 + 100 * i), 8000)))
            for i in range(4)
        ] + [(99, bytearray(b"not a wav"))]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        got = {r["media_id"]: r for r in MM.audio_fingerprints(df).collect()}
        assert got[99]["fingerprint"] is None  # quarantine, not crash
        for i in range(4):
            want = MM._audio_fp_one(MM.wav_samples(MM.wav_encode(self._tone(200 + 100 * i), 8000))[0])
            assert np.allclose(got[i]["fingerprint"], want)
            assert got[i]["sample_rate"] == 8000
            assert got[i]["duration_ms"] == 500

    def test_audio_dup_pairs_finds_noisy_copy(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        x = self._tone(440, sec=1.0)
        rows = [
            (0, bytearray(MM.wav_encode(x, 8000))),
            (1, bytearray(MM.wav_encode(x + rng.normal(0, 1e-3, x.shape), 8000))),
            (2, bytearray(MM.wav_encode(self._tone(1600, sec=0.3, amp=0.9), 8000))),
        ]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        pairs = {(r["id_a"], r["id_b"]) for r in MM.audio_dup_pairs(df).collect()}
        assert (0, 1) in pairs
        assert all(2 not in p for p in pairs)


class TestVideoDup:
    """Frame-sampled perceptual video near-dup (fake frame decoder)."""

    _mp4 = TestMp4Decode._mp4_bytes

    def test_frame_hashes_real_duration_fake_frames(self, spark):
        df = spark.createDataFrame(
            [(1, self._mp4(duration=3500)), (9, bytearray(b"not mp4"))],
            "media_id long, data binary",
        )
        rows = MM.video_frame_hashes(df, every_ms=1000).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r)
        assert sorted(r["frame_ts_ms"] for r in by_id[1]) == [0, 1000, 2000, 3000]
        assert all(isinstance(r["ahash"], int) for r in by_id[1])
        assert len(by_id[9]) == 1 and by_id[9][0]["ahash"] is None  # quarantine

    def test_frame_hashes_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, self._mp4(duration=2500))], "media_id long, data binary"
        )
        a = sorted(map(tuple, MM.video_frame_hashes(df).collect()))
        b = sorted(map(tuple, MM.video_frame_hashes(df).collect()))
        assert a == b

    def test_dup_pairs_by_frame_voting(self, spark):
        # same frame pixels per ts -> identical hashes: a copy of video 1
        # shifted in container bytes only. Fake decoder keys on
        # (data, ts), so give the copy IDENTICAL data but a different id
        # (container-identical re-upload), and a third distinct video.
        v1 = self._mp4(duration=4500)
        v3 = self._mp4(width=320, height=240, duration=4500)  # different bytes
        rows = [(1, v1), (2, v1), (3, v3)]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        pairs = {
            (r["id_a"], r["id_b"]): r
            for r in MM.video_dup_pairs(df, max_hamming=0, min_match_frac=0.9).collect()
        }
        assert (1, 2) in pairs
        assert pairs[(1, 2)]["matched_frames"] == 5
        assert pairs[(1, 2)]["frac_a"] == 1.0
        assert all({a, b} == {1, 2} for a, b in pairs)  # v3 pairs with nobody

    def test_partial_overlap_respects_threshold(self, spark):
        # emulate a trim (v2 = first 3 seconds of v1) with a frame
        # decoder keyed on ts ONLY, shared across videos: v2's 3 frames
        # are then pixel-identical to v1's first 3 of 10
        v_long = self._mp4(duration=9500)   # 10 frames
        short = self._mp4(duration=2500)    # 3 frames
        fn = lambda data, ts: MM._fake_pixels(int(ts).to_bytes(8, "little"), "bin")
        df = spark.createDataFrame(
            [(1, v_long), (2, short)], "media_id long, data binary"
        )
        out = MM.video_dup_pairs(
            df, frame_pixels_fn=fn, max_hamming=0, min_match_frac=0.5
        ).collect()
        # 3 of v2's 3 frames match (frac_b = 1.0), only 3/10 of v1's
        assert len(out) == 1
        r = out[0]
        assert r["matched_frames"] == 3
        assert abs(r["frac_b"] - 1.0) < 1e-9 and abs(r["frac_a"] - 0.3) < 1e-9
        # at a threshold above both fractions the pair disappears... but
        # frac_b is 1.0 here, so tighten via max side instead: voting
        # uses the GREATEST fraction by design (trim-robustness)
        none = MM.video_dup_pairs(
            df, frame_pixels_fn=fn, max_hamming=0, min_match_frac=1.1
        ).collect()
        assert none == []

    def test_static_content_fracs_are_per_side(self, spark):
        # 15 frames of A all match the single frame of B (static
        # content): frac_b must be 1/1 counted on B's OWN matched
        # frames, and frac_a must be 15/15 — never >1.0, and never A's
        # matched count divided by B's total (the pre-r7 formula gave
        # frac_b = 15/1 = 15.0 for this shape)
        fn = lambda data, ts: MM._fake_pixels(b"static", "bin")  # every frame identical
        df = spark.createDataFrame(
            [(1, self._mp4(duration=14500)), (2, self._mp4(duration=500))],
            "media_id long, data binary",
        )
        out = MM.video_dup_pairs(
            df, frame_pixels_fn=fn, max_hamming=0, min_match_frac=0.5
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["matched_frames"] == 15
        assert abs(r["frac_a"] - 1.0) < 1e-9
        assert abs(r["frac_b"] - 1.0) < 1e-9
        assert r["frac_a"] <= 1.0 and r["frac_b"] <= 1.0

    def test_asymmetric_match_fracs_never_exceed_one(self, spark):
        # A has 15 frames, 5 distinct pixel patterns repeating; B has 5
        # frames, one per pattern. Every A frame matches exactly one B
        # frame and vice versa: frac_a = 15/15, frac_b = 5/5 — B's side
        # is counted on B's matched frames, not A's vote count.
        fn = lambda data, ts: MM._fake_pixels(
            (int(ts) // 1000 % 5).to_bytes(2, "little"), "bin"
        )
        df = spark.createDataFrame(
            [(1, self._mp4(duration=14500)), (2, self._mp4(duration=4500))],
            "media_id long, data binary",
        )
        out = MM.video_dup_pairs(
            df, frame_pixels_fn=fn, max_hamming=0, min_match_frac=0.9
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["matched_frames"] == 15 and r["frac_a"] == 1.0
        assert abs(r["frac_b"] - 1.0) < 1e-9 and r["frac_b"] <= 1.0

    def test_banding_matches_bruteforce_frame_voting(self, spark):
        # pigeonhole blocking must equal the brute-force frame-pair scan
        import itertools

        vids = [(i, self._mp4(duration=3500, timescale=1000 + 7 * i)) for i in range(12)]
        df = spark.createDataFrame(vids, "media_id long, data binary")
        frames = MM.video_frame_hashes(df).filter("ahash is not null").collect()
        by_vid = {}
        for r in frames:
            by_vid.setdefault(r["media_id"], []).append((r["frame_ts_ms"], r["ahash"]))
        max_h, frac = 3, 0.25
        expect = {}
        for a, b in itertools.combinations(sorted(by_vid), 2):
            matched_a = {
                ts_a
                for ts_a, ha in by_vid[a]
                for _, hb in by_vid[b]
                if bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= max_h
            }
            matched_b = {
                ts_b
                for ts_b, hb in by_vid[b]
                for _, ha in by_vid[a]
                if bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= max_h
            }
            if matched_a:
                fa = len(matched_a) / len(by_vid[a])
                fb = len(matched_b) / len(by_vid[b])
                if max(fa, fb) >= frac:
                    expect[(a, b)] = len(matched_a)
        got = {
            (r["id_a"], r["id_b"]): r["matched_frames"]
            for r in MM.video_dup_pairs(
                df, max_hamming=max_h, min_match_frac=frac
            ).collect()
        }
        assert got == expect
