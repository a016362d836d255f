"""Oracle-paired multimodal registry queries (queries/media.py): the
synthesized corpora must round-trip the REAL codecs, and each query's
planted twins must surface."""

from __future__ import annotations

import os

import pytest

from knetminer_etl_spark.operators import multimodal as MM
from knetminer_etl_spark.queries import media as MQ

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


class TestImageQuery:
    def test_png_roundtrip_preserves_formula_pixels(self):
        import numpy as np

        for mid in (0, 7, 10, 10_000_010):
            px = MQ._image_pixels(mid)
            assert px.shape == (16, 16) and px.dtype == np.uint8
            back = MM.png_pixels(MM.png_encode(px))
            assert np.array_equal(back, px)

    def test_twin_pairs_surface(self, spark):
        rows = MQ.media_image_dup_pairs(spark, SF_DIR).collect()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
        # every doc_id % 10 == 0 plants a twin at id + 10M; the 2x2
        # patch perturbation flips only a few aHash bits
        assert (0, MQ._TWIN) in got and (10, MQ._TWIN + 10) in got
        assert all(h <= 5 for h in got.values())
        assert len(rows) >= 40  # ~50 twins at sf0.001, most within 5 bits

    def test_spark_hashes_equal_direct_ahash(self, spark):
        """The full pipeline (formula -> PNG encode -> Spark decode ->
        aHash) must equal hashing the formula pixels directly — pins the
        codec boundary the oracle shares."""
        corpus = MQ._image_corpus(spark, SF_DIR)
        got = {
            r["media_id"]: r["ahash"]
            for r in MM.image_ahash(
                corpus.filter("media_id IN (3, 13, 10000000)"),
                pixels_fn=lambda data, fmt: MM.png_pixels(data),
            ).collect()
        }
        for mid, h in got.items():
            assert h == MM._ahash_one(MQ._image_pixels(mid), 8)


class TestAudioQuery:
    def test_wav_roundtrip_is_exact(self):
        import numpy as np

        for mid in (0, 5, 20, MQ._TWIN + 20):
            x = MQ._audio_wave(mid)
            samples, rate = MM.wav_samples(MM.wav_encode(x))
            assert rate == 16_000
            assert np.array_equal(samples, x)  # exact dyadic round-trip

    def test_twin_fingerprint_is_bit_identical(self):
        fp = MM._audio_fp_one(MQ._audio_wave(20))
        fp_twin = MM._audio_fp_one(MQ._audio_wave(MQ._TWIN + 20))
        assert fp == fp_twin  # volume-invariance at exact 2x scale

    def test_twin_pairs_surface_at_cosine_one(self, spark):
        rows = MQ.media_audio_dup_pairs(spark, SF_DIR).collect()
        got = {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}
        assert (20, MQ._TWIN + 20) in got
        assert all(c == 1.0 for c in got.values())
        # sf0.001: doc_id % 20 == 0 -> 25 planted twins (plus any exact
        # 16-bit loud-pattern collisions, none among 100 keys here)
        assert len(rows) == 25


class TestMediaDirSource:
    def test_reads_and_sniffs_real_containers(self, spark, tmp_path):
        import numpy as np

        (tmp_path / "img.png").write_bytes(
            MM.png_encode(np.zeros((4, 6), dtype=np.uint8))
        )
        (tmp_path / "snd.wav").write_bytes(
            MM.wav_encode(np.zeros(1600), sample_rate=16_000)
        )
        (tmp_path / "vid.mp4").write_bytes(
            MQ._mp4_container(2500, key=1)
        )
        (tmp_path / "junk.bin").write_bytes(b"not media at all")
        rows = {
            r["path"].rsplit("/", 1)[-1]: r
            for r in MM.read_media_dir(spark, str(tmp_path)).collect()
        }
        img = rows["img.png"]
        assert (img["media_type"], img["format"]) == ("image", "png")
        assert (img["width"], img["height"]) == (6, 4)
        snd = rows["snd.wav"]
        assert (snd["media_type"], snd["width"], snd["duration_ms"]) == (
            "audio",
            16_000,
            100,
        )
        vid = rows["vid.mp4"]
        assert (vid["media_type"], vid["duration_ms"]) == ("video", 2500)
        junk = rows["junk.bin"]
        assert junk["media_type"] is None and junk["n_bytes"] == 16
        # ids are deterministic path hashes; bytes round-trip intact
        assert len({r["media_id"] for r in rows.values()}) == 4
        assert bytes(img["data"]) == (tmp_path / "img.png").read_bytes()

    def test_glob_filter_pushed_to_listing(self, spark, tmp_path):
        import numpy as np

        (tmp_path / "a.png").write_bytes(
            MM.png_encode(np.zeros((2, 2), dtype=np.uint8))
        )
        (tmp_path / "b.txt").write_bytes(b"nope")
        got = MM.read_media_dir(spark, str(tmp_path), glob="*.png").collect()
        assert len(got) == 1 and got[0]["format"] == "png"

    def test_feeds_dup_pipeline(self, spark, tmp_path):
        import numpy as np

        px = np.arange(256, dtype=np.uint8).reshape(16, 16)
        (tmp_path / "one.png").write_bytes(MM.png_encode(px))
        (tmp_path / "two.png").write_bytes(MM.png_encode(px))  # exact dup
        src = MM.read_media_dir(spark, str(tmp_path), glob="*.png")
        pairs = MM.image_dup_pairs(
            src, pixels_fn=lambda data, fmt: MM.png_pixels(data), max_hamming=0
        ).collect()
        assert len(pairs) == 1 and pairs[0]["hamming"] == 0


class TestVideoQuery:
    def test_container_parses_and_keys_via_payload(self):
        data = MQ._mp4_container(MQ._video_duration_ms(30), key=30)
        w, h, dur = MM.parse_mp4_header(data)
        assert dur == MQ._video_duration_ms(30)
        assert int.from_bytes(data[-8:], "big") == 30
        # container size is O(1) whatever the key (the 10x-sweep OOM fix)
        big = MQ._mp4_container(MQ._video_duration_ms(30), key=90_004_990)
        assert len(big) == len(data)

    def test_trim_twin_pairs_surface(self, spark):
        rows = MQ.media_video_dup_pairs(spark, SF_DIR).collect()
        got = {(r["id_a"], r["id_b"]): r for r in rows}
        # doc_id % 40 == 0 plants a 3-frame trim at id + 10M
        r = got[(40, MQ._TWIN + 40)]
        assert r["matched_frames"] == 3
        assert r["frac_b"] == 1.0
        nf = 4 + 40 % 7
        assert abs(r["frac_a"] - 3 / nf) < 1e-12
        assert all(v["frac_b"] <= 1.0 and v["frac_a"] <= 1.0 for v in got.values())
