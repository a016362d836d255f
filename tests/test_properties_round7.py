"""Property-based checks of the round-7 additions — driver-side (no
Spark session), exercising the math on ARBITRARY inputs:

* the aHash bit rule is integer-exact: numpy's float64 mean-pool
  comparison equals the pure-integer ``64 * block_sum > total_sum``
  rule for ANY uint8 grid — the claim the media oracle equality rests
  on;
* ``sniff_media`` never raises on arbitrary bytes and identifies each
  real container it is handed;
* ``_auto_lsh_shape`` keeps expected bucket occupancy bounded and the
  per-pair miss probability at the threshold under its target for any
  corpus size;
* the fixture MP4 container round-trips (duration, key payload) at any
  size — and its byte length is O(1) in the key (the 10x-sweep OOM
  regression).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from knetminer_etl_spark.operators import multimodal as MM
from knetminer_etl_spark.operators.dedup import _auto_lsh_shape

_SETTINGS = dict(max_examples=40, deadline=None)


class TestAHashIntegerExactness:
    @given(seed=st.integers(0, 2**32 - 1))
    @settings(**_SETTINGS)
    def test_float_path_equals_integer_rule(self, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(16, 16), dtype=np.int64)
        h = MM._ahash_one(px.astype(np.uint8), 8)
        total = int(px.sum())
        v = 0
        for r in range(8):
            for c in range(8):
                bs = int(px[2 * r : 2 * r + 2, 2 * c : 2 * c + 2].sum())
                v = (v << 1) | int(64 * bs > total)
        if v >= 1 << 63:
            v -= 1 << 64
        assert h == v

    @given(seed=st.integers(0, 2**32 - 1), w=st.sampled_from([8, 16, 24, 32]))
    @settings(**_SETTINGS)
    def test_any_grid_yields_64_bit_signed(self, seed, w):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(w, w), dtype=np.int64).astype(np.uint8)
        h = MM._ahash_one(px, 8)
        assert -(1 << 63) <= h < 1 << 63


class TestSniffMedia:
    @given(data=st.binary(max_size=200))
    @settings(**_SETTINGS)
    def test_never_raises_on_arbitrary_bytes(self, data):
        out = MM.sniff_media(data)
        assert out is None or out["media_type"] in ("image", "audio", "video")

    def test_identifies_each_container(self):
        png = MM.png_encode(np.zeros((3, 5), dtype=np.uint8))
        assert MM.sniff_media(png)["media_type"] == "image"
        wav = MM.wav_encode(np.zeros(160))
        got = MM.sniff_media(wav)
        assert (got["media_type"], got["width"]) == ("audio", 16_000)
        from knetminer_etl_spark.queries.media import _mp4_container

        vid = MM.sniff_media(_mp4_container(1500, key=7))
        assert (vid["media_type"], vid["duration_ms"]) == ("video", 1500)


class TestAutoLshShape:
    @given(
        n=st.integers(1, 50_000_000),
        threshold=st.floats(0.7, 0.995, allow_nan=False),
    )
    @settings(**_SETTINGS)
    def test_occupancy_and_miss_bounds(self, n, threshold):
        import math

        planes, bands = _auto_lsh_shape(n, threshold)
        assert planes >= 6 and bands >= 24
        # expected band-bucket occupancy stays bounded (the
        # corpus-quadratic guard): n / 2^planes <= 64 whenever the
        # plane cap (24) hasn't engaged
        if planes < 24:
            assert n / 2**planes <= 64
        # per-pair miss at the threshold stays under the 1e-6 target
        p = 1.0 - math.acos(min(threshold, 0.999)) / math.pi
        assert (1.0 - p**planes) ** bands <= 1e-6 * (1 + 1e-9)

    def test_floors_keep_small_corpora_on_default_shape(self):
        assert _auto_lsh_shape(1_000, 0.95) == (6, 24)
        # lower thresholds spend MORE bands (p(0.9)^6 keeps per-band
        # recall lower), never fewer planes on a small corpus
        planes, bands = _auto_lsh_shape(64, 0.9)
        assert planes == 6 and bands == 28


class TestFixtureMp4:
    @given(
        dur=st.integers(1, 3_600_000),
        key=st.integers(0, 2**60),
    )
    @settings(**_SETTINGS)
    def test_roundtrip_and_constant_size(self, dur, key):
        from knetminer_etl_spark.queries.media import _mp4_container

        data = _mp4_container(dur, key=key)
        parsed = MM.parse_mp4_header(data)
        assert parsed is not None and parsed[2] == dur
        assert int.from_bytes(data[-8:], "big") == key
        assert len(data) == len(_mp4_container(1, key=0))


class TestUnionFindMinLabels:
    """The bounded-graph dispatch path of connected_components rests on
    this pure function matching min-reachable-id semantics exactly."""

    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 60), st.integers(0, 60)),
            min_size=0,
            max_size=120,
        )
    )
    @settings(**_SETTINGS)
    def test_matches_bfs_reference(self, edges):
        from knetminer_etl_spark.operators.graph import _union_find_min_labels

        got = _union_find_min_labels(edges)
        # BFS reference: min reachable id over the undirected graph
        adj: dict = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        want = {}
        seen: set = set()
        for start in adj:
            if start in seen:
                continue
            comp, frontier = [], [start]
            seen.add(start)
            while frontier:
                x = frontier.pop()
                comp.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        frontier.append(y)
            m = min(comp)
            for x in comp:
                want[x] = m
        assert got == want

    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 40)),
            min_size=1,
            max_size=80,
        )
    )
    @settings(**_SETTINGS)
    def test_labels_are_fixpoints(self, edges):
        # every label is the label of its own label (canonical), and a
        # component's label is one of its members
        from knetminer_etl_spark.operators.graph import _union_find_min_labels

        got = _union_find_min_labels(edges)
        for x, c in got.items():
            assert got[c] == c
            assert c <= x
