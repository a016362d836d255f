"""Property-based checks of the round-4 operators against independent
pure-Python reference implementations (the same strategy
test_properties.py applies to the earlier families)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# -- PNG codec: decode(encode(x)) == x for arbitrary images -----------------


@st.composite
def _gray_images(draw):
    h = draw(st.integers(1, 20))
    w = draw(st.integers(1, 20))
    data = draw(
        st.lists(st.integers(0, 255), min_size=h * w, max_size=h * w)
    )
    return np.array(data, dtype=np.uint8).reshape(h, w)


@given(_gray_images())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_grayscale(img):
    from knetminer_etl_spark.operators.multimodal import png_encode, png_pixels

    assert np.array_equal(png_pixels(png_encode(img)), img)


@given(_gray_images())
@settings(max_examples=20, deadline=None)
def test_png_crc_and_idat_are_spec_conformant(img):
    """Chunks must carry valid CRCs and a zlib-decompressible IDAT —
    what any third-party reader checks first."""
    import struct

    from knetminer_etl_spark.operators.multimodal import png_encode

    data = png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    i, idat = 8, b""
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", data[i + 8 + length : i + 12 + length])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF)
        if tag == b"IDAT":
            idat += payload
        i += 12 + length
    raw = zlib.decompress(idat)
    assert len(raw) == img.shape[0] * (1 + img.shape[1])


# -- repeated-span scrub vs brute-force reference ---------------------------


def _scrub_reference(docs: list[tuple[int, list[str]]], k: int):
    """O(n²) reference: first occurrence of each k-gram (by (doc, pos))
    survives; all other occurrences mark their k positions covered."""
    first: dict[tuple, tuple] = {}
    for did, toks in sorted(docs):
        for p in range(max(0, len(toks) - k + 1)):
            g = tuple(toks[p : p + k])
            first.setdefault(g, (did, p))
    covered: dict[int, set] = {did: set() for did, _ in docs}
    for did, toks in docs:
        for p in range(max(0, len(toks) - k + 1)):
            g = tuple(toks[p : p + k])
            if first[g] != (did, p):
                covered[did].update(range(p, p + k))
    return {
        did: " ".join(t for i, t in enumerate(toks) if i not in covered[did])
        for did, toks in docs
    }


@st.composite
def _corpora(draw):
    vocab = ["aa", "bb", "cc", "dd"]
    n_docs = draw(st.integers(2, 5))
    return [
        (
            i,
            draw(
                st.lists(st.sampled_from(vocab), min_size=0, max_size=14)
            ),
        )
        for i in range(n_docs)
    ]


@given(_corpora(), st.integers(2, 4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_scrub_matches_reference(spark, corpus, k):
    from knetminer_etl_spark.operators.dedup import repeated_span_scrub

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in repeated_span_scrub(df, k=k).collect()
    }
    assert got == _scrub_reference(corpus, k)


# -- shortest paths vs pure-Python Dijkstra ---------------------------------


def _dijkstra_reference(edges, sources):
    import heapq

    adj: dict[str, list] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {s: 0.0 for s in sources}
    heap = [(0.0, s) for s in sources]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


@st.composite
def _graphs(draw):
    n = draw(st.integers(2, 8))
    nodes = [f"n{i}" for i in range(n)]
    n_edges = draw(st.integers(1, 14))
    edges = [
        (
            draw(st.sampled_from(nodes)),
            draw(st.sampled_from(nodes)),
            float(draw(st.integers(0, 9))),
        )
        for _ in range(n_edges)
    ]
    sources = draw(
        st.lists(st.sampled_from(nodes), min_size=1, max_size=2, unique=True)
    )
    return edges, sources


@given(_graphs())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shortest_paths_matches_dijkstra(spark, graph):
    from knetminer_etl_spark.operators.graph import shortest_paths

    edges, sources = graph
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    s = spark.createDataFrame([(x,) for x in sources], "id string")
    got = {
        r["id"]: r["dist"]
        for r in shortest_paths(e, s, max_rounds=20).collect()
    }
    assert got == pytest.approx(_dijkstra_reference(edges, sources))
