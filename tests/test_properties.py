"""Property-based tests (hypothesis): the serialization keystone and the
as-of join checked against independent reference implementations on
randomized inputs."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knetminer_etl_spark.core.serialize import DEFAULT_CONVERTER, json_literal
from knetminer_etl_spark.operators.asof import asof_join

# one shared strategy: printable-ish text incl. JSON-hostile characters
texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(texts, min_size=1, max_size=25))
def test_json_literal_roundtrips_any_string(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r["s"] for r in df.select(json_literal(F.col("v")).alias("s")).collect()]
    for v, s in zip(values, got):
        if v == "":
            assert s is None  # drop-on-empty
        else:
            assert json.loads(s) == v  # valid JSON, exact value
            # Python-side converter agrees at the json.loads level
            assert json.loads(DEFAULT_CONVERTER.serialize(v)) == v


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30
    ),
    right_ts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=30,
        unique=True,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    to_ts = lambda s: base + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, to_ts(t), i) for i, t in enumerate(left_ts)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, to_ts(t), float(t)) for t in right_ts], "k long, ts timestamp, v double"
    )
    got = {
        r["lid"]: r["v_right"]
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    lp = pd.DataFrame({"ts": [to_ts(t) for t in left_ts], "lid": range(len(left_ts))}).sort_values("ts")
    rp = pd.DataFrame({"ts": sorted(to_ts(t) for t in right_ts)})
    rp["v"] = [float((t - base).total_seconds()) for t in rp["ts"]]
    want_df = pd.merge_asof(lp, rp, on="ts", direction="backward")
    want = {
        int(r.lid): (None if pd.isna(r.v) else r.v) for r in want_df.itertuples()
    }
    assert got == want


# JSON value strategy: scalars, numeric-looking strings, shallow arrays/
# objects — the shapes PG property values actually take
_json_scalars = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.booleans(),
    st.none(),
    texts,
    texts.map(lambda s: s + "123"),  # numeric-looking suffixes
    st.sampled_from(["123", "true", "false", "null", "1e5", "0.50"]),
)
_json_values = st.one_of(
    _json_scalars,
    st.lists(_json_scalars, max_size=3),
    st.dictionaries(st.sampled_from(["a", "b"]), _json_scalars, max_size=2),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    props=st.dictionaries(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",),
                                   min_codepoint=0x21, max_codepoint=0x7E),
            min_size=1,
            max_size=8,
        ),
        st.lists(_json_values, min_size=1, max_size=4),
        min_size=1,
        max_size=4,
    )
)
def test_pg_jsonl_roundtrip_preserves_value_types(spark, props, tmp_path_factory):
    """write_pg_jsonl -> read_pg_jsonl must preserve every property
    value's JSON TYPE and value (the quote-preserving split): a doc with
    string '123' must not come back as number 123, and vice versa."""
    from knetminer_etl_spark.pg.jsonl import read_pg_jsonl, write_pg_jsonl

    serialized = {
        k: [json.dumps(v) for v in vs] for k, vs in props.items()
    }
    pg = spark.createDataFrame(
        [("N1", "node", ["L"], None, None, serialized)],
        "id string, type string, labels array<string>, "
        "`from` string, `to` string, properties map<string,array<string>>",
    )
    out = str(tmp_path_factory.mktemp("pgjsonl"))
    write_pg_jsonl(pg, out)
    back = read_pg_jsonl(spark, out).collect()[0]
    got = {
        k: [json.loads(v) for v in vs]
        for k, vs in back["properties"].items()
    }
    want = {k: [json.loads(s) for s in vs] for k, vs in serialized.items()}
    for k in want:
        assert len(got[k]) == len(want[k])
        for g, w in zip(got[k], want[k]):
            assert g == w
            assert type(g) is type(w)  # bool vs int, str '123' vs 123 …


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fps=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=20,
        unique=True,
    ),
    max_hamming=st.integers(min_value=0, max_value=5),
)
def test_hamming_pairs_equals_brute_force(spark, fps, max_hamming):
    """The pigeonhole band blocking must be EXACT: its output equals a
    brute-force Hamming scan for any fingerprints and any distance."""
    from knetminer_etl_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "doc_id long, fp long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(df, max_hamming=max_hamming).collect()
    }
    want = {}
    for i, a in enumerate(fps):
        for j, b in enumerate(fps):
            if i < j:
                d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    want[(i, j)] = d
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=15,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_train_matches_reference_on_random_corpora(spark, words, n_merges):
    from knetminer_etl_spark.operators import bpe as B
    from tests.test_bpe import _ref_bpe

    corpus = " ".join(words)
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    got = B.bpe_train(docs, n_merges=n_merges)
    want, _ = _ref_bpe(corpus, n_merges)
    assert got == want
