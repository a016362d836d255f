"""BPE merge learning vs a pure-Python reference implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from knetminer_etl_spark.operators import bpe as B

CORPUS = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


def _ref_decompose(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + B.END_MARK
    return tuple(chars)


def _ref_merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    carry: str | None = None
    for s in syms:
        if carry == a and s == b:
            out.append(a + b)
            carry = None
        elif carry is None:
            carry = s
        else:
            out.append(carry)
            carry = s
    if carry is not None:
        out.append(carry)
    return tuple(out)


def _ref_bpe(text: str, n_merges: int):
    freqs: dict[str, int] = {}
    for w in text.split():
        freqs[w] = freqs.get(w, 0) + 1
    vocab = {_ref_decompose(w): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {
            _ref_merge_word(s, a, b): f for s, f in vocab.items()
        }
    return merges, vocab


class TestBpeTrain:
    def test_merge_sequence_matches_reference(self, spark):
        docs = spark.createDataFrame([(1, CORPUS)], "doc_id long, text string")
        got = B.bpe_train(docs, n_merges=8)
        want, _ = _ref_bpe(CORPUS, 8)
        assert got == want

    def test_early_stop_when_no_repeating_pair(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        assert B.bpe_train(docs, n_merges=5) == []

    def test_segment_applies_learned_merges(self, spark):
        docs = spark.createDataFrame([(1, CORPUS)], "doc_id long, text string")
        merges = B.bpe_train(docs, n_merges=6)
        _, ref_vocab = _ref_bpe(CORPUS, 6)
        words = spark.createDataFrame(
            [(w,) for w in set(CORPUS.split())], "w string"
        )
        got = {
            tuple(r["s"]): None
            for r in words.select(B.bpe_segment("w", merges).alias("s")).collect()
        }
        assert set(got) == set(ref_vocab)

    def test_leftmost_nonoverlapping_merge(self, spark):
        # 'aaa…' stress: merge (a,a) must produce [aa, aa, a▁] for 'aaaaa'
        docs = spark.createDataFrame(
            [(1, "aaaaa aaaaa")], "doc_id long, text string"
        )
        merges = B.bpe_train(docs, n_merges=1)
        assert merges == [("a", "a")]
        seg = (
            spark.createDataFrame([("aaaaa",)], "w string")
            .select(B.bpe_segment("w", merges).alias("s"))
            .first()["s"]
        )
        assert seg == ["aa", "aa", "a" + B.END_MARK]

    def test_pair_counts_weighted_by_freq(self, spark):
        docs = spark.createDataFrame(
            [(1, "ab ab ab cd")], "doc_id long, text string"
        )
        vocab = B.word_symbol_vocab(docs)
        counts = {
            (r["a"], r["b"]): r["pair_count"]
            for r in B.pair_counts(vocab).collect()
        }
        assert counts[("a", "b" + B.END_MARK)] == 3
        assert counts[("c", "d" + B.END_MARK)] == 1
