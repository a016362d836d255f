"""Distributed BPE merge learning (tokenizer training on the corpus).

Byte-pair-encoding training (Sennrich et al. 2016; the GPT/Llama
tokenizer-training skeleton): starting from characters, repeatedly merge
the most frequent adjacent symbol pair. A pretraining-data pipeline runs
this over the corpus it just cleaned — so the engine ships it as a
first-class distributed operator.

Scale shape — the key identity BPE training rests on: merge statistics
depend only on the **word-frequency vocabulary**, not the corpus. So the
100 TB corpus is scanned ONCE (tokenize → groupBy word → count, one
shuffle with map-side combine), and every merge round then iterates over
the vocab relation — bounded by distinct-word count (millions, not
trillions), never rescanning the corpus. Per round: one pair-count
aggregate (+ a 1-row TakeOrdered for the winning pair) and a narrow
fold that applies the merge inside each word's symbol array; the vocab
is pinned per round (`localCheckpoint`) so round k never re-executes
rounds 1..k-1 (the same exponential-recompute guard as the iterative
graph operators).

Determinism: the winning pair breaks count ties on (a, b) string order,
and the merge fold is a sequential left fold (leftmost-first,
non-overlapping — ``aaa`` + merge (a,a) → ``[aa, a]``), matching the
reference Python implementation tests compare against.

No counterpart in the reference; north-star text-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, tokens

END_MARK = "▁"  # word-final marker (sentencepiece-style visible space)


def word_symbol_vocab(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(symbols array<string>, freq bigint): the word-frequency vocabulary
    with each word decomposed into character symbols, last character
    suffixed with the end-of-word marker. THE one corpus-wide shuffle of
    BPE training."""
    words = df.select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        vocab = vocab.filter(F.col("freq") >= min_freq)
    # split into single characters; append the end marker to the last
    return vocab.select(F.expr(_chars_sql("w")).alias("symbols"), "freq")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, pair_count): adjacent-symbol pair frequencies over the
    vocab, weighted by word frequency. Narrow zip_with + explode into one
    map-side-combined aggregate."""
    pairs = F.expr(
        "zip_with(slice(symbols, 1, size(symbols) - 1), "
        "slice(symbols, 2, size(symbols) - 1), "
        "(x, y) -> named_struct('a', x, 'b', y))"
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _merge_fold_sql(src_sql: str, a: str, b: str) -> str:
    """SQL fold applying merge (a, b) → ab inside a symbol-array
    expression: sequential left scan, leftmost-first, non-overlapping
    (a carried symbol consumed by a merge cannot start another)."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return (
        f"aggregate({src_sql}, "
        "named_struct('out', CAST(array() AS ARRAY<STRING>), "
        "'carry', CAST(NULL AS STRING)), "
        "(acc, s) -> CASE "
        f"WHEN acc.carry = '{qa}' AND s = '{qb}' THEN named_struct("
        f"'out', concat(acc.out, array('{qa}{qb}')), "
        "'carry', CAST(NULL AS STRING)) "
        "WHEN acc.carry IS NULL THEN named_struct('out', acc.out, 'carry', s) "
        "ELSE named_struct('out', concat(acc.out, array(acc.carry)), "
        "'carry', s) END, "
        "acc -> CASE WHEN acc.carry IS NULL THEN acc.out "
        "ELSE concat(acc.out, array(acc.carry)) END)"
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the ordered
    merge list (the tokenizer artifact). Stops early when no pair occurs
    twice. Driver holds only the merge list — vocab stays distributed."""
    vocab = word_symbol_vocab(df, text_col, min_freq).localCheckpoint(
        eager=False
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            F.expr(_merge_fold_sql("symbols", a, b)).alias("symbols"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def _chars_sql(col_name: str) -> str:
    return (
        f"transform(split({col_name}, ''), (c, i) -> "
        f"CASE WHEN i = length({col_name}) - 1 THEN c || '{END_MARK}' "
        "ELSE c END)"
    )


def bpe_segment(col_name: str, merges: list[tuple[str, str]]):
    """Apply a learned merge list to a word column (by name) → symbol
    array Column. Narrow map (the merge folds nest as one SQL
    expression): tokenizing with the learned tokenizer at scan speed."""
    src = _chars_sql(col_name)
    for a, b in merges:
        src = _merge_fold_sql(src, a, b)
    return F.expr(src)
