"""Scale-aware join helpers: skew salting and broadcast-threshold hints.

AQE's skew-join handling covers sort-merge joins whose skew shows up at
runtime; explicit salting remains the tool when one key dominates so hard
that even a split partition can't balance (the classic power-law hot key)
or when AQE is unavailable. ``salted_join`` implements the standard
recipe: replicate the small side R times, scatter the big side's hot keys
across R salt values, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's key salted across ``salt_buckets``.

    The big side gets a random-but-deterministic salt per row
    (hash of the whole row modulo buckets — no rand(), so retries and
    speculative tasks agree); the small side is replicated once per salt
    value via an explode (cheap: small side is small by assumption).
    Output columns match ``big.join(small, on, how)``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, on=[on, "_salt"], how=how).drop("_salt")


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose frequency exceeds ``min_count`` — for split-join
    strategies (hot keys via salted/broadcast path, cold keys via plain
    shuffle join)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("_freq"))
        .filter(F.col("_freq") > min_count)
        .select(key)
    )


def split_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_min_count: int = 1_000_000,
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner join that routes hot keys through a salted join and the rest
    through a plain equi-join, then unions. One extra pass to find hot
    keys — worth it only when a key's share is pathological."""
    hk = hot_keys(big, on, hot_min_count)
    big_hot = big.join(F.broadcast(hk), on=on, how="left_semi")
    big_cold = big.join(F.broadcast(hk), on=on, how="left_anti")
    small_hot = small.join(F.broadcast(hk), on=on, how="left_semi")
    joined_hot = salted_join(big_hot, small_hot, on, salt_buckets)
    joined_cold = big_cold.join(small, on=on)
    return joined_hot.unionByName(joined_cold)
