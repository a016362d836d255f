from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import zorder as Z


def _py_norm(x: int, lo: int, hi: int, bits: int) -> int:
    x = min(max(x, lo), hi)
    return (x - lo) * ((1 << bits) - 1) // (hi - lo)


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for d, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * len(vals) + d)
    return out


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x in range(0, 200, 7) for y in range(0, 100, 3)]
    return spark.createDataFrame(rows, "x bigint, y bigint")


def test_zkey_matches_python_reference(spark, grid):
    got = Z.with_zorder_key(
        grid, {"x": (0, 255), "y": (0, 127)}, bits=8
    ).collect()
    for r in got:
        nx = _py_norm(r["x"], 0, 255, 8)
        ny = _py_norm(r["y"], 0, 127, 8)
        assert r["zkey"] == _py_morton([nx, ny], 8), (r["x"], r["y"])


def test_normalize_clamps_and_is_exact(spark):
    df = spark.createDataFrame([(-5,), (0,), (100,), (999,)], ["v"])
    got = [
        r["n"]
        for r in df.select(
            Z.normalize_to_bits(F.col("v"), 0, 100, 8).alias("n")
        ).collect()
    ]
    assert got == [0, 0, 255, 255]


def test_zorder_clusters_both_dimensions(spark, grid):
    """Slicing the z-sorted relation must give per-slice extents far
    tighter than the full range in BOTH dims — the data-skipping
    property a single-column sort cannot provide."""
    keyed = Z.with_zorder_key(grid, {"x": (0, 255), "y": (0, 127)}, bits=8)
    slices = (
        keyed.groupBy(F.shiftright("zkey", 10).alias("s"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(slices) > 8
    avg_xr = sum(r["xr"] for r in slices) / len(slices)
    avg_yr = sum(r["yr"] for r in slices) / len(slices)
    assert avg_xr < 200 * 0.45 and avg_yr < 100 * 0.45, (avg_xr, avg_yr)


def test_layout_plan_is_range_partitioned_local_sort(spark, grid):
    plan = (
        Z.zorder_layout(grid, {"x": (0, 255), "y": (0, 127)}, n_files=4, bits=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    low = plan.lower()
    assert "rangepartitioning" in low
    # partition-local sort only: the Sort node's global flag (printed
    # positionally after the ordering) must be false
    assert "], false, 0" in low, plan


def test_validation(spark, grid):
    with pytest.raises(ValueError, match="exceeds 62"):
        Z.zorder_key([F.col("x"), F.col("y")], bits=32)
    with pytest.raises(ValueError, match="hi must exceed lo"):
        Z.normalize_to_bits(F.col("x"), 5, 5)
    with pytest.raises(ValueError, match="no columns"):
        Z.zorder_key([], bits=8)
