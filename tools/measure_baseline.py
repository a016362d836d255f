"""Measure the DuckDB single-node baseline for the headline queries.

Runs each headline query's oracle SQL in DuckDB against the parquet
tables at the given sf dir (best of N timed runs after a warm run) and
writes BASELINE_DUCKDB.json at the repo root:

    {"sf": 0.1, "threads": 32, "queries": {name: sec, ...}}

bench.py reads this file (when the sf matches) and emits per-query
`vs_baseline` ratios so every round has a fixed denominator. Re-run
this script to refresh the baseline after hardware or testdata changes:

    python tools/measure_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_timed = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "2"))

    from bench import HEADLINE
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (buffer pool, plan cache)
        best = float("inf")
        for _ in range(n_timed):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "threads": os.cpu_count() or 8,
        "engine": f"duckdb {duckdb.__version__}",
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_DUCKDB.json") if "tools" in os.path.dirname(
                            os.path.abspath(__file__)) else "BASELINE_DUCKDB.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
