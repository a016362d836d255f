"""Record the DuckDB single-node baseline for the headline queries.

Runs each headline query's oracle SQL in DuckDB against the parquet
tables at the given sf dir (warm run + best of N) and writes
BASELINE_DUCKDB.json at the repo root:

    {"sf": 0.1, "threads": 32, "queries": {name: sec, ...}}

bench.py measures the baseline LIVE in the same run by default (see
bench.measure_duckdb_baseline); this recorded file is only the fallback
for environments without duckdb. Re-run after hardware or testdata
changes:

    python tools/measure_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_timed = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "2"))

    from bench import HEADLINE, measure_duckdb_baseline

    base = measure_duckdb_baseline(sf_dir, HEADLINE, n_timed)
    if base is None:
        raise SystemExit("duckdb unavailable or no oracle timings collected")
    for name, sec in base["queries"].items():
        print(f"{name}: {sec}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "threads": os.cpu_count() or 8,
        "engine": base["engine"].replace(" (live)", ""),
        "queries": base["queries"],
        "total": base["total"],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_DUCKDB.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
