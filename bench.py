"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with a noop-format write
(count() would let Catalyst prune computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q10_returned_items",
    "top_customers_per_segment",
    "kg_pg_elements",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "text_stats",
    "embedding_topk",
    "events_tumbling_5m",
    "events_sessionize",
    "events_asof_last_error",
    "dedup_components",
    "kg_degrees",
    # round-2 additions: the heavier new join shapes + corpus-prep ops
    "q8_market_share",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "doc_split_counts",
    "doc_quality_filter",
    "doc_pii_redaction",
    "doc_context_windows",
    "doc_repetition_stats",
    "doc_decontamination",
    "doc_tfidf_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from knetminer_etl_spark.queries import QUERIES
    from knetminer_etl_spark.runtime import get_session

    spark = get_session(
        app_name="knetminer-etl-spark-bench",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state methodology (cold cost stays visible as warmup_sec):
    # * warm PER QUERY, immediately before its timed run — the JVM codegen
    #   cache holds ~100 generated classes, so warming the whole suite
    #   first evicts early queries' classes and random queries then pay
    #   recompilation in the timed pass (observed 20s+ roaming spikes);
    # * warm at the SAME scale factor — AQE picks different physical
    #   operators per data size, which would leave the timed operators
    #   uncompiled;
    # * TWO warm rounds by default — round 1 compiles the codegen classes
    #   (30-60s for the hash-heavy plans), round 2 lets HotSpot C2 tier
    #   them (third executions measured 4-6x faster than second on the
    #   aggregation-heavy plans).
    import gc

    n_warm = int(os.environ.get("SPARK_GRAFT_WARMUPS", "2"))
    # best-of-N timed runs: single-shot numbers on a shared host wander
    # 2-5x from CPU contention/GC; the minimum is the reproducible figure
    n_timed = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "2"))

    timings: dict[str, float] = {}
    warmup_sec = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        for _ in range(n_warm):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warmup_sec += time.perf_counter() - t0
        # release dropped DataFrames so the ContextCleaner unpersists
        # accumulated localCheckpoint blocks between measurements
        gc.collect()
        best = float("inf")
        for _ in range(n_timed):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            gc.collect()
        timings[name] = round(best, 3)
    warmup_sec = round(warmup_sec, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warmup_sec": warmup_sec,
        "sf": sf_val,
    }

    # per-query ratio vs the recorded DuckDB single-node baseline
    # (tools/measure_baseline.py writes BASELINE_DUCKDB.json; ratios are
    # only emitted when the baseline was measured at the same sf)
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_DUCKDB.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        if base.get("sf") == sf_val:
            ratios = {
                n: round(timings[n] / base["queries"][n], 2)
                for n in timings
                if base["queries"].get(n)
            }
            out["vs_baseline"] = ratios
            out["baseline_engine"] = base.get("engine")
            out["baseline_total"] = base.get("total")
            out["vs_baseline_total"] = round(total / base["total"], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
