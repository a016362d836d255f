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
    # round-3 additions: sketches, training layout, PQ, the composed
    # corpus pipeline (the flagship multi-stage flow)
    "doc_pipeline_stages",
    "doc_heavy_hitters",
    "doc_token_cms",
    "events_distinct_hll",
    "doc_shard_manifest",
    "doc_temperature_mix",
    "embedding_pq_topk",
    "doc_lm_scores",
    "orders_bloom_pruned",
    # round-4 additions: semantic (embedding-cluster) dedup and
    # substring-span scrub
    "embedding_semantic_dedup",
    "doc_span_scrub",
]


_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def measure_duckdb_baseline(
    sf_dir: str, names: list[str], n_timed: int = 2
) -> dict | None:
    """Time each headline query's oracle SQL in DuckDB on THIS machine,
    right now (warm run + best-of-N). Measuring the baseline in the same
    process/run as the Spark timings keeps the vs_baseline ratio
    meaningful on a loaded shared host — a baseline recorded on an idle
    machine makes every ratio look worse by the load factor."""
    try:
        import duckdb
    except ImportError:
        return None
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            con.execute(sql).fetchall()  # warm (buffer pool, plan cache)
            best = float("inf")
            for _ in range(n_timed):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — skip, don't kill the bench
            print(f"baseline {name} failed: {exc}", file=sys.stderr)
    if not timings:
        return None
    return {
        "engine": f"duckdb {duckdb.__version__} (live)",
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }


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
            # dead localCheckpoint/shuffle blocks are reclaimed by the
            # EXPLICIT System.gc() the harness runs between reps (outside
            # every timed window); the periodic timer stays only as a
            # long-stop backstop — at 45s its stop-the-world full GCs
            # landed INSIDE timed windows (measured: dedup_components
            # 4.6-6.8s with 45s periodic vs 4.0-6.6s with explicit-only,
            # and the minimum drops ~15%)
            "spark.cleaner.periodicGC.interval": "10min",
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

    # THREE warm rounds: round 1 compiles codegen classes, round 2 starts
    # HotSpot C2 tiering, and the heavy iterative queries keep improving
    # through ~rep 5 (measured: dedup_components 6.6 → 5.8 → 4.7 → 4.3 →
    # 4.0 across reps) — steady-state is what a long-running 100 TB job
    # sees, and the cold cost stays visible as warmup_sec
    n_warm = int(os.environ.get("SPARK_GRAFT_WARMUPS", "3"))
    # best-of-N timed runs: single-shot numbers on a shared host wander
    # 2-5x from CPU contention/GC; the minimum is the reproducible figure
    # (4 runs: with fewer, one GC pause during a run poisons the min —
    # observed 3x overstatement on the self-join-heavy dedup queries)
    n_timed = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "4"))

    timings: dict[str, float] = {}
    warmup_sec = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        for _ in range(n_warm):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warmup_sec += time.perf_counter() - t0
        # release accumulated localCheckpoint pins EXPLICITLY — the
        # weak-reference ContextCleaner path (gc + System.gc) is too lazy:
        # pinned blocks from 30+ earlier queries survive into later
        # measurements and late queries pay early queries' storage
        # (measured 2.7x on the sweep's last query)
        from knetminer_etl_spark.runtime.session import release_pinned_rdds

        release_pinned_rdds(spark)
        gc.collect()
        spark._jvm.System.gc()
        best = float("inf")
        for _ in range(n_timed):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_pinned_rdds(spark)
            gc.collect()
            # JVM full GC BETWEEN reps (outside the timed window) so
            # dead blocks never force a stop-the-world inside one
            spark._jvm.System.gc()
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

    # per-query ratio vs the DuckDB single-node baseline, measured LIVE on
    # this machine in the same run (so host load cancels out of the ratio);
    # falls back to the recorded BASELINE_DUCKDB.json when unavailable
    base = None
    if os.environ.get("SPARK_GRAFT_LIVE_BASELINE", "1") != "0":
        base = measure_duckdb_baseline(sf_dir, HEADLINE)
    if base is None:
        base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_DUCKDB.json")
        if os.path.exists(base_path):
            with open(base_path) as fh:
                recorded = json.load(fh)
            if recorded.get("sf") == sf_val:
                base = recorded
    if base:
        ratios = {
            n: round(timings[n] / base["queries"][n], 2)
            for n in timings
            if base["queries"].get(n)
        }
        out["vs_baseline"] = ratios
        out["baseline_engine"] = base.get("engine")
        out["baseline_total"] = base.get("total")
        out["vs_baseline_total"] = round(total / base["total"], 3)

    # full record (incl. per-query baseline ratios) goes to a FILE; the
    # stdout line stays compact — the driver's capture truncated the r4
    # line and recorded "parsed": null, losing the per-query times
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": sf_val,
        "warmup_sec": warmup_sec,
    }
    for key in ("vs_baseline_total", "baseline_total", "baseline_engine"):
        if key in out:
            compact[key] = out[key]
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
