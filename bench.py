"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is executed to completion with the noop sink (full plan runs,
nothing collected to the driver). Timings are wall-clock per query,
min over $SPARK_GRAFT_BENCH_RUNS (default 3) measured runs: the host is
a shared VM whose noisy-neighbor stalls showed 5-15 s one-off spikes on
otherwise sub-second queries, so a single sample measures the host, not
the engine. Min-of-N reports steady-state query cost; the JSON carries
"runs" so rounds remain comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hielo_spark.queries import QUERIES  # noqa: E402
from hielo_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q7_nation_volume",
    "q10_returned_customers",
    "filter_orders_multi",
    "events_hourly_windows",
    "events_user_gaps",
    "events_recent_windows",
    "events_asof_join",
    "events_sessionization",
    "first_order_per_customer",
    "meta_health",
    "meta_snapshot_timeline",
    "doc_lang_stats",
    "doc_curation_pipeline",
    "doc_neardup_minhash",
    "emb_neardup_cosine",
    "emb_cosine_topk",
]
# Note: doc_neardup_jaccard (the exact all-pairs reference form of near-dup
# dedup) stays in queries() for the correctness gate but not in HEADLINE:
# MinHash+LSH is the path you'd run at scale — benching the O(pairs) exact
# form would measure the oracle crutch, not the engine.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="hielo_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every headline query once at the smallest scale factor.
    # Whole-stage codegen caches by generated source, so the sf0.1 runs hit
    # compiled code; this also spawns the Python worker pool (first
    # pandas_udf otherwise pays ~10s of worker startup at local[32]).
    # Measured numbers then reflect steady-state query cost, not JIT.
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()  # drop per-query persisted frames
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
