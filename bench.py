"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is forced with a noop-format write: unlike ``count()``,
this materializes every output column and keeps the final ORDER BY in
the physical plan (Catalyst's column pruning + EliminateSorts would
otherwise drop work under a bare count).  A warmup pass on the smallest
SF primes the JVM/codegen so we measure steady-state query time, like
the reference's repeated pytest-benchmark runs.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # TPC-H-ish relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    # operator families at scale: asof (window-shuffle), partitioned windows,
    # dynamic temporal grouping, banded-LSH dedup, vector top-k
    "join_asof_backward",
    "win_shift_cum",
    "tmp_tumbling_1h",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    # embedding-space training-pipeline ops: bucketed near-dup, IVF ANN
    "dedup_embedding_cosine",
    "sim_ivf_topk",
    # fact-dim ratio query and pre-aggregate-then-join
    "q14_promo_effect",
    "q18_large_volume",
    # round 4: the suite-completing TPC-H shapes — decorrelated min subquery,
    # 5-way join profit, left-join count distribution, EXISTS/NOT-EXISTS
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q21_suppliers_kept_waiting",
    # the reference's own benchmark corpus (h2oai db-benchmark group-by):
    # high-card string key, median+std, and the 6-key near-row-level case
    "h2o_q3",
    "h2o_q6",
    "h2o_q10",
    # round 5: quantized vector search and web-corpus curation families
    "sim_int8_topk",
    "web_domain_cap",
    # round 6: subword tokenization (distinct-word Zipf dedup), link-graph
    # PageRank (iterative Pregel), equi-bucketed inequality join
    "txt_tokenize_wordpiece",
    "web_pagerank",
    "join_band_agg",
    # round 7: true Structured Streaming run (watermark window -> memory
    # sink, availableNow) and the OLS trend aggregate
    "stream_tumbling_1h",
    "agg_linreg",
    # round 8: lexical retrieval (inverted-index BM25) and hybrid-retrieval
    # rank fusion
    "txt_bm25_topk",
    "sim_rrf_fusion",
    # round 8: linear-cost star-link near-dup clustering (the scale path
    # where all-pairs LSH candidates go quadratic in duplicate multiplicity)
    "dedup_minhash_star",
    # round 10: one 600k-row single-key ewm recurrence through the streaming
    # mapInPandas kernel — the linear-scaling evidence (the JVM prefix fold
    # would be ~3.6e11 steps at this length)
    "win_ewm_long_series",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    spark = get_spark("bench")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    names = [n for n in HEADLINE if n in QUERIES]
    # warmup: smallest SF, primes codegen + parquet footer caches
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for n in names:
            try:
                force(QUERIES[n](spark, warm_dir))
            except Exception:
                pass

    timings: dict[str, float] = {}
    for n in names:
        # best-of-2: first run pays any residual codegen/JIT for this exact
        # plan shape; the min is the steady-state number (pytest-benchmark
        # uses the same policy)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(QUERIES[n](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 4)
        spark.catalog.clearCache()  # drop caches a query may have created

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
