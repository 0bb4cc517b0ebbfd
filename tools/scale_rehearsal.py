"""Scale rehearsal: run the expensive + formerly-perf-weak query set at
sf0.1 AND sf1 (tools/gen_scale.py corpus), Spark vs DuckDB on identical
oracle SQL, and print one JSON document per scale factor.

Purpose (round-5 directive #4): the watchlist queries' >2x ratios at
sf0.1 were attributed to Spark's fixed multi-stage overhead at toy
scale; this measures whether each ratio SHRINKS as data grows (overhead
amortizes — the claim holds) or GROWS (a real plan problem). Results are
summarized in SCALE.md.

Usage: python tools/scale_rehearsal.py [out.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from trialstreamer_spark.plans.all_queries import ORACLES, QUERIES
from trialstreamer_spark.session import get_spark

#: the heaviest queries from the round-5 bench plus every perf-weak /
#: watchlist entry from the round-5 verdict, plus the new postings query
SCALE_SET = (
    "concept_match_greedy",
    "minhash_band_tuning",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "pagerank_dup_graph",
    "dup_cluster_size_histogram",
    "dedup_token_savings",
    "knn_graph_topk",
    "knn_label_consistency",
    "small_qty_revenue",
    "late_shipment_priority",
    "source_distinctive_tokens",
    "dsir_importance_weights",
    "winnowing_overlap_pairs",
    "sketch_merge_parity",
    "ann_nprobe_recall_curve",
    "oov_rate_stats",
    "linear_probe_distinct",
    "bloom_decontaminate_stats",
    "near_dup_source_matrix",
    "minhash_jaccard_estimate",
    "postings_term_search",
    # round-6b additions: the new decision-support plan shapes (their
    # sf0.1 ratios are fixed-overhead-dominated; this measures whether
    # they converge at sf1 like the rest of the watchlist) and the two
    # non-trivial new pipeline audits
    "sole_late_supplier",
    "large_volume_orders",
    "returned_item_topk",
    "cross_region_volume",
    "nation_market_share",
    "product_profit_by_nation",
    "cheapest_supplier_per_part",
    "high_value_parts",
    "part_supplier_variety",
    "disjunctive_bracket_revenue",
    "discount_revenue_forecast",
    "rolling_active_users",
    "tokenizer_fertility_stats",
    # round-6c additions: engagement/anomaly audits, the exact
    # distributed median, the dup-graph health pair (both ride the new
    # persisted candidate-pair sidecar), and the Q20-shaped semi-join
    "dau_wau_stickiness",
    "event_rate_anomaly",
    "event_interarrival_dispersion",
    "orders_above_customer_avg",
    "mktsegment_yearly_share",
    "median_order_value_by_nation",
    "triangle_count_dup_graph",
    "simhash_hamming_histogram",
    "stopword_coverage_by_lang",
    "excess_shipped_parts",
    "label_source_affinity",
)

#: stop re-running an engine's query once a single run exceeds this
SLOW_CUTOFF_S = 90.0


def best_of(f, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        if dt > SLOW_CUTOFF_S:
            break
    return best


def rehearse(spark, sf_dir: str) -> dict:
    from trialstreamer_spark.io import prepare_buckets, warm_cache
    from trialstreamer_spark.operators.dedup import prepare_dedup
    from trialstreamer_spark.operators.quality import prepare_curation
    from trialstreamer_spark.operators.retrieval import prepare_stats
    from trialstreamer_spark.operators.similarity import prepare_indexes

    t0 = time.perf_counter()
    for prep in (warm_cache, prepare_buckets, prepare_indexes,
                 prepare_dedup, prepare_stats, prepare_curation):
        prep(spark, sf_dir)
    prep_s = time.perf_counter() - t0

    con = duckdb.connect()
    # Bound DuckDB's out-of-core spill: at sf1 one oracle (greedy
    # dictionary NER) writes >80 GB of temp and fills the filesystem.
    # A capped spill turns that into a clean per-query failure we
    # RECORD (DuckDB cannot finish at this scale on this disk budget)
    # instead of a crash that kills the whole rehearsal.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='40GB'")
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(path))[0]
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    out: dict = {"sf_dir": sf_dir, "prepare_s": round(prep_s, 2), "queries": {}}
    for name in SCALE_SET:
        row: dict = {}
        try:
            QUERIES[name](spark, sf_dir).count()  # warm (codegen/cache)
            row["spark_s"] = round(
                best_of(lambda: QUERIES[name](spark, sf_dir).count()), 3
            )
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            row["spark_error"] = repr(e)[:200]
        try:
            row["duckdb_s"] = round(
                best_of(lambda: con.execute(ORACLES[name]).fetchall()), 3
            )
        except Exception as e:  # noqa: BLE001
            row["duckdb_error"] = repr(e)[:200]
        if "spark_s" in row and row.get("duckdb_s"):
            row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
        out["queries"][name] = row
        print(f"{os.path.basename(sf_dir):6s} {name:32s} "
              f"spark={row.get('spark_s', 'FAIL'):>7} "
              f"duckdb={row.get('duckdb_s', 'FAIL'):>7} "
              f"ratio={row.get('ratio', '-'):>6}",
              flush=True)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scale_rehearsal.json"
    spark = get_spark("scale-rehearsal")
    results = [
        rehearse(spark, "/root/testdata/sf0.1"),
        rehearse(spark, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scale_data", "sf1")),
    ]
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
