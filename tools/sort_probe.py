"""One-shot probe for VERDICT r9 ask #5a: which weak-tail queries pay a
RangePartitioning exchange (global orderBy -> sampling job + exchange)
for a dimension-sized final frame?  Prints name, output rows at
sf0.001, and whether the physical plan contains 'rangepartitioning'.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trialstreamer_spark.plans.all_queries import QUERIES
from trialstreamer_spark.session import get_spark

WEAK = """
retention_cohorts anti_join_skiplist join_explosion_audit
histogram_quantiles salted_skew_join_totals label_source_affinity
nation_revenue_rank_shift dormant_rich_customers
weekly_value_quantile_drift set_difference top_supplier_revenue
event_type_affinity monthly_revenue_yoy session_count_histogram
returned_item_topk reorder_interval_percentiles first_touch_attribution
embedding_truncation_recall multimodal_frame_features regional_revenue
embedding_norm_outliers event_type_transitions mktsegment_yearly_share
revenue_cube_flag_status whale_revenue_share shipping_priority_topk
ship_latency_by_nation pricing_summary supplier_revenue_hhi
multimodal_decode_stats trade_flow_matrix large_volume_orders
customer_repeat_rate_yoy orders_above_customer_avg doc_prefix_dup_rate
high_value_parts small_qty_revenue rrf_fusion_topk
""".split()


def main() -> None:
    spark = get_spark()
    sf = "/root/testdata/sf0.001"
    for name in WEAK:
        try:
            df = QUERIES[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            has_range = "rangepartitioning" in plan.lower()
            n = df.count()
            print(f"{name:36s} rows={n:7d} range_sort={has_range}")
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"{name:36s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
