"""Scale micro-bench for the session-12 operators (BENCH/BASELINE.md
"Session-12 operators at scale"). Run on a quiet host:

    python tools/bench_ops8.py [sf_dir]

Times the TPC-H-shape additions over the sf0.1 lineitem plus the
quality-filter family; prints one JSON line per op and a summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from zhtml_ray.pipelines import ops_queries as oq
    from zhtml_ray.pipelines import queries as q

    ops = [
        ("q7_nation_volume", lambda: q.q7_nation_volume(sf)),
        ("q8_market_share", lambda: q.q8_market_share(sf)),
        ("q9_nation_margin", lambda: q.q9_nation_margin(sf)),
        ("q10_returned_items", lambda: q.q10_returned_items(sf)),
        ("q11_important_parts", lambda: q.q11_important_parts(sf)),
        ("q12_late_shipments", lambda: q.q12_late_shipments(sf)),
        ("q15_top_supplier", lambda: q.q15_top_supplier(sf)),
        ("q16_supplier_counts", lambda: q.q16_supplier_counts(sf)),
        ("q17_small_quantity_revenue",
         lambda: q.q17_small_quantity_revenue(sf)),
        ("q18_large_orders", lambda: q.q18_large_orders(sf)),
        ("q19_disjunctive_revenue",
         lambda: q.q19_disjunctive_revenue(sf)),
        ("q20_promo_suppliers", lambda: q.q20_promo_suppliers(sf)),
        ("q21_single_blame", lambda: q.q21_single_blame(sf)),
        ("q22_idle_balance", lambda: q.q22_idle_balance(sf)),
        ("q2_min_cost_supplier", lambda: q.q2_min_cost_supplier(sf)),
        ("q6_forecast_revenue", lambda: q.q6_forecast_revenue(sf)),
        ("gopher_rules", lambda: oq.q_gopher_rules(sf).count()),
        ("dsir_select", lambda: oq.q_dsir_select(sf).count()),
        ("train_val_split", lambda: oq.q_train_val_split(sf).count()),
        ("word_dropout", lambda: oq.q_word_dropout(sf).count()),
        ("user_churn", lambda: oq.q_user_churn(sf).count()),
        ("events_anomaly", lambda: oq.q_events_anomaly(sf).count()),
        ("ann_topk_filtered", lambda: oq.q_ann_topk_filtered(sf)),
        ("web_pipeline", lambda: oq.web_pipeline_ds(sf).count()),
    ]
    results = {}
    for name, fn in ops:
        t0 = time.perf_counter()
        out = fn()
        n = out if isinstance(out, int) else len(out)
        wall = round(time.perf_counter() - t0, 2)
        results[name] = wall
        print(json.dumps({"op": name, "wall_s": wall, "rows": n}))
    print(json.dumps({"sf_dir": sf, "total_s": round(sum(results.values()), 1),
                      "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
