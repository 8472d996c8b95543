#!/usr/bin/env python
"""Q3 stage costing: warm pipelined timings of Q3 sub-plans + both plan
variants (rewrite vs original), all in one session on the real device.

    python tools/q3_stages.py [--scale 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    import numpy as np

    import hdk_tpu
    from hdk_tpu.utils import benchtime

    hdk = hdk_tpu.HDK(**{"exec.enable_route_feedback": False})
    n_cust = int(1_500_000 * args.scale)
    n_ord = int(15_000_000 * args.scale)
    n_li = int(60_000_000 * args.scale)
    rng = np.random.default_rng(23)
    seg = np.asarray(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                      "MACHINERY"])
    base = np.int64(694224000)
    year7 = 7 * 365 * 86400
    ts = hdk_tpu.types
    hdk.import_pydict({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_mktsegment": seg[rng.integers(0, 5, n_cust)],
    }, name="customer3")
    hdk.import_pydict({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderdate": base + rng.integers(0, year7, n_ord),
        "o_shippriority": rng.integers(0, 3, n_ord).astype(np.int8),
    }, name="orders3", schema={
        "o_orderdate": ts.timestamp(ts.TimeUnit.SECOND, False)})
    hdk.import_pydict({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_extendedprice": rng.gamma(3.0, 12000.0, n_li).astype(np.float32),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2
                               ).astype(np.float32),
        "l_shipdate": base + rng.integers(0, year7, n_li),
    }, name="lineitem3", schema={
        "l_shipdate": ts.timestamp(ts.TimeUnit.SECOND, False)})

    DATE = "TIMESTAMP '1995-03-15 00:00:00'"
    stages = {
        # the pre-aggregate alone (root materialization pays the trim)
        "preagg": ("SELECT l_orderkey, "
                   "SUM(l_extendedprice * (1 - l_discount)) AS r "
                   f"FROM lineitem3 WHERE l_shipdate > {DATE} "
                   "GROUP BY l_orderkey"),
        # dimension join alone
        "ord_cust": ("SELECT COUNT(*), MAX(o_orderdate) FROM customer3, "
                     "orders3 WHERE c_mktsegment = 'BUILDING' "
                     "AND c_custkey = o_custkey "
                     f"AND o_orderdate < {DATE}"),
        # full Q3
        "q3": ("SELECT l_orderkey, "
               "SUM(l_extendedprice * (1 - l_discount)) AS revenue, "
               "o_orderdate, o_shippriority "
               "FROM customer3, orders3, lineitem3 "
               "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
               "AND l_orderkey = o_orderkey "
               f"AND o_orderdate < {DATE} AND l_shipdate > {DATE} "
               "GROUP BY l_orderkey, o_orderdate, o_shippriority "
               "ORDER BY revenue DESC, o_orderdate LIMIT 10"),
    }

    def timed(sql, label):
        fn = lambda: hdk.sql(sql)
        m = benchtime.measure(fn, warmup=2, iters=4, latency_iters=1)
        print(f"{label}: warm {m['throughput_s']:.3f}s", flush=True)
        return m["throughput_s"]

    for label, sql in stages.items():
        timed(sql, label)

    # original (no-rewrite) variant
    hdk.config.exec.enable_eager_aggregation = False
    timed(stages["q3"], "q3_original_plan")


if __name__ == "__main__":
    main()
