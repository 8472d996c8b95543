#!/usr/bin/env python
"""TPC-H Q3 diagnosis: per-run wall time + jit-build deltas + plan
variant + EXPLAIN ANALYZE step breakdown (VERDICT r4 next #2).

    python tools/q3_analyze.py [--scale 1.0] [--runs 8] [--no-analyze]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--no-analyze", action="store_true")
    args = ap.parse_args()

    import jax

    import bench_suite
    import hdk_tpu
    from hdk_tpu.utils import benchtime

    hdk = hdk_tpu.HDK()
    ex = hdk._executor

    # reuse the suite's data generator + query
    import numpy as np

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

    Q3 = ("SELECT l_orderkey, "
          "SUM(l_extendedprice * (1 - l_discount)) AS revenue, "
          "o_orderdate, o_shippriority "
          "FROM customer3, orders3, lineitem3 "
          "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
          "AND l_orderkey = o_orderkey "
          "AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' "
          "AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00' "
          "GROUP BY l_orderkey, o_orderdate, o_shippriority "
          "ORDER BY revenue DESC, o_orderdate LIMIT 10")

    def run():
        return hdk.sql(Q3)

    for i in range(args.runs):
        b0 = ex.code_cache.misses
        t0 = time.perf_counter()
        r = run()
        jax.device_get(benchtime._tips(r))
        secs = time.perf_counter() - t0
        fb = ex._plan_feedback
        sigs = {v for (s, v) in fb._fb._t}
        print(f"run {i}: {secs:.3f}s  builds+{ex.code_cache.misses - b0} "
              f"measured_variants={sorted(sigs)} "
              f"ndv_sample={ex._ndv_sample_seconds:.2f}s", flush=True)
    if not args.no_analyze:
        print("\n=== EXPLAIN ANALYZE ===", flush=True)
        print(hdk.explain(Q3, analyze=True), flush=True)


if __name__ == "__main__":
    main()
