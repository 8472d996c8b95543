#!/usr/bin/env python
"""Extended benchmark suite: the BASELINE.json configs beyond taxi Q1-Q4.

  join:    trips ⋈ payments hash join on int64 key (100M ⋈ 10M default)
  groupby: high-cardinality group-by (50M distinct keys) + sort
  tpch:    TPC-H-subset Q1/Q6 shapes (lineitem-like synthetic data)

Each config reports rows/s (probe side for the join).  Results append to
BENCH_SUITE.json.  ``--scale 0.1`` shrinks all row counts 10x for smoke
runs.  The headline driver metric stays in bench.py; this file exists so
the full north-star configs are measured and tracked.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def bench_query(fn, iters=3, warmup=1):
    """Pipelined throughput timing (hdk_tpu.utils.benchtime: a host
    readback is the only trustworthy completion signal on the tunneled
    dev TPU; the batched final sync amortizes its round-trip)."""
    from hdk_tpu.utils.benchtime import measure as timed

    m = timed(fn, warmup=max(warmup, 1), iters=max(iters, 3))
    return float(m["throughput_s"])


def bench_join(hdk, scale: float):
    n_probe = int(100_000_000 * scale)
    n_build = int(10_000_000 * scale)
    rng = np.random.default_rng(11)
    hdk.import_pydict({
        "k": rng.integers(0, n_build, n_probe),
        "amt": rng.gamma(2.0, 10.0, n_probe).astype(np.float32),
    }, name="trips_j")
    hdk.import_pydict({
        "k": rng.permutation(n_build),
        "fee": rng.gamma(1.0, 2.0, n_build).astype(np.float32),
    }, name="payments_j")
    t = hdk.scan("trips_j")
    p = hdk.scan("payments_j")

    def q():
        return t.join(p, "k", "k").agg([], "count", "sum(fee)").run()

    secs = bench_query(q)
    return {"config": f"join {n_probe}x{n_build} int64 key",
            "seconds": secs, "rows_per_sec": n_probe / secs}


def bench_high_ndv(hdk, scale: float):
    n = int(100_000_000 * scale)
    ndv = int(50_000_000 * scale)
    rng = np.random.default_rng(12)
    hdk.import_pydict({
        "k": rng.integers(0, ndv, n),
        "v": rng.integers(0, 1000, n),
    }, name="ndv_t")
    t = hdk.scan("ndv_t")

    def q():
        return t.agg("k", "count", "sum(v)").run()

    secs = bench_query(q)

    def q_sorted():
        return t.agg("k", "count").sort(("count", "desc"), limit=100).run()

    secs2 = bench_query(q_sorted)
    return [
        {"config": f"groupby {n} rows ~{ndv} distinct keys",
         "seconds": secs, "rows_per_sec": n / secs},
        {"config": f"groupby+top100 {n} rows ~{ndv} keys",
         "seconds": secs2, "rows_per_sec": n / secs2},
    ]


def gen_lineitem(hdk, rows: int):
    rng = np.random.default_rng(13)
    year_secs = 365 * 86400
    ship = np.int64(694224000) + rng.integers(0, 7 * year_secs, rows)
    hdk.import_pydict({
        "l_quantity": rng.integers(1, 51, rows).astype(np.int8),
        "l_extendedprice": (rng.gamma(3.0, 12000.0, rows)).astype(np.float64),
        "l_discount": np.round(rng.uniform(0.0, 0.1, rows), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, rows), 2),
        "l_returnflag": rng.integers(0, 3, rows).astype(np.int8),
        "l_linestatus": rng.integers(0, 2, rows).astype(np.int8),
        "l_shipdate": ship,
    }, name="lineitem",
        schema={"l_shipdate": __import__("hdk_tpu").types.timestamp(
            __import__("hdk_tpu").types.TimeUnit.SECOND, False)})
    return rows


def bench_tpch(hdk, scale: float):
    rows = int(60_000_000 * scale)  # ~SF10-scale lineitem per unit scale
    gen_lineitem(hdk, rows)
    out = []

    # Q1 shape: big multi-agg group-by with a date filter
    def q1():
        return hdk.sql(
            "SELECT l_returnflag, l_linestatus, SUM(l_quantity), "
            "SUM(l_extendedprice), "
            "SUM(l_extendedprice * (1 - l_discount)), "
            "SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), "
            "AVG(l_quantity), AVG(l_extendedprice), AVG(l_discount), "
            "COUNT(*) FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus")

    secs = bench_query(q1)
    out.append({"config": f"tpch_q1 {rows} rows", "seconds": secs,
                "rows_per_sec": rows / secs})

    # Q6 shape: selective filter + global agg
    def q6():
        return hdk.sql(
            "SELECT SUM(l_extendedprice * l_discount) FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")

    secs = bench_query(q6)
    out.append({"config": f"tpch_q6 {rows} rows", "seconds": secs,
                "rows_per_sec": rows / secs})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1,
                    help="row-count multiplier vs the north-star configs")
    ap.add_argument("--only", choices=["join", "groupby", "tpch"])
    args = ap.parse_args()

    if args.only is None:
        # one process per config: long sessions over the TPU tunnel
        # degrade later dispatches (measured 1000x distortion), so each
        # config gets a fresh process and the results are merged
        import subprocess
        import sys as _sys

        results = []
        for only in ("join", "groupby", "tpch"):
            proc = subprocess.run(
                [_sys.executable, os.path.abspath(__file__),
                 "--scale", str(args.scale), "--only", only],
                capture_output=True, text=True, timeout=3600)
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    results.append(json.loads(line))
                    print(line)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_SUITE.json")
        with open(path, "w") as f:
            json.dump({"scale": args.scale, "results": results}, f, indent=2)
        return

    import hdk_tpu

    hdk = hdk_tpu.HDK()
    results = []
    if args.only == "join":
        results.append(bench_join(hdk, args.scale))
    elif args.only == "groupby":
        results.extend(bench_high_ndv(hdk, args.scale))
    elif args.only == "tpch":
        results.extend(bench_tpch(hdk, args.scale))

    for r in results:
        r["Mrows_per_sec"] = round(r.pop("rows_per_sec") / 1e6, 2)
        r["seconds"] = round(r["seconds"], 4)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
