#!/usr/bin/env python
"""Distributed scaling benchmark: 1 -> N virtual devices.

BASELINE.md's north star asks for >=80% scaling efficiency on
shuffle-heavy configs (Zipf-skewed keys included).  Real multi-chip
hardware is not available in this environment (one tunneled TPU chip),
so this measures the *distributed execution paths* — two-phase shuffle
aggregation, shuffle-partitioned joins, skewed COUNT DISTINCT — over an
N-virtual-CPU-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count).

Virtual devices share host cores, so absolute efficiency saturates at
the physical core count (recorded as ``host_cores``); the numbers
validate that the collective pattern scales rather than serializes.
Each mesh size runs in a fresh subprocess (per-process XLA flags).

Writes BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_one(n_dev: int, rows: int) -> dict:
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    import hdk_tpu
    from hdk_tpu.utils.benchtime import measure

    hdk = hdk_tpu.HDK(**({"dist.enable": True, "dist.num_devices": n_dev}
                         if n_dev > 1 else {}))
    rng = np.random.default_rng(17)
    # Zipf-skewed key (hot key ~7%) + uniform payload
    zipf = np.minimum(rng.zipf(1.3, rows), 1 << 20).astype(np.int64)
    hdk.import_pydict({
        "k": rng.integers(0, rows // 2, rows),
        "z": zipf,
        "v": rng.integers(0, 1000, rows),
    }, name="sc_t")
    hdk.import_pydict({
        "k": rng.permutation(rows // 10).astype(np.int64),
        "w": rng.integers(0, 100, rows // 10),
    }, name="sc_dim")
    t = hdk.scan("sc_t")
    d = hdk.scan("sc_dim")

    out = {}
    q_agg = lambda: t.agg("k", "count", "sum(v)").run()
    out["groupby_highndv"] = measure(q_agg, warmup=1, iters=4)["throughput_s"]
    q_join = lambda: t.join(d, "k", "k").agg([], "count", "sum(w)").run()
    out["join_agg"] = measure(q_join, warmup=1, iters=4)["throughput_s"]
    q_skew = lambda: t.agg("z", "count_distinct(v)").run()
    out["skewed_count_distinct"] = measure(
        q_skew, warmup=1, iters=4)["throughput_s"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--one", type=int, default=0, help="(internal) run one size")
    args = ap.parse_args()

    if args.one:
        res = run_one(args.one, args.rows)
        print(json.dumps(res))
        return

    results = {}
    for n in args.devices:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                            + env.get("XLA_FLAGS", ""))
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n),
             "--rows", str(args.rows)],
            capture_output=True, text=True, timeout=1800, env=env)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{proc.stdout[-1000:]}{proc.stderr[-1000:]}",
                  file=sys.stderr)
            continue
        results[str(n)] = json.loads(line[-1])
        print(n, line[-1])

    base = results.get("1", {})
    efficiency = {}
    for n, qs in results.items():
        if n == "1":
            continue
        eff = {}
        for q, secs in qs.items():
            if q in base and secs > 0:
                eff[q] = round(base[q] / secs / int(n), 3)
        efficiency[n] = eff
    rec = {
        "rows": args.rows,
        "host_cores": os.cpu_count(),
        "note": ("virtual CPU devices share host cores; efficiency "
                 "saturates at host_cores devices"),
        "seconds_per_query": results,
        "scaling_efficiency_vs_1dev": efficiency,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SCALING.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({"wrote": path, "efficiency": efficiency}))


if __name__ == "__main__":
    main()
