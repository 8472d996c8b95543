#!/usr/bin/env python
"""Ingest/compute-overlap benchmark (SURVEY §2.7 P3; VERDICT r3 #9).

Measures wall time of (import_csv + first query) with the ingest
pipeline ON (storage.prefetch_device: per-column device transfer issued
while the next column decodes, fragment stats warmed in the background)
vs OFF (sequential: decode everything, then the first query pays
transfer + stats).  Fresh subprocess per mode per repetition (tunnel
sessions degrade; CRITICAL measurement facts in NOTES.md).

Writes BENCH_INGEST.json.  Reference analog: ColumnFetcher overlaps
per-fragment fetch with kernel execution (ColumnFetcher.h:42-90,
TBB kernel pool Execute.cpp:2753).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

ROWS = int(os.environ.get("INGEST_ROWS", "10000000"))
REPS = int(os.environ.get("INGEST_REPS", "3"))


def make_csv(path: str, rows: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.csv as pacsv

    rng = np.random.default_rng(31)
    at = pa.table({
        "cab": rng.integers(0, 2, rows).astype(np.int8),
        "passengers": rng.integers(0, 9, rows).astype(np.int8),
        "amount": rng.gamma(2.0, 8.0, rows).astype(np.float32),
        "distance": rng.gamma(1.5, 2.5, rows).astype(np.float32),
        "pickup": np.int64(1356998400) + rng.integers(0, 4 * 365 * 86400,
                                                      rows),
        "vendor": np.asarray(["ACME", "BETA", "GAMMA", "DELTA"])[
            rng.integers(0, 4, rows)],
    })
    pacsv.write_csv(at, path)


def run_one(csv_path: str, prefetch: bool) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import hdk_tpu

    hdk = hdk_tpu.HDK(**{"storage.prefetch_device": prefetch})

    def import_and_query(name: str) -> float:
        t0 = time.perf_counter()
        t = hdk.import_csv(csv_path, name=name)
        res = t.agg(["cab", "vendor"], "count", "sum(amount)",
                    "min(distance)", "max(pickup)").run()
        res.to_pandas()  # full materialization = the only honest sync
        return time.perf_counter() - t0

    # warmup pass builds the jit programs (tunnel compiles are minutes
    # and vary 30x run-to-run — they would swamp the decode/transfer
    # overlap this benchmark exists to measure); the timed pass pays
    # CSV decode + dict-encode + device transfer + execution only
    import_and_query("ing_warm")
    secs = import_and_query("ing_t")
    print(json.dumps({"prefetch": prefetch, "seconds": secs}))


def bench_dict_encode() -> dict:
    """Serial vs parallel native bulk dictionary encode (VERDICT r4
    next #6; reference hot path: TBB getOrAddBulk,
    StringDictionary.h:126).  Subprocess per thread count so the env
    knob is read fresh."""
    code = r"""
import json, random, sys, time
sys.path.insert(0, %r)
from hdk_tpu.storage.native import load_native
m = load_native()
rng = random.Random(3)
uniq = [f"str_{i:06d}" for i in range(50_000)]
vals = [uniq[rng.randrange(50_000)] for _ in range(4_000_000)]
d = m.dict_new()
t0 = time.perf_counter(); m.dict_bulk_get_or_add(d, vals)
cold = time.perf_counter() - t0
warm = 1e9
for _ in range(3):
    t0 = time.perf_counter(); m.dict_bulk_get_or_add(d, vals)
    warm = min(warm, time.perf_counter() - t0)
print(json.dumps({"cold_s": cold, "warm_s": warm}))
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {"rows": 4_000_000, "unique": 50_000}
    for label, threads in (("serial", "1"), ("parallel", "0")):
        env = {**os.environ, "HDK_TPU_DICT_THREADS": threads}
        if threads == "0":
            env.pop("HDK_TPU_DICT_THREADS")
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=600,
                              env=env)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if lines:
            out[label] = json.loads(lines[-1])
    if "serial" in out and "parallel" in out:
        out["warm_speedup"] = round(
            out["serial"]["warm_s"] / out["parallel"]["warm_s"], 2)
        out["cold_speedup"] = round(
            out["serial"]["cold_s"] / out["parallel"]["cold_s"], 2)
        out["warm_Mrows_per_s"] = round(
            4.0 / out["parallel"]["warm_s"], 1)
    return out


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 1], sys.argv[i + 2] == "on")
        return
    d = tempfile.mkdtemp(prefix="hdk_ingest_")
    csv_path = os.path.join(d, "ingest.csv")
    make_csv(csv_path, ROWS)
    import jax

    out = {"rows": ROWS, "platform": jax.devices()[0].platform,
           "dict_encode": bench_dict_encode(), "on": [], "off": []}
    for _ in range(REPS):
        for mode in ("on", "off"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 csv_path, mode],
                capture_output=True, text=True, timeout=1800)
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("{")]
            if lines:
                out[mode].append(json.loads(lines[-1])["seconds"])
            else:
                print(f"mode={mode} FAILED: {proc.stdout[-500:]}"
                      f"{proc.stderr[-500:]}", file=sys.stderr)
    os.remove(csv_path)
    if out["on"] and out["off"]:
        med = lambda xs: sorted(xs)[len(xs) // 2]
        out["median_on_s"] = med(out["on"])
        out["median_off_s"] = med(out["off"])
        out["speedup_import_plus_first_query"] = round(
            out["median_off_s"] / out["median_on_s"], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_INGEST.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
