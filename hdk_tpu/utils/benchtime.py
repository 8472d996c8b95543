"""Honest query timing under asynchronous dispatch.

jax dispatch is async, and on remote-tunneled device platforms even
``block_until_ready`` can return before queued work executes (observed
on the dev TPU tunnel: a 10M-row sort "blocked" in 0.1 ms until a host
readback flushed the queue).  The only trustworthy completion signal is
a host readback of (a slice of) every result buffer.

Two measurements matter and this module reports both:

  * ``latency``  — one query, fully synced: enqueue + execute + one
    host round-trip.  What an interactive user sees.
  * ``throughput`` — N back-to-back queries, one batched sync at the
    end.  The device executes a single in-order stream, so the final
    readback bounds every enqueued program; the per-query time
    amortizes the host round-trip that latency double-counts.  What a
    serving deployment sustains.

Reference role: the reference's benchmarks (taxi_reduced_bench.cpp)
time synchronous executions on a local device; on a remote TPU the
pipelined form is the faithful analog of its steady-state numbers.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax


def _tips(result) -> list:
    """One-element slices of every buffer behind ``result``; reading
    them back forces every producing program to completion."""
    out = []
    table = getattr(result, "_table", None)
    if table is None:  # raw array or pytree
        return [x[-1:] if hasattr(x, "shape") and x.shape and x.shape[0]
                else x for x in jax.tree_util.tree_leaves(result)]
    for c in table.columns:
        out.append(c.data[-1:] if c.data.shape[0] else c.data)
        if c.mask is not None and c.mask.shape[0]:
            out.append(c.mask[-1:])
    if table.row_mask is not None and table.row_mask.shape[0]:
        out.append(table.row_mask[-1:])
    return out


def measure(fn: Callable, warmup: int = 2, iters: int = 8,
            latency_iters: int = 5) -> Dict[str, float]:
    """Time ``fn`` (a no-arg callable returning a QueryResult or jax
    pytree).  Returns {"latency_s", "throughput_s"} — per-query seconds.
    """
    for _ in range(max(warmup, 1)):  # compile + drain the queue
        jax.device_get(_tips(fn()))

    lat = []
    for _ in range(latency_iters):
        t0 = time.perf_counter()
        jax.device_get(_tips(fn()))
        lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    tips = []
    for _ in range(iters):
        tips.extend(_tips(fn()))
    jax.device_get(tips)
    thr = (time.perf_counter() - t0) / iters

    lat.sort()
    return {"latency_s": lat[len(lat) // 2], "throughput_s": thr}
