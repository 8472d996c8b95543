#!/usr/bin/env python
"""A/B: partitioned group-by sort vs the two-sort path (VERDICT r3 #4).

The high-NDV group-by's hot path is two full-width `lax.sort` calls
(payload sort + compaction sort), measured AT the bitonic-network
roofline (NOTES.md).  The proposed ~2x lever: range-partition rows into
P buckets, then vmapped per-partition sorts — a bitonic network of
length n/P costs log2(n/P)(log2(n/P)+1)/2 stages instead of
log2(n)(log2(n)+1)/2, a ~1.9x stage reduction at n=1e8, P=128.

But partitioning must PHYSICALLY MOVE rows (keys + payload) into bucket
order, and on v5e every data movement primitive that isn't `lax.sort`
is the bottleneck this engine routes around (NOTES: gathers 1.3-2.2 s
per 1e8 rows regardless of pattern; scatters similar).  This harness
measures each component on the real chip, in ONE process so the
tunnel-state comparison is fair:

  A  = full-width payload sort               (today's unit)
  B1 = vmapped (P, n/P) payload sorts        (the theoretical win)
  B2 = one permutation gather of key+payload (the unavoidable move)

Route B >= B2 + B1 (+ rank machinery the gather bound ignores).
Verdict: B wins only if B1 + B2 < A.  Writes AB_PARTITION_SORT.json.

Reference semantics preserved either way: GroupByRuntime.cpp:25-182.
"""

from __future__ import annotations

import json
import os
import sys
import time

N = int(os.environ.get("AB_ROWS", "100000000"))
P = 128


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import hdk_tpu  # noqa: F401  (x64 + platform config)
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(41)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, N // 2, N).astype(np.int64)))
    pay = jax.device_put(jnp.asarray(np.arange(N, dtype=np.int32)))
    perm_np = rng.permutation(N).astype(np.int32)
    perm = jax.device_put(jnp.asarray(perm_np))

    def timeit(f, *a, reps=4):
        out = f(*a)
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        t0 = time.perf_counter()
        outs = [f(*a) for _ in range(reps)]
        np.asarray(jax.device_get(jnp.stack(
            [jax.tree_util.tree_leaves(o)[0].ravel()[0] for o in outs])))
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def full_sort(k, p):
        return jax.lax.sort((k, p), num_keys=1)

    n_part = N // P

    @jax.jit
    def vmapped_sort(k, p):
        k2 = k.reshape(P, n_part)
        p2 = p.reshape(P, n_part)
        return jax.lax.sort((k2, p2), dimension=1, num_keys=1)

    @jax.jit
    def move(k, p, pm):
        return k[pm], p[pm]

    res = {
        "rows": N,
        "partitions": P,
        "A_full_payload_sort_s": timeit(full_sort, keys, pay),
        "B1_vmapped_partition_sorts_s": timeit(vmapped_sort, keys, pay),
        "B2_permutation_move_s": timeit(move, keys, pay, perm),
    }
    res["B_lower_bound_s"] = (res["B1_vmapped_partition_sorts_s"]
                              + res["B2_permutation_move_s"])
    res["speedup_vs_A"] = round(
        res["A_full_payload_sort_s"] / res["B_lower_bound_s"], 3)
    res["verdict"] = (
        "partition route wins" if res["B_lower_bound_s"]
        < res["A_full_payload_sort_s"] else
        "partition route LOSES: the row move alone erases the "
        "shorter-network win; two-sort path stays")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_PARTITION_SORT.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
