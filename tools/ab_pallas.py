#!/usr/bin/env python
"""Re-validate the Pallas/Mosaic dead-end claims on CURRENT versions
(VERDICT r4 next #10): the three hand-written kernels (pallas_hist,
pallas_hist2, pallas_groupby) were measured slower than the XLA
one-hot/segment-sum formulations in rounds 2-3 and left opt-in; compiler
versions move, so the A/B re-runs once per round and the result is a
committed artifact (AB_PALLAS.json) with a timestamp + version stamp.

If a kernel ever beats the XLA path by >1.15x here, flip the
corresponding default (exec.pallas_onehot / pallas groupby mode) —
the artifact is the trigger, not a hunch.

Runs on the session's default platform (the real TPU).  Each shape
times a jitted callable with the honest host-readback sync
(hdk_tpu.utils.benchtime conventions).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(f, *a, iters=6):
    import jax

    jax.device_get(jax.tree_util.tree_leaves(f(*a)))  # compile + drain
    t0 = time.perf_counter()
    tips = []
    for _ in range(iters):
        tips.extend(jax.tree_util.tree_leaves(f(*a)))
    jax.device_get(tips)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hdk_tpu.ops import onehot
    from hdk_tpu.ops import pallas_groupby as pg
    from hdk_tpu.ops import pallas_hist as ph
    from hdk_tpu.ops import pallas_hist2 as ph2

    N = 10_000_000
    rng = np.random.default_rng(7)
    out = {
        "rows": N,
        "jax_version": jax.__version__,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "generated_unix": int(time.time()),
        "results": [],
    }

    for E in (512, 2816, 4096):
        gid = jnp.asarray(rng.integers(0, E, N).astype(np.int32))
        ones = jnp.ones((N,), jnp.bool_)
        vi = jnp.asarray(rng.integers(-10**9, 10**9, N).astype(np.int32))
        rec = {"n_entries": E}

        # count + i32 sum: XLA one-hot contraction vs pallas_hist VMEM
        f_xla = jax.jit(lambda g, o, v, E=E: onehot.seg_sums([o, v], g, E))
        rec["xla_onehot_ms"] = round(timed(f_xla, gid, ones, vi) * 1e3, 2)
        slots = jnp.stack([ones.astype(jnp.float32)] + [
            ((vi >> (8 * k)) & 255).astype(jnp.float32) if k < 3
            else (vi >> 24).astype(jnp.float32) for k in range(4)], axis=1)
        if ph.supported(E, 5, N):
            try:
                f_pl = jax.jit(lambda g, s, E=E: ph.seg_sums_exact(g, s, E))
                rec["pallas_hist_ms"] = round(timed(f_pl, gid, slots) * 1e3,
                                              2)
            except Exception as e:  # Mosaic rejections count as dead
                rec["pallas_hist_error"] = f"{type(e).__name__}: {e}"[:200]

        # pure count histogram: XLA segment-sum vs pallas_hist2
        f_cx = jax.jit(lambda g, E=E: jax.ops.segment_sum(
            jnp.ones_like(g, jnp.int32), g, num_segments=E))
        rec["xla_count_ms"] = round(timed(f_cx, gid) * 1e3, 2)
        if ph2.supported(E):
            try:
                f_c2 = jax.jit(lambda g, E=E: ph2.count_hist(g, E))
                rec["pallas_hist2_ms"] = round(timed(f_c2, gid) * 1e3, 2)
            except Exception as e:
                rec["pallas_hist2_error"] = f"{type(e).__name__}: {e}"[:200]

        # multi-slot f32 sums: XLA vs pallas_groupby (both variants)
        vf = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
        f_sx = jax.jit(lambda g, v, E=E: onehot.seg_sums(
            [v[:, j] for j in range(4)], g, E))
        rec["xla_sums4_ms"] = round(timed(f_sx, gid, vf) * 1e3, 2)
        if pg.supported(E, 4, N):
            try:
                f_g = jax.jit(lambda g, v, E=E: pg.groupby_sums(g, v, E))
                rec["pallas_groupby_ms"] = round(timed(f_g, gid, vf) * 1e3,
                                                 2)
            except Exception as e:
                rec["pallas_groupby_error"] = f"{type(e).__name__}: {e}"[:200]
        if pg.supported2(E, 4):
            try:
                f_g2 = jax.jit(lambda g, v, E=E: pg.groupby_sums2(g, v, E))
                rec["pallas_groupby2_ms"] = round(
                    timed(f_g2, gid, vf) * 1e3, 2)
            except Exception as e:
                rec["pallas_groupby2_error"] = (
                    f"{type(e).__name__}: {e}"[:200])
        out["results"].append(rec)
        print(json.dumps(rec), flush=True)

    # verdict: any pallas kernel >1.15x faster than its XLA baseline?
    flips = []
    for rec in out["results"]:
        for pk, xk in (("pallas_hist_ms", "xla_onehot_ms"),
                       ("pallas_hist2_ms", "xla_count_ms"),
                       ("pallas_groupby_ms", "xla_sums4_ms"),
                       ("pallas_groupby2_ms", "xla_sums4_ms")):
            if pk in rec and rec[pk] * 1.15 < rec[xk]:
                flips.append({"n_entries": rec["n_entries"], "kernel": pk,
                              "pallas_ms": rec[pk], "xla_ms": rec[xk]})
    out["pallas_wins"] = flips
    out["verdict"] = ("FLIP candidate — see pallas_wins" if flips else
                      "XLA formulations remain faster; kernels stay opt-in")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_PALLAS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"verdict": out["verdict"],
                      "pallas_wins": flips}))


if __name__ == "__main__":
    main()
