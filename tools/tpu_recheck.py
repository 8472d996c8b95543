#!/usr/bin/env python
"""One-shot TPU re-measurement after engine changes (or a tunnel
outage): runs each config in its own subprocess (long sessions degrade
tunnel dispatches) and prints a compact report.

    python tools/tpu_recheck.py [--full]

Steps: kernel micro A/B (XLA factored one-hot vs Pallas VMEM kernel),
taxi headline bench, north-star suite (scale 1.0 with --full, else
0.1), and writes nothing unless the subordinate tools do.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, timeout=3600, env=None):
    print(f"\n=== {' '.join(args)} ===", flush=True)
    try:
        proc = subprocess.run(args, cwd=ROOT, text=True,
                              capture_output=True, timeout=timeout,
                              env=env or dict(os.environ))
    except subprocess.TimeoutExpired as e:
        print(f"TIMED OUT after {timeout}s — continuing with the next "
              f"step (partial output below)", flush=True)
        partial = e.stdout or ""
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        for line in partial.splitlines()[-20:]:
            print(line, flush=True)
        return -1
    out = (proc.stdout or "") + (proc.stderr or "")
    for line in out.splitlines():
        if line.strip() and not line.lstrip().startswith("WARNING:"):
            print(line, flush=True)
    if proc.returncode != 0:
        print(f"EXIT CODE {proc.returncode}", flush=True)
    return proc.returncode


MICRO = r'''
import time, numpy as np, sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from hdk_tpu.ops import onehot
from hdk_tpu.ops import pallas_hist as ph

N = 10_000_000
rng = np.random.default_rng(7)

def timed(name, f, *a, iters=6):
    jax.device_get(jax.tree_util.tree_leaves(f(*a)))
    t0 = time.perf_counter()
    tips = []
    for _ in range(iters):
        tips.extend(jax.tree_util.tree_leaves(f(*a)))
    jax.device_get(tips)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)

for E in (512, 2816, 4096):
    gid = jnp.asarray(rng.integers(0, E, N).astype(np.int32))
    ones = jnp.ones((N,), jnp.bool_)
    vi = jnp.asarray(rng.integers(-10**9, 10**9, N).astype(np.int32))
    f_xla = jax.jit(lambda g, o, v, E=E: onehot.seg_sums([o, v], g, E))
    timed(f"XLA onehot count+i32sum E={E}", f_xla, gid, ones, vi)
    slots = jnp.stack([ones.astype(jnp.float32)] + [
        ((vi >> (8 * k)) & 255).astype(jnp.float32) if k < 3
        else (vi >> 24).astype(jnp.float32) for k in range(4)], axis=1)
    f_pl = jax.jit(lambda g, s, E=E: ph.seg_sums_exact(g, s, E))
    try:
        timed(f"Pallas hist (5 slots) E={E}", f_pl, gid, slots)
    except Exception as e:
        print(f"Pallas E={E} FAILED: {type(e).__name__}: {e}", flush=True)
'''


def main() -> None:
    full = "--full" in sys.argv
    run([sys.executable, "-c", MICRO], timeout=1200)
    run([sys.executable, "bench.py"], timeout=1800)
    scale = "1.0" if full else "0.1"
    run([sys.executable, "bench_suite.py", "--scale", scale], timeout=5400)


if __name__ == "__main__":
    main()
