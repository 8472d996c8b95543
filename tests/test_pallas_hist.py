"""Factored VMEM-one-hot histogram kernel (ops/pallas_hist.py) —
interpret-mode validation on CPU; the real-TPU A/B lives in the bench
notes (reference semantics: GroupByRuntime.cpp:199-213)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hdk_tpu.ops import onehot, pallas_hist as ph


@pytest.fixture(autouse=True)
def _pallas_interpret():
    onehot.configure(pallas=True, interpret=True)
    yield
    onehot.configure(pallas=False, interpret=False)


def test_kernel_exact_counts_and_sums():
    rng = np.random.default_rng(3)
    N, E = 30_000, 1000
    gid = rng.integers(-3, E + 3, N).astype(np.int32)
    vals = np.stack([np.ones(N), rng.integers(0, 256, N)], 1).astype(np.float32)
    out = np.asarray(ph.seg_sums_exact(
        jnp.asarray(gid), jnp.asarray(vals), E, interpret=True))
    want = np.zeros((2, E), np.int64)
    live = (gid >= 0) & (gid < E)
    for l in range(2):
        np.add.at(want[l], gid[live], vals[live, l].astype(np.int64))
    assert np.array_equal(out.astype(np.int64), want)


def test_onehot_backend_matches_xla():
    rng = np.random.default_rng(4)
    N, E = 20_000, 640
    gid = jnp.asarray(rng.integers(0, E, N).astype(np.int32))
    col_i64 = jnp.asarray(rng.integers(-10**12, 10**12, N))
    col_bool = jnp.asarray(rng.random(N) < 0.5)
    got = onehot.seg_sums([col_i64, col_bool], gid, E)
    onehot.configure(pallas=False)
    want = onehot.seg_sums([col_i64, col_bool], gid, E)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_engine_session_flag():
    import hdk_tpu

    hdk = hdk_tpu.HDK(**{"exec.pallas_onehot": True,
                         "exec.interpret_pallas": True})
    ht = hdk.import_pydict({
        "g": list(range(700)) * 20,
        "v": list(range(14000)),
    }, name="ph_t")
    res = ht.agg("g", "count", "sum(v)").run().to_pandas()
    import pandas as pd

    df = pd.DataFrame({"g": list(range(700)) * 20, "v": list(range(14000))})
    exp = df.groupby("g").agg(count=("g", "size"),
                              v_sum=("v", "sum")).reset_index()
    from harness import assert_frames_match

    assert_frames_match(res, exp)


def test_pallas_hist2_count_interpret(rng):
    """VMEM-one-hot count histogram (ops/pallas_hist2.py): bit-exact in
    interpret mode across regimes (flat, factored, out-of-range gids).
    On real TPU it compiles and is correct but measured compute-bound at
    ~30 ms/1e7 rows vs the XLA 2-operand contraction's ~21 ms, so it
    stays opt-in (module docstring has the measurements)."""
    import numpy as np
    from hdk_tpu.ops import pallas_hist2 as ph2

    for n in (100, 1504, 2381):
        N = 200_000
        gid = rng.integers(0, n + 5, N).astype(np.int32)
        r = np.asarray(ph2.count_hist(gid, n, interpret=True))
        exp = np.bincount(gid[gid < n], minlength=n)
        assert np.array_equal(r, exp), n
