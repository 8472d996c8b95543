"""Sampling NDV estimator (reference: CardinalityEstimator.h:59
NDVEstimator): unbounded keys get right-sized group buffers from a
Chao84 sample estimate instead of default_max_groups, compiling ONCE."""

import numpy as np
import pytest

import hdk_tpu


@pytest.fixture()
def hdk():
    # estimator-contract tests run below the production min-rows gate
    # (the gate exists to spare small inputs the per-query sample pull;
    # test_small_input_skips_sampling covers the gate itself)
    return hdk_tpu.HDK(**{"exec.group_by.ndv_sample_min_rows": 1 << 20})


def test_small_input_skips_sampling(rng):
    """Below ndv_sample_min_rows no sample is pulled (cap == nrows is
    harmless there and the host readback would break warm pipelining);
    results and single-compile behavior are unchanged."""
    h = hdk_tpu.HDK()  # default gate (1 << 23)
    n = 1_200_000
    ids = rng.integers(0, 30_000, n).astype(np.int64) * 48_271 + 11
    t = h.import_pydict({"k": ids}, name="ndv_gate")
    res = t.agg("k", "count").run().to_pandas()
    ex = h._executor
    assert ex._ndv_estimate is None
    assert ex._ndv_sample_seconds == 0.0
    assert ex._groupby_attempts == 1
    assert res.shape[0] == len(np.unique(ids))


def test_unbounded_key_sizes_from_estimate(hdk, rng):
    """Hashed-id keys (range ~2^60, NDV ~20K over 3M rows): the
    estimator must bound the cap near the true NDV and the group-by
    must compile exactly once (no widen-retry)."""
    n = 3_000_000
    ids = rng.integers(0, 20_000, n).astype(np.int64) * 61_803_398_875 + 7
    t = hdk.import_pydict({"k": ids, "v": rng.integers(0, 9, n)},
                          name="ndv_t")
    res = t.agg("k", "count", "sum(v)").run().to_pandas()
    ex = hdk._executor
    assert ex._ndv_estimate is not None
    true_ndv = len(np.unique(ids))
    assert res.shape[0] == true_ndv
    # estimate within 2x of truth, cap well under default_max_groups
    assert true_ndv / 2 <= ex._ndv_estimate <= true_ndv * 2
    assert ex._groupby_attempts == 1


def test_underestimate_still_correct(hdk, rng):
    """A sample that underestimates (heavy skew hides the tail) only
    costs a retry — results stay exact."""
    n = 2_000_000
    # 99% of rows on 10 keys; 100K distinct tail keys (hard to sample)
    hot = rng.integers(0, 10, n)
    tail = rng.integers(10, 2_000_000, n)
    k = np.where(rng.random(n) < 0.99, hot, tail).astype(np.int64)
    k = k * 2_654_435_761  # spread the range so static bounds give up
    t = hdk.import_pydict({"k": k}, name="ndv_sk")
    res = t.agg("k", "count").run().to_pandas()
    assert res.shape[0] == len(np.unique(k))
    assert int(res["count"].sum()) == n


def test_estimator_disabled(rng):
    h = hdk_tpu.HDK(**{"exec.group_by.ndv_sample_size": 0})
    n = 1_100_000
    ids = rng.integers(0, 5_000, n).astype(np.int64) * 7_777_777_777
    t = h.import_pydict({"k": ids}, name="ndv_off")
    res = t.agg("k", "count").run().to_pandas()
    assert h._executor._ndv_estimate is None
    assert res.shape[0] == len(np.unique(ids))


def test_expression_key_estimates(hdk, rng):
    """Keys that are EXPRESSIONS (through a Project) estimate too
    (VERDICT r3 missing #5): the sample replays the chain and evaluates
    the key expr, so a hashed projection compiles once."""
    n = 1_500_000
    base = rng.integers(0, 15_000, n).astype(np.int64)
    t = hdk.import_pydict({"k": base, "v": rng.integers(0, 9, n)},
                          name="ndv_ex")
    q = t.proj(h=t["k"] * 2_654_435_761 + 17, v=t["v"])
    res = q.agg("h", "count", "sum(v)").run().to_pandas()
    ex = hdk._executor
    true_ndv = len(np.unique(base))
    assert ex._ndv_estimate is not None
    assert true_ndv / 2 <= ex._ndv_estimate <= true_ndv * 2
    assert ex._groupby_attempts == 1
    assert res.shape[0] == true_ndv


def test_extract_epoch_key_estimates(hdk, rng):
    """GROUP BY extract(epoch ...) — a datetime key expr with no static
    range — sizes its buffer from the sample (one compile)."""
    import hdk_tpu.types as tt

    n = 1_200_000
    secs = np.int64(1_356_998_400) + rng.integers(0, 5_000, n) * 3600
    t = hdk.import_pydict(
        {"ts": secs, "v": rng.integers(0, 9, n)}, name="ndv_ep",
        schema={"ts": tt.timestamp(tt.TimeUnit.SECOND, False)})
    res = t.agg([t["ts"].extract("epoch").name("e")], "count"
                ).run().to_pandas()
    ex = hdk._executor
    true_ndv = len(np.unique(secs))
    assert ex._ndv_estimate is not None
    assert ex._groupby_attempts == 1
    assert res.shape[0] == true_ndv
