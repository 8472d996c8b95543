"""Measured-feedback route tuning (exec/feedback.py, the P3 autotune
seam): near the one-hot/sort tier boundary the executor explores both
group-by routes with synced timing, then repeats the measured winner."""

import numpy as np
import pytest

import hdk_tpu
from hdk_tpu.exec.feedback import RouteFeedback


def test_choose_explores_then_exploits():
    fb = RouteFeedback()
    r1, m1 = fb.choose("sig", ["a", "b"])
    assert (r1, m1) == ("a", True)
    fb.record("sig", "a", 0.5)
    r2, m2 = fb.choose("sig", ["a", "b"])
    assert (r2, m2) == ("b", True)
    fb.record("sig", "b", 0.1)
    r3, m3 = fb.choose("sig", ["a", "b"])
    assert (r3, m3) == ("b", False)
    # ewma shifts the winner back if it degrades
    for _ in range(20):
        fb.record("sig", "b", 2.0)
    assert fb.choose("sig", ["a", "b"])[0] == "a"


def test_groupby_routes_explored_and_settled(rng):
    """A perfect-layout group-by in the tunable window runs 'perfect'
    then 'sort' on the first two repetitions (measured), then settles."""
    hdk = hdk_tpu.HDK()
    n = 1 << 17
    t = hdk.import_pydict({
        "k": rng.integers(0, 1000, n),   # entries ~1000: in (512, 4096]
        "v": rng.integers(0, 50, n),
    }, name="fb_t")
    fb = hdk._executor._feedback
    import pandas as pd

    exp = (pd.DataFrame({"k": np.asarray(t.run().to_pandas()["k"]),
                         "v": np.asarray(t.run().to_pandas()["v"])})
           .groupby("k").agg(count=("k", "size"), v_sum=("v", "sum"))
           .reset_index())
    results = []
    for _ in range(3):
        got = (t.agg("k", "count", "sum(v)").run().to_pandas()
               .sort_values("k").reset_index(drop=True))
        results.append(got)
    sigs = {g for (g, _r) in fb._t.keys()}
    assert len(sigs) == 1
    measured = fb.measured(next(iter(sigs)))
    assert set(measured) == {"perfect", "sort"}  # both explored
    for got in results:  # every route produced identical exact results
        assert got["count"].tolist() == exp["count"].tolist()
        assert got["v_sum"].tolist() == exp["v_sum"].tolist()


def test_feedback_disabled(rng):
    hdk = hdk_tpu.HDK(**{"exec.enable_route_feedback": False})
    n = 1 << 17
    t = hdk.import_pydict({"k": rng.integers(0, 1000, n)}, name="fb_off")
    for _ in range(2):
        t.agg("k", "count").run()
    assert hdk._executor._feedback._t == {}
