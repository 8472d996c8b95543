"""Pallas group-by kernel (interpret mode on CPU; compiled path
validated on TPU — see ops/pallas_groupby.py)."""

import numpy as np
import pytest

import hdk_tpu  # noqa: F401
import jax.numpy as jnp

from hdk_tpu.ops.pallas_groupby import groupby_sums, supported


def test_onehot_matmul_groupby_interpret(rng):
    n, e = 4096, 50
    gid = rng.integers(0, e, n).astype(np.int32)
    gid[::11] = e + 3  # dead rows discard
    vals = rng.normal(size=(n, 2)).astype(np.float32)
    out = np.asarray(groupby_sums(jnp.asarray(gid), jnp.asarray(vals), e,
                                  interpret=True))
    exp = np.zeros((e, 2), np.float32)
    for g in range(e):
        exp[g] = vals[gid == g].sum(0)
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-3)


def test_supported_bounds():
    assert supported(1024, 3, 1_000_000)
    assert not supported(1 << 20, 3, 1_000_000)  # VMEM infeasible


def test_engine_routes_count_groupby_through_kernel(rng):
    """Engine-level: mid-size-E COUNT group-by uses the one-hot-matmul
    kernel (interpret mode on CPU) and matches pandas exactly."""
    import pandas as pd
    import hdk_tpu
    from harness import assert_frames_match

    session = hdk_tpu.HDK(**{"exec.interpret_pallas": True, "exec.prefer_pallas_groupby": True})
    n = 30000
    df = pd.DataFrame({
        "a": rng.integers(0, 40, n).astype(np.int64),
        "b": rng.integers(0, 60, n).astype(np.int64),
        "v": rng.normal(size=n),
    })
    df.loc[rng.random(n) < 0.1, "v"] = np.nan
    ht = session.import_pandas(df, name="plk")
    # 40*61ish entries > DENSE_SCATTER_LIMIT -> kernel window
    from hdk_tpu.exec.executor import Executor
    seen = {}
    orig = Executor._pallas_groupby_mode
    def spy(self, node, layout, nrows):
        out = orig(self, node, layout, nrows)
        seen["mode"] = out
        return out
    Executor._pallas_groupby_mode = spy
    try:
        res = ht.agg(["a", "b"], "count", "count(v)").run().to_pandas()
    finally:
        Executor._pallas_groupby_mode = orig
    assert seen.get("mode") == "interpret"
    exp = (df.groupby(["a", "b"])
           .agg(count=("a", "size"), v_count=("v", "count")).reset_index())
    exp["v_count"] = exp["v_count"].astype(np.int64)
    assert_frames_match(res, exp)


def test_kernel_fused_with_sort(rng):
    import pandas as pd
    import hdk_tpu
    from harness import assert_frames_match

    session = hdk_tpu.HDK(**{"exec.interpret_pallas": True, "exec.prefer_pallas_groupby": True})
    n = 20000
    df = pd.DataFrame({
        "a": rng.integers(0, 30, n).astype(np.int64),
        "b": rng.integers(0, 50, n).astype(np.int64),
    })
    ht = session.import_pandas(df, name="plk2")
    res = (ht.agg(["a", "b"], "count")
           .sort(("count", "desc"), "a", "b", limit=12).run().to_pandas())
    exp = (df.groupby(["a", "b"]).size().reset_index(name="count")
           .sort_values(["count", "a", "b"], ascending=[False, True, True],
                        kind="stable").head(12).reset_index(drop=True))
    assert_frames_match(res, exp, ordered=True)
