"""Differential-test helpers: compare engine results against pandas.

Role of the reference's SQLiteComparator (Tests/ArrowSQLRunner/
SQLiteComparator.h:45): every query result is checked against an
independent implementation on the same data.
"""

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical row order + plain dtypes for order-insensitive compare."""
    df = df.copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(object)
        # unify NaN/None
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    if len(df) > 1:
        df = df.sort_values(list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame,
                        ordered: bool = False, approx_cols=()):
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: {list(actual.columns)} vs {list(expected.columns)}")
    if not ordered:
        actual = canon(actual)
        expected = canon(expected)
    else:
        actual = actual.reset_index(drop=True)
        expected = expected.reset_index(drop=True)
    assert len(actual) == len(expected), (
        f"row count {len(actual)} != {len(expected)}\n{actual}\n--\n{expected}")
    for c in actual.columns:
        a = actual[c]
        e = expected[c]
        a_na = pd.isna(a).to_numpy()
        e_na = pd.isna(e).to_numpy()
        assert (a_na == e_na).all(), f"null mismatch in {c}:\n{actual}\n--\n{expected}"
        av = a[~a_na].to_numpy()
        ev = e[~e_na].to_numpy()
        if c in approx_cols or av.dtype.kind == "f" or (
                len(ev) and ev.dtype.kind == "f"):
            np.testing.assert_allclose(
                av.astype(np.float64), ev.astype(np.float64),
                rtol=1e-9, atol=1e-9, err_msg=f"column {c}")
        else:
            assert (av == ev).all(), (
                f"value mismatch in {c}:\n{actual}\n--\n{expected}")


def run_df(query_node, **opts) -> pd.DataFrame:
    return query_node.run(**opts).to_pandas()
