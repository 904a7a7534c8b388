"""Result comparison mirroring the driver's check: row count + schema +
order-insensitive value equality under sorted-by-name columns."""

from __future__ import annotations

import pandas as pd


def to_df(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(ray_res, oracle_df: pd.DataFrame, name: str = "") -> None:
    """Mirror the driver's value-hash check: the driver's hash is dtype-
    sensitive for numeric columns (round-1 lesson: int64 vs HUGEINT->float64
    flipped 14 hashes on bit-identical values), so numeric columns must match
    dtype EXACTLY and floats must be bit-equal, not approximately equal."""
    a, b = canon(to_df(ray_res)), canon(oracle_df)
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    assert list(a.columns) == list(b.columns), f"{name}: cols {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in "if" or bv.dtype.kind in "if":
            assert av.dtype == bv.dtype, (
                f"{name}.{c}: dtype {av.dtype} != oracle {bv.dtype} "
                "(driver hash is dtype-sensitive)")
            pd.testing.assert_series_equal(
                av, bv, check_names=False, rtol=0, atol=0, obj=f"{name}.{c}")
        else:
            if av.dtype != bv.dtype:
                av, bv = av.astype(object), bv.astype(object)
            pd.testing.assert_series_equal(
                av, bv, check_names=False, check_dtype=False, obj=f"{name}.{c}")
