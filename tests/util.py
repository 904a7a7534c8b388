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
    a, b = canon(to_df(ray_res)), canon(oracle_df)
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    assert list(a.columns) == list(b.columns), f"{name}: cols {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                a[c].astype(float), b[c].astype(float), check_names=False,
                rtol=1e-12, atol=1e-12, obj=f"{name}.{c}")
        else:
            av, bv = a[c], b[c]
            if av.dtype != bv.dtype:
                av, bv = av.astype(object), bv.astype(object)
            pd.testing.assert_series_equal(
                av, bv, check_names=False, check_dtype=False, obj=f"{name}.{c}")
