"""Oracle-comparison harness mirroring the driver's check:
row-count + schema (column names) + order-insensitive values."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        # tz-aware → UTC-naive so Spark LTZ and DuckDB naive compare equal
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[col] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            df[col] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_dtype_discipline(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    """The driver's value hash is representation-sensitive: bigint 1085 on the
    Spark side vs HUGEINT→float64 1085.0 on the DuckDB side hash differently
    even though the values are equal (tpch_q12_like, round 5).  Flag any
    column whose dtype *kind* is integer on one side and float on the other
    while neither side carries a null (nulls legitimately coerce pandas ints
    to float on both sides, so those are exempt)."""
    for col in spark_pdf.columns:
        if col not in oracle_pdf.columns:
            continue
        a, b = spark_pdf[col], oracle_pdf[col]
        kinds = {a.dtype.kind, b.dtype.kind}
        if kinds in ({"i", "f"}, {"u", "f"}) and not (a.isna().any() or b.isna().any()):
            raise AssertionError(
                f"{name}.{col}: dtype kind mismatch spark={a.dtype} oracle={b.dtype} "
                f"with no nulls — the driver hash will diverge on equal values; "
                f"CAST the oracle expression (or alias the Spark side) so both are "
                f"the same numeric family"
            )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert_dtype_discipline(spark_pdf, oracle_pdf, name)
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av_f = av.astype(float).to_numpy()
            bv_f = bv.astype(float).to_numpy()
            both_nan = np.isnan(av_f) & np.isnan(bv_f)
            eq = (av_f == bv_f) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:5]
                raise AssertionError(
                    f"{name}.{col}: {len(np.flatnonzero(~eq))} value diffs, first rows "
                    f"{[(i, av_f[i], bv_f[i]) for i in bad]}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:5]
                raise AssertionError(
                    f"{name}.{col}: {int((~eq).sum())} value diffs, first rows "
                    f"{[(i, av.iloc[i], bv.iloc[i]) for i in bad]}"
                )
