"""Local replica of the driver's Spark-vs-DuckDB differential check:
row-count + column names + order-insensitive exact value comparison
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # lists/arrays are unsortable/unhashable; canonicalize to tuples
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    a, b = _canonical(spark_pdf), _canonical(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av_f = av.astype("float64").to_numpy()
            bv_f = bv.astype("float64").to_numpy()
            both_nan = np.isnan(av_f) & np.isnan(bv_f)
            eq = (av_f == bv_f) | both_nan
            if not eq.all():
                i = int(np.argmax(~eq))
                raise AssertionError(
                    f"{name}.{c}: float mismatch at row {i}: "
                    f"spark={av_f[i]!r} oracle={bv_f[i]!r} (exact compare)"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                raise AssertionError(
                    f"{name}.{c}: mismatch at row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
