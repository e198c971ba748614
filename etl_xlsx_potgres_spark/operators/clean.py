"""Cleaning operators — the reference's pandas/UDF cleans re-expressed
as native Catalyst expressions (SURVEY.md §2 rows 5-12).

Everything here is a JVM-side builtin expression: no Python UDFs, so
the whole clean stage stays inside WholeStageCodegen and scales
linearly with no serde cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_header(name: str) -> str:
    """One header: strip, spaces→``_``, drop ``.``, ``/``→``_``.

    Same surgery as the reference's list comprehension
    (``/root/reference/etl_process.py:197``).
    """
    return name.strip().replace(" ", "_").replace(".", "").replace("/", "_")


def normalize_headers(df: DataFrame) -> DataFrame:
    """Rename every column via :func:`normalize_header` (§2 row 5)."""
    return df.toDF(*[normalize_header(c) for c in df.columns])


def digits_only(c: Column | str) -> Column:
    """Strip all non-digits (CPF/CNPJ clean,
    ``/root/reference/etl_process.py:10-11``) — native ``regexp_replace``
    instead of a per-row Python ``re.sub``."""
    return F.regexp_replace(_c(c), r"\D", "")


def phone_normalize(c: Column | str) -> Column:
    """Drop ``+``/``-`` and strip surrounding whitespace
    (``/root/reference/etl_process.py:14-15``) — ``translate`` + a
    regexp edge-strip, no UDF. Python's ``str.strip()`` removes ALL
    whitespace (tabs, CR...), while SQL ``trim`` removes only spaces —
    the regexp keeps reference fidelity (found by property testing)."""
    return F.regexp_replace(
        F.translate(_c(c), "+-", ""), r"^\s+|\s+$", ""
    )


def stringify_legacy(c: Column | str) -> Column:
    """Replicate the reference's ``str(float_col)`` quirk
    (``etl_process.py:15`` applied to a float64 pandas column):
    ``NaN`` → the literal string ``"nan"`` and floats keep a ``.0``
    suffix (``5581003960829.0``). Provided for fidelity tests; the
    engine's honest path reads phones as strings and never does this.
    """
    col = _c(c)
    return F.when(col.isNull(), F.lit("nan")).otherwise(
        col.cast("decimal(20,1)").cast("string")
    )


def parse_date(c: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """``to_date`` with explicit pattern (§2 row 10,
    ``/root/reference/etl_process.py:207-208``)."""
    return F.to_date(_c(c), fmt)


def conditional_cast(c: Column | str, dtype: str) -> Column:
    """``when(isNotNull, cast)`` with no ``otherwise`` — semantically a
    plain null-preserving cast (§2 row 11,
    ``/root/reference/etl_process.py:209``); we keep the plain cast."""
    return _c(c).cast(dtype)


def with_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """NULL→default fill per column (§2 row 12,
    ``/root/reference/etl_process.py:210-211``) via ``coalesce``."""
    return df.withColumns(
        {name: F.coalesce(F.col(name), F.lit(v)) for name, v in defaults.items()}
    )
