"""Validate-and-split quarantine channel (SURVEY.md §2 rows 21/23,
§4 item 3).

The reference isolates bad rows with per-row SAVEPOINT/ROLLBACK and a
Python reject list (``/root/reference/etl_process.py:103-129``). The
declarative equivalent: derive an ``erro`` column from an ordered
rule chain, split the frame, write the quarantine side to its own
sink. No transactions, no driver loop — both sides are plain
DataFrames, so the validation runs fully distributed and the "reject
list" can itself be 100 TB."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "erro"


def error_column(rules: list[tuple[str, Column]]) -> Column:
    """First-failing-rule error reason; NULL when every rule passes.

    ``rules``: ordered ``(message, ok_condition)`` — mirrors the
    reference's first-exception-wins semantics. Conditions evaluate
    under SQL three-valued logic, and a rule counts as FAILED unless
    it is strictly TRUE: a NULL-infected condition (e.g. ``col > 0``
    on a NULL value) quarantines the row, matching the reference's
    per-row exception isolation (a None there raised and rejected).
    """
    expr = F.lit(None).cast("string")
    for msg, ok in reversed(rules):
        expr = F.when(ok.isNull() | ~ok, F.lit(msg)).otherwise(expr)
    return expr


def validate_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(valid, quarantine)``; quarantine carries ``erro``."""
    tagged = df.withColumn(ERROR_COL, error_column(rules))
    valid = tagged.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    quarantine = tagged.filter(F.col(ERROR_COL).isNotNull())
    return valid, quarantine
