"""Reshaping operators: dimension extraction and wide→long unpivot
(SURVEY.md §2 rows 16 and 20)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_deterministic


def extract_dimension(
    df: DataFrame, key: str, payload: list[str], order_by: list | None = None
) -> DataFrame:
    """Distinct-projection dimension extraction — the reference's
    ``df[['Plano','Plano_Valor']].drop_duplicates()``
    (``/root/reference/etl_process.py:34``), but keyed on the sink's
    uniqueness column alone (sink is UNIQUE on ``descricao``,
    ``schema_database_pgsql.sql:425-426``) with a deterministic
    survivor."""
    cols = [key, *payload]
    if order_by is None:
        order_by = [F.col(c) for c in payload]
    return dedup_deterministic(df.select(*cols), [key], order_by)


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    mapping: dict[str, tuple[str, int]],
    type_col: str = "tipo",
    type_id_col: str = "tipo_id",
    value_col: str = "contato",
) -> DataFrame:
    """Wide→long unpivot with a type map — the reference's dict-driven
    contact loop (``/root/reference/etl_process.py:153-174``:
    {Telefone:1, Celular:2, E-Mail:3}), as a single ``stack``
    projection + null filter + trim. No shuffle: stack is a local
    row-generator inside codegen.

    ``mapping``: label -> (source_column, type_id).
    """
    n = len(mapping)
    parts = []
    for label, (src, tid) in mapping.items():
        parts.append(f"'{label}', {tid}, cast(`{src}` as string)")
    stack_expr = (
        f"stack({n}, {', '.join(parts)}) as ({type_col}, {type_id_col}, {value_col})"
    )
    return (
        df.selectExpr(*id_cols, stack_expr)
        .filter(F.col(value_col).isNotNull())
        .withColumn(value_col, F.trim(F.col(value_col)))
    )
