"""Excel workbook source.

Reference behavior re-expressed (``/root/reference/importador.py``):
intake validation (:10-28 — exists, .xlsx, copy to landing dir),
sheet enumeration (:33-34), preview (:39), single-sheet read into a
driver DataFrame (:47) handed to Spark (etl_process.py:203).

Engine posture:
- xlsx is driver-bound by nature (zip container, no splittable
  row-groups). The engine reads it driver-side with openpyxl/pandas
  and immediately crosses into a Spark DataFrame **with a declared
  schema** over Arrow — no double inference.
- At 100 TB scale the answer is not a better xlsx reader: it is
  ``convert_to_parquet`` at the ingestion edge, after which every
  downstream stage gets splittable, pushdown-capable scans. The
  landing-dir model maps to a Structured Streaming file source for
  continuous ingest (see streaming/).

Reading does NOT require openpyxl: when it (or pandas.read_excel's
engine) is absent, the pure-stdlib OOXML parser in ``xlsx_stdlib``
(zipfile + ElementTree; shared strings, inline strings, date-style
serial decoding) serves the same entry points, so the whole
xlsx -> Spark path runs in codec-less environments too.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import xlsx_stdlib


def _have_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def validate_intake(path: str, landing_dir: str) -> str:
    """File intake: path exists, .xlsx extension, copy into the landing
    directory (importador.py:10-28 semantics). Returns the landed path."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"arquivo não encontrado: {path}")
    if not path.lower().endswith(".xlsx"):
        raise ValueError(f"extensão inválida (esperado .xlsx): {path}")
    os.makedirs(landing_dir, exist_ok=True)
    dest = os.path.join(landing_dir, os.path.basename(path))
    shutil.copy2(path, dest)
    return dest


def sheet_names(path: str) -> list[str]:
    """Workbook sheet enumeration (importador.py:33-34)."""
    if _have_openpyxl():
        import pandas as pd

        return pd.ExcelFile(path).sheet_names
    return xlsx_stdlib.sheet_names(path)


def read_workbook(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """One sheet -> Spark DataFrame. Declared schema strongly
    recommended; without it the pandas dtypes are converted via Arrow
    (still a single inference, not the reference's double one)."""
    import pandas as pd

    if _have_openpyxl():
        pdf = pd.read_excel(path, sheet_name=sheet)
    else:
        headers, rows = xlsx_stdlib.read_rows(path, sheet)
        pdf = pd.DataFrame(rows, columns=headers)
    if schema is not None:
        # pandas promotes null-bearing int columns to float64 (empty
        # cells become NaN, values become 7.0); a declared integer
        # field must receive int/None, not float/nan, or
        # createDataFrame rejects the column. datetime64 columns stay
        # native (NaT is already understood).
        int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        for field in schema.fields:
            c = field.name
            if c not in pdf.columns or pd.api.types.is_datetime64_any_dtype(
                pdf[c]
            ):
                continue
            if isinstance(field.dataType, int_types):
                # explicit object dtype: a plain map() re-coerces a
                # None/int mix straight back to float64+nan
                pdf[c] = pd.Series(
                    [None if pd.isna(v) else int(v) for v in pdf[c]],
                    dtype=object,
                    index=pdf.index,
                )
            elif pdf[c].isna().any():
                pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def preview(spark: SparkSession, path: str, n: int = 5) -> dict[str, list]:
    """First n rows of every sheet (importador.py:33-42)."""
    if _have_openpyxl():
        import pandas as pd

        xl = pd.ExcelFile(path)
        return {s: xl.parse(s).head(n).to_dict("records") for s in xl.sheet_names}
    return xlsx_stdlib.preview_rows(path, n)


def convert_to_parquet(
    spark: SparkSession, xlsx_path: str, out_dir: str, sheet: str | int = 0
) -> str:
    """Edge conversion: xlsx -> parquet, the scale path. Downstream
    reads become splittable columnar scans with pushdown."""
    df = read_workbook(spark, xlsx_path, sheet)
    out = os.path.join(out_dir, os.path.splitext(os.path.basename(xlsx_path))[0])
    df.write.mode("overwrite").parquet(out)
    return out
