"""Distributed xlsx ingestion — a Spark 4 Python Data Source.

``sources/excel.py`` reads ONE workbook driver-side (the reference's
shape: ``/root/reference/importador.py:47`` loads one sheet into a
pandas frame). That is correct for one file and wrong for a landing
directory of thousands: the driver becomes the single reader. This
module registers an ``xlsx`` data source with Spark's Python Data
Source API (public, pyspark.sql.datasource, Spark 4.x) so a *glob* of
workbooks scans as a normal DataFrame source:

    register_xlsx_source(spark)
    df = spark.read.format("xlsx").option("sheet", "Plan1").load(dir)

Execution model:

- ``partitions()`` (driver): expand the glob, emit one
  ``InputPartition`` per (file, sheet) — each workbook parses on an
  executor, so a 10k-file intake is a 10k-task scan, not a driver
  loop. An xlsx is a zip container (not splittable), so file
  granularity is the natural partition grain.
- ``read(partition)`` (executor): parse with the pure-stdlib OOXML
  reader (``xlsx_stdlib`` — no openpyxl needed on executors) and
  yield **Arrow RecordBatches**, the vectorized path across the
  Python/JVM boundary.
- Schema: pass one explicitly (``.schema(...)``) or let ``schema()``
  infer from a SAMPLE of matched files (first ``_INFER_FILES`` files,
  ``_INFER_ROWS`` rows each; cells are already typed by the OOXML
  parser: str/int/float/bool/datetime). Columns are unioned by name
  across the sample and mixed-typed columns widen (int|float ->
  double, anything else -> string). Per-file header drift is
  tolerated: columns are matched by name, missing columns fill with
  NULL, extra columns are ignored. Inference is still a sample —
  **type coercion on unsampled files is strict**: a cell outside the
  inferred type (e.g. a non-integral float under a Long column in
  file 500) raises an executor-side ValueError naming the column
  rather than silently truncating; pass an explicit wider
  ``.schema(...)`` for heterogeneous intakes.

Scale posture: this removes the driver bottleneck for *many medium
files*; a single 100 GB workbook is still one task by format physics,
and the at-scale answer remains ``excel.convert_to_parquet`` at the
edge. Filter/column pushdown is intentionally not implemented — a
sheet must be fully parsed to see any cell, so pushdown could prune
nothing; Catalyst prunes/filters the decoded batches instead.

The WRITE side (``df.write.format("xlsx").save(dir)``) is the
symmetric ArrowWriter: one workbook per partition built executor-side
(``_XlsxWriter``), a driver manifest on commit, abort cleanup on job
failure. Same grain argument in reverse — a workbook is one zip
container, so partition-per-file is the export parallelism.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from . import xlsx_stdlib

_DEFAULT_BATCH_ROWS = 8192
_INFER_ROWS = 500
_INFER_FILES = 4


def _expand_paths(path_opt: str) -> list[str]:
    """Comma-separated paths; each may be a dir (-> *.xlsx inside) or
    a glob. Deterministic (sorted) order."""
    out: list[str] = []
    for raw in path_opt.split(","):
        p = raw.strip()
        if not p:
            continue
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "*.xlsx"))))
        elif glob.has_magic(p):
            out.extend(sorted(glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no xlsx files match {path_opt!r}")
    return out


def _infer_field(name: str, values: list) -> T.StructField:
    """Spark type from the OOXML parser's python cell types. bool is
    checked before int (bool subclasses int); int|float mixes widen to
    double; any string (or an untypeable mix) degrades to string."""
    seen = {type(v) for v in values if v is not None}
    if not seen:
        dtype: T.DataType = T.StringType()
    elif seen == {bool}:
        dtype = T.BooleanType()
    elif seen <= {bool, int}:
        dtype = T.LongType()
    elif seen <= {bool, int, float}:
        dtype = T.DoubleType()
    elif seen == {dt.datetime}:
        dtype = T.TimestampType()
    else:
        dtype = T.StringType()
    return T.StructField(name, dtype, nullable=True)


def _coerce(value, dtype: T.DataType, col: str):
    """One parsed cell -> declared Spark type. Strict where lossy
    (a non-integral float under an integer column is an error, not a
    truncation); stringly where safe."""
    if value is None:
        return None
    if isinstance(dtype, T.BooleanType):
        if isinstance(value, bool):
            return value
        raise ValueError(f"column {col!r}: {value!r} is not a boolean")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        if isinstance(value, bool):
            return int(value)
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        raise ValueError(f"column {col!r}: {value!r} is not an integer")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        if isinstance(value, bool):
            raise ValueError(f"column {col!r}: {value!r} is not numeric")
        if isinstance(value, (int, float)):
            return float(value)
        raise ValueError(f"column {col!r}: {value!r} is not numeric")
    if isinstance(dtype, T.TimestampType):
        if isinstance(value, dt.datetime):
            return value
        if isinstance(value, dt.date):
            return dt.datetime(value.year, value.month, value.day)
        raise ValueError(f"column {col!r}: {value!r} is not a timestamp")
    if isinstance(dtype, T.DateType):
        if isinstance(value, dt.datetime):
            return value.date()
        if isinstance(value, dt.date):
            return value
        raise ValueError(f"column {col!r}: {value!r} is not a date")
    if isinstance(dtype, T.StringType):
        if isinstance(value, bool):
            return "true" if value else "false"
        return str(value)
    raise TypeError(f"column {col!r}: unsupported xlsx source type {dtype}")


def _pa_type(dtype: T.DataType):
    import pyarrow as pa

    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.LongType):
        return pa.int64()
    if isinstance(dtype, T.IntegerType):
        return pa.int32()
    if isinstance(dtype, T.ShortType):
        return pa.int16()
    if isinstance(dtype, T.ByteType):
        return pa.int8()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.FloatType):
        return pa.float32()
    if isinstance(dtype, T.TimestampType):
        return pa.timestamp("us")
    if isinstance(dtype, T.DateType):
        return pa.date32()
    if isinstance(dtype, T.StringType):
        return pa.string()
    raise TypeError(f"unsupported xlsx source type {dtype}")


class _XlsxReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._schema = schema
        self._path = options.get("path") or options.get("paths")
        if not self._path:
            raise ValueError("xlsx source requires a path: .load(<dir|glob>)")
        self._sheet = options.get("sheet", "0")
        self._batch_rows = int(options.get("batchrows", _DEFAULT_BATCH_ROWS))

    def partitions(self) -> list[InputPartition]:
        files = _expand_paths(self._path)
        if self._sheet == "*":
            return [
                InputPartition((f, s))
                for f in files
                for s in xlsx_stdlib.sheet_names(f)
            ]
        sheet: str | int = (
            int(self._sheet) if self._sheet.lstrip("-").isdigit() else self._sheet
        )
        return [InputPartition((f, sheet)) for f in files]

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa

        path, sheet = partition.value
        headers, rows = xlsx_stdlib.read_rows(path, sheet)
        idx_by_name = {}
        for i, h in enumerate(headers):
            idx_by_name.setdefault(h, i)  # first occurrence wins
        columns = []
        for field in self._schema.fields:
            idx = idx_by_name.get(field.name)
            if idx is None:
                columns.append([None] * len(rows))
            else:
                columns.append(
                    [_coerce(r[idx], field.dataType, field.name) for r in rows]
                )
        arrow_schema = pa.schema(
            [(f.name, _pa_type(f.dataType)) for f in self._schema.fields]
        )
        for start in range(0, len(rows), self._batch_rows):
            yield pa.record_batch(
                [
                    pa.array(
                        col[start : start + self._batch_rows],
                        type=arrow_schema.field(i).type,
                    )
                    for i, col in enumerate(columns)
                ],
                schema=arrow_schema,
            )


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx")`` — distributed workbook scan.

    Options: ``sheet`` (index, name, or ``*`` for every sheet;
    default 0), ``batchRows`` (Arrow batch size, default 8192).
    """

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> T.StructType:
        path = self.options.get("path") or self.options.get("paths")
        if not path:
            raise ValueError("xlsx source requires a path: .load(<dir|glob>)")
        files = _expand_paths(path)
        sheet_opt = self.options.get("sheet", "0")
        sheet: str | int
        if sheet_opt == "*":
            sheet = 0
        elif sheet_opt.lstrip("-").isdigit():
            sheet = int(sheet_opt)
        else:
            sheet = sheet_opt
        # Sample several files, not just the first: a later file with
        # a float (or string) in a column the first file held as int
        # would otherwise fail the whole scan executor-side. Columns
        # union by name in first-seen order; per-column samples pool
        # across files so _infer_field's widening (int|float->double,
        # any string->string) sees the drift. Still a sample — see
        # the module docstring for the strict-coercion contract on
        # unsampled files.
        order: list[str] = []
        pooled: dict[str, list] = {}
        for f in files[:_INFER_FILES]:
            headers, rows = xlsx_stdlib.read_rows(f, sheet)
            sample = rows[:_INFER_ROWS]
            for i, h in enumerate(headers):
                if h not in pooled:
                    order.append(h)
                    pooled[h] = []
                pooled[h].extend(r[i] for r in sample)
        if not order:
            raise ValueError(
                f"cannot infer schema: no headers in the first "
                f"{_INFER_FILES} of {files!r} (sheet {sheet!r})"
            )
        return T.StructType([_infer_field(h, pooled[h]) for h in order])

    def reader(self, schema: T.StructType) -> _XlsxReader:
        return _XlsxReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> "_XlsxStreamReader":
        return _XlsxStreamReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> "_XlsxWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("xlsx sink requires a path: .save(<dir>)")
        # driver-side, before any task runs: an overwrite clears prior
        # workbooks AND the prior manifest — if it survived and the
        # new job then failed (abort removes the new files), readers
        # following the "glob the manifest's list" guidance would see
        # phantom entries for deleted workbooks.
        if overwrite and os.path.isdir(path):
            for f in glob.glob(os.path.join(path, "*.xlsx")):
                os.remove(f)
            try:
                os.remove(os.path.join(path, "_MANIFEST.json"))
            except OSError:
                pass
        os.makedirs(path, exist_ok=True)
        return _XlsxWriter(schema, dict(self.options))


class _XlsxStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("xlsx")`` — continuous workbook
    intake: the reference's uploads/ directory
    (``importador.py:40-47`` polls one file at a time) as a real
    Structured Streaming source with offset tracking and replay.

    Offset model: the landing dir is APPEND-ONLY with
    lexicographically increasing file names (``part-00001.xlsx``, the
    convention every distributed landing zone uses — same contract as
    the offsets of a file queue). An offset is simply ``{"n": count}``
    over the sorted name list; the batch [start, end) maps to that
    slice, one InputPartition per (file, sheet) so each micro-batch
    parses its workbooks IN PARALLEL on executors (this is the
    full ``DataSourceStreamReader``, not the driver-side Simple
    variant — a 1000-file burst is a 1000-task micro-batch).
    ``readBetweenOffsets`` replay after a restart re-slices the same
    sorted list, so a committed batch is reproducible as long as
    files are never renamed or deleted — the same durability contract
    as Spark's own file source.

    Schema: pass one explicitly with ``.schema(...)`` (recommended
    for streams — inference would race the first arriving file) or
    rely on batch-side inference over whatever has already landed.
    """

    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("xlsx stream requires a path: .load(<dir>)")
        sheet = options.get("sheet", "0")
        self._sheet: str | int = (
            int(sheet) if sheet.lstrip("-").isdigit() else sheet
        )

    def _files(self) -> list[str]:
        if not os.path.isdir(self._path):
            return []
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".xlsx")
        )

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._files())}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._files()[start["n"]:end["n"]]
        return [InputPartition((f, self._sheet)) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        path, sheet = partition.value
        headers, rows = xlsx_stdlib.read_rows(path, sheet)
        idx_by_name = {}
        for i, h in enumerate(headers):
            idx_by_name.setdefault(h, i)
        fields = self._schema.fields
        idxs = [idx_by_name.get(f.name) for f in fields]
        for r in rows:
            yield tuple(
                None if i is None else _coerce(r[i], f.dataType, f.name)
                for i, f in zip(idxs, fields)
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are derivable from the append-only listing


class _XlsxCommit(WriterCommitMessage):
    """One executor task's result: the workbook it wrote (None for an
    empty partition) and its row count. Collected on the driver by
    ``commit`` into a manifest."""

    def __init__(self, path: str | None, rows: int) -> None:
        self.path = path
        self.rows = rows


class _XlsxWriter(DataSourceArrowWriter):
    """``df.write.format("xlsx").save(dir)`` — distributed workbook
    export, the write-side twin of the scan: one workbook per
    partition, built on executors by the same pure-stdlib OOXML layer
    (``xlsx_stdlib.write_xlsx``), fed Arrow RecordBatches (no pandas
    hop). The reference's single driver-side workbook
    (``importador.py:47``) becomes an N-task fan-out; the per-task
    file is the natural grain because a workbook is one zip container.

    Commit protocol: each task returns its file + row count; only
    ``commit`` (driver, all tasks succeeded) publishes the
    ``_MANIFEST.json``; ``abort`` removes any files written by
    finished tasks so a failed job can't leave a half-written landing
    dir that a later scan would silently ingest. Readers that need
    exactly-committed files should glob the manifest's list.

    Options: ``sheet`` (sheet name, default Plan1)."""

    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._schema = schema
        self._dir = options.get("path")
        self._sheet = options.get("sheet", "Plan1")

    def write(self, iterator) -> _XlsxCommit:
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        headers = [f.name for f in self._schema.fields]

        # peak memory is ONE Arrow batch, not the partition: each
        # batch is row-pivoted and immediately deflated into the zip
        # entry by the streaming stdlib writer. Peek the first batch
        # so an empty partition writes no file at all.
        def _row_batches(first, rest):
            for batch in ([first] if first is not None else []):
                cols = [c.to_pylist() for c in batch.columns]
                yield [list(r) for r in zip(*cols)]
            for batch in rest:
                cols = [c.to_pylist() for c in batch.columns]
                yield [list(r) for r in zip(*cols)]

        it = iter(iterator)
        head = next(it, None)
        if head is None:
            return _XlsxCommit(None, 0)
        out = os.path.join(
            self._dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xlsx"
        )
        n = xlsx_stdlib.write_xlsx_stream(
            out, headers, _row_batches(head, it), sheet_name=self._sheet
        )
        if n == 0:
            # all batches were empty (Arrow may emit zero-row
            # batches): keep the old no-file contract
            os.remove(out)
            return _XlsxCommit(None, 0)
        return _XlsxCommit(out, n)

    def commit(self, messages) -> None:
        import json

        done = [m for m in messages if m is not None and m.path]
        manifest = {
            "files": sorted(
                ({"path": m.path, "rows": m.rows} for m in done),
                key=lambda e: e["path"],
            ),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self._dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and getattr(m, "path", None):
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def register_xlsx_source(spark: SparkSession) -> None:
    """Idempotent session-level registration of the ``xlsx`` format
    (both directions: ``spark.read.format("xlsx")`` and
    ``df.write.format("xlsx")``)."""
    spark.dataSource.register(XlsxDataSource)
