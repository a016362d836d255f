"""``ketl_tab`` — a Python DataSource (Spark 4 API) for the reference's
delimited-tab-file dialect.

The reference engine consumes header-driven delimited files with ``#``
comment lines (ref: src/ketl/tabmap/core.py:462-467). Spark's native CSV
reader covers a single dialect per read; this source adds what a real
heterogeneous drop-zone needs and the native reader cannot do in one
scan:

* **per-file delimiter sniffing** — each file independently resolves to
  tab / comma / semicolon / pipe from its header line, so one read spans
  a directory of mixed exports;
* ``#`` comment lines skipped anywhere in the file (native CSV only
  honors ``comment`` at line start too, but cannot mix dialects);
* optional ``_src_file`` lineage column (option ``include_filename``).

Scale shape: one :class:`~pyspark.sql.datasource.InputPartition` per
file — the natural parallel unit for a many-file drop zone (at 100 TB
the input is thousands of files; a single giant file should be read with
the splittable native CSV reader instead, which this source is NOT a
replacement for). Rows are produced as **Arrow record batches**
(the DataSource Arrow fast path) so the Python→JVM hop is columnar, not
per-row pickling.

Schema: all columns string (plus optional lineage column). Type
inference would cost a full extra pass per file; production casts are
explicit downstream (``tabmap.tabfile.read_tab_file`` semantics).
"""

from __future__ import annotations

import csv
import glob
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType

_DELIMS = ["\t", ",", ";", "|"]
_BATCH_ROWS = 65536


def _sniff_delimiter(header_line: str) -> str:
    """The candidate delimiter splitting the header into the most fields
    (ties resolve in ``_DELIMS`` order — tab first, the reference
    default)."""
    best, best_n = _DELIMS[0], 1
    for d in _DELIMS:
        n = len(header_line.split(d))
        if n > best_n:
            best, best_n = d, n
    return best


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        ]
    else:
        files = glob.glob(path) or [path]
    return sorted(f for f in files if os.path.isfile(f))


def _read_header(path: str, comment: str) -> tuple[list[str], str]:
    """(column names, delimiter) from the first non-comment line."""
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\r\n")
            if not line or (comment and line.startswith(comment)):
                continue
            delim = _sniff_delimiter(line)
            return next(csv.reader(io.StringIO(line), delimiter=delim)), delim
    return [], _DELIMS[0]


class _TabFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TabReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.comment = options.get("comment", "#")
        self.include_filename = (
            str(options.get("include_filename", "false")).lower() == "true"
        )
        self.paths = _list_files(options["path"])

    def partitions(self):
        return [_TabFilePartition(p) for p in self.paths]

    def read(self, partition: _TabFilePartition):
        import pyarrow as pa

        cols = [f.name for f in self.schema.fields]
        data_cols = [c for c in cols if c != "_src_file"]
        names, delim = _read_header(partition.path, self.comment)
        # map this file's header positions onto the unified schema —
        # missing columns yield NULL, extra columns are dropped
        pos = {n: i for i, n in enumerate(names)}
        batch: list[list[str | None]] = []

        def _flush():
            arrays = []
            for ci, c in enumerate(data_cols):
                arrays.append(pa.array([r[ci] for r in batch], type=pa.string()))
            if self.include_filename:
                arrays.append(
                    pa.array([partition.path] * len(batch), type=pa.string())
                )
                return pa.RecordBatch.from_arrays(arrays, data_cols + ["_src_file"])
            return pa.RecordBatch.from_arrays(arrays, data_cols)

        with open(partition.path, encoding="utf-8") as fh:
            reader = csv.reader(fh, delimiter=delim)
            seen_header = False
            for row in reader:
                if not row:
                    continue
                if self.comment and row[0].startswith(self.comment):
                    continue
                if not seen_header:
                    seen_header = True  # header row consumed by _read_header
                    continue
                # empty field → NULL: delimited text cannot distinguish
                # the two, and the engine's drop-on-null/empty mapping
                # semantics (reference P6) treat them alike anyway
                batch.append(
                    [
                        (row[pos[c]] or None)
                        if c in pos and pos[c] < len(row)
                        else None
                        for c in data_cols
                    ]
                )
                if len(batch) >= _BATCH_ROWS:
                    yield _flush()
                    batch = []
        if batch:
            yield _flush()


class TabDataSource(DataSource):
    """``spark.read.format("ketl_tab").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "ketl_tab"

    def schema(self) -> StructType:
        # union of all files' headers, first-seen column order — one
        # cheap header-line read per file on the driver, no data pass
        comment = self.options.get("comment", "#")
        cols: list[str] = []
        for p in _list_files(self.options["path"]):
            for c in _read_header(p, comment)[0]:
                if c not in cols:
                    cols.append(c)
        fields = [StructField(c, StringType()) for c in cols]
        if str(self.options.get("include_filename", "false")).lower() == "true":
            fields.append(StructField("_src_file", StringType()))
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TabReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> "_TabWriter":
        return _TabWriter(schema, dict(self.options), overwrite)


class _TabCommit(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class _TabWriter(DataSourceWriter):
    """Partition-parallel TSV sink: one headered part file per partition,
    ``_SUCCESS`` written at commit (the engine's done-marker contract),
    staged part files removed on abort. Paths must be on a filesystem
    every executor can reach (local/NFS — the Python DataSource API
    leaves IO to the implementation; this sink exists for drop-zone
    round-trips and tests, not object stores)."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.cols = [f.name for f in schema.fields]
        self.path = options["path"]
        self.delimiter = options.get("delimiter", "\t")
        self.overwrite = overwrite

    def write(self, iterator) -> _TabCommit:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.tsv")
        with open(out, "w", encoding="utf-8", newline="") as fh:
            w = csv.writer(fh, delimiter=self.delimiter, lineterminator="\n")
            w.writerow(self.cols)
            for row in iterator:
                w.writerow(
                    ["" if v is None else str(v) for v in row]
                )
        return _TabCommit(out)

    def commit(self, messages) -> None:
        if self.overwrite:
            keep = {m.path for m in messages if m is not None}
            for f in os.listdir(self.path):
                full = os.path.join(self.path, f)
                if full not in keep and f.startswith("part-"):
                    os.remove(full)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register_tab_source(spark) -> None:
    """Register ``ketl_tab`` on a session (idempotent)."""
    spark.dataSource.register(TabDataSource)
