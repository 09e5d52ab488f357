"""Source connectors: a thin catalog over directory-of-tables layouts
(like the driver's ``/root/testdata/sf*``) supporting parquet, csv,
and json line files, with schema pinning.

The reference's equivalent surface is its codec-parameterized log
openers (``offset2/test/test.go:18-38``) — here a "table" is any
columnar/delimited file family Spark can scan, and the catalog's job
is to make reads declarative so Catalyst sees a single well-typed
relation (pushdown/pruning intact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EXT_FORMAT = {".parquet": "parquet", ".csv": "csv", ".json": "json",
               ".jsonl": "json", ".ndjson": "json"}


def _dir_format(path: str) -> str:
    """Format of a DIRECTORY table: walk down past Hive-style
    ``key=value`` partition dirs to the first data level and dispatch
    on its file extensions (committer markers like ``_SUCCESS`` and
    hidden files are skipped, as Spark's own scan does). Defaults to
    parquet when no recognizable data file exists — the dominant
    layout at scale. The walk is bounded: one listing per partition
    LEVEL (descending only into ``key=value`` dirs), and it stops at
    the first level holding any data file — never a recursive tree
    walk over arbitrary nested content."""
    cur = path
    while True:
        try:
            entries = sorted(os.listdir(cur))
        except OSError:
            return "parquet"
        saw_file = False
        for f in entries:
            if f.startswith(("_", ".")):
                continue
            if not os.path.isfile(os.path.join(cur, f)):
                continue
            saw_file = True
            ext = os.path.splitext(f)[1]
            if ext in _EXT_FORMAT:
                return _EXT_FORMAT[ext]
        if saw_file:
            return "parquet"  # data level reached, nothing recognized
        nxt = next(
            (d for d in entries
             if "=" in d and not d.startswith(("_", "."))
             and os.path.isdir(os.path.join(cur, d))),
            None,
        )
        if nxt is None:
            return "parquet"
        cur = os.path.join(cur, nxt)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read one table from a file/directory, inferring the format from
    the extension (directories: from the first data file inside, past
    any Hive ``key=value`` partition levels — Spark's partition
    discovery then types the partition columns as usual) unless given.
    Always pass ``schema`` in production paths — inference is a full
    extra scan at 100 TB."""
    if fmt is None:
        if os.path.isdir(path):
            fmt = _dir_format(path)
        else:
            ext = os.path.splitext(path)[1]
            fmt = _EXT_FORMAT.get(ext, "parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


class Catalog:
    """A directory of tables (``<root>/<name>.<ext>``), registered as
    temp views on demand so SQL and DataFrame code share one naming."""

    def __init__(self, spark: SparkSession, root: str,
                 schemas: dict[str, T.StructType] | None = None):
        self.spark = spark
        self.root = root
        self.schemas = schemas or {}

    def path(self, name: str) -> str:
        for ext in _EXT_FORMAT:
            p = os.path.join(self.root, name + ext)
            if os.path.exists(p):
                return p
        # directory-table layout: <root>/<name>/ holding the data
        # files (optionally under key=value partition dirs) — the
        # standard shape at scale, where a table IS a directory
        p = os.path.join(self.root, name)
        if os.path.isdir(p):
            return p
        raise FileNotFoundError(f"no table file for {name!r} under {self.root}")

    def table(self, name: str) -> DataFrame:
        return read_table(self.spark, self.path(name), schema=self.schemas.get(name))

    def register_all(self) -> list[str]:
        names = {
            os.path.splitext(f)[0]
            for f in os.listdir(self.root)
            if os.path.splitext(f)[1] in _EXT_FORMAT
        }
        names |= {
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith(("_", "."))
        }
        names = sorted(names)
        for n in names:
            self.table(n).createOrReplaceTempView(n)
        return names
