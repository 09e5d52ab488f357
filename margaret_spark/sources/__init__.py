from margaret_spark.sources.catalog import Catalog, read_table
from margaret_spark.sources.snapshot import SnapshotCatalog
from margaret_spark.sources.writers import (
    compact_log,
    compact_multilog,
    compact_small_files,
    maybe_compact,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "Catalog",
    "SnapshotCatalog",
    "read_table",
    "compact_log",
    "compact_multilog",
    "compact_small_files",
    "maybe_compact",
    "write_bucketed",
    "write_partitioned",
]
