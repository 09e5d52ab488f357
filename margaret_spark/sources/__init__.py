from margaret_spark.sources.catalog import Catalog, read_table
from margaret_spark.sources.writers import (
    compact_log,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "Catalog",
    "read_table",
    "compact_log",
    "write_bucketed",
    "write_partitioned",
]
