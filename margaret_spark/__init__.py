"""margaret_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ssbc/margaret (an append-only,
sequence-addressed log store with a composable query algebra, virtual
sublogs, and key-value secondary indexes), re-expressed Spark-first.

Architecture (see SURVEY.md for the full mapping):

- A *log* is a Parquet-backed DataFrame with a dense ``seq BIGINT``
  column plus a payload column; appends are driver-serialized (the
  reference serializes appends under a mutex too,
  ``offset2/log.go:431``), reads are full Catalyst plans with filter
  pushdown to the Parquet scan.
- The query algebra (Gt/Gte/Lt/Lte/Limit/Reverse/Live/SeqWrap,
  reference ``qry.go:10-113``) compiles to ``where/orderBy/limit``
  so Catalyst handles pruning, limit pushdown, and TakeOrdered.
- MultiLogs (reference ``multilog/``) are an ``(addr, main_seq)``
  index table; a sublog is a filtered view ranked by a window
  function (exactly roaring-bitmap ``Select(n)`` semantics).
- KV indexes (reference ``indexes/``) are upsert tables reduced by
  latest-sequence-wins.
- Live queries are Structured Streaming tails of the log directory.
- Beyond the reference surface: large-scale training-data pipeline
  operators (dedup, similarity search, text analysis, multimodal
  plumbing) under ``margaret_spark.operators``.
"""

from margaret_spark.errors import (
    SEQ_EMPTY,
    SEQ_ERRORED,
    SEQ_SUBLOG_DELETED,
    ErrNulled,
    ErrSublogDeleted,
    OutOfBounds,
    QuerySpecError,
)
from margaret_spark.qry import (
    Gt,
    Gte,
    Live,
    Lt,
    Lte,
    Limit,
    Reverse,
    SeqWrap,
    MergeQuerySpec,
    ErrorQuerySpec,
    QueryPlan,
    apply_plan,
)
from margaret_spark.log import Log, MemLog, OffsetLog
from margaret_spark.session import get_spark

__all__ = [
    "SEQ_EMPTY",
    "SEQ_ERRORED",
    "SEQ_SUBLOG_DELETED",
    "ErrNulled",
    "ErrSublogDeleted",
    "OutOfBounds",
    "QuerySpecError",
    "Gt",
    "Gte",
    "Lt",
    "Lte",
    "Limit",
    "Reverse",
    "Live",
    "SeqWrap",
    "MergeQuerySpec",
    "ErrorQuerySpec",
    "QueryPlan",
    "apply_plan",
    "Log",
    "MemLog",
    "OffsetLog",
    "get_spark",
]
