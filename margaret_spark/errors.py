"""Sentinels and error types.

Mirrors the reference's sequence sentinels (``seq.go:7-15``) and error
values (``log.go:31-44``, ``multilog/multilog.go:16-18``).
"""

from __future__ import annotations

#: Sequence of an empty log (reference ``seq.go:9``: SeqEmpty = -1).
SEQ_EMPTY = -1
#: Returned by operations that errored (reference ``seq.go:11``).
SEQ_ERRORED = -2
#: Seq observed through a handle to a deleted sublog
#: (reference ``seq.go:14``: SeqSublogDeleted = -255).
SEQ_SUBLOG_DELETED = -255


class OutOfBounds(IndexError):
    """Point lookup past the end of the log (reference: ``Get`` past the
    end yields end-of-stream, ``offset2/log.go:361-366``)."""


class ErrNulled(Exception):
    """The entry at this sequence was redacted via ``Null``.

    Matches reference semantics (``offset2/log.go:110-127``): ``get``
    *raises* this; streaming iteration *yields an instance as the
    value* and continues (``offset2/qry.go:159-162``).
    """

    def __eq__(self, other: object) -> bool:  # value-compare in streams
        return isinstance(other, ErrNulled)

    def __hash__(self) -> int:
        return hash("ErrNulled")

    def __repr__(self) -> str:
        return "ErrNulled()"


class ErrSublogDeleted(Exception):
    """Operation through a handle to a sublog that has been deleted
    (reference ``multilog/multilog.go:16-18``)."""


class QuerySpecError(ValueError):
    """Invalid query-spec combination, e.g. two lower bounds
    (``offset2/qry.go:37``) or reverse+live (``offset2/log.go:418-420``)."""
