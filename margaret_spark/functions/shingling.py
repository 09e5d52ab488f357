"""Shingle / token extraction as JVM-side array expressions.

``sequence + transform + substring`` generates shingles without any
Python involvement; callers typically ``explode`` the result into an
inverted index (the standard distributed set-similarity layout)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(col: Column, lower: bool = True) -> Column:
    """Whitespace tokenization; empty input gives an empty array."""
    c = F.lower(col) if lower else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def gram_indices(count: Column) -> Column:
    """[1..count], or EMPTY when count ≤ 0. Spark's ``sequence(1, 0)``
    is DESCENDING [1, 0] (not empty), and the 0 index would make a
    downstream ``slice``/1-based access throw — so build an ascending
    sequence of at least one element and trim it to ``count`` with
    ``slice(_, 1, count)``, which IS empty for count ≤ 0. All codegen."""
    m = F.greatest(count, F.lit(0))
    return F.slice(F.sequence(F.lit(1), F.greatest(m, F.lit(1))), 1, m)


def bind1(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and hand it to ``fn`` as a lambda variable
    (the transform-over-singleton bind). THE LOAD-BEARING RULE: an
    outer expression referenced inside a HOF lambda re-evaluates per
    ELEMENT — a token array read by every gram position re-tokenizes
    the whole document per gram, O(tokens²) per row (measured 7x on
    the gram expansion alone). A bound lambda variable is O(1) to
    read. Same values either way — this changes evaluation strategy
    only."""
    return F.get(F.transform(F.array(col), fn), 0)


def char_shingles(col: Column, n: int = 5, lower: bool = True) -> Column:
    """All distinct character n-grams of the (optionally lowercased)
    string, 1-based substring semantics. Strings shorter than ``n``
    have no n-gram — empty array (not a truncated partial gram)."""
    c = F.lower(col) if lower else col

    def inner(cs: Column) -> Column:
        idx = gram_indices(F.length(cs) - F.lit(n - 1))
        return F.array_distinct(
            F.transform(idx, lambda i: F.substring(cs, i, n))
        )

    return bind1(c, inner)


def word_shingles(col: Column, n: int = 3, lower: bool = True) -> Column:
    """All distinct word n-grams, joined with a single space.
    Documents with fewer than ``n`` tokens have no n-gram — empty
    array (the naive ``sequence(1, cnt-n+1)`` index build crashes on
    them: see :func:`gram_indices`)."""

    def inner(ws: Column) -> Column:
        idx = gram_indices(F.size(ws) - F.lit(n - 1))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
        )

    return bind1(words(col, lower=lower), inner)
