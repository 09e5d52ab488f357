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


def char_shingles(col: Column, n: int = 5, lower: bool = True) -> Column:
    """All distinct character n-grams of the (optionally lowercased)
    string, 1-based substring semantics."""
    c = F.lower(col) if lower else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))


def word_shingles(col: Column, n: int = 3, lower: bool = True) -> Column:
    """All distinct word n-grams, joined with a single space."""
    ws = words(col, lower=lower)
    cnt = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    )
