"""Word n-gram shingling as pure Column expressions."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def word_array(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document (array<string>).

    Built with transform+slice over the token array — the row explosion
    (if any) is deferred to the caller's explode, keeping this reusable
    for both set-based (jaccard) and sketch-based (minhash) paths.
    """
    ws = word_array(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    return F.array_distinct(grams)
