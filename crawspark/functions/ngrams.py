"""Word n-gram SQL-expression builder, shared by the dedup shingles (n=3)
and benchmark decontamination (n=8)."""

from __future__ import annotations


def ngram_expr(n: int, toks_col: str = "toks") -> str:
    """Spark SQL expression: array of space-joined word n-grams over a
    token-array column.

    Built as zip_with over n shifted slices rather than
    transform(sequence, i -> concat_ws(slice(...))): the per-index
    slice+concat_ws pair is interpreted per gram and measured 6x slower
    (3.9s -> 0.67s for the sf0.1 3-gram explode). Output strings are
    identical. Empty result when size(toks) < n — the greatest(0, ...)
    clamp matters: a raw negative slice length throws
    INVALID_PARAMETER_VALUE.LENGTH at runtime (ADVICE r2), and slice with
    length 0 is the legal empty-array spelling. Null token arrays
    propagate to null."""
    if n < 2:
        raise ValueError("n-grams need n >= 2")
    length = f"greatest(0, size({toks_col}) - {n - 1})"
    expr = f"slice({toks_col}, {n}, {length})"
    for i in range(n - 1, 0, -1):
        expr = (f"zip_with(slice({toks_col}, {i}, {length}), {expr}, "
                f"(a, b) -> concat(a, ' ', b))")
    return expr
