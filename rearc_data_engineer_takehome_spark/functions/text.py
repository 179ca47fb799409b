"""Tokenization / shingling expressions shared by text + dedup operators.

All pure column expressions. The regex dialect is restricted to the
intersection of Java regex (Spark) and RE2 (DuckDB) so oracle SQL uses
literally the same patterns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Explicit whitespace class. NOT ``\s``: Java's ``\s`` includes vertical
#: tab (\x0B) while RE2's does not, so ``\s`` tokenizes differently
#: across engines. The spelled-out class is identical in both dialects.
WS_CLASS = r" \t\n\r\f\x0B"

#: Whitespace tokenizer — identical semantics in Spark split() and DuckDB
#: regexp_split_to_array after trim().
WS_PATTERN = rf"[{WS_CLASS}]+"

#: BPE-ish word/number/punct token pattern (letters run | digits run |
#: single non-space symbol) — valid in both Java regex and RE2.
BPE_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CLASS}]"

#: Punctuation class for quality scoring (non-alnum, non-whitespace).
PUNCT_PATTERN = rf"[^A-Za-z0-9{WS_CLASS}]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_PATTERN)


def bpe_tokens(text: Column | str) -> Column:
    """Regex token stream approximating a BPE pre-tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingles: array of space-joined k-grams.

    ``arrays_zip`` of ``k`` shifted slices of the token array, then a
    ``transform`` that concatenates each zipped struct — one projection,
    no explode. The zip shape matters for cost: each slice evaluates
    ``tokens`` once PER ROW, and the concat lambda touches only the
    materialized struct element. The earlier formulation
    (``transform(sequence(0, n-k), i -> concat_ws(slice(tokens, ...)))``)
    referenced ``tokens`` inside the lambda, which Catalyst inlines and
    re-evaluates per shingle POSITION — O(tokens**2) work per document
    when ``tokens`` is itself ``transform(split(text))``. Documents
    shorter than k tokens yield a single shingle of the whole text (so
    they still participate in dedup rather than silently vanishing).
    """
    n = F.size(tokens)
    zipped = F.arrays_zip(
        *[F.slice(tokens, j + 1, n - F.lit(k) + 1) for j in range(k)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    whole = F.array(F.concat_ws(" ", tokens))
    return F.when(n >= k, grams).otherwise(whole)


def word_shingles_sql(tokens_expr: str, k: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles` (1-based inclusive
    slices; list comprehension over generate_series)."""
    grams = (
        f"[array_to_string(({tokens_expr})[i:i+{k - 1}], ' ') "
        f"for i in generate_series(1, len({tokens_expr}) - {k - 1})]"
    )
    whole = f"[array_to_string({tokens_expr}, ' ')]"
    return f"(CASE WHEN len({tokens_expr}) >= {k} THEN {grams} ELSE {whole} END)"
