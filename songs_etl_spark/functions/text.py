"""Text primitives shared by the dedup / text-analysis operators.

All pure JVM-side expressions (split / transform / filter / sha) — no Python
UDFs — so tokenization and shingling stay inside whole-stage codegen even on
a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Lowercase word tokens: split on any non-alphanumeric run.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


#: DuckDB oracle twin of ``tokens()`` below — ONE canonical copy (plans
#: modules import it) so a tokenizer change cannot silently diverge between
#: the Spark expression and any oracle.
DUCKDB_TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens as array<string> (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != "")


def has_token(col: Column | str) -> Column:
    """True iff ``tokens(col)`` is non-empty, without tokenizing.

    ``tokens`` splits lower(text) on runs of ``[^a-z0-9]``, so the token
    array is non-empty exactly when lower(text) contains at least one
    ``[a-z0-9]`` character — one regex find replaces the split+filter+size
    chain. Matters because Catalyst pushes a deterministic filter below the
    spread exchange by *substituting the full token expression into the
    predicate*: with ``size(tokens(..)) > 0`` every row is tokenized twice
    (once serially in the scan-stage filter, once in the post-exchange
    projection). With this predicate the scan-stage filter is a cheap char
    scan and tokenization runs once, after the exchange, in parallel.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).rlike("[a-z0-9]")


def has_min_tokens(col: Column | str, n: int) -> Column:
    """True iff ``tokens(col)`` has at least ``n`` elements, without
    tokenizing (same motivation as ``has_token``, which is the n=1 case).

    Tokens are the maximal ``[a-z0-9]`` runs of lower(text), so "at least n
    tokens" holds exactly when lower(text) contains n such runs separated by
    non-alphanumeric gaps: the unanchored pattern
    ``([a-z0-9]+[^a-z0-9]+){n-1}[a-z0-9]`` matches iff a third/nth maximal
    run exists (each repetition consumes one full run plus the gap after
    it; the final ``[a-z0-9]`` requires one more run to start). The two
    character classes are disjoint, so matching is a single linear scan
    with no backtracking blowup, and ``rlike`` stops at the first match.
    """
    if n <= 1:
        return has_token(col)
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).rlike("([a-z0-9]+[^a-z0-9]+){%d}[a-z0-9]" % (n - 1))


def word_shingles(tok: Column, n: int = 3) -> Column:
    """n-token shingles ('a b c') from a token array; empty if < n tokens.

    Built with sequence+transform (JVM lambda), not a UDF: for each start
    offset i, concat the n tokens at i..i+n-1. ``element_at`` per position
    (O(1) array access) instead of ``array_join(slice(...))`` — the slice
    materializes a sub-array per window, which measured ~5× slower over the
    documents corpus. The short-input case needs an explicit WHEN:
    ``sequence(1, len-n+1)`` with len < n would produce a *descending*
    sequence (Spark generates start→stop in either direction), not an empty
    one.
    """
    windows = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)]),
    )
    return F.when(F.size(tok) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Character n-grams of the lowercased string (for SimHash / langid);
    empty for strings shorter than n (same descending-sequence guard as
    word_shingles)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    grams = F.transform(
        F.sequence(F.lit(0), F.length(c) - n),
        lambda i: F.substr(c, i + 1, F.lit(n)),
    )
    return F.when(F.length(c) >= n, grams).otherwise(F.array().cast("array<string>"))
