"""Chunking strategies as column expressions.

Transcribed semantics from /root/reference/crawl4ai/chunking_strategy.py:
RegexChunking (:38-61), FixedLengthWordChunking (:147-173),
SlidingWindowChunking (:176-213), OverlappingWindowChunking (:215-256).
All four return ``array<string>`` columns built from sequence/slice
expressions — no Python, fully codegen'd, and exactly reproducible in
ANSI-ish SQL (list comprehensions) for the oracle.

Note the pinned reference quirks:
* word splitting is ``str.split()`` — whitespace runs, empties dropped;
* sliding: text shorter than the window → [original text] (NOT the
  joined words); a trailing remainder gets the LAST window_size words;
* overlapping: same short-circuit; stride = window_size - overlap, and
  the loop breaks after the chunk whose end reaches len(words).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words_expr(text: Column) -> Column:
    """str.split() semantics: split on whitespace runs, drop empties."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def regex_chunks_expr(text: Column, patterns: list[str] | None = None) -> Column:
    """RegexChunking: iteratively split on each pattern (default \\n\\n)."""
    patterns = patterns or [r"\n\n"]
    chunks = F.array(text)
    for p in patterns:
        # flatten(transform(chunks, c -> split(c, p)))
        chunks = F.flatten(F.transform(chunks, lambda c: F.split(c, p)))
    return chunks


def fixed_length_chunks_expr(text: Column, chunk_size: int = 100) -> Column:
    """FixedLengthWordChunking: words[i:i+size] for i in 0,size,2*size…"""
    words = words_expr(text)
    n = F.size(words)
    # starts: 1, 1+size, … (1-based for slice); empty text → no chunks?
    # reference: ''.split() → [] → range(0,0,size) → [] chunks
    n_chunks = F.ceil(n.cast("double") / chunk_size).cast("int")
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * chunk_size + 1, chunk_size))
    )


def sliding_window_chunks_expr(text: Column, window_size: int = 100, step: int = 50) -> Column:
    """SlidingWindowChunking with the reference's remainder handling."""
    words = words_expr(text)
    n = F.size(words)
    # main windows: starts 0, step, … while start <= n - window
    n_main = F.floor((n - window_size).cast("double") / step).cast("int") + 1
    idx = F.when(n_main >= 1, F.sequence(F.lit(0), n_main - 1)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    main = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * step + 1, window_size))
    )
    # trailing remainder: last i + window < n ⇒ append last window_size words
    last_i = (n_main - 1) * step
    tail = F.when(
        last_i + window_size < n,
        F.array(F.concat_ws(" ", F.slice(words, n - window_size + 1, window_size))),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return F.when(n <= window_size, F.array(text)).otherwise(F.concat(main, tail))


def overlapping_window_chunks_expr(
    text: Column, window_size: int = 1000, overlap: int = 100
) -> Column:
    """OverlappingWindowChunking: stride = window_size - overlap; loop
    breaks once a chunk's end reaches len(words)."""
    words = words_expr(text)
    n = F.size(words)
    stride = window_size - overlap
    # number of chunks: first start whose end >= n ⇒ ceil((n - window)/stride) + 1
    n_chunks = (
        F.ceil((n - window_size).cast("double") / stride).cast("int") + 1
    )
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    chunks = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * stride + 1, window_size))
    )
    return F.when(n <= window_size, F.array(text)).otherwise(chunks)


def sentence_chunks_expr(text: Column) -> Column:
    """Sentence chunking (NlpSentenceChunking, chunking_strategy.py:65-90).

    The reference tokenizes with nltk punkt (absent from this
    environment); this is the regex analog its own commented-out
    fallback sketches (:79-83): split after [.?!] or newline followed by
    whitespace, strip, drop empties.  NOTE the reference returns
    ``list(set(...))`` — an UNORDERED deduped set (:89, quirk) — so this
    expression also dedupes and sorts for a deterministic order.
    """
    sentences = F.split(text, r"(?<=[.?!\n])\s+")
    stripped = F.transform(sentences, lambda s: F.trim(s))
    return F.array_sort(F.array_distinct(F.filter(stripped, lambda s: s != "")))
