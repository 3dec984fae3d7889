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


# ---------------------------------------------------------------------------
# TopicSegmentationChunking analog (chunking_strategy.py:93-141)
# ---------------------------------------------------------------------------
#
# The reference delegates to nltk's TextTilingTokenizer (absent from this
# container, like punkt for the sentence chunker), so this is a
# documented TextTiling-lite: Hearst's public block-comparison algorithm
# (pseudo-sentences of w tokens, k-block cosine, depth scores, mean−σ/2
# cutoff, boundaries snapped to paragraph breaks) without nltk's stemming
# or smoothing.  Keyword extraction mirrors the reference's
# stopword-filtered Counter.most_common (its nltk tokenizer replaced by
# the same \w+ tokenization; ties keep first-occurrence order, which is
# Counter's documented behavior).

_TOPIC_STOPWORDS = frozenset(
    """a about above after again all am an and any are as at be because been
    before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    him his how i if in into is it its just me more most my no nor not of
    off on once only or other our out over own same she so some such than
    that the their them then there these they this those through to too
    under until up very was we were what when where which while who whom
    why will with you your""".split()
)

_TOKEN_RE = None


def _topic_tokens(text: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"\w+")
    return [t.lower() for t in _TOKEN_RE.findall(text or "")]


def _block_cosine(a: dict, b: dict) -> float:
    import math

    dot = sum(v * b[k] for k, v in a.items() if k in b)
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def topic_segments(
    text: str, w: int = 20, k: int = 10, min_depth: float = 0.1
) -> list[str]:
    """TextTiling-lite: segment ``text`` at topic shifts.

    Returns the list of segments (paragraph groups); a text with no
    detectable shift (or fewer than 2 paragraphs / 2·w tokens) comes
    back whole, exactly one element.  ``min_depth`` is an absolute depth
    floor standing in for nltk's score smoothing: block-edge jitter on
    near-uniform text produces depths ≲0.05, a genuine vocabulary shift
    ≳0.3, so the floor kills spurious boundaries without touching real
    ones.
    """
    from collections import Counter

    paragraphs = [p for p in (text or "").split("\n\n") if p.strip()]
    if len(paragraphs) < 2:
        return [text] if (text or "").strip() else []
    # token stream with the owning paragraph index
    stream: list[tuple[str, int]] = []
    for pi, p in enumerate(paragraphs):
        for t in _topic_tokens(p):
            stream.append((t, pi))
    if len(stream) < 2 * w:
        return ["\n\n".join(paragraphs)]
    seqs = [stream[i : i + w] for i in range(0, len(stream), w)]
    counts = [Counter(t for t, _ in s) for s in seqs]
    n = len(seqs)
    sims = []
    for i in range(n - 1):
        lo = max(0, i + 1 - k)
        hi = min(n, i + 1 + k)
        left = Counter()
        for c in counts[lo : i + 1]:
            left.update(c)
        right = Counter()
        for c in counts[i + 1 : hi]:
            right.update(c)
        sims.append(_block_cosine(left, right))
    # depth scores: climb to the nearest peak on each side
    depths = []
    for i, s in enumerate(sims):
        l = i
        while l > 0 and sims[l - 1] >= sims[l]:
            l -= 1
        r = i
        while r < len(sims) - 1 and sims[r + 1] >= sims[r]:
            r += 1
        depths.append((sims[l] - s) + (sims[r] - s))
    mean = sum(depths) / len(depths)
    var = sum((d - mean) ** 2 for d in depths) / len(depths)
    cutoff = mean - (var ** 0.5) / 2.0
    # boundaries: local depth maxima above the cutoff
    floor = max(cutoff, min_depth)
    gap_bounds = [
        i
        for i, d in enumerate(depths)
        if d > floor
        and (i == 0 or depths[i - 1] <= d)
        and (i == len(depths) - 1 or depths[i + 1] < d)
    ]
    # snap each gap to the nearest paragraph break; a valley usually
    # spans several gaps (plateaued depths), so collapse candidate
    # boundaries on consecutive paragraphs down to the deepest one
    cands: dict[int, float] = {}
    for g in gap_bounds:
        tok_idx = (g + 1) * w  # first token of the right block
        tok_idx = min(tok_idx, len(stream) - 1)
        pi = stream[tok_idx][1]
        if pi > 0:
            cands[pi] = max(cands.get(pi, 0.0), depths[g])
    para_bounds: set[int] = set()
    group: list[tuple[int, float]] = []
    for pi in sorted(cands):
        if group and pi - group[-1][0] > 1:
            para_bounds.add(max(group, key=lambda x: (x[1], -x[0]))[0])
            group = []
        group.append((pi, cands[pi]))
    if group:
        para_bounds.add(max(group, key=lambda x: (x[1], -x[0]))[0])
    if not para_bounds:
        return ["\n\n".join(paragraphs)]
    segments, start = [], 0
    for b in sorted(para_bounds):
        segments.append("\n\n".join(paragraphs[start:b]))
        start = b
    segments.append("\n\n".join(paragraphs[start:]))
    return [s for s in segments if s]


def topic_keywords(text: str, num_keywords: int = 3) -> list[str]:
    """Reference extract_keywords (:119-134): stopword/punctuation-free
    token frequency top-N (Counter.most_common tie order pinned)."""
    from collections import Counter

    toks = [t for t in _topic_tokens(text) if t not in _TOPIC_STOPWORDS]
    return [wd for wd, _ in Counter(toks).most_common(num_keywords)]


def chunk_with_topics(text: str, num_keywords: int = 3, w: int = 20, k: int = 10) -> list[tuple[str, list[str]]]:
    """chunk_with_topics (:136-141): (segment, keywords) pairs."""
    return [(seg, topic_keywords(seg, num_keywords)) for seg in topic_segments(text, w, k)]


def topic_chunk_docs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_keywords: int = 3,
    w: int = 20,
    k: int = 10,
):
    """Long-form topic chunking over a documents table: one row per
    (doc, segment) with the segment's keywords — a stateless Arrow pass
    (TextTiling is per-document sequential, so mapInPandas is the right
    physical shape; linear in executors)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("segment", T.StringType()),
            T.StructField("keywords", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for i, (seg, kws) in enumerate(
                    chunk_with_topics(text or "", num_keywords, w, k)
                ):
                    rows.append((int(did), i, seg, " ".join(kws)))
            yield pd.DataFrame(rows, columns=["doc_id", "seg_idx", "segment", "keywords"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema)
