"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (JVM-side) and deliberately
oracle-reproducible: every formula below can be stated in ANSI-ish SQL
so DuckDB can verify the exact values (see __spark_entry__.oracle_sql).

Operators: whitespace/BPE-ish token counting, quality scoring
(length / punctuation / stopword ratios), n-gram-heuristic language ID,
and md5 document fingerprinting over the normalized token prefix.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic; deliberately small so the oracle SQL stays readable.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punct segmentation (public GPT-2-style pattern family)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens (empty strings removed)."""
    return F.filter(F.split(F.trim(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_token_count_expr(text: Column) -> Column:
    """Count of BPE-ish segments (letter runs / digit runs / single punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def quality_score_expr(text: Column) -> Column:
    """Heuristic document quality in [0,1]:
    0.4 * length_score (chars/500 capped at 1)
    + 0.3 * (1 - punct_ratio * 4 capped at 1)
    + 0.3 * stopword_hit_ratio (en stopwords present / 5).
    """
    n_chars = F.length(text).cast("double")
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\sA-Za-z0-9]"), 0)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - punct_ratio * F.lit(4.0), F.lit(0.0))
    low = F.lower(text)
    sw = LANG_STOPWORDS["en"]
    hits = sum(
        (F.instr(F.concat(F.lit(" "), low, F.lit(" ")), f" {w} ") > 0).cast("double") for w in sw
    )
    sw_score = hits / F.lit(float(len(sw)))
    return length_score * F.lit(0.4) + punct_score * F.lit(0.3) + sw_score * F.lit(0.3)


def lang_id_expr(text: Column) -> Column:
    """Stopword-vote language ID: the language with the most stopword hits
    wins; ties broken by language code order; no hits → 'unknown'.

    Shaped as array_max over (hits, -ord, lang) structs rather than a
    when-chain fold: the fold re-embeds the whole previous chain twice
    per language (2^L expression blowup), which pushed the fused
    corpus_clean filter past Janino's 64 KB method limit and dropped the
    scan stage to interpreted execution.  The struct comparison is
    field-ordered, so max = most hits, ties to the earliest language
    code; NULL text yields NULL hits in every entry and falls through to
    'unknown' exactly as the fold did."""
    low = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    entries = []
    for i, lang in enumerate(sorted(LANG_STOPWORDS)):
        words = LANG_STOPWORDS[lang]
        hits = sum((F.instr(low, f" {w} ") > 0).cast("int") for w in words)
        entries.append(F.struct(
            hits.alias("hits"), F.lit(-i).alias("ord"), F.lit(lang).alias("lang"),
        ))
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint_expr(text: Column, prefix_tokens: int = 64) -> Column:
    """Document fingerprint: md5 of the first ``prefix_tokens`` lowercase
    whitespace tokens joined by single spaces — a canonical-prefix hash
    that is portable to any SQL engine with md5()."""
    toks = F.slice(tokens_expr(F.lower(text)), 1, prefix_tokens)
    return F.md5(F.concat_ws(" ", toks))


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text (sorted, so
    the array itself is deterministic and oracle-comparable)."""
    toks = tokens_expr(F.lower(text))
    n_grams = F.size(toks) - (n - 1)
    # sequence(1, 0) would DESCEND in Spark; guard docs shorter than n tokens
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_sort(F.array_distinct(grams))
