"""Text-analysis building blocks: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

Everything is built-in Catalyst expressions (split / higher-order
array functions / md5), so these run inside whole-stage codegen and
need no Python workers — essential when scoring billions of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import shingles, tokenize

# Tiny per-language stopword seeds for the n-gram/stopword-overlap
# language-ID heuristic. Real deployments would ship larger lists; the
# mechanism (array_intersect scoring) is what matters here.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "for", "with"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "pour", "dans", "que"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "para", "en", "que"],
    "de": ["der", "die", "und", "das", "ein", "eine", "ist", "für", "mit", "zu"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "不"],
}


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND punctuation /
    digit boundaries (a cheap BPE proxy: words + punctuation marks)."""
    pieces = F.split(
        F.regexp_replace(F.lower(text), r"([^\w\s])", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_hits(tokens: Column, lang: str) -> Column:
    lits = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens, lits))


def lang_id(text: Column, tiebreak_order: tuple[str, ...] = ("de", "en", "es", "fr", "zh")) -> Column:
    """Predicted language = argmax stopword overlap (ties resolved by
    fixed language order, 'und' when nothing matches).

    Shaped as array_max over (score, -order, lang) structs: a chained
    when/otherwise fold embeds each previous step TWICE, growing the
    expression tree 2^n and re-tokenizing the document per copy
    (Catalyst has no cross-expression CSE — same trap documented in
    operators/dedup.py).
    """
    toks = F.array_distinct(tokenize(text))
    entries = F.array(
        *[
            F.struct(
                stopword_hits(toks, lang).alias("score"),
                F.lit(-i).alias("nord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(tiebreak_order)
        ]
    )
    best = F.array_max(entries)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + token
    diversity, equal thirds. Deterministic double arithmetic."""
    toks = tokenize(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_band = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0)).otherwise(
        F.when(n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    return (len_band + alpha_ratio + distinct_ratio) / F.lit(3.0)


def doc_fingerprint(text: Column, shingle_k: int = 5) -> Column:
    """Winnowing-style fingerprint: lexicographic-min md5 over word
    k-shingles (a 1-permutation minhash; portable to any SQL engine)."""
    return F.array_min(
        F.transform(shingles(tokenize(text), shingle_k), lambda s: F.md5(s))
    )


def content_md5(text: Column) -> Column:
    """Normalized exact-dup digest: lowercase, collapsed whitespace."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def ngrams(tokens: Column, n: int) -> Column:
    """All word n-grams in order (with duplicates — repetition metrics
    need the multiset, unlike ``dedup.shingles`` which distinct-ifies
    and falls back to the whole document for short inputs). Documents
    shorter than n tokens yield an empty array, never a partial gram.

    The guard matters: Spark's ``sequence(1, size - (n-1))`` produces a
    DESCENDING sequence when size < n instead of an empty one.
    """
    if n == 1:
        return tokens
    size = F.size(tokens)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
