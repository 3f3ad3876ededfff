"""Text-analysis column functions for large-scale training-data pipelines.

Every function here is a JVM-side column expression (whole-stage
codegen'd) — no Python anywhere in the per-row path, including language ID
and the rolling fingerprint (both were pandas UDFs in round 1 and are now
pure expressions).

Reference analog: the extension UDF contract
(/root/reference/tacotoolbox/sample/datamodel.py:40-75 — schema-first scalar
extensions) and the vectorize-don't-loop discipline (_metadata.py:299-303).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny public stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "que", "de", "los", "se", "las", "por", "un", "para"],
}

TOKEN_PATTERN = r"\s+"
#: BPE-ish subword splitter: words, numbers, or single punctuation marks
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (JVM-side). Trim first: split() on \\s+ would
    emit an empty leading token for text with leading whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token count via regexp extraction (still JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_features(col: Column | str) -> Column:
    """Struct of cheap quality signals: n_chars, n_tokens, mean token
    length, punctuation ratio, uppercase ratio, english-stopword ratio.
    Everything codegen'd; compose into scores downstream."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, sw))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def fingerprint(col: Column | str) -> Column:
    """Exact 64-bit content fingerprint of the normalized text (lowercase,
    collapsed whitespace) — the dedup key for exact duplicates."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.xxhash64(norm)


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic, entirely JVM-side: per
    language, count stopword occurrences among lowercased whitespace tokens
    (occurrences, not distinct — a text repeating 'the' scores higher);
    argmax with first-language-wins tie-break in STOPWORDS order; 'und'
    (undetermined) when nothing matches or the text is NULL.

    Replaces the round-1 pandas UDF that looped per row inside the batch —
    as column expressions the scoring stays inside whole-stage codegen and
    is expressible as a DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(F.coalesce(c, F.lit(""))))
    langs = list(STOPWORDS)
    def _score(words: list[str]) -> Column:
        sw = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    scores = {lang: _score(STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first max wins, in STOPWORDS declaration order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return F.coalesce(expr, F.lit("und"))


def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive 64-bit token-stream fingerprint: xxhash64 chained
    left-to-right over whitespace tokens (h := xxhash64(h, token)), vs the
    order-insensitive ``fingerprint``. Pure JVM column expression — the
    round-1 version looped per row AND per token inside a pandas UDF, the
    exact anti-pattern this module forbids. Deterministic, no RNG."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.coalesce(c, F.lit("")))
    return F.aggregate(
        toks,
        F.lit(0x9E3779B97F4A7C15 - (1 << 64)).cast("long"),  # signed 64-bit
        lambda acc, t: F.xxhash64(acc, t),
    )
