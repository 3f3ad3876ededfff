"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path functions are JVM-side column expressions (whole-stage
codegen'd) — no Python in the per-row path. The only pandas UDFs are the
ones that genuinely need numpy (language ID scoring, rolling-hash
fingerprint), and they are Arrow-batched.

Reference analog: the extension UDF contract
(/root/reference/tacotoolbox/sample/datamodel.py:40-75 — schema-first scalar
extensions) and the vectorize-don't-loop discipline (_metadata.py:299-303).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


@F.pandas_udf(T.StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword language-ID heuristic (vectorized pandas UDF).
    Scores each language by stopword hits; 'und' (undetermined) when no
    stopword matches."""
    langs = list(STOPWORDS)
    lang_index_of_word = {
        w: i for i, lang in enumerate(langs) for w in STOPWORDS[lang]
    }
    out = []
    lowered = texts.fillna("").str.lower().str.split()
    for toks in lowered:
        scores = np.zeros(len(langs), dtype=np.int64)
        idx = [lang_index_of_word[t] for t in toks if t in lang_index_of_word]
        if idx:
            np.add.at(scores, np.array(idx), 1)
            out.append(langs[int(scores.argmax())])
        else:
            out.append("und")
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Rabin-Karp-style polynomial rolling hash over token streams
    (vectorized per batch via numpy) — an order-sensitive fingerprint, vs
    the order-insensitive ``fingerprint``. Deterministic, no RNG."""
    import zlib  # crc32: deterministic across processes (builtin hash isn't)

    B = np.uint64(1099511628211)  # FNV prime as the base
    out = np.zeros(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts.fillna("")):
            h = np.uint64(14695981039346656037)
            for tok in t.split():
                th = np.uint64(zlib.crc32(tok.encode("utf-8")))
                h = h * B + th  # wraps mod 2^64
            out[i] = h
    return pd.Series(out.astype(np.int64))
